"""Pod-scale batched solving: the capability the reference doesn't have.

Solves a large batch of problem instances as ONE sharded device program:
the batch axis is split over every available device (TPU pod slice, or a
virtual CPU mesh) with ``shard_map``; each device's while_loop retires its
local instances independently — zero cross-device sync in the hot loop.

Run on a virtual 8-device CPU mesh:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  EXAMPLES_PLATFORM=cpu python examples/pod_scale.py

On TPU hardware just run it as-is (EXAMPLES_PLATFORM=tpu).
"""

import os
import time

import jax

jax.config.update("jax_platforms", os.environ.get("EXAMPLES_PLATFORM", "cpu"))

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from cppnumericalsolvers_tpu import objective  # noqa: E402
from cppnumericalsolvers_tpu.parallel import (  # noqa: E402
    aggregate_metrics,
    make_mesh,
    minimize_sharded,
)
from cppnumericalsolvers_tpu.solvers import Lbfgs  # noqa: E402


def main():
    mesh = make_mesh()
    n_dev = mesh.devices.size
    batch = 128 * n_dev
    dim = 16

    def ext_rosenbrock(x):
        even, odd = x[0::2], x[1::2]
        return jnp.sum(100.0 * (odd - even**2) ** 2 + (1.0 - even) ** 2)

    rng = np.random.default_rng(0)
    x0 = jnp.asarray(
        rng.uniform(-2.0, 2.0, size=(batch, dim)).astype(np.float32)
    )

    print(f"solving {batch} Rosenbrock-{dim} instances over {n_dev} device(s)")
    t0 = time.perf_counter()
    result = minimize_sharded(
        objective(ext_rosenbrock, mode="first"), x0, Lbfgs(), mesh=mesh
    )
    jax.block_until_ready(result.state.x)
    wall = time.perf_counter() - t0

    metrics = aggregate_metrics(result)
    print(
        f"converged {metrics['converged_pct']:.1f}%  "
        f"mean nfev {metrics['mean_nfev']:.1f}  "
        f"mean iters {metrics['mean_iterations']:.1f}  "
        f"wall {wall:.2f}s (incl. compile)"
    )
    print("result sharding:", result.state.x.sharding.spec)


if __name__ == "__main__":
    main()
