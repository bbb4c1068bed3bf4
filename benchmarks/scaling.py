"""Scaling-efficiency harness: iterations/s vs mesh size.

BASELINE.md's scaling target is >=80% iterations/s efficiency from 1 host to
N hosts.  Real multi-chip hardware is not available in this environment, so
this harness measures WEAK scaling on the virtual CPU device mesh (the same
code path — shard_map over a ``batch`` mesh axis — that spans real
chips/hosts): per-device batch held constant while the mesh grows 1 -> 8.
The solve is embarrassingly parallel by design (each device runs its local
while_loop to completion; no per-iteration collective exists — see
parallel/sharded.py), so the per-device iteration rate should stay flat; any
hidden cross-device synchronisation would show up as a falling rate.

A deterministic structural guarantee (zero collectives in the compiled
module) is asserted by tests/test_scaling_efficiency.py; this harness adds
the wall-clock evidence.

Usage: python benchmarks/scaling.py   (prints one JSON line)
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/cppns_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from cppnumericalsolvers_tpu import objective  # noqa: E402
from cppnumericalsolvers_tpu.core.progress import default_stopping  # noqa: E402
from cppnumericalsolvers_tpu.parallel import make_mesh, minimize_sharded  # noqa: E402
from cppnumericalsolvers_tpu.solvers import Lbfgs  # noqa: E402

PER_DEVICE_BATCH = 64
DIM = 16
MAX_ITERS = 60
REPEATS = 3


def _objective():
    def ext_rosenbrock(x):
        even, odd = x[0::2], x[1::2]
        return jnp.sum(100.0 * (odd - even**2) ** 2 + (1.0 - even) ** 2)

    return objective(ext_rosenbrock, mode="first")


def measure(n_devices: int) -> float:
    """Sustained iterations/s at a given mesh size (weak scaling)."""
    obj = _objective()
    mesh = make_mesh(n_devices)
    solver = Lbfgs(m=10, two_loop_impl="xla")
    stopping = default_stopping(jnp.float32)._replace(
        max_iterations=jnp.int32(MAX_ITERS),
        x_delta=jnp.float32(0.0),
        f_delta=jnp.float32(0.0),
        gradient_norm=jnp.float32(0.0),
        past=jnp.int32(0),
    )
    rng = np.random.default_rng(n_devices)
    batch = PER_DEVICE_BATCH * n_devices
    x0s = [
        jnp.asarray(
            rng.uniform(-2.0, 2.0, size=(batch, DIM)).astype(np.float32)
        )
        for _ in range(REPEATS + 1)
    ]
    # Warm-up compiles the program for this mesh size.
    res = minimize_sharded(obj, x0s[0], solver, stopping, mesh=mesh)
    float(np.asarray(res.progress.num_iterations).sum())
    t0 = time.perf_counter()
    results = [
        minimize_sharded(obj, xi, solver, stopping, mesh=mesh)
        for xi in x0s[1:]
    ]
    iters = sum(
        float(np.asarray(r.progress.num_iterations).sum()) for r in results
    )
    wall = time.perf_counter() - t0
    return iters / wall


def main():
    sizes = [1, 2, 4, 8]
    rates = {n: measure(n) for n in sizes}
    base_per_dev = rates[1] / 1
    efficiency = {
        n: (rates[n] / n) / base_per_dev for n in sizes
    }
    out = {
        "metric": "weak_scaling_efficiency_8dev",
        "value": round(efficiency[8], 4),
        "unit": "frac",
        "vs_baseline": round(efficiency[8] / 0.80, 4),  # target >= 80%
        "iters_per_s": {str(n): round(rates[n], 1) for n in sizes},
        "per_device_efficiency": {
            str(n): round(efficiency[n], 4) for n in sizes
        },
        "per_device_batch": PER_DEVICE_BATCH,
        "dim": DIM,
        "backend": jax.default_backend(),
        "note": "virtual CPU mesh (no multi-chip hardware in environment); "
                "same shard_map code path as real meshes",
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
