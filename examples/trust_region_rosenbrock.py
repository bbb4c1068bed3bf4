"""Trust-region Newton on Rosenbrock with live radius dynamics.

Analog of the reference's src/examples/trust_region_newton_rosenbrock.cc
:1-78: per-iteration callback printing the radius adaptation.  Here the
callback is the framework's live host hook; the trace buffer records the
same history device-side with zero host round-trips.
"""

import os

import jax

jax.config.update("jax_platforms", os.environ.get("EXAMPLES_PLATFORM", "cpu"))
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from cppnumericalsolvers_tpu import minimize, objective, status_message  # noqa: E402
from cppnumericalsolvers_tpu.solvers import TrustRegionNewton  # noqa: E402


def main():
    rosen = objective(
        lambda x: 100.0 * (x[1] - x[0] ** 2) ** 2 + (1.0 - x[0]) ** 2,
        mode="second",
    )

    def live(info):
        print(
            f"  iter {int(info['num_iterations']):3d}"
            f"  f = {float(info['value']): .6e}"
            f"  |g|inf = {float(info['gradient_norm']):.3e}"
        )

    result = minimize(
        rosen, jnp.array([-3.0, -4.0]), TrustRegionNewton(),
        callback=live, trace=128,
    )
    print(
        f"argmin = {np.round(np.asarray(result.state.x), 8)}"
        f"  f = {float(result.state.value):.3e}"
        f"  iters = {int(result.progress.num_iterations)}"
        f"  [{status_message(int(result.progress.status))}]"
    )
    # The device-side trace holds the same history:
    recorded = int(np.sum(np.asarray(result.trace.status) >= 0))
    print(f"trace buffer recorded {recorded} iterations device-side")
    assert float(result.state.value) < 1e-9


if __name__ == "__main__":
    main()
