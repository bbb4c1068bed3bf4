"""Quick-start: minimize f(x) = 5 x0^2 + 100 x1^2 + 5 from (-10, 2).

Analog of the reference's src/examples/simple.cc:1-90 (and the README
quick-start, README.md:20-36): solve the same quadratic with every solver in
the suite and print argmin / f / iterations / status.

Run:  python examples/quickstart.py [solver]
      solver in {gd, cg, newton, bfgs, lbfgs, lbfgsb, tr, nm, all}
"""

import sys

import os

import jax

# Tiny 2-D demos run on the CPU backend by default (the TPU value story is
# the batched/sharded path — see bench.py and examples/pod_scale.py).  Set
# EXAMPLES_PLATFORM=tpu to force the accelerator.
jax.config.update("jax_platforms", os.environ.get("EXAMPLES_PLATFORM", "cpu"))
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

from cppnumericalsolvers_tpu import minimize, objective, status_message  # noqa: E402
from cppnumericalsolvers_tpu.solvers import (  # noqa: E402
    Bfgs,
    ConjugateGradientDescent,
    GradientDescent,
    Lbfgs,
    Lbfgsb,
    NelderMead,
    NewtonDescent,
    TrustRegionNewton,
)

SOLVERS = {
    "gd": GradientDescent(),
    "cg": ConjugateGradientDescent(),
    "newton": NewtonDescent(),
    "bfgs": Bfgs(),
    "lbfgs": Lbfgs(),
    "lbfgsb": Lbfgsb(),
    "tr": TrustRegionNewton(),
    "nm": NelderMead(),
}


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    names = list(SOLVERS) if which == "all" else [which]

    # Second-mode objective: every solver (incl. Newton/TR) can consume it.
    f = objective(
        lambda x: 5.0 * x[0] ** 2 + 100.0 * x[1] ** 2 + 5.0, mode="second"
    )
    x0 = jnp.array([-10.0, 2.0])

    for name in names:
        result = minimize(f, x0, SOLVERS[name])
        x = result.state.x
        print(
            f"{name:7s} argmin = ({float(x[0]): .3e}, {float(x[1]): .3e})"
            f"  f = {float(result.state.value):.6f}"
            f"  iters = {int(result.progress.num_iterations)}"
            f"  nfev = {int(result.state.nfev)}"
            f"  [{status_message(int(result.progress.status))}]"
        )
        assert abs(float(result.state.value) - 5.0) < 1e-4, name


if __name__ == "__main__":
    main()
