"""Constrained optimization via the augmented-Lagrangian outer loop.

Analogs of the reference's src/examples/constrained_simple.cc:1-136 and
constrained_simple2.cc:1-91:

1. minimize (x0-1)^2 + (x1-2)^2  s.t.  x0 + x1 = 2  and  x1 - x0 >= 1
   -> x* = (0.5, 1.5)
2. minimize x0 + x1              s.t.  x0^2 + x1^2 = 2
   -> x* = (-1, -1)
"""

import os

import jax

jax.config.update("jax_platforms", os.environ.get("EXAMPLES_PLATFORM", "cpu"))
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from cppnumericalsolvers_tpu import ConstrainedProblem, objective, status_message  # noqa: E402
from cppnumericalsolvers_tpu.solvers import AugmentedLagrangian, Lbfgs  # noqa: E402


def report(tag, result, expect):
    x = np.asarray(result.state.x)
    print(
        f"{tag}: x = {np.round(x, 6)}  (expect {expect})"
        f"  violation = {float(result.state.max_violation):.2e}"
        f"  outer iters = {int(result.progress.num_iterations)}"
        f"  [{status_message(int(result.progress.status))}]"
    )
    assert np.allclose(x, expect, atol=1e-3), tag


def main():
    al = AugmentedLagrangian(inner_solver=Lbfgs())

    # 1. Quadratic with one equality and one inequality.
    problem1 = ConstrainedProblem(
        objective=objective(
            lambda x: (x[0] - 1.0) ** 2 + (x[1] - 2.0) ** 2, mode="second"
        ),
        equality_constraints=(
            objective(lambda x: x[0] + x[1] - 2.0, mode="second"),
        ),
        inequality_constraints=(
            objective(lambda x: x[1] - x[0] - 1.0, mode="second"),
        ),
    )
    r1 = al.minimize(problem1, jnp.array([5.0, -3.0]))
    report("eq+ineq quadratic", r1, (0.5, 1.5))
    print("   multipliers: lambda =", np.asarray(r1.state.multipliers.equality),
          " mu =", np.asarray(r1.state.multipliers.inequality))

    # 2. Linear objective on the circle x0^2 + x1^2 = 2.
    problem2 = ConstrainedProblem(
        objective=objective(lambda x: x[0] + x[1], mode="second"),
        equality_constraints=(
            objective(lambda x: x[0] ** 2 + x[1] ** 2 - 2.0, mode="second"),
        ),
    )
    r2 = al.minimize(problem2, jnp.array([2.0, 1.0]))
    report("linear on circle", r2, (-1.0, -1.0))


if __name__ == "__main__":
    main()
