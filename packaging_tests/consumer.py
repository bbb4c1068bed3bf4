"""Asserting downstream consumer — the packaging-test payload.

The analog of the reference's Dockerfile.test quick-start binary (its
main.cpp asserts the README quadratic solves to f*=5 within 1e-4): drives
the INSTALLED package through its public API only, and asserts results, so
a broken wheel/sdist fails loudly.

Run from a clean virtualenv where `cppnumericalsolvers-tpu` was installed:
    python consumer.py
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

import cppnumericalsolvers_tpu as cns  # noqa: E402
from cppnumericalsolvers_tpu.solvers import (  # noqa: E402
    AugmentedLagrangian,
    Lbfgs,
    Lbfgsb,
)


def main():
    # 1. The README quick-start quadratic (reference README.md:20-36,
    #    Dockerfile.test assert block): f = 5x0^2 + 100x1^2 + 5 from
    #    (-10, 2) -> x* = (0, 0), f* = 5 within 1e-4.
    obj = cns.objective(
        lambda x: 5.0 * x[0] ** 2 + 100.0 * x[1] ** 2 + 5.0, mode="first"
    )
    res = cns.minimize(obj, jnp.array([-10.0, 2.0]), Lbfgs())
    assert abs(float(res.state.value) - 5.0) < 1e-4, res.state
    assert np.max(np.abs(np.asarray(res.state.x))) < 1e-2, res.state

    # 2. Batched solve with per-instance results.
    starts = jnp.array([[-10.0, 2.0], [3.0, -4.0], [0.5, 0.5]])
    res_b = cns.minimize_batched(obj, starts, Lbfgs())
    assert np.allclose(np.asarray(res_b.state.value), 5.0, atol=1e-4)

    # 3. Box-constrained L-BFGS-B pins the active bound.
    sphere = cns.objective(lambda x: jnp.sum(x * x), mode="first")
    res_box = cns.minimize(
        sphere, jnp.array([3.0, 4.0]), Lbfgsb(lower=(1.0, 1.0), upper=10.0)
    )
    assert np.allclose(np.asarray(res_box.state.x), [1.0, 1.0], atol=1e-5)

    # 4. Constrained AL: min x0 + x1 on the unit circle -> (-1/sqrt2 each)?
    #    Use the reference's constrained_simple2 shape: min x0 + x1 s.t.
    #    x0^2 + x1^2 = 2 -> (-1, -1).
    problem = cns.ConstrainedProblem(
        objective=cns.objective(lambda x: x[0] + x[1], mode="first"),
        equality_constraints=(
            cns.objective(lambda x: x[0] ** 2 + x[1] ** 2 - 2.0, mode="first"),
        ),
    )
    al = AugmentedLagrangian(inner_solver=Lbfgs())
    res_al = al.minimize(problem, jnp.array([2.0, 1.0]))
    assert np.allclose(np.asarray(res_al.state.x), [-1.0, -1.0], atol=1e-3)

    print("packaging consumer: all assertions passed")


if __name__ == "__main__":
    main()
