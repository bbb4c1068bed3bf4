"""Batched augmented-Lagrangian solves: per-lane multipliers and penalties.

The reference solves one constrained problem at a time; the TPU-native AL
vmaps the whole outer loop so every lane carries its own (lambda, mu, rho)
trajectory (SURVEY.md §2 #22).  Each lane must match its sequential solve.
"""

import jax.numpy as jnp
import numpy as np

from cppnumericalsolvers_tpu import ConstrainedProblem, objective
from cppnumericalsolvers_tpu.solvers import AugmentedLagrangian, Lbfgs


def _circle_problem():
    # min x0 + x1  s.t.  x0^2 + x1^2 = 2  ->  x* = (-1, -1), lambda* = 0.5
    return ConstrainedProblem(
        objective=objective(lambda x: x[0] + x[1], mode="second"),
        equality_constraints=(
            objective(lambda x: x[0] ** 2 + x[1] ** 2 - 2.0, mode="second"),
        ),
    )


def test_batched_al_matches_sequential():
    problem = _circle_problem()
    al = AugmentedLagrangian(inner_solver=Lbfgs())
    starts = jnp.asarray(
        [[2.0, 1.0], [0.5, 2.5], [-0.3, 1.7], [3.0, -2.0]]
    )

    batched = al.minimize_batched(problem, starts)
    assert batched.state.x.shape == (4, 2)
    for lane in range(starts.shape[0]):
        single = al.minimize(problem, starts[lane])
        np.testing.assert_allclose(
            np.asarray(batched.state.x[lane]),
            np.asarray(single.state.x),
            rtol=1e-12,
        )
        np.testing.assert_allclose(
            float(batched.state.multipliers.equality[lane, 0]),
            float(single.state.multipliers.equality[0]),
            rtol=1e-12,
        )

    # Every lane lands on the analytic optimum and multiplier.
    np.testing.assert_allclose(
        np.asarray(batched.state.x), np.full((4, 2), -1.0), atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(batched.state.multipliers.equality[:, 0]),
        np.full(4, 0.5),
        atol=1e-3,
    )
