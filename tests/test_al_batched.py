"""Batched augmented-Lagrangian solves: per-lane multipliers and penalties.

The reference solves one constrained problem at a time; the TPU-native AL
vmaps the whole outer loop so every lane carries its own (lambda, mu, rho)
trajectory (SURVEY.md §2 #22).  Each lane must match its sequential solve.
"""

import jax.numpy as jnp
import numpy as np

from cppnumericalsolvers_tpu import ConstrainedProblem, objective
from cppnumericalsolvers_tpu.core.status import Status
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


def test_al_runtime_per_lane_bounds():
    # The reference's AL picks up whatever bounds the inner L-BFGS-B holds
    # (lbfgsb.h:124-130 via augmented_lagrangian.h:347-353) and projects the
    # KKT norm onto them (:577-604).  Here: per-lane runtime boxes via
    # inner_internals — min x0+x1 on the circle with a per-lane floor on x0
    # only, so each lane's box-constrained optimum is the analytic
    # (floor, -sqrt(2 - floor^2)).  The floor is deliberately NOT applied to
    # x1: a floor on both coordinates makes the infeasible box corner
    # (floor, floor) an attractor where the projected AL gradient vanishes,
    # and the outer loop then spins to its iteration limit without
    # converging — a pathology, not a test of bound plumbing.
    import jax

    from cppnumericalsolvers_tpu.core.progress import default_stopping
    from cppnumericalsolvers_tpu.solvers import Lbfgsb

    problem = _circle_problem()
    inner = Lbfgsb()  # config bounds: unbounded
    al = AugmentedLagrangian(inner_solver=inner)
    floors = np.array([-2.0, -0.5, 0.0], dtype=np.float64)
    n = 2
    lowers = jnp.asarray(
        np.stack([np.asarray([f, -10.0]) for f in floors])
    )
    uppers = jnp.full((3, n), 10.0)
    internals = jax.vmap(
        lambda lo, up: inner.make_internals(n, jnp.float64, lo, up)
    )(lowers, uppers)
    starts = jnp.asarray([[2.0, -1.0]] * 3)
    # All lanes converge in < 10 outer iterations; the cap only bounds the
    # damage if a regression reintroduces a non-converging lane (a vmapped
    # batch runs until its slowest lane finishes).
    stop = default_stopping(jnp.float64)._replace(
        max_iterations=jnp.int32(50)
    )

    batched = al.minimize_batched(
        problem, starts, inner_internals=internals, stopping=stop
    )
    for lane in range(3):
        single = al.minimize(
            problem,
            starts[lane],
            inner_internals=inner.make_internals(
                n, jnp.float64, lowers[lane], uppers[lane]
            ),
            stopping=stop,
        )
        # rtol 1e-8, not bitwise: since round 5 the batched lowering is the
        # batch-native nested loop (_al_minimize_batched_jit), an equivalent
        # but differently-scheduled program whose f64 reductions reorder —
        # observed drift ~3e-10 on this problem.  The analytic-optimum
        # assertions below still pin correctness absolutely.
        np.testing.assert_allclose(
            np.asarray(batched.state.x[lane]),
            np.asarray(single.state.x),
            rtol=1e-8,
            atol=1e-9,
        )
        np.testing.assert_allclose(
            float(batched.state.max_lagrangian_gradient[lane]),
            float(single.state.max_lagrangian_gradient),
            rtol=1e-8,
            atol=1e-9,
        )
        # Bounds honoured per lane; every lane reached its analytic
        # box-constrained optimum (floor, -sqrt(2-floor^2)) — for the
        # unconstraining floor -2 that is (-1, -1).
        assert np.all(
            np.asarray(batched.state.x[lane]) >= lowers[lane] - 1e-8
        )
        f = floors[lane]
        expect = (
            [-1.0, -1.0]
            if f <= -1.0
            else [f, -np.sqrt(2.0 - f * f)]
        )
        np.testing.assert_allclose(
            np.asarray(batched.state.x[lane]), expect, atol=1e-3
        )
        assert int(batched.progress.status[lane]) == int(Status.FINISHED)
