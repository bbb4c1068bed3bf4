"""Trust-region Newton tests: convergence, CG-Steihaug branch coverage,
radius invariants, stopping plumbing.

Port of the reference's sectioned TR suite
(reference: src/test/trust_region_newton_test.cc).  The C++ observes the
first accepted step through a callback; here the step function is pure, so
the first step is tested by calling ``solver.step`` directly."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from cppnumericalsolvers_tpu import Objective, Status, default_stopping, minimize
from cppnumericalsolvers_tpu.models import rosenbrock
from cppnumericalsolvers_tpu.solvers import TrustRegionNewton

# f = 3 x0^2 + 10 x1^2 (trust_region_newton_test.cc:46-60).
convex_quadratic = Objective(
    lambda x: 3.0 * x[0] ** 2 + 10.0 * x[1] ** 2, mode="second"
)
# f = 0.5 (x0^2 - x1^2), indefinite (:95-111).
indefinite_quadratic = Objective(
    lambda x: 0.5 * (x[0] ** 2 - x[1] ** 2), mode="second"
)
# f = (x^2 - 2)^2 (:113-128).
quartic_double_well = Objective(
    lambda x: (x[0] ** 2 - 2.0) ** 2, mode="second"
)


def _first_step(solver, objective, x0):
    state0 = objective.evaluate(jnp.asarray(x0), nfev=0)
    internals0 = solver.init(objective, state0)
    stopping = default_stopping(jnp.float64)
    new_state, _ = solver.step(objective, state0, internals0, stopping)
    return np.asarray(state0.x), np.asarray(new_state.x)


# -- Section A: basic convergence ------------------------------------------


def test_strictly_convex_quadratic_converges_quickly():
    res = minimize(
        convex_quadratic, jnp.array([5.0, 5.0]), TrustRegionNewton()
    )
    np.testing.assert_allclose(np.asarray(res.state.x), [0.0, 0.0], atol=1e-8)
    assert int(res.progress.num_iterations) <= 10


def test_rosenbrock_converges_from_standard_start():
    res = minimize(
        rosenbrock(), jnp.array([-1.2, 1.0]), TrustRegionNewton()
    )
    np.testing.assert_allclose(np.asarray(res.state.x), [1.0, 1.0], atol=1e-5)
    assert int(res.progress.num_iterations) < 80


# -- Section B: CG-Steihaug branch coverage --------------------------------


def test_trust_region_boundary_exit_respects_radius():
    # From (5,5) the Newton step norm is sqrt(50) > 0.5, so the first
    # accepted step must land exactly on the initial radius (:191-212).
    x0, x1 = _first_step(
        TrustRegionNewton(initial_radius=0.5), convex_quadratic, [5.0, 5.0]
    )
    assert np.linalg.norm(x1 - x0) == pytest.approx(0.5, abs=1e-10)


def test_indefinite_hessian_negative_curvature_step_is_bounded():
    x0, x1 = _first_step(
        TrustRegionNewton(initial_radius=1.0),
        indefinite_quadratic,
        [0.1, 0.5],
    )
    step_norm = np.linalg.norm(x1 - x0)
    assert step_norm <= 1.0 + 1e-10
    assert step_norm > 0.0
    assert np.isfinite(x1).all()


def test_interior_newton_step_reaches_closed_form_minimiser():
    res = minimize(
        convex_quadratic,
        jnp.array([1.0, 1.0]),
        TrustRegionNewton(initial_radius=100.0),
        default_stopping(jnp.float64).replace(gradient_norm=1e-12),
    )
    np.testing.assert_allclose(np.asarray(res.state.x), [0.0, 0.0], atol=1e-10)
    assert int(res.progress.num_iterations) <= 3


# -- Section C: radius invariants ------------------------------------------


def test_quartic_double_well_converges_despite_degenerate_start():
    res = minimize(
        quartic_double_well,
        jnp.array([0.1]),
        TrustRegionNewton(initial_radius=0.5),
        default_stopping(jnp.float64).replace(
            gradient_norm=1e-10, max_iterations=100
        ),
    )
    assert abs(float(res.state.x[0])) == pytest.approx(
        math.sqrt(2.0), abs=1e-6
    )
    assert int(res.progress.num_iterations) < 50


def test_max_radius_cap_is_enforced():
    res = minimize(
        convex_quadratic,
        jnp.array([100.0, -100.0]),
        TrustRegionNewton(initial_radius=0.5, max_radius=2.0),
        default_stopping(jnp.float64).replace(
            gradient_norm=1e-10, max_iterations=200
        ),
    )
    np.testing.assert_allclose(np.asarray(res.state.x), [0.0, 0.0], atol=1e-8)
    assert int(res.progress.num_iterations) < 150


# -- Section D: stopping plumbing ------------------------------------------


def test_gradient_norm_stop_fires():
    res = minimize(
        convex_quadratic,
        jnp.array([3.0, 3.0]),
        TrustRegionNewton(),
        default_stopping(jnp.float64).replace(
            gradient_norm=1e-4, max_iterations=100
        ),
    )
    assert int(res.progress.status) == int(Status.GRADIENT_NORM_VIOLATION)
    assert int(res.progress.num_iterations) < 10


def test_iteration_limit_stop_fires():
    res = minimize(
        rosenbrock(),
        jnp.array([-1.2, 1.0]),
        TrustRegionNewton(),
        default_stopping(jnp.float64).replace(
            max_iterations=1, gradient_norm=1e-16
        ),
    )
    assert int(res.progress.status) == int(Status.ITERATION_LIMIT)
