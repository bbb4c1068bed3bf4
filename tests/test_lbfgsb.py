"""L-BFGS-B tests: bound-constrained convergence, projected-gradient
stopping, Cauchy-point machinery.

Covers the reference's Lbfgsb solver-matrix entries (verify.cc:175) and the
linear_regression example's box-constrained least squares
(src/examples/linear_regression.cc)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cppnumericalsolvers_tpu import Objective, Status, minimize
from cppnumericalsolvers_tpu.models import rosenbrock, sphere
from cppnumericalsolvers_tpu.solvers import Lbfgsb

PRECISION = 1e-4


def test_unbounded_matches_rosenbrock_matrix():
    # With no bounds L-BFGS-B behaves as an unconstrained solver
    # (verify.cc SOLVER_SETUP(Lbfgsb, RosenbrockGradient)).
    for start in ([15.0, 8.0], [-1.0, 2.0]):
        res = minimize(rosenbrock(), jnp.asarray(start), Lbfgsb())
        assert float(res.state.value) == pytest.approx(0.0, abs=PRECISION)


def test_active_bound_optimum():
    # min |x|^2 with x >= 1: optimum pinned at (1, 1); the full gradient is
    # nonzero there but the projected gradient vanishes.
    res = minimize(
        sphere(),
        jnp.array([3.0, 4.0]),
        Lbfgsb(lower=(1.0, 1.0), upper=(10.0, 10.0)),
    )
    np.testing.assert_allclose(np.asarray(res.state.x), [1.0, 1.0], atol=1e-6)
    assert int(res.progress.status) == int(Status.GRADIENT_NORM_VIOLATION)


def test_interior_optimum_with_bounds():
    res = minimize(
        sphere(),
        jnp.array([3.0, -4.0]),
        Lbfgsb(lower=(-5.0, -5.0), upper=(5.0, 5.0)),
    )
    np.testing.assert_allclose(np.asarray(res.state.x), [0.0, 0.0], atol=1e-5)


def test_infeasible_start_is_projected():
    res = minimize(
        sphere(),
        jnp.array([50.0, -50.0]),
        Lbfgsb(lower=(1.0, 1.0), upper=(2.0, 2.0)),
    )
    np.testing.assert_allclose(np.asarray(res.state.x), [1.0, 1.0], atol=1e-6)


def test_rosenbrock_bounded_away_from_optimum():
    # Optimum of Rosenbrock is (1,1); box excludes it, so the solution sits
    # on the boundary x0 <= 0.8.  Known constrained optimum: x0 = 0.8 active,
    # x1 = x0^2 = 0.64 interior.
    res = minimize(
        rosenbrock(),
        jnp.array([0.0, 0.0]),
        Lbfgsb(lower=(-2.0, -2.0), upper=(0.8, 2.0)),
    )
    x = np.asarray(res.state.x)
    assert x[0] == pytest.approx(0.8, abs=1e-4)
    assert x[1] == pytest.approx(0.64, abs=1e-3)


def test_box_constrained_least_squares():
    # The linear_regression.cc example shape: ridge-free least squares with
    # box bounds on the coefficients.
    key = jax.random.PRNGKey(1)
    A = jax.random.normal(key, (30, 4), dtype=jnp.float64)
    w_true = jnp.array([2.0, -1.5, 0.5, 3.0])
    y = A @ w_true

    obj = Objective(lambda w: jnp.sum((A @ w - y) ** 2), mode="first")
    # Box excludes w_true's third coefficient range: clamp w[3] <= 2.
    res = minimize(
        obj,
        jnp.zeros((4,)),
        Lbfgsb(lower=(-5.0, -5.0, -5.0, -5.0), upper=(5.0, 5.0, 5.0, 2.0)),
    )
    x = np.asarray(res.state.x)
    assert x[3] == pytest.approx(2.0, abs=1e-5)  # pinned at the bound
    # Full-box run recovers the exact solution.
    res2 = minimize(
        obj,
        jnp.zeros((4,)),
        Lbfgsb(lower=-5.0, upper=5.0),
    )
    np.testing.assert_allclose(np.asarray(res2.state.x), np.asarray(w_true),
                               atol=1e-4)


def test_batched_bounds():
    from cppnumericalsolvers_tpu import minimize_batched

    starts = jnp.array([[3.0, 3.0], [-3.0, 2.5], [0.1, 0.2]])
    res = minimize_batched(
        sphere(), starts, Lbfgsb(lower=(0.5, -5.0), upper=(5.0, 5.0))
    )
    x = np.asarray(res.state.x)
    np.testing.assert_allclose(x[:, 0], 0.5, atol=1e-6)
    np.testing.assert_allclose(x[:, 1], 0.0, atol=1e-5)


def test_batched_heterogeneous_bounds():
    # Per-lane boxes (the reference's per-problem SetBounds state,
    # lbfgsb.h:124-130): one vmapped batch where every lane carries its own
    # box.  min |x|^2 with lane k's box pinning x >= lower_k, so lane k's
    # optimum is its own lower corner.
    from cppnumericalsolvers_tpu import minimize_batched

    solver = Lbfgsb()
    lowers = jnp.array([[0.5, 0.25], [1.0, 2.0], [-1.0, -1.0]])
    uppers = jnp.full((3, 2), 5.0)
    starts = jnp.array([[3.0, 3.0], [4.0, 4.0], [3.0, 3.0]])
    internals = jax.vmap(
        lambda lo, up: solver.make_internals(2, jnp.float64, lo, up)
    )(lowers, uppers)
    res = minimize_batched(sphere(), starts, solver, internals=internals)
    x = np.asarray(res.state.x)
    np.testing.assert_allclose(x[0], [0.5, 0.25], atol=1e-6)
    np.testing.assert_allclose(x[1], [1.0, 2.0], atol=1e-6)
    np.testing.assert_allclose(x[2], [0.0, 0.0], atol=1e-5)


def test_runtime_bounds_single_solve():
    # Runtime bounds on a single solve via the internals override — no
    # retrace when the box changes (bounds are loop operands, not static
    # config).
    solver = Lbfgsb()
    internals = solver.make_internals(
        2, jnp.float64, jnp.array([1.0, 1.0]), jnp.array([10.0, 10.0])
    )
    res = minimize(
        sphere(), jnp.array([3.0, 4.0]), solver, internals=internals
    )
    np.testing.assert_allclose(np.asarray(res.state.x), [1.0, 1.0], atol=1e-6)


def test_no_redundant_eval_when_step_inside_box():
    # The reference re-evaluates after the line search only when the step
    # crossed a bound (lbfgsb.h:199-203).  On an unbounded quadratic no
    # clipping ever happens, so nfev must be exactly 1 (initial state)
    # + sum of line-search evaluations — verified against a wide-box run
    # whose trajectory never touches the bounds: identical trajectories must
    # report identical nfev.
    res_unbounded = minimize(sphere(), jnp.array([3.0, 4.0]), Lbfgsb())
    res_wide = minimize(
        sphere(), jnp.array([3.0, 4.0]), Lbfgsb(lower=-1e6, upper=1e6)
    )
    assert int(res_unbounded.state.nfev) == int(res_wide.state.nfev)
    np.testing.assert_allclose(
        np.asarray(res_unbounded.state.x), np.asarray(res_wide.state.x)
    )
    # Quadratic from a clean start: More-Thuente accepts alpha=1 in one
    # trial per iteration, so nfev stays tiny; a redundant per-iteration
    # re-eval would show up as ~2x this.
    iters = int(res_unbounded.progress.num_iterations)
    assert int(res_unbounded.state.nfev) <= 2 * iters + 1
