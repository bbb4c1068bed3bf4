"""Adversarial numerical fault-tolerance tests.

SURVEY.md §5 calls the reference's recover-don't-crash guard logic "a
distinguishing feature to preserve"; these tests inject NaN/overflowing
objectives so each guard has a test that FAILS if the guard is removed:

* L-BFGS keeps the last finite iterate when the line search lands on
  non-finite territory (reference: lbfgs.h:234-241);
* BFGS resets a non-PD / NaN inverse-Hessian approximation to the identity
  (bfgs.h:84-92);
* AL multiplier updates reset NaN to 0 and clamp to +/-1e20
  (augmented_lagrangian.h:544-563), and a penalty blow-up (the HS019 class,
  progress.h:231-234) hard-stops with the Pareto best iterate installed;
* Hager-Zhang recovers from a non-finite overshoot (hager_zhang.h:342-355);
* clean solves run under jax.debug_nans without tripping (the sanitizer
  analog, SURVEY.md §5).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cppnumericalsolvers_tpu import (
    Objective,
    Status,
    minimize,
    minimize_batched,
    objective,
)
from cppnumericalsolvers_tpu.core.progress import default_stopping
from cppnumericalsolvers_tpu.models import rosenbrock, sphere
from cppnumericalsolvers_tpu.solvers import Bfgs, Lbfgs


class TestLbfgsNonFiniteGuard:
    def test_log_domain_edge_keeps_finite_iterate(self):
        # min -log(x) + x on x > 0 (optimum x=1): trial points the line
        # search lands on at x <= 0 evaluate to NaN; the solve must end on a
        # finite iterate inside the domain (lbfgs.h:234-241 keeps the last
        # finite state; More-Thuente treats NaN trials as failed decrease).
        obj = objective(lambda x: -jnp.log(x[0]) + x[0], mode="first")
        # x_delta_violations=2 lets the stall-recovery retry (history reset
        # -> steepest descent, solvers/lbfgs.py) re-enter the domain after a
        # NaN overshoot instead of stopping on the first zero-move strike.
        res = minimize(
            obj,
            jnp.array([4.0]),
            Lbfgs(),
            default_stopping(jnp.float64).replace(
                max_iterations=200, x_delta_violations=2
            ),
        )
        assert np.isfinite(float(res.state.value))
        assert np.all(np.isfinite(np.asarray(res.state.x)))
        assert float(res.state.x[0]) == pytest.approx(1.0, abs=1e-5)

    def test_nan_pocket_next_to_minimum(self):
        # f = (x-1)^2 but NaN beyond x > 1.5: line-search overshoots produce
        # NaN trials yet the solve converges to x=1 with finite everything.
        def f(x):
            return jnp.where(x[0] > 1.5, jnp.nan, (x[0] - 1.0) ** 2)

        res = minimize(objective(f, mode="first"), jnp.array([-2.0]), Lbfgs())
        assert np.isfinite(float(res.state.value))
        assert float(res.state.x[0]) == pytest.approx(1.0, abs=1e-4)

    def test_everything_nan_after_start_returns_start(self):
        # Pathological: every point except the start region is NaN.  The
        # guard must return the last finite state, not NaN.
        def f(x):
            return jnp.where(jnp.abs(x[0]) < 0.1, -x[0], jnp.nan)

        res = minimize(
            objective(f, mode="first"),
            jnp.array([0.0]),
            Lbfgs(),
            default_stopping(jnp.float64).replace(max_iterations=20),
        )
        assert np.isfinite(float(res.state.value))
        assert np.all(np.isfinite(np.asarray(res.state.x)))


class TestBfgsReset:
    def test_non_pd_approximation_resets_to_identity(self):
        # Seed the solve with H^{-1} = -I: the direction H^{-1}(-g) is an
        # ASCENT direction (g.d > 0), so without the PD reset (bfgs.h:84-92)
        # the line search cannot decrease and the solve stalls at the start.
        from cppnumericalsolvers_tpu.solvers.bfgs import BfgsInternals

        n = 2
        bad = BfgsInternals(
            inverse_hessian=-jnp.eye(n, dtype=jnp.float64),
            fresh=jnp.zeros((), jnp.bool_),
        )
        res = minimize(sphere(), jnp.array([3.0, 4.0]), Bfgs(), internals=bad)
        np.testing.assert_allclose(
            np.asarray(res.state.x), [0.0, 0.0], atol=1e-5
        )

    def test_nan_approximation_resets_to_identity(self):
        from cppnumericalsolvers_tpu.solvers.bfgs import BfgsInternals

        n = 2
        bad = BfgsInternals(
            inverse_hessian=jnp.full((n, n), jnp.nan, dtype=jnp.float64),
            fresh=jnp.zeros((), jnp.bool_),
        )
        res = minimize(sphere(), jnp.array([3.0, 4.0]), Bfgs(), internals=bad)
        np.testing.assert_allclose(
            np.asarray(res.state.x), [0.0, 0.0], atol=1e-5
        )


class TestAugmentedLagrangianGuards:
    def _al(self):
        from cppnumericalsolvers_tpu.solvers import AugmentedLagrangian

        return AugmentedLagrangian(inner_solver=Lbfgs())

    def test_multiplier_nan_reset_and_clamp(self):
        # augmented_lagrangian.h:544-563: NaN candidates reset to 0; finite
        # candidates clamp to +/- multiplier_max (eq) / [0, max] (ineq).
        al = self._al()
        cand = jnp.array([jnp.nan, 1e30, -1e30, 5.0])
        out = np.asarray(al._clamp_eq(cand))
        np.testing.assert_allclose(out, [0.0, 1e20, -1e20, 5.0])
        cand_i = jnp.array([jnp.nan, 1e30, -3.0, 5.0])
        out_i = np.asarray(al._clamp_ineq(cand_i))
        np.testing.assert_allclose(out_i, [0.0, 1e20, 0.0, 5.0])

    def test_penalty_blowup_returns_finite_best_iterate(self):
        # The HS019 class (progress.h:231-234): unbounded cubic objective
        # with one inequality.  The inner composite is unbounded below (the
        # cubic beats the quadratic PHR term), so inner solves diverge to
        # -inf / NaN violations; the outer loop must hard-stop and install
        # the Pareto-best FINITE iterate, never return NaN.
        from cppnumericalsolvers_tpu.core.problem import ConstrainedProblem

        problem = ConstrainedProblem(
            objective=Objective(lambda x: x[0] ** 3, mode="first"),
            inequality_constraints=(
                Objective(lambda x: x[0], mode="first"),  # x >= 0
            ),
        )
        al = self._al()
        res = al.minimize(
            problem,
            jnp.array([1.0]),
            stopping=default_stopping(jnp.float64).replace(max_iterations=8),
        )
        assert np.all(np.isfinite(np.asarray(res.state.x)))
        assert int(res.progress.status) != int(Status.CONTINUE)


class TestHagerZhangOverflowRecovery:
    def test_overshoot_into_inf_recovers(self):
        # phi(a) = exp(10a) - 20a: descent at 0 (phi'(0) = -10), minimiser
        # a* = ln(2)/10 ~ 0.0693, but the initial step lands at exp(1000) =
        # inf.  The non-finite overshoot recovery (hager_zhang.h:342-355)
        # must shrink back and return a finite step that decreases phi.
        from cppnumericalsolvers_tpu.linesearch.hager_zhang import hager_zhang

        fn = lambda x: jnp.exp(10.0 * x[0]) - 20.0 * x[0]  # noqa: E731
        vag = jax.value_and_grad(fn)
        x = jnp.array([0.0], dtype=jnp.float64)
        f0, g0 = vag(x)
        res = hager_zhang(
            vag, x, f0, g0, jnp.array([1.0], dtype=jnp.float64),
            jnp.asarray(100.0, jnp.float64),
        )
        assert np.isfinite(float(res.alpha))
        assert np.isfinite(float(res.f))
        assert float(res.f) < float(f0)

    def test_lbfgs_with_hz_on_overflowing_objective(self):
        # End-to-end: the same overflow inside a full L-BFGS solve with the
        # HZ search — converges to the analytic minimiser.
        obj = objective(
            lambda x: jnp.exp(10.0 * x[0]) - 20.0 * x[0], mode="first"
        )
        res = minimize(
            obj, jnp.array([0.0]), Lbfgs(line_search="hager_zhang")
        )
        assert float(res.state.x[0]) == pytest.approx(
            np.log(2.0) / 10.0, abs=1e-5
        )


class TestDebugNansCleanPaths:
    def test_clean_solves_under_debug_nans(self):
        # The sanitizer analog (SURVEY.md §5): well-posed solves must not
        # produce NaN outputs even with JAX's NaN checker armed.
        with jax.debug_nans(True):
            res = minimize(rosenbrock(), jnp.array([-1.0, 2.0]), Lbfgs())
            assert np.isfinite(float(res.state.value))
            res_b = minimize_batched(
                sphere(),
                jnp.array([[3.0, 4.0], [-1.0, 2.0]]),
                Bfgs(),
            )
            assert np.all(np.isfinite(np.asarray(res_b.state.value)))
