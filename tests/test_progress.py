"""Unit tests for the convergence state machine.

Directly exercises ``update_progress`` against the reference's
``Progress::Update`` semantics (reference: include/cppoptlib/solver/
progress.h:153-327): test ordering, violation counters, relative gradient
norm, factr-style relative f-delta, the plateau ring buffer, and the
constrained branch's NaN hard-stop and KKT gate."""

import jax.numpy as jnp
import pytest

from cppnumericalsolvers_tpu import (
    FunctionState,
    Status,
    default_stopping,
    init_progress,
)
from cppnumericalsolvers_tpu.core.progress import (
    update_progress,
    update_progress_constrained,
)


def state(x, value, gradient):
    return FunctionState(
        x=jnp.asarray(x, jnp.float64),
        value=jnp.asarray(value, jnp.float64),
        gradient=jnp.asarray(gradient, jnp.float64),
        nfev=jnp.zeros((), jnp.int32),
    )


def crit(**kwargs):
    c = default_stopping(jnp.float64).replace(
        # Isolate tests: disable everything by default.
        x_delta=0.0, f_delta=0.0, gradient_norm=0.0, past=0,
        max_iterations=0,
    )
    return c.replace(**kwargs)


PREV = state([1.0, 1.0], 10.0, [1.0, 1.0])


def test_iteration_limit_uses_strictly_greater():
    # IterationLimit fires when num_iterations > cap (progress.h:212-216):
    # with cap=1 the first update continues, the second stops.
    c = crit(max_iterations=1)
    p = init_progress(jnp.float64)
    p = update_progress(p, PREV, state([2.0, 1.0], 9.0, [1, 1]), c)
    assert int(p.status) == int(Status.CONTINUE)
    p = update_progress(p, PREV, state([2.0, 1.0], 9.0, [1, 1]), c)
    assert int(p.status) == int(Status.ITERATION_LIMIT)


def test_x_delta_violation_counter():
    # Two-strike counter: first small step continues, second stops
    # (progress.h:254-262).
    c = crit(x_delta=1e-3, x_delta_violations=2)
    p = init_progress(jnp.float64)
    tiny = state([1.0 + 1e-5, 1.0], 9.0, [1, 1])
    p = update_progress(p, PREV, tiny, c)
    assert int(p.status) == int(Status.CONTINUE)
    assert int(p.x_delta_violations) == 1
    p = update_progress(p, tiny, state([1.0 + 2e-5, 1.0], 8.0, [1, 1]), c)
    assert int(p.status) == int(Status.X_DELTA_VIOLATION)


def test_x_delta_counter_resets_on_large_step():
    c = crit(x_delta=1e-3, x_delta_violations=2)
    p = init_progress(jnp.float64)
    p = update_progress(p, PREV, state([1.0 + 1e-5, 1.0], 9.0, [1, 1]), c)
    assert int(p.x_delta_violations) == 1
    p = update_progress(
        p, PREV, state([2.0, 1.0], 8.0, [1, 1]), c
    )  # big step
    assert int(p.x_delta_violations) == 0
    assert int(p.status) == int(Status.CONTINUE)


def test_f_delta_absolute():
    c = crit(f_delta=1e-2, f_delta_violations=1)
    p = init_progress(jnp.float64)
    p = update_progress(p, PREV, state([2.0, 1.0], 10.0 - 1e-3, [1, 1]), c)
    assert int(p.status) == int(Status.F_DELTA_VIOLATION)


def test_f_delta_relative_factr_semantics():
    # Relative test scales by max(|f_cur|, |f_prev|, 1) (progress.h:263-277).
    c = crit(f_delta=1e-3, f_delta_relative=True)
    p = init_progress(jnp.float64)
    big_prev = state([1.0, 1.0], 1000.0, [1, 1])
    # |delta f| = 0.5 > 1e-3 absolute, but 0.5 < 1e-3 * 1000 relative.
    p = update_progress(p, big_prev, state([2.0, 1.0], 999.5, [1, 1]), c)
    assert int(p.status) == int(Status.F_DELTA_VIOLATION)


def test_gradient_norm_relative_scaling():
    # |g|inf < tol * max(1, |x|inf) (progress.h:299-317): at |x|inf = 1000 a
    # gradient of 5e-3 passes the 1e-5 relative test.
    c = crit(gradient_norm=1e-5)
    p = init_progress(jnp.float64)
    cur = state([1000.0, 0.0], 5.0, [5e-3, 0.0])
    p = update_progress(p, PREV, cur, c)
    assert int(p.status) == int(Status.GRADIENT_NORM_VIOLATION)
    # Absolute mode refuses the same state.
    c_abs = c.replace(gradient_norm_relative=False)
    p2 = init_progress(jnp.float64)
    p2 = update_progress(p2, PREV, cur, c_abs)
    assert int(p2.status) == int(Status.CONTINUE)


def test_plateau_ring_buffer():
    # past=3: the test fires on iteration 4 when f hasn't moved relative to
    # f from 3 iterations ago (progress.h:280-298).
    c = crit(past=3, past_delta=1e-6)
    p = init_progress(jnp.float64)
    flat = 5.0
    cur = state([2.0, 1.0], flat, [1, 1])
    for k in range(3):
        p = update_progress(p, PREV, cur, c)
        assert int(p.status) == int(Status.CONTINUE), k
    p = update_progress(p, PREV, cur, c)
    assert int(p.status) == int(Status.F_DELTA_VIOLATION)


def test_plateau_does_not_fire_when_descending():
    c = crit(past=3, past_delta=1e-6)
    p = init_progress(jnp.float64)
    prev = PREV
    for k in range(6):
        cur = state([2.0 + k, 1.0], 10.0 - (k + 1), [1, 1])
        p = update_progress(p, prev, cur, c)
        assert int(p.status) == int(Status.CONTINUE)
        prev = cur


def test_hessian_condition_violation_fires_end_to_end():
    # The HessianConditionViolation criterion (progress.h:197-208, :318-325)
    # must be live, not dead wiring: Newton on an ill-conditioned quadratic
    # (cond(H) ~ 1e8) with the threshold at 1e4 stops with the dedicated
    # status on the first update.
    import jax.numpy as jnp

    from cppnumericalsolvers_tpu import minimize, objective
    from cppnumericalsolvers_tpu.solvers import NewtonDescent

    def ill_conditioned(x):
        return 0.5 * (x[0] ** 2 + 1e8 * x[1] ** 2)

    obj = objective(ill_conditioned, mode="second")
    c = default_stopping(jnp.float64).replace(condition_hessian=1e4)
    res = minimize(obj, jnp.array([1.0, 1.0]), NewtonDescent(), c)
    assert int(res.progress.status) == int(Status.HESSIAN_CONDITION_VIOLATION)
    assert float(res.progress.condition_hessian) > 1e4

    # Disabled threshold (the presets' default 0): the criterion is inert
    # and the same solve runs to its gradient-norm stop.
    res2 = minimize(obj, jnp.array([1.0, 1.0]), NewtonDescent())
    assert int(res2.progress.status) != int(
        Status.HESSIAN_CONDITION_VIOLATION
    )


def test_hessian_condition_supplied_metric_unit():
    # Unit-level: the metric only fires when supplied and above threshold.
    c = crit(condition_hessian=1e3)
    p = init_progress(jnp.float64)
    cur = state([2.0, 1.0], 9.0, [1, 1])
    p = update_progress(p, PREV, cur, c, condition_hessian=jnp.asarray(1e6))
    assert int(p.status) == int(Status.HESSIAN_CONDITION_VIOLATION)
    p2 = init_progress(jnp.float64)
    p2 = update_progress(p2, PREV, cur, c, condition_hessian=jnp.asarray(10.0))
    assert int(p2.status) == int(Status.CONTINUE)
    p3 = init_progress(jnp.float64)
    p3 = update_progress(p3, PREV, cur, c)  # no metric supplied => inert
    assert int(p3.status) == int(Status.CONTINUE)


def test_none_mode_skips_gradient_test():
    c = crit(gradient_norm=1e-5)
    p = init_progress(jnp.float64)
    cur = state([2.0, 1.0], 9.0, [0.0, 0.0])  # zero gradient slot
    p = update_progress(p, PREV, cur, c, mode="none")
    assert int(p.status) == int(Status.CONTINUE)


class TestConstrainedBranch:
    def _update(self, violation, kkt, c=None):
        c = c or default_stopping(jnp.float64)
        p = init_progress(jnp.float64)
        return update_progress_constrained(
            p,
            jnp.array([1.0]), jnp.array([2.0]),
            jnp.asarray(10.0), jnp.asarray(9.0),
            jnp.asarray(1.0),
            jnp.asarray(violation), jnp.asarray(kkt), c,
        )

    def test_feasible_and_stationary_finishes(self):
        p = self._update(1e-6, 1e-5)
        assert int(p.status) == int(Status.FINISHED)

    def test_feasible_but_not_stationary_continues(self):
        p = self._update(1e-6, 1.0)
        assert int(p.status) == int(Status.CONTINUE)

    def test_infeasible_continues(self):
        p = self._update(1.0, 1e-5)
        assert int(p.status) == int(Status.CONTINUE)

    def test_nan_violation_hard_stops(self):
        p = self._update(float("nan"), 1e-5)
        assert int(p.status) == int(Status.ITERATION_LIMIT)

    def test_disabled_kkt_threshold_falls_back_to_feasibility(self):
        c = default_stopping(jnp.float64).replace(
            kkt_stationarity_threshold=-1.0
        )
        p = self._update(1e-6, 1e3, c)
        assert int(p.status) == int(Status.FINISHED)


def test_hessian_condition_solver_independent_lbfgs():
    # The reference computes cond(H) inside Progress::Update for EVERY
    # second-mode function regardless of solver (progress.h:203-210) — an
    # L-BFGS solve of a second-mode objective with condition_hessian set
    # must fire the criterion even though Lbfgs never materialises H.  The
    # driver evaluates it (billed +1 nfev/iteration, the reference's extra
    # Hessian call).
    import jax.numpy as jnp

    from cppnumericalsolvers_tpu import minimize, objective
    from cppnumericalsolvers_tpu.solvers import Lbfgs

    def ill_conditioned(x):
        return 0.5 * (x[0] ** 2 + 1e8 * x[1] ** 2)

    obj = objective(ill_conditioned, mode="second")
    c = default_stopping(jnp.float64).replace(condition_hessian=1e4)
    res = minimize(obj, jnp.array([1.0, 1.0]), Lbfgs(), c)
    assert int(res.progress.status) == int(Status.HESSIAN_CONDITION_VIOLATION)
    assert float(res.progress.condition_hessian) > 1e4

    # With the criterion disabled (default 0) the driver must NOT pay the
    # per-iteration Hessian evaluation: nfev identical to a first-mode solve.
    res_off = minimize(obj, jnp.array([1.0, 1.0]), Lbfgs())
    res_first = minimize(
        objective(ill_conditioned, mode="first"),
        jnp.array([1.0, 1.0]),
        Lbfgs(),
    )
    assert int(res_off.state.nfev) == int(res_first.state.nfev)
    assert int(res_off.progress.status) != int(
        Status.HESSIAN_CONDITION_VIOLATION
    )


def test_oversized_past_clamps_to_ring_capacity():
    """past > PAST_RING_SIZE degrades to the documented window instead of
    silently disabling the plateau test (advisor round-3): the one-hot ring
    read would return 0.0 once past_pos wraps beyond the ring."""
    from cppnumericalsolvers_tpu.core.progress import (
        PAST_RING_SIZE,
        default_stopping,
    )

    crit = default_stopping(jnp.float64).replace(past=PAST_RING_SIZE + 5)
    assert int(crit.past) == PAST_RING_SIZE
    # And a flat objective still terminates via the plateau test.
    from cppnumericalsolvers_tpu import minimize, objective
    from cppnumericalsolvers_tpu.solvers import Lbfgs

    flat = objective(lambda x: jnp.sum(0.0 * x) + 1.0, mode="first")
    r = minimize(flat, jnp.asarray([1.0, -2.0]), Lbfgs(), crit)
    assert int(r.progress.num_iterations) < 30
