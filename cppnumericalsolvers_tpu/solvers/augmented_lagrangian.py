"""Augmented-Lagrangian outer loop for generally-constrained problems.

TPU-native port of the reference's AugmentedLagrangian
(reference: include/cppoptlib/solver/augmented_lagrangian.h:94-713).  The
whole nested solve — outer multiplier loop around an inner unconstrained
solver — is ONE traced ``lax.while_loop``: the warm-up schedule's different
inner iteration caps are dynamic operands of the inner loop's stopping
criteria (no re-jit per outer iteration), and the best-iterate tracker is a
pytree in the loop carry.  Behaviours preserved exactly:

* first-order multiplier updates ``lambda += rho c``, ``mu = max(0, mu -
  rho g)`` with the +/-1e20 clamp and NaN reset (:360-387, :545-563);
* auto-scaled initial penalty balancing |f(x0)| against active-constraint
  mass (:301-318, :476-499);
* subproblem warm-up: 10 inner iterations at 1e-2 gradient tolerance on the
  first outer iteration of generally-constrained problems, and the inner
  f_delta test disabled on every outer iteration (:530-543);
* conditional penalty growth (x10 unless the violation shrank to a quarter,
  :435-441);
* KKT stationarity via the raw or box-projected Lagrangian-gradient sup-norm
  (projected when the inner solver is L-BFGS-B, :44-61, :577-604);
* the Pareto (feasible-first, then objective) best-iterate filter with NaN
  guards, installed on the returned state (:412-426, :633-712).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..core.driver import SolverBase, _make_body, _solve_loop
from ..core.penalty import (
    MultiplierState,
    lagrangian_gradient,
    to_augmented_lagrangian,
)
from ..core.problem import ConstrainedProblem
from ..core.progress import (
    ProgressState,
    StoppingCriteria,
    default_stopping,
    init_progress,
    update_progress_constrained,
)
from ..core.status import Status
from ..core.tree import tree_where
from .lbfgsb import Lbfgsb, projected_gradient_inf_norm

__all__ = ["AugmentedLagrangian", "AugmentedLagrangeState", "AlResult"]


class AugmentedLagrangeState(NamedTuple):
    """Outer-loop state (augmented_lagrangian.h:163-238)."""

    x: jax.Array
    multipliers: MultiplierState
    penalty: jax.Array  # rho
    max_violation: jax.Array
    max_lagrangian_gradient: jax.Array
    penalty_was_auto_scaled: jax.Array  # bool
    nfev: jax.Array  # int32 cumulative composite/objective evaluations


class _BestTracker(NamedTuple):
    """Pareto best-iterate tracker (augmented_lagrangian.h:624-712)."""

    recorded: jax.Array  # bool
    x: jax.Array
    multipliers: MultiplierState
    penalty: jax.Array
    objective: jax.Array
    violation: jax.Array
    kkt: jax.Array


class AlResult(NamedTuple):
    state: AugmentedLagrangeState
    progress: ProgressState


@dataclasses.dataclass(frozen=True)
class AugmentedLagrangian:
    """Config defaults match AugmentedLagrangianConfig
    (augmented_lagrangian.h:94-161)."""

    inner_solver: SolverBase
    penalty_growth_factor: float = 10.0
    violation_shrink_ratio: float = 0.25
    auto_scale_initial_penalty: bool = True
    penalty_auto_objective_scale: float = 10.0
    penalty_auto_min: float = 1e-8
    penalty_auto_max: float = 1e8
    warmup_max_inner_iterations: int = 10
    warmup_inner_gradient_tolerance: float = 1e-2
    multiplier_max: float = 1e20
    filter_feasibility_tolerance: float = 1e-5
    #: Batched lowering: "native" runs both nested loops at batch level
    #: (see _al_minimize_batched_jit); "vmap" keeps the round-2..4
    #: vmap-of-whole-solve lowering (parity/bench comparisons).
    batched_impl: str = "native"

    # -- public API ----------------------------------------------------------

    def minimize(
        self,
        problem: ConstrainedProblem,
        x0: jax.Array,
        multipliers: MultiplierState | None = None,
        penalty=0.0,
        stopping: StoppingCriteria | None = None,
        inner_stopping: StoppingCriteria | None = None,
        inner_internals=None,
    ) -> AlResult:
        """``inner_internals`` optionally supplies the inner solver's runtime
        state for every inner solve — the analog of the reference AL picking
        up whatever bounds its inner solver instance holds (lbfgsb.h:124-130
        via augmented_lagrangian.h:347-353): pass
        ``Lbfgsb.make_internals(n, dtype, lower, upper)`` for runtime boxes.
        The projected-KKT norm (:577-604) then projects onto those same
        bounds.  Each outer iteration re-seeds the inner solve from this
        pytree (fresh history, same bounds), matching the reference's
        clone-per-outer-iteration."""
        x0 = jnp.asarray(x0)
        dtype = x0.dtype
        if multipliers is None:
            multipliers = MultiplierState.zeros(
                problem.num_equalities, problem.num_inequalities, dtype
            )
        if stopping is None:
            stopping = default_stopping(dtype)
        if inner_stopping is None:
            inner_stopping = self.inner_solver.default_stopping(dtype)
        state0 = AugmentedLagrangeState(
            x=x0,
            multipliers=multipliers,
            penalty=jnp.asarray(penalty, dtype),
            max_violation=jnp.zeros((), dtype),
            # +inf so the first outer iteration cannot read as KKT-satisfied
            # (augmented_lagrangian.h:191-194).
            max_lagrangian_gradient=jnp.asarray(jnp.inf, dtype),
            penalty_was_auto_scaled=jnp.zeros((), jnp.bool_),
            nfev=jnp.zeros((), jnp.int32),
        )
        return _al_minimize_jit(
            self, problem, state0, stopping, inner_stopping, inner_internals
        )

    def minimize_batched(
        self,
        problem: ConstrainedProblem,
        x0_batch: jax.Array,
        stopping: StoppingCriteria | None = None,
        inner_stopping: StoppingCriteria | None = None,
        inner_internals=None,
    ) -> AlResult:
        """Batch of starts, vmapped with per-lane convergence freezing.

        ``inner_internals`` (optional) carries a leading batch axis — e.g.
        per-lane heterogeneous L-BFGS-B boxes built with ``jax.vmap(lambda
        lo, up: solver.make_internals(n, dtype, lo, up))(lo_batch,
        up_batch)``.

        Default lowering is batch-native (both nested while_loops at batch
        level — see :func:`_al_minimize_batched_jit`); construct the solver
        with ``batched_impl="vmap"`` for the vmap-of-whole-solve lowering.
        """
        x0_batch = jnp.asarray(x0_batch)
        if self.batched_impl == "vmap":
            if inner_internals is None:
                return jax.vmap(
                    lambda x0: self.minimize(
                        problem, x0, stopping=stopping,
                        inner_stopping=inner_stopping,
                    )
                )(x0_batch)
            return jax.vmap(
                lambda x0, ints: self.minimize(
                    problem, x0, stopping=stopping,
                    inner_stopping=inner_stopping, inner_internals=ints,
                )
            )(x0_batch, inner_internals)

        dtype = x0_batch.dtype
        if stopping is None:
            stopping = default_stopping(dtype)
        if inner_stopping is None:
            inner_stopping = self.inner_solver.default_stopping(dtype)

        def mk(x0):
            return AugmentedLagrangeState(
                x=x0,
                multipliers=MultiplierState.zeros(
                    problem.num_equalities, problem.num_inequalities, dtype
                ),
                penalty=jnp.zeros((), dtype),
                max_violation=jnp.zeros((), dtype),
                max_lagrangian_gradient=jnp.asarray(jnp.inf, dtype),
                penalty_was_auto_scaled=jnp.zeros((), jnp.bool_),
                nfev=jnp.zeros((), jnp.int32),
            )

        state0 = jax.vmap(mk)(x0_batch)
        return _al_minimize_batched_jit(
            self, problem, state0, stopping, inner_stopping, inner_internals
        )

    # -- internals -----------------------------------------------------------

    def _auto_scaled_penalty(self, problem: ConstrainedProblem, x):
        """rho_0 = scale * max(1,|f(x0)|) / max(1, active residual mass)
        (augmented_lagrangian.h:476-499)."""
        dtype = x.dtype
        objective_magnitude = jnp.maximum(
            jnp.abs(problem.objective.fn(x)), 1.0
        )
        residual = jnp.zeros((), dtype)
        if problem.num_equalities:
            c = problem.eval_equalities(x)
            residual = residual + jnp.sum(0.5 * c * c)
        if problem.num_inequalities:
            g = problem.eval_inequalities(x)
            residual = residual + jnp.sum(
                jnp.where(g < 0, 0.5 * g * g, 0.0)
            )
        rho = (
            self.penalty_auto_objective_scale
            * objective_magnitude
            / jnp.maximum(residual, 1.0)
        )
        return jnp.clip(rho, self.penalty_auto_min, self.penalty_auto_max)

    def _clamp_eq(self, candidate):
        """NaN -> 0, then clamp to +/- multiplier_max (:550-554)."""
        clamped = jnp.clip(candidate, -self.multiplier_max, self.multiplier_max)
        return jnp.where(jnp.isfinite(candidate), clamped, 0.0)

    def _clamp_ineq(self, candidate):
        clamped = jnp.clip(candidate, 0.0, self.multiplier_max)
        return jnp.where(jnp.isfinite(candidate), clamped, 0.0)

    def _kkt_norm(self, problem, x, multipliers, bounds=None):
        """Projected Lagrangian-gradient sup-norm when the inner solver is
        box-constrained (:577-604).  ``bounds`` overrides the config boxes
        with the runtime per-solve ones (from ``inner_internals``)."""
        grad_l = lagrangian_gradient(problem, x, multipliers)
        if bounds is not None:
            return projected_gradient_inf_norm(x, grad_l, *bounds)
        if isinstance(self.inner_solver, Lbfgsb):
            n = x.shape[-1]
            lower, upper = self.inner_solver._bounds(n, x.dtype)
            return projected_gradient_inf_norm(x, grad_l, lower, upper)
        return jnp.max(jnp.abs(grad_l))


def _fresh_tracker(state0: AugmentedLagrangeState) -> _BestTracker:
    dtype = state0.x.dtype
    return _BestTracker(
        recorded=jnp.zeros((), jnp.bool_),
        x=state0.x,
        multipliers=state0.multipliers,
        penalty=jnp.zeros((), dtype),
        objective=jnp.asarray(jnp.inf, dtype),
        violation=jnp.asarray(jnp.inf, dtype),
        kkt=jnp.asarray(jnp.inf, dtype),
    )


def _outer_pre(al, problem, state, progress, inner_stopping, has_general):
    """Per-lane pre-inner-solve half of one outer iteration: auto-scale
    rho_0 (:301-318) and the warm-up inner stopping schedule (:334-353)."""
    dtype = state.x.dtype
    outer_iter = progress.num_iterations + 1

    do_scale = jnp.logical_and(
        jnp.logical_and(outer_iter == 1, ~state.penalty_was_auto_scaled),
        state.penalty == 0.0,
    )
    if not al.auto_scale_initial_penalty:
        do_scale = jnp.zeros((), jnp.bool_)
    penalty = jnp.where(
        do_scale, al._auto_scaled_penalty(problem, state.x), state.penalty
    )
    was_scaled = jnp.logical_or(state.penalty_was_auto_scaled, do_scale)

    inner_stop = inner_stopping.replace(f_delta=0.0)
    if has_general and al.warmup_max_inner_iterations > 0:
        warm = outer_iter == 1
        inner_stop = inner_stop.replace(
            max_iterations=jnp.where(
                warm,
                jnp.int32(al.warmup_max_inner_iterations),
                inner_stop.max_iterations,
            ),
            gradient_norm=jnp.where(
                warm,
                jnp.asarray(al.warmup_inner_gradient_tolerance, dtype),
                inner_stop.gradient_norm,
            ),
        )
    return penalty, was_scaled, inner_stop


def _outer_post(
    al, problem, state, tracker, progress, penalty, was_scaled,
    inner_state0, inner_res_state, stopping, runtime_bounds,
):
    """Per-lane post-inner-solve half: multiplier updates, KKT, the Pareto
    best-iterate filter, conditional penalty growth, and the constrained
    ``Progress::Update`` (:356-441, progress.h:217-253)."""
    dtype = state.x.dtype
    x_new = inner_res_state.x
    nfev = state.nfev + inner_res_state.nfev

    # --- Step 4: multiplier updates + violation (:356-387) ---
    max_violation = jnp.zeros((), dtype)
    if problem.num_equalities:
        c_eq = problem.eval_equalities(x_new)
        max_violation = jnp.maximum(max_violation, jnp.max(jnp.abs(c_eq)))
        lam = al._clamp_eq(state.multipliers.equality + penalty * c_eq)
    else:
        lam = state.multipliers.equality
    if problem.num_inequalities:
        g = problem.eval_inequalities(x_new)
        max_violation = jnp.maximum(
            max_violation, jnp.max(jnp.maximum(0.0, -g))
        )
        mu = al._clamp_ineq(
            jnp.maximum(0.0, state.multipliers.inequality - penalty * g)
        )
    else:
        mu = state.multipliers.inequality
    new_multipliers = MultiplierState(equality=lam, inequality=mu)

    # --- Step 5: KKT stationarity (:389-409) ---
    kkt = al._kkt_norm(problem, x_new, new_multipliers, runtime_bounds)

    # --- Step 6: Pareto best-iterate tracking (:412-426, :656-701);
    # recorded with the pre-growth penalty. ---
    cand_obj = problem.objective.fn(x_new)
    nfev = nfev + 1
    finite = jnp.logical_and(
        jnp.logical_and(
            jnp.isfinite(cand_obj), jnp.isfinite(max_violation)
        ),
        jnp.all(jnp.isfinite(x_new)),
    )
    feas_tol = al.filter_feasibility_tolerance
    cand_feas = max_violation <= feas_tol
    best_feas = tracker.violation <= feas_tol
    both_feasible_better = jnp.logical_and(
        jnp.logical_and(cand_feas, best_feas),
        cand_obj < tracker.objective,
    )
    both_infeasible_better = jnp.logical_and(
        jnp.logical_and(~cand_feas, ~best_feas),
        jnp.logical_or(
            max_violation < tracker.violation,
            jnp.logical_and(
                max_violation == tracker.violation,
                cand_obj < tracker.objective,
            ),
        ),
    )
    take = jnp.logical_or(
        ~tracker.recorded,
        jnp.logical_or(
            jnp.logical_and(cand_feas, ~best_feas),
            jnp.logical_or(both_feasible_better, both_infeasible_better),
        ),
    )
    take = jnp.logical_and(take, finite)
    candidate = _BestTracker(
        recorded=jnp.ones((), jnp.bool_),
        x=x_new,
        multipliers=new_multipliers,
        penalty=penalty,
        objective=cand_obj,
        violation=max_violation,
        kkt=kkt,
    )
    new_tracker = tree_where(take, candidate, tracker)

    # --- Step 7: conditional penalty growth (:428-441) ---
    shrank = max_violation <= al.violation_shrink_ratio * state.max_violation
    penalty_next = jnp.where(
        shrank, penalty, penalty * al.penalty_growth_factor
    )

    new_state = AugmentedLagrangeState(
        x=x_new,
        multipliers=new_multipliers,
        penalty=penalty_next,
        max_violation=max_violation,
        max_lagrangian_gradient=kkt,
        penalty_was_auto_scaled=was_scaled,
        nfev=nfev,
    )

    # --- Constrained Progress::Update (progress.h:217-253).  The f_delta
    # / gradient_norm fields recorded here are pure observability in the
    # constrained branch (stopping is decided by feasibility + KKT only),
    # so instead of re-evaluating fresh composites like the reference
    # (progress.h:162-173, +2 gradient evals per outer iteration) we
    # thread the values the inner solve already produced: the composite
    # that was just minimised, at its start and end points.  Same stop
    # decisions, two fewer evaluations billed per outer iteration. ---
    new_progress = update_progress_constrained(
        progress,
        state.x,
        x_new,
        inner_state0.value,
        inner_res_state.value,
        jnp.max(jnp.abs(inner_res_state.gradient)),
        max_violation,
        kkt,
        stopping,
    )
    return new_state, new_tracker, new_progress


def _seeded_inner_progress(dtype, outer_done):
    """A converged outer lane enters its inner solve pre-finished: in a
    batched solve the inner loop's trip count is the max over lanes, so
    without this a frozen lane would re-run its full inner solve on every
    remaining outer iteration of the slowest lane (everything it produces
    is discarded by the outer done-select).  Unbatched this is a no-op: the
    outer loop predicate guarantees status == CONTINUE here."""
    p = init_progress(dtype)
    return p._replace(
        status=jnp.where(
            outer_done, jnp.int32(int(Status.ITERATION_LIMIT)), p.status
        )
    )


@functools.partial(jax.jit, static_argnames=("al", "problem"))
def _al_minimize_jit(
    al: AugmentedLagrangian,
    problem: ConstrainedProblem,
    state0: AugmentedLagrangeState,
    stopping: StoppingCriteria,
    inner_stopping: StoppingCriteria,
    inner_internals=None,
) -> AlResult:
    dtype = state0.x.dtype
    inner = al.inner_solver
    has_general = problem.has_general_constraints
    # Runtime boxes from the supplied internals flow into the projected-KKT
    # measurement (the reference's SFINAE pickup of the inner Lbfgsb's
    # current bounds, augmented_lagrangian.h:44-61 + lbfgsb.h:124-130).
    runtime_bounds = None
    if inner_internals is not None and hasattr(inner_internals, "lower"):
        runtime_bounds = (inner_internals.lower, inner_internals.upper)

    tracker0 = _fresh_tracker(state0)
    progress0 = init_progress(dtype)

    def cond(carry):
        _, _, progress = carry
        return progress.status == int(Status.CONTINUE)

    def body(carry):
        state, tracker, progress = carry

        # --- Steps 1+3a: rho_0 auto-scale + warm-up schedule ---
        penalty, was_scaled, inner_stop = _outer_pre(
            al, problem, state, progress, inner_stopping, has_general
        )

        # --- Step 2: the AL composite subproblem (:320-332) ---
        composite = to_augmented_lagrangian(
            problem, state.multipliers, penalty
        )

        # --- Step 3: inner solve (:334-353) ---
        inner_state0 = composite.evaluate(state.x, nfev=0)
        inner_internals0 = (
            inner.init(composite, inner_state0)
            if inner_internals is None
            else inner_internals
        )
        outer_done = progress.status != int(Status.CONTINUE)
        inner_res = _solve_loop(
            composite, inner, inner_state0, inner_internals0, inner_stop,
            progress0=_seeded_inner_progress(dtype, outer_done),
        )

        # --- Steps 4-7 + constrained progress update ---
        new_state, new_tracker, new_progress = _outer_post(
            al, problem, state, tracker, progress, penalty, was_scaled,
            inner_state0, inner_res.state, stopping, runtime_bounds,
        )

        new_carry = (new_state, new_tracker, new_progress)
        done = progress.status != int(Status.CONTINUE)
        return tree_where(done, carry, new_carry)

    state, tracker, progress = lax.while_loop(
        cond, body, (state0, tracker0, progress0)
    )

    # Install the Pareto-best iterate on the returned state (:453-466).
    best_state = state._replace(
        x=tracker.x,
        multipliers=tracker.multipliers,
        penalty=tracker.penalty,
        max_violation=tracker.violation,
        max_lagrangian_gradient=tracker.kkt,
    )
    final_state = tree_where(tracker.recorded, best_state, state)
    return AlResult(state=final_state, progress=progress)


@functools.partial(jax.jit, static_argnames=("al", "problem"))
def _al_minimize_batched_jit(
    al: AugmentedLagrangian,
    problem: ConstrainedProblem,
    state0: AugmentedLagrangeState,  # batched
    stopping: StoppingCriteria,
    inner_stopping: StoppingCriteria,
    inner_internals=None,  # batched (leading B) when given
) -> AlResult:
    """Batch-native nested AL solve: BOTH loops run at batch level.

    ``jax.vmap`` of :func:`_al_minimize_jit` (the round-2..4 lowering) pays
    the while-batching rule's broadcast-select over the whole nested carry
    — including the inner solver's (B, m, n) history — once per INNER
    iteration (the exact overhead core/driver.py:_solve_loop_batched was
    built to remove for unconstrained solves; VERDICT round-4 item 5).
    Here the outer while_loop carries batched (state, tracker, progress)
    directly, and the inner solve is one batch-level while_loop whose body
    is the vmapped self-freezing single-instance body (`_make_body`) — the
    same construction as the unconstrained batch-native driver, with the
    per-lane AL composite (traced multipliers, penalty) rebuilt inside the
    vmap.  Per-lane numerics are the SAME `_outer_pre`/`_outer_post`
    functions the single-instance path runs, so the two cannot drift.
    Reference driver replaced: augmented_lagrangian.h:453-466.
    """
    dtype = state0.x.dtype
    batch = state0.x.shape[0]
    inner = al.inner_solver
    has_general = problem.has_general_constraints
    runtime_bounds = None
    if inner_internals is not None and hasattr(inner_internals, "lower"):
        runtime_bounds = (inner_internals.lower, inner_internals.upper)

    tracker0 = jax.vmap(_fresh_tracker)(state0)
    progress0 = jax.vmap(lambda _: init_progress(dtype))(jnp.arange(batch))

    def cond(carry):
        _, _, progress = carry
        return jnp.any(progress.status == int(Status.CONTINUE))

    def body(carry):
        state, tracker, progress = carry
        outer_done = progress.status != int(Status.CONTINUE)  # (B,)

        penalty, was_scaled, inner_stop = jax.vmap(
            lambda st, pr: _outer_pre(
                al, problem, st, pr, inner_stopping, has_general
            )
        )(state, progress)

        def eval0(st, pen):
            composite = to_augmented_lagrangian(problem, st.multipliers, pen)
            s0 = composite.evaluate(st.x, nfev=0)
            return s0, inner.init(composite, s0)

        inner_state0, fresh_internals = jax.vmap(eval0)(state, penalty)
        inner_internals0 = (
            fresh_internals if inner_internals is None else inner_internals
        )
        inner_progress0 = jax.vmap(
            lambda d: _seeded_inner_progress(dtype, d)
        )(outer_done)

        def inner_body(icarry):
            def one(ist, iint, iprog, mult, pen, istop):
                composite = to_augmented_lagrangian(problem, mult, pen)
                body_fn = _make_body(composite, inner, istop, None, False)
                return body_fn((ist, iint, iprog, None))

            ist, iint, iprog, _ = jax.vmap(one)(
                icarry[0], icarry[1], icarry[2],
                state.multipliers, penalty, inner_stop,
            )
            return (ist, iint, iprog)

        def inner_cond(icarry):
            return jnp.any(icarry[2].status == int(Status.CONTINUE))

        inner_state, _, _ipr = lax.while_loop(
            inner_cond, inner_body,
            (inner_state0, inner_internals0, inner_progress0),
        )

        if runtime_bounds is None:
            post = jax.vmap(
                lambda st, tr, pr, pen, ws, is0, irs: _outer_post(
                    al, problem, st, tr, pr, pen, ws, is0, irs, stopping,
                    None,
                )
            )
            new_state, new_tracker, new_progress = post(
                state, tracker, progress, penalty, was_scaled,
                inner_state0, inner_state,
            )
        else:
            post = jax.vmap(
                lambda st, tr, pr, pen, ws, is0, irs, lo, up: _outer_post(
                    al, problem, st, tr, pr, pen, ws, is0, irs, stopping,
                    (lo, up),
                )
            )
            new_state, new_tracker, new_progress = post(
                state, tracker, progress, penalty, was_scaled,
                inner_state0, inner_state, *runtime_bounds,
            )

        new_carry = (new_state, new_tracker, new_progress)
        return jax.vmap(tree_where)(outer_done, carry, new_carry)

    state, tracker, progress = lax.while_loop(
        cond, body, (state0, tracker0, progress0)
    )

    def install(st, tr):
        best_state = st._replace(
            x=tr.x,
            multipliers=tr.multipliers,
            penalty=tr.penalty,
            max_violation=tr.violation,
            max_lagrangian_gradient=tr.kkt,
        )
        return tree_where(tr.recorded, best_state, st)

    final_state = jax.vmap(install)(state, tracker)
    return AlResult(state=final_state, progress=progress)
