"""Generic minimize driver: the reference's ``Solver::Minimize`` loop as a
pure ``lax.while_loop``.

Reference: include/cppoptlib/solver/solver.h:181-224.  The C++ do-while
drives virtual ``OptimizationStep`` calls and a mutable ``Progress``; here the
loop carry is a pytree ``(FunctionState, solver internals, ProgressState)``
and each solver is a frozen config object exposing pure ``init``/``step``
functions.  Because every step is ``State -> State``:

* ``jax.vmap`` turns one solve into a batch solve (converged lanes are frozen
  with a per-lane ``done`` mask — a vmapped while_loop applies the body to all
  lanes until every predicate is false);
* checkpoint/resume is free (the carry is a plain pytree the caller owns);
* sharding the batch axis under ``jit`` scales the solve across a TPU mesh —
  XLA inserts the ``any(status == CONTINUE)`` all-reduce for the loop
  predicate automatically.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from .callbacks import IterationTrace, init_trace, record_trace
from .objective import FunctionState, Objective
from .progress import (
    ProgressState,
    StoppingCriteria,
    default_stopping,
    init_progress,
    update_progress,
)
from .status import Status
from .tree import tree_where

__all__ = [
    "SolverBase",
    "MinimizeResult",
    "minimize",
    "minimize_batched",
    "resume",
]


@dataclasses.dataclass(frozen=True)
class SolverBase:
    """Base protocol for unconstrained solvers.

    Subclasses are frozen dataclasses (hashable, jit-static) implementing
    ``init`` and ``step``.  The optional hooks mirror the reference's solver
    customisation points:

    * ``transform_stopping`` — lets a solver adjust the criteria the driver's
      generic convergence test sees (L-BFGS-B zeroes the full-gradient test,
      lbfgsb.h:258-260).
    * ``post_update`` — runs after the generic progress update with the
      *caller's* criteria, so a solver can impose its own convergence signal
      (L-BFGS-B's projected-gradient test, lbfgsb.h:280-283).
    * ``default_stopping`` — per-solver preset override (NelderMead uses the
      conservative preset with 5 x-delta strikes, nelder_mead.h:87-91;
      L-BFGS-B enables the factr-style f_delta test, lbfgsb.h:84-87).
    """

    #: Required objective differentiability: 'none' | 'first' | 'second'.
    mode: str = dataclasses.field(default="first", init=False, repr=False)
    #: Solver freezes its OWN internals for converged lanes (its ``step``
    #: accepts ``done=`` and guarantees internals of done lanes are returned
    #: bit-identical).  The driver then selects only the small state/progress
    #: pytrees — for solvers carrying large per-lane buffers (L-BFGS's
    #: (m, n) history) the generic freeze select would re-read and re-write
    #: those buffers every iteration, tripling their HBM traffic.
    freeze_in_step: bool = dataclasses.field(
        default=False, init=False, repr=False
    )

    def init(self, objective: Objective, state: FunctionState) -> Any:
        raise NotImplementedError

    def supports_batched_native(
        self, objective: Objective, x0_batch: jax.Array
    ) -> bool:
        """Whether this solver provides a *directly batched* hot path —
        :meth:`init_batched` + :meth:`batched_step_and_update` operating on
        (B, ...) arrays with solver-chosen internal storage layouts.

        This exists because layout is a batch-level decision: the
        transposed (batch-minor) L-BFGS history that fixes the small-n
        kernel floor (ops/fused_step_t.py) cannot be expressed through
        ``vmap`` of a per-lane step — ``custom_vmap`` canonicalizes the
        batch to axis 0, which would force a full history transpose every
        iteration.  Decision inputs (backend, dtype, (B, n)) are all
        trace-time static."""
        del objective, x0_batch
        return False

    def init_batched(self, objective: Objective, state: FunctionState) -> Any:
        raise NotImplementedError

    def batched_step_and_update(
        self,
        objective: Objective,
        state: FunctionState,
        internals: Any,
        progress: ProgressState,
        stopping: StoppingCriteria,
        done: jax.Array,
    ) -> tuple[FunctionState, Any, ProgressState]:
        """Batched analog of :meth:`step_and_update`: all arguments carry a
        leading batch axis except ``stopping`` (uniform scalars).  Must be
        semantically identical to ``vmap`` of the per-lane composition
        (parity-tested per solver)."""
        raise NotImplementedError

    def solve_batched_native(
        self,
        objective: Objective,
        state0: FunctionState,
        stopping: StoppingCriteria,
    ) -> "MinimizeResult":
        """Full custody of a batched solve for batched-native solvers.
        The default runs the iteration-granular loop over
        :meth:`batched_step_and_update`; a solver may override with a
        different loop structure entirely (Lbfgs's flat trip-granular
        solve, ops/flat_solve.py)."""
        return _solve_loop_batched_native(
            objective, self, state0, self.init_batched(objective, state0),
            stopping,
        )

    def supports_fused_update(self, objective: Objective) -> bool:
        """Whether :meth:`step_and_update` may replace the driver's generic
        ``step`` + ``update_progress`` + freeze composition for this
        objective.  Solvers that fuse the convergence machine into their hot
        kernel (L-BFGS on the batched TPU path) return True; such solvers
        must not rely on ``transform_stopping``/``post_update`` differing
        from the generic semantics they fuse."""
        del objective
        return False

    def step_and_update(
        self,
        objective: Objective,
        state: FunctionState,
        internals: Any,
        progress: ProgressState,
        stopping: StoppingCriteria,
        done: jax.Array,
    ) -> tuple[FunctionState, Any, ProgressState]:
        raise NotImplementedError

    def step(
        self,
        objective: Objective,
        state: FunctionState,
        internals: Any,
        stopping: StoppingCriteria,
    ) -> tuple[FunctionState, Any]:
        raise NotImplementedError

    def transform_stopping(self, stopping: StoppingCriteria) -> StoppingCriteria:
        return stopping

    def post_update(
        self,
        objective: Objective,
        state: FunctionState,
        internals: Any,
        progress: ProgressState,
        stopping: StoppingCriteria,
    ) -> ProgressState:
        del objective, state, internals, stopping
        return progress

    def default_stopping(self, dtype) -> StoppingCriteria:
        return default_stopping(dtype)

    def check_mode(self, objective: Objective) -> None:
        order = {"none": 0, "first": 1, "second": 2}
        if order[objective.mode] < order[self.mode]:
            raise ValueError(
                f"{type(self).__name__} requires a {self.mode!r}-mode "
                f"objective, got {objective.mode!r}."
            )


class MinimizeResult(NamedTuple):
    state: FunctionState  # final iterate with populated (value, gradient)
    progress: ProgressState  # convergence record (per-instance when batched)
    internals: Any  # final solver internals (resume-friendly)
    trace: IterationTrace | None = None  # per-iteration record (trace > 0)


def _make_body(
    objective: Objective,
    solver: SolverBase,
    stopping: StoppingCriteria,
    callback,
    compute_cond_h: bool,
):
    """Build the single-instance loop body shared by every driver variant.

    The body is self-freezing: for a lane whose ``progress.status`` is
    terminal it returns the carry unchanged on every path (the fused kernels
    select internally; ``freeze_in_step`` solvers freeze their internals and
    the driver selects state/progress; the generic path ends in an explicit
    ``tree_where``).  That property is what lets :func:`_solve_loop_batched`
    run ONE while_loop over batched carries with an any-lane predicate
    instead of vmapping the whole loop.
    """
    stopping_inner = solver.transform_stopping(stopping)
    if not compute_cond_h:
        # The Hessian-condition criterion is statically known to be off
        # (see _wants_driver_cond_h): pin the field to a CONCRETE zero so
        # solver-side gates (utils/linalg.py condition_test_enabled) see a
        # trace-time constant instead of a tracer and can skip the cond(H)
        # inverse — on TPU a second ~8 ms batched LU custom call per
        # Newton/TR iteration.  Semantics unchanged: the criterion compares
        # against the same zero either way.
        stopping_inner = stopping_inner._replace(
            condition_hessian=jnp.zeros(
                (), stopping_inner.condition_hessian.dtype
            )
        )
    # Solvers may force derivative-free progress semantics (NelderMead: the
    # reference instantiates Progress over a value-only state, so no
    # gradient-norm test applies).
    progress_mode = getattr(solver, "progress_mode", None) or objective.mode
    # Fused hot path: the solver folds step + convergence machine + done-lane
    # freezing into its own kernels (L-BFGS on the batched TPU path).  The
    # driver-side cond(H) evaluation is generic-path only.
    use_fused = (not compute_cond_h) and solver.supports_fused_update(
        objective
    )

    def body(carry):
        state, internals, progress, trace_buf = carry
        # Freeze converged lanes (no-op for an unbatched solve, where the
        # loop predicate guarantees status == CONTINUE here).
        done = progress.status != int(Status.CONTINUE)
        if use_fused:
            new_state, new_internals, new_progress = solver.step_and_update(
                objective, state, internals, progress, stopping_inner, done
            )
        else:
            if solver.freeze_in_step:
                # The solver freezes its own internals (fused into its hot
                # kernel); the driver selects only the small state/progress.
                new_state, new_internals = solver.step(
                    objective, state, internals, stopping_inner, done=done
                )
            else:
                new_state, new_internals = solver.step(
                    objective, state, internals, stopping_inner
                )
            # Solvers that materialise the Hessian (Newton, TrustRegion)
            # expose cond(H) through their internals so the
            # HessianConditionViolation test (progress.h:197-208) is live;
            # otherwise the driver evaluates it for second-mode objectives
            # when requested (see docstring).
            cond_h = getattr(new_internals, "condition_hessian", None)
            if cond_h is None and compute_cond_h and objective.mode == "second":
                from ..utils.linalg import frobenius_condition

                cond_h = frobenius_condition(objective.hessian(new_state.x))
                new_state = new_state._replace(nfev=new_state.nfev + 1)
            new_progress = update_progress(
                progress, state, new_state, stopping_inner,
                mode=progress_mode, condition_hessian=cond_h,
            )
            new_progress = solver.post_update(
                objective, new_state, new_internals, new_progress, stopping
            )
            if solver.freeze_in_step:
                new_state = tree_where(done, state, new_state)
                new_progress = tree_where(done, progress, new_progress)
        if trace_buf is not None:
            # On the freeze_in_step path the (state, progress) here are
            # already frozen: a done lane re-records its existing entry at
            # the frozen num_iterations index — idempotent.
            trace_buf = record_trace(trace_buf, new_progress, new_state)
        if callback is not None:
            # Live observability (PrintProgressCallback analog,
            # solver.h:59-147): one host transfer per iteration.
            jax.debug.callback(
                callback,
                {
                    "num_iterations": new_progress.num_iterations,
                    "value": new_state.value,
                    "gradient_norm": jnp.max(jnp.abs(new_state.gradient)),
                    "x_delta": new_progress.x_delta,
                    "f_delta": new_progress.f_delta,
                    "status": new_progress.status,
                },
            )
        if use_fused or solver.freeze_in_step:
            return (new_state, new_internals, new_progress, trace_buf)
        new_carry = (new_state, new_internals, new_progress, trace_buf)
        return tree_where(done, carry, new_carry)

    return body


def _solve_loop(
    objective: Objective,
    solver: SolverBase,
    state0: FunctionState,
    internals0: Any,
    stopping: StoppingCriteria,
    trace: int = 0,
    callback=None,
    progress0: ProgressState | None = None,
    compute_cond_h: bool = False,
) -> MinimizeResult:
    """The one driver loop, shared by fresh solves and :func:`resume`
    (``progress0`` carries a checkpoint's counters/ring so the resumed
    trajectory is exactly the uninterrupted one).

    ``compute_cond_h`` makes the Hessian-condition criterion
    solver-independent: the reference evaluates cond(H) inside
    ``Progress::Update`` for *every* second-mode function regardless of
    solver (progress.h:203-210), paying one extra Hessian evaluation per
    iteration.  Solvers that already materialise H (Newton, TrustRegion)
    expose cond(H) through their internals and pay nothing extra; for any
    other solver the driver evaluates it here when the criterion is enabled
    (billed as +1 nfev per iteration, mirroring the reference's extra call).
    """
    body = _make_body(objective, solver, stopping, callback, compute_cond_h)

    def cond(carry):
        _, _, progress, _ = carry
        return progress.status == int(Status.CONTINUE)

    if progress0 is None:
        progress0 = init_progress(state0.value.dtype)
    trace0 = init_trace(trace, state0.value.dtype) if trace > 0 else None
    state, internals, progress, trace_out = lax.while_loop(
        cond, body, (state0, internals0, progress0, trace0)
    )
    return MinimizeResult(
        state=state, progress=progress, internals=internals, trace=trace_out
    )


def _solve_loop_batched(
    objective: Objective,
    solver: SolverBase,
    state0: FunctionState,
    internals0: Any,
    stopping: StoppingCriteria,
    trace: int = 0,
    callback=None,
    compute_cond_h: bool = False,
) -> MinimizeResult:
    """Batch-native driver: ONE while_loop over batched carries, the
    single-instance body vmapped, predicate = any lane still continuing.

    Semantically identical to ``vmap``-ing :func:`_solve_loop` — the body is
    self-freezing for done lanes on every path (see :func:`_make_body`) —
    but structurally cheaper: JAX's while_loop *batching rule* must assume
    nothing about the body, so a vmapped while_loop masks EVERY carry leaf
    with a broadcast select each iteration.  For L-BFGS that re-reads and
    re-writes the (B, m, n) history pair per iteration — measured at ~40% of
    the whole step's device time at n=4096 (profiles/lbfgs_b256_n4096,
    ``broadcast_select_fusion`` over f32[256,10,4096]x2 + the loop
    double-buffer copies it defeats).  Running the loop at batch level makes
    the lane freeze the body's own (already fused) selects and nothing else.
    """
    batch = state0.value.shape[0]
    dtype = state0.value.dtype
    body = jax.vmap(_make_body(objective, solver, stopping, callback,
                               compute_cond_h))

    def cond(carry):
        _, _, progress, _ = carry
        return jnp.any(progress.status == int(Status.CONTINUE))

    lanes = jnp.arange(batch)
    progress0 = jax.vmap(lambda _: init_progress(dtype))(lanes)
    trace0 = (
        jax.vmap(lambda _: init_trace(trace, dtype))(lanes)
        if trace > 0
        else None
    )
    state, internals, progress, trace_out = lax.while_loop(
        cond, body, (state0, internals0, progress0, trace0)
    )
    return MinimizeResult(
        state=state, progress=progress, internals=internals, trace=trace_out
    )


@functools.partial(
    jax.jit,
    static_argnames=("objective", "solver", "trace", "callback",
                     "compute_cond_h"),
)
def _solve_one_jit(
    objective, x0, solver, stopping, trace=0, callback=None, internals=None,
    compute_cond_h=False,
):
    state0 = objective.evaluate(x0, nfev=0)
    internals0 = solver.init(objective, state0) if internals is None else internals
    return _solve_loop(
        objective, solver, state0, internals0, stopping, trace, callback,
        compute_cond_h=compute_cond_h,
    )


def _solve_loop_batched_native(
    objective: Objective,
    solver: SolverBase,
    state0: FunctionState,
    internals0: Any,
    stopping: StoppingCriteria,
) -> MinimizeResult:
    """Directly batched driver: the solver's own batched step (no vmap at
    all), so internal storage layouts are the solver's choice — see
    :meth:`SolverBase.supports_batched_native`."""
    batch = state0.value.shape[0]
    dtype = state0.value.dtype
    stopping_inner = solver.transform_stopping(stopping)

    def body(carry):
        state, internals, progress = carry
        done = progress.status != int(Status.CONTINUE)
        return solver.batched_step_and_update(
            objective, state, internals, progress, stopping_inner, done
        )

    def cond(carry):
        _, _, progress = carry
        return jnp.any(progress.status == int(Status.CONTINUE))

    progress0 = jax.vmap(lambda _: init_progress(dtype))(jnp.arange(batch))
    state, internals, progress = lax.while_loop(
        cond, body, (state0, internals0, progress0)
    )
    return MinimizeResult(
        state=state, progress=progress, internals=internals, trace=None
    )


@functools.partial(
    jax.jit, static_argnames=("objective", "solver", "trace", "compute_cond_h")
)
def _solve_batched_jit(objective, x0_batch, solver, stopping, trace=0,
                       internals=None, compute_cond_h=False):
    state0 = jax.vmap(lambda x0: objective.evaluate(x0, nfev=0))(x0_batch)
    if (
        internals is None
        and trace == 0
        and not compute_cond_h
        and solver.supports_batched_native(objective, x0_batch)
    ):
        return solver.solve_batched_native(objective, state0, stopping)
    internals0 = (
        jax.vmap(lambda s: solver.init(objective, s))(state0)
        if internals is None
        else internals
    )
    return _solve_loop_batched(
        objective, solver, state0, internals0, stopping, trace,
        compute_cond_h=compute_cond_h,
    )


def _wants_driver_cond_h(objective: Objective, stopping: StoppingCriteria) -> bool:
    """Trace-time decision for the solver-independent Hessian-condition test.

    The reference computes cond(H) for every second-mode function on every
    ``Progress::Update`` (progress.h:203-210).  Paying a Hessian evaluation
    per iteration when the criterion is disabled (the default:
    ``condition_hessian == 0``) would be pure waste, so the driver computes
    it only when the concrete criterion is enabled.  If the criteria are
    traced values (a solve built inside a larger jit), the decision falls
    back to the reference's unconditional behaviour for second-mode
    objectives.
    """
    if objective.mode != "second":
        return False
    try:
        return bool(stopping.condition_hessian > 0)
    except jax.errors.TracerBoolConversionError:
        return True


def minimize(
    objective: Objective,
    x0: jax.Array,
    solver: SolverBase,
    stopping: StoppingCriteria | None = None,
    *,
    trace: int = 0,
    callback=None,
    internals: Any | None = None,
) -> MinimizeResult:
    """Minimize ``objective`` from ``x0`` with ``solver``.

    Establishes the populated-(value, gradient) invariant with one evaluation
    at the start (solver.h:190-192), then runs the while_loop driver.  The
    whole solve is jitted with (objective, solver) as static keys, so repeat
    solves of the same problem family hit the compile cache.

    ``internals`` overrides the solver's fresh internal state — the analog of
    the reference's mutable per-solver setup calls (e.g. Lbfgsb.SetBounds,
    lbfgsb.h:124-130): pass ``Lbfgsb.make_internals(n, dtype, lower, upper)``
    for runtime bounds, or a previous result's internals for a warm start.
    """
    solver.check_mode(objective)
    x0 = jnp.asarray(x0)
    if stopping is None:
        stopping = solver.default_stopping(x0.dtype)
    return _solve_one_jit(
        objective, x0, solver, stopping, trace, callback, internals,
        compute_cond_h=_wants_driver_cond_h(objective, stopping),
    )


def minimize_batched(
    objective: Objective,
    x0_batch: jax.Array,
    solver: SolverBase,
    stopping: StoppingCriteria | None = None,
    *,
    trace: int = 0,
    internals: Any | None = None,
) -> MinimizeResult:
    """Solve a batch of instances of the same objective, vmapped.

    ``x0_batch`` has shape (B, n); every field of the result gains a leading
    batch axis (per-instance status, nfev, iterations — the metrics the
    pod-level benchmark aggregates).  Each lane runs the exact single-problem
    algorithm; finished lanes are frozen so per-instance nfev and stopping
    semantics match the sequential reference.

    ``internals`` (optional) is a solver-internals pytree with a leading
    batch axis — per-lane runtime state such as heterogeneous L-BFGS-B boxes
    (build with ``jax.vmap(lambda lo, up: solver.make_internals(n, dtype,
    lo, up))(lower_batch, upper_batch)``).
    """
    solver.check_mode(objective)
    x0_batch = jnp.asarray(x0_batch)
    if stopping is None:
        stopping = solver.default_stopping(x0_batch.dtype)
    return _solve_batched_jit(
        objective, x0_batch, solver, stopping, trace, internals,
        compute_cond_h=_wants_driver_cond_h(objective, stopping),
    )


@functools.partial(
    jax.jit,
    static_argnames=("objective", "solver", "trace", "callback",
                     "compute_cond_h"),
)
def _resume_jit(
    objective, state, internals, progress, solver, stopping, trace=0,
    callback=None, compute_cond_h=False,
):
    # Re-open the stopping machine: clear the terminal status but keep every
    # counter (violation counts, plateau ring, num_iterations) so the resumed
    # trajectory is exactly the uninterrupted one — then run the SAME loop
    # body as a fresh solve (one body, no drift).
    progress = progress._replace(
        status=jnp.asarray(int(Status.CONTINUE), jnp.int32)
    )
    return _solve_loop(
        objective, solver, state, internals, stopping, trace, callback,
        progress0=progress, compute_cond_h=compute_cond_h,
    )


def resume(
    objective: Objective,
    checkpoint: MinimizeResult,
    solver: SolverBase,
    stopping: StoppingCriteria | None = None,
    *,
    trace: int = 0,
    callback=None,
) -> MinimizeResult:
    """Continue a solve from a checkpointed :class:`MinimizeResult`.

    All solver state is value state (the reference's continuation-friendly
    design, augmented_lagrangian.h:195-203; SURVEY.md §5 checkpoint/resume),
    so a checkpoint is just the result pytree — serialize it with np.savez /
    orbax and pass it back here.  A solve interrupted at iteration k (e.g.
    via ``max_iterations=k``) and resumed reproduces the uninterrupted
    trajectory exactly: progress counters, the plateau ring, and solver
    internals are all carried.
    """
    solver.check_mode(objective)
    if stopping is None:
        stopping = solver.default_stopping(checkpoint.state.x.dtype)
    return _resume_jit(
        objective,
        checkpoint.state,
        checkpoint.internals,
        checkpoint.progress,
        solver,
        stopping,
        trace,
        callback,
        compute_cond_h=_wants_driver_cond_h(objective, stopping),
    )
