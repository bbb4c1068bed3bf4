"""L-BFGS with More-Thuente line search.

TPU-native re-design of the reference's L-BFGS
(reference: include/cppoptlib/solver/lbfgs.h:40-324).  The (s, y) correction
history is a pair of fixed-shape ``(m, n)`` ring buffers carried in the loop
state — under ``vmap`` they become ``(B, m, n)`` and the whole direction step
(history push + two-loop recursion) is ONE fused Pallas kernel on TPU: the
history is read from HBM once per iteration, updated and consumed in VMEM,
and written back once (see ops/two_loop.py).  To enable that fusion the
post-line-search history update is carried as a *pending* correction pair and
applied at the top of the next iteration — the reference's event order
(resets, then push, then the next two-loop; lbfgs.h:214-224, :253-298,
:141-196) is preserved exactly.

All of the reference's hard-won numerical guards are preserved:

* curvature-gated history update ``s^T y > eps * |s| * |y|`` (lbfgs.h:253-280,
  the fix for MGH-10 Meyer's 76% pair-rejection pathology);
* gamma-scaling of H0 with finite/magnitude fallback guards (lbfgs.h:281-298);
* steepest-descent fallback + history reset on an invalid descent direction
  (lbfgs.h:199-224) — implemented as a true ``-g`` step (the reference's
  fallback negates into the line search as written, which makes the search
  abort on a non-descent direction; the intended steepest-descent semantics
  documented in its comment are used here);
* non-finite line-search result returns the last finite state (lbfgs.h:234-241);
* optional Morales-Nocedal diagonal preconditioner from the Hessian diagonal
  for second-order objectives (lbfgs.h:97-139).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.driver import SolverBase
from ..core.objective import FunctionState, Objective
from ..core.progress import StoppingCriteria
from ..linesearch.dispatch import run_line_search
from ..ops.two_loop import (
    lbfgs_push_and_direction,
    push_history_xla,
    two_loop_direction,
    two_loop_direction_xla,
)

__all__ = ["Lbfgs", "LbfgsInternals", "two_loop_direction"]


class LbfgsInternalsT(NamedTuple):
    """Batched-native internals with the history in the batch-minor
    (transposed) storage layout of ops/fused_step_t.py: ``(m * n8, B_pad)``
    with the batch in the TPU lane dimension.  Produced by
    :meth:`Lbfgs.init_batched` on the batched TPU/f32 path; convert with
    ``ops.fused_step_t.history_t_to_rows`` for export.  Field names shared
    with :class:`LbfgsInternals` (``mem_count``, ``pending_valid``, ...)
    keep result introspection uniform across paths."""

    s_memory_t: jax.Array  # (m*n8, B_pad) x-diff history, batch-minor
    y_memory_t: jax.Array  # (m*n8, B_pad)
    mem_count: jax.Array  # (B,) int32
    gamma: jax.Array  # (B,)
    s_pending: jax.Array  # (B, n)
    y_pending: jax.Array  # (B, n)
    pending_valid: jax.Array  # (B,) bool


class LbfgsInternals(NamedTuple):
    """Correction history in CHRONOLOGICAL layout: row 0 is the oldest valid
    correction, row ``mem_count - 1`` the newest.  The reference keeps a
    circular buffer with a rotating start pointer (lbfgs.h:157-162); under a
    vmapped batch the per-lane pointers diverge and every access becomes a
    gather, so we pay a contiguous roll on append instead — see
    ops/two_loop.py for the rationale.

    The newest correction pair produced by a step is carried as
    ``(s_pending, y_pending, pending_valid)`` and appended at the top of the
    NEXT step, fused with that step's two-loop recursion (one HBM round trip
    for the history per iteration instead of two).  The event order matches
    the reference: the push still lands after this step's invalid-descent /
    stall resets and before the next direction is computed."""

    s_memory: jax.Array  # (m, n) x-diff history, oldest first
    y_memory: jax.Array  # (m, n) grad-diff history, oldest first
    mem_count: jax.Array  # int32 number of stored corrections (<= m)
    gamma: jax.Array  # scalar H0 scaling factor (N&W 7.20)
    s_pending: jax.Array  # (n,) newest x-diff, not yet appended
    y_pending: jax.Array  # (n,) newest grad-diff, not yet appended
    pending_valid: jax.Array  # bool: pending pair came from a finite step


@dataclasses.dataclass(frozen=True)
class Lbfgs(SolverBase):
    """Limited-memory BFGS (default history m=10, lbfgs.h:40)."""

    m: int = 10
    #: Use the Hessian-diagonal preconditioner (requires a second-mode
    #: objective); lbfgs.h:97-139.
    use_hessian_preconditioner: bool = False
    max_linesearch_fev: int = 20
    #: Pluggable search (lbfgs.h:40-41): more_thuente | hager_zhang | armijo.
    line_search: str = "more_thuente"
    #: Two-loop lowering: "auto" (fused Pallas kernel on the batched TPU
    #: path) | "xla" (pure-XLA scan — required when the solve itself is
    #: GSPMD-sharded, e.g. parallel.minimize_model_sharded, since a
    #: pallas_call cannot be auto-partitioned).
    two_loop_impl: str = "auto"
    #: This solver freezes its own internals for converged lanes (the
    #: history push is gated by ``done`` inside the fused kernel), sparing
    #: the driver's generic freeze select from re-reading and re-writing the
    #: (m, n) buffers every iteration — see core/driver.py.
    freeze_in_step: bool = dataclasses.field(
        default=True, init=False, repr=False
    )

    def supports_fused_update(self, objective: Objective) -> bool:
        """The fused prologue/epilogue path (ops/fused_step.py) covers every
        configuration except the Hessian preconditioner (needs an extra
        objective transform mid-step) and the forced pure-XLA lowering used
        under GSPMD sharding."""
        del objective
        return self.two_loop_impl == "auto" and not self.use_hessian_preconditioner

    #: Largest n routed through the batch-minor (transposed) storage layout
    #: on the batched TPU path.  v5e per-batched-iteration measurements
    #: (round 5, full solve): (1024, 32) 162.4 -> 94.8 us (1.71x),
    #: (1024, 256) 185.8 -> 124.1 us, (1024, 512) 334.8 -> 250.8 us,
    #: (1024, 1024) 612.3 -> 478.0 us, (512, 2048) 564.2 -> 453.1 us
    #: (1.25x); at (256, 4096) the layouts tie (602 vs 600 us — both
    #: HBM-bandwidth-bound), so the largest n stays on the batch-major
    #: flat kernel.  Below _FLAT_N_MAX the flat trip-granular solve
    #: supersedes this path; the iteration-granular transposed path owns
    #: (_FLAT_N_MAX, _TRANSPOSED_N_MAX].  See ops/fused_step_t.py.
    _TRANSPOSED_N_MAX = 2048

    def supports_batched_native(self, objective, x0_batch) -> bool:
        """The batched-native transposed path: TPU, f32, the fused-update
        configuration, the default More-Thuente search, and a batch wide
        enough (>= 128 lanes) that batch-minor layout pays."""
        if not self.supports_fused_update(objective):
            return False
        if self.line_search != "more_thuente":
            return False
        if jax.default_backend() != "tpu":
            return False
        b, n = x0_batch.shape
        return (
            x0_batch.dtype == jnp.float32
            and b >= 128
            and n <= self._TRANSPOSED_N_MAX
        )

    #: Largest n routed through the FLAT trip-granular solve loop
    #: (ops/flat_solve.py): one loop, one mega-kernel per objective
    #: evaluation.  Profiling at (1024, 32) showed the nested loop spending
    #: ~45% of its budget on structural overhead (inner-loop carry copies,
    #: double predicates, glue-op scheduling gaps); the flat loop removes
    #: it.  The boundary (push + two-loop) work runs masked on every trip
    #: (~1.1-1.2x the per-iteration history traffic), yet the structural
    #: savings win well past the VMEM-resident regime — v5e per batched
    #: iteration, flat vs nested transposed: (1024, 512) 107.8 vs 250.8 us,
    #: (1024, 1024) 358.2 vs 467.7 us; at (256, 4096) the two tie
    #: (587 us, HBM-bandwidth-bound), so the largest shapes keep the
    #: iteration-granular nested path.
    _FLAT_N_MAX = 1024

    def solve_batched_native(self, objective, state0, stopping):
        b, n = state0.x.shape
        if n > self._FLAT_N_MAX:
            return super().solve_batched_native(objective, state0, stopping)
        from ..core.driver import MinimizeResult
        from ..ops.flat_solve import flat_lbfgs_solve

        state, (s_t, y_t, count, gamma), progress = flat_lbfgs_solve(
            objective, state0, stopping, m=self.m,
            max_fev=self.max_linesearch_fev,
        )
        dtype = state.x.dtype
        internals = LbfgsInternalsT(
            s_memory_t=s_t,
            y_memory_t=y_t,
            mem_count=count,
            gamma=gamma,
            # The flat loop applies correction pairs at the iteration
            # boundary directly — there is never a pending pair.
            s_pending=jnp.zeros((b, n), dtype),
            y_pending=jnp.zeros((b, n), dtype),
            pending_valid=jnp.zeros((b,), jnp.bool_),
        )
        return MinimizeResult(
            state=state, progress=progress, internals=internals, trace=None
        )

    def init_batched(self, objective, state):
        from ..ops.fused_step_t import make_history_t

        b, n = state.x.shape
        dtype = state.x.dtype
        return LbfgsInternalsT(
            s_memory_t=make_history_t(b, self.m, n, dtype),
            y_memory_t=make_history_t(b, self.m, n, dtype),
            mem_count=jnp.zeros((b,), jnp.int32),
            gamma=jnp.ones((b,), dtype),
            s_pending=jnp.zeros((b, n), dtype),
            y_pending=jnp.zeros((b, n), dtype),
            pending_valid=jnp.zeros((b,), jnp.bool_),
        )

    def batched_step_and_update(
        self, objective, state, internals, progress, stopping, done
    ):
        """One batched L-BFGS iteration on the transposed storage layout:
        transposed prologue kernel -> batch-native More-Thuente -> epilogue
        kernel.  Semantically the same composition as
        :meth:`step_and_update` (parity-tested, tests/test_fused_step_t.py);
        only storage layout and reduction axes differ."""
        from ..ops.fused_linesearch import mt_pallas_batched, mt_xla_batched
        from ..ops.fused_step import lbfgs_epilogue
        from ..ops.fused_step_t import prologue_t_pallas_batched

        b, n = state.x.shape
        ls_dir, alpha_init, dginit, s_t, y_t, count, gamma = (
            prologue_t_pallas_batched(
                state.x,
                state.gradient,
                internals.s_memory_t,
                internals.y_memory_t,
                internals.mem_count,
                internals.gamma,
                internals.s_pending,
                internals.y_pending,
                internals.pending_valid,
                done,
            )
        )
        bvag = jax.vmap(objective.value_and_grad)
        search = (
            mt_pallas_batched if (n % 8 == 0 and b % 8 == 0)
            else mt_xla_batched
        )
        ls_x, ls_f, ls_g, _alpha, ls_nfev, _info = search(
            objective.value_and_grad,
            state.x,
            state.value,
            state.gradient,
            ls_dir,
            alpha_init,
            dginit,
            max_fev=self.max_linesearch_fev,
            batched_value_and_grad=bvag,
        )
        new_state, s_pend, y_pend, pvalid, count_out, new_progress = (
            jax.vmap(
                lbfgs_epilogue, in_axes=(0,) * 10 + (0, None)
            )(state, ls_x, ls_f, ls_g, ls_nfev, count,
              internals.s_pending, internals.y_pending,
              internals.pending_valid, done, progress, stopping)
        )
        new_internals = LbfgsInternalsT(
            s_memory_t=s_t,
            y_memory_t=y_t,
            mem_count=count_out,
            gamma=gamma,
            s_pending=s_pend,
            y_pending=y_pend,
            pending_valid=pvalid,
        )
        return new_state, new_internals, new_progress

    def step_and_update(
        self,
        objective: Objective,
        state: FunctionState,
        internals: LbfgsInternals,
        progress,
        stopping: StoppingCriteria,
        done: jax.Array,
    ):
        """One full L-BFGS iteration with the convergence machine fused in:
        prologue kernel -> line search (objective evals) -> epilogue kernel.
        Semantically identical to ``step`` + ``update_progress`` + lane
        freezing — the ops' un-batched/XLA forms are that exact composition
        (see ops/fused_step.py) — but the batched TPU path runs as two
        Pallas kernels instead of ~50 dispatches per iteration."""
        from ..ops.fused_step import lbfgs_epilogue, lbfgs_prologue

        ls_dir, alpha_init, dginit, s_mem, y_mem, count, gamma = (
            lbfgs_prologue(
                state.x,
                state.gradient,
                internals.s_memory,
                internals.y_memory,
                internals.mem_count,
                internals.gamma,
                internals.s_pending,
                internals.y_pending,
                internals.pending_valid,
                done,
            )
        )
        ls = run_line_search(
            self.line_search,
            objective.value_and_grad,
            state.x,
            state.value,
            state.gradient,
            ls_dir,
            alpha_init,
            max_fev=self.max_linesearch_fev,
            dginit=dginit,
        )
        new_state, s_pend, y_pend, pvalid, count_out, new_progress = (
            lbfgs_epilogue(
                state, ls.x, ls.f, ls.g, ls.nfev, count,
                internals.s_pending, internals.y_pending,
                internals.pending_valid, done, progress, stopping,
            )
        )
        new_internals = LbfgsInternals(
            s_memory=s_mem,
            y_memory=y_mem,
            mem_count=count_out,
            gamma=gamma,
            s_pending=s_pend,
            y_pending=y_pend,
            pending_valid=pvalid,
        )
        return new_state, new_internals, new_progress

    def init(self, objective: Objective, state: FunctionState) -> LbfgsInternals:
        n = state.x.shape[-1]
        dtype = state.x.dtype
        return LbfgsInternals(
            s_memory=jnp.zeros((self.m, n), dtype),
            y_memory=jnp.zeros((self.m, n), dtype),
            mem_count=jnp.zeros((), jnp.int32),
            gamma=jnp.ones((), dtype),
            s_pending=jnp.zeros((n,), dtype),
            y_pending=jnp.zeros((n,), dtype),
            pending_valid=jnp.zeros((), jnp.bool_),
        )

    def step(
        self,
        objective: Objective,
        state: FunctionState,
        internals: LbfgsInternals,
        stopping: StoppingCriteria,
        done: jax.Array | None = None,
    ) -> tuple[FunctionState, LbfgsInternals]:
        del stopping
        dtype = state.x.dtype
        eps = jnp.finfo(dtype).eps
        relative_eps = eps * jnp.maximum(1.0, jnp.linalg.norm(state.x))

        gradient = state.gradient
        nfev = state.nfev

        # freeze_in_step contract (core/driver.py): a done lane's internals
        # must come back unchanged.  Gating the pending pair's validity makes
        # the fused push a no-op (buffers, count, gamma all pass through);
        # the cheap per-lane resets below are where(done, ...)-guarded.
        pending_valid = internals.pending_valid
        if done is not None:
            pending_valid = jnp.logical_and(pending_valid, ~done)

        precond = None
        if self.use_hessian_preconditioner:
            if objective.mode != "second":
                raise ValueError(
                    "use_hessian_preconditioner requires a second-mode "
                    "objective"
                )
            hess_diag = jnp.diagonal(objective.hessian(state.x))
            precond = 1.0 / (jnp.abs(hess_diag) + eps)
            nfev = nfev + 1

        # Append the previous step's correction pair (curvature-gated,
        # lbfgs.h:253-298) and compute the new direction (lbfgs.h:141-196).
        if precond is not None or self.two_loop_impl == "xla":
            s_memory, y_memory, mem_count, gamma = push_history_xla(
                internals.s_memory,
                internals.y_memory,
                internals.mem_count,
                internals.gamma,
                internals.s_pending,
                internals.y_pending,
                pending_valid,
            )
            direction = two_loop_direction_xla(
                gradient, s_memory, y_memory, mem_count, gamma, precond
            )
        else:
            # custom_vmap op: the batched solve path lowers this to the
            # fused Pallas kernel on TPU (ops/two_loop.py).
            direction, s_memory, y_memory, mem_count, gamma = (
                lbfgs_push_and_direction(
                    gradient,
                    internals.s_memory,
                    internals.y_memory,
                    internals.mem_count,
                    internals.gamma,
                    internals.s_pending,
                    internals.y_pending,
                    pending_valid,
                )
            )

        descent = -jnp.vdot(gradient, direction)
        direction_norm = jnp.linalg.norm(direction)
        gradient_norm = jnp.linalg.norm(gradient)

        # Initial step: 1/|d| with no curvature history, else 1
        # (lbfgs.h:199-213).
        alpha_init = jnp.where(
            mem_count == 0,
            jnp.where(direction_norm > eps, 1.0 / direction_norm, 1.0),
            jnp.ones((), dtype),
        )

        # Invalid-descent fallback: steepest descent + history reset
        # (lbfgs.h:214-224).
        invalid = jnp.logical_or(
            ~jnp.isfinite(descent), descent > -eps * relative_eps
        )
        direction = jnp.where(invalid, gradient, direction)
        alpha_init = jnp.where(
            invalid,
            jnp.where(gradient_norm > eps, 1.0 / gradient_norm, 1.0),
            alpha_init,
        )
        mem_count = jnp.where(invalid, 0, mem_count)

        # Strong-Wolfe line search along -direction (lbfgs.h:226-232).
        ls = run_line_search(
            self.line_search,
            objective.value_and_grad,
            state.x,
            state.value,
            gradient,
            -direction,
            alpha_init,
            max_fev=self.max_linesearch_fev,
        )
        nfev = nfev + ls.nfev

        # Non-finite guard: keep the last finite state (lbfgs.h:234-241).
        finite = jnp.isfinite(ls.f)
        next_state = FunctionState(
            x=jnp.where(finite, ls.x, state.x),
            value=jnp.where(finite, ls.f, state.value),
            gradient=jnp.where(finite, ls.g, gradient),
            nfev=nfev,
        )

        s = next_state.x - state.x
        y = next_state.gradient - gradient

        # Stall recovery: a line search that could not move x at all (it
        # returned the start point after exhausting maxfev) would repeat the
        # identical failing direction next iteration.  Clearing the history
        # makes the next step steepest descent with a fresh step length — a
        # free retry (no extra evaluations this step).  With the default
        # single-strike x_delta stop the solve still terminates exactly like
        # the reference (lbfgs.h:214-224 resets history on invalid descent
        # for the same reason); with x_delta_violations >= 2 the retry runs.
        stalled = jnp.max(jnp.abs(s)) <= 0.0
        mem_count = jnp.where(stalled, 0, mem_count)

        if done is not None:
            # Done lanes: every internals field returns bit-identical (the
            # push above was already gated; resets and the new pending pair
            # must not land).
            mem_count = jnp.where(done, internals.mem_count, mem_count)
            s = jnp.where(done, internals.s_pending, s)
            y = jnp.where(done, internals.y_pending, y)
            finite = jnp.where(done, internals.pending_valid, finite)

        return next_state, LbfgsInternals(
            s_memory=s_memory,
            y_memory=y_memory,
            mem_count=mem_count,
            gamma=gamma,
            s_pending=s,
            y_pending=y,
            pending_valid=finite,
        )
