"""Convergence state machine and stopping criteria.

TPU-native port of the reference's ``Progress`` machinery
(reference: include/cppoptlib/solver/progress.h:79-464).  The C++ class is a
mutable struct doubling as stopping *config* and live *record*; here those are
two immutable pytrees:

* :class:`StoppingCriteria` — thresholds.  All leaves are **dynamic** scalars
  so the augmented-Lagrangian warm-up schedule (different inner iteration caps
  per outer iteration, augmented_lagrangian.h:530-543) needs no re-trace: caps
  are plain operands of the jitted while_loop.
* :class:`ProgressState` — the live record carried through the solve loop.
  When a batch of instances is vmapped, every field becomes a per-instance
  vector, so one diverging instance never poisons its batch lane-mates.

``update_progress`` mirrors the exact test order and side-effect semantics of
``Progress::Update`` (progress.h:153-327): iteration limit -> x_delta with
violation counter -> f_delta (absolute or Fortran-factr relative) -> plateau
ring buffer -> relative gradient norm -> Hessian condition.  Early "returns"
are emulated with a status accumulator that gates all later counter / ring
mutations, so nfev/convergence classes match the reference's.

The plateau ring buffer (progress.h:280-298) is a fixed-size array of length
``PAST_RING_SIZE`` with a dynamic ``past`` window, keeping shapes static under
jit while allowing the window length to be a runtime knob.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .status import Status

__all__ = [
    "PAST_RING_SIZE",
    "StoppingCriteria",
    "ProgressState",
    "default_stopping",
    "conservative_stopping",
    "init_progress",
    "update_progress",
    "update_progress_constrained",
]

# Static capacity of the plateau ring buffer.  The dynamic window ``past`` may
# be any value in [0, PAST_RING_SIZE]; presets use 3 (default) and 5
# (conservative), reference: progress.h:426, :461.
PAST_RING_SIZE = 8


class StoppingCriteria(NamedTuple):
    """Stopping thresholds (all dynamic scalars; see module docstring).

    Field semantics mirror progress.h:87-140.  A zero/negative threshold
    disables the corresponding test, matching the reference.
    """

    max_iterations: jax.Array  # int32; reference `num_iterations`
    x_delta: jax.Array
    x_delta_violations: jax.Array  # int32 consecutive-violation count
    f_delta: jax.Array
    f_delta_violations: jax.Array  # int32
    f_delta_relative: jax.Array  # bool: Fortran-factr-style relative test
    gradient_norm: jax.Array
    gradient_norm_relative: jax.Array  # bool: |g|inf < tol * max(1, |x|inf)
    condition_hessian: jax.Array
    constraint_threshold: jax.Array
    kkt_stationarity_threshold: jax.Array
    past: jax.Array  # int32 plateau window (0 disables); <= PAST_RING_SIZE
    past_delta: jax.Array

    # -- convenience ---------------------------------------------------------

    def replace(self, **kwargs) -> "StoppingCriteria":
        # Inherit the record's float dtype so f32 configs stay f32.
        dtype = self.x_delta.dtype
        return self._replace(
            **{k: _cast_field(k, v, dtype) for k, v in kwargs.items()}
        )


_INT_FIELDS = frozenset(
    {"max_iterations", "x_delta_violations", "f_delta_violations", "past"}
)
_BOOL_FIELDS = frozenset({"f_delta_relative", "gradient_norm_relative"})


def _cast_field(name: str, value, dtype=jnp.float64):
    if name in _INT_FIELDS:
        value = jnp.asarray(value, jnp.int32)
        if name == "past":
            # An oversized window degrades to the documented capacity
            # instead of silently disabling the plateau test: the one-hot
            # ring read returns 0.0 once past_pos wraps beyond the ring
            # (advisor round-3).
            value = jnp.minimum(value, PAST_RING_SIZE)
        return value
    if name in _BOOL_FIELDS:
        return jnp.asarray(value, jnp.bool_)
    return jnp.asarray(value, dtype)


def _make_criteria(dtype, **kwargs) -> StoppingCriteria:
    return StoppingCriteria(
        **{k: _cast_field(k, v, dtype) for k, v in kwargs.items()}
    )


def default_stopping(dtype=jnp.float64) -> StoppingCriteria:
    """The default preset (progress.h:353-431).

    * gradient test: ``|g|_inf < 1e-5 * max(1, |x|_inf)`` (relative, matching
      Nocedal's lbfgs_um and libLBFGS);
    * plateau test: past=3, past_delta=1e-6;
    * x_delta = 1e-9 with a single-strike violation counter;
    * no f_delta test (L-BFGS-B re-enables it, see its constructor note at
      lbfgsb.h:84-87).

    For float32 (the TPU-native dtype) the machine-epsilon-scaled thresholds
    are loosened: x_delta 1e-9 is below f32 resolution near |x|~1.
    """
    f32 = jnp.dtype(dtype) == jnp.dtype(jnp.float32)
    return _make_criteria(
        dtype,
        max_iterations=10000,
        x_delta=1e-7 if f32 else 1e-9,
        x_delta_violations=1,
        f_delta=0.0,
        f_delta_violations=1,
        f_delta_relative=False,
        gradient_norm=1e-4 if f32 else 1e-5,
        gradient_norm_relative=True,
        condition_hessian=0.0,
        constraint_threshold=1e-4 if f32 else 1e-5,
        kkt_stationarity_threshold=1e-3 if f32 else 1e-4,
        past=3,
        past_delta=1e-5 if f32 else 1e-6,
    )


def conservative_stopping(dtype=jnp.float64) -> StoppingCriteria:
    """Conservative preset (progress.h:456-464): tighter gradient norm (5e-6),
    deeper plateau (past=5, past_delta=1e-10).  Use for objectives with flat
    valleys on the way to the minimum (Powell singular/badly scaled, Meyer)."""
    f32 = jnp.dtype(dtype) == jnp.dtype(jnp.float32)
    return default_stopping(dtype).replace(
        gradient_norm=5e-5 if f32 else 5e-6,
        past=5,
        past_delta=1e-7 if f32 else 1e-10,
    )


class ProgressState(NamedTuple):
    """Live convergence record (progress.h:87-140's mutable fields)."""

    num_iterations: jax.Array  # int32
    x_delta: jax.Array
    x_delta_violations: jax.Array  # int32
    f_delta: jax.Array
    f_delta_violations: jax.Array  # int32
    gradient_norm: jax.Array
    condition_hessian: jax.Array
    status: jax.Array  # int32 Status code
    past_ring: jax.Array  # (PAST_RING_SIZE,) plateau ring buffer
    past_pos: jax.Array  # int32 ring write position


def init_progress(dtype=jnp.float64) -> ProgressState:
    """Fresh progress record with status CONTINUE (the solve loop, like the
    reference's do-while at solver.h:196-220, always takes >= 1 step)."""
    zero = jnp.zeros((), dtype)
    return ProgressState(
        num_iterations=jnp.zeros((), jnp.int32),
        x_delta=zero,
        x_delta_violations=jnp.zeros((), jnp.int32),
        f_delta=zero,
        f_delta_violations=jnp.zeros((), jnp.int32),
        gradient_norm=zero,
        condition_hessian=zero,
        status=jnp.asarray(int(Status.CONTINUE), jnp.int32),
        past_ring=jnp.zeros((PAST_RING_SIZE,), dtype),
        past_pos=jnp.zeros((), jnp.int32),
    )


def _first(status, cond, new_code):
    """Set ``new_code`` only if still CONTINUE and ``cond`` — emulates the
    reference's early-return ladder."""
    take = jnp.logical_and(status == int(Status.CONTINUE), cond)
    return jnp.where(take, jnp.int32(new_code), status)


def update_progress(
    progress: ProgressState,
    prev_state,
    cur_state,
    crit: StoppingCriteria,
    *,
    mode: str = "first",
    condition_hessian=None,
) -> ProgressState:
    """One convergence-test pass; mirrors progress.h:153-327 exactly.

    ``prev_state`` / ``cur_state`` are :class:`FunctionState` pytrees with the
    populated (value, gradient) invariant — no re-evaluation happens here.
    ``mode`` is static: 'none' skips the gradient test (the reference gates it
    on Differentiability at compile time, progress.h:299-317).
    ``condition_hessian`` is an optional precomputed metric for the
    Hessian-condition test (progress.h:318-325); None disables it.
    """
    dtype = cur_state.value.dtype
    num_iterations = progress.num_iterations + 1
    f_delta = jnp.abs(cur_state.value - prev_state.value)
    x_delta = jnp.max(jnp.abs(cur_state.x - prev_state.x))
    if mode == "none":
        gradient_norm = jnp.zeros((), dtype)
    else:
        gradient_norm = jnp.max(jnp.abs(cur_state.gradient))
    cond_h = (
        jnp.zeros((), dtype)
        if condition_hessian is None
        else jnp.asarray(condition_hessian, dtype)
    )

    status = jnp.asarray(int(Status.CONTINUE), jnp.int32)

    # 1. Iteration limit (progress.h:212-216).
    status = _first(
        status,
        jnp.logical_and(
            crit.max_iterations > 0, num_iterations > crit.max_iterations
        ),
        Status.ITERATION_LIMIT,
    )

    # 2. x_delta with consecutive-violation counter (progress.h:254-262).
    # Counter mutations are gated on "test reached" (status still CONTINUE).
    reached = status == int(Status.CONTINUE)
    x_viol_cond = jnp.logical_and(crit.x_delta > 0, x_delta < crit.x_delta)
    x_violations = jnp.where(
        reached,
        jnp.where(x_viol_cond, progress.x_delta_violations + 1, 0),
        progress.x_delta_violations,
    )
    status = _first(
        status,
        jnp.logical_and(x_viol_cond, x_violations >= crit.x_delta_violations),
        Status.X_DELTA_VIOLATION,
    )

    # 3. f_delta, absolute or factr-style relative (progress.h:263-277).
    reached = status == int(Status.CONTINUE)
    f_scale = jnp.where(
        crit.f_delta_relative,
        jnp.maximum(
            jnp.maximum(jnp.abs(cur_state.value), jnp.abs(prev_state.value)),
            jnp.ones((), dtype),
        ),
        jnp.ones((), dtype),
    )
    f_viol_cond = jnp.logical_and(
        crit.f_delta > 0, f_delta < crit.f_delta * f_scale
    )
    f_violations = jnp.where(
        reached,
        jnp.where(f_viol_cond, progress.f_delta_violations + 1, 0),
        progress.f_delta_violations,
    )
    status = _first(
        status,
        jnp.logical_and(f_viol_cond, f_violations >= crit.f_delta_violations),
        Status.F_DELTA_VIOLATION,
    )

    # 4. Plateau ring buffer (progress.h:280-298).  Lazy init on the first
    # Update fills the ring with the current value; the test only fires after
    # `past` iterations have seeded it; the ring write is skipped when an
    # earlier test already returned (reference early-returns before the
    # write).
    reached = status == int(Status.CONTINUE)
    past_active = crit.past > 0
    cur_value = cur_state.value
    ring = jnp.where(
        jnp.logical_and(past_active, num_iterations == 1),
        jnp.full((PAST_RING_SIZE,), cur_value, dtype),
        progress.past_ring,
    )
    # One-hot read/write instead of gather/scatter: dynamic-index ops are
    # slow paths on TPU, and the vmapped gather+select pattern trips an XLA
    # algebraic-simplifier CHECK ("directed cycle") when a batched AL outer
    # loop embedding this machine is compiled for TPU — the masked form
    # lowers to pure vector selects.
    ring_slot = jax.lax.broadcasted_iota(jnp.int32, (PAST_RING_SIZE,), 0)
    at_pos = ring_slot == progress.past_pos
    past_f = jnp.sum(jnp.where(at_pos, ring, jnp.zeros((), dtype)))
    rate = jnp.abs(past_f - cur_value) / jnp.maximum(
        jnp.ones((), dtype), jnp.abs(cur_value)
    )
    plateau_fires = jnp.logical_and(
        jnp.logical_and(past_active, num_iterations > crit.past),
        rate < crit.past_delta,
    )
    status = _first(status, plateau_fires, Status.F_DELTA_VIOLATION)
    write_ring = jnp.logical_and(
        past_active, status == int(Status.CONTINUE)
    )
    write_ring = jnp.logical_and(write_ring, reached)
    ring = jnp.where(
        jnp.logical_and(at_pos, write_ring), cur_value, ring
    )
    past_pos = jnp.where(
        write_ring,
        jnp.where(
            progress.past_pos + 1 >= crit.past,
            jnp.zeros((), jnp.int32),
            progress.past_pos + 1,
        ),
        progress.past_pos,
    )

    # 5. Gradient norm, relative by default (progress.h:299-317).
    if mode != "none":
        scale = jnp.where(
            crit.gradient_norm_relative,
            jnp.maximum(jnp.ones((), dtype), jnp.max(jnp.abs(cur_state.x))),
            jnp.ones((), dtype),
        )
        status = _first(
            status,
            jnp.logical_and(
                crit.gradient_norm > 0,
                gradient_norm < crit.gradient_norm * scale,
            ),
            Status.GRADIENT_NORM_VIOLATION,
        )

    # 6. Hessian condition (progress.h:318-325), only when a metric was
    # supplied by the solver (second-order paths).
    if condition_hessian is not None:
        status = _first(
            status,
            jnp.logical_and(
                crit.condition_hessian > 0, cond_h > crit.condition_hessian
            ),
            Status.HESSIAN_CONDITION_VIOLATION,
        )

    return ProgressState(
        num_iterations=num_iterations,
        x_delta=x_delta,
        x_delta_violations=x_violations,
        f_delta=f_delta,
        f_delta_violations=f_violations,
        gradient_norm=gradient_norm,
        condition_hessian=cond_h,
        status=status,
        past_ring=ring,
        past_pos=past_pos,
    )


def update_progress_constrained(
    progress: ProgressState,
    prev_x,
    cur_x,
    prev_value,
    cur_value,
    gradient_norm,
    max_violation,
    max_lagrangian_gradient,
    crit: StoppingCriteria,
) -> ProgressState:
    """Constrained (augmented-Lagrangian) branch of ``Progress::Update``
    (progress.h:217-253): iteration limit, then NaN hard-stop, then
    feasibility AND KKT stationarity => FINISHED, else CONTINUE.  None of the
    unconstrained delta tests apply."""
    dtype = jnp.asarray(cur_value).dtype
    num_iterations = progress.num_iterations + 1
    f_delta = jnp.abs(cur_value - prev_value)
    x_delta = jnp.max(jnp.abs(cur_x - prev_x))

    status = jnp.asarray(int(Status.CONTINUE), jnp.int32)
    status = _first(
        status,
        jnp.logical_and(
            crit.max_iterations > 0, num_iterations > crit.max_iterations
        ),
        Status.ITERATION_LIMIT,
    )
    # NaN hard-stop (progress.h:235-239): no recovering iterate information
    # from NaN; the outer solver's best-iterate tracker rescues the result.
    non_finite = jnp.logical_or(
        ~jnp.isfinite(max_violation), ~jnp.isfinite(max_lagrangian_gradient)
    )
    status = _first(status, non_finite, Status.ITERATION_LIMIT)

    primal_feasible = jnp.abs(max_violation) <= crit.constraint_threshold
    kkt_stationary = jnp.logical_or(
        crit.kkt_stationarity_threshold <= 0,
        max_lagrangian_gradient <= crit.kkt_stationarity_threshold,
    )
    status = _first(
        status,
        jnp.logical_and(primal_feasible, kkt_stationary),
        Status.FINISHED,
    )

    return progress._replace(
        num_iterations=num_iterations,
        x_delta=x_delta,
        f_delta=f_delta,
        gradient_norm=jnp.asarray(gradient_norm, dtype),
        status=status,
    )
