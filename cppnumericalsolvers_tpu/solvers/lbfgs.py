"""L-BFGS with More-Thuente line search.

TPU-native re-design of the reference's L-BFGS
(reference: include/cppoptlib/solver/lbfgs.h:40-324).  The (s, y) correction
history is a pair of fixed-shape ``(m, n)`` ring buffers carried in the loop
state — under ``vmap`` they become ``(B, m, n)`` and the two-loop recursion's
dot products become batched contractions on the MXU.  All of the reference's
hard-won numerical guards are preserved:

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
from jax import lax

from ..core.driver import SolverBase
from ..core.objective import FunctionState, Objective
from ..core.progress import StoppingCriteria
from ..linesearch.more_thuente import more_thuente

__all__ = ["Lbfgs", "LbfgsInternals", "two_loop_direction"]


class LbfgsInternals(NamedTuple):
    s_memory: jax.Array  # (m, n) x-diff ring buffer
    y_memory: jax.Array  # (m, n) grad-diff ring buffer
    mem_count: jax.Array  # int32 number of stored corrections (<= m)
    mem_pos: jax.Array  # int32 index of the oldest correction when full
    gamma: jax.Array  # scalar H0 scaling factor (N&W 7.20)


def two_loop_direction(
    gradient: jax.Array,
    s_memory: jax.Array,
    y_memory: jax.Array,
    mem_count: jax.Array,
    mem_pos: jax.Array,
    gamma,
    precond_diagonal: jax.Array | None = None,
) -> jax.Array:
    """Two-loop recursion producing ``H^{-1} g`` (lbfgs.h:141-196).

    Fixed trip count ``m`` with masking on ``i < mem_count`` so the function
    jits/vmaps with static shapes; pairs whose ``s.y`` denominator is below
    machine epsilon are skipped exactly as in the reference (lbfgs.h:165-167).
    """
    m = s_memory.shape[0]
    dtype = gradient.dtype
    eps = jnp.finfo(dtype).eps

    def slot(i):
        # Chronological order i=0 (oldest) .. count-1 (newest): contiguous
        # until the buffer fills, then cyclic from mem_pos (lbfgs.h:157-162).
        return jnp.where(mem_count < m, i, (mem_pos + i) % m)

    q0 = gradient
    alphas0 = jnp.zeros((m,), dtype)

    def backward(j, carry):
        q, alphas = carry
        i = mem_count - 1 - j
        active = i >= 0
        idx = slot(jnp.maximum(i, 0))
        s_i = s_memory[idx]
        y_i = y_memory[idx]
        denom = jnp.vdot(s_i, y_i)
        usable = jnp.logical_and(active, jnp.abs(denom) >= eps)
        rho = jnp.where(usable, 1.0 / denom, 0.0)
        alpha_i = rho * jnp.vdot(s_i, q)
        q = jnp.where(usable, q - alpha_i * y_i, q)
        alphas = alphas.at[jnp.maximum(i, 0)].set(
            jnp.where(usable, alpha_i, alphas[jnp.maximum(i, 0)])
        )
        return q, alphas

    q, alphas = lax.fori_loop(0, m, backward, (q0, alphas0))

    # Center: Morales-Nocedal diagonal preconditioner when second-order
    # information is available, else the scalar gamma H0 (lbfgs.h:174-182).
    if precond_diagonal is not None:
        q = precond_diagonal * q
    else:
        q = q * gamma

    def forward(i, q):
        active = i < mem_count
        i_safe = jnp.where(active, i, 0)
        idx = slot(i_safe)
        s_i = s_memory[idx]
        y_i = y_memory[idx]
        denom = jnp.vdot(s_i, y_i)
        usable = jnp.logical_and(active, jnp.abs(denom) >= eps)
        rho = jnp.where(usable, 1.0 / denom, 0.0)
        beta = rho * jnp.vdot(y_i, q)
        # alphas is indexed chronologically (C++ `alpha(i)`, lbfgs.h:195).
        return jnp.where(usable, q + s_i * (alphas[i_safe] - beta), q)

    q = lax.fori_loop(0, m, forward, q)
    return q


@dataclasses.dataclass(frozen=True)
class Lbfgs(SolverBase):
    """Limited-memory BFGS (default history m=10, lbfgs.h:40)."""

    m: int = 10
    #: Use the Hessian-diagonal preconditioner (requires a second-mode
    #: objective); lbfgs.h:97-139.
    use_hessian_preconditioner: bool = False
    max_linesearch_fev: int = 20

    def init(self, objective: Objective, state: FunctionState) -> LbfgsInternals:
        n = state.x.shape[-1]
        dtype = state.x.dtype
        return LbfgsInternals(
            s_memory=jnp.zeros((self.m, n), dtype),
            y_memory=jnp.zeros((self.m, n), dtype),
            mem_count=jnp.zeros((), jnp.int32),
            mem_pos=jnp.zeros((), jnp.int32),
            gamma=jnp.ones((), dtype),
        )

    def step(
        self,
        objective: Objective,
        state: FunctionState,
        internals: LbfgsInternals,
        stopping: StoppingCriteria,
    ) -> tuple[FunctionState, LbfgsInternals]:
        del stopping
        dtype = state.x.dtype
        eps = jnp.finfo(dtype).eps
        relative_eps = eps * jnp.maximum(1.0, jnp.linalg.norm(state.x))

        gradient = state.gradient
        nfev = state.nfev

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

        direction = two_loop_direction(
            gradient,
            internals.s_memory,
            internals.y_memory,
            internals.mem_count,
            internals.mem_pos,
            internals.gamma,
            precond,
        )

        descent = -jnp.vdot(gradient, direction)
        direction_norm = jnp.linalg.norm(direction)
        gradient_norm = jnp.linalg.norm(gradient)

        # Initial step: 1/|d| with no curvature history, else 1
        # (lbfgs.h:199-213).
        alpha_init = jnp.where(
            internals.mem_count == 0,
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
        mem_count = jnp.where(invalid, 0, internals.mem_count)
        mem_pos = jnp.where(invalid, 0, internals.mem_pos)

        # Strong-Wolfe line search along -direction (lbfgs.h:226-232).
        ls = more_thuente(
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

        # Curvature-gated ring-buffer push (lbfgs.h:253-280).
        sy = jnp.vdot(s, y)
        sy_threshold = eps * jnp.linalg.norm(s) * jnp.linalg.norm(y)
        accept = jnp.logical_and(finite, sy > sy_threshold)
        write_slot = jnp.where(mem_count < self.m, mem_count, mem_pos)
        s_memory = jnp.where(
            accept,
            internals.s_memory.at[write_slot].set(s),
            internals.s_memory,
        )
        y_memory = jnp.where(
            accept,
            internals.y_memory.at[write_slot].set(y),
            internals.y_memory,
        )
        new_count = jnp.where(
            jnp.logical_and(accept, mem_count < self.m),
            mem_count + 1,
            mem_count,
        )
        new_pos = jnp.where(
            jnp.logical_and(accept, mem_count >= self.m),
            (mem_pos + 1) % self.m,
            mem_pos,
        )

        # Gamma update with finite/magnitude guards (lbfgs.h:281-298).
        fallback_value = jnp.asarray(1e7, dtype)
        y_norm_sq = jnp.vdot(y, y)
        temp_scaling = jnp.vdot(y, s) / jnp.where(y_norm_sq > eps, y_norm_sq, 1.0)
        scaling_ok = jnp.logical_and(
            jnp.logical_and(finite, y_norm_sq > eps),
            jnp.logical_and(
                jnp.isfinite(temp_scaling),
                jnp.abs(temp_scaling) <= fallback_value,
            ),
        )
        gamma = jnp.where(
            scaling_ok, jnp.maximum(temp_scaling, eps), internals.gamma
        )

        return next_state, LbfgsInternals(
            s_memory=s_memory,
            y_memory=y_memory,
            mem_count=new_count,
            mem_pos=new_pos,
            gamma=gamma,
        )
