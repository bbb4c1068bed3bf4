"""Nelder–Mead derivative-free simplex solver.

TPU-native port of the reference's NelderMead
(reference: include/cppoptlib/solver/nelder_mead.h:40-235): coefficients
rho=1, xi=20, gamma=0.1, sigma=0.5, adaptive initial simplex
(nelder_mead.h:202-217), degeneracy restart (:120-139), coincidence-guarded
reflection (:150-153), and the conservative stopping preset with a 5-strike
x-delta counter (:87-91).

The simplex is an (n+1, n) array; all n+1 vertex evaluations per iteration
run as one vmapped batch (a single fused XLA computation instead of the
reference's sequential loop).  Branch outcomes (reflect/expand/contract/
shrink) are computed as candidates and selected with ``where``; the nfev
counter increments only for the evaluations the reference's control flow
would actually perform, so nfev parity is preserved.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.driver import SolverBase
from ..core.objective import FunctionState, Objective
from ..core.progress import StoppingCriteria, conservative_stopping
from ..core.tree import tree_where

__all__ = ["NelderMead"]

_RHO = 1.0  # reflection
_XI = 20.0  # expansion
_GAMMA = 0.1  # contraction
_SIGMA = 0.5  # shrink
_DEGENERATE_TOL = 1e-8


class NmInternals(NamedTuple):
    simplex: jax.Array  # (n+1, n) vertices; row 0 is the initial point


def _initial_simplex(x: jax.Array) -> jax.Array:
    """Adaptive initial simplex (nelder_mead.h:202-217): vertex c = x +
    delta_c e_c with delta = 0.05|x_c| (or 0.001 when |x_c| <= 1e-6)."""
    n = x.shape[-1]
    delta = jnp.where(jnp.abs(x) > 1e-6, 0.05 * jnp.abs(x), 0.001)
    vertices = x[None, :] + jnp.concatenate(
        [jnp.zeros((1, n), x.dtype), jnp.diag(delta)], axis=0
    )
    return vertices


@dataclasses.dataclass(frozen=True)
class NelderMead(SolverBase):
    mode: str = dataclasses.field(default="none", init=False, repr=False)
    #: Progress updates treat the solve as derivative-free regardless of the
    #: objective's own mode (no gradient-norm stopping test).
    progress_mode: str = dataclasses.field(
        default="none", init=False, repr=False
    )

    def default_stopping(self, dtype) -> StoppingCriteria:
        # Conservative preset + 5-strike x-delta (nelder_mead.h:68-91): the
        # simplex legitimately produces consecutive tiny x-deltas while
        # contracting.
        return conservative_stopping(dtype).replace(x_delta_violations=5)

    def init(self, objective: Objective, state: FunctionState) -> NmInternals:
        return NmInternals(simplex=_initial_simplex(state.x))

    def step(
        self,
        objective: Objective,
        state: FunctionState,
        internals: NmInternals,
        stopping: StoppingCriteria,
    ):
        del stopping
        simplex = internals.simplex
        n = state.x.shape[-1]
        num_vertices = n + 1
        eval_batch = jax.vmap(objective.value)

        f = eval_batch(simplex)
        nfev = state.nfev + num_vertices
        order = jnp.argsort(f)

        # Degeneracy restart around the best vertex (nelder_mead.h:120-139).
        best = simplex[order[0]]
        max_dist = jnp.max(
            jnp.max(jnp.abs(simplex - best[None, :]), axis=-1)
            .at[order[0]]
            .set(0.0)
        )
        degenerate = max_dist < _DEGENERATE_TOL
        restart = _initial_simplex(best)
        simplex = jnp.where(degenerate, restart, simplex)
        f_restart = eval_batch(restart)
        f = jnp.where(degenerate, f_restart, f)
        nfev = nfev + jnp.where(degenerate, num_vertices, 0)
        order = jnp.where(degenerate, jnp.argsort(f_restart), order)

        i_best = order[0]
        i_second_worst = order[n - 1]
        i_worst = order[n]
        worst = simplex[i_worst]
        f_best = f[i_best]
        f_second_worst = f[i_second_worst]
        f_worst = f[i_worst]

        # Centroid of the best n vertices (:141-146).
        x_bar = (jnp.sum(simplex, axis=0) - worst) / n

        x_r = (1.0 + _RHO) * x_bar - _RHO * worst
        coincident = jnp.logical_or(
            jnp.max(jnp.abs(x_r - x_bar)) < _DEGENERATE_TOL,
            jnp.max(jnp.abs(x_r - worst)) < _DEGENERATE_TOL,
        )

        f_r = objective.value(x_r)
        x_e = (1.0 + _RHO * _XI) * x_bar - _RHO * _XI * worst
        f_e = objective.value(x_e)
        x_c_out = (1.0 + _RHO * _GAMMA) * x_bar - _RHO * _GAMMA * worst
        f_c_out = objective.value(x_c_out)
        x_c_in = (1.0 - _GAMMA) * x_bar + _GAMMA * worst
        f_c_in = objective.value(x_c_in)

        # Branch selection (:156-191).  `replacement` is the vertex written
        # over the worst; `do_shrink` contracts everything toward the best.
        case_expand = f_r < f_best
        case_reflect = jnp.logical_and(~case_expand, f_r < f_second_worst)
        case_out = jnp.logical_and(
            ~jnp.logical_or(case_expand, case_reflect), f_r < f_worst
        )
        case_in = ~jnp.logical_or(
            jnp.logical_or(case_expand, case_reflect), case_out
        )

        replacement = jnp.where(
            case_expand,
            jnp.where(f_e < f_r, x_e, x_r),
            jnp.where(
                case_reflect,
                x_r,
                jnp.where(case_out, x_c_out, x_c_in),
            ),
        )
        branch_ok = jnp.where(
            case_out,
            f_c_out <= f_r,
            jnp.where(case_in, f_c_in < f_worst, jnp.bool_(True)),
        )
        do_shrink = jnp.logical_or(coincident, ~branch_ok)

        replaced = simplex.at[i_worst].set(replacement)
        shrunk = _SIGMA * simplex + (1.0 - _SIGMA) * best[None, :]
        shrunk = shrunk.at[i_best].set(best)
        new_simplex = jnp.where(do_shrink, shrunk, replaced)

        # nfev parity with the reference's conditional control flow:
        # coincident -> shrink only (n+1 evals, no f_r); expand -> f_r + f_e;
        # reflect -> f_r; contraction -> f_r + f_c (+ shrink's n+1 on reject).
        branch_nfev = jnp.where(
            coincident,
            num_vertices,
            1  # f_r
            + jnp.where(case_expand, 1, 0)
            + jnp.where(jnp.logical_or(case_out, case_in), 1, 0)
            + jnp.where(
                jnp.logical_and(~coincident, do_shrink), num_vertices, 0
            ),
        )
        nfev = nfev + branch_nfev

        # Return the best vertex of the pre-update sort (:152, :194), plus
        # one eval for the driver's state rebuild in the reference
        # (solver.h:210-216).
        next_state = FunctionState(
            x=best,
            value=f_best,
            gradient=jnp.zeros_like(state.gradient),
            nfev=nfev + 1,
        )
        return next_state, NmInternals(simplex=new_simplex)
