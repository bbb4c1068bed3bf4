"""Dense BFGS with inverse-Hessian updates.

TPU-native port of the reference's Bfgs
(reference: include/cppoptlib/solver/bfgs.h:39-145).  The (n, n) inverse
Hessian rides in the internals pytree; under vmap the rank-2 update becomes a
batched outer-product contraction on the MXU.  Guards preserved:

* reset to identity + steepest descent when the approximation loses positive
  definiteness or turns NaN (bfgs.h:84-92);
* fresh-approximation step scaling ``alpha0 = 1/|d|``, else 1 (bfgs.h:94-106);
* curvature-gated update ``y.s > eps |s||y|`` skipping degenerate pairs
  (bfgs.h:114-134).
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

__all__ = ["Bfgs"]


class BfgsInternals(NamedTuple):
    inverse_hessian: jax.Array  # (n, n)
    fresh: jax.Array  # bool: identity approximation (scales alpha0)


@dataclasses.dataclass(frozen=True)
class Bfgs(SolverBase):
    max_linesearch_fev: int = 20
    #: Pluggable search (bfgs.h:39-40): more_thuente | hager_zhang | armijo.
    line_search: str = "more_thuente"

    def init(self, objective: Objective, state: FunctionState) -> BfgsInternals:
        n = state.x.shape[-1]
        return BfgsInternals(
            inverse_hessian=jnp.eye(n, dtype=state.x.dtype),
            fresh=jnp.ones((), jnp.bool_),
        )

    def step(
        self,
        objective: Objective,
        state: FunctionState,
        internals: BfgsInternals,
        stopping: StoppingCriteria,
    ):
        del stopping
        dtype = state.x.dtype
        eps = jnp.finfo(dtype).eps
        n = state.x.shape[-1]
        g = state.gradient

        direction = -(internals.inverse_hessian @ g)
        phi = jnp.vdot(g, direction)

        # PD/NaN reset (bfgs.h:84-92).
        reset = jnp.logical_or(phi > 0, jnp.isnan(phi))
        H = jnp.where(reset, jnp.eye(n, dtype=dtype), internals.inverse_hessian)
        direction = jnp.where(reset, -g, direction)
        fresh = jnp.logical_or(internals.fresh, reset)

        dnorm = jnp.linalg.norm(direction)
        alpha_init = jnp.where(
            fresh,
            jnp.where(dnorm > eps, 1.0 / dnorm, 1.0),
            jnp.ones((), dtype),
        )

        ls = run_line_search(
            self.line_search,
            objective.value_and_grad,
            state.x,
            state.value,
            g,
            direction,
            alpha_init,
            max_fev=self.max_linesearch_fev,
        )
        next_state = FunctionState(
            x=ls.x, value=ls.f, gradient=ls.g, nfev=state.nfev + ls.nfev
        )

        # Inverse-Hessian update, N&W eqn 6.17, gated on curvature
        # (bfgs.h:114-134).
        s = next_state.x - state.x
        y = next_state.gradient - g
        ys = jnp.vdot(y, s)
        accept = ys > eps * jnp.linalg.norm(s) * jnp.linalg.norm(y)
        rho = 1.0 / jnp.where(accept, ys, 1.0)
        Hy = H @ y
        yHy = jnp.vdot(y, Hy)
        H_updated = (
            H
            - rho * (jnp.outer(s, Hy) + jnp.outer(Hy, s))
            + rho * (rho * yHy + 1.0) * jnp.outer(s, s)
        )
        H_new = jnp.where(accept, H_updated, H)
        fresh_new = jnp.where(accept, jnp.zeros((), jnp.bool_), fresh)

        return next_state, BfgsInternals(inverse_hessian=H_new, fresh=fresh_new)
