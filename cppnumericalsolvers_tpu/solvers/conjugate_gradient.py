"""Fletcher–Reeves nonlinear conjugate gradient.

TPU-native port of the reference's ConjugatedGradientDescent
(reference: include/cppoptlib/solver/conjugated_gradient_descent.h:37-90):
``beta = g.g / g_prev.g_prev``, direction reset to ``-g`` on the first
iteration, Armijo backtracking line search (hardwired, :81).  The previous
gradient and direction ride in the solver internals pytree.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.driver import SolverBase
from ..core.objective import FunctionState, Objective
from ..core.progress import StoppingCriteria
from ..linesearch.armijo import armijo

__all__ = ["ConjugateGradientDescent"]


class CgInternals(NamedTuple):
    previous_gradient: jax.Array
    direction: jax.Array
    iteration: jax.Array  # int32 (the reference keys the reset on it, :72)


@dataclasses.dataclass(frozen=True)
class ConjugateGradientDescent(SolverBase):
    def init(self, objective: Objective, state: FunctionState) -> CgInternals:
        return CgInternals(
            previous_gradient=state.gradient,
            direction=jnp.zeros_like(state.x),
            iteration=jnp.zeros((), jnp.int32),
        )

    def step(
        self,
        objective: Objective,
        state: FunctionState,
        internals: CgInternals,
        stopping: StoppingCriteria,
    ):
        del stopping
        g = state.gradient
        beta = jnp.vdot(g, g) / jnp.vdot(
            internals.previous_gradient, internals.previous_gradient
        )
        direction = jnp.where(
            internals.iteration == 0,
            -g,
            -g + beta * internals.direction,
        )

        ls = armijo(
            objective.value, state.x, state.value, g, direction, alpha_init=1.0
        )
        new_x = state.x + ls.alpha * direction
        # The reference returns an unpopulated state that the Minimize loop
        # re-evaluates (solver.h:210-216); here the rebuild is fused into the
        # step: one value_and_grad call.
        value, gradient = objective.value_and_grad(new_x)
        next_state = FunctionState(
            x=new_x,
            value=value,
            gradient=gradient,
            nfev=state.nfev + ls.nfev + 1,
        )
        return next_state, CgInternals(
            previous_gradient=g,
            direction=direction,
            iteration=internals.iteration + 1,
        )
