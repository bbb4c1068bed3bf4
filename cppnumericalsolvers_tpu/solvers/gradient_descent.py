"""Steepest descent with a pluggable line search.

TPU-native port of the reference's GradientDescent
(reference: include/cppoptlib/solver/gradient_descent.h:37-74): each step is
one More-Thuente strong-Wolfe search along ``-g``.  No solver internals.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from ..core.driver import SolverBase
from ..core.objective import FunctionState, Objective
from ..core.progress import StoppingCriteria
from ..linesearch.more_thuente import more_thuente

__all__ = ["GradientDescent"]


@dataclasses.dataclass(frozen=True)
class GradientDescent(SolverBase):
    max_linesearch_fev: int = 20

    def init(self, objective: Objective, state: FunctionState):
        return ()

    def step(
        self,
        objective: Objective,
        state: FunctionState,
        internals,
        stopping: StoppingCriteria,
    ):
        del stopping
        ls = more_thuente(
            objective.value_and_grad,
            state.x,
            state.value,
            state.gradient,
            -state.gradient,
            alpha_init=jnp.ones((), state.value.dtype),
            max_fev=self.max_linesearch_fev,
        )
        next_state = FunctionState(
            x=ls.x, value=ls.f, gradient=ls.g, nfev=state.nfev + ls.nfev
        )
        return next_state, internals
