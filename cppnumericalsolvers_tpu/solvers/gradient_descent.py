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
from ..linesearch.dispatch import run_line_search

__all__ = ["GradientDescent"]


@dataclasses.dataclass(frozen=True)
class GradientDescent(SolverBase):
    max_linesearch_fev: int = 20
    #: Pluggable search (the reference's LineSearch template parameter,
    #: gradient_descent.h:37-38): more_thuente | hager_zhang | armijo.
    line_search: str = "more_thuente"

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
        ls = run_line_search(
            self.line_search,
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
