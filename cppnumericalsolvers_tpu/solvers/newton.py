"""Newton descent with a regularised dense solve.

TPU-native port of the reference's NewtonDescent
(reference: include/cppoptlib/solver/newton_descent.h:38-85): Hessian shifted
by ``1e-5 I``, direction from a dense linear solve (batched onto the MXU
under vmap), second-order Armijo line search (armijo.h:67-103).
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
from ..utils.linalg import condition_test_enabled, frobenius_condition

__all__ = ["NewtonDescent", "NewtonInternals"]


class NewtonInternals(NamedTuple):
    #: cond(H) at the point the step direction was computed from, feeding the
    #: HessianConditionViolation test (progress.h:197-208, :318-325).  The
    #: reference re-evaluates H at the *new* x inside Update; here the
    #: already-materialised step Hessian is reused (one iteration of lag,
    #: zero extra evaluations).
    condition_hessian: jax.Array


@dataclasses.dataclass(frozen=True)
class NewtonDescent(SolverBase):
    mode: str = dataclasses.field(default="second", init=False, repr=False)
    safe_guard: float = 1e-5  # diagonal shift (newton_descent.h:69)

    def init(self, objective: Objective, state: FunctionState):
        return NewtonInternals(
            condition_hessian=jnp.zeros((), state.x.dtype)
        )

    def step(
        self,
        objective: Objective,
        state: FunctionState,
        internals,
        stopping: StoppingCriteria,
    ):
        n = state.x.shape[-1]
        dtype = state.x.dtype
        hessian = objective.hessian(state.x)
        gradient = state.gradient
        shifted = hessian + self.safe_guard * jnp.eye(n, dtype=dtype)
        delta_x = jnp.linalg.solve(shifted, -gradient)

        curvature = jnp.vdot(delta_x, hessian @ delta_x)
        ls = armijo(
            objective.value,
            state.x,
            state.value,
            gradient,
            delta_x,
            alpha_init=1.0,
            curvature_term=curvature,
        )
        new_x = state.x + ls.alpha * delta_x
        value, grad = objective.value_and_grad(new_x)
        # The Hessian evaluation counts as one extra call in the reference's
        # protocol (newton_descent.h:73).
        next_state = FunctionState(
            x=new_x,
            value=value,
            gradient=grad,
            nfev=state.nfev + ls.nfev + 2,
        )
        # Skip the cond(H) inverse when the criterion is disabled (the
        # second ~8 ms batched LU per iteration; utils/linalg.py).
        cond_h = (
            frobenius_condition(hessian)
            if condition_test_enabled(stopping)
            else jnp.zeros((), state.x.dtype)
        )
        return next_state, NewtonInternals(condition_hessian=cond_h)
