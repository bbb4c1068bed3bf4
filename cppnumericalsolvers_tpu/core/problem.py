"""Constrained optimization problems.

TPU-native port of the reference's ``ConstrainedOptimizationProblem``
(reference: include/cppoptlib/function_problem.h:54-103): an objective plus
tuples of equality constraints ``c(x) = 0`` and inequality constraints
``c(x) >= 0``.  Constraints are scalar :class:`Objective` values; stacked
evaluation helpers return fixed-length residual vectors so the augmented-
Lagrangian machinery vectorises over constraints.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from .objective import Objective

__all__ = ["ConstrainedProblem"]


@dataclasses.dataclass(frozen=True)
class ConstrainedProblem:
    objective: Objective
    equality_constraints: tuple[Objective, ...] = ()
    inequality_constraints: tuple[Objective, ...] = ()

    def __post_init__(self):
        object.__setattr__(
            self, "equality_constraints", tuple(self.equality_constraints)
        )
        object.__setattr__(
            self, "inequality_constraints", tuple(self.inequality_constraints)
        )

    @property
    def num_equalities(self) -> int:
        return len(self.equality_constraints)

    @property
    def num_inequalities(self) -> int:
        return len(self.inequality_constraints)

    @property
    def has_general_constraints(self) -> bool:
        return bool(self.equality_constraints or self.inequality_constraints)

    @property
    def mode(self) -> str:
        order = {"none": 0, "first": 1, "second": 2}
        modes = [self.objective.mode]
        modes += [c.mode for c in self.equality_constraints]
        modes += [c.mode for c in self.inequality_constraints]
        return min(modes, key=lambda m: order[m])

    def eval_equalities(self, x: jax.Array) -> jax.Array:
        """Stacked equality residuals c_eq(x), shape (num_equalities,)."""
        if not self.equality_constraints:
            return jnp.zeros((0,), x.dtype)
        return jnp.stack([c.fn(x) for c in self.equality_constraints])

    def eval_inequalities(self, x: jax.Array) -> jax.Array:
        """Stacked inequality values c_ineq(x) (feasible when >= 0)."""
        if not self.inequality_constraints:
            return jnp.zeros((0,), x.dtype)
        return jnp.stack([c.fn(x) for c in self.inequality_constraints])
