"""Penalty and augmented-Lagrangian composite builders.

TPU-native port of the reference's composite layer
(reference: include/cppoptlib/function_penalty.h:40-246).  The C++ builds
expression-template trees; here each composite is a single traced scalar
function of ``x`` closing over the multiplier/penalty arrays, and autodiff
supplies its exact gradient.  The inequality handling is the
Powell-Hestenes-Rockafellar (PHR) form

    I_j(x) = (1 / (2 rho)) * [ max(0, mu_j - rho g_j(x))^2 - mu_j^2 ]

(function_penalty.h:129-194): constant with zero gradient on the strictly
inactive side, C^1 across the switching surface — the property that keeps the
composite bounded below on non-convex objectives.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .objective import Objective
from .problem import ConstrainedProblem

__all__ = [
    "MultiplierState",
    "quadratic_equality_penalty",
    "quadratic_inequality_penalty_ge",
    "quadratic_inequality_penalty_lt",
    "augmented_lagrangian_value",
    "to_augmented_lagrangian",
    "penalty_value",
    "to_penalty",
    "lagrangian_gradient",
]


class MultiplierState(NamedTuple):
    """Lagrange multipliers (function_penalty.h:64-78): fixed-length arrays
    instead of std::vectors, so they vmap across a problem batch."""

    equality: jax.Array  # (num_eq,) lambda
    inequality: jax.Array  # (num_ineq,) mu >= 0

    @staticmethod
    def zeros(num_eq: int, num_ineq: int, dtype=jnp.float64):
        return MultiplierState(
            equality=jnp.zeros((num_eq,), dtype),
            inequality=jnp.zeros((num_ineq,), dtype),
        )


def quadratic_equality_penalty(c: Objective) -> Objective:
    """P(x) = 0.5 c(x)^2 (function_penalty.h:40-43)."""
    return Objective(lambda x, fn=c.fn: 0.5 * fn(x) ** 2, c.mode)


def quadratic_inequality_penalty_ge(c: Objective) -> Objective:
    """P(x) = 0.5 min(0, c(x))^2 for c(x) >= 0 (function_penalty.h:48-52)."""
    return Objective(
        lambda x, fn=c.fn: 0.5 * jnp.minimum(0.0, fn(x)) ** 2, c.mode
    )


def quadratic_inequality_penalty_lt(c: Objective) -> Objective:
    """P(x) = 0.5 max(0, c(x))^2 for c(x) < 0 (function_penalty.h:57-61)."""
    return Objective(
        lambda x, fn=c.fn: 0.5 * jnp.maximum(0.0, fn(x)) ** 2, c.mode
    )


def augmented_lagrangian_value(
    problem: ConstrainedProblem,
    x: jax.Array,
    multipliers: MultiplierState,
    penalty,
):
    """L_aug(x) = f + sum(lambda c) + 0.5 rho sum(c^2) + PHR(mu, rho, g)
    (function_penalty.h:221-246)."""
    value = problem.objective.fn(x)
    if problem.num_equalities:
        c_eq = problem.eval_equalities(x)
        value = value + jnp.vdot(multipliers.equality, c_eq)
        value = value + 0.5 * penalty * jnp.sum(c_eq * c_eq)
    if problem.num_inequalities:
        g = problem.eval_inequalities(x)
        mu = multipliers.inequality
        # rho <= 0 makes PHR ill-defined; the reference returns a zero
        # inequality part in that case (function_penalty.h:161-169).
        rho_ok = penalty > 0
        safe_rho = jnp.where(rho_ok, penalty, 1.0)
        positive_part = jnp.maximum(0.0, mu - safe_rho * g)
        half_inv_rho = 1.0 / (2.0 * safe_rho)
        phr = jnp.sum(half_inv_rho * (positive_part**2 - mu**2))
        value = value + jnp.where(rho_ok, phr, 0.0)
    return value


def to_augmented_lagrangian(
    problem: ConstrainedProblem,
    multipliers: MultiplierState,
    penalty,
) -> Objective:
    """The AL composite as an :class:`Objective` closing over (possibly
    traced) multiplier/penalty arrays — the inner solver's subproblem."""
    return Objective(
        lambda x: augmented_lagrangian_value(problem, x, multipliers, penalty),
        problem.mode,
    )


def penalty_value(problem: ConstrainedProblem, x, penalty):
    """Pure penalty composite (no multipliers; function_penalty.h:196-220).
    Kept for penalty-method experiments — NOT used by AugmentedLagrangian."""
    value = problem.objective.fn(x)
    if problem.num_equalities:
        c_eq = problem.eval_equalities(x)
        value = value + penalty * jnp.sum(0.5 * c_eq * c_eq)
    if problem.num_inequalities:
        g = problem.eval_inequalities(x)
        value = value + penalty * jnp.sum(0.5 * jnp.minimum(0.0, g) ** 2)
    return value


def to_penalty(problem: ConstrainedProblem, penalty) -> Objective:
    return Objective(
        lambda x: penalty_value(problem, x, penalty), problem.mode
    )


def lagrangian_gradient(
    problem: ConstrainedProblem,
    x: jax.Array,
    multipliers: MultiplierState,
) -> jax.Array:
    """grad_x of the *raw* Lagrangian L = f + sum(lambda c) - sum(mu g)
    (augmented_lagrangian.h:577-604) — the KKT stationarity measure."""

    def lagrangian(z):
        value = problem.objective.fn(z)
        if problem.num_equalities:
            value = value + jnp.vdot(
                multipliers.equality, problem.eval_equalities(z)
            )
        if problem.num_inequalities:
            value = value - jnp.vdot(
                multipliers.inequality, problem.eval_inequalities(z)
            )
        return value

    return jax.grad(lagrangian)(x)
