"""Armijo backtracking line search.

TPU-native port of the reference's backtracking rule
(reference: include/cppoptlib/linesearch/armijo.h:31-103): c=0.2, rho=0.9,
alpha_min=1e-8.  The second-order variant adds a curvature term
``0.5*c^2*d^T H d`` to the sufficient-decrease threshold (armijo.h:67-103)
and has no alpha floor, matching the C++ specialisation.

Implemented as a ``lax.while_loop`` over value-only trial evaluations so it
vmaps over a problem batch; a ``max_iters`` safety cap bounds the trip count
(the geometric backoff 0.9^k reaches 1e-8 from alpha=1 in ~175 steps, so the
default cap of 200 never binds on the reference's semantics).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["armijo", "ArmijoResult"]

_C = 0.2
_RHO = 0.9
_ALPHA_MIN = 1e-8
_MAX_ITERS = 200


class ArmijoResult(NamedTuple):
    alpha: jax.Array
    nfev: jax.Array  # int32 value evaluations consumed


def armijo(
    value_fn: Callable,
    x: jax.Array,
    f0: jax.Array,
    g0: jax.Array,
    direction: jax.Array,
    alpha_init=1.0,
    *,
    curvature_term=None,
    max_iters: int = _MAX_ITERS,
) -> ArmijoResult:
    """Backtrack until ``f(x + a d) <= f0 + a * c * (g0.d [+ curvature])``.

    ``curvature_term`` (optional scalar, precomputed ``d^T H d``) selects the
    second-order threshold of armijo.h:85-95; when given, the alpha floor is
    disabled to match the C++ specialisation (which loops on the sufficient
    decrease condition alone).
    """
    dtype = jnp.result_type(f0)
    cache = _C * jnp.vdot(g0, direction)
    if curvature_term is not None:
        cache = cache + 0.5 * _C * _C * jnp.asarray(curvature_term, dtype)
        alpha_floor = jnp.zeros((), dtype)
    else:
        alpha_floor = jnp.asarray(_ALPHA_MIN, dtype)

    alpha0 = jnp.asarray(alpha_init, dtype)
    f_trial0 = value_fn(x + alpha0 * direction)

    def cond(carry):
        alpha, f_trial, it = carry
        keep = jnp.logical_and(f_trial > f0 + alpha * cache, alpha > alpha_floor)
        return jnp.logical_and(keep, it < max_iters)

    def body(carry):
        alpha, _, it = carry
        alpha = alpha * _RHO
        return alpha, value_fn(x + alpha * direction), it + 1

    alpha, _, iters = lax.while_loop(
        cond, body, (alpha0, f_trial0, jnp.zeros((), jnp.int32))
    )
    return ArmijoResult(alpha=alpha, nfev=iters + 1)
