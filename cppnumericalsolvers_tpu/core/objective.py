"""Objective functions as traced JAX callables.

TPU-native replacement for the reference's function abstraction layer
(reference: include/cppoptlib/function_base.h).  The C++ library needs three
mechanisms that all dissolve in JAX:

* ``FunctionInterface`` / ``FunctionCRTP`` (function_base.h:50-126) — the
  unified ``f(x, grad*, hess*)`` virtual-call protocol.  Here an objective is
  just a pure function ``x -> scalar``; derivatives come from ``jax.grad`` /
  ``jax.hessian`` transforms instead of user-populated out-params.
* ``FunctionExpr`` type erasure + ``ModeDowngradeAdapter``
  (function_base.h:149-260) — runtime polymorphism over objectives.  Here
  objectives are values; "mode" is simply which transforms a solver is allowed
  to take, checked at trace time.
* Expression templates (function_expressions.h:45-518) — analytic derivative
  propagation through ``+,-,*``.  Here arithmetic on ``Objective`` builds a
  composed pure function and autodiff propagates derivatives exactly.

``FunctionState`` (function_base.h:280-336) becomes a pytree carried through
``lax.while_loop``; its populated-(value, gradient) invariant holds by
construction because every state is produced by a fused value-and-grad
evaluation.  The state additionally carries a per-instance ``nfev`` counter —
the reference counts function evaluations implicitly through its benchmark
harness; here it is explicit so a vmapped batch reports per-instance nfev.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

__all__ = [
    "DifferentiabilityMode",
    "FunctionState",
    "Objective",
    "objective",
    "constant",
    "min_zero",
    "max_zero",
]


# Differentiability modes, ordered: composition takes the min of operand
# modes (reference: function_expressions.h:74-88 ``MinDifferentiability``).
MODE_NONE = "none"
MODE_FIRST = "first"
MODE_SECOND = "second"
_MODE_ORDER = {MODE_NONE: 0, MODE_FIRST: 1, MODE_SECOND: 2}


class DifferentiabilityMode:
    """Namespace mirroring the reference's enum (function_base.h:42-46)."""

    NONE = MODE_NONE
    FIRST = MODE_FIRST
    SECOND = MODE_SECOND


def _min_mode(a: str, b: str) -> str:
    return a if _MODE_ORDER[a] <= _MODE_ORDER[b] else b


class FunctionState(NamedTuple):
    """A trajectory point ``(x, value, gradient)`` plus an nfev counter.

    Invariant (mirrors function_base.h:280-296): whenever a ``FunctionState``
    is produced by this library, ``value`` and ``gradient`` are the objective
    value/gradient *at* ``x``.  Line searches return the accepted step's state
    captured from their final internal evaluation, so no redundant
    re-evaluations happen anywhere in a solve.
    """

    x: jax.Array  # (n,) parameter vector
    value: jax.Array  # scalar objective value at x
    gradient: jax.Array  # (n,) gradient at x (zeros for none-mode objectives)
    nfev: jax.Array  # int32 cumulative objective evaluations


@dataclasses.dataclass(frozen=True)
class Objective:
    """A smooth objective: a pure function ``x -> scalar`` plus its mode.

    ``fn`` must be traceable by JAX (pure, no side effects).  Hashable and
    static under ``jit``; the derivative transforms are cached per instance.
    """

    fn: Callable[[jax.Array], jax.Array]
    mode: str = MODE_FIRST

    # -- evaluation protocol -------------------------------------------------

    def value(self, x: jax.Array) -> jax.Array:
        return self.fn(x)

    @functools.cached_property
    def _value_and_grad(self):
        return jax.value_and_grad(self.fn)

    @functools.cached_property
    def _grad(self):
        return jax.grad(self.fn)

    @functools.cached_property
    def _hessian(self):
        return jax.hessian(self.fn)

    def value_and_grad(self, x: jax.Array) -> tuple[jax.Array, jax.Array]:
        if self.mode == MODE_NONE:
            # None-mode objectives track value only; gradient slot is zeros so
            # the state pytree keeps a static shape (derivative-free solvers
            # never read it).
            return self.fn(x), jnp.zeros_like(x)
        return self._value_and_grad(x)

    def gradient(self, x: jax.Array) -> jax.Array:
        self._require(MODE_FIRST, "gradient")
        return self._grad(x)

    def hessian(self, x: jax.Array) -> jax.Array:
        self._require(MODE_SECOND, "hessian")
        return self._hessian(x)

    def hvp(self, x: jax.Array, v: jax.Array) -> jax.Array:
        """Hessian-vector product via forward-over-reverse ``jvp`` of grad.

        The TPU-native path for Hessian-free trust-region CG: no O(n^2)
        Hessian materialisation, two gradient-cost passes instead.
        """
        self._require(MODE_FIRST, "hvp")
        return jax.jvp(self._grad, (x,), (v,))[1]

    def _require(self, mode: str, what: str) -> None:
        # Trace-time analog of the reference's Hessian-request guard
        # (function_base.h:108-115): asking a First-mode objective for a
        # Hessian is a programming error, surfaced eagerly.
        if _MODE_ORDER[self.mode] < _MODE_ORDER[mode]:
            raise ValueError(
                f"Objective of mode '{self.mode}' cannot provide '{what}' "
                f"(requires mode '{mode}')."
            )

    def evaluate(self, x: jax.Array, nfev: jax.Array | int = 0) -> FunctionState:
        """Build a populated FunctionState at ``x`` (one evaluation)."""
        value, grad = self.value_and_grad(x)
        return FunctionState(
            x=x,
            value=value,
            gradient=grad,
            nfev=jnp.asarray(nfev, jnp.int32) + 1,
        )

    # -- composition (replaces the expression-template layer) ---------------

    def with_mode(self, mode: str) -> "Objective":
        """Mode *downgrade* (reference: ModeDowngradeAdapter).  Upgrades are
        refused, matching function_base.h:191-260."""
        if _MODE_ORDER[mode] > _MODE_ORDER[self.mode]:
            raise ValueError(
                f"Cannot upgrade objective mode '{self.mode}' -> '{mode}'."
            )
        return Objective(self.fn, mode)

    def __add__(self, other):
        other = _as_objective(other, like=self)
        return Objective(
            lambda x, f=self.fn, g=other.fn: f(x) + g(x),
            _min_mode(self.mode, other.mode),
        )

    __radd__ = __add__

    def __sub__(self, other):
        other = _as_objective(other, like=self)
        return Objective(
            lambda x, f=self.fn, g=other.fn: f(x) - g(x),
            _min_mode(self.mode, other.mode),
        )

    def __rsub__(self, other):
        other = _as_objective(other, like=self)
        return Objective(
            lambda x, f=other.fn, g=self.fn: f(x) - g(x),
            _min_mode(self.mode, other.mode),
        )

    def __mul__(self, other):
        if isinstance(other, Objective):
            # Product of two objectives (ProdExpression,
            # function_expressions.h:256-315) — autodiff supplies the
            # product-rule gradient/Hessian for free.
            return Objective(
                lambda x, f=self.fn, g=other.fn: f(x) * g(x),
                _min_mode(self.mode, other.mode),
            )
        scalar = other
        return Objective(lambda x, f=self.fn: scalar * f(x), self.mode)

    __rmul__ = __mul__

    def __neg__(self):
        return Objective(lambda x, f=self.fn: -f(x), self.mode)


def _as_objective(value, like: Objective) -> Objective:
    if isinstance(value, Objective):
        return value
    return constant(value, mode=like.mode)


def objective(fn: Callable, mode: str = MODE_FIRST) -> Objective:
    """Wrap a pure ``x -> scalar`` function as an :class:`Objective`."""
    return Objective(fn, mode)


def constant(value, mode: str = MODE_SECOND) -> Objective:
    """Constant objective (reference: ConstExpression,
    function_expressions.h:45-72)."""
    return Objective(lambda x: jnp.asarray(value, dtype=jnp.result_type(x)), mode)


def min_zero(f: Objective) -> Objective:
    """``min(0, f(x))`` with the one-sided derivative autodiff provides
    (reference: MinZeroExpression, function_expressions.h:317-357)."""
    return Objective(lambda x, fn=f.fn: jnp.minimum(0.0, fn(x)), f.mode)


def max_zero(f: Objective) -> Objective:
    """``max(0, f(x))`` (reference: MaxZeroExpression,
    function_expressions.h:359-399)."""
    return Objective(lambda x, fn=f.fn: jnp.maximum(0.0, fn(x)), f.mode)
