"""Uniform line-search dispatch — the pluggable-search parity point.

The reference passes the line search as a template parameter
``template<class, int> class LineSearch`` (e.g. lbfgs.h:40-41,
gradient_descent.h:37-38); here solvers carry a jit-static ``line_search``
string field resolved through :func:`run_line_search`, which presents every
search behind one State -> State contract: consume the populated start
``(x0, f0, g0)``, return the accepted step's ``(x, f, g)`` with nfev
accounting.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from .armijo import armijo
from .hager_zhang import hager_zhang
from .more_thuente import more_thuente

__all__ = [
    "LineSearchResult",
    "run_line_search",
    "line_search_alpha",
    "LINE_SEARCHES",
]

LINE_SEARCHES = ("more_thuente", "hager_zhang", "armijo")


class LineSearchResult(NamedTuple):
    x: jax.Array
    f: jax.Array
    g: jax.Array
    alpha: jax.Array
    nfev: jax.Array  # int32 evaluations consumed


def run_line_search(
    method: str,
    value_and_grad: Callable,
    x0: jax.Array,
    f0: jax.Array,
    g0: jax.Array,
    direction: jax.Array,
    alpha_init,
    max_fev: int = 20,
    dginit: jax.Array | None = None,
) -> LineSearchResult:
    """Run the named search along ``direction`` from a populated start.

    ``dginit`` optionally supplies the precomputed ``vdot(g0, direction)``
    (consumed by More-Thuente; the other searches compute their own).
    """
    if method == "more_thuente":
        # Routed through the custom-batching op: un-batched calls run the
        # single-instance MINPACK port; the batched solve path lowers to the
        # fused batch-native loop (ops/fused_linesearch.py).
        from ..ops.fused_linesearch import batched_more_thuente

        if dginit is None:
            dginit = jnp.vdot(g0, direction)
        x, f, g, alpha, nfev, _info = batched_more_thuente(
            value_and_grad, x0, f0, g0, direction,
            jnp.asarray(alpha_init, jnp.result_type(f0)), dginit,
            max_fev=max_fev,
        )
        return LineSearchResult(x=x, f=f, g=g, alpha=alpha, nfev=nfev)
    if method == "hager_zhang":
        r = hager_zhang(value_and_grad, x0, f0, g0, direction, alpha_init)
        return LineSearchResult(x=r.x, f=r.f, g=r.g, alpha=r.alpha, nfev=r.nfev)
    if method == "armijo":
        # Value-only backtracking; one fused value-and-grad evaluation at the
        # accepted point re-establishes the populated-state invariant (the
        # reference's Armijo solvers rebuild the state the same way,
        # solver.h:210-216).
        r = armijo(
            lambda x: value_and_grad(x)[0], x0, f0, g0, direction, alpha_init
        )
        x = x0 + r.alpha * direction
        f, g = value_and_grad(x)
        return LineSearchResult(
            x=x, f=f, g=g, alpha=r.alpha, nfev=r.nfev + 1
        )
    raise ValueError(
        f"unknown line search {method!r}; expected one of {LINE_SEARCHES}"
    )


def line_search_alpha(
    method: str,
    value_and_grad: Callable,
    x0: jax.Array,
    direction: jax.Array,
    alpha_init=1.0,
    max_fev: int = 20,
) -> LineSearchResult:
    """The reference's alpha-only overload (more_thuente.h:63-77,
    hager_zhang.h:63-77): only ``(x0, direction)`` are supplied; the start
    value/gradient are evaluated here (billed in ``nfev``).  Returns the full
    :class:`LineSearchResult` — read ``.alpha`` for the bare step width the
    C++ overload returns, or ``(.x, .f, .g)`` for the cached-output overload
    (more_thuente.h:89-107).  The State -> State form the solvers use is
    :func:`run_line_search`.
    """
    x0 = jnp.asarray(x0)
    f0, g0 = value_and_grad(x0)
    r = run_line_search(
        method, value_and_grad, x0, f0, g0, direction, alpha_init,
        max_fev=max_fev,
    )
    return r._replace(nfev=r.nfev + 1)
