"""Standard unconstrained test objectives.

The reference defines these inline in its tests/examples; centralising them
here gives the solver matrix tests (reference: src/test/verify.cc:36-100),
examples (src/examples/simple.cc) and the benchmark suite one model zoo.
All are pure ``x -> scalar`` functions wrapped as first- or second-mode
:class:`Objective`; gradients/Hessians come from autodiff.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp

from ..core.objective import Objective

__all__ = [
    "quickstart_quadratic",
    "rosenbrock",
    "sphere",
    "beale",
    "booth",
    "matyas",
    "himmelblau",
    "trigonometric",
    "powell_singular",
    "powell_badly_scaled",
    "extended_rosenbrock",
]


@functools.lru_cache(maxsize=None)
def quickstart_quadratic() -> Objective:
    """f(x) = 5 x0^2 + 100 x1^2 + 5 — the README quick-start problem
    (reference: README.md:20-36; minimum f*=5 at (0,0))."""
    return Objective(
        lambda x: 5.0 * x[0] ** 2 + 100.0 * x[1] ** 2 + 5.0, mode="second"
    )


@functools.lru_cache(maxsize=None)
def rosenbrock(a: float = 1.0, b: float = 100.0) -> Objective:
    """2-D Rosenbrock (verify.cc's convergence-matrix workhorse)."""
    return Objective(
        lambda x: (a - x[0]) ** 2 + b * (x[1] - x[0] ** 2) ** 2, mode="second"
    )


@functools.lru_cache(maxsize=None)
def extended_rosenbrock(n: int | None = None) -> Objective:
    """N-dimensional chained Rosenbrock; works for any input length."""
    del n  # dimension comes from the input shape

    def fn(x):
        return jnp.sum(
            100.0 * (x[1:] - x[:-1] ** 2) ** 2 + (1.0 - x[:-1]) ** 2
        )

    return Objective(fn, mode="second")


@functools.lru_cache(maxsize=None)
def sphere() -> Objective:
    return Objective(lambda x: jnp.sum(x * x), mode="second")


@functools.lru_cache(maxsize=None)
def beale() -> Objective:
    def fn(x):
        a, b = x[0], x[1]
        return (
            (1.5 - a + a * b) ** 2
            + (2.25 - a + a * b**2) ** 2
            + (2.625 - a + a * b**3) ** 2
        )

    return Objective(fn, mode="second")


@functools.lru_cache(maxsize=None)
def booth() -> Objective:
    return Objective(
        lambda x: (x[0] + 2 * x[1] - 7) ** 2 + (2 * x[0] + x[1] - 5) ** 2,
        mode="second",
    )


@functools.lru_cache(maxsize=None)
def matyas() -> Objective:
    return Objective(
        lambda x: 0.26 * (x[0] ** 2 + x[1] ** 2) - 0.48 * x[0] * x[1],
        mode="second",
    )


@functools.lru_cache(maxsize=None)
def himmelblau() -> Objective:
    return Objective(
        lambda x: (x[0] ** 2 + x[1] - 11) ** 2 + (x[0] + x[1] ** 2 - 7) ** 2,
        mode="second",
    )


@functools.lru_cache(maxsize=None)
def trigonometric() -> Objective:
    """MGH trigonometric function (the reference's 10-D perf benchmark,
    lbfgs.h:243-247)."""

    def fn(x):
        n = x.shape[0]
        cos_sum = jnp.sum(jnp.cos(x))
        i = jnp.arange(1, n + 1, dtype=x.dtype)
        terms = n - cos_sum + i * (1.0 - jnp.cos(x)) - jnp.sin(x)
        return jnp.sum(terms**2)

    return Objective(fn, mode="second")


@functools.lru_cache(maxsize=None)
def powell_singular() -> Objective:
    """MGH-13: quartic valley with a singular Hessian at the minimum —
    the canonical conservative-stopping problem (progress.h:420-425)."""

    def fn(x):
        return (
            (x[0] + 10 * x[1]) ** 2
            + 5 * (x[2] - x[3]) ** 2
            + (x[1] - 2 * x[2]) ** 4
            + 10 * (x[0] - x[3]) ** 4
        )

    return Objective(fn, mode="second")


@functools.lru_cache(maxsize=None)
def powell_badly_scaled() -> Objective:
    """MGH-03: badly scaled 2-D problem (progress.h:397-399)."""

    def fn(x):
        return (1e4 * x[0] * x[1] - 1.0) ** 2 + (
            jnp.exp(-x[0]) + jnp.exp(-x[1]) - 1.0001
        ) ** 2

    return Objective(fn, mode="second")
