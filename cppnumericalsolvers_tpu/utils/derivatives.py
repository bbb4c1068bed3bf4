"""Finite-difference derivative checkers.

TPU-native port of the reference's verification utilities
(reference: include/cppoptlib/utils/derivatives.h:37-311).  In a framework
whose derivatives come from autodiff these primarily validate *hand-written
kernels and custom VJPs* against both ``jax.grad`` and finite differences
(SURVEY.md component #23).  The four central-difference accuracy orders and
the 16-point high-order mixed-partial stencil are reproduced exactly;
everything is vectorized over coordinates instead of the reference's
per-coordinate loops, so a whole gradient check is one batched evaluation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "compute_finite_gradient",
    "compute_finite_hessian",
    "is_gradient_correct",
    "is_hessian_correct",
]

# Central-difference coefficient tables (derivatives.h:52-62).
_COEFF = (
    (1.0, -1.0),
    (1.0, -8.0, 8.0, -1.0),
    (-1.0, 9.0, -45.0, 45.0, -9.0, 1.0),
    (3.0, -32.0, 168.0, -672.0, 672.0, -168.0, 32.0, -3.0),
)
_COEFF2 = (
    (1.0, -1.0),
    (-2.0, -1.0, 1.0, 2.0),
    (-3.0, -2.0, -1.0, 1.0, 2.0, 3.0),
    (-4.0, -3.0, -2.0, -1.0, 1.0, 2.0, 3.0, 4.0),
)
_DD = (2.0, 12.0, 60.0, 840.0)


def compute_finite_gradient(fn, x0, accuracy: int = 0):
    """Finite-difference gradient at ``x0`` (derivatives.h:37-83).

    ``accuracy`` in {0, 1, 2, 3} selects 2/4/6/8-point central differences.
    Step size per coordinate: ``sqrt(eps) * max(|x0_d|, 1)``.  All
    (n * innerSteps) evaluations run as one vmapped batch.
    """
    x0 = jnp.asarray(x0)
    n = x0.shape[-1]
    dtype = x0.dtype
    eps = jnp.finfo(dtype).eps
    h = jnp.sqrt(eps) * jnp.maximum(jnp.abs(x0), 1.0)  # (n,)

    coeff = jnp.asarray(_COEFF[accuracy], dtype)  # (k,)
    coeff2 = jnp.asarray(_COEFF2[accuracy], dtype)  # (k,)
    k = coeff.shape[0]

    # Evaluation points: for coordinate d and step s, x0 + coeff2[s]*h_d e_d.
    offsets = coeff2[None, :, None] * (h[:, None, None] * jnp.eye(n, dtype=dtype)[:, None, :])
    points = x0[None, None, :] + offsets  # (n, k, n)
    values = jax.vmap(jax.vmap(fn))(points)  # (n, k)
    return (values @ coeff) / (_DD[accuracy] * h)


def compute_finite_hessian(fn, x0, accuracy: int = 0):
    """Finite-difference Hessian (derivatives.h:86-252).

    accuracy == 0: classic central differences; accuracy > 0: the 16-point
    mixed-partial stencil with weights (-63, 63, 44, 74) / (600 h^2).
    """
    x0 = jnp.asarray(x0)
    n = x0.shape[-1]
    dtype = x0.dtype
    eps = jnp.finfo(dtype).eps
    # Deliberate improvement over the reference: second-derivative central
    # differences need h ~ eps^(1/4) to balance truncation against rounding
    # (the reference's sqrt(eps) step, derivatives.h:101-103, cancels
    # catastrophically away from small function values — its own tests only
    # probe a quadratic at the origin where the formula is exact).
    h = eps ** 0.25 * jnp.maximum(jnp.abs(x0), 1.0)
    f0 = fn(x0)
    eye = jnp.eye(n, dtype=dtype)

    def eval_at(di, dj):
        """f(x0 + di_i e_i h_i + dj_j e_j h_j) for all (i, j) pairs.

        di/dj are scalars in units of the per-coordinate step."""
        def one(i, j):
            return fn(x0 + di * h[i] * eye[i] + dj * h[j] * eye[j])
        idx = jnp.arange(n)
        return jax.vmap(
            lambda i: jax.vmap(lambda j: one(i, j))(idx)
        )(idx)  # (n, n)

    # Diagonal: (f(x+h) - 2 f0 + f(x-h)) / h^2 in both modes.
    f_plus = jax.vmap(lambda i: fn(x0 + h[i] * eye[i]))(jnp.arange(n))
    f_minus = jax.vmap(lambda i: fn(x0 - h[i] * eye[i]))(jnp.arange(n))
    diag = (f_plus - 2.0 * f0 + f_minus) / (h * h)

    if accuracy == 0:
        f_pp = eval_at(1.0, 1.0)
        f_pm = eval_at(1.0, -1.0)
        f_mp = eval_at(-1.0, 1.0)
        f_mm = eval_at(-1.0, -1.0)
        off = (f_pp - f_pm - f_mp + f_mm) / (4.0 * jnp.outer(h, h))
    else:
        # Mean step per pair (derivatives.h:160-162); stencil offsets are in
        # units of hbar = (h_i + h_j)/2 relative to x0 exactly as the C++
        # writes x[i] = x0_i + k * hbar.
        hbar = (h[:, None] + h[None, :]) / 2.0

        def eval_pair(ci, cj):
            def one(i, j):
                hb = (h[i] + h[j]) / 2.0
                return fn(x0 + ci * hb * eye[i] + cj * hb * eye[j])
            idx = jnp.arange(n)
            return jax.vmap(
                lambda i: jax.vmap(lambda j: one(i, j))(idx)
            )(idx)

        term1 = (
            eval_pair(1.0, -2.0) + eval_pair(2.0, -1.0)
            + eval_pair(-2.0, 1.0) + eval_pair(-1.0, 2.0)
        )
        term2 = (
            eval_pair(-1.0, -2.0) + eval_pair(-2.0, -1.0)
            + eval_pair(1.0, 2.0) + eval_pair(2.0, 1.0)
        )
        term3 = (
            eval_pair(2.0, -2.0) + eval_pair(-2.0, 2.0)
            - eval_pair(-2.0, -2.0) - eval_pair(2.0, 2.0)
        )
        term4 = (
            eval_pair(-1.0, -1.0) + eval_pair(1.0, 1.0)
            - eval_pair(1.0, -1.0) - eval_pair(-1.0, 1.0)
        )
        off = (-63.0 * term1 + 63.0 * term2 + 44.0 * term3 + 74.0 * term4) / (
            600.0 * hbar * hbar
        )

    hessian = off
    hessian = hessian - jnp.diag(jnp.diagonal(hessian)) + jnp.diag(diag)
    # Symmetrise exactly as the reference assigns (i, j) and (j, i) from the
    # same mixed value.
    iu = jnp.triu_indices(n, 1)
    upper = hessian[iu]
    hessian = hessian.at[iu[1], iu[0]].set(upper)
    return hessian


def is_gradient_correct(objective, x0, accuracy: int = 3, tolerance=1e-2):
    """Relative comparison of the objective's gradient against finite
    differences (derivatives.h:254-283)."""
    actual = objective.gradient(jnp.asarray(x0))
    expected = compute_finite_gradient(objective.fn, x0, accuracy)
    scale = jnp.maximum(
        jnp.maximum(jnp.abs(actual), jnp.abs(expected)), 1.0
    )
    return bool(jnp.all(jnp.abs(actual - expected) <= tolerance * scale))


def is_hessian_correct(objective, x0, accuracy: int = 3, tolerance=1e-1):
    """Relative comparison of the objective's Hessian against finite
    differences (derivatives.h:285-311)."""
    actual = objective.hessian(jnp.asarray(x0))
    expected = compute_finite_hessian(objective.fn, x0, accuracy)
    scale = jnp.maximum(
        jnp.maximum(jnp.abs(actual), jnp.abs(expected)), 1.0
    )
    return bool(jnp.all(jnp.abs(actual - expected) <= tolerance * scale))
