"""Small dense linear-algebra helpers shared by second-order solvers."""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["frobenius_condition"]


def frobenius_condition(hessian: jnp.ndarray) -> jnp.ndarray:
    """Frobenius-norm condition estimate ``|H|_F * |H^{-1}|_F``.

    This is the exact metric the reference's progress machine computes for
    second-mode functions (progress.h:197-208: Eigen ``.norm()`` is the
    Frobenius norm).  A numerically singular H yields a non-finite inverse;
    map that to +inf so the HessianConditionViolation test still fires.
    """
    dtype = hessian.dtype
    cond = jnp.linalg.norm(hessian) * jnp.linalg.norm(jnp.linalg.inv(hessian))
    return jnp.where(
        jnp.isfinite(cond), cond, jnp.asarray(jnp.finfo(dtype).max, dtype)
    )
