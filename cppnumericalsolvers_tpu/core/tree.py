"""Small pytree utilities used across the framework."""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["tree_where", "shard_map"]

# jax.shard_map graduated from jax.experimental in 0.8; keep one import site
# with a fallback so the framework spans both API generations.
try:
    from jax import shard_map  # noqa: F401  (jax >= 0.8)
except ImportError:  # pragma: no cover - legacy jax
    from jax.experimental.shard_map import shard_map  # noqa: F401


def tree_where(pred, if_true, if_false):
    """Leafwise ``where(pred, a, b)`` with a scalar predicate.

    The workhorse of batched solving: a vmapped ``lax.while_loop`` applies its
    body to every lane while *any* lane is active, so converged lanes must be
    frozen explicitly — this is how the reference's data-dependent per-problem
    exits map onto SPMD batches (SURVEY.md §7 hard part 1).
    """
    return jax.tree.map(
        lambda a, b: jnp.where(pred, a, b), if_true, if_false
    )
