"""Mesh-parallel batched solving (shard_map over a TPU pod slice)."""

from .model_sharded import minimize_model_sharded
from .sharded import (
    aggregate_metrics,
    initialize_distributed,
    make_mesh,
    minimize_sharded,
)

__all__ = [
    "aggregate_metrics",
    "initialize_distributed",
    "make_mesh",
    "minimize_model_sharded",
    "minimize_sharded",
]
