"""Mesh-parallel batched solving (shard_map over a TPU pod slice)."""

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
    "minimize_sharded",
]
