"""Fused TPU kernels (Pallas) for the framework's hot ops."""

from .two_loop import (
    two_loop_direction,
    two_loop_direction_batched,
    two_loop_direction_xla,
    two_loop_pallas_batched,
)

__all__ = [
    "two_loop_direction",
    "two_loop_direction_batched",
    "two_loop_direction_xla",
    "two_loop_pallas_batched",
]
