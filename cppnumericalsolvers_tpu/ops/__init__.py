"""Hot-path fused ops (Pallas TPU kernels with XLA fallbacks)."""

from .fused_step import lbfgs_epilogue, lbfgs_prologue
from .two_loop import (
    lbfgs_push_and_direction,
    push_history_xla,
    push_two_loop_pallas_batched,
    two_loop_direction,
    two_loop_direction_batched,
    two_loop_direction_xla,
    two_loop_pallas_batched,
)

__all__ = [
    "lbfgs_epilogue",
    "lbfgs_prologue",
    "lbfgs_push_and_direction",
    "push_history_xla",
    "push_two_loop_pallas_batched",
    "two_loop_direction",
    "two_loop_direction_batched",
    "two_loop_direction_xla",
    "two_loop_pallas_batched",
]
