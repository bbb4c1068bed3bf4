from .lbfgs import Lbfgs, LbfgsInternals, two_loop_direction

__all__ = [
    "Lbfgs",
    "LbfgsInternals",
    "two_loop_direction",
]
