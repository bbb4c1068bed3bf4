from .derivatives import (
    compute_finite_gradient,
    compute_finite_hessian,
    is_gradient_correct,
    is_hessian_correct,
)

__all__ = [
    "compute_finite_gradient",
    "compute_finite_hessian",
    "is_gradient_correct",
    "is_hessian_correct",
]
