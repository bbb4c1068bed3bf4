from .augmented_lagrangian import (
    AlResult,
    AugmentedLagrangeState,
    AugmentedLagrangian,
)
from .bfgs import Bfgs
from .conjugate_gradient import ConjugateGradientDescent
from .gradient_descent import GradientDescent
from .lbfgs import Lbfgs, LbfgsInternals, two_loop_direction
from .lbfgsb import Lbfgsb, projected_gradient_inf_norm
from .nelder_mead import NelderMead
from .newton import NewtonDescent
from .trust_region import TrustRegionNewton, solve_tr_subproblem

__all__ = [
    "AlResult",
    "AugmentedLagrangeState",
    "AugmentedLagrangian",
    "Bfgs",
    "ConjugateGradientDescent",
    "GradientDescent",
    "Lbfgs",
    "LbfgsInternals",
    "Lbfgsb",
    "NelderMead",
    "NewtonDescent",
    "TrustRegionNewton",
    "projected_gradient_inf_norm",
    "solve_tr_subproblem",
    "two_loop_direction",
]
