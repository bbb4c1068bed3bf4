from .suite import SuiteProblem, mgh_suite, suite_with_multistarts
from .unconstrained import (
    beale,
    booth,
    extended_rosenbrock,
    himmelblau,
    matyas,
    powell_badly_scaled,
    powell_singular,
    quickstart_quadratic,
    rosenbrock,
    sphere,
    trigonometric,
)

__all__ = [
    "SuiteProblem",
    "mgh_suite",
    "suite_with_multistarts",
    "beale",
    "booth",
    "extended_rosenbrock",
    "himmelblau",
    "matyas",
    "powell_badly_scaled",
    "powell_singular",
    "quickstart_quadratic",
    "rosenbrock",
    "sphere",
    "trigonometric",
]
