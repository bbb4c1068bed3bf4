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
