from .armijo import ArmijoResult, armijo
from .more_thuente import CstepState, MoreThuenteResult, cstep, more_thuente

__all__ = [
    "ArmijoResult",
    "CstepState",
    "MoreThuenteResult",
    "armijo",
    "cstep",
    "more_thuente",
]
