from .armijo import ArmijoResult, armijo
from .hager_zhang import HagerZhangResult, hager_zhang
from .more_thuente import CstepState, MoreThuenteResult, cstep, more_thuente

__all__ = [
    "ArmijoResult",
    "HagerZhangResult",
    "hager_zhang",
    "CstepState",
    "MoreThuenteResult",
    "armijo",
    "cstep",
    "more_thuente",
]
