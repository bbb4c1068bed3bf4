from .armijo import ArmijoResult, armijo
from .dispatch import (
    LineSearchResult,
    line_search_alpha,
    run_line_search,
)
from .hager_zhang import HagerZhangResult, hager_zhang
from .more_thuente import CstepState, MoreThuenteResult, cstep, more_thuente

__all__ = [
    "ArmijoResult",
    "HagerZhangResult",
    "hager_zhang",
    "CstepState",
    "LineSearchResult",
    "line_search_alpha",
    "MoreThuenteResult",
    "armijo",
    "cstep",
    "more_thuente",
    "run_line_search",
]
