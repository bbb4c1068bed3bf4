from .callbacks import IterationTrace, init_trace, print_progress, record_trace
from .driver import resume
from .driver import MinimizeResult, SolverBase, minimize, minimize_batched
from .penalty import (
    MultiplierState,
    augmented_lagrangian_value,
    lagrangian_gradient,
    penalty_value,
    quadratic_equality_penalty,
    quadratic_inequality_penalty_ge,
    quadratic_inequality_penalty_lt,
    to_augmented_lagrangian,
    to_penalty,
)
from .problem import ConstrainedProblem
from .objective import (
    DifferentiabilityMode,
    FunctionState,
    Objective,
    constant,
    max_zero,
    min_zero,
    objective,
)
from .progress import (
    PAST_RING_SIZE,
    ProgressState,
    StoppingCriteria,
    conservative_stopping,
    default_stopping,
    init_progress,
    update_progress,
    update_progress_constrained,
)
from .status import CONVERGED_STATUSES, Status, status_message
from .tree import tree_where

__all__ = [
    "ConstrainedProblem",
    "MultiplierState",
    "augmented_lagrangian_value",
    "lagrangian_gradient",
    "penalty_value",
    "quadratic_equality_penalty",
    "quadratic_inequality_penalty_ge",
    "quadratic_inequality_penalty_lt",
    "to_augmented_lagrangian",
    "to_penalty",
    "CONVERGED_STATUSES",
    "DifferentiabilityMode",
    "FunctionState",
    "MinimizeResult",
    "Objective",
    "PAST_RING_SIZE",
    "ProgressState",
    "SolverBase",
    "IterationTrace",
    "print_progress",
    "Status",
    "StoppingCriteria",
    "conservative_stopping",
    "constant",
    "default_stopping",
    "init_progress",
    "max_zero",
    "min_zero",
    "minimize",
    "minimize_batched",
    "resume",
    "objective",
    "status_message",
    "tree_where",
    "update_progress",
    "update_progress_constrained",
]
