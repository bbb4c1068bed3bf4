"""cppnumericalsolvers_tpu — a TPU-native smooth numerical-optimization
framework built from scratch in JAX/XLA (pjit + Pallas).

Capability surface of PatWie/CppNumericalSolvers (see SURVEY.md), re-designed
TPU-first: objectives are traced JAX functions, solver steps are pure
``State -> State`` pytree functions fused under ``jit``, problem batches are
vmapped and sharded over TPU meshes.
"""

from .core import (
    ConstrainedProblem,
    MultiplierState,
    augmented_lagrangian_value,
    lagrangian_gradient,
    to_augmented_lagrangian,
    to_penalty,
    CONVERGED_STATUSES,
    DifferentiabilityMode,
    IterationTrace,
    print_progress,
    FunctionState,
    MinimizeResult,
    Objective,
    ProgressState,
    SolverBase,
    Status,
    StoppingCriteria,
    conservative_stopping,
    constant,
    default_stopping,
    init_progress,
    max_zero,
    min_zero,
    minimize,
    minimize_batched,
    objective,
    resume,
    status_message,
)
from . import linesearch, models, ops, parallel, solvers

__version__ = "0.1.0"

__all__ = [
    "ConstrainedProblem",
    "MultiplierState",
    "augmented_lagrangian_value",
    "lagrangian_gradient",
    "to_augmented_lagrangian",
    "to_penalty",
    "CONVERGED_STATUSES",
    "DifferentiabilityMode",
    "FunctionState",
    "IterationTrace",
    "MinimizeResult",
    "Objective",
    "ProgressState",
    "SolverBase",
    "Status",
    "StoppingCriteria",
    "conservative_stopping",
    "constant",
    "default_stopping",
    "init_progress",
    "linesearch",
    "max_zero",
    "min_zero",
    "minimize",
    "minimize_batched",
    "models",
    "objective",
    "resume",
    "ops",
    "parallel",
    "print_progress",
    "solvers",
    "status_message",
]
