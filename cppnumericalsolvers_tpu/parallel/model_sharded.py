"""Intra-problem ("model"-axis) sharding for large n.

The second scaling axis from SURVEY.md §2 #32(c): when a single problem
instance's dimension n is too large for one chip (or its per-iteration
linear algebra should ride more than one chip's HBM bandwidth), shard the
parameter vector itself over a mesh axis.  The reference has no analog —
it is single-thread CPU — so this module is pure TPU-native design, the
scaling-book recipe verbatim: pick a mesh, annotate the input shardings,
and let XLA's SPMD partitioner insert the collectives.

What gets sharded and what gets reduced:

* ``x`` (n,) is sharded over ``model``; GSPMD propagates the sharding
  through the whole ``lax.while_loop`` carry — the L-BFGS (m, n) history
  buffers shard along their last axis, gradients along their only axis.
* Every dot product in the two-loop recursion, the line searches'
  directional derivatives, and the stopping machine's norms become
  local partial reductions + an ICI all-reduce (``psum``) inserted by
  XLA — exactly the hand-written MPI_Allreduce a distributed L-BFGS
  would use, for free.
* The objective is traced as written on the full logical shape; users
  need not change anything as long as it is built from shardable jnp
  ops (elementwise + reductions + matmuls).

Combine with the batch axis for a 2-D mesh: ``x0`` of shape (B, n) with
``spec=P("batch", "model")`` runs B instances data-parallel, each sharded
over the model axis.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.driver import MinimizeResult, SolverBase, _solve_loop
from ..core.objective import Objective
from ..core.progress import StoppingCriteria
from .sharded import make_mesh

__all__ = ["minimize_model_sharded"]


def _force_xla_two_loop(solver: SolverBase) -> SolverBase:
    """Pin the solver's hot op to the XLA lowering under GSPMD.

    The fused Pallas two-loop kernel (ops/two_loop.py) is written for a
    single chip's VMEM; under automatic SPMD partitioning a pallas_call
    cannot be split, so the sharded path must take the pure-XLA lowering,
    which GSPMD partitions freely (the masked fori_loop's dot products
    become psum-reduced partials)."""
    if hasattr(solver, "two_loop_impl"):
        return dataclasses.replace(solver, two_loop_impl="xla")
    return solver


def minimize_model_sharded(
    objective: Objective,
    x0: jax.Array,
    solver: SolverBase,
    stopping: StoppingCriteria | None = None,
    *,
    mesh: Mesh | None = None,
    model_axis: str = "model",
    batch_axis: str | None = None,
    trace: int = 0,
) -> MinimizeResult:
    """Solve with the parameter vector sharded over a mesh axis.

    ``x0`` is (n,) — or (B, n) when ``batch_axis`` is given, in which case
    the batch is data-parallel over ``batch_axis`` and each instance's n
    dimension is sharded over ``model_axis`` (a 2-D mesh).  n need not be
    divisible by the axis size (GSPMD pads internally), but even shards
    keep the collectives balanced.
    """
    solver.check_mode(objective)
    solver = _force_xla_two_loop(solver)
    x0 = jnp.asarray(x0)
    if stopping is None:
        stopping = solver.default_stopping(x0.dtype)
    if mesh is None:
        mesh = make_mesh(axis=model_axis)

    if batch_axis is None:
        if x0.ndim != 1:
            raise ValueError(
                f"x0 must be (n,) without batch_axis, got {x0.shape}"
            )
        spec = P(model_axis)

        def solve(x0_, stopping_):
            state0 = objective.evaluate(x0_, nfev=0)
            internals0 = solver.init(objective, state0)
            return _solve_loop(
                objective, solver, state0, internals0, stopping_, trace
            )

    else:
        if x0.ndim != 2:
            raise ValueError(
                f"x0 must be (B, n) with batch_axis, got {x0.shape}"
            )
        spec = P(batch_axis, model_axis)

        def solve(x0_, stopping_):
            def one(x_single):
                state0 = objective.evaluate(x_single, nfev=0)
                internals0 = solver.init(objective, state0)
                return _solve_loop(
                    objective, solver, state0, internals0, stopping_, trace
                )

            return jax.vmap(one)(x0_)

    fn = jax.jit(solve, in_shardings=(NamedSharding(mesh, spec), None))
    return fn(x0, stopping)
