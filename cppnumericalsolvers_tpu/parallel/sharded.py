"""Pod-scale batched solving: shard the instance batch over a TPU mesh.

The reference is single-thread CPU (SURVEY.md §2 #32-33: no threads/MPI
anywhere); scaling is this framework's addition.  Design, per the
scaling-book recipe: pick a mesh, annotate shardings, let XLA insert
collectives.

* The batch axis of ``x0_batch`` is sharded over the mesh's ``"batch"`` axis
  with ``shard_map``.  Each device runs the *whole* vmapped
  ``lax.while_loop`` solver on its local shard — devices exit their loop
  independently as their local instances converge, so no per-iteration
  cross-device sync exists at all (the only collective is the optional
  metrics ``psum`` at the end).  This is the right layout for an
  embarrassingly-parallel instance batch: collectives ride ICI only for O(1)
  scalars per solve.
* Multi-host: call ``jax.distributed.initialize()`` first (see
  ``initialize_distributed``); the same code then spans hosts because the
  mesh enumerates global devices.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.driver import (
    MinimizeResult,
    SolverBase,
    _solve_batched_jit,
)
from ..core.objective import Objective
from ..core.progress import StoppingCriteria
from ..core.status import CONVERGED_STATUSES

__all__ = [
    "make_mesh",
    "minimize_sharded",
    "aggregate_metrics",
    "initialize_distributed",
]


def make_mesh(n_devices: int | None = None, axis: str = "batch") -> Mesh:
    """A 1-D device mesh over the first ``n_devices`` global devices."""
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    return Mesh(np.asarray(devices[:n_devices]), (axis,))


def initialize_distributed(**kwargs) -> None:
    """Multi-host entry point: ``jax.distributed.initialize`` passthrough.

    After this, ``jax.devices()`` enumerates the full pod slice and
    ``make_mesh()``/``minimize_sharded`` span hosts transparently."""
    jax.distributed.initialize(**kwargs)


def minimize_sharded(
    objective: Objective,
    x0_batch: jax.Array,
    solver: SolverBase,
    stopping: StoppingCriteria | None = None,
    mesh: Mesh | None = None,
    axis: str = "batch",
) -> MinimizeResult:
    """Solve a batch of instances sharded over a device mesh.

    ``x0_batch`` is (B, n) with B divisible by the mesh size.  Every result
    leaf gains a leading sharded batch axis.  Each device solves its local
    shard with zero cross-device communication (see module docstring)."""
    from ..core.tree import shard_map

    solver.check_mode(objective)
    x0_batch = jnp.asarray(x0_batch)
    if stopping is None:
        stopping = solver.default_stopping(x0_batch.dtype)
    if mesh is None:
        mesh = make_mesh(axis=axis)
    n_dev = mesh.devices.size
    if x0_batch.shape[0] % n_dev:
        raise ValueError(
            f"batch size {x0_batch.shape[0]} not divisible by mesh size "
            f"{n_dev}; pad the batch (converged padding lanes are free)."
        )

    def local_solve(x0_shard, stopping_):
        # Batch-native loop per device shard (not vmap-of-while): avoids the
        # while-batching rule's full-carry select — see
        # core.driver._solve_loop_batched.  Each device still exits its own
        # loop as soon as its local lanes are all done.
        return _solve_batched_jit.__wrapped__(
            objective, x0_shard, solver, stopping_
        )

    # Discover the result structure once (abstract eval, no FLOPs) so
    # out_specs can mirror it.
    shape = jax.eval_shape(local_solve, x0_batch, stopping)
    out_specs = jax.tree.map(lambda _: P(axis), shape)

    sharded = shard_map(
        local_solve,
        mesh=mesh,
        in_specs=(P(axis), P()),
        out_specs=out_specs,
        # Scoped opt-out of the varying-manual-axes type check, investigated
        # (round-2): promoting the replicated stopping config with
        # jax.lax.pcast is not enough — every while/fori/scan carry seeded
        # from CONSTANTS inside the solvers (two-loop alpha scratch,
        # progress counters, plateau ring, solver internals) is also
        # shard-invariant at loop entry and varying at loop exit, so the
        # check would require threading the mesh axis name into every
        # solver's init and inner loops purely to insert pcasts.  The solve
        # body is collective-free by construction (each device runs an
        # independent local vmap), so the check has nothing real to verify
        # here; correctness is pinned instead by
        # tests/test_parallel.py::test_sharded_matches_vmapped, which
        # asserts the sharded result equals the unsharded vmap exactly.
        check_vma=False,
    )
    fn = jax.jit(
        sharded,
        in_shardings=(NamedSharding(mesh, P(axis)), None),
    )
    return fn(x0_batch, stopping)


def aggregate_metrics(result: MinimizeResult) -> dict[str, float]:
    """Pod-level benchmark metrics from a (sharded) batched result.

    Converged %, mean nfev, mean iterations — the BASELINE.json contract.
    Pure numpy on fetched arrays (O(B) scalars; collective-free)."""
    status = np.asarray(result.progress.status)
    nfev = np.asarray(result.state.nfev)
    iters = np.asarray(result.progress.num_iterations)
    converged = np.isin(status, np.asarray(list(CONVERGED_STATUSES)))
    return {
        "converged_pct": 100.0 * float(converged.mean()),
        "mean_nfev": float(nfev.mean()),
        "mean_iterations": float(iters.mean()),
        "total_instances": int(status.size),
    }
