"""Structural scaling guarantees for the sharded batch solve.

The data-parallel design claim (parallel/sharded.py: each device runs its
local while_loop to completion; no per-iteration cross-device sync) is
verified DETERMINISTICALLY here by inspecting the compiled HLO for
collective operations — flaky wall-clock assertions live in
benchmarks/scaling.py instead.
"""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cppnumericalsolvers_tpu import objective
from cppnumericalsolvers_tpu.core.progress import default_stopping
from cppnumericalsolvers_tpu.parallel import make_mesh, minimize_sharded
from cppnumericalsolvers_tpu.solvers import Lbfgs, Lbfgsb

_COLLECTIVE_RE = re.compile(
    r"all-reduce|all-gather|reduce-scatter|collective-permute|all-to-all"
)


def _sphere():
    return objective(lambda x: jnp.sum(x * x), mode="first")


def _compiled_hlo_for_sharded_solve(solver, n_devices=4):
    from jax.sharding import NamedSharding, PartitionSpec as P

    from cppnumericalsolvers_tpu.core.driver import _solve_one_jit
    from cppnumericalsolvers_tpu.core.tree import shard_map

    obj = _sphere()
    mesh = make_mesh(n_devices)
    stopping = default_stopping(jnp.float64)
    x0 = jnp.zeros((4 * n_devices, 4), jnp.float64)

    def local_solve(x0_shard, stopping_):
        return jax.vmap(
            lambda x0_: _solve_one_jit.__wrapped__(obj, x0_, solver, stopping_)
        )(x0_shard)

    shape = jax.eval_shape(local_solve, x0, stopping)
    out_specs = jax.tree.map(lambda _: P("batch"), shape)
    fn = jax.jit(
        shard_map(
            local_solve, mesh=mesh, in_specs=(P("batch"), P()),
            out_specs=out_specs, check_vma=False,
        ),
        in_shardings=(NamedSharding(mesh, P("batch")), None),
    )
    compiled = fn.lower(x0, stopping).compile()
    return "\n".join(m.to_string() for m in compiled.runtime_executable().hlo_modules())


@pytest.mark.parametrize(
    "solver", [Lbfgs(m=5), Lbfgsb(m=5, lower=-2.0, upper=2.0)],
    ids=["lbfgs", "lbfgsb"],
)
def test_sharded_solve_has_no_per_iteration_collectives(solver):
    hlo = _compiled_hlo_for_sharded_solve(solver)
    hits = _COLLECTIVE_RE.findall(hlo)
    assert not hits, (
        f"hidden cross-device collectives in the embarrassingly-parallel "
        f"solve: {sorted(set(hits))}"
    )


def test_per_lane_iteration_counts_are_independent():
    # Devices exit independently: a batch mixing trivially-converged lanes
    # (start at the optimum) with long-running lanes must report per-lane
    # iteration counts, the easy lanes unaffected by their shard-mates.
    obj = objective(
        lambda x: jnp.sum(100.0 * (x[1::2] - x[0::2] ** 2) ** 2
                          + (1.0 - x[0::2]) ** 2),
        mode="first",
    )
    mesh = make_mesh(4)
    x_easy = jnp.ones((4,), jnp.float64)
    x_hard = jnp.asarray([-1.2, 1.0, -1.2, 1.0], jnp.float64)
    x0 = jnp.stack([x_easy, x_hard, x_easy, x_hard] * 2)
    res = minimize_sharded(obj, x0, Lbfgs(m=5), mesh=mesh)
    iters = np.asarray(res.progress.num_iterations)
    assert (iters[0::2] <= 2).all()  # easy lanes stop immediately
    assert (iters[1::2] > 5).all()  # hard lanes actually ran
