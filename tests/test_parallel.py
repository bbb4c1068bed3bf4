"""Mesh-sharded batch solving on the virtual 8-device CPU mesh.

The reference has no parallelism (SURVEY.md §2 #32); these tests pin the
framework's scaling contract instead: a shard_map'd batch solve must produce
bit-identical results to the plain vmapped solve, with outputs sharded over
the mesh's batch axis.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cppnumericalsolvers_tpu import minimize_batched, objective
from cppnumericalsolvers_tpu.models import rosenbrock
from cppnumericalsolvers_tpu.parallel import (
    aggregate_metrics,
    make_mesh,
    minimize_sharded,
)
from cppnumericalsolvers_tpu.solvers import Lbfgs


@pytest.fixture(scope="module")
def batch():
    rng = np.random.default_rng(7)
    return jnp.asarray(rng.uniform(-2.0, 2.0, size=(32, 2)))


def test_sharded_matches_vmapped(batch):
    obj = rosenbrock()
    solver = Lbfgs()
    mesh = make_mesh(8)
    res_sharded = minimize_sharded(obj, batch, solver, mesh=mesh)
    res_vmap = minimize_batched(obj, batch, solver)
    np.testing.assert_allclose(
        np.asarray(res_sharded.state.x), np.asarray(res_vmap.state.x)
    )
    np.testing.assert_array_equal(
        np.asarray(res_sharded.progress.status),
        np.asarray(res_vmap.progress.status),
    )
    np.testing.assert_array_equal(
        np.asarray(res_sharded.state.nfev), np.asarray(res_vmap.state.nfev)
    )


def test_sharded_output_sharding(batch):
    mesh = make_mesh(8)
    res = minimize_sharded(rosenbrock(), batch, Lbfgs(), mesh=mesh)
    sharding = res.state.x.sharding
    assert sharding.spec == jax.sharding.PartitionSpec("batch")
    m = aggregate_metrics(res)
    assert m["converged_pct"] == 100.0
    assert m["total_instances"] == 32


def test_sharded_rejects_indivisible_batch(batch):
    mesh = make_mesh(8)
    with pytest.raises(ValueError, match="not divisible"):
        minimize_sharded(rosenbrock(), batch[:31], Lbfgs(), mesh=mesh)


def test_sharded_submesh(batch):
    """A 2-device submesh must work while other devices stay idle."""
    mesh = make_mesh(2)
    res = minimize_sharded(rosenbrock(), batch, Lbfgs(), mesh=mesh)
    assert aggregate_metrics(res)["converged_pct"] == 100.0
