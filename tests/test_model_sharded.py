"""Intra-problem ("model"-axis) sharding tests — SURVEY.md §2 #32(c).

Runs on the virtual 8-device CPU mesh (conftest.py).  The sharded solve
must reproduce the unsharded trajectory: GSPMD only reorders reductions,
so in float64 the results agree to tight tolerance and statuses match.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from cppnumericalsolvers_tpu import minimize, minimize_batched, objective
from cppnumericalsolvers_tpu.parallel import minimize_model_sharded
from cppnumericalsolvers_tpu.solvers import GradientDescent, Lbfgs

N = 512  # large-n problem dimension, divisible by the 8-device mesh


def ext_rosenbrock(x):
    even, odd = x[0::2], x[1::2]
    return jnp.sum(100.0 * (odd - even**2) ** 2 + (1.0 - even) ** 2)


def quadratic(x):
    scale = 1.0 + jnp.arange(x.shape[-1], dtype=x.dtype) / x.shape[-1]
    return jnp.sum(scale * x * x)


@pytest.fixture(scope="module")
def model_mesh():
    return Mesh(np.asarray(jax.devices()), ("model",))


@pytest.fixture(scope="module")
def mesh_2d():
    return Mesh(
        np.asarray(jax.devices()).reshape(4, 2), ("batch", "model")
    )


def test_sharded_matches_unsharded_lbfgs(model_mesh):
    obj = objective(ext_rosenbrock, mode="first")
    x0 = jnp.full((N,), -1.2)

    ref = minimize(obj, x0, Lbfgs(m=10))
    out = minimize_model_sharded(obj, x0, Lbfgs(m=10), mesh=model_mesh)

    assert int(out.progress.status) == int(ref.progress.status)
    np.testing.assert_allclose(
        np.asarray(out.state.x), np.asarray(ref.state.x), atol=1e-8
    )
    np.testing.assert_allclose(
        float(out.state.value), float(ref.state.value), rtol=1e-10, atol=1e-12
    )
    # Identical evaluation counts: the sharded program runs the same
    # iteration-for-iteration algorithm, only with distributed reductions.
    assert int(out.state.nfev) == int(ref.state.nfev)


def test_sharded_solve_reaches_quadratic_optimum(model_mesh):
    obj = objective(quadratic, mode="first")
    x0 = jnp.linspace(-2.0, 2.0, N)
    out = minimize_model_sharded(obj, x0, Lbfgs(m=5), mesh=model_mesh)
    assert float(out.state.value) < 1e-8
    assert np.max(np.abs(np.asarray(out.state.x))) < 1e-4


def test_sharded_input_sharding_is_respected(model_mesh):
    """The committed input sharding must survive into the compiled solve
    (i.e. the program is actually partitioned, not silently replicated)."""
    obj = objective(quadratic, mode="first")
    x0 = jnp.linspace(-1.0, 1.0, N)
    out = minimize_model_sharded(obj, x0, Lbfgs(m=5), mesh=model_mesh)
    # The final iterate lives on all mesh devices.
    assert len(out.state.x.sharding.device_set) == len(jax.devices())


def test_batch_plus_model_2d_mesh(mesh_2d):
    """(B, n) batch data-parallel over 'batch', each instance sharded over
    'model' — the full 2-D mesh composition."""
    obj = objective(ext_rosenbrock, mode="first")
    rng = np.random.default_rng(3)
    x0 = jnp.asarray(rng.uniform(-2.0, 2.0, size=(8, N)))

    ref = minimize_batched(obj, x0, Lbfgs(m=5))
    out = minimize_model_sharded(
        obj, x0, Lbfgs(m=5), mesh=mesh_2d, batch_axis="batch"
    )
    # Distributed reductions reorder float ops; over hundreds of nonconvex
    # iterations trajectories drift in the last digits, so assert the
    # contract (every lane converges to the Rosenbrock minimum) rather than
    # a bitwise trajectory match (the 1-D test above covers exactness on a
    # single instance).
    assert np.asarray(out.state.value).shape == (8,)
    assert np.all(np.asarray(out.state.value) < 1e-3)
    assert np.all(np.asarray(ref.state.value) < 1e-3)


def test_non_two_loop_solver_passes_through(model_mesh):
    """Solvers without the two_loop_impl knob shard as-is."""
    obj = objective(quadratic, mode="first")
    x0 = jnp.linspace(-1.0, 1.0, N)
    out = minimize_model_sharded(obj, x0, GradientDescent(), mesh=model_mesh)
    assert float(out.state.value) < 1e-6


def test_shape_validation(model_mesh):
    obj = objective(quadratic, mode="first")
    with pytest.raises(ValueError, match="x0 must be"):
        minimize_model_sharded(
            obj, jnp.zeros((2, N)), Lbfgs(), mesh=model_mesh
        )
    with pytest.raises(ValueError, match="x0 must be"):
        minimize_model_sharded(
            obj, jnp.zeros((N,)), Lbfgs(), mesh=model_mesh,
            batch_axis="batch",
        )


def test_model_axis_collective_signature(model_mesh):
    """Structural pin on the model-axis collective pattern (VERDICT round-4
    item 9, mirror of tests/test_scaling_efficiency.py's batch-axis check):
    the compiled model-sharded L-BFGS solve must contain ONLY scalar
    all-reduce collectives — the psum-reduced partial dot products of the
    two-loop recursion, line search, and stopping machine — and never an
    all-gather / reduce-scatter / collective-permute / all-to-all, which
    would mean GSPMD decided to materialise a full (m, n) history or n-long
    vector on every chip instead of keeping it sharded."""
    import re

    from jax.sharding import NamedSharding

    from cppnumericalsolvers_tpu.core.driver import _solve_loop
    from cppnumericalsolvers_tpu.core.progress import default_stopping
    from cppnumericalsolvers_tpu.parallel.model_sharded import (
        _force_xla_two_loop,
    )

    obj = objective(quadratic, mode="first")
    solver = _force_xla_two_loop(Lbfgs(m=5))
    stopping = default_stopping(jnp.float64)
    x0 = jnp.zeros((N,), jnp.float64)

    def solve(x0_, stopping_):
        state0 = obj.evaluate(x0_, nfev=0)
        internals0 = solver.init(obj, state0)
        return _solve_loop(obj, solver, state0, internals0, stopping_, 0)

    fn = jax.jit(
        solve, in_shardings=(NamedSharding(model_mesh, P("model")), None)
    )
    hlo = "\n".join(
        m.to_string()
        for m in fn.lower(x0, stopping).compile()
        .runtime_executable().hlo_modules()
    )

    # No buffer-shaped collectives anywhere (definitions or references).
    bad = re.findall(
        r"all-gather|reduce-scatter|collective-permute|all-to-all", hlo
    )
    assert not bad, f"unexpected buffer collectives: {set(bad)}"

    # Every all-reduce *instruction* is a scalar reduction; XLA keeps the
    # per-trip psums inside the rolled loops, so only a handful of scalar
    # all-reduce definitions exist regardless of m or n.
    defs = re.findall(r"=\s*(\S+)\s+all-reduce", hlo)
    assert defs, "expected psum all-reduces on the model axis"
    for shape in defs:
        assert re.fullmatch(r"f64\[(|1|2)\]", shape), (
            f"non-scalar all-reduce operand {shape}: a sharded buffer is "
            "being reduced instead of a partial dot product"
        )
