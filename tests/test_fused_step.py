"""Fused L-BFGS step (ops/fused_step.py) parity tests.

The fused path (prologue kernel -> line search -> epilogue kernel) must be
*semantically identical* to the generic driver composition (Lbfgs.step +
update_progress + lane freezing): same trajectories, statuses, nfev,
iteration counts.  On the CPU backend the fused ops lower to XLA
compositions, so these tests pin the restructuring (relocated computations,
custom_vmap dispatch); the Pallas kernels themselves are checked against
the XLA single-instance oracles in interpreter mode and on the real chip in
tests_tpu/.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cppnumericalsolvers_tpu import minimize, minimize_batched, objective
from cppnumericalsolvers_tpu.core.progress import default_stopping
from cppnumericalsolvers_tpu.solvers import Lbfgs


def rosen(x):
    return jnp.sum(100.0 * (x[1::2] - x[0::2] ** 2) ** 2 + (1.0 - x[0::2]) ** 2)


OBJ = objective(rosen, mode="first")


def _fused_vs_generic(dtype, n=8, b=24, seed=0):
    rng = np.random.default_rng(seed)
    x0 = jnp.asarray(rng.uniform(-2.0, 2.0, (b, n)).astype(dtype))
    fused = Lbfgs()  # two_loop_impl="auto" -> fused step_and_update
    generic = Lbfgs(two_loop_impl="xla")  # forces the un-fused composition
    assert fused.supports_fused_update(OBJ)
    assert not generic.supports_fused_update(OBJ)
    rf = minimize_batched(OBJ, x0, fused)
    rg = minimize_batched(OBJ, x0, generic)
    return rf, rg


@pytest.mark.parametrize("dtype", [np.float64, np.float32])
def test_fused_batched_matches_generic(dtype):
    rf, rg = _fused_vs_generic(dtype)
    np.testing.assert_array_equal(
        np.asarray(rf.progress.status), np.asarray(rg.progress.status)
    )
    np.testing.assert_array_equal(
        np.asarray(rf.progress.num_iterations),
        np.asarray(rg.progress.num_iterations),
    )
    np.testing.assert_array_equal(
        np.asarray(rf.state.nfev), np.asarray(rg.state.nfev)
    )
    np.testing.assert_allclose(
        np.asarray(rf.state.x), np.asarray(rg.state.x), rtol=1e-6, atol=1e-6
    )
    # Internals parity: the pending pair and history count drive future
    # resume steps.
    np.testing.assert_array_equal(
        np.asarray(rf.internals.mem_count), np.asarray(rg.internals.mem_count)
    )
    np.testing.assert_array_equal(
        np.asarray(rf.internals.pending_valid),
        np.asarray(rg.internals.pending_valid),
    )


def test_fused_single_matches_generic():
    x0 = jnp.asarray([-1.2, 1.0, 0.5, -0.7])
    rf = minimize(OBJ, x0, Lbfgs())
    rg = minimize(OBJ, x0, Lbfgs(two_loop_impl="xla"))
    assert int(rf.progress.status) == int(rg.progress.status)
    assert int(rf.state.nfev) == int(rg.state.nfev)
    assert int(rf.progress.num_iterations) == int(rg.progress.num_iterations)
    np.testing.assert_allclose(
        np.asarray(rf.state.x), np.asarray(rg.state.x), rtol=1e-10
    )


def test_fused_respects_stopping_criteria():
    # Exercise every criterion the fused epilogue implements.
    x0 = jnp.asarray([[-1.2, 1.0, 0.5, -0.7]] * 4)
    # Iteration limit
    r = minimize_batched(
        OBJ, x0, Lbfgs(),
        default_stopping(jnp.float64).replace(max_iterations=3),
    )
    assert np.all(np.asarray(r.progress.num_iterations) == 4)
    # Plateau (past) fires on a flat objective
    flat = objective(lambda x: jnp.sum(0.0 * x) + 1.0, mode="first")
    r2 = minimize_batched(flat, x0, Lbfgs())
    assert np.all(np.asarray(r2.progress.num_iterations) < 20)
    # factr-style relative f_delta
    crit = default_stopping(jnp.float64).replace(
        f_delta=1e-9, f_delta_relative=True, gradient_norm=0.0, past=0,
        x_delta=0.0,
    )
    r3 = minimize_batched(OBJ, x0, Lbfgs(), crit)
    from cppnumericalsolvers_tpu.core.status import Status

    assert np.all(
        np.asarray(r3.progress.status) == int(Status.F_DELTA_VIOLATION)
    )


def test_prologue_pallas_interpret_matches_xla():
    from cppnumericalsolvers_tpu.ops.fused_step import (
        _prologue_xla_single,
        prologue_pallas_batched,
    )

    rng = np.random.default_rng(1)
    b, m, n = 12, 5, 20
    x = jnp.asarray(rng.standard_normal((b, n)).astype(np.float32))
    g = jnp.asarray(rng.standard_normal((b, n)).astype(np.float32))
    s = jnp.asarray(rng.standard_normal((b, m, n)).astype(np.float32) * 0.1)
    y = jnp.asarray(
        s + 0.05 * rng.standard_normal((b, m, n)).astype(np.float32)
    )
    count = jnp.asarray(rng.integers(0, m + 1, (b,)).astype(np.int32))
    gamma = jnp.asarray(rng.uniform(0.5, 2.0, (b,)).astype(np.float32))
    sn = jnp.asarray(rng.standard_normal((b, n)).astype(np.float32) * 0.1)
    yn = jnp.asarray(
        sn + 0.05 * rng.standard_normal((b, n)).astype(np.float32)
    )
    valid = jnp.asarray(rng.integers(0, 2, (b,)).astype(bool))
    done = jnp.asarray(rng.integers(0, 2, (b,)).astype(bool))

    want = jax.vmap(_prologue_xla_single)(
        x, g, s, y, count, gamma, sn, yn, valid, done
    )
    got = prologue_pallas_batched(
        x, g, s, y, count, gamma, sn, yn, valid, done, interpret=True
    )
    names = ["ls_dir", "alpha", "dginit", "s_mem", "y_mem", "count", "gamma"]
    for nm, w, o in zip(names, want, got):
        np.testing.assert_allclose(
            np.asarray(o), np.asarray(w), rtol=2e-5, atol=2e-5, err_msg=nm
        )
    # done lanes: internals bit-identical
    dn = np.asarray(done)
    np.testing.assert_array_equal(np.asarray(got[5])[dn], np.asarray(count)[dn])
    np.testing.assert_array_equal(
        np.asarray(got[3])[dn], np.asarray(s)[dn]
    )


def test_epilogue_pallas_interpret_matches_xla():
    from cppnumericalsolvers_tpu.core.objective import FunctionState
    from cppnumericalsolvers_tpu.core.progress import init_progress
    from cppnumericalsolvers_tpu.ops.fused_step import (
        _epilogue_xla_single,
        epilogue_pallas_batched,
    )

    rng = np.random.default_rng(2)
    b, n = 16, 12
    f32 = np.float32

    state = FunctionState(
        x=jnp.asarray(rng.standard_normal((b, n)).astype(f32)),
        value=jnp.asarray(rng.standard_normal((b,)).astype(f32)),
        gradient=jnp.asarray(rng.standard_normal((b, n)).astype(f32)),
        nfev=jnp.asarray(rng.integers(1, 50, (b,)).astype(np.int32)),
    )
    x_ls = state.x + jnp.asarray(
        0.1 * rng.standard_normal((b, n)).astype(f32)
    )
    f_ls = state.value - jnp.asarray(np.abs(rng.standard_normal(b)).astype(f32))
    # Inject non-finite line-search results and exact stalls.
    f_ls = f_ls.at[3].set(jnp.nan)
    x_ls = x_ls.at[5].set(state.x[5])
    g_ls = jnp.asarray(rng.standard_normal((b, n)).astype(f32))
    ls_nfev = jnp.asarray(rng.integers(1, 10, (b,)).astype(np.int32))
    count = jnp.asarray(rng.integers(0, 10, (b,)).astype(np.int32))
    sp = jnp.asarray(rng.standard_normal((b, n)).astype(f32))
    yp = jnp.asarray(rng.standard_normal((b, n)).astype(f32))
    pv = jnp.asarray(rng.integers(0, 2, (b,)).astype(bool))
    done = jnp.asarray(rng.integers(0, 2, (b,)).astype(bool))
    progress = jax.vmap(lambda _: init_progress(jnp.float32))(jnp.arange(b))
    # Advance some lanes' counters/ring so the ladder state is non-trivial.
    progress = progress._replace(
        num_iterations=jnp.asarray(rng.integers(0, 9, (b,)).astype(np.int32)),
        past_ring=jnp.asarray(rng.standard_normal((b, 8)).astype(f32)),
        past_pos=jnp.asarray(rng.integers(0, 3, (b,)).astype(np.int32)),
        x_delta_violations=jnp.asarray(
            rng.integers(0, 2, (b,)).astype(np.int32)
        ),
    )
    crit = default_stopping(jnp.float32)

    want = jax.vmap(
        lambda st, xl, fl, gl, ln, c, s_, y_, p, d, pr: _epilogue_xla_single(
            st, xl, fl, gl, ln, c, s_, y_, p, d, pr, crit
        )
    )(state, x_ls, f_ls, g_ls, ls_nfev, count, sp, yp, pv, done, progress)
    got = epilogue_pallas_batched(
        state, x_ls, f_ls, g_ls, ls_nfev, count, sp, yp, pv, done, progress,
        crit, interpret=True,
    )
    flat_w, _ = jax.tree.flatten(want)
    flat_g, _ = jax.tree.flatten(got)
    for i, (w, o) in enumerate(zip(flat_w, flat_g)):
        np.testing.assert_allclose(
            np.asarray(o), np.asarray(w), rtol=1e-6, atol=1e-6,
            err_msg=f"leaf {i}",
        )


def test_prologue_flat_layout_interpret_matches_xla():
    """The lane-aligned flat (B, m*n) history layout (n % 128 == 0) must be
    bit-for-bit the same computation as the 3-D layout — only the VMEM
    tiling changes (ops/two_loop.py flat_n note)."""
    from cppnumericalsolvers_tpu.ops.fused_step import (
        _prologue_xla_single,
        prologue_pallas_batched,
    )

    rng = np.random.default_rng(7)
    b, m, n = 16, 5, 128  # n % 128 == 0 -> flat path
    x = jnp.asarray(rng.standard_normal((b, n)).astype(np.float32))
    g = jnp.asarray(rng.standard_normal((b, n)).astype(np.float32))
    s = jnp.asarray(rng.standard_normal((b, m, n)).astype(np.float32) * 0.1)
    y = jnp.asarray(
        s + 0.05 * rng.standard_normal((b, m, n)).astype(np.float32)
    )
    count = jnp.asarray(rng.integers(0, m + 1, (b,)).astype(np.int32))
    gamma = jnp.asarray(rng.uniform(0.5, 2.0, (b,)).astype(np.float32))
    sn = jnp.asarray(rng.standard_normal((b, n)).astype(np.float32) * 0.1)
    yn = jnp.asarray(
        sn + 0.05 * rng.standard_normal((b, n)).astype(np.float32)
    )
    valid = jnp.asarray(rng.integers(0, 2, (b,)).astype(bool))
    done = jnp.asarray(rng.integers(0, 2, (b,)).astype(bool))

    want = jax.vmap(_prologue_xla_single)(
        x, g, s, y, count, gamma, sn, yn, valid, done
    )
    got = prologue_pallas_batched(
        x, g, s, y, count, gamma, sn, yn, valid, done, interpret=True
    )
    for i, (w, o) in enumerate(zip(want, got)):
        np.testing.assert_allclose(
            np.asarray(o), np.asarray(w), rtol=2e-5, atol=2e-5,
            err_msg=f"output {i}",
        )
