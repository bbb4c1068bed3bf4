"""Fused batched More-Thuente (ops/fused_linesearch.py) parity tests.

The batch-native fused loop must make the same decisions as the
single-instance MINPACK port (linesearch/more_thuente.py): identical nfev
and termination codes, step/point agreement to f32 reduce-order noise.  The
Pallas kernel is exercised in interpreter mode here; the real-chip run lives
in tests_tpu/test_fused_linesearch_tpu.py.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cppnumericalsolvers_tpu.ops.fused_linesearch import (
    _mt_single,
    mt_pallas_batched,
)


def rosen(x):
    return jnp.sum(100.0 * (x[1::2] - x[0::2] ** 2) ** 2 + (1.0 - x[0::2]) ** 2)


def _case(b=24, n=8, seed=0, max_fev=20):
    vag = jax.value_and_grad(rosen)
    rng = np.random.default_rng(seed)
    x0 = jnp.asarray(rng.uniform(-2.0, 2.0, (b, n)).astype(np.float32))
    f0, g0 = jax.vmap(vag)(x0)
    d = -g0
    # Mix in non-descent lanes (immediate abort, more_thuente.h:152-156) and
    # a zero direction.
    d = d.at[3].set(g0[3])
    d = d.at[7].set(jnp.zeros((n,), jnp.float32))
    alpha = jnp.asarray(rng.uniform(1e-3, 1.5, (b,)).astype(np.float32))
    dginit = jnp.sum(g0 * d, axis=-1)
    want = jax.vmap(functools.partial(_mt_single, vag, max_fev))(
        x0, f0, g0, d, alpha, dginit
    )
    got = mt_pallas_batched(
        vag, x0, f0, g0, d, alpha, dginit, max_fev=max_fev, interpret=True
    )
    return want, got, x0, f0, g0


@pytest.mark.parametrize("seed,max_fev", [(0, 20), (1, 20), (2, 5)])
def test_batched_kernel_matches_single(seed, max_fev):
    want, got, *_ = _case(seed=seed, max_fev=max_fev)
    w_x, w_f, w_g, w_a, w_nfev, w_info = map(np.asarray, want)
    o_x, o_f, o_g, o_a, o_nfev, o_info = map(np.asarray, got)
    # Decision parity is exact: same evaluation counts, same MINPACK codes.
    np.testing.assert_array_equal(o_nfev, w_nfev)
    np.testing.assert_array_equal(o_info, w_info)
    # Numeric parity to f32 reduce-order noise (the kernel's directional
    # derivative is a keepdims row-sum, the oracle's a vdot).
    np.testing.assert_allclose(o_a, w_a, rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(o_x, w_x, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(o_f, w_f, rtol=1e-3, atol=1e-3)


def test_non_descent_lane_returns_start():
    want, got, x0, f0, g0 = _case()
    o_x, o_f, o_g, o_a, o_nfev, o_info = map(np.asarray, got)
    for lane in (3, 7):  # non-descent / zero direction
        assert o_info[lane] == -1
        assert o_nfev[lane] == 0
        np.testing.assert_array_equal(o_x[lane], np.asarray(x0)[lane])
        np.testing.assert_array_equal(o_f[lane], np.asarray(f0)[lane])
        np.testing.assert_array_equal(o_g[lane], np.asarray(g0)[lane])


def test_batched_solve_uses_op_and_matches_generic():
    """End-to-end consistency of the two two-loop lowerings: both configs
    route the line search through the batch-native custom_vmap op, so this
    is a two-loop-impl ("auto" fused vs "xla") trajectory-parity check, NOT
    fused-vs-oracle evidence (a bug shared by both sides would pass).  The
    fused-vs-oracle claim rests on the _mt_single parity tests above, which
    pit the batch-native loop against the single-instance MINPACK port."""
    from cppnumericalsolvers_tpu import minimize_batched, objective
    from cppnumericalsolvers_tpu.solvers import Lbfgs

    obj = objective(rosen, mode="first")
    rng = np.random.default_rng(3)
    x0 = jnp.asarray(rng.uniform(-2.0, 2.0, (16, 8)))
    rf = minimize_batched(obj, x0, Lbfgs())
    rg = minimize_batched(obj, x0, Lbfgs(two_loop_impl="xla"))
    np.testing.assert_array_equal(
        np.asarray(rf.progress.status), np.asarray(rg.progress.status)
    )
    np.testing.assert_array_equal(
        np.asarray(rf.state.nfev), np.asarray(rg.state.nfev)
    )
    np.testing.assert_allclose(
        np.asarray(rf.state.x), np.asarray(rg.state.x), rtol=1e-8, atol=1e-8
    )


def test_xla_batched_loop_matches_single():
    """The XLA batch-native loop (the f64/CPU fallback, sharing
    _mt_trip_core with the Pallas kernel) makes the same decisions as the
    single-instance MINPACK port."""
    from cppnumericalsolvers_tpu.ops.fused_linesearch import mt_xla_batched

    vag = jax.value_and_grad(rosen)
    rng = np.random.default_rng(4)
    b, n = 24, 10
    x0 = jnp.asarray(rng.uniform(-2.0, 2.0, (b, n)))
    f0, g0 = jax.vmap(vag)(x0)
    d = -g0
    d = d.at[2].set(g0[2])  # non-descent abort lane
    alpha = jnp.asarray(rng.uniform(1e-3, 1.5, (b,)))
    dginit = jnp.sum(g0 * d, axis=-1)
    want = jax.vmap(functools.partial(_mt_single, vag, 20))(
        x0, f0, g0, d, alpha, dginit
    )
    got = mt_xla_batched(vag, x0, f0, g0, d, alpha, dginit, max_fev=20)
    np.testing.assert_array_equal(np.asarray(got[4]), np.asarray(want[4]))
    np.testing.assert_array_equal(np.asarray(got[5]), np.asarray(want[5]))
    np.testing.assert_allclose(
        np.asarray(got[0]), np.asarray(want[0]), rtol=1e-12, atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(got[3]), np.asarray(want[3]), rtol=1e-12
    )
