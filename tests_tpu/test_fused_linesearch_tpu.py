"""Real-TPU checks for the fused batched More-Thuente line search.

Runs only when the default backend is an actual TPU (see conftest) — the
Mosaic lowering of the search kernel (cstep's branch-free case machinery on
(TB, 1) vectors, i32-domain bool selects, the in-kernel trial formation) is
exactly what interpreter mode cannot validate.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from cppnumericalsolvers_tpu.ops.fused_linesearch import (
    _mt_single,
    mt_pallas_batched,
)


def rosen(x):
    return jnp.sum(100.0 * (x[1::2] - x[0::2] ** 2) ** 2 + (1.0 - x[0::2]) ** 2)


def test_kernel_matches_single_on_tpu():
    vag = jax.value_and_grad(rosen)
    rng = np.random.default_rng(0)
    b, n = 64, 32
    x0 = jnp.asarray(rng.uniform(-2.0, 2.0, (b, n)).astype(np.float32))
    f0, g0 = jax.vmap(vag)(x0)
    d = -g0
    d = d.at[5].set(g0[5])  # non-descent abort lane
    alpha = jnp.asarray(rng.uniform(1e-3, 1.5, (b,)).astype(np.float32))
    dginit = jnp.sum(g0 * d, axis=-1)

    want = jax.vmap(functools.partial(_mt_single, vag, 20))(
        x0, f0, g0, d, alpha, dginit
    )
    got = mt_pallas_batched(vag, x0, f0, g0, d, alpha, dginit, max_fev=20)
    w_x, w_f, w_g, w_a, w_nfev, w_info = map(np.asarray, want)
    o_x, o_f, o_g, o_a, o_nfev, o_info = map(np.asarray, got)
    np.testing.assert_array_equal(o_nfev, w_nfev)
    np.testing.assert_array_equal(o_info, w_info)
    np.testing.assert_allclose(o_a, w_a, rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(o_x, w_x, rtol=1e-5, atol=1e-5)


def test_batched_solve_end_to_end_f32_tpu():
    """Full fused path (prologue kernel -> fused MT loop -> epilogue kernel)
    converges the batch and keeps status/nfev parity with the generic XLA
    composition on the same chip."""
    from cppnumericalsolvers_tpu import minimize_batched, objective
    from cppnumericalsolvers_tpu.core.progress import default_stopping
    from cppnumericalsolvers_tpu.core.status import Status
    from cppnumericalsolvers_tpu.solvers import Lbfgs

    obj = objective(rosen, mode="first")
    rng = np.random.default_rng(1)
    x0 = jnp.asarray(rng.uniform(-2.0, 2.0, (32, 16)).astype(np.float32))
    stopping = default_stopping(jnp.float32)
    rf = minimize_batched(obj, x0, Lbfgs(), stopping)
    ok = np.asarray(rf.progress.status) != int(Status.CONTINUE)
    assert ok.all()
    # The batch must actually minimize: Rosenbrock optimum value is 0.
    assert np.median(np.asarray(rf.state.value)) < 1e-4
