"""Real-TPU Mosaic lowering of the batch-minor (transposed) prologue
(ops/fused_step_t.py) against the XLA oracle, plus end-to-end parity of the
batched-native driver path vs the generic pure-XLA lowering on the chip.

tests/test_fused_step_t.py covers the kernel in interpret mode; these run
the real lowering (sublane-axis reductions, (1, B) scalar rows, lane-dim
grid tiling) and the full native solve loop.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cppnumericalsolvers_tpu.ops.fused_step import _prologue_xla_single
from cppnumericalsolvers_tpu.ops.fused_step_t import (
    history_rows_to_t,
    history_t_to_rows,
    prologue_t_pallas_batched,
)

requires_tpu = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="needs a real TPU chip"
)


@requires_tpu
@pytest.mark.parametrize("b,m,n", [(64, 10, 33), (200, 10, 32), (256, 5, 64)])
def test_prologue_t_real_lowering_matches_oracle(b, m, n):
    rng = np.random.default_rng(b + n)
    f32 = np.float32
    x = jnp.asarray(rng.standard_normal((b, n)).astype(f32))
    g = jnp.asarray(rng.standard_normal((b, n)).astype(f32))
    s_mem = rng.standard_normal((b, m, n)).astype(f32) * 0.1
    y_mem = (s_mem + 0.05 * rng.standard_normal((b, m, n))).astype(f32)
    count = rng.integers(0, m + 1, b).astype(np.int32)
    mask = np.arange(m)[None, :, None] < count[:, None, None]
    s_mem, y_mem = jnp.asarray(s_mem * mask), jnp.asarray(y_mem * mask)
    count = jnp.asarray(count)
    gamma = jnp.asarray(rng.uniform(0.5, 2.0, b).astype(f32))
    sn = jnp.asarray(rng.standard_normal((b, n)).astype(f32) * 0.1)
    yn = jnp.asarray(
        (np.asarray(sn) + 0.02 * rng.standard_normal((b, n))).astype(f32)
    )
    valid = jnp.asarray(rng.integers(0, 2, b).astype(bool))
    done = jnp.asarray(rng.integers(0, 4, b) == 0)

    ref = jax.vmap(_prologue_xla_single)(
        x, g, s_mem, y_mem, count, gamma, sn, yn, valid, done
    )
    out = prologue_t_pallas_batched(
        x, g, history_rows_to_t(s_mem, m, n), history_rows_to_t(y_mem, m, n),
        count, gamma, sn, yn, valid, done,
    )
    names = ("ls_dir", "alpha", "dginit")
    for name, got, want in zip(names, out[:3], ref[:3]):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5,
            err_msg=name,
        )
    np.testing.assert_array_equal(np.asarray(out[5]), np.asarray(ref[5]))
    np.testing.assert_allclose(
        np.asarray(history_t_to_rows(out[3], b, m, n)), np.asarray(ref[3]),
        rtol=1e-6, atol=1e-7,
    )
    np.testing.assert_allclose(
        np.asarray(history_t_to_rows(out[4], b, m, n)), np.asarray(ref[4]),
        rtol=1e-6, atol=1e-7,
    )


@requires_tpu
def test_native_batched_solve_matches_generic_on_tpu():
    """End-to-end: the batched-native driver path (default Lbfgs) vs the
    forced pure-XLA lowering.  At n=32 the native path is the FLAT
    trip-granular solve whose Mosaic kernel reorders f32 reductions at the
    last ulp, so full solves assert the drift-tolerant contract (statuses
    exact, aggregate counts tight, same convergence quality); the
    short-budget exactness pin lives in test_flat_solve_tpu.py.  At n=1536
    (in (_FLAT_N_MAX, _TRANSPOSED_N_MAX]) the nested transposed path runs
    under the same contract — its sublane-axis reductions reorder f32 sums vs the XLA
    lowering, which compounds over 100+ chaotic Rosenbrock iterations
    (kernel-level exactness is pinned by
    test_prologue_t_real_lowering_matches_oracle above)."""
    from cppnumericalsolvers_tpu import minimize_batched, objective
    from cppnumericalsolvers_tpu.solvers import Lbfgs
    from cppnumericalsolvers_tpu.solvers.lbfgs import LbfgsInternalsT

    def rosen(x):
        e, o = x[0::2], x[1::2]
        return jnp.sum(100.0 * (o - e**2) ** 2 + (1.0 - e) ** 2)

    obj = objective(rosen, mode="first")
    rng = np.random.default_rng(0)

    # Flat path (n <= _FLAT_N_MAX).
    x0 = jnp.asarray(rng.uniform(-2, 2, (256, 32)).astype(np.float32))
    rn = minimize_batched(obj, x0, Lbfgs())
    rx = minimize_batched(obj, x0, Lbfgs(two_loop_impl="xla"))
    assert isinstance(rn.internals, LbfgsInternalsT)
    np.testing.assert_array_equal(
        np.asarray(rn.progress.status), np.asarray(rx.progress.status)
    )
    nn = np.asarray(rn.state.nfev, np.float64)
    nx = np.asarray(rx.state.nfev, np.float64)
    assert abs(nn.mean() - nx.mean()) < 0.05 * nx.mean()
    fn = np.asarray(rn.state.value)
    fx = np.asarray(rx.state.value)
    assert abs((fn < 1e-4).mean() - (fx < 1e-4).mean()) < 0.06

    # Nested transposed path (n > _FLAT_N_MAX): same drift-tolerant
    # contract.
    x0 = jnp.asarray(rng.uniform(-2, 2, (128, 1536)).astype(np.float32))
    rn = minimize_batched(obj, x0, Lbfgs())
    rx = minimize_batched(obj, x0, Lbfgs(two_loop_impl="xla"))
    assert isinstance(rn.internals, LbfgsInternalsT)
    np.testing.assert_array_equal(
        np.asarray(rn.progress.status), np.asarray(rx.progress.status)
    )
    nn = np.asarray(rn.state.nfev, np.float64)
    nx = np.asarray(rx.state.nfev, np.float64)
    assert abs(nn.mean() - nx.mean()) < 0.05 * nx.mean()
    fn = np.asarray(rn.state.value)
    fx = np.asarray(rx.state.value)
    assert abs((fn < 1e-3).mean() - (fx < 1e-3).mean()) < 0.06
