"""Parity of the batch-minor (transposed) fused prologue.

The transposed kernel (ops/fused_step_t.py) must be semantically identical
to the vmapped `_prologue_xla_single` oracle — the exact composition the
generic driver path runs — including the done-lane freeze contract and the
curvature/descent guards.  Runs the Pallas kernel in interpret mode on the
CPU backend (the TPU lowering is covered by tests_tpu/).
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


def _random_case(b, m, n, seed=0):
    rng = np.random.default_rng(seed)
    f32 = np.float32
    x = jnp.asarray(rng.standard_normal((b, n)).astype(f32))
    g = jnp.asarray(rng.standard_normal((b, n)).astype(f32))
    s_mem = rng.standard_normal((b, m, n)).astype(f32) * 0.1
    y_mem = (s_mem + 0.05 * rng.standard_normal((b, m, n))).astype(f32)
    count = rng.integers(0, m + 1, b).astype(np.int32)
    # Chronological contract: rows >= count are zero.
    mask = np.arange(m)[None, :, None] < count[:, None, None]
    s_mem, y_mem = jnp.asarray(s_mem * mask), jnp.asarray(y_mem * mask)
    gamma = jnp.asarray(rng.uniform(0.5, 2.0, b).astype(f32))
    s_new = jnp.asarray(rng.standard_normal((b, n)).astype(f32) * 0.1)
    y_new = jnp.asarray(
        (np.asarray(s_new) + 0.02 * rng.standard_normal((b, n))).astype(f32)
    )
    valid = jnp.asarray(rng.integers(0, 2, b).astype(bool))
    done = jnp.asarray(rng.integers(0, 4, b) == 0)
    return x, g, s_mem, y_mem, jnp.asarray(count), gamma, s_new, y_new, \
        valid, done


@pytest.mark.parametrize(
    "b,m,n",
    [
        (24, 10, 20),  # awkward: B not a lane multiple, n not 8-aligned
        (16, 5, 8),
        (136, 10, 32),  # B crosses one lane-tile boundary
    ],
)
def test_prologue_t_matches_oracle(b, m, n):
    case = _random_case(b, m, n, seed=b + n)
    x, g, s_mem, y_mem, count, gamma, s_new, y_new, valid, done = case

    ref = jax.vmap(_prologue_xla_single)(*case)
    r_dir, r_alpha, r_dginit, r_s, r_y, r_cnt, r_gam = ref

    st = history_rows_to_t(s_mem, m, n)
    yt = history_rows_to_t(y_mem, m, n)
    out = prologue_t_pallas_batched(
        x, g, st, yt, count, gamma, s_new, y_new, valid, done,
        interpret=True,
    )
    t_dir, t_alpha, t_dginit, t_s, t_y, t_cnt, t_gam = out

    np.testing.assert_allclose(
        np.asarray(t_dir), np.asarray(r_dir), rtol=2e-5, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(t_alpha), np.asarray(r_alpha), rtol=2e-5, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(t_dginit), np.asarray(r_dginit), rtol=2e-5, atol=2e-5
    )
    np.testing.assert_array_equal(np.asarray(t_cnt), np.asarray(r_cnt))
    np.testing.assert_allclose(
        np.asarray(t_gam), np.asarray(r_gam), rtol=2e-6
    )
    np.testing.assert_allclose(
        np.asarray(history_t_to_rows(t_s, b, m, n)), np.asarray(r_s),
        rtol=1e-6, atol=1e-7,
    )
    np.testing.assert_allclose(
        np.asarray(history_t_to_rows(t_y, b, m, n)), np.asarray(r_y),
        rtol=1e-6, atol=1e-7,
    )


def test_done_lanes_frozen_bit_identical():
    """freeze_in_step contract: a done lane's history/count/gamma come back
    bit-identical from the transposed prologue."""
    b, m, n = 32, 6, 16
    case = _random_case(b, m, n, seed=7)
    x, g, s_mem, y_mem, count, gamma, s_new, y_new, valid, _ = case
    done = jnp.ones((b,), bool)

    st = history_rows_to_t(s_mem, m, n)
    yt = history_rows_to_t(y_mem, m, n)
    out = prologue_t_pallas_batched(
        x, g, st, yt, count, gamma, s_new, y_new, valid, done,
        interpret=True,
    )
    _, _, _, t_s, t_y, t_cnt, t_gam = out
    np.testing.assert_array_equal(np.asarray(t_s), np.asarray(st))
    np.testing.assert_array_equal(np.asarray(t_y), np.asarray(yt))
    np.testing.assert_array_equal(np.asarray(t_cnt), np.asarray(count))
    np.testing.assert_array_equal(np.asarray(t_gam), np.asarray(gamma))


def test_history_layout_roundtrip():
    b, m, n = 12, 4, 10
    rng = np.random.default_rng(3)
    hist = jnp.asarray(rng.standard_normal((b, m, n)).astype(np.float32))
    t = history_rows_to_t(hist, m, n)
    assert t.shape == (m * 16, 128)  # n8=16, B_pad=128
    back = history_t_to_rows(t, b, m, n)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(hist))
