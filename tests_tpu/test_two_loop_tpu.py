"""Real-TPU Pallas correctness: the fused two-loop kernel's actual Mosaic
lowering (interpret=False) against the XLA oracle.

tests/test_two_loop.py exercises the kernel only in interpret mode (the CPU
backend cannot lower Mosaic); a mis-lowering there would surface solely as a
perf-JSON anomaly.  This test runs the REAL kernel on the chip so lowering
bugs fail a test instead (VERDICT.md round-1 item 7).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cppnumericalsolvers_tpu.ops.two_loop import (
    two_loop_direction_xla,
    two_loop_pallas_batched,
)

requires_tpu = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="needs a real TPU chip"
)


def _random_case(b, m, n, seed, dtype=np.float32):
    rng = np.random.default_rng(seed)
    g = rng.standard_normal((b, n)).astype(dtype)
    s = rng.standard_normal((b, m, n)).astype(dtype) * 0.1
    y = rng.standard_normal((b, m, n)).astype(dtype) * 0.1
    # Mixed history fill levels, incl. empty and full lanes.
    count = rng.integers(0, m + 1, size=(b,)).astype(np.int32)
    count[0] = 0
    count[-1] = m
    # Zero out invalid (>= count) rows like the solver's buffers.
    for i in range(b):
        s[i, count[i]:] = 0.0
        y[i, count[i]:] = 0.0
    gamma = (0.5 + rng.random(b)).astype(dtype)
    return g, s, y, count, gamma


@requires_tpu
@pytest.mark.parametrize(
    "b,m,n", [(8, 5, 4), (64, 10, 32), (128, 10, 33), (256, 10, 256)]
)
def test_pallas_matches_xla_oracle_on_tpu(b, m, n):
    g, s, y, count, gamma = _random_case(b, m, n, seed=b + n)
    out_pallas = np.asarray(
        two_loop_pallas_batched(
            jnp.asarray(g), jnp.asarray(s), jnp.asarray(y),
            jnp.asarray(count), jnp.asarray(gamma), interpret=False,
        )
    )
    oracle = np.asarray(
        jax.jit(
            jax.vmap(
                lambda gg, ss, yy, cc, gam: two_loop_direction_xla(
                    gg, ss, yy, cc, gam, None
                )
            )
        )(
            jnp.asarray(g), jnp.asarray(s), jnp.asarray(y),
            jnp.asarray(count), jnp.asarray(gamma),
        )
    )
    np.testing.assert_allclose(out_pallas, oracle, rtol=2e-5, atol=2e-5)


@requires_tpu
def test_pallas_zero_history_is_gamma_scaled_gradient():
    b, m, n = 16, 10, 8
    rng = np.random.default_rng(3)
    g = rng.standard_normal((b, n)).astype(np.float32)
    s = np.zeros((b, m, n), np.float32)
    y = np.zeros((b, m, n), np.float32)
    count = np.zeros((b,), np.int32)
    gamma = np.full((b,), 2.5, np.float32)
    out = np.asarray(
        two_loop_pallas_batched(
            jnp.asarray(g), jnp.asarray(s), jnp.asarray(y),
            jnp.asarray(count), jnp.asarray(gamma), interpret=False,
        )
    )
    np.testing.assert_allclose(out, 2.5 * g, rtol=1e-6)
