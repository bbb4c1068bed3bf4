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
    """Curvature-conditioned random histories: y = s + 0.3*noise keeps
    s.y ~ |s|^2 bounded away from zero, so rho = 1/(s.y) cannot amplify f32
    rounding into the comparison (independent random (s, y) produce
    near-cancelling s.y with |rho| up to 1e4 and turn the oracle check into
    a test of float noise instead of lowering).  A sprinkle of near-zero-y
    rows still exercises the |s.y| < eps usability mask."""
    rng = np.random.default_rng(seed)
    g = rng.standard_normal((b, n)).astype(dtype)
    s = rng.standard_normal((b, m, n)).astype(dtype) * 0.1
    y = (s + 0.3 * rng.standard_normal((b, m, n)) * 0.1).astype(dtype)
    # A few rows with ~zero y: denom below eps => masked unusable.
    y[rng.random((b, m)) < 0.1] = 0.0
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
    # Pallas (unrolled) and XLA (fori_loop) accumulate in different
    # orders; with conditioned histories (bounded rho) f32 agreement is
    # ~1e-5 relative.  Real lowering bugs (masking/indexing) are O(1).
    np.testing.assert_allclose(out_pallas, oracle, rtol=2e-4, atol=2e-5)


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


def _random_fused_case(b, m, n, seed, dtype=np.float32):
    g, s, y, count, gamma = _random_case(b, m, n, seed, dtype)
    rng = np.random.default_rng(seed + 1)
    s_new = (rng.standard_normal((b, n)) * 0.1).astype(dtype)
    # Conditioned like the history rows (bounded rho for accepted pairs);
    # negate some so the curvature gate rejects them.
    y_new = (s_new + 0.3 * rng.standard_normal((b, n)) * 0.1).astype(dtype)
    y_new[rng.random(b) < 0.3] *= -1.0
    valid = rng.random(b) < 0.8
    # Zero pending pair on a couple of lanes (first-iteration no-op case).
    s_new[:2] = 0.0
    y_new[:2] = 0.0
    return g, s, y, count, gamma, s_new, y_new, valid


@requires_tpu
@pytest.mark.parametrize(
    "b,m,n", [(8, 5, 4), (64, 10, 32), (128, 10, 33), (256, 10, 256)]
)
def test_fused_push_two_loop_matches_xla_oracle_on_tpu(b, m, n):
    """The fused push+direction kernel's real Mosaic lowering vs the
    composed XLA oracle — per-lane divergent counts, accepts, validity."""
    from cppnumericalsolvers_tpu.ops.two_loop import (
        push_history_xla,
        push_two_loop_pallas_batched,
    )

    args = _random_fused_case(b, m, n, seed=b + n)
    jargs = [jnp.asarray(a) for a in args]

    got = push_two_loop_pallas_batched(*jargs, interpret=False)

    def one(g, s, y, c, ga, sn, yn, v):
        s2, y2, c2, ga2 = push_history_xla(s, y, c, ga, sn, yn, v)
        d = two_loop_direction_xla(g, s2, y2, c2, ga2, None)
        return d, s2, y2, c2, ga2

    want = jax.jit(jax.vmap(one))(*jargs)
    names = ("direction", "s_memory", "y_memory", "count", "gamma")
    for w, g_, name in zip(want, got, names):
        # Direction: f32 accumulation-order tolerance (see the two-loop
        # oracle test above); state outputs are exact copies/selects.
        rtol = 2e-4 if name == "direction" else 2e-5
        np.testing.assert_allclose(
            np.asarray(g_), np.asarray(w), rtol=rtol, atol=2e-5, err_msg=name
        )


@requires_tpu
def test_pallas_adversarial_large_rho_absolute_oracle():
    """Near-cancelling s.y histories (|rho| up to ~1e4) on the REAL chip
    against a float64 oracle (advisor round-2): the conditioned cases above
    bound rho to keep the f32-vs-f32 comparison meaningful, which also
    means the large-rho cancellation path never lowers on hardware.  Here
    independent random (s, y) produce adversarial rho; correctness is
    checked against the f64 XLA oracle with an ABSOLUTE tolerance scaled to
    the f32 rounding the cancellation amplifies — lowering bugs
    (masking/indexing) remain O(|q|) ~ 1e2 errors, far above it."""
    b, m, n = 64, 10, 32
    rng = np.random.default_rng(99)
    g = rng.standard_normal((b, n)).astype(np.float32)
    s = rng.standard_normal((b, m, n)).astype(np.float32) * 0.1
    y = rng.standard_normal((b, m, n)).astype(np.float32) * 0.1  # independent
    count = np.full((b,), m, np.int32)
    gamma = np.ones((b,), np.float32)

    out_pallas = np.asarray(
        two_loop_pallas_batched(
            jnp.asarray(g), jnp.asarray(s), jnp.asarray(y),
            jnp.asarray(count), jnp.asarray(gamma), interpret=False,
        )
    )
    oracle64 = np.asarray(
        jax.jit(
            jax.vmap(
                lambda gg, ss, yy, cc, gam: two_loop_direction_xla(
                    gg, ss, yy, cc, gam, None
                )
            )
        )(
            jnp.asarray(g, jnp.float64), jnp.asarray(s, jnp.float64),
            jnp.asarray(y, jnp.float64), jnp.asarray(count),
            jnp.asarray(gamma, jnp.float64),
        )
    )
    # rho ~ 1/(s.y) with s.y ~ N(0, 0.01/sqrt(n)-ish): amplification of f32
    # eps through 2m sequential updates stays under ~1e-1 absolute for unit
    # inputs; assert with headroom while still catching O(1) mis-maskings.
    scale = np.maximum(1.0, np.abs(oracle64))
    err = np.abs(out_pallas - oracle64) / scale
    assert np.percentile(err, 99) < 0.05, np.percentile(err, 99)
    assert err.max() < 0.5, err.max()
