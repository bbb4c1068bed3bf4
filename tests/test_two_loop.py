"""Two-loop recursion op: XLA reference vs. batched Pallas kernel.

Validates the chronological-layout redesign (ops/two_loop.py) against a
straightforward dense-matrix oracle: with history pairs (s_i, y_i) the
two-loop result must equal H_k^{-1} g for the explicitly-accumulated inverse
Hessian (Nocedal & Wright Alg. 7.4 <-> eq. 7.16).  The Pallas kernel runs in
interpreter mode on the CPU backend.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cppnumericalsolvers_tpu.ops.two_loop import (
    two_loop_direction,
    two_loop_direction_xla,
    two_loop_pallas_batched,
)


def _dense_inverse_hessian(s_list, y_list, gamma, n):
    h = gamma * np.eye(n)
    for s, y in zip(s_list, y_list):
        rho = 1.0 / (s @ y)
        v = np.eye(n) - rho * np.outer(y, s)  # V_k, N&W eq. 7.18
        h = v.T @ h @ v + rho * np.outer(s, s)  # H_{k+1} = V^T H V + rho s s^T
    return h


def _random_history(rng, m, count, n):
    s_mem = np.zeros((m, n))
    y_mem = np.zeros((m, n))
    pairs = []
    for i in range(count):
        s = rng.normal(size=n)
        y = rng.normal(size=n)
        if s @ y < 0:  # curvature condition holds for accepted pairs
            y = -y
        s_mem[i] = s
        y_mem[i] = y
        pairs.append((s, y))
    return s_mem, y_mem, pairs


@pytest.mark.parametrize("count", [0, 1, 3, 5])
def test_xla_matches_dense_oracle(count):
    rng = np.random.default_rng(count)
    m, n = 5, 7
    s_mem, y_mem, pairs = _random_history(rng, m, count, n)
    g = rng.normal(size=n)
    gamma = 0.7
    got = two_loop_direction_xla(
        jnp.asarray(g),
        jnp.asarray(s_mem),
        jnp.asarray(y_mem),
        jnp.int32(count),
        jnp.float64(gamma),
    )
    h = _dense_inverse_hessian(
        [p[0] for p in pairs], [p[1] for p in pairs], gamma, n
    )
    np.testing.assert_allclose(np.asarray(got), h @ g, rtol=1e-10)


def test_pallas_matches_xla_batched():
    rng = np.random.default_rng(42)
    b, m, n = 13, 6, 37  # deliberately unaligned: exercises padding
    counts = rng.integers(0, m + 1, size=b)
    s_mem = np.zeros((b, m, n))
    y_mem = np.zeros((b, m, n))
    for lane in range(b):
        s_mem[lane], y_mem[lane], _ = _random_history(
            rng, m, counts[lane], n
        )
    g = rng.normal(size=(b, n))
    gamma = rng.uniform(0.5, 2.0, size=b)

    want = jax.vmap(
        lambda gr, s, y, c, ga: two_loop_direction_xla(gr, s, y, c, ga, None)
    )(
        jnp.asarray(g),
        jnp.asarray(s_mem),
        jnp.asarray(y_mem),
        jnp.asarray(counts, jnp.int32),
        jnp.asarray(gamma),
    )
    got = two_loop_pallas_batched(
        jnp.asarray(g),
        jnp.asarray(s_mem),
        jnp.asarray(y_mem),
        jnp.asarray(counts, jnp.int32),
        jnp.asarray(gamma),
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-12)


def test_custom_vmap_dispatch_matches_single():
    """vmap of the public op must agree with per-instance calls (the CPU
    backend takes the vmapped-XLA path; on TPU the same test covers the
    Pallas dispatch)."""
    rng = np.random.default_rng(3)
    b, m, n = 4, 3, 5
    counts = np.array([0, 1, 2, 3], np.int32)
    s_mem = rng.normal(size=(b, m, n))
    y_mem = np.abs(rng.normal(size=(b, m, n))) + 0.1
    # Make curvature positive: y := s + positive noise => s.y > 0
    y_mem = s_mem + np.abs(rng.normal(size=(b, m, n)))
    g = rng.normal(size=(b, n))
    gamma = np.ones(b)

    args = (
        jnp.asarray(g),
        jnp.asarray(s_mem),
        jnp.asarray(y_mem),
        jnp.asarray(counts),
        jnp.asarray(gamma),
    )
    batched = jax.vmap(two_loop_direction)(*args)
    single = jnp.stack(
        [
            two_loop_direction(
                args[0][i], args[1][i], args[2][i], args[3][i], args[4][i]
            )
            for i in range(b)
        ]
    )
    np.testing.assert_allclose(
        np.asarray(batched), np.asarray(single), rtol=1e-12
    )


def _random_push_case(seed, b, m, n):
    """Batched fused push+two-loop inputs covering accept/reject/full/empty."""
    rng = np.random.default_rng(seed)
    counts = rng.integers(0, m + 1, size=b)
    s_mem = np.zeros((b, m, n))
    y_mem = np.zeros((b, m, n))
    for lane in range(b):
        s_mem[lane], y_mem[lane], _ = _random_history(rng, m, counts[lane], n)
    g = rng.normal(size=(b, n))
    gamma = rng.uniform(0.5, 2.0, size=b)
    s_new = rng.normal(size=(b, n))
    y_new = rng.normal(size=(b, n))
    # Mix curvature signs so some lanes reject the pair; mix validity too.
    flip = rng.random(b) < 0.5
    y_new[flip] = -np.sign(np.einsum("bn,bn->b", s_new, y_new))[
        flip, None
    ] * y_new[flip]
    valid = rng.random(b) < 0.8
    # A few lanes push a zero pair (the first-iteration no-op case).
    s_new[:2] = 0.0
    y_new[:2] = 0.0
    return (
        jnp.asarray(g),
        jnp.asarray(s_mem),
        jnp.asarray(y_mem),
        jnp.asarray(counts, jnp.int32),
        jnp.asarray(gamma),
        jnp.asarray(s_new),
        jnp.asarray(y_new),
        jnp.asarray(valid),
    )


def test_fused_push_two_loop_pallas_matches_xla():
    """The fused push+direction Pallas kernel against the composed XLA
    oracle (push_history_xla + two_loop_direction_xla), per-lane divergent
    counts/accepts, unaligned shapes, interpret mode."""
    from cppnumericalsolvers_tpu.ops.two_loop import (
        push_history_xla,
        push_two_loop_pallas_batched,
    )

    args = _random_push_case(7, b=11, m=6, n=37)

    def one(g, s, y, c, ga, sn, yn, v):
        s2, y2, c2, ga2 = push_history_xla(s, y, c, ga, sn, yn, v)
        d = two_loop_direction_xla(g, s2, y2, c2, ga2, None)
        return d, s2, y2, c2, ga2

    want = jax.vmap(one)(*args)
    got = push_two_loop_pallas_batched(*args, interpret=True)
    for w, g_, name in zip(
        want, got, ("direction", "s_memory", "y_memory", "count", "gamma")
    ):
        np.testing.assert_allclose(
            np.asarray(g_), np.asarray(w), rtol=1e-12, err_msg=name
        )


def test_fused_op_custom_vmap_matches_single():
    """vmap of the public fused op agrees with per-instance calls."""
    from cppnumericalsolvers_tpu.ops.two_loop import lbfgs_push_and_direction

    args = _random_push_case(11, b=5, m=4, n=9)
    batched = jax.vmap(lbfgs_push_and_direction)(*args)
    for i in range(5):
        single = lbfgs_push_and_direction(*[a[i] for a in args])
        for bo, so, name in zip(
            batched, single, ("direction", "s_memory", "y_memory", "count", "gamma")
        ):
            np.testing.assert_allclose(
                np.asarray(bo[i]), np.asarray(so), rtol=1e-12, err_msg=name
            )


def test_compact_form_matches_sequential_interpret():
    """The compact (Gram-matrix) two-loop form is disabled by default on
    current hardware (COMPACT_N_MAX=0 — measured slower end-to-end on v5e,
    see ops/two_loop.py) but stays parity-pinned so it remains a valid
    drop-in if a future chip shifts the issue-rate/bandwidth balance."""
    import numpy as np

    from cppnumericalsolvers_tpu.ops.two_loop import (
        push_two_loop_pallas_batched,
    )

    rng = np.random.default_rng(5)
    b, m, n = 16, 7, 24
    g = jnp.asarray(rng.standard_normal((b, n)).astype(np.float32))
    s = jnp.asarray(rng.standard_normal((b, m, n)).astype(np.float32) * 0.1)
    y = jnp.asarray(s + 0.05 * rng.standard_normal((b, m, n)).astype(np.float32))
    count = jnp.asarray(rng.integers(0, m + 1, (b,)).astype(np.int32))
    gamma = jnp.asarray(rng.uniform(0.5, 2.0, (b,)).astype(np.float32))
    sn = jnp.asarray(rng.standard_normal((b, n)).astype(np.float32) * 0.1)
    yn = jnp.asarray(sn + 0.05 * rng.standard_normal((b, n)).astype(np.float32))
    valid = jnp.asarray(rng.integers(0, 2, (b,)).astype(bool))

    seq = push_two_loop_pallas_batched(
        g, s, y, count, gamma, sn, yn, valid, interpret=True, compact=False
    )
    cmp_ = push_two_loop_pallas_batched(
        g, s, y, count, gamma, sn, yn, valid, interpret=True, compact=True
    )
    for i, (a, c) in enumerate(zip(seq, cmp_)):
        np.testing.assert_allclose(
            np.asarray(c), np.asarray(a), rtol=2e-5, atol=2e-5,
            err_msg=f"output {i}",
        )
