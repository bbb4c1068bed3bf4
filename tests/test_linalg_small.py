"""Unit tests for the unrolled Gauss-Jordan helpers (utils/linalg.py).

These replace XLA's batched small-LU custom calls in the L-BFGS-B hot path
(round 5); correctness is pinned against numpy's LAPACK-backed solves,
including permutation-heavy and near-singular systems where an unpivoted
elimination would fail.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cppnumericalsolvers_tpu.utils.linalg import invert_small, solve_small


@pytest.mark.parametrize("k", [1, 2, 5, 10, 20])
def test_solve_matches_numpy(k):
    rng = np.random.default_rng(k)
    a = rng.standard_normal((k, k))
    b = rng.standard_normal((k,))
    got = np.asarray(solve_small(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, np.linalg.solve(a, b), rtol=1e-9,
                               atol=1e-10)


def test_solve_needs_pivoting():
    # Zero leading pivot: unpivoted elimination would divide by zero.
    a = np.array([[0.0, 1.0], [1.0, 0.0]])
    b = np.array([2.0, 3.0])
    got = np.asarray(solve_small(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, [3.0, 2.0], atol=1e-12)


def test_solve_multi_rhs_and_inverse():
    rng = np.random.default_rng(3)
    a = rng.standard_normal((8, 8)) + 4.0 * np.eye(8)
    b = rng.standard_normal((8, 3))
    got = np.asarray(solve_small(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, np.linalg.solve(a, b), rtol=1e-9,
                               atol=1e-10)
    inv = np.asarray(invert_small(jnp.asarray(a)))
    np.testing.assert_allclose(inv, np.linalg.inv(a), rtol=1e-9, atol=1e-10)


def test_vmapped_batch():
    rng = np.random.default_rng(4)
    a = rng.standard_normal((16, 6, 6)) + 3.0 * np.eye(6)
    b = rng.standard_normal((16, 6))
    got = np.asarray(jax.vmap(solve_small)(jnp.asarray(a), jnp.asarray(b)))
    want = np.stack([np.linalg.solve(ai, bi) for ai, bi in zip(a, b)])
    np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-9)


def test_singular_propagates_nonfinite():
    a = jnp.zeros((3, 3))
    got = np.asarray(solve_small(a, jnp.ones((3,))))
    assert not np.isfinite(got).all()
