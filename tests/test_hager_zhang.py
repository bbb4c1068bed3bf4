"""Hager-Zhang line-search unit tests.

Port of the reference's HZ suite (reference: src/test/hager_zhang_test.cc):
1-D analytic functions embedded as 1-vectors with a unit direction so alpha
directly indexes phi(alpha)."""

import math

import jax
import jax.numpy as jnp
import pytest

from cppnumericalsolvers_tpu.linesearch.hager_zhang import hager_zhang


def run_search(fn, x0, alpha_init):
    vag = jax.value_and_grad(fn)
    x = jnp.array([x0], dtype=jnp.float64)
    f0, g0 = vag(x)
    s = jnp.array([1.0], dtype=jnp.float64)
    res = hager_zhang(vag, x, f0, g0, s, alpha_init)
    return float(res.alpha), float(res.f)


def test_convex_quadratic_minimum():
    # phi(a) = a^2 - 2a, exact minimiser a=1 (hager_zhang_test.cc:102-108).
    alpha, f_at = run_search(lambda x: x[0] ** 2 - 2.0 * x[0], 0.0, 1.0)
    assert alpha == pytest.approx(1.0, abs=1e-6)
    assert f_at == pytest.approx(-1.0, abs=1e-6)


def test_cubic_local_minimum():
    # phi(a) = a^3 - 3a + 2, local min at a=1 (:113-118).
    alpha, f_at = run_search(
        lambda x: x[0] ** 3 - 3.0 * x[0] + 2.0, 0.0, 1.0
    )
    assert alpha == pytest.approx(1.0, abs=1e-6)
    assert f_at == pytest.approx(0.0, abs=1e-6)


def test_ill_scaled_quadratic_stays_bounded():
    # phi(a) = 1e6 (a - 0.5)^2 (:124-134).
    alpha, f_at = run_search(
        lambda x: 1e6 * x[0] ** 2 - 1e6 * x[0] + 2.5e5, 0.0, 1.0
    )
    assert alpha == pytest.approx(0.5, abs=1e-6)
    assert f_at == pytest.approx(0.0, abs=1e-3)
    assert 0.0 < alpha < 1.0


def test_flat_region_terminates_on_curvature():
    # phi(a) = 1e-8 a + a^4 (:143-151).  Note dphi(0) = +1e-8 > 0: the
    # no-descent guard fires and the search returns immediately with the
    # initial step width and the start state — exactly the reference's
    # observable behaviour on this fixture.
    alpha, f_at = run_search(
        lambda x: 1e-8 * x[0] + x[0] ** 4, 0.0, 1.0
    )
    assert alpha > 0.0
    assert math.isfinite(alpha)
    assert f_at <= 0.0


def test_non_descent_returns_start():
    # MoreThuente-compatible no-descent guard (hager_zhang.h:301-302).
    vag = jax.value_and_grad(lambda x: x[0] ** 2)
    x = jnp.array([1.0], dtype=jnp.float64)
    f0, g0 = vag(x)
    s = jnp.array([1.0], dtype=jnp.float64)  # ascent at x=1
    res = hager_zhang(vag, x, f0, g0, s, 1.0)
    assert not bool(res.ok)
    assert float(res.alpha) == 1.0  # alpha_init untouched, like the C++
    assert float(res.f) == pytest.approx(1.0)


def test_nfev_parity_no_extra_eval():
    """nfev matches the reference's workspace-threading exactly
    (hager_zhang.h:444-455): an immediately-Wolfe-acceptable initial trial
    costs ONE evaluation — rounds 2-3 paid a disclosed +1 re-evaluation at
    the accepted step, removed in round 4 by carrying the accepted sample's
    (f, g) through the loop state."""
    vag = jax.value_and_grad(lambda x: x[0] ** 2 - 2.0 * x[0])
    x = jnp.array([0.0], dtype=jnp.float64)
    f0, g0 = vag(x)
    s = jnp.array([1.0], dtype=jnp.float64)
    res = hager_zhang(vag, x, f0, g0, s, 1.0)
    assert bool(res.ok)
    assert int(res.nfev) == 1  # the initial trial IS the accepted sample


@pytest.mark.parametrize(
    "fn,alpha_init",
    [
        (lambda x: x[0] ** 2 - 2.0 * x[0], 0.1),
        (lambda x: x[0] ** 3 - 3.0 * x[0] + 2.0, 3.0),
        (lambda x: 1e6 * x[0] ** 2 - 1e6 * x[0] + 2.5e5, 1.0),
    ],
)
def test_accepted_state_is_own_evaluation(fn, alpha_init):
    """Populated-state invariant without re-evaluation: the returned (f, g)
    are bit-identical to evaluating at the returned x (they ARE that
    evaluation, threaded through the carry)."""
    vag = jax.value_and_grad(fn)
    x = jnp.array([0.0], dtype=jnp.float64)
    f0, g0 = vag(x)
    s = jnp.array([1.0], dtype=jnp.float64)
    res = hager_zhang(vag, x, f0, g0, s, alpha_init)
    assert bool(res.ok)
    f_chk, g_chk = vag(res.x)
    assert float(res.f) == float(f_chk)
    assert float(res.g[0]) == float(g_chk[0])
