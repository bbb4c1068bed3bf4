"""End-to-end L-BFGS convergence tests.

Mirrors the reference's solver convergence matrix for L-BFGS
(reference: src/test/verify.cc:117-191) plus the README quick-start check
(Dockerfile.test main.cpp asserts) and a vmapped batch solve.
"""

import jax
import jax.numpy as jnp
import numpy as np

from cppnumericalsolvers_tpu import (
    Status,
    minimize,
    minimize_batched,
)
from cppnumericalsolvers_tpu.models import (
    quickstart_quadratic,
    rosenbrock,
    extended_rosenbrock,
)
from cppnumericalsolvers_tpu.solvers import Lbfgs

PRECISION = 1e-4  # verify.cc's acceptance tolerance on f(x*)


def test_quickstart_quadratic():
    obj = quickstart_quadratic()
    res = minimize(obj, jnp.array([-10.0, 2.0]), Lbfgs())
    assert float(res.state.value) - 5.0 < PRECISION
    np.testing.assert_allclose(np.asarray(res.state.x), [0.0, 0.0], atol=1e-3)
    assert int(res.progress.status) != int(Status.ITERATION_LIMIT)


def test_rosenbrock_far_start():
    # "Far" start (15, 8) from verify.cc:168-183.
    res = minimize(rosenbrock(), jnp.array([15.0, 8.0]), Lbfgs())
    assert float(res.state.value) < PRECISION
    assert int(res.progress.status) != int(Status.ITERATION_LIMIT)


def test_rosenbrock_near_start():
    # "Near" start (-1, 2).
    res = minimize(rosenbrock(), jnp.array([-1.0, 2.0]), Lbfgs())
    assert float(res.state.value) < PRECISION


def test_rosenbrock_jit():
    solve = jax.jit(
        lambda x0: minimize(rosenbrock(), x0, Lbfgs()),
    )
    res = solve(jnp.array([15.0, 8.0]))
    assert float(res.state.value) < PRECISION


def test_extended_rosenbrock_10d():
    x0 = jnp.full((10,), -1.2).at[1::2].set(1.0)
    res = minimize(extended_rosenbrock(), x0, Lbfgs())
    assert float(res.state.value) < PRECISION


def test_nfev_is_tracked():
    res = minimize(rosenbrock(), jnp.array([-1.0, 2.0]), Lbfgs())
    # At least one eval per iteration plus the initial one.
    assert int(res.state.nfev) > int(res.progress.num_iterations)
    assert int(res.state.nfev) < 10000


def test_batched_rosenbrock():
    # A batch of different starts solved in one vmapped program; per-instance
    # status/nfev come back as vectors.
    key = jax.random.PRNGKey(0)
    x0 = jax.random.uniform(key, (32, 2), minval=-2.0, maxval=2.0)
    res = minimize_batched(rosenbrock(), x0, Lbfgs())
    values = np.asarray(res.state.value)
    assert (values < PRECISION).all()
    statuses = np.asarray(res.progress.status)
    assert (statuses != int(Status.ITERATION_LIMIT)).all()
    assert res.state.nfev.shape == (32,)


def test_batched_matches_single():
    # Lane freezing must keep batched solves equivalent to sequential single
    # solves.  Bitwise trajectory equality is not expected — vmapped
    # reductions reorder floating-point sums — so compare to a tolerance well
    # below the stopping thresholds.
    starts = jnp.array([[15.0, 8.0], [-1.0, 2.0], [0.5, 0.5]])
    batched = minimize_batched(rosenbrock(), starts, Lbfgs())
    for i in range(starts.shape[0]):
        single = minimize(rosenbrock(), starts[i], Lbfgs())
        np.testing.assert_allclose(
            np.asarray(batched.state.x[i]), np.asarray(single.state.x),
            atol=1e-6,
        )
        assert int(batched.progress.status[i]) == int(single.progress.status)
        # nfev may drift by a couple of evals when the last line search takes
        # a different interpolation branch at the noise floor.
        assert abs(int(batched.state.nfev[i]) - int(single.state.nfev)) <= 5


def test_frozen_lane_metrics_exact():
    """A lane that converges early must freeze EXACTLY: its iteration count
    and nfev are those of its own single solve even while other lanes keep
    the batch loop running for many more iterations (the freeze_in_step
    contract, core/driver.py — a leaky freeze burns ~20 evals per extra
    iteration in dead line searches and corrupts per-instance metrics)."""
    starts = jnp.array([[-0.5, 0.3], [15.0, 8.0]])  # quick lane + far lane
    batched = minimize_batched(rosenbrock(), starts, Lbfgs())
    for i in range(2):
        single = minimize(rosenbrock(), starts[i], Lbfgs())
        assert int(batched.progress.num_iterations[i]) == int(
            single.progress.num_iterations
        ), i
        assert int(batched.state.nfev[i]) == int(single.state.nfev), i
        np.testing.assert_allclose(
            np.asarray(batched.state.x[i]),
            np.asarray(single.state.x),
            rtol=0,
            atol=1e-12,
        )
