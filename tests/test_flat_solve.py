"""Parity of the flat (trip-granular) batched L-BFGS solve.

ops/flat_solve.py re-expresses the nested fused iteration as one loop with
one mega-kernel per objective evaluation.  Its semantics must be the
nested path's exactly; floating-point drift at the last ulp (Mosaic vs XLA
op ordering) is tolerated only where it provably is drift:

* under a SHORT fixed iteration budget the trajectories must agree to
  near-bitwise tolerance (measured: bitwise through ~12 Rosenbrock
  iterations, ~1e-12 creep afterwards);
* full solves must agree on per-lane status and on aggregate
  nfev/iteration counts within a tight band.

Runs the kernel in interpret mode on the CPU backend; the real-TPU
lowering and end-to-end throughput path are covered by
tests_tpu/test_flat_solve_tpu.py.
"""

import jax
import jax.numpy as jnp
import numpy as np

from cppnumericalsolvers_tpu import minimize_batched, objective
from cppnumericalsolvers_tpu.core.progress import default_stopping
from cppnumericalsolvers_tpu.ops.flat_solve import flat_lbfgs_solve
from cppnumericalsolvers_tpu.solvers import Lbfgs


def rosen(x):
    e, o = x[0::2], x[1::2]
    return jnp.sum(100.0 * (o - e**2) ** 2 + (1.0 - e) ** 2)


OBJ = objective(rosen, mode="first")


def _flat(x0, stopping, m=10, max_fev=20):
    state0 = jax.vmap(lambda x: OBJ.evaluate(x, nfev=0))(x0)
    return flat_lbfgs_solve(
        OBJ, state0, stopping, m=m, max_fev=max_fev, interpret=True
    )


def test_short_budget_trajectory_is_exact():
    """Before float drift can accumulate, the flat loop must reproduce the
    nested path's trajectory essentially bitwise — this pins the semantics
    (push order, guards, ladder, trial formation), not just the outcome."""
    rng = np.random.default_rng(1)
    x0 = jnp.asarray(rng.uniform(-2, 2, (24, 20)))
    stopping = default_stopping(jnp.float64).replace(max_iterations=8)
    ref = minimize_batched(OBJ, x0, Lbfgs(), stopping)
    st, _, pr = _flat(x0, stopping)
    np.testing.assert_array_equal(
        np.asarray(pr.status), np.asarray(ref.progress.status)
    )
    np.testing.assert_array_equal(
        np.asarray(st.nfev), np.asarray(ref.state.nfev)
    )
    np.testing.assert_array_equal(
        np.asarray(pr.num_iterations),
        np.asarray(ref.progress.num_iterations),
    )
    np.testing.assert_allclose(
        np.asarray(st.x), np.asarray(ref.state.x), rtol=1e-12, atol=1e-12
    )


def test_full_solve_statuses_and_counts_match():
    rng = np.random.default_rng(2)
    x0 = jnp.asarray(rng.uniform(-2, 2, (16, 8)))
    stopping = default_stopping(jnp.float64)
    ref = minimize_batched(OBJ, x0, Lbfgs(), stopping)
    st, _, pr = _flat(x0, stopping)
    np.testing.assert_array_equal(
        np.asarray(pr.status), np.asarray(ref.progress.status)
    )
    # Aggregate counts agree within the drift band; per-lane counts can
    # differ by a few evaluations once ulp drift compounds.
    assert abs(
        float(np.asarray(st.nfev).mean())
        - float(np.asarray(ref.state.nfev).mean())
    ) < 3.0
    # Same convergence quality.
    np.testing.assert_allclose(
        np.asarray(st.value), np.asarray(ref.state.value), atol=1e-6
    )


def test_non_descent_start_aborts_like_nested():
    """A start at the optimum (zero gradient) exercises the non-descent
    abort: the search never evaluates, the x_delta test fires."""
    x0 = jnp.ones((8, 6), jnp.float64)  # Rosenbrock optimum
    stopping = default_stopping(jnp.float64)
    ref = minimize_batched(OBJ, x0, Lbfgs(), stopping)
    st, _, pr = _flat(x0, stopping)
    np.testing.assert_array_equal(
        np.asarray(pr.status), np.asarray(ref.progress.status)
    )
    np.testing.assert_array_equal(
        np.asarray(st.nfev), np.asarray(ref.state.nfev)
    )
    np.testing.assert_array_equal(np.asarray(st.x), np.asarray(x0))


def test_iteration_limit_respected():
    rng = np.random.default_rng(3)
    x0 = jnp.asarray(rng.uniform(-2, 2, (8, 10)))
    stopping = default_stopping(jnp.float64).replace(
        max_iterations=5, gradient_norm=0.0, x_delta=0.0, f_delta=0.0,
        past=0,
    )
    st, _, pr = _flat(x0, stopping)
    assert (np.asarray(pr.num_iterations) == 6).all()  # limit fires at >5
    assert (np.asarray(pr.status) == 1).all()  # ITERATION_LIMIT
