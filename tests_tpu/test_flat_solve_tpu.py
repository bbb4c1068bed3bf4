"""Real-TPU lowering of the flat trip-granular solve (ops/flat_solve.py):
the default batched Lbfgs path at small/mid n.  End-to-end parity with the
pure-XLA lowering on the chip: statuses exactly, aggregate counts within
the float-drift band, convergence quality equal."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

requires_tpu = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="needs a real TPU chip"
)


@requires_tpu
@pytest.mark.parametrize("n", [32, 200])
def test_flat_solve_matches_generic_on_tpu(n):
    from cppnumericalsolvers_tpu import minimize_batched, objective
    from cppnumericalsolvers_tpu.solvers import Lbfgs

    def rosen(x):
        e, o = x[0::2], x[1::2]
        return jnp.sum(100.0 * (o - e**2) ** 2 + (1.0 - e) ** 2)

    obj = objective(rosen, mode="first")
    rng = np.random.default_rng(n)
    x0 = jnp.asarray(rng.uniform(-2, 2, (256, n)).astype(np.float32))
    rn = minimize_batched(obj, x0, Lbfgs())  # flat path (n <= _FLAT_N_MAX)
    rx = minimize_batched(obj, x0, Lbfgs(two_loop_impl="xla"))
    np.testing.assert_array_equal(
        np.asarray(rn.progress.status), np.asarray(rx.progress.status)
    )
    nn = np.asarray(rn.state.nfev, np.float64)
    nx = np.asarray(rx.state.nfev, np.float64)
    assert abs(nn.mean() - nx.mean()) < 0.05 * nx.mean()
    # Convergence quality parity: same number of lanes at the optimum.
    fn = np.asarray(rn.state.value)
    fx = np.asarray(rx.state.value)
    assert abs((fn < 1e-4).mean() - (fx < 1e-4).mean()) < 0.06


@requires_tpu
def test_flat_short_budget_exact_on_tpu():
    """Fixed short budget: trajectory parity before drift accumulates —
    the real-lowering analog of tests/test_flat_solve.py's exactness pin.
    f32 on-chip drifts faster than f64 interpret mode, so the budget is
    shorter and x-tolerance looser, but counts must be exact."""
    from cppnumericalsolvers_tpu import minimize_batched, objective
    from cppnumericalsolvers_tpu.core.progress import default_stopping
    from cppnumericalsolvers_tpu.solvers import Lbfgs

    def sphere_ill(x):
        scale = 1.0 + jnp.arange(x.shape[-1], dtype=x.dtype)
        return jnp.sum(scale * x * x)

    obj = objective(sphere_ill, mode="first")
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.uniform(-2, 2, (128, 40)).astype(np.float32))
    stopping = default_stopping(jnp.float32).replace(max_iterations=6)
    rn = minimize_batched(obj, x0, Lbfgs(), stopping)
    rx = minimize_batched(obj, x0, Lbfgs(two_loop_impl="xla"), stopping)
    np.testing.assert_array_equal(
        np.asarray(rn.state.nfev), np.asarray(rx.state.nfev)
    )
    np.testing.assert_array_equal(
        np.asarray(rn.progress.num_iterations),
        np.asarray(rx.progress.num_iterations),
    )
    np.testing.assert_allclose(
        np.asarray(rn.state.x), np.asarray(rx.state.x), rtol=2e-4, atol=2e-4
    )
