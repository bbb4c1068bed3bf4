"""Real-TPU compile + solve of the batched augmented-Lagrangian outer loop.

Regression guard: the progress machine's plateau ring buffer originally used
dynamic-index gather/scatter (``ring[pos]`` / ``ring.at[pos].set``); under
``vmap`` inside the AL outer while_loop the resulting gather+select pattern
crashed the TPU XLA pipeline with an algebraic-simplifier CHECK ("A cycle is
detected while visiting instruction ... broadcast(select_n)"), killing the
compile helper.  core/progress.py now uses one-hot masked selects; this test
pins that the full nested solve (AL outer loop -> L-BFGS inner while_loop ->
line search) compiles AND converges on the chip.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cppnumericalsolvers_tpu import ConstrainedProblem, objective
from cppnumericalsolvers_tpu.solvers import AugmentedLagrangian, Lbfgs

requires_tpu = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="needs a real TPU chip"
)


@requires_tpu
def test_batched_al_compiles_and_converges_on_tpu():
    # min sum((x-1)^2)  s.t.  sum(x) = 1  ->  x* = 1/n (n=4: 0.25 each).
    problem = ConstrainedProblem(
        objective=objective(
            lambda x: jnp.sum((x - 1.0) ** 2).astype(x.dtype), mode="first"
        ),
        equality_constraints=(
            objective(lambda x: jnp.sum(x) - 1.0, mode="first"),
        ),
    )
    al = AugmentedLagrangian(inner_solver=Lbfgs(m=5, two_loop_impl="xla"))
    rng = np.random.default_rng(1)
    x0 = jnp.asarray(rng.uniform(-1.0, 1.0, size=(16, 4)).astype(np.float32))
    result = jax.jit(lambda xb: al.minimize_batched(problem, xb))(x0)
    x = np.asarray(jax.block_until_ready(result.state.x))
    np.testing.assert_allclose(x, 0.25, atol=5e-3)
    assert np.asarray(result.state.max_violation).max() < 1e-3
