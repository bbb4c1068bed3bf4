"""Done-lane freeze contract — the invariant the batch-native loop rests on.

``core.driver._solve_loop_batched`` runs ONE while_loop over batched carries
instead of vmapping the whole loop; that removed the while-batching rule's
implicit masking, so correctness of finished lanes now rests entirely on
``_make_body`` being self-freezing: applying the body to a carry whose lane
has a terminal status must return that lane's ENTIRE carry bit-identical
(state, solver internals, progress).  This test pins the contract for every
solver so a future solver with a buggy freeze cannot silently corrupt
converged lanes (advisor round-3).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cppnumericalsolvers_tpu import objective
from cppnumericalsolvers_tpu.core.driver import _make_body
from cppnumericalsolvers_tpu.core.progress import init_progress
from cppnumericalsolvers_tpu.core.status import Status
from cppnumericalsolvers_tpu.solvers import (
    Bfgs,
    ConjugateGradientDescent,
    GradientDescent,
    Lbfgs,
    Lbfgsb,
    NelderMead,
    NewtonDescent,
    TrustRegionNewton,
)

B, N = 8, 4


def _quad(x):
    return jnp.sum(5.0 * x[0::2] ** 2 + 100.0 * x[1::2] ** 2) + 5.0


SOLVERS = [
    Lbfgs(m=5),
    Lbfgs(m=5, two_loop_impl="xla"),
    Lbfgsb(m=5, lower=-10.0, upper=10.0),
    Bfgs(),
    GradientDescent(),
    ConjugateGradientDescent(),
    NewtonDescent(),
    TrustRegionNewton(),
    NelderMead(),
]


@pytest.mark.parametrize(
    "solver", SOLVERS, ids=lambda s: f"{type(s).__name__}:{getattr(s, 'two_loop_impl', '')}"
)
def test_done_lane_carry_bit_identical(solver):
    mode = "second" if solver.mode == "second" else "first"
    obj = objective(_quad, mode=mode)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.uniform(-2.0, 2.0, (B, N)))
    stopping = solver.default_stopping(x0.dtype)
    body = jax.vmap(_make_body(obj, solver, stopping, None, False))

    state = jax.vmap(lambda x: obj.evaluate(x, nfev=0))(x0)
    internals = jax.vmap(lambda s: solver.init(obj, s))(state)
    progress = jax.vmap(lambda _: init_progress(x0.dtype))(jnp.arange(B))
    carry = (state, internals, progress, None)
    # Two live iterations give the internals realistic content (history
    # rows, simplex ordering, trust radii) before the freeze is probed.
    carry = body(carry)
    carry = body(carry)

    state, internals, progress, _ = carry
    done = (np.arange(B) % 2) == 0
    progress = progress._replace(
        status=jnp.where(
            jnp.asarray(done), jnp.int32(int(Status.FINISHED)),
            progress.status,
        )
    )
    carry = (state, internals, progress, None)
    out = body(carry)

    in_leaves = jax.tree.leaves(carry)
    out_leaves = jax.tree.leaves(out)
    assert len(in_leaves) == len(out_leaves)
    for i, (a, b) in enumerate(zip(in_leaves, out_leaves)):
        np.testing.assert_array_equal(
            np.asarray(a)[done],
            np.asarray(b)[done],
            err_msg=f"{type(solver).__name__} leaf {i} not frozen",
        )
