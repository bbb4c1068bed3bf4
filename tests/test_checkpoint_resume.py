"""Checkpoint/resume: solver state is value state (SURVEY.md §5).

A solve interrupted at iteration k, serialized to disk, loaded back, and
resumed must reproduce the uninterrupted trajectory bit-for-bit — progress
counters, plateau ring, and L-BFGS history are all part of the checkpoint
pytree.  (Reference analog: the caller-owned states and continuation-safe
AL design, augmented_lagrangian.h:195-203.)
"""

import jax
import jax.numpy as jnp
import numpy as np

from cppnumericalsolvers_tpu import (
    MinimizeResult,
    minimize,
    resume,
)
from cppnumericalsolvers_tpu.core.progress import default_stopping
from cppnumericalsolvers_tpu.models import rosenbrock
from cppnumericalsolvers_tpu.solvers import Lbfgs, LbfgsInternals
from cppnumericalsolvers_tpu.core.objective import FunctionState
from cppnumericalsolvers_tpu.core.progress import ProgressState


def _flatten_to_npz(tmp_path, result):
    leaves, treedef = jax.tree.flatten(result)
    path = tmp_path / "ckpt.npz"
    np.savez(path, *[np.asarray(leaf) for leaf in leaves])
    return path, treedef


def _load_from_npz(path, treedef):
    with np.load(path) as data:
        leaves = [jnp.asarray(data[k]) for k in data.files]
    return jax.tree.unflatten(treedef, leaves)


def test_resume_reproduces_uninterrupted_run(tmp_path):
    obj = rosenbrock()
    solver = Lbfgs()
    x0 = jnp.array([-1.2, 1.0])
    stopping = default_stopping(jnp.float64)

    full = minimize(obj, x0, solver, stopping)
    assert int(full.progress.num_iterations) > 10

    # Interrupt at iteration 7 via the iteration limit...
    partial = minimize(
        obj, x0, solver, stopping.replace(max_iterations=7)
    )
    assert int(partial.progress.num_iterations) == 8  # limit fires at k+1

    # ...round-trip the checkpoint through disk...
    path, treedef = _flatten_to_npz(tmp_path, partial)
    restored = _load_from_npz(path, treedef)

    # ...and resume with the original stopping criteria.
    resumed = resume(obj, restored, solver, stopping)

    np.testing.assert_array_equal(
        np.asarray(resumed.state.x), np.asarray(full.state.x)
    )
    assert float(resumed.state.value) == float(full.state.value)
    assert int(resumed.progress.status) == int(full.progress.status)
    # Total iteration count matches (the resumed run keeps counting).
    assert int(resumed.progress.num_iterations) == int(
        full.progress.num_iterations
    )


def test_resume_of_finished_solve_is_stable(tmp_path):
    obj = rosenbrock()
    solver = Lbfgs()
    full = minimize(obj, jnp.array([-1.2, 1.0]), solver)
    resumed = resume(obj, full, solver)
    # Already at a minimizer: the re-opened solve stops again immediately
    # (one extra iteration at most) at the same point.
    np.testing.assert_allclose(
        np.asarray(resumed.state.x), np.asarray(full.state.x), atol=1e-10
    )
