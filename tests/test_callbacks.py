"""Trace buffer + live callback observability (core/callbacks.py).

Reference analog: Solver::SetCallback + PrintProgressCallback
(solver.h:59-147, :176) — here a fixed-size in-loop trace plus a
jax.debug.callback host hook.
"""

import io
import contextlib

import jax.numpy as jnp
import numpy as np

from cppnumericalsolvers_tpu import minimize, minimize_batched
from cppnumericalsolvers_tpu.core.callbacks import print_progress
from cppnumericalsolvers_tpu.models import rosenbrock
from cppnumericalsolvers_tpu.solvers import Lbfgs


def test_trace_records_iterations():
    res = minimize(rosenbrock(), jnp.array([-1.2, 1.0]), Lbfgs(), trace=64)
    n_iter = int(res.progress.num_iterations)
    trace = res.trace
    assert trace is not None
    recorded = int(np.sum(np.asarray(trace.status) >= 0))
    assert recorded == min(n_iter, 64)
    # Last recorded row matches the final state.
    vals = np.asarray(trace.value)
    assert np.isclose(vals[recorded - 1], float(res.state.value))
    # Monotone-ish decrease overall: first > last.
    assert vals[0] > vals[recorded - 1]


def test_trace_batched_shapes():
    x0 = jnp.asarray(np.random.default_rng(0).uniform(-2, 2, size=(5, 2)))
    res = minimize_batched(rosenbrock(), x0, Lbfgs(), trace=16)
    assert res.trace.value.shape == (5, 16)


def test_live_callback_prints():
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        minimize(
            rosenbrock(), jnp.array([-1.2, 1.0]), Lbfgs(),
            callback=print_progress,
        )
    out = buf.getvalue()
    assert "iter" in out and "f = " in out
    assert len(out.splitlines()) >= 5


def test_no_trace_by_default():
    res = minimize(rosenbrock(), jnp.array([-1.2, 1.0]), Lbfgs())
    assert res.trace is None
