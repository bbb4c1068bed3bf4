"""Per-iteration observability: trace buffers and live callbacks.

The reference's observability surface is ``Solver::SetCallback`` +
``PrintProgressCallback`` (solver.h:59-147, :176) invoked every loop
iteration.  Inside a jitted ``lax.while_loop`` a Python callback cannot run
directly, so the TPU-native design offers two mechanisms (SURVEY.md §5):

* a **fixed-size trace buffer** carried through the loop — zero host
  round-trips; per-instance arrays under vmap; returned with the result; and
* a **host callback** via ``jax.debug.callback`` for live printing — the
  direct analog of ``PrintProgressCallback`` (slower: one host transfer per
  iteration; use for debugging, not production).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["IterationTrace", "init_trace", "record_trace", "print_progress"]


class IterationTrace(NamedTuple):
    """First-``capacity`` iterations of the solve, one row each.

    Unwritten rows stay NaN (value) / -1 (status), so a short solve is
    self-describing.  Under vmap every field gains a leading batch axis.
    """

    value: jax.Array  # (capacity,) objective value
    gradient_norm: jax.Array  # (capacity,) ||g||_inf
    x_delta: jax.Array  # (capacity,)
    f_delta: jax.Array  # (capacity,)
    status: jax.Array  # (capacity,) int32 status after the iteration


def init_trace(capacity: int, dtype) -> IterationTrace:
    nan = jnp.full((capacity,), jnp.nan, dtype)
    return IterationTrace(
        value=nan,
        gradient_norm=nan,
        x_delta=nan,
        f_delta=nan,
        status=jnp.full((capacity,), -1, jnp.int32),
    )


def record_trace(
    trace: IterationTrace, progress, state
) -> IterationTrace:
    """Record the just-completed iteration (1-based ``num_iterations``)."""
    capacity = trace.value.shape[-1]
    idx = progress.num_iterations - 1
    write = idx < capacity
    idx = jnp.clip(idx, 0, capacity - 1)

    def put(buf, val):
        return jnp.where(write, buf.at[idx].set(val.astype(buf.dtype)), buf)

    return IterationTrace(
        value=put(trace.value, state.value),
        gradient_norm=put(
            trace.gradient_norm, jnp.max(jnp.abs(state.gradient))
        ),
        x_delta=put(trace.x_delta, progress.x_delta),
        f_delta=put(trace.f_delta, progress.f_delta),
        status=put(trace.status, progress.status),
    )


def print_progress(info: dict[str, Any]) -> None:
    """Stock live callback: the ``PrintProgressCallback`` analog
    (solver.h:59-147).  Pass as ``minimize(..., callback=print_progress)``."""
    print(
        "iter {it:>5}  f = {f: .10e}  |g|inf = {g:.3e}  "
        "x_delta = {xd:.3e}  f_delta = {fd:.3e}".format(
            it=int(info["num_iterations"]),
            f=float(info["value"]),
            g=float(info["gradient_norm"]),
            xd=float(info["x_delta"]),
            fd=float(info["f_delta"]),
        )
    )
