"""Batch-minor ("transposed") fused L-BFGS prologue — the small-n kernel.

Round-4 roofline: at (B=1024, n=32) the batch-major fused prologue ran at
6% HBM utilization, bound on VPU/DMA issue rate (ROOFLINE.md rows 1-2,
VERDICT round-4 weak item 1).  The root cause is layout, not the serial
two-loop chain per se: with n in the minor (lane) dimension,

* every (TB, n<=64) vector op uses n of 128 VPU lanes (25% at n=32);
* every dot product is a cross-lane reduction;
* a (TB, m, n) history block pads its last two dims to (16, 128) VMEM
  tiles — 6.4x at (m=10, n=32) — so history DMA scatters at ~60%
  efficiency;
* every (TB, 1) per-lane scalar column pads 1 -> 128 lanes (128x waste,
  ~30 such columns in the prologue/epilogue carries).

This module stores the batch in the LANE dimension instead.  History lives
as a flat ``(m * n8, B_pad)`` buffer (``n8 = round_up(n, 8)``; row r at
sublanes ``[r*n8, (r+1)*n8)``), per-lane scalars as ``(1, B_pad)`` rows,
and per-lane vectors as ``(n8, B_pad)``.  Consequences, all measured on
v5e (see BENCH_r05 / ROOFLINE.md):

* all 128 lanes carry real data for any n (the batch is >= 128 on the
  batched solve path);
* dot products over n are sublane reductions — a handful of full-width
  vector adds;
* blocks tile exactly: zero VMEM padding, dense DMA;
* scalar rows cost 8 sublanes instead of 128 lanes.

The (B, n) <-> (n8, B_pad) boundary transposes touch only the O(Bn)
iteration vectors (x, g, s_new, y_new in; direction out) — the O(Bmn)
history never leaves the transposed layout (it is created transposed by
``Lbfgs.init_batched`` and persists across iterations in the solve carry).

Algorithmic content is identical to ops/fused_step.py's prologue
(lbfgs.h:141-224 push + two-loop + descent-validity fallback + line-search
setup); parity is pinned against the same `_prologue_xla_single` oracle.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .two_loop import (
    _pltpu_compiler_params,
    _round_up,
    _vmem_limit_bytes,
)

__all__ = [
    "prologue_t_pallas_batched",
    "make_history_t",
    "history_t_to_rows",
    "history_rows_to_t",
    "pick_lane_tile",
]

_LANE = 128


def _n8(n: int) -> int:
    return _round_up(n, 8)


def make_history_t(b: int, m: int, n: int, dtype) -> jax.Array:
    """Fresh transposed history buffer: (m * n8, B_pad) zeros."""
    return jnp.zeros((m * _n8(n), _round_up(b, _LANE)), dtype)


def history_t_to_rows(hist_t: jax.Array, b: int, m: int, n: int) -> jax.Array:
    """(m*n8, B_pad) -> (B, m, n) — for checkpoint export / debugging."""
    n8 = _n8(n)
    return (
        hist_t[:, :b].T.reshape(b, m, n8)[:, :, :n]
    )


def history_rows_to_t(hist: jax.Array, m: int, n: int) -> jax.Array:
    """(B, m, n) -> (m*n8, B_pad) — for checkpoint import."""
    b = hist.shape[0]
    n8 = _n8(n)
    padded = jnp.zeros((b, m, n8), hist.dtype).at[:, :, :n].set(hist)
    out = jnp.zeros((m * n8, _round_up(b, _LANE)), hist.dtype)
    return out.at[:, :b].set(padded.reshape(b, m * n8).T)


def pick_lane_tile(b_pad: int, bytes_per_lane: int, budget: int) -> int:
    """Largest 128-multiple lane tile that divides ``b_pad`` (a 128
    multiple) and fits the VMEM block budget."""
    cap = max(_LANE, budget // max(bytes_per_lane, 1))
    tb = _LANE
    t = _LANE
    while t <= cap and t <= b_pad:
        if b_pad % t == 0:
            tb = t
        t += _LANE
    return tb


def _prologue_t_kernel(
    x_ref, g_ref, s_ref, y_ref, cnt_ref, gam_ref, sn_ref, yn_ref, vld_ref,
    dn_ref,
    dir_ref, alpha_ref, dginit_ref, s_out_ref, y_out_ref, cnt_out_ref,
    gam_out_ref,
    *, m: int, n8: int,
):
    """One (·, TB) lane block: history push + two-loop + descent fallback +
    line-search setup, all quantities batch-minor.

    Mirrors ops/fused_step.py:_prologue_kernel op-for-op; only the axis of
    every reduction (0 instead of -1) and the scalar orientation ((1, TB)
    rows instead of (TB, 1) columns) differ."""
    g = g_ref[:]  # (n8, TB)
    dtype = g.dtype
    eps = jnp.finfo(dtype).eps
    done = dn_ref[:] != 0  # (1, TB)
    valid = jnp.logical_and(vld_ref[:] != 0, jnp.logical_not(done))
    count = cnt_ref[:]  # (1, TB) i32
    gamma = gam_ref[:]  # (1, TB)
    sn = sn_ref[:]
    yn = yn_ref[:]

    def rdot(a, b):
        return jnp.sum(a * b, axis=0, keepdims=True)  # (1, TB)

    # --- curvature-gated push (lbfgs.h:253-298) -------------------------
    sy = rdot(sn, yn)
    s2 = rdot(sn, sn)
    y2 = rdot(yn, yn)
    threshold = eps * jnp.sqrt(s2) * jnp.sqrt(y2)
    accept = jnp.logical_and(valid, sy > threshold)
    full = count >= m
    slot = jnp.minimum(count, m - 1)
    new_count = jnp.where(
        jnp.logical_and(accept, jnp.logical_not(full)), count + 1, count
    )
    temp = sy / jnp.where(y2 > eps, y2, 1.0)
    gamma_ok = jnp.logical_and(
        jnp.logical_and(valid, y2 > eps),
        jnp.logical_and(jnp.isfinite(temp), jnp.abs(temp) <= 1e7),
    )
    new_gamma = jnp.where(gamma_ok, jnp.maximum(temp, eps), gamma)

    def row(ref, r):
        return ref[r * n8:(r + 1) * n8, :]

    accept_full = jnp.logical_and(accept, full)
    for r in range(m):
        if r < m - 1:
            base_s = jnp.where(accept_full, row(s_ref, r + 1), row(s_ref, r))
            base_y = jnp.where(accept_full, row(y_ref, r + 1), row(y_ref, r))
        else:
            base_s, base_y = row(s_ref, r), row(y_ref, r)
        write = jnp.logical_and(accept, slot == r)
        s_out_ref[r * n8:(r + 1) * n8, :] = jnp.where(write, sn, base_s)
        y_out_ref[r * n8:(r + 1) * n8, :] = jnp.where(write, yn, base_y)

    # --- two-loop recursion on the UPDATED history ----------------------
    alphas = [None] * m
    denoms = [None] * m
    usables = [None] * m
    q = g
    for r in range(m - 1, -1, -1):
        s_r = row(s_out_ref, r)
        y_r = row(y_out_ref, r)
        active = new_count > r
        denom = rdot(s_r, y_r)
        usable = jnp.logical_and(active, jnp.abs(denom) >= eps)
        rho = jnp.where(usable, 1.0 / denom, 0.0)
        alpha = rho * rdot(s_r, q)
        q = jnp.where(usable, q - alpha * y_r, q)
        alphas[r], denoms[r], usables[r] = alpha, denom, usable

    q = q * new_gamma

    for r in range(m):
        s_r = row(s_out_ref, r)
        y_r = row(y_out_ref, r)
        usable = usables[r]
        rho = jnp.where(usable, 1.0 / denoms[r], 0.0)
        beta = rho * rdot(y_r, q)
        q = jnp.where(usable, q + s_r * (alphas[r] - beta), q)

    # --- descent fallback + line-search setup (lbfgs.h:199-224) ---------
    x = x_ref[:]
    xnorm = jnp.sqrt(rdot(x, x))
    relative_eps = eps * jnp.maximum(1.0, xnorm)
    descent = -rdot(g, q)
    dnorm = jnp.sqrt(rdot(q, q))
    gnorm = jnp.sqrt(rdot(g, g))

    one = jnp.ones((), dtype)
    alpha0 = jnp.where(
        new_count == 0, jnp.where(dnorm > eps, 1.0 / dnorm, one), one
    )
    invalid = jnp.logical_or(
        jnp.logical_not(jnp.isfinite(descent)), descent > -eps * relative_eps
    )
    dir_ = jnp.where(invalid, g, q)
    alpha0 = jnp.where(
        invalid, jnp.where(gnorm > eps, 1.0 / gnorm, one), alpha0
    )
    new_count = jnp.where(
        jnp.logical_and(invalid, jnp.logical_not(done)),
        jnp.int32(0),
        new_count,
    )

    ls_dir = -dir_
    dir_ref[:] = ls_dir
    alpha_ref[:] = alpha0
    dginit_ref[:] = rdot(g, ls_dir)
    cnt_out_ref[:] = new_count
    gam_out_ref[:] = new_gamma


@functools.partial(jax.jit, static_argnames=("interpret",))
def prologue_t_pallas_batched(
    x,  # (B, n)
    gradient,  # (B, n)
    s_memory_t,  # (m*n8, B_pad)
    y_memory_t,  # (m*n8, B_pad)
    mem_count,  # (B,) int32
    gamma,  # (B,)
    s_new,  # (B, n)
    y_new,  # (B, n)
    valid,  # (B,) bool
    done,  # (B,) bool
    interpret: bool = False,
):
    """Fused prologue over transposed storage.

    Returns ``(ls_dir (B, n), alpha (B,), dginit (B,), s_memory_t,
    y_memory_t, mem_count, gamma)`` — the history stays transposed; only
    the iteration vectors cross the layout boundary (5 O(Bn) transposes
    per call, measured far below the batch-major kernel's tile-padding
    cost at small n)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, n = gradient.shape
    dtype = gradient.dtype
    n8 = _n8(n)
    b_pad = s_memory_t.shape[1]
    assert b_pad == _round_up(b, _LANE), (b, b_pad)
    m = s_memory_t.shape[0] // n8

    itemsize = jnp.dtype(dtype).itemsize
    # Per-lane block bytes: 4 history blocks (s/y in+out) + 5 n8-vectors +
    # ~8 scalar rows (each 8 sublanes after padding).
    bytes_per_lane = (4 * m * n8 + 5 * n8 + 8 * 8) * itemsize
    budget = _vmem_limit_bytes()
    budget = (16 << 20) if budget is None else int(budget * 0.4)
    tb = pick_lane_tile(b_pad, bytes_per_lane, budget)

    def tvec(a):  # (B, n) -> (n8, B_pad), zero-padded
        out = jnp.zeros((n8, b_pad), dtype)
        return out.at[:n, :b].set(a.T)

    def trow(a, dt, fill=0):  # (B,) -> (1, B_pad)
        out = jnp.full((1, b_pad), fill, dt)
        return out.at[0, :b].set(a.astype(dt))

    xp = tvec(x)
    gp = tvec(gradient)
    snp_ = tvec(s_new)
    ynp_ = tvec(y_new)
    cnt = trow(mem_count, jnp.int32)
    gam = trow(gamma, dtype)
    vld = trow(valid, jnp.int32)
    # Pad lanes are marked done so they stay inert.
    dn = trow(done, jnp.int32, fill=1)

    zero = np.int32(0)
    lane = lambda i: (zero, i)  # noqa: E731
    grid = (b_pad // tb,)
    vspec = pl.BlockSpec((n8, tb), lane, memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec((1, tb), lane, memory_space=pltpu.VMEM)
    hspec = pl.BlockSpec((m * n8, tb), lane, memory_space=pltpu.VMEM)

    dir_t, alpha, dginit, s_out, y_out, cnt_out, gam_out = pl.pallas_call(
        functools.partial(_prologue_t_kernel, m=m, n8=n8),
        out_shape=(
            jax.ShapeDtypeStruct((n8, b_pad), dtype),  # ls_dir (transposed)
            jax.ShapeDtypeStruct((1, b_pad), dtype),  # alpha
            jax.ShapeDtypeStruct((1, b_pad), dtype),  # dginit
            jax.ShapeDtypeStruct((m * n8, b_pad), dtype),
            jax.ShapeDtypeStruct((m * n8, b_pad), dtype),
            jax.ShapeDtypeStruct((1, b_pad), jnp.int32),
            jax.ShapeDtypeStruct((1, b_pad), dtype),
        ),
        grid=grid,
        in_specs=[vspec, vspec, hspec, hspec, sspec, sspec, vspec, vspec,
                  sspec, sspec],
        out_specs=(vspec, sspec, sspec, hspec, hspec, sspec, sspec),
        # Donate the history buffers (one HBM read + one write per call)
        # and the replaced count/gamma rows.
        input_output_aliases={2: 3, 3: 4, 4: 5, 5: 6},
        compiler_params=_pltpu_compiler_params(pltpu, _vmem_limit_bytes()),
        interpret=interpret,
    )(xp, gp, s_memory_t, y_memory_t, cnt, gam, snp_, ynp_, vld, dn)

    return (
        dir_t[:n, :b].T,
        alpha[0, :b],
        dginit[0, :b],
        s_out,
        y_out,
        cnt_out[0, :b],
        gam_out[0, :b].astype(gamma.dtype),
    )
