"""Fused L-BFGS step prologue/epilogue — collapsing the non-kernel loop body.

Round-2 roofline measurements (BENCH_r02 perf grid, benchmarks/roofline.py)
showed the fused push+two-loop kernel at ~53% of peak HBM bandwidth while the
whole batched step sat at 5-29% — the bottleneck on every shape was the
~dozens of small O(Bn) XLA ops *around* the kernel: direction-validity
checks, norms, line-search setup, the post-search state selects and s/y
diffs, and the entire convergence state machine (core/progress.py), each a
separate dispatch with fixed latency and its own HBM pass.

This module fuses that residue into two Pallas kernels so one solver
iteration becomes exactly::

    prologue kernel -> line-search trips (objective evals, XLA) -> epilogue
    kernel -> loop predicate

* :func:`lbfgs_prologue` — history push + two-loop recursion (shared body
  with ops/two_loop.py) **plus** the descent-validity fallback
  (lbfgs.h:199-224), initial-step-width rule (lbfgs.h:207-213), and the
  line search's directional-derivative setup, all in the same VMEM
  residency.  Outputs the ready-to-search direction, alpha_init and dginit.
* :func:`lbfgs_epilogue` — the post-line-search half: non-finite guard
  (lbfgs.h:234-241), s/y correction-pair formation, stall-driven history
  reset, and the full ``Progress::Update`` convergence ladder
  (progress.h:153-327: iteration limit -> x_delta violations -> f_delta ->
  plateau ring -> relative gradient norm) including converged-lane
  freezing — one kernel launch instead of ~40 dispatches.

Both are ``custom_vmap`` ops: un-batched calls (and any non-TPU/f64/
per-lane-criteria configuration) lower to pure-XLA compositions that are
**by construction** identical to the driver's generic path — the epilogue's
XLA implementation literally calls :func:`core.progress.update_progress` —
so the fused path cannot drift semantically from the reference port.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core.objective import FunctionState
from ..core.progress import (
    PAST_RING_SIZE,
    ProgressState,
    StoppingCriteria,
    update_progress,
)
from ..core.status import Status
from ..core.tree import tree_where
from .two_loop import (
    _pick_tile_b,
    _pltpu_compiler_params,
    _push_two_loop_core,
    _round_up,
    _SUBLANE,
    _vmem_limit_bytes,
    push_history_xla,
    two_loop_direction_xla,
)

__all__ = ["lbfgs_prologue", "lbfgs_epilogue"]


# ---------------------------------------------------------------------------
# Prologue: push + two-loop + descent fallback + line-search setup
# ---------------------------------------------------------------------------


def _prologue_xla_single(
    x, gradient, s_memory, y_memory, mem_count, gamma, s_new, y_new, valid,
    done,
):
    """Single-instance reference composition (the exact op sequence the
    un-fused Lbfgs.step performs, lbfgs.py)."""
    dtype = gradient.dtype
    eps = jnp.finfo(dtype).eps

    # done-lane gating: the push is a no-op and the validity reset must not
    # land, so internals of frozen lanes return bit-identical.
    valid = jnp.logical_and(valid, jnp.logical_not(done))
    s_mem, y_mem, count, gamma = push_history_xla(
        s_memory, y_memory, mem_count, gamma, s_new, y_new, valid
    )
    d = two_loop_direction_xla(gradient, s_mem, y_mem, count, gamma, None)

    relative_eps = eps * jnp.maximum(1.0, jnp.linalg.norm(x))
    descent = -jnp.vdot(gradient, d)
    direction_norm = jnp.linalg.norm(d)
    gradient_norm = jnp.linalg.norm(gradient)

    # Initial step: 1/|d| with no curvature history, else 1 (lbfgs.h:199-213).
    alpha_init = jnp.where(
        count == 0,
        jnp.where(direction_norm > eps, 1.0 / direction_norm, 1.0),
        jnp.ones((), dtype),
    )
    # Invalid-descent fallback: steepest descent + history reset
    # (lbfgs.h:214-224).
    invalid = jnp.logical_or(
        ~jnp.isfinite(descent), descent > -eps * relative_eps
    )
    dir_ = jnp.where(invalid, gradient, d)
    alpha_init = jnp.where(
        invalid,
        jnp.where(gradient_norm > eps, 1.0 / gradient_norm, 1.0),
        alpha_init,
    )
    count = jnp.where(jnp.logical_and(invalid, ~done), 0, count)

    ls_dir = -dir_
    dginit = jnp.vdot(gradient, ls_dir)
    return ls_dir, alpha_init, dginit, s_mem, y_mem, count, gamma


def _prologue_kernel(
    x_ref, g_ref, s_ref, y_ref, count_ref, gamma_ref, snew_ref, ynew_ref,
    valid_ref, done_ref,
    dir_ref, alpha_ref, dginit_ref, s_out_ref, y_out_ref, count_out_ref,
    gamma_out_ref,
    *, compact=False, flat_n=None,
):
    g = g_ref[:]  # (TB, n)
    dtype = g.dtype
    eps = jnp.finfo(dtype).eps
    done = done_ref[:] != 0  # (TB, 1)
    valid = jnp.logical_and(valid_ref[:] != 0, jnp.logical_not(done))

    q, count, gamma = _push_two_loop_core(
        g, count_ref[:], gamma_ref[:], valid, snew_ref[:], ynew_ref[:],
        s_ref, y_ref, s_out_ref, y_out_ref, compact=compact, flat_n=flat_n,
    )

    x = x_ref[:]
    xnorm = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True))
    relative_eps = eps * jnp.maximum(1.0, xnorm)
    descent = -jnp.sum(g * q, axis=-1, keepdims=True)
    dnorm = jnp.sqrt(jnp.sum(q * q, axis=-1, keepdims=True))
    gnorm = jnp.sqrt(jnp.sum(g * g, axis=-1, keepdims=True))

    one = jnp.ones((), dtype)
    alpha = jnp.where(
        count == 0, jnp.where(dnorm > eps, 1.0 / dnorm, one), one
    )
    invalid = jnp.logical_or(
        jnp.logical_not(jnp.isfinite(descent)), descent > -eps * relative_eps
    )
    dir_ = jnp.where(invalid, g, q)
    alpha = jnp.where(
        invalid, jnp.where(gnorm > eps, 1.0 / gnorm, one), alpha
    )
    # jnp.int32(0), not a bare 0: under jax_enable_x64 a Python literal in
    # a 3-arg where becomes a weak-i64 constant whose in-kernel i64->i32
    # convert_element_type sends the Mosaic lowering rule into infinite
    # recursion (lower_fun of the conversion re-emits the conversion).
    count = jnp.where(
        jnp.logical_and(invalid, jnp.logical_not(done)),
        jnp.int32(0),
        count,
    )

    ls_dir = -dir_
    dir_ref[:] = ls_dir
    alpha_ref[:] = alpha
    dginit_ref[:] = jnp.sum(g * ls_dir, axis=-1, keepdims=True)
    count_out_ref[:] = count
    gamma_out_ref[:] = gamma


@functools.partial(jax.jit, static_argnames=("interpret",))
def prologue_pallas_batched(
    x, gradient, s_memory, y_memory, mem_count, gamma, s_new, y_new, valid,
    done, interpret: bool = False,
):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, n = gradient.shape
    m = s_memory.shape[1]
    dtype = gradient.dtype

    # Same padding policy as push_two_loop_pallas_batched: sublane quantum
    # only for n; the tile must divide the batch (see _pick_tile_b).
    # Physical (tile-padded) per-lane bytes: 4 (m, n) history blocks + 6
    # n-vector blocks (x, g, s_new, y_new in; dir out x2 margin).
    n_pad = _round_up(n, _SUBLANE)
    from .two_loop import _phys_cols, _phys_rows, _scoped_vmem_budget

    bytes_per_lane = (
        4 * _phys_rows(m) * _phys_cols(n_pad) + 6 * _phys_cols(n_pad)
    ) * jnp.dtype(dtype).itemsize
    tb = _pick_tile_b(b, bytes_per_lane, _scoped_vmem_budget(n))
    b_pad = _round_up(b, tb)

    def pad_vec(a):
        if n_pad == n and b_pad == b:
            return a
        out = jnp.zeros((b_pad, n_pad), dtype)
        return out.at[:b, :n].set(a)

    def pad_hist(a):
        if n_pad == n and b_pad == b:
            return a
        out = jnp.zeros((b_pad, m, n_pad), dtype)
        return out.at[:b, :, :n].set(a)

    def pad_scalar(a, dt):
        out = jnp.zeros((b_pad, 1), dt)
        return out.at[:b, 0].set(a.astype(dt))

    xp, g, s, y = pad_vec(x), pad_vec(gradient), pad_hist(s_memory), pad_hist(
        y_memory
    )
    sn, yn = pad_vec(s_new), pad_vec(y_new)
    cnt = pad_scalar(mem_count, jnp.int32)
    gam = pad_scalar(gamma, dtype)
    vld = pad_scalar(valid, jnp.int32)
    # Pad lanes are marked done so they stay inert.
    dn = jnp.ones((b_pad, 1), jnp.int32).at[:b, 0].set(done.astype(jnp.int32))

    zero = np.int32(0)
    vec = lambda i: (i, zero)  # noqa: E731
    mat = lambda i: (i, zero, zero)  # noqa: E731
    grid = (b_pad // tb,)
    vspec = pl.BlockSpec((tb, n_pad), vec, memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec((tb, 1), vec, memory_space=pltpu.VMEM)
    from .two_loop import COMPACT_N_MAX

    # Flat (tb, m*n) history blocks when the row width is lane-aligned —
    # removes the m=10 -> 16 sublane DMA scatter (see two_loop.py's flat_n
    # note); row slices inside the kernel are then free.
    # Gate by measurement (v5e standalone kernel): flat wins 1.76x at
    # n=256 (180 -> 102 us) but LOSES ~1.8x at n>=1024 (424 -> 771 us at
    # (1024,1024)) — very wide lane-dim blocks (tb, 10240+) lower poorly.
    flat = n_pad % 128 == 0 and n_pad <= 256
    flat_n = n_pad if flat else None
    if flat:
        s = s.reshape(b_pad, m * n_pad)
        y = y.reshape(b_pad, m * n_pad)
        hist_shape = (b_pad, m * n_pad)
        hspec = pl.BlockSpec((tb, m * n_pad), vec, memory_space=pltpu.VMEM)
    else:
        hist_shape = (b_pad, m, n_pad)
        hspec = pl.BlockSpec((tb, m, n_pad), mat, memory_space=pltpu.VMEM)

    ls_dir, alpha, dginit, s_out, y_out, cnt_out, gam_out = pl.pallas_call(
        functools.partial(
            _prologue_kernel, compact=n <= COMPACT_N_MAX, flat_n=flat_n
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b_pad, n_pad), dtype),
            jax.ShapeDtypeStruct((b_pad, 1), dtype),
            jax.ShapeDtypeStruct((b_pad, 1), dtype),
            jax.ShapeDtypeStruct(hist_shape, dtype),
            jax.ShapeDtypeStruct(hist_shape, dtype),
            jax.ShapeDtypeStruct((b_pad, 1), jnp.int32),
            jax.ShapeDtypeStruct((b_pad, 1), dtype),
        ),
        grid=grid,
        in_specs=[vspec, vspec, hspec, hspec, sspec, sspec, vspec, vspec,
                  sspec, sspec],
        out_specs=(vspec, sspec, sspec, hspec, hspec, sspec, sspec),
        # Donate the history buffers (the op's HBM traffic for them is one
        # read + one write) plus the replaced count/gamma scalars
        # (operand indices: s_memory=2 -> s_out=3, y_memory=3 -> y_out=4,
        # mem_count=4 -> count_out=5, gamma=5 -> gamma_out=6).
        input_output_aliases={2: 3, 3: 4, 4: 5, 5: 6},
        compiler_params=_pltpu_compiler_params(pltpu, _vmem_limit_bytes()),
        interpret=interpret,
    )(xp, g, s, y, cnt, gam, sn, yn, vld, dn)
    if flat:
        s_out = s_out.reshape(b_pad, m, n_pad)
        y_out = y_out.reshape(b_pad, m, n_pad)
    return (
        ls_dir[:b, :n],
        alpha[:b, 0],
        dginit[:b, 0],
        s_out[:b, :, :n],
        y_out[:b, :, :n],
        cnt_out[:b, 0],
        gam_out[:b, 0].astype(gamma.dtype),
    )


@jax.custom_batching.custom_vmap
def lbfgs_prologue(
    x, gradient, s_memory, y_memory, mem_count, gamma, s_new, y_new, valid,
    done,
):
    """Fused L-BFGS direction step: pending-pair push, two-loop recursion,
    descent-validity fallback, and line-search setup (alpha_init, dginit).

    Returns ``(ls_dir, alpha_init, dginit, s_memory, y_memory, mem_count,
    gamma)`` where ``ls_dir`` is the ready-to-search direction (the
    reference searches along ``-d``, lbfgs.h:226-232) and ``dginit ==
    vdot(gradient, ls_dir)`` (the directional derivative More-Thuente needs,
    more_thuente.h:150-156).
    """
    return _prologue_xla_single(
        x, gradient, s_memory, y_memory, mem_count, gamma, s_new, y_new,
        valid, done,
    )


@lbfgs_prologue.def_vmap
def _prologue_vmap_rule(axis_size, in_batched, *args):
    ops = [
        a if batched else jnp.broadcast_to(a, (axis_size,) + jnp.shape(a))
        for a, batched in zip(args, in_batched)
    ]
    gradient = ops[1]
    if jax.default_backend() == "tpu" and gradient.dtype == jnp.float32:
        out = prologue_pallas_batched(*ops)
    else:
        out = jax.vmap(_prologue_xla_single)(*ops)
    return out, (True,) * 7


# ---------------------------------------------------------------------------
# Epilogue: non-finite guard + s/y formation + stall reset + Progress::Update
# ---------------------------------------------------------------------------


def _epilogue_xla_single(
    state, x_ls, f_ls, g_ls, ls_nfev, mem_count, s_pend_old, y_pend_old,
    pvalid_old, done, progress, crit,
):
    """Single-instance composition — literally the generic driver path:
    finite-guard select (lbfgs.h:234-241), s/y diffs, stall reset,
    :func:`update_progress`, and converged-lane freezing."""
    finite = jnp.isfinite(f_ls)
    take = jnp.logical_and(finite, jnp.logical_not(done))
    x1 = jnp.where(take, x_ls, state.x)
    f1 = jnp.where(take, f_ls, state.value)
    g1 = jnp.where(take, g_ls, state.gradient)
    nfev1 = jnp.where(done, state.nfev, state.nfev + ls_nfev)
    new_state = FunctionState(x=x1, value=f1, gradient=g1, nfev=nfev1)

    s = x1 - state.x
    y = g1 - state.gradient
    # Stall recovery: clearing the history makes the next step steepest
    # descent with a fresh step length (see lbfgs.py docstring).
    stalled = jnp.max(jnp.abs(s)) <= 0.0
    count1 = jnp.where(jnp.logical_and(stalled, ~done), 0, mem_count)

    new_progress = update_progress(progress, state, new_state, crit,
                                   mode="first")
    new_progress = tree_where(done, progress, new_progress)

    s_pend = jnp.where(done, s_pend_old, s)
    y_pend = jnp.where(done, y_pend_old, y)
    pvalid = jnp.where(done, pvalid_old, finite)
    return new_state, s_pend, y_pend, pvalid, count1, new_progress


def _epilogue_kernel(
    # inputs
    x0_ref, f0_ref, g0_ref, nfev0_ref, xls_ref, fls_ref, gls_ref, lsnfev_ref,
    count_ref, spold_ref, ypold_ref, pvold_ref, done_ref,
    numit_ref, xdelta_old_ref, xviol_ref, fdelta_old_ref, fviol_ref,
    gnorm_old_ref, status_old_ref, ring_ref, pastpos_ref,
    critf_ref, criti_ref,
    # outputs
    x1_ref, f1_ref, g1_ref, nfev1_ref, spend_ref, ypend_ref, pvalid_ref,
    count_out_ref, numit_out_ref, xdelta_out_ref, xviol_out_ref,
    fdelta_out_ref, fviol_out_ref, gnorm_out_ref, status_out_ref,
    ring_out_ref, pastpos_out_ref,
):
    """One (TB, ·) block: the whole post-line-search half of an L-BFGS
    iteration, mirroring ``Progress::Update``'s exact test order and
    side-effect gating (progress.h:153-327; see core/progress.py).  Criteria
    are SMEM scalars (uniform across the batch); every early "return" of the
    C++ ladder is a status-accumulator select."""
    dtype = x0_ref.dtype
    done = done_ref[:] != 0  # (TB, 1)
    x0 = x0_ref[:]
    g0 = g0_ref[:]
    f0 = f0_ref[:]
    nfev0 = nfev0_ref[:]

    finite = jnp.isfinite(fls_ref[:])
    take = jnp.logical_and(finite, jnp.logical_not(done))
    x1 = jnp.where(take, xls_ref[:], x0)
    f1 = jnp.where(take, fls_ref[:], f0)
    g1 = jnp.where(take, gls_ref[:], g0)
    nfev1 = jnp.where(done, nfev0, nfev0 + lsnfev_ref[:])

    s = x1 - x0
    y = g1 - g0
    x_delta = jnp.max(jnp.abs(s), axis=-1, keepdims=True)
    stalled = x_delta <= 0.0
    # jnp.int32(0), not a bare 0 — see the matching note in _prologue_kernel
    # (x64 weak-i64 literal => recursive Mosaic convert lowering).
    count1 = jnp.where(
        jnp.logical_and(stalled, jnp.logical_not(done)),
        jnp.int32(0),
        count_ref[:],
    )

    # --- Progress::Update ladder (all (TB, 1) vector-mask selects) ---------
    cont = jnp.int32(int(Status.CONTINUE))
    num_it = numit_ref[:] + 1
    f_delta = jnp.abs(f1 - f0)
    grad_norm = jnp.max(jnp.abs(g1), axis=-1, keepdims=True)
    one = jnp.ones((), dtype)

    # Materialise the SMEM criteria scalars as (TB, 1) vectors first: mixing
    # SMEM scalars directly into vector predicates/selects makes Mosaic
    # broadcast i1 scalars, which it cannot legalize ("unsupported target
    # bitwidth for truncation"); a full-vector i32/f32 broadcast + vector
    # compare lowers cleanly.
    lane = num_it.shape

    def crit_f(j):
        return jnp.full(lane, critf_ref[0, j], dtype)

    def crit_i(j):
        return jnp.full(lane, criti_ref[0, j], jnp.int32)

    max_iter = crit_i(0)
    xd_thresh = crit_f(0)
    xv_limit = crit_i(1)
    fd_thresh = crit_f(1)
    fv_limit = crit_i(2)
    past = crit_i(3)
    f_rel = crit_i(4) != 0
    g_rel = crit_i(5) != 0
    past_delta = crit_f(2)
    gn_thresh = crit_f(3)

    status = jnp.full(lane, int(Status.CONTINUE), jnp.int32)
    # 1. iteration limit
    fire = jnp.logical_and(max_iter > 0, num_it > max_iter)
    status = jnp.where(
        jnp.logical_and(status == cont, fire),
        jnp.int32(int(Status.ITERATION_LIMIT)), status,
    )
    # 2. x_delta with consecutive-violation counter
    reached = status == cont
    xv_cond = jnp.logical_and(xd_thresh > 0, x_delta < xd_thresh)
    x_viol = jnp.where(
        reached, jnp.where(xv_cond, xviol_ref[:] + 1, jnp.int32(0)), xviol_ref[:]
    )
    fire = jnp.logical_and(xv_cond, x_viol >= xv_limit)
    status = jnp.where(
        jnp.logical_and(status == cont, fire),
        jnp.int32(int(Status.X_DELTA_VIOLATION)), status,
    )
    # 3. f_delta, absolute or factr-relative
    reached = status == cont
    f_scale = jnp.where(
        f_rel,
        jnp.maximum(jnp.maximum(jnp.abs(f1), jnp.abs(f0)), one),
        one,
    )
    fv_cond = jnp.logical_and(fd_thresh > 0, f_delta < fd_thresh * f_scale)
    f_viol = jnp.where(
        reached, jnp.where(fv_cond, fviol_ref[:] + 1, jnp.int32(0)), fviol_ref[:]
    )
    fire = jnp.logical_and(fv_cond, f_viol >= fv_limit)
    status = jnp.where(
        jnp.logical_and(status == cont, fire),
        jnp.int32(int(Status.F_DELTA_VIOLATION)), status,
    )
    # 4. plateau ring buffer (dynamic per-lane index via one-hot masks)
    reached = status == cont
    past_active = past > 0
    ring = ring_ref[:]  # (TB, RING)
    ring = jnp.where(
        jnp.logical_and(past_active, num_it == 1), f1, ring
    )
    col = jax.lax.broadcasted_iota(jnp.int32, ring.shape, 1)
    sel = col == pastpos_ref[:]
    past_f = jnp.sum(jnp.where(sel, ring, jnp.zeros((), dtype)),
                     axis=1, keepdims=True)
    rate = jnp.abs(past_f - f1) / jnp.maximum(one, jnp.abs(f1))
    plateau = jnp.logical_and(
        jnp.logical_and(past_active, num_it > past), rate < past_delta
    )
    status = jnp.where(
        jnp.logical_and(status == cont, plateau),
        jnp.int32(int(Status.F_DELTA_VIOLATION)), status,
    )
    write_ring = jnp.logical_and(
        jnp.logical_and(past_active, status == cont), reached
    )
    ring = jnp.where(jnp.logical_and(sel, write_ring), f1, ring)
    pp = pastpos_ref[:]
    past_pos1 = jnp.where(
        write_ring,
        jnp.where(pp + 1 >= past, jnp.int32(0), pp + 1),
        pp,
    )
    # 5. relative gradient norm
    xmax = jnp.max(jnp.abs(x1), axis=-1, keepdims=True)
    scale = jnp.where(g_rel, jnp.maximum(one, xmax), one)
    fire = jnp.logical_and(gn_thresh > 0, grad_norm < gn_thresh * scale)
    status = jnp.where(
        jnp.logical_and(status == cont, fire),
        jnp.int32(int(Status.GRADIENT_NORM_VIOLATION)), status,
    )

    # --- outputs (done lanes frozen) ---------------------------------------
    x1_ref[:] = x1
    f1_ref[:] = f1
    g1_ref[:] = g1
    nfev1_ref[:] = nfev1
    spend_ref[:] = jnp.where(done, spold_ref[:], s)
    ypend_ref[:] = jnp.where(done, ypold_ref[:], y)
    # Select in the i32 domain: a select over two i1 vectors followed by a
    # widening is a Mosaic legalization failure ("unsupported target
    # bitwidth for truncation").
    pvalid_ref[:] = jnp.where(done, pvold_ref[:], finite.astype(jnp.int32))
    count_out_ref[:] = count1
    numit_out_ref[:] = jnp.where(done, numit_ref[:], num_it)
    xdelta_out_ref[:] = jnp.where(done, xdelta_old_ref[:], x_delta)
    xviol_out_ref[:] = jnp.where(done, xviol_ref[:], x_viol)
    fdelta_out_ref[:] = jnp.where(done, fdelta_old_ref[:], f_delta)
    fviol_out_ref[:] = jnp.where(done, fviol_ref[:], f_viol)
    gnorm_out_ref[:] = jnp.where(done, gnorm_old_ref[:], grad_norm)
    status_out_ref[:] = jnp.where(done, status_old_ref[:], status)
    ring_out_ref[:] = jnp.where(done, ring_ref[:], ring)
    pastpos_out_ref[:] = jnp.where(done, pastpos_ref[:], past_pos1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def epilogue_pallas_batched(
    state, x_ls, f_ls, g_ls, ls_nfev, mem_count, s_pend_old, y_pend_old,
    pvalid_old, done, progress, crit, interpret: bool = False,
):
    """Batched Pallas lowering.  ``crit`` must be per-solve scalars (uniform
    across lanes) — they ride in SMEM; per-lane criteria take the vmapped
    XLA fallback in the dispatch rule."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, n = state.x.shape
    dtype = state.x.dtype

    n_pad = _round_up(n, _SUBLANE)
    from .two_loop import _phys_cols

    # Physical per-lane block bytes: 6 (B, n) inputs + 4 (B, n) outputs,
    # plus ~30 (B, 1) scalar columns that each pad to a full 128-lane tile.
    bytes_per_lane = (10 * _phys_cols(n_pad) + 30 * 128) * jnp.dtype(
        dtype
    ).itemsize
    tb = _pick_tile_b(b, bytes_per_lane, 16 << 20)
    b_pad = _round_up(b, tb)

    def pad_vec(a):
        if n_pad == n and b_pad == b:
            return a
        return jnp.zeros((b_pad, n_pad), dtype).at[:b, :n].set(a)

    def pad_scalar(a, dt):
        return jnp.zeros((b_pad, 1), dt).at[:b, 0].set(a.astype(dt))

    def pad_ring(a):
        if b_pad == b:
            return a
        return jnp.zeros((b_pad, PAST_RING_SIZE), dtype).at[:b].set(a)

    # Criteria as packed SMEM scalars.  Loop-invariant: XLA hoists the packs
    # out of the solve while_loop.
    critf = jnp.stack(
        [crit.x_delta, crit.f_delta, crit.past_delta, crit.gradient_norm]
    ).astype(dtype).reshape(1, 4)
    criti = jnp.stack(
        [
            crit.max_iterations,
            crit.x_delta_violations,
            crit.f_delta_violations,
            crit.past,
            crit.f_delta_relative.astype(jnp.int32),
            crit.gradient_norm_relative.astype(jnp.int32),
        ]
    ).astype(jnp.int32).reshape(1, 6)

    args = (
        pad_vec(state.x), pad_scalar(state.value, dtype),
        pad_vec(state.gradient), pad_scalar(state.nfev, jnp.int32),
        pad_vec(x_ls), pad_scalar(f_ls, dtype), pad_vec(g_ls),
        pad_scalar(ls_nfev, jnp.int32),
        pad_scalar(mem_count, jnp.int32),
        pad_vec(s_pend_old), pad_vec(y_pend_old),
        pad_scalar(pvalid_old, jnp.int32),
        # Pad lanes are done so their (zero) state stays inert.
        jnp.ones((b_pad, 1), jnp.int32).at[:b, 0].set(done.astype(jnp.int32)),
        pad_scalar(progress.num_iterations, jnp.int32),
        pad_scalar(progress.x_delta, dtype),
        pad_scalar(progress.x_delta_violations, jnp.int32),
        pad_scalar(progress.f_delta, dtype),
        pad_scalar(progress.f_delta_violations, jnp.int32),
        pad_scalar(progress.gradient_norm, dtype),
        pad_scalar(progress.status, jnp.int32),
        pad_ring(progress.past_ring),
        pad_scalar(progress.past_pos, jnp.int32),
        critf, criti,
    )

    zero = np.int32(0)
    vec = lambda i: (i, zero)  # noqa: E731
    smem = lambda i: (zero, zero)  # noqa: E731
    grid = (b_pad // tb,)
    vspec = pl.BlockSpec((tb, n_pad), vec, memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec((tb, 1), vec, memory_space=pltpu.VMEM)
    rspec = pl.BlockSpec((tb, PAST_RING_SIZE), vec, memory_space=pltpu.VMEM)
    cfspec = pl.BlockSpec((1, 4), smem, memory_space=pltpu.SMEM)
    cispec = pl.BlockSpec((1, 6), smem, memory_space=pltpu.SMEM)

    out = pl.pallas_call(
        _epilogue_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((b_pad, n_pad), dtype),  # x1
            jax.ShapeDtypeStruct((b_pad, 1), dtype),  # f1
            jax.ShapeDtypeStruct((b_pad, n_pad), dtype),  # g1
            jax.ShapeDtypeStruct((b_pad, 1), jnp.int32),  # nfev1
            jax.ShapeDtypeStruct((b_pad, n_pad), dtype),  # s_pend
            jax.ShapeDtypeStruct((b_pad, n_pad), dtype),  # y_pend
            jax.ShapeDtypeStruct((b_pad, 1), jnp.int32),  # pvalid
            jax.ShapeDtypeStruct((b_pad, 1), jnp.int32),  # count
            jax.ShapeDtypeStruct((b_pad, 1), jnp.int32),  # num_it
            jax.ShapeDtypeStruct((b_pad, 1), dtype),  # x_delta
            jax.ShapeDtypeStruct((b_pad, 1), jnp.int32),  # x_viol
            jax.ShapeDtypeStruct((b_pad, 1), dtype),  # f_delta
            jax.ShapeDtypeStruct((b_pad, 1), jnp.int32),  # f_viol
            jax.ShapeDtypeStruct((b_pad, 1), dtype),  # grad_norm
            jax.ShapeDtypeStruct((b_pad, 1), jnp.int32),  # status
            jax.ShapeDtypeStruct((b_pad, PAST_RING_SIZE), dtype),  # ring
            jax.ShapeDtypeStruct((b_pad, 1), jnp.int32),  # past_pos
        ),
        grid=grid,
        in_specs=[
            vspec, sspec, vspec, sspec, vspec, sspec, vspec, sspec,
            sspec, vspec, vspec, sspec, sspec,
            sspec, sspec, sspec, sspec, sspec, sspec, sspec, rspec, sspec,
            cfspec, cispec,
        ],
        out_specs=(
            vspec, sspec, vspec, sspec, vspec, vspec, sspec,
            sspec, sspec, sspec, sspec, sspec, sspec, sspec, sspec,
            rspec, sspec,
        ),
        # Donate every dead input into its matching-shape successor — the
        # prior state (x, f, g, nfev), the pending pair, the ring, and all
        # progress counters are replaced in the solve carry, so without the
        # full alias map XLA ping-pong-copies each of them once per outer
        # iteration.
        input_output_aliases={
            0: 0, 1: 1, 2: 2, 3: 3,  # state x/f/g/nfev
            8: 7, 9: 4, 10: 5, 11: 6,  # count, pending pair, pvalid
            13: 8, 14: 9, 15: 10, 16: 11, 17: 12, 18: 13, 19: 14,
            20: 15, 21: 16,  # progress counters + ring + pos
        },
        compiler_params=_pltpu_compiler_params(
            pltpu,
            # The epilogue's blocks carry no (m, n) history, so the working
            # set is far below the scoped cap; still derive it from the
            # device kind rather than assuming a v5e-sized VMEM.
            None if (_lim := _vmem_limit_bytes()) is None
            else min(_lim, 32 * 1024 * 1024),
        ),
        interpret=interpret,
    )(*args)

    (x1, f1, g1, nfev1, s_pend, y_pend, pvalid, count1, num_it, x_delta,
     x_viol, f_delta, f_viol, grad_norm, status, ring, past_pos) = out

    new_state = FunctionState(
        x=x1[:b, :n], value=f1[:b, 0], gradient=g1[:b, :n], nfev=nfev1[:b, 0]
    )
    new_progress = ProgressState(
        num_iterations=num_it[:b, 0],
        x_delta=x_delta[:b, 0],
        x_delta_violations=x_viol[:b, 0],
        f_delta=f_delta[:b, 0],
        f_delta_violations=f_viol[:b, 0],
        gradient_norm=grad_norm[:b, 0],
        # cond(H) is never produced on this path (the driver routes
        # condition-Hessian solves through the generic path); freezing is a
        # pass-through of the carried value.
        condition_hessian=progress.condition_hessian,
        status=status[:b, 0],
        past_ring=ring[:b],
        past_pos=past_pos[:b, 0],
    )
    return (
        new_state,
        s_pend[:b, :n],
        y_pend[:b, :n],
        pvalid[:b, 0] != 0,
        count1[:b, 0],
        new_progress,
    )


@jax.custom_batching.custom_vmap
def lbfgs_epilogue(
    state, x_ls, f_ls, g_ls, ls_nfev, mem_count, s_pend_old, y_pend_old,
    pvalid_old, done, progress, crit,
):
    """Fused post-line-search half of an L-BFGS iteration.

    Returns ``(new_state, s_pend, y_pend, pending_valid, mem_count,
    new_progress)`` — the finite-guarded accepted state, the next pending
    correction pair, the stall-reset history count, and the fully-updated
    (and converged-lane-frozen) progress record.
    """
    return _epilogue_xla_single(
        state, x_ls, f_ls, g_ls, ls_nfev, mem_count, s_pend_old, y_pend_old,
        pvalid_old, done, progress, crit,
    )


@lbfgs_epilogue.def_vmap
def _epilogue_vmap_rule(axis_size, in_batched, *args):
    flat_args = list(args)
    crit = flat_args[11]
    crit_batched = any(jax.tree.leaves(in_batched[11]))
    dtype = flat_args[0].x.dtype

    def bcast(a, batched):
        return jax.tree.map(
            lambda leaf, bl: leaf if bl else jnp.broadcast_to(
                leaf, (axis_size,) + jnp.shape(leaf)
            ),
            a, batched,
        )

    if (
        jax.default_backend() == "tpu"
        and dtype == jnp.float32
        and not crit_batched
    ):
        ops = [bcast(a, bt) for a, bt in zip(flat_args[:11], in_batched[:11])]
        out = epilogue_pallas_batched(*ops, crit)
    else:
        ops = [bcast(a, bt) for a, bt in zip(flat_args, in_batched)]
        out = jax.vmap(_epilogue_xla_single)(*ops)
    out_batched = jax.tree.map(lambda _: True, out)
    return out, out_batched
