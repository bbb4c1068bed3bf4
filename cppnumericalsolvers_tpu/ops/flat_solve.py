"""Flat batched L-BFGS solve: ONE loop at line-search-trip granularity.

Round-5 profiling at (B=1024, n=32) showed the nested fused path (prologue
kernel -> inner MT while_loop -> epilogue kernel) spending only ~42 us of
its 78 us per-iteration budget in device ops — the rest is op-count
overhead: the inner loop's entry/exit carry copies, two levels of loop
predicates, and ~25 small glue ops each with a fixed scheduling gap.
Swapping individual phases between Pallas and XLA moved nothing (all four
combinations measured 78-80 us): the cost is structural.

This module removes the structure.  The whole batched solve becomes a
SINGLE ``lax.while_loop`` whose trip is exactly::

    objective evaluation (XLA, vmapped)  ->  ONE Pallas kernel

The kernel (:func:`_flat_kernel`) advances every lane by one line-search
evaluation: the More-Thuente trip machinery for lanes mid-search, and — for
lanes whose search just terminated — the full iteration boundary in the
same launch: accept/finite guard, correction-pair formation, the entire
``Progress::Update`` ladder, the curvature-gated history push, the
two-loop recursion, descent-validity fallback, and the next search's
trial-0 formation.  Per objective evaluation there are exactly two device
ops plus O(1) glue, one loop predicate, and no nested loop.

Everything is batch-minor (ops/fused_step_t.py layout): history
``(m*n8, B_pad)``, vectors ``(n8, B_pad)``, and ALL per-lane scalars packed
into two ``(rows, B_pad)`` arrays (f32 and i32) so the loop carry is ~10
buffers instead of ~35.

Because the boundary work runs on every trip (masked), the two-loop cost is
paid per evaluation rather than per iteration (~1.2x at typical nfev/iter);
this is the right trade only where fixed costs dominate, so the flat path
is gated to small/mid n (see Lbfgs._FLAT_N_MAX).

Algorithmic content is IDENTICAL to the nested fused path — the MT trip
core mirrors ops/fused_linesearch.py (itself parity-pinned against the
MINPACK port), the ladder mirrors ops/fused_step.py's epilogue
(progress.h:153-327), and the push/two-loop mirrors ops/fused_step_t.py
(lbfgs.h:141-298).  End-to-end trajectory parity vs the pure-XLA lowering
is asserted on real TPU (tests_tpu/test_flat_solve_tpu.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..core.objective import FunctionState
from ..core.progress import PAST_RING_SIZE, ProgressState
from ..core.status import Status
from ..linesearch.more_thuente import (
    _FTOL,
    _GTOL,
    _STPMAX,
    _STPMIN,
    _XTOL,
    cstep,
)
from .fused_linesearch import _trial_setup
from .two_loop import _pltpu_compiler_params, _round_up, _vmem_limit_bytes
from .fused_step_t import pick_lane_tile

__all__ = ["flat_lbfgs_solve"]

_LANE = 128

# Packed f32 scalar rows.
_F_F0 = 0        # current iterate value
_F_DGINIT = 1
_F_DGTEST = 2
_F_FACC = 3      # best/accepted f during the running search
_F_STP = 4
_F_STMIN = 5
_F_STMAX = 6
_F_STX = 7
_F_FX = 8
_F_DGX = 9
_F_STY = 10
_F_FY = 11
_F_DGY = 12
_F_WIDTH = 13
_F_WIDTH1 = 14
_F_GAMMA = 15
_F_XDELTA = 16   # progress record
_F_FDELTA = 17
_F_GNORM = 18
_NF = 19

# Packed i32 scalar rows.
_I_COUNT = 0     # history count
_I_NFEV = 1      # cumulative state nfev
_I_NUMIT = 2
_I_XVIOL = 3
_I_FVIOL = 4
_I_STATUS = 5
_I_PASTPOS = 6
_I_BRACKT = 7
_I_STAGE1 = 8
_I_LSNFEV = 9
_I_INFO = 10
_I_INFOC = 11
_NI = 12


def _flat_kernel(
    # inputs (carry + this trip's evaluation + criteria)
    x0_ref, g0_ref, sdir_ref, gacc_ref, s_ref, y_ref, ring_ref,
    sf_ref, si_ref, ft_ref, gt_ref, critf_ref, criti_ref,
    # outputs (carry)
    x0_o, g0_o, sdir_o, gacc_o, s_o, y_o, ring_o, sf_o, si_o, xtrial_o,
    *, m: int, n8: int, max_fev: int,
):
    dtype = x0_ref.dtype
    eps = jnp.finfo(dtype).eps
    i32 = jnp.int32
    cont = i32(int(Status.CONTINUE))

    def frow(j):
        return sf_ref[j:j + 1, :]  # (1, TB)

    def irow(j):
        return si_ref[j:j + 1, :]

    def rdot(a, b):
        return jnp.sum(a * b, axis=0, keepdims=True)

    x0 = x0_ref[:]          # (n8, TB)
    g0 = g0_ref[:]
    sdir = sdir_ref[:]
    g_t = gt_ref[:]
    f_t = ft_ref[:]         # (1, TB)

    status = irow(_I_STATUS)
    live = status == cont
    info_in = irow(_I_INFO)
    active = jnp.logical_and(live, info_in == 0)  # lanes mid-search

    f0 = frow(_F_F0)
    dginit = frow(_F_DGINIT)
    dgtest = frow(_F_DGTEST)
    stp = frow(_F_STP)
    stmin = frow(_F_STMIN)
    stmax = frow(_F_STMAX)
    stx = frow(_F_STX)
    fx = frow(_F_FX)
    dgx = frow(_F_DGX)
    sty = frow(_F_STY)
    fy = frow(_F_FY)
    dgy = frow(_F_DGY)
    width = frow(_F_WIDTH)
    width1 = frow(_F_WIDTH1)
    brackt = irow(_I_BRACKT) != 0
    stage1_i = irow(_I_STAGE1)
    ls_nfev = irow(_I_LSNFEV)
    infoc = irow(_I_INFOC)

    # ------------------------------------------------------------------
    # More-Thuente trip (mirrors ops/fused_linesearch.py _mt_trip_core,
    # batch-minor orientation).
    # ------------------------------------------------------------------
    dg = rdot(g_t, sdir)
    ftest1 = f0 + stp * dgtest
    nfev1 = ls_nfev + 1

    info_new = jnp.where(
        jnp.logical_or(
            jnp.logical_and(
                brackt, jnp.logical_or(stp <= stmin, stp >= stmax)
            ),
            infoc == 0,
        ),
        i32(6),
        i32(0),
    )
    info_new = jnp.where(
        jnp.logical_and(
            jnp.logical_and(stp == _STPMAX, f_t <= ftest1), dg <= dgtest
        ),
        i32(5),
        info_new,
    )
    info_new = jnp.where(
        jnp.logical_and(
            stp == _STPMIN, jnp.logical_or(f_t > ftest1, dg >= dgtest)
        ),
        i32(4),
        info_new,
    )
    info_new = jnp.where(nfev1 >= np.int32(max_fev), i32(3), info_new)
    info_new = jnp.where(
        jnp.logical_and(brackt, stmax - stmin <= _XTOL * stmax),
        i32(2),
        info_new,
    )
    info_new = jnp.where(
        jnp.logical_and(f_t <= ftest1, jnp.abs(dg) <= _GTOL * (-dginit)),
        i32(1),
        info_new,
    )
    searching = jnp.logical_and(active, info_new == 0)

    stage1_new_i = jnp.where(
        jnp.logical_and(
            jnp.logical_and(stage1_i != 0, f_t <= ftest1),
            dg >= min(_FTOL, _GTOL) * dginit,
        ),
        i32(0),
        stage1_i,
    )

    use_modified = jnp.logical_and(
        jnp.logical_and(stage1_new_i != 0, f_t <= fx), f_t > ftest1
    )
    fm = jnp.where(use_modified, f_t - stp * dgtest, f_t)
    fxm = jnp.where(use_modified, fx - stx * dgtest, fx)
    fym = jnp.where(use_modified, fy - sty * dgtest, fy)
    dgm = jnp.where(use_modified, dg - dgtest, dg)
    dgxm = jnp.where(use_modified, dgx - dgtest, dgx)
    dgym = jnp.where(use_modified, dgy - dgtest, dgy)

    cs = cstep(
        stx, fxm, dgxm, sty, fym, dgym, stp, fm, dgm, brackt, stmin, stmax
    )
    infoc_new = cs.info
    stx_c = cs.stx
    fx_c = jnp.where(use_modified, cs.fx + cs.stx * dgtest, cs.fx)
    dgx_c = jnp.where(use_modified, cs.dx + dgtest, cs.dx)
    sty_c = cs.sty
    fy_c = jnp.where(use_modified, cs.fy + cs.sty * dgtest, cs.fy)
    dgy_c = jnp.where(use_modified, cs.dy + dgtest, cs.dy)
    stp_c = cs.stp
    brackt_c = cs.brackt

    stp_c = jnp.where(
        jnp.logical_and(brackt_c, jnp.abs(sty_c - stx_c) >= 0.66 * width1),
        stx_c + 0.5 * (sty_c - stx_c),
        stp_c,
    )
    width1_c = jnp.where(brackt_c, width, width1)
    width_c = jnp.where(brackt_c, jnp.abs(sty_c - stx_c), width)

    stp_t, stmin_t, stmax_t = _trial_setup(
        stp_c, stx_c, sty_c, brackt_c, nfev1, infoc_new, max_fev
    )

    def upd(new, old):
        return jnp.where(searching, new, old)

    stp1 = upd(stp_t, stp)
    stmin1 = upd(stmin_t, stmin)
    stmax1 = upd(stmax_t, stmax)
    stx1 = upd(stx_c, stx)
    fx1 = upd(fx_c, fx)
    dgx1 = upd(dgx_c, dgx)
    sty1 = upd(sty_c, sty)
    fy1 = upd(fy_c, fy)
    dgy1 = upd(dgy_c, dgy)
    width_1 = upd(width_c, width)
    width1_1 = upd(width1_c, width1)
    brackt1 = jnp.where(searching, brackt_c.astype(i32), irow(_I_BRACKT))
    stage1_1 = jnp.where(searching, stage1_new_i, stage1_i)
    gacc1 = jnp.where(active, g_t, gacc_ref[:])
    facc1 = jnp.where(active, f_t, frow(_F_FACC))
    ls_nfev1 = jnp.where(active, nfev1, ls_nfev)
    info1 = jnp.where(active, info_new, info_in)

    # ------------------------------------------------------------------
    # Iteration boundary: lanes whose search is over (info != 0) and that
    # are still live run accept + Progress::Update + push/two-loop + next
    # trial-0 — mirrors ops/fused_step.py's epilogue ladder and
    # ops/fused_step_t.py's prologue, in one place.
    # ------------------------------------------------------------------
    boundary = jnp.logical_and(live, info1 != 0)

    # Accepted line-search result (ops/fused_linesearch.py _mt_loop final
    # selection: lanes that never evaluated return the start).
    evaled = ls_nfev1 > 0
    x_ls = jnp.where(evaled, x0 + stp1 * sdir, x0)
    f_ls = jnp.where(evaled, facc1, f0)
    g_ls = jnp.where(evaled, gacc1, g0)

    finite = jnp.isfinite(f_ls)
    take = jnp.logical_and(finite, boundary)
    x1 = jnp.where(take, x_ls, x0)
    f1 = jnp.where(take, f_ls, f0)
    g1 = jnp.where(take, g_ls, g0)
    nfev_st = jnp.where(
        boundary, irow(_I_NFEV) + ls_nfev1, irow(_I_NFEV)
    )

    s_new = x1 - x0
    y_new = g1 - g0
    x_delta = jnp.max(jnp.abs(s_new), axis=0, keepdims=True)
    stalled = x_delta <= 0.0
    count = irow(_I_COUNT)
    count = jnp.where(jnp.logical_and(boundary, stalled), i32(0), count)

    # --- Progress::Update ladder (progress.h:153-327), masked by boundary.
    num_it = jnp.where(boundary, irow(_I_NUMIT) + 1, irow(_I_NUMIT))
    f_delta = jnp.abs(f1 - f0)
    grad_norm = jnp.max(jnp.abs(g1), axis=0, keepdims=True)
    one = jnp.ones((), dtype)
    lane = num_it.shape

    def crit_f(j):
        return jnp.full(lane, critf_ref[0, j], dtype)

    def crit_i(j):
        return jnp.full(lane, criti_ref[0, j], i32)

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

    st = jnp.full(lane, int(Status.CONTINUE), i32)
    fire = jnp.logical_and(max_iter > 0, num_it > max_iter)
    st = jnp.where(
        jnp.logical_and(st == cont, fire),
        i32(int(Status.ITERATION_LIMIT)), st,
    )
    reached = st == cont
    xv_cond = jnp.logical_and(xd_thresh > 0, x_delta < xd_thresh)
    x_viol = jnp.where(
        reached,
        jnp.where(xv_cond, irow(_I_XVIOL) + 1, i32(0)),
        irow(_I_XVIOL),
    )
    fire = jnp.logical_and(xv_cond, x_viol >= xv_limit)
    st = jnp.where(
        jnp.logical_and(st == cont, fire),
        i32(int(Status.X_DELTA_VIOLATION)), st,
    )
    reached = st == cont
    f_scale = jnp.where(
        f_rel,
        jnp.maximum(jnp.maximum(jnp.abs(f1), jnp.abs(f0)), one),
        one,
    )
    fv_cond = jnp.logical_and(fd_thresh > 0, f_delta < fd_thresh * f_scale)
    f_viol = jnp.where(
        reached,
        jnp.where(fv_cond, irow(_I_FVIOL) + 1, i32(0)),
        irow(_I_FVIOL),
    )
    fire = jnp.logical_and(fv_cond, f_viol >= fv_limit)
    st = jnp.where(
        jnp.logical_and(st == cont, fire),
        i32(int(Status.F_DELTA_VIOLATION)), st,
    )
    reached = st == cont
    past_active = past > 0
    ring = ring_ref[:]  # (RING, TB)
    ring = jnp.where(
        jnp.logical_and(
            jnp.logical_and(past_active, num_it == 1), boundary
        ),
        f1,
        ring,
    )
    rowids = jax.lax.broadcasted_iota(i32, ring.shape, 0)
    sel = rowids == irow(_I_PASTPOS)
    past_f = jnp.sum(
        jnp.where(sel, ring, jnp.zeros((), dtype)), axis=0, keepdims=True
    )
    rate = jnp.abs(past_f - f1) / jnp.maximum(one, jnp.abs(f1))
    plateau = jnp.logical_and(
        jnp.logical_and(past_active, num_it > past), rate < past_delta
    )
    st = jnp.where(
        jnp.logical_and(st == cont, plateau),
        i32(int(Status.F_DELTA_VIOLATION)), st,
    )
    write_ring = jnp.logical_and(
        jnp.logical_and(jnp.logical_and(past_active, st == cont), reached),
        boundary,
    )
    ring = jnp.where(jnp.logical_and(sel, write_ring), f1, ring)
    pp = irow(_I_PASTPOS)
    past_pos1 = jnp.where(
        write_ring,
        jnp.where(pp + 1 >= past, i32(0), pp + 1),
        pp,
    )
    xmax = jnp.max(jnp.abs(x1), axis=0, keepdims=True)
    g_scale = jnp.where(g_rel, jnp.maximum(one, xmax), one)
    fire = jnp.logical_and(gn_thresh > 0, grad_norm < gn_thresh * g_scale)
    st = jnp.where(
        jnp.logical_and(st == cont, fire),
        i32(int(Status.GRADIENT_NORM_VIOLATION)), st,
    )
    status1 = jnp.where(boundary, st, status)

    # Progress observability records.
    x_delta_rec = jnp.where(boundary, x_delta, frow(_F_XDELTA))
    f_delta_rec = jnp.where(boundary, f_delta, frow(_F_FDELTA))
    gnorm_rec = jnp.where(boundary, grad_norm, frow(_F_GNORM))

    # --- History push + two-loop + fallback + trial-0 (prologue) -------
    # The push must NOT land for lanes that just converged: the nested
    # path's next-prologue gates the pending pair by ``done``
    # (lbfgs.h event order preserved: resets, then push, then two-loop).
    push_live = jnp.logical_and(boundary, status1 == cont)
    valid = jnp.logical_and(push_live, finite)

    sy = rdot(s_new, y_new)
    s2 = rdot(s_new, s_new)
    y2 = rdot(y_new, y_new)
    threshold = eps * jnp.sqrt(s2) * jnp.sqrt(y2)
    accept = jnp.logical_and(valid, sy > threshold)
    full = count >= m
    slot = jnp.minimum(count, m - 1)
    new_count = jnp.where(
        jnp.logical_and(accept, jnp.logical_not(full)), count + 1, count
    )
    gamma = frow(_F_GAMMA)
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
        s_o[r * n8:(r + 1) * n8, :] = jnp.where(write, s_new, base_s)
        y_o[r * n8:(r + 1) * n8, :] = jnp.where(write, y_new, base_y)

    alphas = [None] * m
    denoms = [None] * m
    usables = [None] * m
    q = g1
    for r in range(m - 1, -1, -1):
        s_r = row(s_o, r)
        y_r = row(y_o, r)
        act = new_count > r
        denom = rdot(s_r, y_r)
        usable = jnp.logical_and(act, jnp.abs(denom) >= eps)
        rho = jnp.where(usable, 1.0 / denom, 0.0)
        alpha = rho * rdot(s_r, q)
        q = jnp.where(usable, q - alpha * y_r, q)
        alphas[r], denoms[r], usables[r] = alpha, denom, usable

    q = q * new_gamma

    for r in range(m):
        s_r = row(s_o, r)
        y_r = row(y_o, r)
        usable = usables[r]
        rho = jnp.where(usable, 1.0 / denoms[r], 0.0)
        beta = rho * rdot(y_r, q)
        q = jnp.where(usable, q + s_r * (alphas[r] - beta), q)

    xnorm = jnp.sqrt(rdot(x1, x1))
    relative_eps = eps * jnp.maximum(1.0, xnorm)
    descent = -rdot(g1, q)
    dnorm = jnp.sqrt(rdot(q, q))
    gnorm_full = jnp.sqrt(rdot(g1, g1))

    alpha0 = jnp.where(
        new_count == 0, jnp.where(dnorm > eps, 1.0 / dnorm, one), one
    )
    invalid = jnp.logical_or(
        jnp.logical_not(jnp.isfinite(descent)), descent > -eps * relative_eps
    )
    dir_ = jnp.where(invalid, g1, q)
    alpha0 = jnp.where(
        invalid, jnp.where(gnorm_full > eps, 1.0 / gnorm_full, one), alpha0
    )
    new_count = jnp.where(
        jnp.logical_and(invalid, push_live), i32(0), new_count
    )
    ls_dir_new = -dir_
    dginit_new = rdot(g1, ls_dir_new)
    dgtest_new = _FTOL * dginit_new

    # Trial-0 formation for the NEXT search (fused_linesearch.py _mt_loop
    # init; non-descent lanes abort before the first evaluation).
    zero = jnp.zeros(lane, dtype)
    zero_i = jnp.zeros(lane, i32)
    one_i = jnp.ones(lane, i32)
    no_descent = dginit_new >= 0.0
    stp_t0, stmin0, stmax0 = _trial_setup(
        alpha0, zero, zero, jnp.zeros(lane, jnp.bool_), zero_i, one_i,
        max_fev,
    )
    stp0 = jnp.where(no_descent, alpha0, stp_t0)
    info0 = jnp.where(no_descent, i32(-1), i32(0))
    big_width = jnp.full(lane, _STPMAX - _STPMIN, dtype)

    # ------------------------------------------------------------------
    # Merge: boundary lanes reset their search; searching lanes keep the
    # trip results; dead lanes freeze everything.
    # ------------------------------------------------------------------
    def sel3(bnd_val, search_val):
        return jnp.where(boundary, bnd_val, search_val)

    x0_out = sel3(x1, x0)
    g0_out = sel3(g1, g0)
    sdir_out = jnp.where(boundary, ls_dir_new, sdir)
    gacc_out = jnp.where(boundary, g1, gacc1)

    sf_rows = [None] * _NF
    sf_rows[_F_F0] = sel3(f1, f0)
    sf_rows[_F_DGINIT] = sel3(dginit_new, dginit)
    sf_rows[_F_DGTEST] = sel3(dgtest_new, dgtest)
    sf_rows[_F_FACC] = sel3(f1, facc1)
    sf_rows[_F_STP] = sel3(stp0, stp1)
    sf_rows[_F_STMIN] = sel3(stmin0, stmin1)
    sf_rows[_F_STMAX] = sel3(stmax0, stmax1)
    sf_rows[_F_STX] = sel3(zero, stx1)
    sf_rows[_F_FX] = sel3(f1, fx1)
    sf_rows[_F_DGX] = sel3(dginit_new, dgx1)
    sf_rows[_F_STY] = sel3(zero, sty1)
    sf_rows[_F_FY] = sel3(f1, fy1)
    sf_rows[_F_DGY] = sel3(dginit_new, dgy1)
    sf_rows[_F_WIDTH] = sel3(big_width, width_1)
    sf_rows[_F_WIDTH1] = sel3(2.0 * big_width, width1_1)
    sf_rows[_F_GAMMA] = sel3(new_gamma, gamma)
    sf_rows[_F_XDELTA] = x_delta_rec
    sf_rows[_F_FDELTA] = f_delta_rec
    sf_rows[_F_GNORM] = gnorm_rec
    sf_o[:] = jnp.concatenate(sf_rows, axis=0)

    si_rows = [None] * _NI
    si_rows[_I_COUNT] = sel3(new_count, count)
    si_rows[_I_NFEV] = nfev_st
    si_rows[_I_NUMIT] = num_it
    si_rows[_I_XVIOL] = jnp.where(boundary, x_viol, irow(_I_XVIOL))
    si_rows[_I_FVIOL] = jnp.where(boundary, f_viol, irow(_I_FVIOL))
    si_rows[_I_STATUS] = status1
    si_rows[_I_PASTPOS] = jnp.where(boundary, past_pos1, irow(_I_PASTPOS))
    si_rows[_I_BRACKT] = sel3(zero_i, brackt1)
    si_rows[_I_STAGE1] = sel3(one_i, stage1_1)
    si_rows[_I_LSNFEV] = sel3(zero_i, ls_nfev1)
    si_rows[_I_INFO] = sel3(info0, info1)
    si_rows[_I_INFOC] = sel3(one_i, infoc)
    si_o[:] = jnp.concatenate(si_rows, axis=0)

    ring_o[:] = jnp.where(boundary, ring, ring_ref[:])
    x0_o[:] = x0_out
    g0_o[:] = g0_out
    sdir_o[:] = sdir_out
    gacc_o[:] = gacc_out
    # Next trial point: boundary lanes start their new search; searching
    # lanes continue; lanes that are (or just became) done re-evaluate
    # their finite iterate — a wasted but harmless lane, exactly like the
    # nested MT loop's frozen lanes.
    live1 = status1 == cont
    next_stp = sel3(stp0, stp1)
    xtrial = x0_out + jnp.where(live1, next_stp, jnp.zeros(lane, dtype)) * \
        jnp.where(boundary, ls_dir_new, sdir)
    xtrial_o[:] = xtrial


def flat_lbfgs_solve(
    objective,
    state0: FunctionState,
    stopping,
    m: int,
    max_fev: int,
    interpret: bool = False,
):
    """Run the flat batched solve.  ``state0`` is the evaluated batched
    start (B, n); returns ``(FunctionState, (s_mem_t, y_mem_t, count,
    gamma), ProgressState)`` with history in transposed storage."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, n = state0.x.shape
    dtype = state0.x.dtype
    n8 = _round_up(n, 8)
    b_pad = _round_up(b, _LANE)
    i32 = jnp.int32

    def tvec(a):  # (B, n) -> (n8, B_pad)
        return jnp.zeros((n8, b_pad), dtype).at[:n, :b].set(a.T)

    def trow(a, dt, fill=0):
        return jnp.full((b_pad,), fill, dt).at[:b].set(a.astype(dt))

    x0_t = tvec(state0.x)
    g0_t = tvec(state0.gradient)
    f0 = trow(state0.value, dtype)
    nfev0 = trow(state0.nfev, i32)

    # --- Initial direction: steepest descent (empty history), exactly the
    # prologue's count==0 path (lbfgs.h:199-213).
    gnorm = jnp.sqrt(jnp.sum(g0_t * g0_t, axis=0))
    eps = jnp.finfo(dtype).eps
    sdir0 = -g0_t
    alpha0 = jnp.where(gnorm > eps, 1.0 / gnorm, 1.0)
    dginit0 = -gnorm * gnorm
    dgtest0 = _FTOL * dginit0

    zero = jnp.zeros((b_pad,), dtype)
    zero_i = jnp.zeros((b_pad,), i32)
    one_i = jnp.ones((b_pad,), i32)
    no_descent = dginit0 >= 0.0
    stp_t0, stmin0, stmax0 = _trial_setup(
        alpha0, zero, zero, jnp.zeros((b_pad,), bool), zero_i, one_i, max_fev
    )
    stp0 = jnp.where(no_descent, alpha0, stp_t0)
    info0 = jnp.where(no_descent, i32(-1), i32(0))
    big_width = jnp.full((b_pad,), _STPMAX - _STPMIN, dtype)

    sf = jnp.zeros((_NF, b_pad), dtype)
    for j, v in {
        _F_F0: f0, _F_DGINIT: dginit0, _F_DGTEST: dgtest0, _F_FACC: f0,
        _F_STP: stp0, _F_STMIN: stmin0, _F_STMAX: stmax0,
        _F_STX: zero, _F_FX: f0, _F_DGX: dginit0,
        _F_STY: zero, _F_FY: f0, _F_DGY: dginit0,
        _F_WIDTH: big_width, _F_WIDTH1: 2.0 * big_width,
        _F_GAMMA: jnp.ones((b_pad,), dtype),
        # Progress records start at zero exactly like init_progress().
        _F_XDELTA: zero,
        _F_FDELTA: zero,
        _F_GNORM: zero,
    }.items():
        sf = sf.at[j].set(v)

    # Pad lanes are born dead (ITERATION_LIMIT) so they stay inert.
    status0 = jnp.full((b_pad,), int(Status.ITERATION_LIMIT), i32).at[:b].set(
        int(Status.CONTINUE)
    )
    si = jnp.zeros((_NI, b_pad), i32)
    for j, v in {
        _I_NFEV: nfev0, _I_STATUS: status0, _I_INFO: info0,
        _I_STAGE1: one_i, _I_INFOC: one_i,
    }.items():
        si = si.at[j].set(v)

    s_mem = jnp.zeros((m * n8, b_pad), dtype)
    y_mem = jnp.zeros((m * n8, b_pad), dtype)
    ring = jnp.zeros((PAST_RING_SIZE, b_pad), dtype)
    xtrial0 = (x0_t + stp0[None, :] * sdir0)

    critf = jnp.stack(
        [stopping.x_delta, stopping.f_delta, stopping.past_delta,
         stopping.gradient_norm]
    ).astype(dtype).reshape(1, 4)
    criti = jnp.stack(
        [stopping.max_iterations, stopping.x_delta_violations,
         stopping.f_delta_violations, stopping.past,
         stopping.f_delta_relative.astype(i32),
         stopping.gradient_norm_relative.astype(i32)]
    ).astype(i32).reshape(1, 6)

    itemsize = jnp.dtype(dtype).itemsize
    bytes_per_lane = (
        4 * m * n8 + 11 * n8 + 2 * (_NF + _NI) + 2 * PAST_RING_SIZE + 16
    ) * itemsize
    budget = _vmem_limit_bytes()
    budget = (16 << 20) if budget is None else int(budget * 0.4)
    tb = pick_lane_tile(b_pad, bytes_per_lane, budget)

    izero = np.int32(0)
    lanemap = lambda i: (izero, i)  # noqa: E731
    vspec = pl.BlockSpec((n8, tb), lanemap, memory_space=pltpu.VMEM)
    hspec = pl.BlockSpec((m * n8, tb), lanemap, memory_space=pltpu.VMEM)
    rspec = pl.BlockSpec(
        (PAST_RING_SIZE, tb), lanemap, memory_space=pltpu.VMEM
    )
    fspec = pl.BlockSpec((_NF, tb), lanemap, memory_space=pltpu.VMEM)
    ispec = pl.BlockSpec((_NI, tb), lanemap, memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec((1, tb), lanemap, memory_space=pltpu.VMEM)
    smem4 = pl.BlockSpec((1, 4), lambda i: (izero, izero),
                         memory_space=pltpu.SMEM)
    smem6 = pl.BlockSpec((1, 6), lambda i: (izero, izero),
                         memory_space=pltpu.SMEM)

    step = pl.pallas_call(
        functools.partial(_flat_kernel, m=m, n8=n8, max_fev=max_fev),
        out_shape=(
            jax.ShapeDtypeStruct((n8, b_pad), dtype),  # x0
            jax.ShapeDtypeStruct((n8, b_pad), dtype),  # g0
            jax.ShapeDtypeStruct((n8, b_pad), dtype),  # sdir
            jax.ShapeDtypeStruct((n8, b_pad), dtype),  # gacc
            jax.ShapeDtypeStruct((m * n8, b_pad), dtype),
            jax.ShapeDtypeStruct((m * n8, b_pad), dtype),
            jax.ShapeDtypeStruct((PAST_RING_SIZE, b_pad), dtype),
            jax.ShapeDtypeStruct((_NF, b_pad), dtype),
            jax.ShapeDtypeStruct((_NI, b_pad), jnp.int32),
            jax.ShapeDtypeStruct((n8, b_pad), dtype),  # x_trial
        ),
        grid=(b_pad // tb,),
        in_specs=[vspec, vspec, vspec, vspec, hspec, hspec, rspec, fspec,
                  ispec, sspec, vspec, smem4, smem6],
        out_specs=(vspec, vspec, vspec, vspec, hspec, hspec, rspec, fspec,
                   ispec, vspec),
        # Donate every carried buffer into its successor; g_t (input 10)
        # is dead after the kernel and hosts the next trial point.
        input_output_aliases={
            0: 0, 1: 1, 2: 2, 3: 3, 4: 4, 5: 5, 6: 6, 7: 7, 8: 8, 10: 9,
        },
        compiler_params=_pltpu_compiler_params(pltpu, _vmem_limit_bytes()),
        interpret=interpret,
    )

    bvag = jax.vmap(objective.value_and_grad)

    def cond(carry):
        si_ = carry[8]
        return jnp.any(si_[_I_STATUS] == int(Status.CONTINUE))

    aligned = b == b_pad and n == n8

    def body(carry):
        (x0_, g0_, sdir_, gacc_, s_, y_, ring_, sf_, si_, xtrial_) = carry
        # Layout boundary per trip: only the transposes are real work when
        # the shapes already align (reshape of (B,) -> (1, B) is free);
        # ragged shapes pay the explicit zero-pads.
        xt = (xtrial_ if aligned else xtrial_[:n, :b]).T  # (B, n)
        f_t, g_t = bvag(xt)
        if aligned:
            ft_row = f_t.reshape(1, b_pad)
            gt_t = g_t.T
        else:
            ft_row = jnp.zeros((1, b_pad), dtype).at[0, :b].set(f_t)
            gt_t = jnp.zeros((n8, b_pad), dtype).at[:n, :b].set(g_t.T)
        outs = step(
            x0_, g0_, sdir_, gacc_, s_, y_, ring_, sf_, si_, ft_row, gt_t,
            critf, criti,
        )
        return outs

    init = (x0_t, g0_t, sdir0, g0_t, s_mem, y_mem, ring, sf, si, xtrial0)
    final = lax.while_loop(cond, body, init)
    (x0_f, g0_f, _sdir, _gacc, s_f, y_f, ring_f, sf_f, si_f, _xt) = final

    state = FunctionState(
        x=x0_f[:n, :b].T,
        value=sf_f[_F_F0, :b],
        gradient=g0_f[:n, :b].T,
        nfev=si_f[_I_NFEV, :b],
    )
    progress = ProgressState(
        num_iterations=si_f[_I_NUMIT, :b],
        x_delta=sf_f[_F_XDELTA, :b],
        x_delta_violations=si_f[_I_XVIOL, :b],
        f_delta=sf_f[_F_FDELTA, :b],
        f_delta_violations=si_f[_I_FVIOL, :b],
        gradient_norm=sf_f[_F_GNORM, :b],
        condition_hessian=jnp.zeros((b,), dtype),
        status=si_f[_I_STATUS, :b],
        past_ring=ring_f[:, :b].T,
        past_pos=si_f[_I_PASTPOS, :b],
    )
    internals = (
        s_f, y_f, si_f[_I_COUNT, :b], sf_f[_F_GAMMA, :b]
    )
    return state, internals, progress
