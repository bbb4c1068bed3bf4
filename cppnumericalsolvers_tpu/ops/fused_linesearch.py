"""Fused More-Thuente line search — collapsing the last non-kernel residue.

Round-3 roofline measurements (ROOFLINE.md) put the More-Thuente
``lax.while_loop`` body at ~71-73% of the batched L-BFGS step time at
n >= 1024: under the batch-native driver the search's while_loop is the
*vmapped* single-instance loop, so every trip pays ~a dozen separate O(Bn)
XLA dispatches (trial-point formation, the directional-derivative reduction,
the termination ladder, the cstep interpolation machinery, bracket/best-seen
selects) plus the batching rule's broadcast-select over the whole carry.

This module runs the search as ONE batch-level ``lax.while_loop`` whose body
is exactly::

    objective evaluation (XLA, vmapped)  ->  post-eval Pallas kernel

The kernel (:func:`_mt_kernel`) fuses the entire remainder of a search trip
in one launch: the directional derivative, the MINPACK termination ladder
(more_thuente.h:205-216), the stage-1 modified-function frame and ``cstep``
interpolation (more_thuente.h:221-244, :261-407 — the same branch-free
:func:`~cppnumericalsolvers_tpu.linesearch.more_thuente.cstep` the oracle
path uses, called on (TB, 1) vectors), the forced bisection and width
updates (:246-252), per-lane termination freezing, and the NEXT trip's
trial-point formation ``x0 + stp * d`` (:178-195) — so converged lanes idle
in VMEM selects instead of XLA dispatches.

The trip math lives in ONE place (:func:`_mt_trip_core`) executed two ways:
as the Pallas kernel on the TPU/f32 path, and as plain XLA ops in the
batch-native fallback loop (:func:`mt_xla_batched`) that serves f64 (the
MGH reliability suite), CPU, and non-tileable shapes — still one while_loop
at batch level, so no path pays the vmapped-while broadcast-select.  The
single-instance oracle is
:func:`cppnumericalsolvers_tpu.linesearch.more_thuente.more_thuente`
itself: un-batched calls of the :func:`batched_more_thuente` custom_vmap op
lower to it verbatim, and both batched forms are parity-tested against it,
so the fused paths cannot drift semantically from the MINPACK port.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..linesearch.more_thuente import (
    _FTOL,
    _GTOL,
    _STPMAX,
    _STPMIN,
    _XTOL,
    _XTRAPF,
    DEFAULT_MAX_FEV,
    cstep,
    more_thuente,
)
from .two_loop import (
    _pick_tile_b,
    _pltpu_compiler_params,
    _SUBLANE,
    _vmem_limit_bytes,
)

__all__ = ["batched_more_thuente", "mt_pallas_batched"]


def _trial_setup(stp, stx, sty, brackt, nfev, infoc, max_fev):
    """Pre-evaluation trial-step formation (more_thuente.h:178-195).

    Computes the interval bounds for the next trial, clamps the step, and
    applies the unreliable-trial fallback (re-test at the best step so far).
    Pure jnp on any shape — used for trip 0 in XLA and for trip k+1 inside
    the Pallas kernel.  Returns ``(stp_trial, stmin, stmax)``.
    """
    stmin = jnp.where(brackt, jnp.minimum(stx, sty), stx)
    stmax = jnp.where(
        brackt, jnp.maximum(stx, sty), stp + _XTRAPF * (stp - stx)
    )
    # maximum/minimum with weak Python-float literals, not jnp.clip: clip
    # materialises its scalar bounds as f64 constants under jax_enable_x64,
    # and the in-kernel f64->f32 truncf is a Mosaic legalization failure.
    stp_c = jnp.minimum(jnp.maximum(stp, _STPMIN), _STPMAX)
    fallback = jnp.logical_or(
        jnp.logical_or(
            jnp.logical_and(
                brackt,
                jnp.logical_or(stp_c <= stmin, stp_c >= stmax),
            ),
            nfev >= np.int32(max_fev - 1),
        ),
        jnp.logical_or(
            infoc == 0,
            jnp.logical_and(brackt, (stmax - stmin) <= _XTOL * stmax),
        ),
    )
    return jnp.where(fallback, stx, stp_c), stmin, stmax


def _mt_trip_core(
    x0, s, finit, dginit, dgtest, f_t, g_t,
    gacc, facc, stp, stmin, stmax,
    stx, fx, dgx, sty, fy, dgy, width, width1,
    brackt_i, stage1_i, nfev_in, info_in, infoc,
    *, max_fev,
):
    """The complete post-evaluation half of a More-Thuente trip plus the
    next trip's trial formation, mirroring the single-instance loop body's
    exact op order (linesearch/more_thuente.py body()).  Every early return
    of the C++ (termination, already-terminated lanes) is a vector-mask
    select.

    Pure (batch, 1)-column arithmetic plus three O(batch*n) ops (the dg
    reduction, the accepted-gradient select, the trial-point FMA) — the
    single source of truth for the trip math, executed two ways: loaded
    into VMEM by the Pallas kernel (:func:`_mt_kernel`) on the TPU/f32
    path, and called directly on arrays by the XLA batch-native fallback
    loop (any backend/dtype/shape).  Returns the 19-element carry-out
    tuple.
    """
    i32 = jnp.int32
    brackt = brackt_i != 0
    active = info_in == 0  # lanes still searching this trip

    # Directional derivative + sufficient-decrease threshold
    # (more_thuente.h:199-203).
    dg = jnp.sum(g_t * s, axis=-1, keepdims=True)
    ftest1 = finit + stp * dgtest
    nfev1 = nfev_in + 1

    # Termination ladder — later assignments override earlier
    # (more_thuente.h:205-216).
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
    # Lanes that remain searching after this trip run the cstep machinery
    # and form a fresh trial; terminated lanes keep the evaluated stp and
    # freeze their bracketing state (the single body's pick()).
    searching = jnp.logical_and(active, info_new == 0)

    # stage1 drop (i32-domain select; see ops/fused_step.py's Mosaic note).
    stage1_new_i = jnp.where(
        jnp.logical_and(
            jnp.logical_and(stage1_i != 0, f_t <= ftest1),
            # Python min, not jnp.minimum: two Python floats through a jnp
            # op materialise an f64 constant under jax_enable_x64, whose
            # in-kernel f64->f32 truncf Mosaic cannot legalize; a weak
            # Python literal adopts the array dtype.
            dg >= min(_FTOL, _GTOL) * dginit,
        ),
        i32(0),
        stage1_i,
    )

    # Modified-function frame during stage 1 (more_thuente.h:221-244).
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

    # Forced bisection when the bracket shrinks too slowly
    # (more_thuente.h:246-252).
    stp_c = jnp.where(
        jnp.logical_and(brackt_c, jnp.abs(sty_c - stx_c) >= 0.66 * width1),
        stx_c + 0.5 * (sty_c - stx_c),
        stp_c,
    )
    width1_c = jnp.where(brackt_c, width, width1)
    width_c = jnp.where(brackt_c, jnp.abs(sty_c - stx_c), width)

    # Next trip's trial formation (more_thuente.h:178-195) for lanes still
    # searching; terminated/frozen lanes keep their stp, so their x_trial
    # recomputes to the accepted point (idempotent).
    stp_t, stmin_t, stmax_t = _trial_setup(
        stp_c, stx_c, sty_c, brackt_c, nfev1, infoc_new, max_fev
    )

    def upd(new, old):
        return jnp.where(searching, new, old)

    stp_out = upd(stp_t, stp)
    return (
        x0 + stp_out * s,  # x_trial
        jnp.where(active, g_t, gacc),
        jnp.where(active, f_t, facc),
        stp_out,
        upd(stmin_t, stmin),
        upd(stmax_t, stmax),
        upd(stx_c, stx),
        upd(fx_c, fx),
        upd(dgx_c, dgx),
        upd(sty_c, sty),
        upd(fy_c, fy),
        upd(dgy_c, dgy),
        upd(width_c, width),
        upd(width1_c, width1),
        jnp.where(searching, brackt_c.astype(i32), brackt_i),
        jnp.where(searching, stage1_new_i, stage1_i),
        jnp.where(active, nfev1, nfev_in),
        jnp.where(active, info_new, info_in),
        jnp.where(searching, infoc_new, infoc),
    )


def _mt_kernel(
    # loop-invariant blocks
    x0_ref, s_ref, finit_ref, dginit_ref, dgtest_ref,
    # this trip's objective evaluation
    ft_ref, gt_ref,
    # carry in
    gacc_ref, facc_ref, stp_ref, stmin_ref, stmax_ref,
    stx_ref, fx_ref, dgx_ref, sty_ref, fy_ref, dgy_ref,
    width_ref, width1_ref,
    brackt_ref, stage1_ref, nfev_ref, info_ref, infoc_ref,
    # outputs (carry out)
    xtrial_ref, gacco_ref, facco_ref, stpo_ref, stmino_ref, stmaxo_ref,
    stxo_ref, fxo_ref, dgxo_ref, styo_ref, fyo_ref, dgyo_ref,
    widtho_ref, width1o_ref,
    brackto_ref, stage1o_ref, nfevo_ref, infoo_ref, infoco_ref,
    *, max_fev,
):
    """One (TB, ·) block: :func:`_mt_trip_core` in a single VMEM residency."""
    outs = _mt_trip_core(
        x0_ref[:], s_ref[:], finit_ref[:], dginit_ref[:], dgtest_ref[:],
        ft_ref[:], gt_ref[:],
        gacc_ref[:], facc_ref[:], stp_ref[:], stmin_ref[:], stmax_ref[:],
        stx_ref[:], fx_ref[:], dgx_ref[:], sty_ref[:], fy_ref[:], dgy_ref[:],
        width_ref[:], width1_ref[:],
        brackt_ref[:], stage1_ref[:], nfev_ref[:], info_ref[:], infoc_ref[:],
        max_fev=max_fev,
    )
    out_refs = (
        xtrial_ref, gacco_ref, facco_ref, stpo_ref, stmino_ref, stmaxo_ref,
        stxo_ref, fxo_ref, dgxo_ref, styo_ref, fyo_ref, dgyo_ref,
        widtho_ref, width1o_ref,
        brackto_ref, stage1o_ref, nfevo_ref, infoo_ref, infoco_ref,
    )
    for ref, val in zip(out_refs, outs):
        ref[:] = val


def mt_pallas_batched(
    value_and_grad,
    x0,
    f0,
    g0,
    direction,
    alpha_init,
    dginit,
    max_fev: int = DEFAULT_MAX_FEV,
    interpret: bool = False,
    batched_value_and_grad=None,
):
    """Batch-native More-Thuente: one while_loop at batch level, body =
    vmapped objective evaluation + ONE Pallas kernel.

    Requires ``n % 8 == 0`` and ``b % 8 == 0`` (the dispatch rule gates on
    this) so the kernel runs pad-free — the objective must see un-padded
    (b, n) trial points, and re-padding per trip would cost more than the
    fusion saves (see ops/two_loop.py's padding notes).

    Returns ``(x, f, g, alpha, nfev, info)`` with leading batch axes.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, n = x0.shape
    dtype = x0.dtype
    assert n % _SUBLANE == 0 and b % _SUBLANE == 0, (b, n)

    from .two_loop import _phys_cols

    # Physical per-lane bytes: x0, s, g_t, gacc in + x_trial, gacc out,
    # plus ~36 (B, 1) scalar columns each padding to a 128-lane tile.
    bytes_per_lane = (6 * _phys_cols(n) + 36 * 128) * jnp.dtype(
        dtype
    ).itemsize
    tb = _pick_tile_b(b, bytes_per_lane, 16 << 20)
    grid = (b // tb,)

    def col(a):
        return jnp.reshape(a, (b, 1)).astype(dtype)

    finit = col(f0)
    dgin = col(dginit)
    dgtest = _FTOL * dgin
    alpha0 = col(jnp.broadcast_to(jnp.asarray(alpha_init, dtype), (b,)))

    zero = jnp.zeros((b, 1), dtype)
    zero_i = jnp.zeros((b, 1), jnp.int32)
    one_i = jnp.ones((b, 1), jnp.int32)
    no_descent = dgin >= 0.0

    # Trip-0 trial formation (the single body's first top-of-loop pass).
    stp_t0, stmin0, stmax0 = _trial_setup(
        alpha0, zero, zero, jnp.zeros((b, 1), jnp.bool_), zero_i, one_i,
        max_fev,
    )
    # Non-descent lanes abort before the first evaluation with alpha kept at
    # alpha_init (more_thuente.h:152-156).
    stp0 = jnp.where(no_descent, alpha0, stp_t0)
    info0 = jnp.where(no_descent, jnp.int32(-1), jnp.int32(0))
    width0 = jnp.full((b, 1), _STPMAX - _STPMIN, dtype)

    kernel = functools.partial(_mt_kernel, max_fev=max_fev)
    izero = np.int32(0)
    vmap_idx = lambda i: (i, izero)  # noqa: E731
    vspec = pl.BlockSpec((tb, n), vmap_idx, memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec((tb, 1), vmap_idx, memory_space=pltpu.VMEM)
    n_scal_f = 12  # facc..width1 f32 carry columns
    n_scal_i = 5  # brackt, stage1, nfev, info, infoc
    out_shape = (
        jax.ShapeDtypeStruct((b, n), dtype),  # x_trial
        jax.ShapeDtypeStruct((b, n), dtype),  # g_acc
    ) + tuple(
        jax.ShapeDtypeStruct((b, 1), dtype) for _ in range(n_scal_f)
    ) + tuple(
        jax.ShapeDtypeStruct((b, 1), jnp.int32) for _ in range(n_scal_i)
    )
    in_specs = (
        [vspec, vspec, sspec, sspec, sspec]  # x0, s, finit, dginit, dgtest
        + [sspec, vspec]  # f_t, g_t
        + [vspec]  # g_acc
        + [sspec] * (n_scal_f + n_scal_i)
    )
    out_specs = ([vspec, vspec] + [sspec] * (n_scal_f + n_scal_i))

    step = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        # Donate every carried buffer into its successor: without the full
        # alias map XLA ping-pong-copies each of the 17 scalar carries once
        # per line-search trip (measured: 16 x copy ops, ~1.6 us/trip at
        # (1024, 32)).  g_t (input 6) is dead after the kernel and hosts the
        # next trial point; g_acc and every scalar carry alias their
        # matching outputs.
        input_output_aliases={6: 0, 7: 1, 8: 2, **{i: i - 6 for i in range(9, 25)}},
        compiler_params=_pltpu_compiler_params(
            pltpu,
            None if (_lim := _vmem_limit_bytes()) is None
            else min(_lim, 32 * 1024 * 1024),
        ),
        interpret=interpret,
    )

    return _mt_loop(
        step, value_and_grad, batched_value_and_grad, x0, direction, f0, g0,
        dginit, alpha_init, max_fev,
    )


def mt_xla_batched(
    value_and_grad,
    x0,
    f0,
    g0,
    direction,
    alpha_init,
    dginit,
    max_fev: int = DEFAULT_MAX_FEV,
    batched_value_and_grad=None,
):
    """Batch-native More-Thuente with the trip math as plain XLA ops —
    :func:`_mt_trip_core` called directly on (B, ·) arrays.

    Same loop structure as the Pallas path but with no backend/dtype/shape
    gate: this is the fallback for f64 (the MGH reliability suite), CPU, and
    non-tileable shapes.  Versus ``jax.vmap`` of the single-instance search
    (the while-batching rule) it saves the rule's broadcast-select over the
    whole carry every trip — the body freezes terminated lanes itself.
    """
    b, n = x0.shape
    dtype = x0.dtype

    def col(a):
        return jnp.reshape(a, (b, 1)).astype(dtype)

    def step(x0_, s_, finit_, dgin_, dgtest_, f_t, g_t, *carry_rest):
        return _mt_trip_core(
            x0_, s_, finit_, dgin_, dgtest_, f_t, g_t, *carry_rest,
            max_fev=max_fev,
        )

    return _mt_loop(
        step, value_and_grad, batched_value_and_grad, x0, direction, f0, g0,
        dginit, alpha_init, max_fev,
    )


def _mt_loop(
    step, value_and_grad, batched_value_and_grad, x0, direction, f0, g0,
    dginit, alpha_init, max_fev,
):
    """Shared batch-level search loop: init carry, eval + step per trip,
    final selection.  ``step`` is either the Pallas call or the XLA core."""
    b, n = x0.shape
    dtype = x0.dtype

    def col(a):
        return jnp.reshape(a, (b, 1)).astype(dtype)

    finit = col(f0)
    dgin = col(dginit)
    dgtest = _FTOL * dgin
    alpha0 = col(jnp.broadcast_to(jnp.asarray(alpha_init, dtype), (b,)))

    zero = jnp.zeros((b, 1), dtype)
    zero_i = jnp.zeros((b, 1), jnp.int32)
    one_i = jnp.ones((b, 1), jnp.int32)
    no_descent = dgin >= 0.0

    # Trip-0 trial formation (the single body's first top-of-loop pass).
    stp_t0, stmin0, stmax0 = _trial_setup(
        alpha0, zero, zero, jnp.zeros((b, 1), jnp.bool_), zero_i, one_i,
        max_fev,
    )
    # Non-descent lanes abort before the first evaluation with alpha kept at
    # alpha_init (more_thuente.h:152-156).
    stp0 = jnp.where(no_descent, alpha0, stp_t0)
    info0 = jnp.where(no_descent, jnp.int32(-1), jnp.int32(0))
    width0 = jnp.full((b, 1), _STPMAX - _STPMIN, dtype)

    init = (
        x0 + stp0 * direction,  # x_trial
        g0,  # g_acc (non-descent abort lanes return the start gradient)
        finit,  # f_acc
        stp0, stmin0, stmax0,
        zero, finit, dgin,  # stx, fx, dgx
        zero, finit, dgin,  # sty, fy, dgy
        width0, 2.0 * width0,
        zero_i,  # brackt
        one_i,  # stage1
        zero_i,  # nfev
        info0,
        one_i,  # infoc
    )

    def cond(carry):
        return jnp.any(carry[17] == 0)  # info

    bvag = (
        batched_value_and_grad
        if batched_value_and_grad is not None
        else jax.vmap(value_and_grad)
    )

    def body(carry):
        x_trial = carry[0]
        f_t, g_t = bvag(x_trial)
        outs = step(
            x0, direction, finit, dgin, dgtest, col(f_t), g_t, *carry[1:]
        )
        return tuple(outs)

    final = lax.while_loop(cond, body, init)
    (x_trial, g_acc, f_acc, stp, _stmin, _stmax, _stx, _fx, _dgx, _sty, _fy,
     _dgy, _w, _w1, _brackt, _stage1, nfev, info, _infoc) = final
    # Lanes that never evaluated (non-descent abort) return the start.
    x = jnp.where(nfev > 0, x_trial, x0)
    return (
        x,
        f_acc[:, 0],
        g_acc,
        stp[:, 0],
        nfev[:, 0],
        info[:, 0],
    )


# ---------------------------------------------------------------------------
# custom_vmap dispatch
# ---------------------------------------------------------------------------


def _mt_single(value_and_grad, max_fev, x0, f0, g0, direction, alpha_init,
               dginit):
    r = more_thuente(
        value_and_grad, x0, f0, g0, direction, alpha_init,
        max_fev=max_fev, dginit=dginit,
    )
    return (r.x, r.f, r.g, r.alpha, r.nfev, r.info)


def _make_mt_op(converted_fn, max_fev: int):
    """Build the custom-batching op over a closure-converted objective.

    ``converted_fn(x, *consts) -> (f, g)`` is pure — every value the
    original ``value_and_grad`` closed over rides in ``consts`` as explicit
    op arguments.  This matters for the augmented-Lagrangian inner solve,
    whose composite objective captures per-lane traced multipliers: a
    custom_vmap function may not close over batched tracers (JAX asserts
    ``not any(consts_batched)``), but hoisted into arguments they batch like
    any other operand and the fused loop evaluates them per lane.
    """

    @jax.custom_batching.custom_vmap
    def mt_op(x0, f0, g0, direction, alpha_init, dginit, *consts):
        vag = lambda x: converted_fn(x, *consts)  # noqa: E731
        return _mt_single(
            vag, max_fev, x0, f0, g0, direction, alpha_init, dginit
        )

    @mt_op.def_vmap
    def _mt_vmap_rule(axis_size, in_batched, *args):
        # Broadcast only the six small search operands; unbatched closure
        # consts (e.g. a shared data matrix) stay shared via in_axes=None —
        # materialising them per lane could dwarf the search itself.
        ops = [
            a if batched else jnp.broadcast_to(a, (axis_size,) + jnp.shape(a))
            for a, batched in zip(args[:6], in_batched[:6])
        ]
        consts = list(args[6:])
        const_axes = [0 if b else None for b in in_batched[6:]]
        x0 = ops[0]
        b, n = x0.shape
        bvag = jax.vmap(
            lambda x, *c: converted_fn(x, *c), in_axes=(0, *const_axes)
        )
        if (
            jax.default_backend() == "tpu"
            and x0.dtype == jnp.float32
            and n % _SUBLANE == 0
            and b % _SUBLANE == 0
        ):
            out = mt_pallas_batched(
                lambda x: None,  # unused; batched eval supplied below
                *ops,
                max_fev=max_fev,
                batched_value_and_grad=lambda xs: bvag(xs, *consts),
            )
        else:
            # Batch-native XLA loop: same trip core as the kernel, no
            # while-batching-rule broadcast selects — the f64 (MGH
            # reliability) and CPU path.
            out = mt_xla_batched(
                lambda x: None,
                *ops,
                max_fev=max_fev,
                batched_value_and_grad=lambda xs: bvag(xs, *consts),
            )
        return out, (True,) * 6

    return mt_op


def batched_more_thuente(
    value_and_grad, x0, f0, g0, direction, alpha_init, dginit,
    max_fev: int = DEFAULT_MAX_FEV,
):
    """More-Thuente as a custom-batching op.

    Un-batched calls run the single-instance MINPACK port verbatim; a
    vmapped call (the batched solve path) swaps in the batch-native loop —
    Pallas-fused on TPU/f32, plain-XLA elsewhere.  ``dginit`` is required — the
    caller either gets it from the fused L-BFGS prologue or computes the one
    O(n) reduction itself.
    """
    converted_fn, consts = jax.closure_convert(
        lambda x: value_and_grad(x), x0
    )
    op = _make_mt_op(converted_fn, int(max_fev))
    return op(x0, f0, g0, direction, alpha_init, dginit, *consts)
