"""More-Thuente strong-Wolfe line search as a pure JAX kernel.

TPU-native implementation of the MINPACK ``cvsrch``/``cstep`` algorithm
(More & Thuente 1994), with the same constants and case logic as the
reference's port (reference: include/cppoptlib/linesearch/more_thuente.h:
137-256 driver, :261-407 interpolation).  The C++ version mutates nine
scalars by reference inside a while loop; here the bracketing state is a
small NamedTuple pytree advanced by ``lax.while_loop``, so the whole search
jits, vmaps over a batch of problem instances, and differentiates shapes
never change.

The search consumes a fully-evaluated starting state (value + gradient at
``x``) and produces the accepted step's ``(x, f, g)`` captured from the final
internal evaluation — the "State -> State" overload of the reference
(more_thuente.h:120-135) that eliminates redundant evaluations.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["CstepState", "cstep", "more_thuente", "MoreThuenteResult"]

# MINPACK constants (more_thuente.h:142-148).
_XTOL = 1e-15
_FTOL = 1e-4
_GTOL = 0.9
_STPMIN = 1e-15
_STPMAX = 1e15
_XTRAPF = 4.0
DEFAULT_MAX_FEV = 20


class CstepState(NamedTuple):
    """The nine-scalar bracketing state threaded through ``cstep``."""

    stx: jax.Array
    fx: jax.Array
    dx: jax.Array
    sty: jax.Array
    fy: jax.Array
    dy: jax.Array
    stp: jax.Array
    brackt: jax.Array  # bool
    info: jax.Array  # int32: 0 = input error, 1..4 = interpolation case


def _max_abs3(x, y, z):
    return jnp.maximum(jnp.abs(x), jnp.maximum(jnp.abs(y), jnp.abs(z)))


def cstep(
    stx, fx, dx, sty, fy, dy, stp, fp, dp, brackt, stpmin, stpmax
) -> CstepState:
    """Safeguarded cubic/quadratic trial-step interpolation.

    Pure-function port of MINPACK ``cstep`` (more_thuente.h:261-407).  All
    four interpolation cases are computed branch-free and selected with
    ``where`` so the function vmaps cleanly; the unselected branches may
    produce NaN/inf which never leak through the selection.

    Returns the updated bracketing state.  ``info == 0`` signals the C++
    input-error early return (caller treats it as a line-search abort).
    """
    dtype = jnp.result_type(stx, fp)
    # Canonicalize to jnp arrays: with plain-Python floats the case flags
    # below would be Python bools, whose bitwise `~` is integer NOT
    # (~True == -2, still truthy) — silently corrupting the case selection
    # for direct scalar calls (the in-loop traced path never hits this).
    stx, fx, dx, sty, fy, dy, stp, fp, dp = (
        jnp.asarray(v, dtype) for v in (stx, fx, dx, sty, fy, dy, stp, fp, dp)
    )
    brackt = jnp.asarray(brackt, jnp.bool_)
    one = jnp.ones((), dtype)

    # Input-error check (more_thuente.h:271-275): step outside the bracket,
    # non-descent at stx, or inverted bounds.
    input_error = jnp.logical_or(
        jnp.logical_and(
            brackt,
            jnp.logical_or(
                stp <= jnp.minimum(stx, sty), stp >= jnp.maximum(stx, sty)
            ),
        ),
        jnp.logical_or(dx * (stp - stx) >= 0.0, stpmax < stpmin),
    )

    sgnd = dp * jnp.sign(dx)

    # Shared cubic-model quantities.  Guard the denominators so unselected
    # branches cannot poison selected values via inf*0 -> NaN in `where`
    # chains (forward-only code, so the guards are purely numerical).
    d_stp_stx = stp - stx
    theta = 3.0 * (fx - fp) / d_stp_stx + dx + dp
    s = _max_abs3(theta, dx, dp)
    gamma_sq = (theta / s) * (theta / s) - (dx / s) * (dp / s)
    gamma_raw = s * jnp.sqrt(gamma_sq)
    gamma3 = s * jnp.sqrt(jnp.maximum(jnp.zeros((), dtype), gamma_sq))

    # --- Case 1 (fp > fx): higher value, minimum bracketed (info=1) --------
    g1 = jnp.where(stp < stx, -gamma_raw, gamma_raw)
    p1 = (g1 - dx) + theta
    q1 = ((g1 - dx) + g1) + dp
    r1 = p1 / q1
    stpc1 = stx + r1 * d_stp_stx
    stpq1 = stx + ((dx / ((fx - fp) / d_stp_stx + dx)) / 2.0) * d_stp_stx
    stpf1 = jnp.where(
        jnp.abs(stpc1 - stx) < jnp.abs(stpq1 - stx),
        stpc1,
        stpc1 + (stpq1 - stpc1) / 2.0,
    )

    # --- Case 2 (sgnd < 0): opposite derivative signs (info=2) -------------
    g2 = jnp.where(stp > stx, -gamma_raw, gamma_raw)
    p2 = (g2 - dp) + theta
    q2 = ((g2 - dp) + g2) + dx
    r2 = p2 / q2
    stpc2 = stp + r2 * (stx - stp)
    stpq2 = stp + (dp / (dp - dx)) * (stx - stp)
    stpf2 = jnp.where(
        jnp.abs(stpc2 - stp) > jnp.abs(stpq2 - stp), stpc2, stpq2
    )

    # --- Case 3 (|dp| < |dx|): derivative decreases in magnitude (info=3) --
    g3 = jnp.where(stp > stx, -gamma3, gamma3)
    p3 = (g3 - dp) + theta
    q3 = (g3 + (dx - dp)) + g3
    r3 = p3 / q3
    stpc3_interior = stp + r3 * (stx - stp)
    stpc3 = jnp.where(
        jnp.logical_and(r3 < 0.0, g3 != 0.0),
        stpc3_interior,
        jnp.where(stp > stx, stpmax, stpmin),
    )
    stpq3 = stp + (dp / (dp - dx)) * (stx - stp)
    stpf3 = jnp.where(
        brackt,
        jnp.where(jnp.abs(stp - stpc3) < jnp.abs(stp - stpq3), stpc3, stpq3),
        jnp.where(jnp.abs(stp - stpc3) > jnp.abs(stp - stpq3), stpc3, stpq3),
    )

    # --- Case 4: derivative does not decrease (info=4) ---------------------
    d_sty_stp = sty - stp
    theta4 = 3.0 * (fp - fy) / d_sty_stp + dy + dp
    s4 = _max_abs3(theta4, dy, dp)
    gamma4_raw = s4 * jnp.sqrt(
        (theta4 / s4) * (theta4 / s4) - (dy / s4) * (dp / s4)
    )
    g4 = jnp.where(stp > sty, -gamma4_raw, gamma4_raw)
    p4 = (g4 - dp) + theta4
    q4 = ((g4 - dp) + g4) + dy
    r4 = p4 / q4
    stpc4 = stp + r4 * d_sty_stp
    stpf4 = jnp.where(brackt, stpc4, jnp.where(stp > stx, stpmax, stpmin))

    # --- Case selection (tested in the C++ order) ---------------------------
    case1 = fp > fx
    case2 = jnp.logical_and(~case1, sgnd < 0.0)
    case3 = jnp.logical_and(
        jnp.logical_and(~case1, ~(sgnd < 0.0)), jnp.abs(dp) < jnp.abs(dx)
    )
    case4 = jnp.logical_and(
        jnp.logical_and(~case1, ~(sgnd < 0.0)), ~(jnp.abs(dp) < jnp.abs(dx))
    )

    # Explicit int32 literals: inside the fused Pallas line-search kernel
    # (ops/fused_linesearch.py) a bare Python int in a 3-arg where becomes a
    # weak-i64 constant under jax_enable_x64, which Mosaic cannot legalize
    # (same pitfall as ops/fused_step.py's count handling).
    info = (
        jnp.where(case1, jnp.int32(1), jnp.int32(0))
        + jnp.where(case2, jnp.int32(2), jnp.int32(0))
        + jnp.where(case3, jnp.int32(3), jnp.int32(0))
        + jnp.where(case4, jnp.int32(4), jnp.int32(0))
    )
    bound = jnp.logical_or(case1, case3)
    stpf = jnp.where(
        case1, stpf1, jnp.where(case2, stpf2, jnp.where(case3, stpf3, stpf4))
    )
    new_brackt = jnp.logical_or(brackt, jnp.logical_or(case1, case2))

    # --- Interval update (more_thuente.h:377-391) ---------------------------
    take_y_from_p = fp > fx
    take_y_from_x = jnp.logical_and(~take_y_from_p, sgnd < 0.0)
    new_sty = jnp.where(take_y_from_p, stp, jnp.where(take_y_from_x, stx, sty))
    new_fy = jnp.where(take_y_from_p, fp, jnp.where(take_y_from_x, fx, fy))
    new_dy = jnp.where(take_y_from_p, dp, jnp.where(take_y_from_x, dx, dy))
    new_stx = jnp.where(take_y_from_p, stx, stp)
    new_fx = jnp.where(take_y_from_p, fx, fp)
    new_dx = jnp.where(take_y_from_p, dx, dp)

    # --- Final step with clamp and 0.66 safeguard (more_thuente.h:393-404) --
    stpf = jnp.clip(stpf, stpmin, stpmax)
    new_stp = stpf
    guard = new_stx + 0.66 * (new_sty - new_stx)
    new_stp = jnp.where(
        jnp.logical_and(new_brackt, bound),
        jnp.where(
            new_sty > new_stx,
            jnp.minimum(guard, new_stp),
            jnp.maximum(guard, new_stp),
        ),
        new_stp,
    )

    # Input-error path: leave everything untouched and flag info=0.
    def keep(err, new, old):
        return jnp.where(err, old, new)

    return CstepState(
        stx=keep(input_error, new_stx, stx),
        fx=keep(input_error, new_fx, fx),
        dx=keep(input_error, new_dx, dx),
        sty=keep(input_error, new_sty, sty),
        fy=keep(input_error, new_fy, fy),
        dy=keep(input_error, new_dy, dy),
        stp=keep(input_error, new_stp, stp),
        # Select in the i32 domain, then compare back to bool: a select over
        # two i1 vectors is a Mosaic legalization failure when this runs
        # inside the fused line-search kernel (see ops/fused_step.py's
        # matching note); semantics are identical.
        brackt=jnp.where(
            input_error,
            brackt.astype(jnp.int32),
            new_brackt.astype(jnp.int32),
        )
        != 0,
        info=jnp.where(input_error, jnp.int32(0), info),
    )


class MoreThuenteResult(NamedTuple):
    x: jax.Array
    f: jax.Array
    g: jax.Array
    alpha: jax.Array
    nfev: jax.Array  # int32 evaluations consumed by the search
    info: jax.Array  # int32 MINPACK termination code (1 = strong Wolfe met)


class _SearchCarry(NamedTuple):
    x: jax.Array
    f: jax.Array
    g: jax.Array
    stp: jax.Array
    stx: jax.Array
    fx: jax.Array
    dgx: jax.Array
    sty: jax.Array
    fy: jax.Array
    dgy: jax.Array
    brackt: jax.Array
    stage1: jax.Array
    nfev: jax.Array
    width: jax.Array
    width1: jax.Array
    info: jax.Array
    infoc: jax.Array


def more_thuente(
    value_and_grad: Callable,
    x0: jax.Array,
    f0: jax.Array,
    g0: jax.Array,
    direction: jax.Array,
    alpha_init,
    max_fev: int = DEFAULT_MAX_FEV,
    dginit: jax.Array | None = None,
) -> MoreThuenteResult:
    """Strong-Wolfe search along ``direction`` from a populated start.

    Mirrors ``cvsrch`` (more_thuente.h:137-256): ftol=1e-4, gtol=0.9,
    xtol=1e-15, step in [1e-15, 1e15], at most ``max_fev`` evaluations.  A
    non-descent ``direction`` returns the start unchanged, matching the C++
    early return.  One objective evaluation per loop iteration; the result's
    ``(x, f, g)`` come from the final internal evaluation.

    ``dginit`` optionally supplies the precomputed directional derivative
    ``vdot(g0, direction)`` — the fused L-BFGS prologue kernel emits it with
    the direction (ops/fused_step.py), sparing one O(n) reduction here.
    """
    dtype = jnp.result_type(f0)
    s = direction
    if dginit is None:
        dginit = jnp.vdot(g0, s)
    no_descent = dginit >= 0.0

    finit = f0
    dgtest = _FTOL * dginit
    width0 = jnp.asarray(_STPMAX - _STPMIN, dtype)

    init = _SearchCarry(
        x=x0,
        f=f0,
        g=g0,
        stp=jnp.asarray(alpha_init, dtype),
        stx=jnp.zeros((), dtype),
        fx=finit,
        dgx=dginit,
        sty=jnp.zeros((), dtype),
        fy=finit,
        dgy=dginit,
        brackt=jnp.zeros((), jnp.bool_),
        stage1=jnp.ones((), jnp.bool_),
        nfev=jnp.zeros((), jnp.int32),
        width=width0,
        width1=2.0 * width0,
        # A non-descent direction aborts before the first evaluation
        # (more_thuente.h:152-156).
        info=jnp.where(no_descent, jnp.int32(-1), jnp.int32(0)),
        infoc=jnp.ones((), jnp.int32),
    )

    def cond(c: _SearchCarry):
        return c.info == 0

    def body(c: _SearchCarry) -> _SearchCarry:
        # Interval bounds for this trial (more_thuente.h:178-185).
        stmin = jnp.where(c.brackt, jnp.minimum(c.stx, c.sty), c.stx)
        stmax = jnp.where(
            c.brackt,
            jnp.maximum(c.stx, c.sty),
            c.stp + _XTRAPF * (c.stp - c.stx),
        )
        stp = jnp.clip(c.stp, _STPMIN, _STPMAX)

        # Unreliable-trial fallback: re-test at the best step so far
        # (more_thuente.h:190-195).
        fallback = jnp.logical_or(
            jnp.logical_or(
                jnp.logical_and(
                    c.brackt, jnp.logical_or(stp <= stmin, stp >= stmax)
                ),
                c.nfev >= max_fev - 1,
            ),
            jnp.logical_or(
                c.infoc == 0,
                jnp.logical_and(c.brackt, (stmax - stmin) <= _XTOL * stmax),
            ),
        )
        stp = jnp.where(fallback, c.stx, stp)

        # Trial evaluation (the one objective call per iteration).
        x = x0 + stp * s
        f, g = value_and_grad(x)
        nfev = c.nfev + 1
        dg = jnp.vdot(g, s)
        ftest1 = finit + stp * dgtest

        # Termination codes, later assignments override earlier ones
        # (more_thuente.h:205-216).
        info = jnp.int32(0)
        info = jnp.where(
            jnp.logical_or(
                jnp.logical_and(
                    c.brackt, jnp.logical_or(stp <= stmin, stp >= stmax)
                ),
                c.infoc == 0,
            ),
            jnp.int32(6),
            info,
        )
        info = jnp.where(
            jnp.logical_and(
                jnp.logical_and(stp == _STPMAX, f <= ftest1), dg <= dgtest
            ),
            jnp.int32(5),
            info,
        )
        info = jnp.where(
            jnp.logical_and(
                stp == _STPMIN, jnp.logical_or(f > ftest1, dg >= dgtest)
            ),
            jnp.int32(4),
            info,
        )
        info = jnp.where(nfev >= max_fev, jnp.int32(3), info)
        info = jnp.where(
            jnp.logical_and(c.brackt, stmax - stmin <= _XTOL * stmax),
            jnp.int32(2),
            info,
        )
        info = jnp.where(
            jnp.logical_and(
                f <= ftest1, jnp.abs(dg) <= _GTOL * (-dginit)
            ),
            jnp.int32(1),
            info,
        )

        # The C++ returns here when info != 0, with `stp` as evaluated — the
        # post-evaluation cstep/bisection below must not run in that case.
        stp_eval = stp
        terminated = info != 0

        stage1 = jnp.where(
            jnp.logical_and(
                jnp.logical_and(c.stage1, f <= ftest1),
                dg >= min(_FTOL, _GTOL) * dginit,
            ),
            jnp.zeros((), jnp.bool_),
            c.stage1,
        )

        # cstep, in the modified-function frame during stage 1 when the
        # auxiliary condition holds (more_thuente.h:221-244).
        use_modified = jnp.logical_and(
            jnp.logical_and(stage1, f <= c.fx), f > ftest1
        )
        fm = jnp.where(use_modified, f - stp * dgtest, f)
        fxm = jnp.where(use_modified, c.fx - c.stx * dgtest, c.fx)
        fym = jnp.where(use_modified, c.fy - c.sty * dgtest, c.fy)
        dgm = jnp.where(use_modified, dg - dgtest, dg)
        dgxm = jnp.where(use_modified, c.dgx - dgtest, c.dgx)
        dgym = jnp.where(use_modified, c.dgy - dgtest, c.dgy)

        cs = cstep(
            c.stx, fxm, dgxm, c.sty, fym, dgym, stp, fm, dgm, c.brackt,
            stmin, stmax,
        )
        infoc = cs.info

        stx = cs.stx
        fx = jnp.where(use_modified, cs.fx + cs.stx * dgtest, cs.fx)
        dgx = jnp.where(use_modified, cs.dx + dgtest, cs.dx)
        sty = cs.sty
        fy = jnp.where(use_modified, cs.fy + cs.sty * dgtest, cs.fy)
        dgy = jnp.where(use_modified, cs.dy + dgtest, cs.dy)
        stp = cs.stp
        brackt = cs.brackt

        # Forced bisection when the bracket shrinks too slowly
        # (more_thuente.h:246-252).
        stp = jnp.where(
            jnp.logical_and(
                brackt, jnp.abs(sty - stx) >= 0.66 * c.width1
            ),
            stx + 0.5 * (sty - stx),
            stp,
        )
        width1 = jnp.where(brackt, c.width, c.width1)
        width = jnp.where(brackt, jnp.abs(sty - stx), c.width)

        # Emulate the early return: on termination keep the evaluated stp and
        # freeze the bracketing state (the loop exits next iteration anyway).
        def pick(new, old):
            return jnp.where(terminated, old, new)

        return _SearchCarry(
            x=x, f=f, g=g,
            stp=jnp.where(terminated, stp_eval, stp),
            stx=pick(stx, c.stx), fx=pick(fx, c.fx), dgx=pick(dgx, c.dgx),
            sty=pick(sty, c.sty), fy=pick(fy, c.fy), dgy=pick(dgy, c.dgy),
            brackt=pick(brackt, c.brackt), stage1=pick(stage1, c.stage1),
            nfev=nfev, width=pick(width, c.width),
            width1=pick(width1, c.width1), info=info,
            infoc=pick(infoc, c.infoc),
        )

    final = lax.while_loop(cond, body, init)
    return MoreThuenteResult(
        x=final.x,
        f=final.f,
        g=final.g,
        alpha=final.stp,
        nfev=final.nfev,
        info=final.info,
    )
