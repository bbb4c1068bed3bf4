"""Hager-Zhang (CG_DESCENT 2006) approximate-Wolfe line search.

TPU-native port of the reference's HagerZhang
(reference: include/cppoptlib/linesearch/hager_zhang.h:54-548, itself a port
of LineSearches.jl's hagerzhang.jl).  Stage tags (B0-B3 bracket, S1-S4
secant^2, U0-U3 update, L2 bisection fallback) follow the paper numbering,
as in the reference.

The C++ keeps a growing evaluation-history vector, but the algorithm only
ever reads the current bracket endpoints and the previous sample — so the
JAX port carries ``(alpha, phi, dphi, g)`` samples directly through
``lax.while_loop``s, keeping all shapes static.  HZ defaults preserved:
delta=0.1, sigma=0.9, eps=1e-6, gamma=0.66, rho=5, 50 iterations, with the
non-finite-overshoot recovery (shrink by psi3 / bisect back) and the
best-seen-sample fallback (hager_zhang.h:317-329, :342-355, :444-455).

Each sample carries its full gradient vector so every acceptance path
returns the accepted evaluation's own ``(f, g)`` workspace — the reference's
state threading (hager_zhang.h:444-455) — with no extra evaluation; nfev
matches the C++ exactly (the round-2/3 +1-eval deviation is removed).

Batched-cost note (the documented fused-path boundary): because ``_Trip``
carries the (n,) gradient and the bracket/shrink loops hold ~5 trips in
their carry, a *vmapped* HZ search pays the while-batching broadcast-select
over O(5*B*n) state per trip.  Unlike More-Thuente — whose loop body is
exactly one evaluation plus pure bookkeeping, and therefore fuses into the
batch-level eval->kernel loop of ops/fused_linesearch.py — HZ's trip body
contains NESTED data-dependent evaluation loops (U3/B2 bisection, the
non-finite backoff inside B3), so an eval-at-top batch-level restructure
would need an explicit continuation state machine.  That cost is not paid:
More-Thuente is the default search everywhere (as in the reference,
lbfgs.h:40-41), HZ is provided for algorithmic parity
(hager_zhang.h:282-547), and the measured batched-throughput gap between
``Lbfgs(line_search="hager_zhang")`` and the fused MT path is recorded in
BENCH_r05's solver legs — see README's performance notes."""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["hager_zhang", "HagerZhangResult"]

_DELTA = 0.1  # c1 (sufficient decrease)
_SIGMA = 0.9  # c2 (curvature)
_EPSILON_K = 1e-6  # approximate-Wolfe envelope
_GAMMA = 0.66  # bracket shrink threshold
_RHO = 5.0  # expansion factor
_PSI3 = 0.1  # non-finite backoff
_MAX_LS = 50
_ITER_FINITE_MAX = 60
_BISECT_MAX = 80


class _Trip(NamedTuple):
    alpha: jax.Array
    phi: jax.Array
    dphi: jax.Array
    g: jax.Array  # (n,) gradient at x0 + alpha*d (the threaded workspace)


class HagerZhangResult(NamedTuple):
    x: jax.Array
    f: jax.Array
    g: jax.Array
    alpha: jax.Array
    nfev: jax.Array
    ok: jax.Array  # bool: False => no usable step (start returned)


def hager_zhang(
    value_and_grad: Callable,
    x0: jax.Array,
    f0: jax.Array,
    g0: jax.Array,
    direction: jax.Array,
    alpha_init=1.0,
) -> HagerZhangResult:
    dtype = jnp.result_type(f0)
    eps = jnp.finfo(dtype).eps
    s = direction

    phi_0 = f0
    dphi_0 = jnp.vdot(g0, s)
    phi_lim = phi_0 + _EPSILON_K * jnp.abs(phi_0)

    def phi_dphi(alpha, nfev):
        f, g = value_and_grad(x0 + alpha * s)
        return _Trip(alpha=alpha, phi=f, dphi=jnp.vdot(g, s), g=g), nfev + 1

    def wolfe(t: _Trip):
        # T1/T2 acceptance (hager_zhang.h:131-140).
        wolfe1 = jnp.logical_and(
            _DELTA * dphi_0 >= (t.phi - phi_0) / t.alpha,
            t.dphi >= _SIGMA * dphi_0,
        )
        wolfe2 = jnp.logical_and(
            jnp.logical_and(
                (2.0 * _DELTA - 1.0) * dphi_0 >= t.dphi,
                t.dphi >= _SIGMA * dphi_0,
            ),
            t.phi <= phi_lim,
        )
        return jnp.logical_or(wolfe1, wolfe2)

    def secant(a: _Trip, b: _Trip):
        return (a.alpha * b.dphi - b.alpha * a.dphi) / (b.dphi - a.dphi)

    def better_best(best, t: _Trip):
        take = jnp.logical_and(t.alpha > 0.0, t.phi < best.phi)
        return jax.tree.map(
            lambda new, old: jnp.where(take, new, old), t, best
        )

    def select_trip(pred, a: _Trip, b: _Trip):
        return jax.tree.map(lambda u, v: jnp.where(pred, u, v), a, b)

    zero_trip = _Trip(
        alpha=jnp.zeros((), dtype), phi=phi_0, dphi=dphi_0, g=g0
    )

    # -- U3 bisection (hager_zhang.h:186-214) --------------------------------
    def bisect(a: _Trip, b: _Trip, best, nfev):
        def cond(c):
            a, b, hit, done, _, _, it = c
            active = jnp.logical_and(~hit, ~done)
            return jnp.logical_and(
                jnp.logical_and(active, b.alpha - a.alpha > eps * b.alpha),
                it < _BISECT_MAX,
            )

        def body(c):
            a, b, hit, done, best, nfev, it = c
            d, nfev = phi_dphi((a.alpha + b.alpha) / 2.0, nfev)
            best = better_best(best, d)
            is_wolfe = wolfe(d)
            slope_up = d.dphi >= 0.0
            low = d.phi <= phi_lim
            # Wolfe hit returns (a, d); slope_up sets b=d; low sets a=d;
            # else b=d.
            new_b = select_trip(
                jnp.logical_or(jnp.logical_or(is_wolfe, slope_up), ~low),
                d,
                b,
            )
            new_a = select_trip(
                jnp.logical_and(
                    jnp.logical_and(~is_wolfe, ~slope_up), low
                ),
                d,
                a,
            )
            return (new_a, new_b, is_wolfe, done, best, nfev, it + 1)

        a, b, hit, _, best, nfev, _ = lax.while_loop(
            cond,
            body,
            (a, b, jnp.zeros((), jnp.bool_), jnp.zeros((), jnp.bool_),
             best, nfev, jnp.zeros((), jnp.int32)),
        )
        return a, b, hit, best, nfev

    # -- U0-U3 update (hager_zhang.h:162-182) --------------------------------
    def update(a: _Trip, b: _Trip, c: _Trip, best, nfev):
        inside = jnp.logical_and(c.alpha >= a.alpha, c.alpha <= b.alpha)
        u1 = c.dphi >= 0.0  # new upper bound
        u2 = c.phi <= phi_lim  # better lower bound
        needs_bisect = jnp.logical_and(
            inside, jnp.logical_and(~u1, ~u2)
        )
        ba, bb, bhit, best, nfev = bisect(a, c, best, nfev)
        # Select among: outside -> (a, b); u1 -> (a, c); u2 -> (c, b);
        # else bisect result.
        new_a = select_trip(
            ~inside,
            a,
            select_trip(
                u1, a, select_trip(u2, c, ba)
            ),
        )
        new_b = select_trip(
            ~inside,
            b,
            select_trip(
                u1, c, select_trip(u2, b, bb)
            ),
        )
        hit = jnp.logical_and(needs_bisect, bhit)
        return new_a, new_b, hit, best, nfev

    # -- S1-S4 secant^2 (hager_zhang.h:218-275) ------------------------------
    def secant2(a: _Trip, b: _Trip, best, nfev):
        c_alpha = secant(a, b)
        c_alpha = jnp.where(
            jnp.isfinite(c_alpha), c_alpha, (a.alpha + b.alpha) / 2.0
        )
        c, nfev = phi_dphi(c_alpha, nfev)
        best = better_best(best, c)
        hit1 = wolfe(c)

        iA, iB, uhit, best, nfev = update(a, b, c, best, nfev)
        moved_b = iB.alpha == c.alpha
        moved_a = iA.alpha == c.alpha
        c2_alpha = jnp.where(
            moved_b,
            secant(b, iB),
            jnp.where(moved_a, secant(a, iA), c.alpha),
        )
        do_second = jnp.logical_and(
            jnp.logical_or(moved_a, moved_b),
            jnp.logical_and(iA.alpha <= c2_alpha, c2_alpha <= iB.alpha),
        )
        # Always evaluate (masked algorithms pay the lane); only counted and
        # used when the C++ control flow would evaluate.
        c2, nfev2 = phi_dphi(c2_alpha, nfev)
        nfev = jnp.where(do_second, nfev2, nfev)
        best = select_trip(do_second, better_best(best, c2), best)
        hit2 = jnp.logical_and(do_second, wolfe(c2))
        iA2, iB2, uhit2, best2, nfev3 = update(iA, iB, c2, best, nfev)
        uhit2 = jnp.logical_and(do_second, uhit2)
        best = select_trip(do_second, best2, best)
        nfev = jnp.where(do_second, nfev3, nfev)
        new_a = select_trip(do_second, iA2, iA)
        new_b = select_trip(do_second, iB2, iB)

        # Priority of returns: hit1 (at c) > uhit (bisect wolfe inside first
        # update, at its b) > hit2 (at c2) > uhit2.
        any_hit = jnp.logical_or(
            jnp.logical_or(hit1, uhit), jnp.logical_or(hit2, uhit2)
        )
        hit_trip = select_trip(
            hit1,
            c,
            select_trip(uhit, iB, select_trip(hit2, c2, iB2)),
        )
        return any_hit, hit_trip, new_a, new_b, best, nfev

    # -- Initial trial with non-finite backoff (hager_zhang.h:333-365) -------
    nfev0 = jnp.zeros((), jnp.int32)
    c_alpha0 = jnp.where(
        jnp.asarray(alpha_init, dtype) > 0.0,
        jnp.asarray(alpha_init, dtype),
        jnp.ones((), dtype),
    )
    ec0, nfev0 = phi_dphi(c_alpha0, nfev0)

    def backoff_cond(c):
        ec, nfev, it = c
        bad = ~jnp.logical_and(jnp.isfinite(ec.phi), jnp.isfinite(ec.dphi))
        return jnp.logical_and(bad, it < _ITER_FINITE_MAX)

    def backoff_body(c):
        ec, nfev, it = c
        new_ec, nfev = phi_dphi(ec.alpha * _PSI3, nfev)
        return new_ec, nfev, it + 1

    ec, nfev, _ = lax.while_loop(
        backoff_cond, backoff_body, (ec0, nfev0, jnp.zeros((), jnp.int32))
    )
    initial_finite = jnp.logical_and(
        jnp.isfinite(ec.phi), jnp.isfinite(ec.dphi)
    )
    best = better_best(zero_trip._replace(phi=phi_0), ec)
    initial_wolfe = jnp.logical_and(initial_finite, wolfe(ec))

    no_descent = dphi_0 >= 0.0

    # -- Bracket phase B0-B3 (hager_zhang.h:367-455) -------------------------
    class _BracketCarry(NamedTuple):
        prev: _Trip  # most recent sample (history.back())
        prev2: _Trip  # the sample before it (B1's scan-back target)
        a: _Trip
        b: _Trip
        bracketed: jax.Array
        accepted: jax.Array  # wolfe hit during expansion/bisect
        accept_trip: _Trip
        failed: jax.Array
        best: _Trip
        nfev: jax.Array
        iter: jax.Array

    bracket0 = _BracketCarry(
        prev=ec,
        prev2=zero_trip,
        a=zero_trip,
        b=ec,
        bracketed=jnp.zeros((), jnp.bool_),
        accepted=initial_wolfe,
        accept_trip=ec,
        failed=~initial_finite,
        best=best,
        nfev=nfev,
        iter=jnp.ones((), jnp.int32),
    )

    def bracket_cond(c: _BracketCarry):
        active = ~jnp.logical_or(
            jnp.logical_or(c.bracketed, c.accepted), c.failed
        )
        return jnp.logical_and(active, c.iter < _MAX_LS)

    def bracket_body(c: _BracketCarry) -> _BracketCarry:
        last = c.prev
        slope_up = last.dphi >= 0.0
        over_peak = last.phi > phi_lim

        # B1: bracket found; a = most recent feasible sample (always the
        # previous one — every retained sample has phi <= phi_lim).
        b1_a = c.prev2
        b1_b = last

        # B2: bisect [0, last].
        b2_a, b2_b, b2_hit, best2, nfev2 = bisect(
            zero_trip, last, c.best, c.nfev
        )

        # B3: expand.
        c3_alpha = last.alpha * _RHO
        ec3, nfev3 = phi_dphi(c3_alpha, nfev2)

        def finite_cond(cc):
            ec, nfev, it = cc
            bad = ~jnp.logical_and(
                jnp.isfinite(ec.phi), jnp.isfinite(ec.dphi)
            )
            return jnp.logical_and(bad, it < _ITER_FINITE_MAX)

        def finite_body(cc):
            ec, nfev, it = cc
            new_alpha = (last.alpha + ec.alpha) / 2.0
            new_ec, nfev = phi_dphi(new_alpha, nfev)
            return new_ec, nfev, it + 1

        ec3, nfev3, _ = lax.while_loop(
            finite_cond, finite_body, (ec3, nfev3, jnp.zeros((), jnp.int32))
        )
        b3_finite = jnp.logical_and(
            jnp.isfinite(ec3.phi), jnp.isfinite(ec3.dphi)
        )
        b3_wolfe = jnp.logical_and(b3_finite, wolfe(ec3))

        is_b1 = slope_up
        is_b2 = jnp.logical_and(~slope_up, over_peak)
        is_b3 = jnp.logical_and(~slope_up, ~over_peak)

        new_a = select_trip(is_b1, b1_a, select_trip(is_b2, b2_a, c.a))
        new_b = select_trip(is_b1, b1_b, select_trip(is_b2, b2_b, c.b))
        bracketed = jnp.logical_or(is_b1, is_b2)
        accepted = jnp.logical_or(
            jnp.logical_and(is_b2, b2_hit),
            jnp.logical_and(is_b3, b3_wolfe),
        )
        accept_trip = select_trip(is_b2, b2_b, ec3)
        failed = jnp.logical_and(is_b3, ~b3_finite)

        best3 = select_trip(
            is_b3, better_best(c.best, ec3), select_trip(is_b2, best2, c.best)
        )
        nfev_new = jnp.where(
            is_b3, nfev3, jnp.where(is_b2, nfev2, c.nfev)
        )
        return _BracketCarry(
            prev=select_trip(is_b3, ec3, c.prev),
            prev2=select_trip(is_b3, c.prev, c.prev2),
            a=new_a,
            b=new_b,
            bracketed=bracketed,
            accepted=accepted,
            accept_trip=accept_trip,
            failed=failed,
            best=best3,
            nfev=nfev_new,
            iter=c.iter + 1,
        )

    bres = lax.while_loop(bracket_cond, bracket_body, bracket0)

    # -- Main shrinking loop (hager_zhang.h:457-535) -------------------------
    class _ShrinkCarry(NamedTuple):
        a: _Trip
        b: _Trip
        accepted: jax.Array
        accept_trip: _Trip
        collapsed: jax.Array
        best: _Trip
        nfev: jax.Array
        iter: jax.Array

    shrink0 = _ShrinkCarry(
        a=bres.a,
        b=bres.b,
        accepted=bres.accepted,
        accept_trip=bres.accept_trip,
        collapsed=jnp.zeros((), jnp.bool_),
        best=bres.best,
        nfev=bres.nfev,
        iter=bres.iter,
    )

    run_shrink = jnp.logical_and(
        bres.bracketed, ~jnp.logical_or(bres.accepted, bres.failed)
    )

    def shrink_cond(c: _ShrinkCarry):
        active = ~jnp.logical_or(c.accepted, c.collapsed)
        active = jnp.logical_and(active, run_shrink)
        return jnp.logical_and(active, c.iter < _MAX_LS)

    def shrink_body(c: _ShrinkCarry) -> _ShrinkCarry:
        collapsed = c.b.alpha - c.a.alpha <= eps * c.b.alpha

        hit, hit_trip, iA, iB, best, nfev = secant2(
            c.a, c.b, c.best, c.nfev
        )

        # L2 fallback when the shrink was too slow (hager_zhang.h:499-533).
        slow = (iB.alpha - iA.alpha) >= _GAMMA * (c.b.alpha - c.a.alpha)
        cm, nfev_m = phi_dphi((iA.alpha + iB.alpha) / 2.0, nfev)
        best_m = better_best(best, cm)
        m_hit = wolfe(cm)
        mA, mB, m_uhit, best_m2, nfev_m2 = update(iA, iB, cm, best_m, nfev_m)

        use_l2 = jnp.logical_and(~hit, jnp.logical_and(~collapsed, slow))
        any_hit = jnp.logical_or(
            hit,
            jnp.logical_and(use_l2, jnp.logical_or(m_hit, m_uhit)),
        )
        accept_trip = select_trip(
            hit,
            hit_trip,
            select_trip(m_hit, cm, mB),
        )
        new_a = select_trip(use_l2, mA, iA)
        new_b = select_trip(use_l2, mB, iB)
        best_out = select_trip(use_l2, best_m2, best)
        nfev_out = jnp.where(use_l2, nfev_m2, nfev)

        keep_old = collapsed
        return _ShrinkCarry(
            a=select_trip(keep_old, c.a, new_a),
            b=select_trip(keep_old, c.b, new_b),
            accepted=jnp.where(collapsed, c.accepted, any_hit),
            accept_trip=select_trip(collapsed, c.accept_trip, accept_trip),
            collapsed=collapsed,
            best=select_trip(keep_old, c.best, best_out),
            nfev=jnp.where(keep_old, c.nfev, nfev_out),
            iter=c.iter + 1,
        )

    sres = lax.while_loop(shrink_cond, shrink_body, shrink0)

    # -- Final selection ------------------------------------------------------
    # Priority: wolfe-accepted trip; else collapsed interval's a (if > 0);
    # else best-seen (if > 0); else the start (ok=False).
    accepted = jnp.logical_or(bres.accepted, sres.accepted)
    accept_trip = select_trip(bres.accepted, bres.accept_trip, sres.accept_trip)

    collapse_usable = jnp.logical_and(sres.collapsed, sres.a.alpha > 0.0)
    best_usable = sres.best.alpha > 0.0

    final_trip = select_trip(
        accepted,
        accept_trip,
        select_trip(collapse_usable, sres.a, sres.best),
    )
    alpha = jnp.where(
        jnp.logical_or(
            accepted, jnp.logical_or(collapse_usable, best_usable)
        ),
        final_trip.alpha,
        jnp.zeros((), dtype),
    )
    ok = jnp.logical_and(
        ~no_descent,
        jnp.logical_or(
            accepted, jnp.logical_or(collapse_usable, best_usable)
        ),
    )
    # No-descent abort leaves the step width at its initial value with the
    # start state untouched — the C++ returns -1 before ever writing *stp
    # (hager_zhang.h:301-302).
    alpha = jnp.where(no_descent, jnp.asarray(alpha_init, dtype), alpha)

    # The accepted sample's own evaluation IS the returned state — the
    # reference's workspace threading (hager_zhang.h:444-455): no re-eval.
    x_out = jnp.where(ok, x0 + final_trip.alpha * s, x0)
    return HagerZhangResult(
        x=x_out,
        f=jnp.where(ok, final_trip.phi, f0),
        g=jnp.where(ok, final_trip.g, g0),
        alpha=alpha,
        nfev=sres.nfev,
        ok=ok,
    )
