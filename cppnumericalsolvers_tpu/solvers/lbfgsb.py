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
from ..linesearch.more_thuente import more_thuente

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
    middle_lu: jax.Array  # (2m, 2m) stored LU of MM (lbfgsb.h:229-235)
    middle_piv: jax.Array  # (2m,) int32 LU pivots
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


def _solve_m(middle_lu, middle_piv, b: jax.Array) -> jax.Array:
    """Solve MM z = b from the per-step LU factorization (lbfgsb.h:311-316,
    SolveM over the stored LU at :229-235).  Identity rows/columns on invalid
    slots make this exact for any history count, including zero.  Cost per
    solve is O(m^2) triangular back-substitution — the factorization itself
    is paid once per outer step, not per Cauchy-loop trip."""
    return jax.scipy.linalg.lu_solve((middle_lu, middle_piv), b)


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


def _generalized_cauchy_point(
    x, gradient, lower, upper, W, middle_lu, middle_piv, theta
):
    """Piecewise-quadratic search along the projected steepest-descent path
    (lbfgsb.h:318-430).

    MM is symmetric ([[-D, L^T], [L, theta S^T S]]), so every quadratic form
    ``w^T MM^{-1} v`` in the breakpoint recurrences is computed from the ONE
    per-trip solve ``MM^{-1} w_b`` — O(m^2) per trip against the O(n m^3) of
    re-factoring (or generically solving) inside the loop."""
    n = x.shape[-1]
    dtype = x.dtype
    max_value = jnp.asarray(jnp.finfo(dtype).max, dtype)

    # Breakpoints t_j and initial direction d (lbfgsb.h:334-347).
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
        -theta * f_prime - jnp.vdot(p, _solve_m(middle_lu, middle_piv, p)),
    )
    f_dp_orig = f_dprime
    dt_min = -f_prime / f_dprime

    # First sorted index with a positive breakpoint, or n-1 if none
    # (lbfgsb.h:369-375).
    t_sorted_pos = t[order] > 0
    i0 = jnp.where(
        jnp.any(t_sorted_pos),
        jnp.argmax(t_sorted_pos),
        jnp.asarray(n - 1, jnp.int32),
    ).astype(jnp.int32)
    b0 = order[i0]
    t0 = t[b0]

    init = _CauchyCarry(
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

    def cond(s: _CauchyCarry):
        return jnp.logical_and(s.dt_min >= s.dt, s.i < n)

    def body(s: _CauchyCarry) -> _CauchyCarry:
        b = s.b
        db = s.d[b]
        gb = gradient[b]
        # Pin the coordinate crossing its bound (lbfgsb.h:383-386).
        xc_b = jnp.where(
            db > 0, upper[b], jnp.where(db < 0, lower[b], s.x_cauchy[b])
        )
        x_cauchy = s.x_cauchy.at[b].set(xc_b)
        zb = xc_b - x[b]
        c_new = s.c + s.dt * s.p
        wbt = W[b]  # (2m,) row of W
        # One O(m^2) triangular solve per trip; symmetry of MM gives
        # w^T M^{-1} c = (M^{-1} w)^T c for every quadratic form below.
        mwbt = _solve_m(middle_lu, middle_piv, wbt)
        f_prime = (
            s.f_prime
            + s.dt * s.f_dprime
            + gb * gb
            + theta * gb * zb
            - gb * jnp.vdot(mwbt, c_new)
        )
        f_dprime = (
            s.f_dprime
            - theta * gb * gb
            - 2.0 * gb * jnp.vdot(mwbt, s.p)
            - gb * gb * jnp.vdot(wbt, mwbt)
        )
        f_dprime = jnp.maximum(_CAUCHY_EPS * f_dp_orig, f_dprime)
        p_new = s.p + gb * wbt
        d_new = s.d.at[b].set(0.0)
        dt_min = -f_prime / f_dprime
        t_old = s.t
        i = s.i + 1
        b_next = order[jnp.minimum(i, n - 1)]
        t_next = t[b_next]
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

    fin = lax.while_loop(cond, body, init)

    dt_min = jnp.maximum(fin.dt_min, 0.0)
    t_old = fin.t_old + dt_min
    # Final drift applies only to coordinates not pinned inside the loop
    # (sorted positions >= i; lbfgsb.h:417-427).
    drift_mask = rank >= fin.i
    x_cauchy = jnp.where(drift_mask, x + t_old * fin.d, fin.x_cauchy)
    c_out = fin.c + dt_min * fin.p
    return x_cauchy, c_out


def _subspace_minimization(
    x, gradient, x_cauchy, c, lower, upper, W, middle_lu, middle_piv, theta
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
        - W @ _solve_m(middle_lu, middle_piv, c)
    )
    r = jnp.where(free_mask, rr, 0.0)

    # v = M^{-1} (W_F^T r); N = I - M^{-1} (theta^{-1} W_F^T W_F)
    # (lbfgsb.h:484-495) — W_F is W with bound rows zeroed.
    Wf = W * free_mask[:, None].astype(dtype)
    v = _solve_m(middle_lu, middle_piv, Wf.T @ r)
    N = theta_inv * (Wf.T @ Wf)
    N = jnp.eye(two_m, dtype=dtype) - _solve_m(middle_lu, middle_piv, N)
    v = jnp.linalg.solve(N, v)

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
            middle_lu=jnp.eye(2 * self.m, dtype=dtype),
            middle_piv=jnp.arange(2 * self.m, dtype=jnp.int32),
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
            internals.middle_lu, internals.middle_piv, internals.theta,
        )
        subspace_min, do_line_search = _subspace_minimization(
            x, gradient, x_cauchy, c, lower, upper, W,
            internals.middle_lu, internals.middle_piv, internals.theta,
        )

        # Line search from the current iterate toward the subspace minimiser
        # (lbfgsb.h:186-193); when no variables are free the Cauchy point is
        # taken directly with a single evaluation.
        direction = subspace_min - x
        ls = more_thuente(
            objective.value_and_grad,
            x,
            value,
            gradient,
            direction,
            alpha_init=jnp.ones((), dtype),
            max_fev=self.max_linesearch_fev,
        )
        next_x = jnp.where(do_line_search, ls.x, subspace_min)

        # Clip a bound-crossing step back into the box and re-evaluate ONLY
        # then (lbfgsb.h:199-203): when nothing was clipped the line search
        # already produced (f, g) at ``ls.x`` — re-evaluating would silently
        # break the no-redundant-evaluations invariant (function_base.h:
        # 293-296).  When no variables were free the Cauchy point is taken
        # with a single direct evaluation (lbfgsb.h:186-193).
        clipped = jnp.clip(next_x, lower, upper)
        was_clipped = jnp.any(clipped != next_x)
        need_eval = jnp.logical_or(~do_line_search, was_clipped)
        next_value, next_gradient = lax.cond(
            need_eval,
            lambda: objective.value_and_grad(clipped),
            lambda: (ls.f, ls.g),
        )
        nfev = nfev + jnp.where(
            do_line_search,
            ls.nfev + jnp.where(was_clipped, 1, 0),
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
            lu, piv = jax.scipy.linalg.lu_factor(middle)
            return s_h, y_h, cnt, th, lu, piv

        def _rejected():
            return (
                internals.s_history, internals.y_history, internals.count,
                internals.theta, internals.middle_lu, internals.middle_piv,
            )

        s_history, y_history, count, theta, middle_lu, middle_piv = lax.cond(
            accept, _accepted, _rejected
        )

        new_internals = LbfgsbInternals(
            s_history=s_history,
            y_history=y_history,
            count=count,
            theta=theta,
            middle_lu=middle_lu,
            middle_piv=middle_piv,
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
