"""Trust-region Newton with a CG-Steihaug subproblem solver.

TPU-native port of the reference's TrustRegionNewton
(reference: include/cppoptlib/solver/trust_region_newton.h:78-456):

* Eisenstat–Walker CG forcing ``0.5 * min(0.5, sqrt(|g|)) * |g|``
  (trust_region_newton.h:215-220);
* CG-Steihaug with negative-curvature and trust-region-boundary exits plus
  the boundary-extension root solve (:339-451);
* in-step rejection loop: shrink on poor agreement, grow on good agreement at
  the boundary, accept on ``rho > eta`` (:238-311);
* all 11 config knobs with the reference's defaults (:78-141).

Both inner loops are ``lax.while_loop``s with masked exits, so the whole step
jits and vmaps.  ``hessian_free=True`` swaps the explicit (n, n) Hessian for
``jax.jvp``-based Hessian-vector products — the TPU-native option for large n
where materialising H would blow HBM.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..core.driver import SolverBase
from ..core.objective import FunctionState, Objective
from ..core.progress import StoppingCriteria
from ..utils.linalg import condition_test_enabled, frobenius_condition

__all__ = ["TrustRegionNewton", "solve_tr_subproblem"]


class TrInternals(NamedTuple):
    radius: jax.Array  # persists across steps (trust_region_newton.h:455)
    #: cond(H) of the step's materialised Hessian for the
    #: HessianConditionViolation test (progress.h:197-208); zero (criterion
    #: inert) in hessian_free mode where H is never formed.
    condition_hessian: jax.Array


class _CgCarry(NamedTuple):
    p: jax.Array
    residual: jax.Array
    direction: jax.Array
    residual_dot: jax.Array
    iteration: jax.Array
    done: jax.Array
    hit_boundary: jax.Array


def _extend_to_boundary(p, direction, radius):
    """Positive root of ``|p + tau d|^2 = radius^2``
    (trust_region_newton.h:436-451)."""
    a = jnp.vdot(direction, direction)
    b = 2.0 * jnp.vdot(p, direction)
    c = jnp.vdot(p, p) - radius * radius
    disc = jnp.maximum(b * b - 4.0 * a * c, 0.0)
    tau = (-b + jnp.sqrt(disc)) / (2.0 * a)
    return p + tau * direction


def solve_tr_subproblem(gradient, hvp, radius, cg_tolerance, max_iterations):
    """CG-Steihaug: approximately minimise ``g.p + 0.5 p.H.p`` s.t.
    ``|p| <= radius`` (trust_region_newton.h:339-426).

    ``hvp`` is a closure computing Hessian-vector products.  Returns
    ``(step, hit_boundary)``.
    """
    residual_dot0 = jnp.vdot(gradient, gradient)

    # Early exit: gradient already below tolerance (:366-370).
    trivially_done = jnp.sqrt(residual_dot0) <= cg_tolerance

    init = _CgCarry(
        p=jnp.zeros_like(gradient),
        residual=gradient,
        direction=-gradient,
        residual_dot=residual_dot0,
        iteration=jnp.zeros((), jnp.int32),
        done=trivially_done,
        hit_boundary=jnp.zeros((), jnp.bool_),
    )

    def cond(c: _CgCarry):
        return jnp.logical_and(~c.done, c.iteration < max_iterations)

    def body(c: _CgCarry) -> _CgCarry:
        hd = hvp(c.direction)
        curvature = jnp.vdot(c.direction, hd)
        # `!(curvature > 0)` absorbs NaN (:380-386).
        negative_curvature = ~(curvature > 0.0)

        alpha = c.residual_dot / jnp.where(
            negative_curvature, 1.0, curvature
        )
        p_candidate = c.p + alpha * c.direction
        leaves_region = jnp.linalg.norm(p_candidate) >= radius

        boundary_exit = jnp.logical_or(negative_curvature, leaves_region)
        p_boundary = _extend_to_boundary(c.p, c.direction, radius)

        residual_new = c.residual + alpha * hd
        converged = jnp.linalg.norm(residual_new) <= cg_tolerance
        residual_dot_new = jnp.vdot(residual_new, residual_new)
        beta = residual_dot_new / c.residual_dot
        direction_new = -residual_new + beta * c.direction

        done = jnp.logical_or(boundary_exit, converged)
        p_next = jnp.where(boundary_exit, p_boundary, p_candidate)
        return _CgCarry(
            p=jnp.where(done, p_next, p_candidate),
            residual=jnp.where(done, c.residual, residual_new),
            direction=jnp.where(done, c.direction, direction_new),
            residual_dot=jnp.where(done, c.residual_dot, residual_dot_new),
            iteration=c.iteration + 1,
            done=done,
            hit_boundary=jnp.logical_or(c.hit_boundary, boundary_exit),
        )

    final = lax.while_loop(cond, body, init)
    return final.p, final.hit_boundary


class _RejectCarry(NamedTuple):
    radius: jax.Array
    accepted: jax.Array
    trial_x: jax.Array
    retry: jax.Array
    nfev: jax.Array
    stop: jax.Array


@dataclasses.dataclass(frozen=True)
class TrustRegionNewton(SolverBase):
    """Config defaults match TrustRegionNewtonConfig
    (trust_region_newton.h:78-141)."""

    mode: str = dataclasses.field(default="second", init=False, repr=False)
    initial_radius: float = 1.0
    max_radius: float = 1e10
    acceptance_threshold: float = 0.15
    shrink_factor: float = 0.25
    expand_factor: float = 2.0
    rho_low: float = 0.25
    rho_high: float = 0.75
    cg_forcing_coefficient: float = 0.5
    cg_max_iterations_floor: int = 10
    min_radius: float = 1e-12
    rejection_retry_limit: int = 50
    #: Use jvp-based Hessian-vector products instead of materialising the
    #: dense Hessian — preferred for large n on TPU.
    hessian_free: bool = False

    def init(self, objective: Objective, state: FunctionState) -> TrInternals:
        return TrInternals(
            radius=jnp.asarray(self.initial_radius, state.x.dtype),
            condition_hessian=jnp.zeros((), state.x.dtype),
        )

    def check_mode(self, objective: Objective) -> None:
        required = "first" if self.hessian_free else "second"
        order = {"none": 0, "first": 1, "second": 2}
        if order[objective.mode] < order[required]:
            raise ValueError(
                f"TrustRegionNewton(hessian_free={self.hessian_free}) "
                f"requires a {required}-mode objective."
            )

    def step(
        self,
        objective: Objective,
        state: FunctionState,
        internals: TrInternals,
        stopping: StoppingCriteria,
    ):
        x = state.x
        n = x.shape[-1]
        gradient = state.gradient
        current_value = state.value

        if self.hessian_free:
            def hvp(v):
                return objective.hvp(x, v)
            hessian_nfev = 0
            condition_hessian = jnp.zeros((), x.dtype)
        else:
            hessian = objective.hessian(x)

            def hvp(v):
                return hessian @ v
            hessian_nfev = 1  # the fresh H eval (:199-201)
            # Skip the cond(H) inverse when the criterion is disabled
            # (utils/linalg.py condition_test_enabled).
            condition_hessian = (
                frobenius_condition(hessian)
                if condition_test_enabled(stopping)
                else jnp.zeros((), x.dtype)
            )

        # Eisenstat-Walker forcing (:215-220).
        gradient_inf = jnp.max(jnp.abs(gradient))
        forcing = jnp.minimum(0.5, jnp.sqrt(gradient_inf))
        cg_tolerance = self.cg_forcing_coefficient * forcing * gradient_inf

        cg_max_iterations = n + max(self.cg_max_iterations_floor, 0)
        retry_limit = min(max(self.rejection_retry_limit, 0), 1000)

        def reject_body(c: _RejectCarry) -> _RejectCarry:
            step_p, hit_boundary = solve_tr_subproblem(
                gradient, hvp, c.radius, cg_tolerance, cg_max_iterations
            )
            trial_x = x + step_p
            trial_value = objective.value(trial_x)
            predicted = -jnp.vdot(gradient, step_p) - 0.5 * jnp.vdot(
                step_p, hvp(step_p)
            )
            actual = current_value - trial_value
            rho = jnp.where(
                predicted <= 0.0,
                -jnp.inf,
                actual / jnp.where(predicted <= 0.0, 1.0, predicted),
            )

            # Radius update (:274-287).
            radius = jnp.where(
                rho < self.rho_low,
                c.radius * self.shrink_factor,
                jnp.where(
                    jnp.logical_and(rho > self.rho_high, hit_boundary),
                    jnp.minimum(
                        self.expand_factor * c.radius, self.max_radius
                    ),
                    c.radius,
                ),
            )

            accepted = rho > self.acceptance_threshold
            # Radius stall floor ends the rejection loop (:300-310).
            stop = jnp.logical_or(accepted, radius <= self.min_radius)
            return _RejectCarry(
                radius=radius,
                accepted=accepted,
                trial_x=jnp.where(accepted, trial_x, c.trial_x),
                retry=c.retry + 1,
                nfev=c.nfev + 1,
                stop=stop,
            )

        init = _RejectCarry(
            radius=internals.radius,
            accepted=jnp.zeros((), jnp.bool_),
            trial_x=x,
            retry=jnp.zeros((), jnp.int32),
            nfev=jnp.zeros((), jnp.int32),
            stop=jnp.zeros((), jnp.bool_),
        )
        final = lax.while_loop(
            lambda c: jnp.logical_and(~c.stop, c.retry < retry_limit),
            reject_body,
            init,
        )

        # Accepted: fresh populated state at the trial point (:296-298);
        # rejected to stall: return `current` so the outer x_delta test fires.
        new_x = jnp.where(final.accepted, final.trial_x, x)
        value, grad = objective.value_and_grad(new_x)
        next_state = FunctionState(
            x=new_x,
            value=jnp.where(final.accepted, value, current_value),
            gradient=jnp.where(final.accepted, grad, gradient),
            nfev=state.nfev
            + final.nfev
            + hessian_nfev
            + jnp.where(final.accepted, 1, 0),
        )
        return next_state, TrInternals(
            radius=final.radius, condition_hessian=condition_hessian
        )
