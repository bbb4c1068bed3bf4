"""Pluggable line searches: every solver/search combination must converge.

Parity point: the reference's ``LineSearch`` template parameter
(lbfgs.h:40-41, bfgs.h:39-40, gradient_descent.h:37-38)."""

import jax.numpy as jnp
import pytest

from cppnumericalsolvers_tpu import conservative_stopping, minimize
from cppnumericalsolvers_tpu.models import rosenbrock
from cppnumericalsolvers_tpu.solvers import Bfgs, GradientDescent, Lbfgs


@pytest.mark.parametrize("search", ["more_thuente", "hager_zhang", "armijo"])
@pytest.mark.parametrize(
    "solver_cls", [Lbfgs, Bfgs, GradientDescent], ids=["lbfgs", "bfgs", "gd"]
)
def test_solver_with_search_converges(solver_cls, search):
    solver = solver_cls(line_search=search)
    # GradientDescent zigzags on Rosenbrock; the reference's own test matrix
    # gives it the conservative preset (verify.cc:138-155).
    stopping = (
        conservative_stopping(jnp.float64)
        if solver_cls is GradientDescent
        else None
    )
    result = minimize(rosenbrock(), jnp.array([-1.2, 1.0]), solver, stopping)
    assert float(result.state.value) < 1e-4, (
        solver_cls.__name__,
        search,
        float(result.state.value),
    )


def test_unknown_search_raises():
    with pytest.raises(ValueError, match="unknown line search"):
        minimize(rosenbrock(), jnp.array([-1.2, 1.0]), Lbfgs(line_search="nope"))


@pytest.mark.parametrize("search", ["more_thuente", "hager_zhang", "armijo"])
def test_alpha_only_overload(search):
    """The reference's alpha-only overload (more_thuente.h:63-77): supply
    only (x0, direction); the search evaluates the start itself and the
    returned alpha satisfies sufficient decrease on a convex quadratic."""
    import jax
    from cppnumericalsolvers_tpu.linesearch import line_search_alpha

    def quad(x):
        return 0.5 * jnp.sum(x * x)

    vg = jax.value_and_grad(quad)
    x0 = jnp.array([2.0, -3.0])
    direction = -vg(x0)[1]  # steepest descent
    r = line_search_alpha(search, vg, x0, direction, alpha_init=1.0)
    f0 = float(quad(x0))
    assert float(r.f) < f0  # decrease achieved at the returned alpha
    assert float(r.alpha) > 0.0
    assert int(r.nfev) >= 2  # start eval is billed (the +1 overload cost)
    # The cached-output overload's (x, f, g) are at the accepted step.
    assert float(jnp.max(jnp.abs(r.x - (x0 + r.alpha * direction)))) < 1e-12
