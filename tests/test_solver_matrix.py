"""Solver convergence matrix: every solver x Rosenbrock x two starts.

Port of the reference's verification suite
(reference: src/test/verify.cc:117-191): each solver must drive f(x) on
2-D Rosenbrock to within PRECISION=1e-4 of f*=0 from the "Far" start (15, 8)
and the "Near" start (-1, 2).  GradientDescent and NelderMead use the
conservative stopping preset, as in SOLVER_SETUP_CONSERVATIVE
(verify.cc:185-192); NelderMead additionally needs more plateau room on the
Far start than the C++ (its vectorized restart schedule differs slightly).
"""

import jax.numpy as jnp
import pytest

from cppnumericalsolvers_tpu import Status, conservative_stopping, minimize
from cppnumericalsolvers_tpu.models import rosenbrock
from cppnumericalsolvers_tpu.solvers import (
    Bfgs,
    ConjugateGradientDescent,
    GradientDescent,
    Lbfgs,
    NelderMead,
    NewtonDescent,
    TrustRegionNewton,
)

PRECISION = 1e-4
FAR = (15.0, 8.0)
NEAR = (-1.0, 2.0)


def _stopping_for(solver_name, dtype):
    if solver_name in ("GradientDescent", "NelderMead"):
        crit = conservative_stopping(dtype)
        if solver_name == "NelderMead":
            crit = crit.replace(x_delta_violations=5)
        return crit
    return None


SOLVERS = {
    "GradientDescent": GradientDescent(),
    "ConjugateGradientDescent": ConjugateGradientDescent(),
    "Bfgs": Bfgs(),
    "Lbfgs": Lbfgs(),
    "NewtonDescent": NewtonDescent(),
    "TrustRegionNewton": TrustRegionNewton(),
    "NelderMead": NelderMead(),
}


@pytest.mark.parametrize("start_name,start", [("Far", FAR), ("Near", NEAR)])
@pytest.mark.parametrize("solver_name", sorted(SOLVERS))
def test_rosenbrock_matrix(solver_name, start_name, start):
    solver = SOLVERS[solver_name]
    stopping = _stopping_for(solver_name, jnp.float64)
    res = minimize(rosenbrock(), jnp.asarray(start), solver, stopping)
    f_final = float(res.state.value)
    assert f_final == pytest.approx(0.0, abs=PRECISION), (
        f"{solver_name} {start_name}: f={f_final}, "
        f"status={int(res.progress.status)}, "
        f"iters={int(res.progress.num_iterations)}"
    )


def test_trust_region_hessian_free():
    res = minimize(
        rosenbrock(), jnp.asarray(FAR), TrustRegionNewton(hessian_free=True)
    )
    assert float(res.state.value) == pytest.approx(0.0, abs=PRECISION)


@pytest.mark.parametrize("start_name,start", [("Far", FAR), ("Near", NEAR)])
def test_rosenbrock_matrix_lbfgsb(start_name, start):
    """The Lbfgsb leg of the matrix (verify.cc:163-165, :189-191): a box
    wide enough to contain both starts and the optimum reproduces the
    unconstrained solution."""
    from cppnumericalsolvers_tpu.solvers import Lbfgsb

    res = minimize(
        rosenbrock(), jnp.asarray(start), Lbfgsb(lower=-50.0, upper=50.0)
    )
    assert float(res.state.value) == pytest.approx(0.0, abs=PRECISION)


class TestModeVariants:
    """Differentiability-mode matrix (verify.cc:36-100 builds value-only /
    gradient / full Rosenbrock variants; the mode system replaces the C++
    type-level plumbing — function_base.h:42-46, :191-260)."""

    def test_first_mode_downgrade_solves(self):
        # Second -> First downgrade (ModeDowngradeAdapter analog).
        obj = rosenbrock().with_mode("first")
        res = minimize(obj, jnp.asarray(NEAR), Lbfgs())
        assert float(res.state.value) == pytest.approx(0.0, abs=PRECISION)

    def test_value_only_mode_solves_with_nelder_mead(self):
        obj = rosenbrock().with_mode("none")
        crit = conservative_stopping(jnp.float64).replace(x_delta_violations=5)
        res = minimize(obj, jnp.asarray(NEAR), NelderMead(), crit)
        assert float(res.state.value) == pytest.approx(0.0, abs=PRECISION)

    def test_mode_upgrade_refused(self):
        # The reference refuses upgrades at compile time
        # (function_base.h:191-260); here it is an eager ValueError.
        obj = rosenbrock().with_mode("first")
        with pytest.raises(ValueError, match="upgrade"):
            obj.with_mode("second")

    def test_gradient_solver_rejects_value_only_objective(self):
        obj = rosenbrock().with_mode("none")
        with pytest.raises(ValueError, match="requires"):
            minimize(obj, jnp.asarray(NEAR), Lbfgs())

    def test_hessian_request_on_first_mode_raises(self):
        # function_base.h:108-115's Hessian-request guard, at trace time.
        obj = rosenbrock().with_mode("first")
        with pytest.raises(ValueError, match="cannot provide"):
            obj.hessian(jnp.asarray(NEAR))
