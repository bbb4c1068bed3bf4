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
