"""MGH benchmark-suite reliability regression.

The reference's headline claim is 95% convergence on a 376-problem benchmark
built on the MGH set (reference README.md:6-11, BASELINE.md).  This test pins
the single-start MGH reliability of our L-BFGS under the reference's
Conservative stopping preset (progress.h:437-464) — the preset the reference
itself prescribes for the MGH problems with flat valleys (progress.h:420-427).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from cppnumericalsolvers_tpu import conservative_stopping, minimize
from cppnumericalsolvers_tpu.models.suite import mgh_suite
from cppnumericalsolvers_tpu.solvers import Lbfgs


def _is_converged(problem, result) -> bool:
    f = float(result.state.value)
    g = float(np.max(np.abs(result.state.gradient)))
    x = float(np.max(np.abs(result.state.x)))
    if not np.isfinite(f):
        return False
    grad_ok = g < 1e-5 * max(1.0, x)
    f_ok = problem.f_star is not None and f <= problem.f_star + 1e-4 * max(
        1.0, abs(problem.f_star)
    )
    return grad_ok or f_ok


def test_mgh_suite_reliability_lbfgs():
    solver = Lbfgs()
    stopping = conservative_stopping(jnp.float64)
    results = {}
    for problem in mgh_suite("float64"):
        result = minimize(problem.objective, problem.x0, solver, stopping)
        results[problem.name] = _is_converged(problem, result)
    failed = [name for name, ok in results.items() if not ok]
    # 35/35 at the time of writing (full MGH set incl. Osborne-2 and linear
    # rank-1 with zero columns/rows); allow one regression before failing
    # the build so numerically-neutral refactors don't flap the suite.
    assert len(failed) <= 1, f"MGH failures: {failed}"


def test_benchmark_instances_shape_and_diversity():
    # The 376-instance benchmark must cover the full MGH set as DISTINCT
    # problems (>= 35 distinct functions incl. dimension variants), with the
    # standard start first in every batch and exact instance count.
    from cppnumericalsolvers_tpu.models.suite import mgh_benchmark_instances

    import functools

    insts = mgh_benchmark_instances(376)
    assert sum(b.shape[0] for _, b in insts) == 376
    assert len(insts) >= 55  # 58 distinct (function, dimension) problems
    assert len({p.name for p, _ in insts}) == len(insts)
    # Distinct analytic function definitions (the full 35-member MGH set).
    fns = {
        p.objective.fn.func
        if isinstance(p.objective.fn, functools.partial)
        else p.objective.fn
        for p, _ in insts
    }
    assert len(fns) >= 35
    for problem, starts in insts:
        np.testing.assert_array_equal(starts[0], problem.x0)
        # Starts are pairwise distinct instances.
        assert len({tuple(s.tolist()) for s in starts}) == starts.shape[0]


def test_osborne2_and_linear_rank1_zero_values():
    # New MGH members: objective value sanity at the standard start against
    # independently-computed values (MGH 1981 residual definitions).
    from cppnumericalsolvers_tpu.models.suite import mgh_suite

    by_name = {p.name: p for p in mgh_suite("float64")}
    o2 = by_name["osborne2"]
    # f(x0) for Osborne 2 is ~2.09 (sum of squared residuals at x0).
    f0 = float(o2.objective.fn(jnp.asarray(o2.x0)))
    assert 1.0 < f0 < 3.0
    lrz = by_name["linear_rank1_zero10"]
    # At x0 = ones: s = sum_{j=2..9} j = 44; r_mid = (i-1)*44 - 1 for
    # i=2..19; f = 2 + sum((44(i-1)-1)^2, i=2..19).
    expected = 2.0 + sum((44.0 * (i - 1) - 1.0) ** 2 for i in range(2, 20))
    f0 = float(lrz.objective.fn(jnp.asarray(lrz.x0)))
    assert f0 == pytest.approx(expected, rel=1e-12)


@pytest.mark.parametrize("name", ["rosenbrock", "meyer", "powell_badly_scaled"])
def test_mgh_hard_problems_reach_f_star(name):
    """Meyer and Powell-badly-scaled are the reference's documented plateau
    pathologies (progress.h:388-392, :420-427); they must reach f* under the
    Conservative preset."""
    problem = next(p for p in mgh_suite("float64") if p.name == name)
    result = minimize(
        problem.objective, problem.x0, Lbfgs(), conservative_stopping(jnp.float64)
    )
    assert float(result.state.value) <= problem.f_star + 1e-4 * max(
        1.0, abs(problem.f_star)
    )
