"""Cross-language validation against the native C++ oracle.

The oracle (native/cppns_oracle.cc) reimplements MINPACK ``cstep`` and a set
of MGH gradients independently of both JAX and the Python port; agreement
pins down transcription errors on the numerics that decide benchmark
reliability.  Reference provenance of the Python cstep: more_thuente.h
:261-407 (itself a MINPACK port).
"""

import numpy as np
import pytest

from cppnumericalsolvers_tpu.linesearch.more_thuente import cstep
from cppnumericalsolvers_tpu.models.suite import mgh_suite
from cppnumericalsolvers_tpu.utils.native import MGH_ORACLE_IDS, load_oracle

oracle = load_oracle()
pytestmark = pytest.mark.skipif(
    oracle is None, reason="no C++ toolchain for the native oracle"
)


def _random_cstep_inputs(rng):
    """Generate a valid cstep input state (descent at stx, trial ordered)."""
    stx = rng.uniform(0.0, 1.0)
    dx = -rng.uniform(0.1, 2.0)  # descent at best step
    stp = stx + rng.uniform(0.01, 2.0)  # dx*(stp-stx) < 0 required
    fx = rng.uniform(-1.0, 1.0)
    fp = fx + rng.uniform(-0.5, 1.0)
    dp = rng.uniform(-2.0, 2.0)
    brackt = bool(rng.integers(0, 2))
    if brackt:
        sty = stp + rng.uniform(0.05, 1.0)
        # keep stp strictly inside (min, max) of (stx, sty)
        stp = stx + rng.uniform(0.05, 0.95) * (sty - stx)
    else:
        sty = stx
    fy = rng.uniform(-1.0, 1.0) if brackt else fx
    dy = rng.uniform(-2.0, 2.0) if brackt else dx
    stpmin, stpmax = 0.0, 10.0
    return stx, fx, dx, sty, fy, dy, stp, fp, dp, brackt, stpmin, stpmax


def test_cstep_matches_oracle_randomized():
    rng = np.random.default_rng(0)
    checked = 0
    for _ in range(500):
        args = _random_cstep_inputs(rng)
        info_c, out_c = oracle.cstep(*args)
        state_j = cstep(*args)
        assert info_c == int(state_j.info), (args, info_c, int(state_j.info))
        if info_c == 0:
            continue  # input-error: C++ returns untouched state
        checked += 1
        np.testing.assert_allclose(float(state_j.stx), out_c["stx"], rtol=1e-12)
        np.testing.assert_allclose(float(state_j.sty), out_c["sty"], rtol=1e-12)
        np.testing.assert_allclose(float(state_j.fx), out_c["fx"], rtol=1e-12)
        np.testing.assert_allclose(float(state_j.fy), out_c["fy"], rtol=1e-12)
        np.testing.assert_allclose(float(state_j.dx), out_c["dx"], rtol=1e-12)
        np.testing.assert_allclose(float(state_j.dy), out_c["dy"], rtol=1e-12)
        np.testing.assert_allclose(
            float(state_j.stp), out_c["stp"], rtol=1e-10, atol=1e-12
        )
        assert bool(state_j.brackt) == out_c["brackt"]
    assert checked > 300  # the generator must mostly produce valid states


@pytest.mark.parametrize("name", sorted(MGH_ORACLE_IDS))
def test_mgh_gradients_match_oracle(name):
    """jax.grad of the suite objectives vs hand-derived C++ gradients."""
    problem = next(p for p in mgh_suite("float64") if p.name == name)
    rng = np.random.default_rng(hash(name) % 2**32)
    for _ in range(10):
        x = problem.x0 * (1.0 + rng.uniform(-0.3, 0.3, problem.x0.shape))
        f_c, g_c = oracle.mgh(name, x)
        f_j = float(problem.objective.fn(x))
        g_j = np.asarray(problem.objective.gradient(x))
        np.testing.assert_allclose(f_j, f_c, rtol=1e-10)
        np.testing.assert_allclose(g_j, np.asarray(g_c), rtol=1e-8, atol=1e-10)
