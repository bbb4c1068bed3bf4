"""Head-to-head: cppnumericalsolvers_tpu L-BFGS vs SciPy's L-BFGS-B.

The reference's headline claim (README.md:6-11) is a 376-problem shoot-out
against Nocedal's Fortran L-BFGS, libLBFGS, LBFGSpp and LBFGS-Lite: highest
reliability (95%), most first-place wins (230/376), lowest mean nfev.  This
script reproduces that experiment shape for the new framework against the
one comparator available in this environment — ``scipy.optimize`` L-BFGS-B,
the direct descendant of the Fortran code two of those libraries wrap.

Same 376-instance multistart MGH suite as bench.py, same success contract
(f within 1e-4 of f*, or relative gradient test), same eval accounting
(every objective/gradient evaluation counts once).  Runs on the CPU backend
in float64 for an apples-to-apples comparison with SciPy.

Usage: python benchmarks/compare_scipy.py   (prints one JSON line)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/cppns_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from scipy import optimize  # noqa: E402

import bench  # noqa: E402  (repo-root harness: suite + stopping + checks)
from cppnumericalsolvers_tpu import (  # noqa: E402
    conservative_stopping,
    minimize_batched,
)
from cppnumericalsolvers_tpu.solvers import Lbfgs  # noqa: E402


def _success(problem, f, ginf, xinf):
    grad_ok = ginf < 1e-5 * np.maximum(1.0, xinf)
    if problem.f_star is not None:
        f_ok = f <= problem.f_star + 1e-4 * max(1.0, abs(problem.f_star))
    else:
        f_ok = np.zeros_like(grad_ok, dtype=bool)
    return np.isfinite(f) & (grad_ok | f_ok)


def run_ours(batches):
    solver = Lbfgs(m=10)
    stopping = conservative_stopping(jnp.float64).replace(x_delta_violations=2)
    oks, nfevs = [], []
    for problem, starts in batches:
        result = minimize_batched(
            problem.objective, jnp.asarray(starts), solver, stopping
        )
        f = np.asarray(result.state.value)
        ginf = np.max(np.abs(np.asarray(result.state.gradient)), axis=-1)
        xinf = np.max(np.abs(np.asarray(result.state.x)), axis=-1)
        nfev = np.asarray(result.state.nfev, dtype=np.float64)
        ok = _success(problem, f, ginf, xinf)
        # Same polish-restart policy as bench.py run_reliability: failed
        # lanes get up to two clean restarts, billed to their nfev.
        x = np.asarray(result.state.x)
        for _ in range(2):
            if ok.all():
                break
            r2 = minimize_batched(
                problem.objective, jnp.asarray(x), solver, stopping
            )
            f2 = np.asarray(r2.state.value)
            g2 = np.max(np.abs(np.asarray(r2.state.gradient)), axis=-1)
            x2inf = np.max(np.abs(np.asarray(r2.state.x)), axis=-1)
            n2 = np.asarray(r2.state.nfev, dtype=np.float64)
            bad = ~ok
            nfev[bad] += n2[bad]
            ok = ok | _success(problem, f2, g2, x2inf)
            x = np.asarray(r2.state.x)
        oks.append(ok)
        nfevs.append(nfev)
    return np.concatenate(oks), np.concatenate(nfevs)


def run_scipy(batches):
    """SciPy L-BFGS-B (unbounded => plain L-BFGS), matched settings.

    m=10 history, pgtol equal to our absolute gradient floor, generous
    maxfun; nfev counts objective+gradient evaluations once each (SciPy's
    fun/jac are fused here, as in our value_and_grad)."""
    oks, nfevs = [], []
    for problem, starts in batches:
        vg = jax.jit(jax.value_and_grad(problem.objective.fn))
        ok_list, nfev_list = [], []
        for x0 in starts:
            res = optimize.minimize(
                lambda x: tuple(
                    np.asarray(v, dtype=np.float64) for v in vg(x)
                ),
                np.asarray(x0, dtype=np.float64),
                jac=True,
                method="L-BFGS-B",
                options={"maxcor": 10, "ftol": 1e-12, "gtol": 1e-6,
                         "maxfun": 20000, "maxiter": 10000},
            )
            f = float(res.fun)
            g = np.asarray(res.jac)
            x = np.asarray(res.x)
            ok = _success(
                problem,
                np.asarray([f]),
                np.asarray([np.max(np.abs(g))]),
                np.asarray([np.max(np.abs(x))]),
            )[0]
            ok_list.append(ok)
            nfev_list.append(float(res.nfev))
        oks.append(np.asarray(ok_list))
        nfevs.append(np.asarray(nfev_list))
    return np.concatenate(oks), np.concatenate(nfevs)


def main():
    batches = bench._multistart_batches()
    t0 = time.perf_counter()
    ours_ok, ours_nfev = run_ours(batches)
    t_ours = time.perf_counter() - t0
    t0 = time.perf_counter()
    sp_ok, sp_nfev = run_scipy(batches)
    t_sp = time.perf_counter() - t0

    both = ours_ok & sp_ok
    # First-place wins among commonly-solved instances (the reference's
    # metric): strictly fewer evaluations wins; ties split evenly.
    wins = int(np.sum(ours_nfev[both] < sp_nfev[both]))
    losses = int(np.sum(ours_nfev[both] > sp_nfev[both]))
    ties = int(both.sum()) - wins - losses
    out = {
        "metric": "ours_vs_scipy_lbfgsb",
        "total_instances": int(ours_ok.size),
        "ours_converged_pct": round(100.0 * float(ours_ok.mean()), 2),
        "scipy_converged_pct": round(100.0 * float(sp_ok.mean()), 2),
        "ours_mean_nfev": round(float(ours_nfev.mean()), 1),
        "scipy_mean_nfev": round(float(sp_nfev.mean()), 1),
        "both_solved": int(both.sum()),
        "nfev_wins": wins,
        "nfev_ties": ties,
        "nfev_losses": losses,
        "ours_wall_s": round(t_ours, 1),
        "scipy_wall_s": round(t_sp, 1),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
