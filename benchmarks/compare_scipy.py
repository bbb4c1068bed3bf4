"""Head-to-head: cppnumericalsolvers_tpu L-BFGS vs SciPy's L-BFGS-B.

The reference's headline claim (README.md:6-11) is a 376-problem shoot-out
against Nocedal's Fortran L-BFGS, libLBFGS, LBFGSpp and LBFGS-Lite: highest
reliability (95%), most first-place wins (230/376), lowest mean nfev.  This
script reproduces that experiment shape for the new framework against the
one comparator available in this environment — ``scipy.optimize`` L-BFGS-B,
the direct descendant of the Fortran code two of those libraries wrap.

Same 376-instance MGH suite as bench.py (58 distinct problems), same success
contract (f within 1e-4 of f*, or relative gradient test), same eval
accounting (every objective/gradient evaluation counts once), and a
SYMMETRIC protocol: both sides get exactly one attempt per instance (the
reference's own single-run protocol); compile time is excluded from our wall
time by the same pre-warm pass bench.py uses.  Runs on the CPU backend in
float64 for an apples-to-apples comparison with SciPy.

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
from cppnumericalsolvers_tpu import minimize_batched  # noqa: E402


def run_ours(batches, solver, stopping):
    """One attempt per instance, using bench.py's own success/fetch logic
    (fetch_all: one device_get for the whole list)."""
    pending = [
        (problem, minimize_batched(
            problem.objective, jnp.asarray(starts), solver, stopping))
        for problem, starts in batches
    ]
    records = bench.fetch_all(pending)
    return (
        np.concatenate([r["ok"] for r in records]),
        np.concatenate([r["nfev"] for r in records]),
    )


def run_scipy(batches):
    """SciPy L-BFGS-B (unbounded => plain L-BFGS), matched settings.

    m=10 history, gtol at our absolute gradient floor, generous maxfun;
    nfev counts objective+gradient evaluations once each (SciPy's fun/jac
    are fused here, as in our value_and_grad)."""
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
            f = np.asarray([float(res.fun)])
            ginf = np.asarray([np.max(np.abs(np.asarray(res.jac)))])
            xinf = np.asarray([np.max(np.abs(np.asarray(res.x)))])
            ok_list.append(bench.success_mask(problem, f, ginf, xinf)[0])
            nfev_list.append(float(res.nfev))
        oks.append(np.asarray(ok_list))
        nfevs.append(np.asarray(nfev_list))
    return np.concatenate(oks), np.concatenate(nfevs)


def main():
    batches = bench.benchmark_batches()
    solver = bench.reliability_solver()
    stopping = bench.reliability_stopping()
    # Pre-warm our compile cache so ours_wall_s measures solves, not XLA
    # compilation (SciPy has no compile phase to amortize).
    bench.precompile(batches, solver, stopping)

    t0 = time.perf_counter()
    ours_ok, ours_nfev = run_ours(batches, solver, stopping)
    t_ours = time.perf_counter() - t0
    t0 = time.perf_counter()
    sp_ok, sp_nfev = run_scipy(batches)
    t_sp = time.perf_counter() - t0

    both = ours_ok & sp_ok
    # First-place metric among commonly-solved instances, the reference's
    # accounting: strictly fewer evaluations is a win; ties are reported
    # separately AND split evenly into the headline win counts so
    # `nfev_first_place` is directly comparable to the reference's 230/376.
    wins = int(np.sum(ours_nfev[both] < sp_nfev[both]))
    losses = int(np.sum(ours_nfev[both] > sp_nfev[both]))
    ties = int(both.sum()) - wins - losses
    out = {
        "metric": "ours_vs_scipy_lbfgsb_single_solve",
        "total_instances": int(ours_ok.size),
        "ours_converged_pct": round(100.0 * float(ours_ok.mean()), 2),
        "scipy_converged_pct": round(100.0 * float(sp_ok.mean()), 2),
        "ours_mean_nfev": round(float(ours_nfev.mean()), 1),
        "scipy_mean_nfev": round(float(sp_nfev.mean()), 1),
        "both_solved": int(both.sum()),
        "nfev_wins": wins,
        "nfev_ties": ties,
        "nfev_losses": losses,
        "nfev_first_place": round(wins + ties / 2.0, 1),
        "ours_wall_s": round(t_ours, 1),
        "scipy_wall_s": round(t_sp, 1),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
