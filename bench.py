"""Benchmark harness — the reference's headline numbers, TPU-native.

Reproduces the two claims in BASELINE.md:

* **Reliability** (reference README.md:6-11): a 376-instance benchmark built
  from the full 35-function MGH set with dimension sweeps (58 distinct
  analytic problems) and MGH-style multistarts.  Each problem's starts form
  one vmapped batch solved by jitted L-BFGS; success per instance is the
  reference's own contract (f within 1e-4 of f*, or the relative gradient
  criterion |g|_inf < 1e-5 * max(1,|x|_inf) — progress.h:383-427).  Baseline
  to beat: 95% converged.  The PRIMARY metric is single-solve convergence
  (apples-to-apples with the reference's single-run 95%); the
  restart-polished figure is reported separately and clearly labelled.
* **Throughput** (BASELINE.json north star): batched iterations/s/chip for a
  1024-instance Rosenbrock-32 L-BFGS solve in float32 on the MXU/VPU.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}
"""

from __future__ import annotations

import json
import time

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/cppns_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from cppnumericalsolvers_tpu import (  # noqa: E402
    conservative_stopping,
    minimize_batched,
    objective,
)
from cppnumericalsolvers_tpu.models.suite import (  # noqa: E402
    mgh_benchmark_instances,
)
from cppnumericalsolvers_tpu.solvers import Lbfgs  # noqa: E402

TOTAL_INSTANCES = 376  # reference benchmark size (README.md:6)
BASELINE_CONVERGED_PCT = 95.0  # reference reliability (README.md:8-9)
POLISH_ROUNDS = 2  # restart rounds for the secondary (polished) metric


def reliability_solver():
    return Lbfgs(m=10)


def reliability_stopping(dtype=jnp.float64):
    # The reference's own guidance (progress.h:414-431): MGH problems with
    # flat valleys (Powell badly scaled, Meyer, Powell singular) need the
    # Conservative preset or the plateau test fires at a non-minimiser.  Its
    # external benchmark sweeps stopping parameters (CPPOPT_SWEEP); we pin
    # the published Conservative preset for comparability, with ONE disclosed
    # deviation (also carried in the output JSON): two x-delta strikes
    # instead of one, inside the reference's own sweep space
    # (CPPOPT_X_DELTA_VIOL, progress.h:372) — the L-BFGS stall-recovery
    # reset retries a zero-move line search once as steepest descent.  The
    # f32 first pass uses the preset's f32-rescaled variant
    # (core/progress.py conservative_stopping).
    return conservative_stopping(dtype).replace(x_delta_violations=2)


def benchmark_batches(seed: int = 0, dtype_str: str = "float64"):
    """The 376 distinct benchmark instances (58 distinct analytic problems
    x 6-7 starts each: standard x0, MGH scaled starts, seeded jitters)."""
    return mgh_benchmark_instances(TOTAL_INSTANCES, seed=seed,
                                   dtype_str=dtype_str)


def success_mask(problem, f, ginf, xinf):
    """The reference's per-instance success contract (progress.h:383-427)."""
    grad_ok = ginf < 1e-5 * np.maximum(1.0, xinf)
    if problem.f_star is not None:
        f_ok = f <= problem.f_star + 1e-4 * max(1.0, abs(problem.f_star))
    else:
        f_ok = np.zeros_like(grad_ok, dtype=bool)
    return np.isfinite(f) & (grad_ok | f_ok)


def fetch_metrics(problem, result):
    """Per-instance record dict off a MinimizeResult — forces device
    completion.  Keys: ok, nfev, x, f, status, iters."""
    f = np.asarray(result.state.value, dtype=np.float64)
    ginf = np.max(np.abs(np.asarray(result.state.gradient)), axis=-1)
    xinf = np.max(np.abs(np.asarray(result.state.x)), axis=-1)
    nfev = np.asarray(result.state.nfev, dtype=np.float64)
    return {
        "problem": problem,
        "ok": success_mask(problem, f, ginf, xinf),
        "nfev": nfev,
        "x": np.asarray(result.state.x),
        "f": f,
        "status": np.asarray(result.progress.status, dtype=np.int64),
        "iters": np.asarray(
            result.progress.num_iterations, dtype=np.int64
        ),
    }


def write_instance_artifact(records, path="BENCH_INSTANCES.json"):
    """Per-instance single-solve results — the regression-attribution
    artifact (VERDICT round-4 item 7).  One row per (problem, n, start)
    instance; benchmarks/instance_diff.py compares two such files and names
    every flipped instance, so a converged-% move between rounds is
    attributable instead of a mystery."""
    rows = []
    for rec in records:
        p = rec["problem"]
        for k in range(rec["ok"].size):
            rows.append({
                "problem": p.name,
                "n": int(np.asarray(p.x0).shape[0]),
                "start": k,
                "ok": bool(rec["ok"][k]),
                "nfev": float(rec["nfev"][k]),
                "f": float(rec["f"][k]),
                "status": int(rec["status"][k]),
                "iters": int(rec["iters"][k]),
            })
    with open(path, "w") as fh:
        json.dump({"rows": rows}, fh)
    return rows


def instance_delta_summary(new_path="BENCH_INSTANCES.json"):
    """Compact flip summary vs the newest committed BENCH_INSTANCES_r*.json
    (absent on the first round that ships the artifact)."""
    import glob

    prev = sorted(glob.glob("BENCH_INSTANCES_r*.json"))
    if not prev:
        return None
    from benchmarks.instance_diff import diff_files

    return diff_files(prev[-1], new_path)


def polish_records(records, solver, stopping, rounds=POLISH_ROUNDS):
    """Restart unconverged lanes from their final iterate with fresh L-BFGS
    history and fresh stopping counters, accumulating their true nfev.

    A plateau/x-delta stop at a non-stationary point (the MGH-10 Meyer
    class) often yields to a restart because the memoryless first step
    re-scales the search direction (the same rationale as the reference's
    own history reset on invalid descent, lbfgs.h:214-224).  This is a
    DIFFERENT protocol from the reference's single-run benchmark, so its
    result is reported as the separate `converged_pct_with_restarts` metric.
    Mutates ``records`` in place; records entries are [problem, ok, nfev, x].
    """
    restarted = 0
    for _ in range(rounds):
        todo = [i for i, r in enumerate(records) if not r["ok"].all()]
        if not todo:
            break
        polish = [
            (i, minimize_batched(
                records[i]["problem"].objective,
                jnp.asarray(records[i]["x"]),
                solver,
                stopping,
            ))
            for i in todo
        ]
        for i, result in polish:
            rec = records[i]
            new = fetch_metrics(rec["problem"], result)
            bad = ~rec["ok"]
            restarted += int(bad.sum())
            rec["nfev"][bad] += new["nfev"][bad]
            rec["ok"] = rec["ok"] | new["ok"]
            rec["x"] = new["x"]
    return restarted


def precompile(batches, solver, stopping):
    """Pre-compile all per-problem programs concurrently: 58 distinct
    (objective, n, B) programs dominate wall time when compiled lazily in
    sequence; the compile service parallelizes across threads."""
    from concurrent.futures import ThreadPoolExecutor

    from cppnumericalsolvers_tpu.core.driver import _solve_batched_jit

    def _warm(args):
        problem, starts = args
        _solve_batched_jit.lower(
            problem.objective, jnp.asarray(starts), solver, stopping
        ).compile()

    with ThreadPoolExecutor(max_workers=8) as pool:
        list(pool.map(_warm, batches))


def run_reliability():
    solver = reliability_solver()
    stopping = reliability_stopping()
    t0 = time.perf_counter()
    batches = benchmark_batches()
    precompile(batches, solver, stopping)
    compile_wall = time.perf_counter() - t0

    t0 = time.perf_counter()
    # Dispatch every problem batch before fetching anything — JAX dispatch
    # is async, so the host never blocks a later problem on an earlier one's
    # while_loop.
    pending = [
        (problem, minimize_batched(
            problem.objective, jnp.asarray(starts), solver, stopping))
        for problem, starts in batches
    ]
    records = [
        fetch_metrics(problem, result) for problem, result in pending
    ]

    # Per-instance artifact for round-over-round regression attribution
    # (VERDICT round-4 item 7): single-solve results, the primary metric.
    write_instance_artifact(records)

    # PRIMARY metric: single-solve results, the reference's own protocol.
    single_converged = sum(int(r["ok"].sum()) for r in records)
    total = sum(r["ok"].size for r in records)
    single_nfev = sum(float(r["nfev"].sum()) for r in records)

    # SECONDARY metric: up to POLISH_ROUNDS restarts of failed lanes.
    restarted = polish_records(records, solver, stopping)
    solve_wall = time.perf_counter() - t0

    polished_converged = sum(int(r["ok"].sum()) for r in records)
    polished_nfev = sum(float(r["nfev"].sum()) for r in records)
    return {
        "converged_pct_single_solve": 100.0 * single_converged / total,
        "converged_pct_with_restarts": 100.0 * polished_converged / total,
        "total_instances": total,
        "distinct_problems": len(records),
        "mean_nfev_single_solve": single_nfev / total,
        "mean_nfev_with_restarts": polished_nfev / total,
        "polish_rounds": POLISH_ROUNDS,
        "polish_restarted_instances": restarted,
        "reliability_wall_s": compile_wall + solve_wall,
        "reliability_solve_s": solve_wall,
    }


def run_throughput(batch: int = 1024, dim: int = 32):
    """Batched L-BFGS lane-iterations/s/chip on extended Rosenbrock (f32).

    Measured with benchmarks/roofline.py's scan-of-solves iteration-count
    contrast: many solves run sequentially inside ONE dispatch and two runs
    differing only in iteration budget are diffed, so the figure is the
    sustained DEVICE step rate — per-dispatch host/tunnel latency (which
    can exceed device time at small shapes and silently dominate a
    pipelined wall-clock measurement) cancels out."""
    from benchmarks.roofline import measure_shape

    row = measure_shape(batch, dim, pipeline=16)
    return {
        "batched_iters_per_s": row["lane_iters_per_s"],
        "throughput_nfev_per_iter": row["nfev_per_iter"],
    }


def run_perf_grid():
    """Roofline-annotated (B, n) throughput grid (VERDICT round-1 item 1):
    per-batched-iteration device time, achieved HBM bandwidth from the
    itemized traffic model, utilization vs the chip's peak, the per-shape
    ATTAINABLE bound (max of light-speed bytes time and measured
    kernel + evaluation floors — the falsifiable "at roofline" definition),
    and the bottleneck label derived from the bound's binding term.  The
    labels come from benchmarks/roofline.py's analyze_shape — the same
    function ROOFLINE.md is generated from, so the two artifacts cannot
    disagree (VERDICT round-3 items 3-4)."""
    from benchmarks.roofline import (
        analyze_shape,
        device_peak,
        measure_shape,
    )

    peak, kind = device_peak()
    rows = []
    for batch, dim in [(1024, 32), (1024, 256), (256, 4096)]:
        row = analyze_shape(measure_shape(batch, dim, pipeline=8), peak)
        rows.append(
            {
                "B": batch,
                "n": dim,
                "per_batched_iter_us": round(row["per_batched_iter_us"], 1),
                "lane_iters_per_s": round(row["lane_iters_per_s"], 0),
                "hbm_utilization_pct": round(
                    row.get("hbm_utilization_pct", float("nan")), 1
                ),
                "attainable_us": round(row.get("attainable_us", 0.0), 1),
                "pct_of_attainable": round(
                    row.get("pct_of_attainable", float("nan")), 1
                ),
                "kernel_us": round(row.get("kernel_us", 0.0), 1),
                "eval_us": round(row.get("eval_us", 0.0), 1),
                "bottleneck": row.get("bottleneck", "n/a"),
            }
        )
    return {"device_kind": kind, "peak_hbm_gbps": peak, "perf_grid": rows}


def main():
    rel = run_reliability()
    thr = run_throughput()
    grid = run_perf_grid()
    delta = instance_delta_summary()
    out = {
        # PRIMARY: single-solve convergence — the reference's own protocol
        # (README.md:6-11 is a single-run benchmark).
        "metric": "mgh376_converged_pct_single_solve",
        "value": round(rel["converged_pct_single_solve"], 2),
        "unit": "%",
        "vs_baseline": round(
            rel["converged_pct_single_solve"] / BASELINE_CONVERGED_PCT, 4
        ),
        # SECONDARY: restart-polished convergence (protocol disclosed in
        # polish_records' docstring and the fields below).
        "converged_pct_with_restarts": round(
            rel["converged_pct_with_restarts"], 2
        ),
        "polish_rounds": rel["polish_rounds"],
        "polish_restarted_instances": rel["polish_restarted_instances"],
        "total_instances": rel["total_instances"],
        "distinct_problems": rel["distinct_problems"],
        "mean_nfev_single_solve": round(rel["mean_nfev_single_solve"], 1),
        "mean_nfev_with_restarts": round(rel["mean_nfev_with_restarts"], 1),
        # Stopping-preset deviation disclosure (see reliability_stopping).
        "stopping_preset": "conservative+x_delta_violations=2",
        "reliability_wall_s": round(rel["reliability_wall_s"], 2),
        "reliability_solve_s": round(rel["reliability_solve_s"], 2),
        "batched_iters_per_s": round(thr["batched_iters_per_s"], 1),
        # Roofline evidence (full analysis: benchmarks/roofline.py +
        # ROOFLINE.md): utilization % of peak HBM bandwidth per shape, with
        # the measured bottleneck named.
        "device_kind": grid["device_kind"],
        "peak_hbm_gbps": grid["peak_hbm_gbps"],
        "perf_grid": grid["perf_grid"],
        "backend": jax.default_backend(),
    }
    if delta is not None:
        # Per-instance attribution vs the previous round's committed
        # artifact (BENCH_INSTANCES_r*.json; full rows in
        # BENCH_INSTANCES.json, comparer: benchmarks/instance_diff.py).
        out["instance_delta"] = {
            "baseline": delta["baseline"],
            "flipped_to_fail": delta["to_fail"],
            "flipped_to_ok": delta["to_ok"],
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
