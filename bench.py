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


def _result_arrays(result):
    """The device arrays one reliability record needs (see fetch_all)."""
    return (
        result.state.value,
        result.state.gradient,
        result.state.x,
        result.state.nfev,
        result.progress.status,
        result.progress.num_iterations,
    )


def _make_record(problem, fetched):
    value, gradient, x, nfev, status, iters = fetched
    f = np.asarray(value, dtype=np.float64)
    ginf = np.max(np.abs(np.asarray(gradient)), axis=-1)
    xinf = np.max(np.abs(np.asarray(x)), axis=-1)
    return {
        "problem": problem,
        "ok": success_mask(problem, f, ginf, xinf),
        "nfev": np.asarray(nfev, dtype=np.float64),
        "x": np.asarray(x),
        "f": f,
        "status": np.asarray(status, dtype=np.int64),
        "iters": np.asarray(iters, dtype=np.int64),
    }


def fetch_all(pending):
    """Per-instance record dicts for a list of (problem, MinimizeResult).

    ONE ``jax.device_get`` for the whole list: through the remote-device
    tunnel every blocking host fetch costs ~50-100 ms of round-trip
    latency, so fetching 58 problems' results field-by-field (~350 blocking
    pulls) costs ~35 s of pure latency against ~5 s of actual device solve
    time — measured round 5; this was most of rounds 1-4's
    "reliability_solve_s"."""
    arrays = jax.device_get([_result_arrays(r) for _, r in pending])
    return [
        _make_record(problem, fetched)
        for (problem, _), fetched in zip(pending, arrays)
    ]


def fetch_metrics(problem, result):
    """Single-result convenience wrapper over :func:`fetch_all`."""
    return fetch_all([(problem, result)])[0]


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
            row = {
                "problem": p.name,
                "n": int(np.asarray(p.x0).shape[0]),
                "start": k,
                "ok": bool(rec["ok"][k]),
                "nfev": float(rec["nfev"][k]),
                "f": float(rec["f"][k]),
                "status": int(rec["status"][k]),
                "iters": int(rec["iters"][k]),
            }
            if "stage" in rec:
                # 0 = f32 sufficed, 1 = f64 fallback solved this instance.
                row["stage"] = int(rec["stage"][k])
            rows.append(row)
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
            (records[i]["problem"], minimize_batched(
                records[i]["problem"].objective,
                jnp.asarray(records[i]["x"]),
                solver,
                stopping,
            ))
            for i in todo
        ]
        news = fetch_all(polish)
        for i, new in zip(todo, news):
            rec = records[i]
            bad = ~rec["ok"]
            restarted += int(bad.sum())
            rec["nfev"][bad] += new["nfev"][bad]
            rec["ok"] = rec["ok"] | new["ok"]
            rec["x"] = new["x"]
    return restarted


def precompile(batches, solver, stopping):
    """Pre-compile AND pre-load all per-problem programs: 58 distinct
    (objective, n, B) programs dominate wall time when handled lazily.
    The warm call is the EXACT solve call (``minimize_batched`` on a
    zero batch of the same shape): measured round 5, warming through
    ``.lower().compile()`` or the inner jit left the real pass paying
    ~0.65 s per program (~38 s across the suite) of first-dispatch
    compile/load cost through the remote-device tunnel; warming through
    the identical call path reduces the timed pass to ~2 s."""
    from concurrent.futures import ThreadPoolExecutor

    def _warm(args):
        problem, starts = args
        z = jnp.zeros_like(jnp.asarray(starts))
        return minimize_batched(
            problem.objective, z, solver, stopping
        ).state.nfev

    with ThreadPoolExecutor(max_workers=8) as pool:
        warm = list(pool.map(_warm, batches))
    jax.device_get(warm)  # block until every executable has run once


def run_reliability():
    """TPU-native precision strategy (VERDICT round-4 item 4): every
    instance is first solved in float32 on the fused TPU path; instances
    that miss the success contract are re-solved in float64 (software-
    emulated on TPU) from their ORIGINAL starts, with both attempts' nfev
    billed.  The per-instance precision stage is recorded in the artifact
    (0 = f32 sufficed, 1 = f64 fallback).  The f64-only protocol of rounds
    1-4 is reproducible by setting the CPPNS_BENCH_F64_ONLY env var."""
    import os

    f64_only = bool(os.environ.get("CPPNS_BENCH_F64_ONLY"))
    solver = reliability_solver()
    stopping32 = reliability_stopping(jnp.float32)
    stopping64 = reliability_stopping(jnp.float64)

    t0 = time.perf_counter()
    batches64 = benchmark_batches()
    if f64_only:
        batches32, first_stopping = batches64, stopping64
    else:
        batches32 = benchmark_batches(dtype_str="float32")
        first_stopping = stopping32
    precompile(batches32, solver, first_stopping)
    compile_wall = time.perf_counter() - t0

    t0 = time.perf_counter()
    # Dispatch every problem batch before fetching anything — JAX dispatch
    # is async, so the host never blocks a later problem on an earlier one's
    # while_loop.
    pending = [
        (problem, minimize_batched(
            problem.objective, jnp.asarray(starts), solver, first_stopping))
        for problem, starts in batches32
    ]
    records = fetch_all(pending)
    for rec in records:
        rec["stage"] = np.zeros(rec["ok"].size, np.int64)
    f32_converged = sum(int(r["ok"].sum()) for r in records)
    f32_wall = time.perf_counter() - t0

    # --- f64 fallback pass over problems with any failed instance --------
    resolved_f64 = 0
    f64_wall = 0.0
    fail_idx = (
        [] if f64_only
        else [i for i, r in enumerate(records) if not r["ok"].all()]
    )
    if fail_idx:
        tc = time.perf_counter()
        precompile([batches64[i] for i in fail_idx], solver, stopping64)
        compile_wall += time.perf_counter() - tc

        tf = time.perf_counter()
        pending64 = [
            (batches64[i][0], minimize_batched(
                batches64[i][0].objective,
                jnp.asarray(batches64[i][1]),
                solver,
                stopping64,
            ))
            for i in fail_idx
        ]
        news = fetch_all(pending64)
        for i, new in zip(fail_idx, news):
            rec = records[i]
            bad = ~rec["ok"]
            for key in ("ok", "f", "status", "iters"):
                rec[key] = np.where(bad, new[key], rec[key])
            rec["x"] = np.where(bad[:, None], new["x"], rec["x"])
            # Honest accounting: a fallback instance pays its failed f32
            # attempt PLUS the f64 solve.
            rec["nfev"] = rec["nfev"] + np.where(bad, new["nfev"], 0.0)
            rec["stage"] = np.where(bad, 1, rec["stage"])
            resolved_f64 += int((bad & new["ok"]).sum())
        f64_wall = time.perf_counter() - tf

    # Per-instance artifact for round-over-round regression attribution
    # (VERDICT round-4 item 7): single-solve (f32 + f64-fallback) results.
    write_instance_artifact(records)

    # PRIMARY metric: one solve attempt per precision stage, no restarts.
    single_converged = sum(int(r["ok"].sum()) for r in records)
    total = sum(r["ok"].size for r in records)
    single_nfev = sum(float(r["nfev"].sum()) for r in records)

    # SECONDARY metric: up to POLISH_ROUNDS restarts of failed lanes.
    tp = time.perf_counter()
    restarted = polish_records(records, solver, stopping64)
    polish_wall = time.perf_counter() - tp
    solve_wall = f32_wall + f64_wall + polish_wall

    polished_converged = sum(int(r["ok"].sum()) for r in records)
    polished_nfev = sum(float(r["nfev"].sum()) for r in records)
    return {
        "converged_pct_single_solve": 100.0 * single_converged / total,
        "converged_pct_with_restarts": 100.0 * polished_converged / total,
        "converged_pct_f32_only": 100.0 * f32_converged / total,
        "instances_resolved_in_f64": resolved_f64,
        "instances_attempted_in_f64": total - f32_converged,
        "precision": "f64" if f64_only else "f32+f64_fallback",
        "total_instances": total,
        "distinct_problems": len(records),
        "mean_nfev_single_solve": single_nfev / total,
        "mean_nfev_with_restarts": polished_nfev / total,
        "polish_rounds": POLISH_ROUNDS,
        "polish_restarted_instances": restarted,
        "reliability_wall_s": compile_wall + solve_wall,
        "reliability_solve_s": solve_wall,
        "reliability_f32_pass_s": f32_wall,
        "reliability_f64_pass_s": f64_wall,
    }


def run_throughput(batch: int = 1024, dim: int = 32):
    """Batched L-BFGS lane-iterations/s/chip on extended Rosenbrock (f32).

    Measured with benchmarks/roofline.py's profiler-derived device time:
    the device-side duration of the whole pipelined program divided by its
    batched iteration count — per-dispatch host/tunnel latency (which
    exceeds device time at the flat solve's speed and made wall-clock
    contrasts scatter several-fold) never enters the figure."""
    from benchmarks.roofline import measure_shape

    row = measure_shape(batch, dim, pipeline=8)
    return {
        "batched_iters_per_s": row["lane_iters_per_s"],
        "throughput_nfev_per_iter": row["nfev_per_iter"],
    }


def run_perf_grid():
    """Roofline-annotated (B, n) throughput grid: per-batched-iteration
    device time, achieved HBM bandwidth from the itemized traffic model,
    utilization vs the chip's peak, the per-shape HARDWARE-DERIVED
    attainable bound (round-5 form: chip-parameter models for every kernel
    phase + the measured objective-eval floor — never a kernel's own
    measured time, so the % column moves when a kernel improves; VERDICT
    round-4 item 2), and the bottleneck label derived from the bound's
    binding term.  The labels come from benchmarks/roofline.py's
    analyze_shape — the same function ROOFLINE.md is generated from, so the
    two artifacts cannot disagree."""
    from benchmarks.roofline import (
        analyze_shape,
        device_peak,
        measure_shape,
    )

    peak, kind = device_peak()
    rows = []
    # The FULL roofline grid (VERDICT round-4 weak item 4: the committed,
    # driver-verified artifact must cover every row ROOFLINE.md reports).
    from benchmarks.roofline import GRID

    for batch, dim in GRID:
        row = analyze_shape(measure_shape(batch, dim, pipeline=8), peak, kind)
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
                "kernel_model_us": round(
                    row.get("kernel_model_us", 0.0), 1
                ),
                "eval_us": round(row.get("eval_us", 0.0), 2),
                # VMEM-resident rows: the whole solve carry lives in VMEM,
                # so "HBM utilization" is vs modeled traffic that never
                # actually touches HBM (can exceed 100%).
                "vmem_resident": bool(row.get("vmem_resident", False)),
                "bottleneck": row.get("bottleneck", "n/a"),
            }
        )
    return {"device_kind": kind, "peak_hbm_gbps": peak, "perf_grid": rows}


def run_solver_legs():
    """Measured per-batched-iteration legs for the dense/boxed solvers
    (VERDICT round-4 items 3 and 8): L-BFGS-B with half-active bounds,
    BFGS (dense rank-2 inverse-Hessian update on the MXU), Newton (batched
    dense solve on the MXU).  Same iteration-count-contrast methodology as
    the L-BFGS grid (benchmarks/roofline.py measure_solver_shape)."""
    from benchmarks.roofline import measure_solver_shape
    from cppnumericalsolvers_tpu.solvers import Bfgs, Lbfgsb, NewtonDescent

    legs = []
    # Iteration budgets stay inside each solver's DESCENT phase (see
    # measure_shape's docstring): L-BFGS-B and Newton converge on this
    # problem in ~10-20 iterations, so longer budgets would measure the
    # degenerate stalled regime no converging solve runs in.
    # Bounds [-2, 0.9] pin every odd (optimum=1) Rosenbrock coordinate at
    # its upper bound, so the Cauchy walk crosses real breakpoints.
    for b, n in ((1024, 32), (256, 256)):
        row = measure_solver_shape(
            b, n, Lbfgsb(m=5, lower=-2.0, upper=0.9),
            iters_lo=3, iters_hi=12,
        )
        legs.append({"solver": "lbfgsb", **{
            k: round(v, 1) for k, v in row.items()
        }})
    for b, n in ((1024, 32), (256, 256)):
        row = measure_solver_shape(b, n, Bfgs(), iters_lo=10, iters_hi=40)
        legs.append({"solver": "bfgs", **{
            k: round(v, 1) for k, v in row.items()
        }})
    for b, n in ((1024, 32), (256, 64)):
        row = measure_solver_shape(
            b, n, NewtonDescent(), mode="second", iters_lo=2, iters_hi=9
        )
        legs.append({"solver": "newton", **{
            k: round(v, 1) for k, v in row.items()
        }})
    # Hager-Zhang batched gap vs the fused More-Thuente path (VERDICT
    # round-4 item 6: HZ's nested data-dependent eval loops are documented
    # as outside the fused-path boundary — linesearch/hager_zhang.py — and
    # the cost of choosing it at batch scale is measured here).
    row = measure_solver_shape(
        1024, 32, Lbfgs(m=10, line_search="hager_zhang")
    )
    legs.append({"solver": "lbfgs_hager_zhang", **{
        k: round(v, 1) for k, v in row.items()
    }})
    return legs


def run_al_leg(batch=64, n=4096):
    """Batched constrained (AL) leg: wall time of one fixed-budget nested
    solve, batch-native vs vmap-of-whole-solve lowering (VERDICT round-4
    item 5).  Fixed outer/inner budgets make the two runs execute identical
    iteration counts; the delta is pure lowering overhead."""
    from cppnumericalsolvers_tpu import objective as make_obj
    from cppnumericalsolvers_tpu.core.problem import ConstrainedProblem
    from cppnumericalsolvers_tpu.core.progress import default_stopping
    from cppnumericalsolvers_tpu.solvers.augmented_lagrangian import (
        AugmentedLagrangian,
    )

    def obj_fn(x):
        return jnp.sum(x) + 0.005 * jnp.sum(x * x)

    def sphere(x):
        return jnp.sum(x * x) - float(n)

    prob = ConstrainedProblem(
        make_obj(obj_fn, mode="first"),
        equality_constraints=(make_obj(sphere, mode="first"),),
    )
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.uniform(-2, 2, (batch, n)).astype(np.float32))
    stop = default_stopping(jnp.float32).replace(max_iterations=10)
    istop = default_stopping(jnp.float32).replace(max_iterations=40)

    out = {"batch": batch, "n": n}
    for impl in ("native", "vmap"):
        al = AugmentedLagrangian(
            inner_solver=reliability_solver(), batched_impl=impl
        )
        r = al.minimize_batched(prob, x0, stopping=stop, inner_stopping=istop)
        np.asarray(r.state.nfev)  # compile + load
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            r = al.minimize_batched(
                prob, x0, stopping=stop, inner_stopping=istop
            )
            np.asarray(r.state.nfev)
            best = min(best, time.perf_counter() - t0)
        out[f"wall_s_{impl}"] = round(best, 4)
    out["native_speedup"] = round(out["wall_s_vmap"] / out["wall_s_native"], 3)
    return out


def main():
    rel = run_reliability()
    thr = run_throughput()
    grid = run_perf_grid()
    solver_legs = run_solver_legs()
    al_leg = run_al_leg()
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
        # Precision-strategy split (f32 first pass + f64 fallback).
        "precision": rel["precision"],
        "converged_pct_f32_only": round(rel["converged_pct_f32_only"], 2),
        "instances_resolved_in_f64": rel["instances_resolved_in_f64"],
        "instances_attempted_in_f64": rel["instances_attempted_in_f64"],
        "reliability_f32_pass_s": round(rel["reliability_f32_pass_s"], 2),
        "reliability_f64_pass_s": round(rel["reliability_f64_pass_s"], 2),
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
        # Per-solver measured legs: L-BFGS-B (batch-native Cauchy walk),
        # BFGS / Newton (MXU dense updates), and the HZ-vs-fused-MT gap.
        "solver_legs": solver_legs,
        # Batched constrained leg: batch-native vs vmap AL lowering.
        "al_leg": al_leg,
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
