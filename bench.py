"""Benchmark harness — the reference's headline numbers, TPU-native.

Reproduces the two claims in BASELINE.md:

* **Reliability** (reference README.md:6-11): the 376-problem benchmark built
  from the MGH set with multistarts.  Here each MGH problem's starts form one
  vmapped batch solved by jitted L-BFGS; success per instance is the
  reference's own contract (f within 1e-4 of f*, or the relative
  projected-gradient criterion ‖g‖∞ < 1e-5·max(1,‖x‖∞) — progress.h:383-427).
  Baseline to beat: 95% converged.
* **Throughput** (BASELINE.json north star): batched iterations/s/chip for a
  1024-instance Rosenbrock-32 L-BFGS solve in float32 on the MXU/VPU.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}
"""

from __future__ import annotations

import json
import math
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
from cppnumericalsolvers_tpu.models.suite import mgh_suite  # noqa: E402
from cppnumericalsolvers_tpu.solvers import Lbfgs  # noqa: E402

TOTAL_INSTANCES = 376  # reference benchmark size (README.md:6)
BASELINE_CONVERGED_PCT = 95.0  # reference reliability (README.md:8-9)


def _multistart_batches(seed: int = 0):
    """Expand the MGH set to exactly TOTAL_INSTANCES starting points.

    The reference's external benchmark reaches 376 instances by running the
    MGH functions from several starts; we distribute starts as evenly as
    possible (standard start first, then bounded perturbations)."""
    problems = mgh_suite("float64")
    n = len(problems)
    base, extra = divmod(TOTAL_INSTANCES, n)
    rng = np.random.default_rng(seed)
    batches = []
    for i, problem in enumerate(problems):
        k = base + (1 if i < extra else 0)
        starts = [problem.x0]
        for _ in range(k - 1):
            jitter = rng.uniform(-0.5, 0.5, size=problem.x0.shape)
            starts.append(problem.x0 * (1.0 + jitter) + 0.1 * jitter)
        batches.append((problem, np.stack(starts)))
    assert sum(b.shape[0] for _, b in batches) == TOTAL_INSTANCES
    return batches


def run_reliability():
    solver = Lbfgs(m=10)
    # The reference's own guidance (progress.h:414-431): MGH problems with
    # flat valleys (Powell badly scaled, Meyer, Powell singular) need the
    # Conservative preset or the plateau test fires at a non-minimiser.  Its
    # external benchmark sweeps stopping parameters (CPPOPT_SWEEP); we pin
    # the published Conservative preset for comparability.
    stopping = conservative_stopping(jnp.float64).replace(
        # Two x-delta strikes instead of one: with the L-BFGS stall-recovery
        # reset (solvers/lbfgs.py) a zero-move line search retries once as
        # steepest descent before the stop fires.  Within the reference's own
        # sweep space (CPPOPT_X_DELTA_VIOL, progress.h:372).
        x_delta_violations=2,
    )
    t0 = time.perf_counter()
    batches = _multistart_batches()

    # Pre-compile all per-problem programs concurrently: 33 distinct
    # (objective, n, B) programs dominate wall time when compiled lazily in
    # sequence; the compile service parallelizes across threads.
    from concurrent.futures import ThreadPoolExecutor
    from cppnumericalsolvers_tpu.core.driver import _solve_batched_jit

    def _warm(args):
        problem, starts = args
        _solve_batched_jit.lower(
            problem.objective, jnp.asarray(starts), solver, stopping
        ).compile()

    with ThreadPoolExecutor(max_workers=8) as pool:
        list(pool.map(_warm, batches))
    compile_wall = time.perf_counter() - t0

    def check(problem, f, ginf, xinf):
        grad_ok = ginf < 1e-5 * np.maximum(1.0, xinf)
        if problem.f_star is not None:
            f_ok = f <= problem.f_star + 1e-4 * max(1.0, abs(problem.f_star))
        else:
            f_ok = np.zeros_like(grad_ok)
        return np.isfinite(f) & (grad_ok | f_ok)

    def fetch(problem, result):
        f = np.asarray(result.state.value)
        ginf = np.max(np.abs(np.asarray(result.state.gradient)), axis=-1)
        xinf = np.max(np.abs(np.asarray(result.state.x)), axis=-1)
        nfev = np.asarray(result.state.nfev, dtype=np.float64)
        return check(problem, f, ginf, xinf), nfev, np.asarray(result.state.x)

    t0 = time.perf_counter()
    # Round 0: dispatch every problem batch before fetching anything — JAX
    # dispatch is async, so the host never blocks a later problem on an
    # earlier one's while_loop.
    pending = [
        (problem, starts, minimize_batched(
            problem.objective, jnp.asarray(starts), solver, stopping))
        for problem, starts in batches
    ]
    records = []  # (problem, ok, nfev, x_final)
    for problem, _, result in pending:
        ok, nfev, x = fetch(problem, result)
        records.append([problem, ok, nfev, x])

    # Polish rounds: restart unconverged lanes from their final iterate with
    # fresh L-BFGS history and fresh stopping counters.  A plateau/x-delta
    # stop at a non-stationary point (the MGH-10 Meyer class) often yields to
    # a restart because the memoryless first step re-scales the search
    # direction (the same rationale as the reference's own history reset on
    # invalid descent, lbfgs.h:214-224).  The whole (B, n) batch is re-run so
    # the compiled program is reused — already-converged lanes re-converge in
    # one cheap iteration and their extra evals are NOT billed (a sequential
    # driver would only restart the failed lanes); restarted lanes accumulate
    # their true total nfev across rounds.
    for _ in range(2):
        todo = [i for i, (_, ok, _, _) in enumerate(records) if not ok.all()]
        if not todo:
            break
        polish = [
            (i, minimize_batched(
                records[i][0].objective,
                jnp.asarray(records[i][3]),
                solver,
                stopping,
            ))
            for i in todo
        ]
        for i, result in polish:
            problem, ok, nfev, _ = records[i]
            new_ok, new_nfev, new_x = fetch(problem, result)
            bad = ~ok
            nfev[bad] += new_nfev[bad]
            records[i] = [problem, ok | new_ok, nfev, new_x]

    solve_wall = time.perf_counter() - t0
    converged = sum(int(ok.sum()) for _, ok, _, _ in records)
    total = sum(ok.size for _, ok, _, _ in records)
    nfev_sum = sum(float(nfev.sum()) for _, _, nfev, _ in records)
    return {
        "converged_pct": 100.0 * converged / total,
        "total_instances": total,
        "mean_nfev": nfev_sum / total,
        "reliability_wall_s": compile_wall + solve_wall,
        "reliability_solve_s": solve_wall,
    }


def run_throughput(
    batch: int = 1024, dim: int = 32, max_iters: int = 100, pipeline: int = 32
):
    """Batched L-BFGS iterations/s/chip on extended Rosenbrock (float32).

    ``pipeline`` independent solve batches are enqueued back-to-back and
    synchronized once, so the fixed per-dispatch host->device latency
    amortizes and the figure measures the sustained device step rate (the
    deployment mode for a solver fleet: many batches in flight), not the
    single-call round trip."""
    from cppnumericalsolvers_tpu.core.progress import default_stopping

    def ext_rosenbrock(x):
        even, odd = x[0::2], x[1::2]
        return jnp.sum(100.0 * (odd - even**2) ** 2 + (1.0 - even) ** 2)

    obj = objective(ext_rosenbrock, mode="first")
    rng = np.random.default_rng(1)
    x0 = jnp.asarray(
        rng.uniform(-2.0, 2.0, size=(batch, dim)).astype(np.float32)
    )
    solver = Lbfgs(m=10)
    # Fixed iteration budget, convergence tests off: measures pure step rate.
    stopping = default_stopping(jnp.float32)._replace(
        max_iterations=jnp.int32(max_iters),
        x_delta=jnp.float32(0.0),
        f_delta=jnp.float32(0.0),
        gradient_norm=jnp.float32(0.0),
        past=jnp.int32(0),
    )
    # Distinct starting batches so no result can be reused across dispatches.
    x0s = [
        jnp.asarray(
            rng.uniform(-2.0, 2.0, size=(batch, dim)).astype(np.float32)
        )
        for _ in range(pipeline)
    ]
    result = minimize_batched(obj, x0, solver, stopping)  # compile + warmup
    float(np.asarray(result.state.value).sum())  # fetch forces completion
    # Timed region ends after the metric data is FETCHED to host, not after
    # block_until_ready: through remote-device tunnels block_until_ready has
    # been observed to return before execution finishes, which would
    # overstate throughput by orders of magnitude; a device_get cannot lie.
    t0 = time.perf_counter()
    results = [minimize_batched(obj, xi, solver, stopping) for xi in x0s]
    iters = sum(
        float(np.asarray(r.progress.num_iterations).sum()) for r in results
    )
    wall = time.perf_counter() - t0
    return {"batched_iters_per_s": iters / wall, "throughput_wall_s": wall}


def main():
    rel = run_reliability()
    thr = run_throughput()
    out = {
        "metric": "mgh376_converged_pct",
        "value": round(rel["converged_pct"], 2),
        "unit": "%",
        "vs_baseline": round(rel["converged_pct"] / BASELINE_CONVERGED_PCT, 4),
        "total_instances": rel["total_instances"],
        "mean_nfev": round(rel["mean_nfev"], 1),
        "reliability_wall_s": round(rel["reliability_wall_s"], 2),
        "reliability_solve_s": round(rel["reliability_solve_s"], 2),
        "batched_iters_per_s": round(thr["batched_iters_per_s"], 1),
        "backend": jax.default_backend(),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
