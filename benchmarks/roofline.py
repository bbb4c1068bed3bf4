"""Roofline / utilization analysis of the batched L-BFGS step on TPU.

BASELINE.md's north star is "per-iteration step at roofline on 1 chip".
This harness substantiates it: for a (B, n) grid of batched extended-
Rosenbrock L-BFGS solves it measures the per-iteration device time, derives
the achieved HBM bandwidth from an itemized traffic model, and reports
utilization against the chip's peak — plus XLA's own cost analysis of the
compiled step and an optional ``jax.profiler`` trace capture.

Why the HBM roofline is the relevant ceiling: the L-BFGS step is
reduction/elementwise work (VPU), not matmul (MXU).  Per lane and iteration
the fused push+two-loop kernel moves ~4mn floats of history for ~10mn flops
— an arithmetic intensity of ~0.6 flops/byte, two orders of magnitude below
the f32 ridge point, so the speed-of-light step time is bytes/BW and flops
never bind.  The traffic model (per lane, per iteration, in floats):

    history    4mn      fused kernel: read S,Y + write S,Y (ops/two_loop.py)
    kernel i/o 4n       g, s_pending, y_pending in; direction out
    linesearch ~5n/ev   trial x = x0 + a*d (read x0,d, write x) + the
                        objective's value_and_grad pass (read x, write g)
    driver     ~12n     state selects, s/y diffs, norms, progress machine

After round 4's fusions (batch-native line-search loop, full carry
aliasing) the non-kernel residue is gone: every grid shape is now bound by
the fused push+two-loop kernel itself, classified per row against the
committed attainable bound.  At large n the kernel runs at ~52% of peak
HBM bandwidth (read+write balanced history streaming); at small n it sits
on a VPU/DMA issue-rate floor — the 2m-step serial reduction chain plus
the (m=10 -> 16, n=32 -> 128) VMEM tile padding (ablation: at (1024,32)
~half the kernel is the two serial passes, ~40 us is DMA at ~130 GB/s
effective).

Usage:
    python benchmarks/roofline.py             # grid + JSON + ROOFLINE.md
    python benchmarks/roofline.py --profile   # also capture profiler traces
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/cppns_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from cppnumericalsolvers_tpu import objective  # noqa: E402
from cppnumericalsolvers_tpu.core.progress import default_stopping  # noqa: E402
from cppnumericalsolvers_tpu.solvers import Lbfgs  # noqa: E402

M = 10  # L-BFGS history (the benchmark solver's default)

# Peak HBM bandwidth by device kind (GB/s).  Published figures: v4 1228.8,
# v5e 819.2, v5p 2765, v6e (Trillium) 1640.
HBM_PEAK_GBPS = {
    "TPU v4": 1228.8,
    "TPU v5 lite": 819.2,
    "TPU v5e": 819.2,
    "TPU v5": 2765.0,
    "TPU v5p": 2765.0,
    "TPU v6 lite": 1640.0,
    "TPU v6e": 1640.0,
}

# The default measurement grid: small-n latency regime, mid sizes, and the
# large-n bandwidth regime (VERDICT round-1 item 1 asks for >= 3 shapes
# incl. large n).
GRID = [(1024, 32), (8192, 32), (1024, 256), (1024, 1024), (256, 4096)]


def device_peak():
    kind = jax.devices()[0].device_kind
    return HBM_PEAK_GBPS.get(kind), kind


def ext_rosenbrock(x):
    even, odd = x[0::2], x[1::2]
    return jnp.sum(100.0 * (odd - even**2) ** 2 + (1.0 - even) ** 2)


def fixed_iteration_stopping(iters, dtype=jnp.float32):
    """Convergence tests off: measures pure step rate."""
    return default_stopping(dtype)._replace(
        max_iterations=jnp.int32(iters),
        x_delta=dtype(0.0),
        f_delta=dtype(0.0),
        gradient_norm=dtype(0.0),
        past=jnp.int32(0),
    )


def traffic_model_bytes(batch, n, nfev_per_iter, m=M, itemsize=4):
    """Modeled HBM bytes per BATCHED iteration (all lanes), itemized."""
    history = 4 * m * n
    kernel_io = 4 * n
    linesearch = 5.0 * n * nfev_per_iter
    driver = 12 * n
    per_lane = itemsize * (history + kernel_io + linesearch + driver)
    return batch * per_lane, {
        "history": batch * itemsize * history,
        "kernel_io": batch * itemsize * kernel_io,
        "linesearch": batch * itemsize * linesearch,
        "driver": batch * itemsize * driver,
    }


@functools.partial(jax.jit, static_argnames=("obj", "solver"))
def _scanned_solves(obj, x0s, solver, stopping):
    """Run P independent batched solves SEQUENTIALLY inside one dispatch.

    One dispatch means one host->device round trip for P full solves: the
    iteration-count contrast below then carries P times the signal against
    a single dispatch's wall-clock noise (through the remote-device tunnel
    a dispatch costs ~50 ms with several ms of jitter — at small n that
    noise would swamp per-iteration times measured per-dispatch)."""
    from jax import lax

    from cppnumericalsolvers_tpu.core.driver import _solve_batched_jit

    def body(carry, x0_batch):
        # The batch-native driver (ONE while_loop over batched carries) —
        # the same path minimize_batched runs.  Round-3 measured the
        # vmap-of-single-solve path here, which re-adds the while_loop
        # batching rule's broadcast-select over the whole carry every
        # iteration (~40% of step at n=4096) that the batch-native loop
        # exists to remove — so rounds 2-3's driver/kernel fusion work was
        # invisible in the recorded numbers.
        r = _solve_batched_jit(obj, x0_batch, solver, stopping)
        return carry, (
            jnp.sum(r.progress.num_iterations),
            jnp.sum(r.state.nfev),
            jnp.sum(r.state.value),
        )

    _, (iters, nfev, values) = lax.scan(body, 0, x0s)
    return jnp.sum(iters), jnp.sum(nfev), jnp.sum(values)


def _run_pipelined(solver, x0s, stopping):
    """One scanned dispatch over all starting batches; the timed region ends
    after metric data is FETCHED to host (a device_get cannot lie;
    block_until_ready has been observed to return early through
    remote-device tunnels — see bench.py)."""
    obj = objective(ext_rosenbrock, mode="first")
    stacked = jnp.stack(x0s)
    t0 = time.perf_counter()
    iters, nfev, _ = _scanned_solves(obj, stacked, solver, stopping)
    iters = float(np.asarray(iters))
    nfev = float(np.asarray(nfev))
    wall = time.perf_counter() - t0
    return wall, iters, nfev


def measure_shape(batch, n, pipeline=16, profile_dir=None):
    """Per-batched-iteration device time via iteration-count contrast.

    Two fixed-iteration runs (I_lo, I_hi) of the same pipelined dispatch
    differ only in loop trips, so (t_hi - t_lo) / (pipeline * (I_hi - I_lo))
    cancels the per-dispatch host/tunnel latency.  Both runs stay inside the
    DESCENT phase of the solve: iterating far past convergence (with the
    stopping tests disabled) degenerates into stalled 20-eval line searches
    that inflate the apparent per-iteration cost by 3-5x and measure a
    regime no converging solve ever runs in."""
    if n <= 64:
        iters_lo, iters_hi, pipeline = 10, 60, max(pipeline, 32)
    elif n <= 1024:
        iters_lo, iters_hi = 20, 120
    else:
        iters_lo, iters_hi = 20, 100
    rng = np.random.default_rng(0)
    x0s = [
        jnp.asarray(
            rng.uniform(-2.0, 2.0, size=(batch, n)).astype(np.float32)
        )
        for _ in range(pipeline)
    ]
    solver = Lbfgs(m=M)
    out = {}
    for iters in (iters_lo, iters_hi):
        stopping = fixed_iteration_stopping(iters)
        # Warm run compiles the scanned program (iteration counts are
        # dynamic operands, so both settings share one compilation).
        _run_pipelined(solver, x0s, stopping)
        wall, total_iters, total_nfev = _run_pipelined(
            solver, x0s, stopping
        )
        out[iters] = (wall, total_iters, total_nfev)
        if profile_dir and iters == iters_hi:
            # Capture on a SEPARATE run: tracing inflates device+host time
            # (measured +25% at (1024, 32)), so the timed run above must
            # not be the traced one.
            with jax.profiler.trace(profile_dir):
                _run_pipelined(solver, x0s, stopping)

    (w1, i1, f1), (w2, i2, f2) = out[iters_lo], out[iters_hi]
    batched_iters_lo = i1 / batch  # = pipeline * iters_lo
    batched_iters_hi = i2 / batch
    per_iter_s = (w2 - w1) / max(batched_iters_hi - batched_iters_lo, 1.0)
    nfev_per_iter = (f2 - f1) / max(i2 - i1, 1.0)
    return {
        "batch": batch,
        "n": n,
        "per_batched_iter_us": per_iter_s * 1e6,
        "lane_iters_per_s": batch / per_iter_s,
        "nfev_per_iter": nfev_per_iter,
    }


def measure_kernel_standalone(batch, n, m=M, k_lo=20, k_hi=220):
    """Device time of the fused push+two-loop kernel alone at this shape,
    via a scanned k-call chain contrast (same anti-jitter trick as the full
    step).  Splitting step time into kernel vs rest names the bottleneck
    quantitatively."""
    from jax import lax

    from cppnumericalsolvers_tpu.ops.two_loop import (
        push_two_loop_pallas_batched,
    )

    @functools.partial(jax.jit, static_argnames=("k",))
    def chain(g, s, y, c, ga, sn, yn, v, k):
        def body(carry, _):
            g_, s_, y_, c_, ga_, sn_, yn_ = carry
            d, s2, y2, c2, ga2 = push_two_loop_pallas_batched(
                g_, s_, y_, c_, ga_, sn_, yn_, v
            )
            return (d, s2, y2, c2, ga2, d * 0.5, yn_), None

        (d, *_), _ = lax.scan(body, (g, s, y, c, ga, sn, yn), None, length=k)
        return jnp.sum(d)

    rng = np.random.default_rng(0)
    g = jnp.asarray(rng.standard_normal((batch, n)).astype(np.float32))
    s = jnp.asarray(
        rng.standard_normal((batch, m, n)).astype(np.float32) * 0.1
    )
    y = jnp.asarray(
        s + 0.03 * rng.standard_normal((batch, m, n)).astype(np.float32)
    )
    c = jnp.full((batch,), m, jnp.int32)
    ga = jnp.ones((batch,), jnp.float32)
    sn = jnp.asarray(rng.standard_normal((batch, n)).astype(np.float32) * 0.1)
    yn = jnp.asarray(
        sn + 0.03 * rng.standard_normal((batch, n)).astype(np.float32)
    )
    v = jnp.ones((batch,), bool)
    out = {}
    for k in (k_lo, k_hi):
        float(np.asarray(chain(g, s, y, c, ga, sn, yn, v, k)))
        t0 = time.perf_counter()
        float(np.asarray(chain(g, s, y, c, ga, sn, yn, v, k)))
        out[k] = time.perf_counter() - t0
    return (out[k_hi] - out[k_lo]) / (k_hi - k_lo)


def measure_eval_standalone(batch, n, k_lo=200, k_hi=1800, reps=3):
    """Device time of ONE batched objective value_and_grad at this shape,
    via a scanned k-call chain contrast — the evaluation floor no line
    search can beat.  Small shapes evaluate in ~1-2 us, far below the
    remote-tunnel dispatch jitter, so the chain is long, each budget takes
    the best of ``reps`` timings, and the contrast clamps at 0 (a negative
    contrast is pure noise)."""
    from jax import lax

    vag = jax.vmap(jax.value_and_grad(ext_rosenbrock))

    @functools.partial(jax.jit, static_argnames=("k",))
    def chain(x, k):
        def body(carry, _):
            f, g = vag(carry)
            # Data-dependent next point keeps the chain serial (no CSE).
            return carry - 1e-9 * g, jnp.sum(f)
        out, fs = lax.scan(body, x, None, length=k)
        return jnp.sum(fs)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-2, 2, (batch, n)).astype(np.float32))
    out = {}
    for k in (k_lo, k_hi):
        float(np.asarray(chain(x, k)))  # warm/compile
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(np.asarray(chain(x, k)))
            best = min(best, time.perf_counter() - t0)
        out[k] = best
    return max((out[k_hi] - out[k_lo]) / (k_hi - k_lo), 0.0)


def attainable_bound_us(row, peak_gbps, kernel_us, eval_us):
    """The committed, falsifiable definition of "at roofline" for a shape
    (VERDICT round-3 item 3): the per-batched-iteration time cannot beat

        attainable = max( light_speed_bytes_time,
                          kernel_floor + nfev_per_iter * eval_floor )

    where light_speed is the itemized traffic model at peak HBM bandwidth,
    kernel_floor is the MEASURED standalone fused push+two-loop kernel time
    (its issue-rate floor at small n is real, not modeled away), and
    eval_floor is the MEASURED standalone batched objective evaluation.
    "% of attainable" = attainable / measured; the north-star check is that
    number, per shape — not a debate.
    """
    bytes_total, _ = traffic_model_bytes(
        row["batch"], row["n"], row["nfev_per_iter"]
    )
    light_us = bytes_total / (peak_gbps * 1e9) * 1e6 if peak_gbps else 0.0
    serial_us = kernel_us + row["nfev_per_iter"] * eval_us
    return max(light_us, serial_us), light_us, serial_us


def analyze_shape(row, peak_gbps, kernel_us=None, eval_us=None):
    """Annotate a measured row with the traffic model, utilization, the
    attainable bound, and ONE bottleneck label derived from the bound's
    binding term — bench.py calls this same function, so BENCH and
    ROOFLINE.md cannot disagree on labels (VERDICT round-3 item 4)."""
    bytes_total, parts = traffic_model_bytes(
        row["batch"], row["n"], row["nfev_per_iter"]
    )
    t = row["per_batched_iter_us"] * 1e-6
    achieved = bytes_total / t
    row["model_bytes_per_iter"] = bytes_total
    row["achieved_gbps"] = achieved / 1e9
    if not peak_gbps:
        return row
    light = bytes_total / (peak_gbps * 1e9)
    row["hbm_utilization_pct"] = 100.0 * light / t
    if kernel_us is None:
        kernel_us = row.get("kernel_us")
    if kernel_us is None:
        # Advisor round-4: this fallback runs a 220-solve scanned device
        # measurement — make it loud so callers know where minutes went.
        print(
            f"[roofline] measuring standalone kernel floor at "
            f"(B={row['batch']}, n={row['n']})...",
            file=sys.stderr, flush=True,
        )
        kernel_us = measure_kernel_standalone(row["batch"], row["n"]) * 1e6
    if eval_us is None:
        eval_us = row.get("eval_us")
    if eval_us is None:
        print(
            f"[roofline] measuring standalone eval floor at "
            f"(B={row['batch']}, n={row['n']})...",
            file=sys.stderr, flush=True,
        )
        eval_us = measure_eval_standalone(row["batch"], row["n"]) * 1e6
    row["kernel_us"] = kernel_us
    row["eval_us"] = eval_us
    row["kernel_pct_of_step"] = 100.0 * kernel_us / row["per_batched_iter_us"]
    attainable, light_us, serial_us = attainable_bound_us(
        row, peak_gbps, kernel_us, eval_us
    )
    row["attainable_us"] = attainable
    row["pct_of_attainable"] = 100.0 * attainable / row["per_batched_iter_us"]
    # The label names the BINDING term of the attainable bound.
    if light_us >= serial_us:
        row["bottleneck"] = "HBM bandwidth"
    elif kernel_us >= row["nfev_per_iter"] * eval_us:
        row["bottleneck"] = "fused kernel (VPU/DMA issue rate)"
    else:
        row["bottleneck"] = "objective evaluation floor"
    return row


def measure_model_sharded(n=4096, iters_lo=50, iters_hi=400, reps=8):
    """Per-iteration time for ONE instance with x sharded over the model
    axis (parallel/model_sharded.py) on the available mesh.

    With a single real chip the mesh is 1-wide, so this measures the GSPMD
    path's per-chip overhead versus the fused single-chip kernel (the
    scaling behavior across mesh sizes is covered by benchmarks/scaling.py
    on the virtual mesh and by tests/test_model_sharded.py).

    All repeats run inside ONE jitted scan dispatch: a per-dispatch
    measurement was observed to return a *negative* contrast — through the
    remote-device tunnel each dispatch carries several ms of jitter, larger
    than the whole single-instance iteration budget."""
    from jax import lax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from cppnumericalsolvers_tpu.core.driver import _solve_loop
    from cppnumericalsolvers_tpu.parallel import make_mesh
    from cppnumericalsolvers_tpu.parallel.model_sharded import (
        _force_xla_two_loop,
    )

    mesh = make_mesh(axis="model")
    obj = objective(ext_rosenbrock, mode="first")
    solver = _force_xla_two_loop(Lbfgs(m=M))
    rng = np.random.default_rng(0)
    x0s = jnp.asarray(
        rng.uniform(-2.0, 2.0, size=(reps, n)).astype(np.float32)
    )

    @functools.partial(
        jax.jit,
        in_shardings=(NamedSharding(mesh, P(None, "model")), None),
    )
    def scanned(x0s_, stopping_):
        def body(carry, x0_):
            state0 = obj.evaluate(x0_, nfev=0)
            internals0 = solver.init(obj, state0)
            r = _solve_loop(obj, solver, state0, internals0, stopping_, 0)
            return carry, (r.progress.num_iterations, r.state.value)

        _, (iters, values) = lax.scan(body, 0, x0s_)
        return jnp.sum(iters), jnp.sum(values)

    out = {}
    for iters in (iters_lo, iters_hi):
        stopping = fixed_iteration_stopping(iters)
        scanned(x0s, stopping)  # warm (one compile, shared across budgets)
        t0 = time.perf_counter()
        total_iters, _ = scanned(x0s, stopping)
        total_iters = float(np.asarray(total_iters))
        out[iters] = (time.perf_counter() - t0, total_iters)
    (w1, i1), (w2, i2) = out[iters_lo], out[iters_hi]
    per_iter_s = (w2 - w1) / max(i2 - i1, 1.0)
    return {
        "n": n,
        "mesh_devices": len(mesh.devices.flat),
        "per_iter_us_model_sharded": per_iter_s * 1e6,
    }


def xla_cost_analysis(batch, n):
    """XLA's own cost model for one compiled solve (the while_loop body is
    counted once, i.e. ~per-iteration): cross-check for the traffic model."""
    from cppnumericalsolvers_tpu.core.driver import _solve_batched_jit

    obj = objective(ext_rosenbrock, mode="first")
    solver = Lbfgs(m=M)
    stopping = fixed_iteration_stopping(100)
    x0 = jnp.zeros((batch, n), jnp.float32)
    compiled = _solve_batched_jit.lower(obj, x0, solver, stopping).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):  # older jax returns [dict]
        ca = ca[0]
    return {
        "xla_flops": ca.get("flops"),
        "xla_bytes_accessed": ca.get("bytes accessed"),
    }


def write_markdown(rows, peak_gbps, kind, path, sharded=None, op_tables=None):
    lines = [
        "# Roofline: batched L-BFGS per-iteration step",
        "",
        f"Device: {kind}; peak HBM bandwidth used for utilization: "
        f"{peak_gbps or 'n/a'} GB/s.",
        "",
        "Workload: extended Rosenbrock, float32, m=10 More-Thuente L-BFGS,",
        "fixed iteration budget (convergence tests off), 16 pipelined",
        "dispatches, per-iteration time from iteration-count contrast",
        "(methodology + traffic model in benchmarks/roofline.py).",
        "",
        "| B | n | us/iter (batched) | lane-iters/s | model MB/iter | "
        "achieved GB/s | HBM util % | kernel us (GB/s, % of step) | "
        "eval us | attainable us | % of attainable | bottleneck |",
        "|---|---|---|---|---|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        kern = (
            f"{r['kernel_us']:.0f} ({r['kernel_gbps']:.0f}, "
            f"{r['kernel_pct_of_step']:.0f}%)"
            if "kernel_gbps" in r
            else "n/a"
        )
        lines.append(
            f"| {r['batch']} | {r['n']} | {r['per_batched_iter_us']:.1f} | "
            f"{r['lane_iters_per_s']:.3g} | "
            f"{r['model_bytes_per_iter'] / 1e6:.2f} | "
            f"{r.get('achieved_gbps', float('nan')):.1f} | "
            f"{r.get('hbm_utilization_pct', float('nan')):.1f} | "
            f"{kern} | "
            f"{r.get('eval_us', float('nan')):.0f} | "
            f"{r.get('attainable_us', float('nan')):.0f} | "
            f"{r.get('pct_of_attainable', float('nan')):.0f}% | "
            f"{r.get('bottleneck', 'n/a')} |"
        )
    if sharded:
        lines += [
            "",
            f"Model-sharded point (GSPMD over a {sharded['mesh_devices']}"
            f"-device model-axis mesh, one instance, n={sharded['n']}): "
            f"{sharded['per_iter_us_model_sharded']:.0f} us/iteration — the "
            "pure-XLA two-loop path that auto-partitions across chips "
            "(parallel/model_sharded.py); model-axis AND 2-D "
            "(batch x model) mesh-size scaling measurements live in "
            "benchmarks/scaling.py's model_axis / mesh_2d legs "
            "(MODEL/SCALING JSON artifacts).",
        ]
    lines += [
        "",
        "**Attainable bound (the committed definition of \"at roofline\")**: "
        "per shape, `attainable = max(light-speed bytes time, measured "
        "standalone kernel floor + nfev/iter x measured objective-eval "
        "floor)`; the *% of attainable* column is the north-star check — "
        "a number, not a debate (benchmarks/roofline.py "
        "attainable_bound_us).  The bottleneck label names the bound's "
        "binding term.",
        "",
        "Traffic model per lane-iteration (floats): history 4mn (fused "
        "push+two-loop kernel reads S,Y once and writes them once — "
        "ops/two_loop.py), kernel vector i/o 4n, line search ~5n per "
        "objective evaluation, driver/progress ~12n.",
        "",
    ]
    def shapes_of(key):
        sel = [r for r in rows if r.get("bottleneck", "").startswith(key)]
        return sel, ", ".join(f"({r['batch']},{r['n']})" for r in sel)

    bw, bw_s = shapes_of("HBM")
    kern, kern_s = shapes_of("fused kernel")
    ev, ev_s = shapes_of("objective")
    if bw:
        best = max(r["hbm_utilization_pct"] for r in bw)
        lines.append(
            f"Bandwidth-bound shapes ({bw_s}): the fused kernel's history "
            f"traffic dominates; best achieved utilization {best:.0f}% of "
            "peak HBM bandwidth."
        )
    if kern:
        lines.append(
            f"Kernel-bound shapes ({kern_s}): the fused push+two-loop "
            "kernel dominates the attainable bound but runs below the HBM "
            "roofline — its sequential reduction chain binds on VPU/DMA "
            "issue rate rather than bandwidth at this shape."
        )
    if ev:
        lines.append(
            f"Evaluation-bound shapes ({ev_s}): the objective's own "
            "batched value_and_grad passes dominate the attainable bound — "
            "the step is within overhead of the floor no line-search "
            "restructuring can beat."
        )
    if op_tables:
        lines += [
            "",
            "## Trace-derived op-time tables (profiler captures summarized "
            "in place of committed binaries — benchmarks/trace_table.py)",
        ]
        for title, table in op_tables:
            lines += ["", f"### {title}", "", table]
    lines.append("")
    with open(path, "w") as fh:
        fh.write("\n".join(lines))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--profile", action="store_true",
                    help="capture jax.profiler traces under profiles/")
    ap.add_argument("--shapes", default=None,
                    help="comma list like 1024x32,256x4096 (default: grid)")
    args = ap.parse_args()

    peak, kind = device_peak()
    grid = GRID
    if args.shapes:
        grid = [
            tuple(int(v) for v in s.split("x")) for s in args.shapes.split(",")
        ]

    profile_dir = None
    rows = []
    for batch, n in grid:
        if args.profile:
            profile_dir = os.path.join(
                os.path.dirname(os.path.abspath(__file__)),
                "..", "profiles", f"lbfgs_b{batch}_n{n}",
            )
            os.makedirs(profile_dir, exist_ok=True)
        row = measure_shape(batch, n, profile_dir=profile_dir)
        kernel_s = measure_kernel_standalone(batch, n)
        row["kernel_us"] = kernel_s * 1e6
        row["kernel_pct_of_step"] = (
            100.0 * kernel_s / (row["per_batched_iter_us"] * 1e-6)
        )
        # Kernel-only achieved bandwidth (history + its vector i/o).
        kernel_bytes = batch * 4 * (4 * M * n + 4 * n)
        row["kernel_gbps"] = kernel_bytes / kernel_s / 1e9
        rows.append(analyze_shape(row, peak))
        print(json.dumps(rows[-1]), file=sys.stderr, flush=True)

    cost = xla_cost_analysis(1024, 256)
    sharded = measure_model_sharded()
    print(json.dumps(sharded), file=sys.stderr, flush=True)
    md_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", "ROOFLINE.md"
    )
    op_tables = None
    if args.profile:
        from trace_table import format_table

        op_tables = []
        for batch, n in grid:
            cdir = os.path.join(
                os.path.dirname(os.path.abspath(__file__)),
                "..", "profiles", f"lbfgs_b{batch}_n{n}",
            )
            try:
                table = format_table(cdir, top=12)
            except SystemExit:
                continue
            op_tables.append((f"(B={batch}, n={n})", table.strip()))
    write_markdown(rows, peak, kind, md_path, sharded, op_tables)
    print(
        json.dumps(
            {
                "metric": "lbfgs_roofline_grid",
                "device_kind": kind,
                "peak_hbm_gbps": peak,
                "shapes": rows,
                "model_sharded_point": sharded,
                "xla_cost_analysis_b1024_n256": cost,
                "markdown": "ROOFLINE.md",
            }
        )
    )


if __name__ == "__main__":
    main()
