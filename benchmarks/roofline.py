"""Roofline / utilization analysis of the batched L-BFGS step on TPU.

BASELINE.md's north star is "per-iteration step at roofline on 1 chip".
This harness substantiates it: for a (B, n) grid of batched extended-
Rosenbrock L-BFGS solves it measures the per-iteration device time, derives
the achieved HBM bandwidth from an itemized traffic model, and reports
utilization against the chip's peak — plus XLA's own cost analysis of the
compiled step and an optional ``jax.profiler`` trace capture.

Which roofline binds depends on the regime (round 5):

* **VMEM-resident** (the flat trip-granular solve, n <= 256: the whole
  batched carry — history, search state, progress — fits the chip's
  128 MB VMEM and XLA keeps it there): the solve never touches HBM in the
  hot loop — measured 42 MB of modeled per-trip "HBM" traffic sustaining
  1.27 TB/s on an 819 GB/s part.  The binding floors are the measured
  objective-evaluation cost, the VPU element throughput, and per-trip
  runtime overhead.
* **HBM-streaming** (larger n): the L-BFGS step is reduction/elementwise
  work at ~0.6 flops/byte, two orders of magnitude below the f32 ridge
  point, so the speed-of-light step time is bytes/BW.  Traffic model per
  lane-iteration (floats): history 4mn, kernel i/o ~5n, transposes ~10n
  (transposed path), line search ~5n/eval, driver ~12n.

The attainable bound (analyze_shape/attainable_bound_us) is
HARDWARE-DERIVED: chip parameters (HBM peak, VPU element rate,
dependent-op latency) + structural op counts + the measured objective-eval
floor + a kernel-independent loop-trip calibration — never any solver
kernel's own measured time, so the "% of attainable" column moves when a
kernel improves (the rounds-3/4 bound structurally could not indict its
own kernel).

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

# Peak VPU elementwise throughput by device kind (f32 element-ops/s):
# lanes (8 x 128) x ALUs-per-lane (4) x clock.  v5e clock 0.94 GHz,
# v4 1.05 GHz, v5p 1.75 GHz, v6e 1.7 GHz (public figures; the scaling
# book's VPU description).  Used only by the hardware-derived attainable
# model — a LOWER bound on kernel time, so an optimistic peak is the
# correct direction.
VPU_ELEM_RATE = {
    "TPU v4": 8 * 128 * 4 * 1.05e9,
    "TPU v5 lite": 8 * 128 * 4 * 0.94e9,
    "TPU v5e": 8 * 128 * 4 * 0.94e9,
    "TPU v5": 8 * 128 * 4 * 1.75e9,
    "TPU v5p": 8 * 128 * 4 * 1.75e9,
    "TPU v6 lite": 8 * 128 * 4 * 1.7e9,
    "TPU v6e": 8 * 128 * 4 * 1.7e9,
}

# Engineering estimate of the serialization cost of one DEPENDENT vector
# op in a chain (VPU pipeline depth + issue, ~15-25 cycles at ~1 GHz).
# Part of the hardware-derived kernel model's latency term; documented
# constant, not fitted to any kernel measurement.
SERIAL_DEP_NS = 20.0

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
    """Modeled HBM bytes per BATCHED iteration (all lanes), itemized.
    On the transposed path the layout-boundary transposes add one
    read+write of the 5 crossing vectors (~10n per lane)."""
    history = 4 * m * n
    kernel_io = 5 * n
    transposes = 10 * n if _transposed_active(n) else 0
    linesearch = 5.0 * n * nfev_per_iter
    driver = 12 * n
    per_lane = itemsize * (
        history + kernel_io + transposes + linesearch + driver
    )
    return batch * per_lane, {
        "history": batch * itemsize * history,
        "kernel_io": batch * itemsize * kernel_io,
        "transposes": batch * itemsize * transposes,
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


def measure_shape(batch, n, pipeline=4, profile_dir=None):
    """Per-batched-iteration DEVICE time from a profiler capture.

    Rounds 1-4 used a wall-clock iteration-count contrast; round 5's flat
    VMEM-resident solve dropped whole-run device time to tens of ms, below
    the remote-device tunnel's multi-ms dispatch jitter — wall contrasts
    became bimodal (3-24 us/iter scatter around an 11 us truth at
    (1024, 32)).  The profiler's device-side duration of the top-level
    program is jitter-free: per_iter = device_duration / batched
    iterations.  Tracing inflates device time slightly (~10-25% measured),
    so the figure is conservative.  The iteration budget stays inside the
    DESCENT phase of the solve: iterating far past convergence (with the
    stopping tests disabled) degenerates into stalled max-fev line
    searches and measures a regime no converging solve ever runs in."""
    import shutil
    import tempfile

    if n <= 64:
        iters = 50
    elif n <= 1024:
        iters = 80
    else:
        iters = 60
    rng = np.random.default_rng(0)
    x0s = [
        jnp.asarray(
            rng.uniform(-2.0, 2.0, size=(batch, n)).astype(np.float32)
        )
        for _ in range(pipeline)
    ]
    solver = Lbfgs(m=M)
    stopping = fixed_iteration_stopping(iters)
    _run_pipelined(solver, x0s, stopping)  # compile + load

    cdir = profile_dir or tempfile.mkdtemp(prefix="cppns_roofline_")
    with jax.profiler.trace(cdir):
        _, total_iters, total_nfev = _run_pipelined(solver, x0s, stopping)

    try:
        from benchmarks.trace_table import load_device_events
    except ImportError:  # run as a script from benchmarks/
        from trace_table import load_device_events

    events = load_device_events(cdir)
    # The top-level jit program's device duration covers every trip and
    # every inter-op gap of the dispatch, and nothing host-side.
    dev_us = max(
        (e.get("dur", 0) for e in events if e["name"].startswith("jit_")),
        default=0,
    )
    if profile_dir is None:
        shutil.rmtree(cdir, ignore_errors=True)
    batched_iters = total_iters / batch
    per_iter_s = dev_us * 1e-6 / max(batched_iters, 1.0)
    return {
        "batch": batch,
        "n": n,
        "per_batched_iter_us": per_iter_s * 1e6,
        "lane_iters_per_s": batch / per_iter_s,
        "nfev_per_iter": total_nfev / max(total_iters, 1.0),
    }


def _transposed_active(n):
    """Whether the batched solve path runs the batch-minor (transposed)
    prologue at this n (must track Lbfgs._TRANSPOSED_N_MAX)."""
    from cppnumericalsolvers_tpu.solvers import Lbfgs

    return n <= Lbfgs._TRANSPOSED_N_MAX


@functools.partial(jax.jit, static_argnames=("obj", "solver"))
def _scanned_solver_solves(obj, x0s, solver, stopping, internals=None):
    """Generalized :func:`_scanned_solves` accepting any solver plus
    optional solver internals (e.g. L-BFGS-B runtime boxes)."""
    from jax import lax

    from cppnumericalsolvers_tpu.core.driver import _solve_batched_jit

    def body(carry, x0_batch):
        r = _solve_batched_jit(
            obj, x0_batch, solver, stopping, internals=internals
        )
        return carry, (
            jnp.sum(r.progress.num_iterations),
            jnp.sum(r.state.nfev),
            jnp.sum(r.state.value),
        )

    _, (iters, nfev, values) = lax.scan(body, 0, x0s)
    return jnp.sum(iters), jnp.sum(nfev), jnp.sum(values)


def measure_solver_shape(
    batch, n, solver, mode="first", internals=None, pipeline=8,
    iters_lo=None, iters_hi=12,
):
    """Per-batched-iteration DEVICE time for an arbitrary solver on
    extended Rosenbrock — same trace-based methodology as
    :func:`measure_shape` (wall contrasts through the remote tunnel went
    negative for the faster solvers).  ``iters_hi`` must stay inside the
    solver's descent phase.  Used by bench.py's solver legs (L-BFGS-B /
    BFGS / Newton / HZ — VERDICT round-4 items 3, 6 and 8)."""
    import shutil
    import tempfile

    del iters_lo  # kept for call compatibility; trace method needs one run
    obj = objective(ext_rosenbrock, mode=mode)
    rng = np.random.default_rng(0)
    x0s = jnp.stack([
        jnp.asarray(rng.uniform(-2.0, 2.0, (batch, n)).astype(np.float32))
        for _ in range(pipeline)
    ])
    stopping = fixed_iteration_stopping(iters_hi)
    _scanned_solver_solves(obj, x0s, solver, stopping, internals)
    cdir = tempfile.mkdtemp(prefix="cppns_leg_")
    with jax.profiler.trace(cdir):
        got = _scanned_solver_solves(obj, x0s, solver, stopping, internals)
        total_iters = float(np.asarray(got[0]))
        total_nfev = float(np.asarray(got[1]))
    try:
        from benchmarks.trace_table import load_device_events
    except ImportError:
        from trace_table import load_device_events

    events = load_device_events(cdir)
    dev_us = max(
        (e.get("dur", 0) for e in events if e["name"].startswith("jit_")),
        default=0,
    )
    shutil.rmtree(cdir, ignore_errors=True)
    per_iter_s = dev_us * 1e-6 / max(total_iters / batch, 1.0)
    return {
        "batch": batch,
        "n": n,
        "per_batched_iter_us": per_iter_s * 1e6,
        "lane_iters_per_s": batch / per_iter_s,
        "nfev_per_iter": total_nfev / max(total_iters, 1.0),
    }


def measure_kernel_standalone(batch, n, m=M, k_lo=20, k_hi=220):
    """Measured device time of the ACTIVE direction-step kernel at this
    shape — the transposed prologue (ops/fused_step_t.py) for
    n <= Lbfgs._TRANSPOSED_N_MAX, the batch-major prologue beyond — via a
    scanned k-call chain contrast.  Diagnostic only since round 5: the
    attainable bound uses the hardware-derived :func:`kernel_model_us`
    instead (a measured floor can never indict its own kernel)."""
    from jax import lax

    from cppnumericalsolvers_tpu.ops.fused_step import (
        prologue_pallas_batched,
    )
    from cppnumericalsolvers_tpu.ops.fused_step_t import (
        history_rows_to_t,
        prologue_t_pallas_batched,
    )

    transposed = _transposed_active(n)

    @functools.partial(jax.jit, static_argnames=("k",))
    def chain_t(x, g, st, yt, c, ga, sn, yn, v, dn, k):
        def body(carry, _):
            x_, g_, st_, yt_, c_, ga_, sn_, yn_ = carry
            d, a, dg, st2, yt2, c2, ga2 = prologue_t_pallas_batched(
                x_, g_, st_, yt_, c_, ga_, sn_, yn_, v, dn
            )
            return (x_, d, st2, yt2, c2, ga2, sn_, yn_), None

        (x_, d, *_), _ = lax.scan(
            body, (x, g, st, yt, c, ga, sn, yn), None, length=k
        )
        return jnp.sum(d)

    @functools.partial(jax.jit, static_argnames=("k",))
    def chain_m(x, g, s, y, c, ga, sn, yn, v, dn, k):
        def body(carry, _):
            x_, g_, s_, y_, c_, ga_, sn_, yn_ = carry
            d, a, dg, s2, y2, c2, ga2 = prologue_pallas_batched(
                x_, g_, s_, y_, c_, ga_, sn_, yn_, v, dn
            )
            return (x_, d, s2, y2, c2, ga2, sn_, yn_), None

        (x_, d, *_), _ = lax.scan(
            body, (x, g, s, y, c, ga, sn, yn), None, length=k
        )
        return jnp.sum(d)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((batch, n)).astype(np.float32))
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
    dn = jnp.zeros((batch,), bool)
    if transposed:
        st = history_rows_to_t(s, m, n)
        yt = history_rows_to_t(y, m, n)
        args = (x, g, st, yt, c, ga, sn, yn, v, dn)
        chain = chain_t
    else:
        args = (x, g, s, y, c, ga, sn, yn, v, dn)
        chain = chain_m
    out = {}
    for k in (k_lo, k_hi):
        float(np.asarray(chain(*args, k)))
        t0 = time.perf_counter()
        float(np.asarray(chain(*args, k)))
        out[k] = time.perf_counter() - t0
    return (out[k_hi] - out[k_lo]) / (k_hi - k_lo)


def measure_eval_standalone(batch, n, k=1200):
    """Device time of ONE batched objective value_and_grad at this shape —
    the evaluation floor no line search can beat.  Trace-based: the
    profiler's device-side duration of a k-call serial chain / k (wall
    contrasts through the remote tunnel scattered 0.4-5 us for the same
    shape across runs)."""
    import shutil
    import tempfile

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
    float(np.asarray(chain(x, k)))  # warm/compile + load
    cdir = tempfile.mkdtemp(prefix="cppns_eval_")
    with jax.profiler.trace(cdir):
        float(np.asarray(chain(x, k)))
    try:
        from benchmarks.trace_table import load_device_events
    except ImportError:
        from trace_table import load_device_events

    events = load_device_events(cdir)
    dev_us = max(
        (e.get("dur", 0) for e in events if e["name"].startswith("jit_")),
        default=0,
    )
    shutil.rmtree(cdir, ignore_errors=True)
    return dev_us * 1e-6 / k


def _round_up(x, mult):
    return -(-x // mult) * mult


def _phase_model_us(bytes_, elems, peak_gbps, vpu_rate, chain_us=0.0):
    """Lower bound for one serial phase: its time cannot beat its HBM
    bytes at peak bandwidth, its element-ops at peak VPU rate, or its
    dependent-chain latency — so max() of the three is a valid bound.
    ``peak_gbps=None`` drops the bytes term (the VMEM-resident regime —
    dropping a lower-bound term keeps the bound valid)."""
    bytes_term = 0.0 if not peak_gbps else bytes_ / (peak_gbps * 1e9) * 1e6
    return max(bytes_term, elems / vpu_rate * 1e6, chain_us)


def kernel_model_us(batch, n, peak_gbps, kind, m=M, itemsize=4):
    """HARDWARE-DERIVED lower bound for the fused direction-step kernel
    (VERDICT round-4 item 2: the round-3/4 bound used the kernel's own
    measured floor, which could never indict the kernel).  Three terms,
    none taken from any kernel measurement:

    * bytes: the kernel's unavoidable HBM traffic — history read+write
      (4 m n8 B_pad), kernel vector i/o (5 n8 B_pad), and the layout-
      boundary transposes (2 x 5 n B) — at peak bandwidth;
    * VPU: the push + two-loop element-op count (~16mn + 24n per lane) at
      the chip's peak elementwise rate;
    * chain: the 2m serially-dependent reductions, each a
      (log2(n8/8) + 4)-deep dependent vector chain at SERIAL_DEP_NS per
      dependent op, times the number of sequential grid programs.

    Shapes follow the layout the solve path actually runs at this n
    (transposed batch-minor below Lbfgs._TRANSPOSED_N_MAX, batch-major
    flat above)."""
    vpu_rate = VPU_ELEM_RATE.get(kind, 8 * 128 * 4 * 1e9)
    if _transposed_active(n):
        n8 = _round_up(n, 8)
        b_pad = _round_up(batch, 128)
        hist_bytes = 4 * m * n8 * b_pad * itemsize
        vec_bytes = 5 * n8 * b_pad * itemsize + 10 * n * batch * itemsize
        # One grid program per 128-1024 lane tile; the serial chain runs
        # once per program (programs execute sequentially on the core).
        programs = max(1, b_pad // 1024)
        depth = 2 * m * (int(np.ceil(np.log2(max(n8 // 8, 1) or 1))) + 4)
        chain_us = programs * depth * SERIAL_DEP_NS * 1e-3
    else:
        n8 = _round_up(n, 8)
        hist_bytes = 4 * m * n8 * batch * itemsize
        vec_bytes = 5 * n8 * batch * itemsize
        programs = max(1, batch // 8)  # at least the minimum 8-lane tile
        depth = 2 * m * 6
        # Batch-major programs pipeline their DMA; the chain term uses the
        # same structural estimate (it never binds at large n anyway).
        chain_us = max(1, batch // 1024) * depth * SERIAL_DEP_NS * 1e-3
    elems = batch * (16 * m * n + 24 * n)
    return _phase_model_us(
        hist_bytes + vec_bytes, elems, peak_gbps, vpu_rate, chain_us
    )


def linesearch_model_us(batch, n, peak_gbps, kind, itemsize=4):
    """Per-trip lower bound for the post-evaluation More-Thuente kernel:
    vector traffic (x0, d, g_t in; x_trial, g_acc out ~ 6 Bn) + ~40 scalar
    rows, and ~8 Bn element-ops."""
    vpu_rate = VPU_ELEM_RATE.get(kind, 8 * 128 * 4 * 1e9)
    bytes_ = (6 * n + 40) * batch * itemsize
    elems = 8 * n * batch
    return _phase_model_us(bytes_, elems, peak_gbps, vpu_rate)


def epilogue_model_us(batch, n, peak_gbps, kind, itemsize=4):
    """Lower bound for the accept/progress epilogue: state vectors in/out
    (~8 Bn) + ~30 scalar columns, ~12 Bn element-ops."""
    vpu_rate = VPU_ELEM_RATE.get(kind, 8 * 128 * 4 * 1e9)
    bytes_ = (8 * n + 30) * batch * itemsize
    elems = 12 * n * batch
    return _phase_model_us(bytes_, elems, peak_gbps, vpu_rate)


_TRIP_US_CACHE = {}


def measure_loop_trip_overhead_us(reps_lo=100, reps_hi=900):
    """One-time, kernel-independent calibration of the MINIMAL cost of one
    evaluation trip of a compiled search loop: a ``lax.while_loop`` whose
    body is a trivial vmapped objective evaluation followed by a trivial
    Pallas kernel and an any-lane predicate — the irreducible structure of
    every line-search-driven solve (eval -> bookkeeping kernel -> continue?)
    regardless of what the kernels compute.  A runtime/scheduling property
    of the device, not of any solver kernel, so it belongs in the
    attainable bound without re-introducing circularity."""
    if "v" in _TRIP_US_CACHE:
        return _TRIP_US_CACHE["v"]
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # The skeleton mirrors the STRUCTURE of one flat-solve trip with
    # trivial content: a ~10-operand/10-output Pallas kernel over small
    # VMEM buffers, a layout-boundary transpose pair, a vmapped objective
    # evaluation, and the loop predicate.  Any implementation that runs
    # one bookkeeping kernel per objective evaluation pays this floor; it
    # contains no solver math, so using it in the bound does not
    # re-introduce circularity.
    NBUF = 8

    def tiny_kernel(*refs):
        ins, outs = refs[:NBUF], refs[NBUF:]
        for i, o in zip(ins, outs):
            o[:] = i[:] * 0.999 + 1e-6

    def tiny(*bufs):
        spec = pl.BlockSpec(memory_space=pltpu.VMEM)
        return pl.pallas_call(
            tiny_kernel,
            out_shape=tuple(
                jax.ShapeDtypeStruct(b.shape, b.dtype) for b in bufs
            ),
            in_specs=[spec] * NBUF,
            out_specs=(spec,) * NBUF,
            input_output_aliases={i: i for i in range(NBUF)},
        )(*bufs)

    vobj = jax.vmap(jax.value_and_grad(lambda x: jnp.sum(x * x)))

    @functools.partial(jax.jit, static_argnames=("k",))
    def run(x, bufs, k):
        def cond(c):
            _, _, i = c
            return jnp.any(i < k)

        def body(c):
            x_, bufs_, i = c
            f, g = vobj(x_.T)  # transpose out to the eval layout...
            bufs_ = tiny(*bufs_)
            return x_ - 1e-9 * g.T, bufs_, i + 1  # ...and back

        out, bufs_f, _ = lax.while_loop(
            cond, body, (x, bufs, jnp.zeros((), jnp.int32))
        )
        # Consume every output so nothing is dead-code-eliminated.
        return jnp.sum(out) + sum(jnp.sum(b) for b in bufs_f)

    import shutil
    import tempfile

    x = jnp.ones((8, 128), jnp.float32)
    bufs = tuple(jnp.ones((8, 128), jnp.float32) * i for i in range(NBUF))
    float(np.asarray(run(x, bufs, reps_hi)))  # compile + load
    # Trace-based: device-side duration of the whole loop / trips (wall
    # contrasts through the remote tunnel scatter several-fold — see
    # measure_shape).
    cdir = tempfile.mkdtemp(prefix="cppns_trip_")
    with jax.profiler.trace(cdir):
        float(np.asarray(run(x, bufs, reps_hi)))
    try:
        from benchmarks.trace_table import load_device_events
    except ImportError:
        from trace_table import load_device_events

    events = load_device_events(cdir)
    dev_us = max(
        (e.get("dur", 0) for e in events if e["name"].startswith("jit_")),
        default=0,
    )
    shutil.rmtree(cdir, ignore_errors=True)
    v = dev_us / reps_hi
    _TRIP_US_CACHE["v"] = v
    return v


_LAUNCH_US_CACHE = {}


def measure_launch_overhead_us(reps_lo=200, reps_hi=1800):
    """One-time, kernel-independent calibration of the fixed cost of one
    Pallas kernel invocation inside a compiled loop (launch + block DMA
    warmup), via a scanned chain of MINIMAL kernels.  A runtime property
    of the device/compiler, not of any solver kernel — using it in the
    attainable bound does not re-introduce the round-3/4 circularity."""
    if "v" in _LAUNCH_US_CACHE:
        return _LAUNCH_US_CACHE["v"]
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def tiny_kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:] + 1.0

    def tiny(x):
        return pl.pallas_call(
            tiny_kernel,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)

    @functools.partial(jax.jit, static_argnames=("k",))
    def chain(x, k):
        return lax.scan(lambda c, _: (tiny(c), None), x, None, length=k)[0]

    x = jnp.zeros((8, 128), jnp.float32)
    out = {}
    for k in (reps_lo, reps_hi):
        np.asarray(chain(x, k))
        t0 = time.perf_counter()
        np.asarray(chain(x, k))
        out[k] = time.perf_counter() - t0
    v = max((out[reps_hi] - out[reps_lo]) / (reps_hi - reps_lo), 0.0) * 1e6
    _LAUNCH_US_CACHE["v"] = v
    return v


_VMEM_BUDGET_BYTES = 96 << 20  # usable fraction of the 128 MB physical VMEM


def _flat_working_set(batch, n, m=M, itemsize=4):
    """Bytes of the flat solve's loop carry (history + vectors + scalar
    packs + ring)."""
    n8 = _round_up(n, 8)
    b_pad = _round_up(batch, 128)
    return (4 * m * n8 + 14 * n8 + 80) * b_pad * itemsize


def _flat_active(n):
    from cppnumericalsolvers_tpu.solvers import Lbfgs

    return n <= Lbfgs._FLAT_N_MAX


def _vmem_resident(batch, n):
    """Whether the whole flat-solve working set fits the chip's physical
    VMEM, in which case XLA keeps the loop carry resident and the solve
    never touches HBM — measured round 5 at (1024, 256): 42 MB of modeled
    per-trip 'HBM' traffic sustained 1.27 TB/s on an 819 GB/s part, i.e.
    it wasn't HBM."""
    return _flat_active(n) and _flat_working_set(batch, n) <= \
        _VMEM_BUDGET_BYTES


def _flat_excess_bytes(batch, n):
    """Unavoidable per-trip HBM traffic for the flat solve: only the part
    of the working set that CANNOT be VMEM-resident must cross HBM each
    trip (the resident part never moves).  Measured round 5 at
    (1024, 1024): the flat solve ran at 104% of the pure-streaming HBM
    bound — partial residency makes full-streaming bytes an invalid lower
    bound, while the excess-only bytes remain one."""
    return max(0, _flat_working_set(batch, n) - _VMEM_BUDGET_BYTES)


def attainable_bound_us(row, peak_gbps, kind, eval_us, trip_us):
    """The committed, falsifiable definition of "at roofline" for a shape
    — round-5 form, HARDWARE-DERIVED (VERDICT round-4 item 2):

        attainable = max( light_speed_bytes_time        [0 if VMEM-resident]
                          kernel_model + nfev*(eval_floor + ls_model)
                          + epilogue_model + nfev*trip_floor )

    Every *_model term comes from chip parameters (HBM peak, VPU peak,
    dependent-op latency) and structural op counts — NOT from the kernel's
    own measured time — so the "% of attainable" column moves when a
    kernel improves.  eval_floor is the measured objective cost (the one
    floor no solver restructuring can beat); trip_floor is the measured
    cost of ONE trip of a minimal eval -> trivial-kernel -> predicate
    while loop (a runtime property: every line-search-driven solve runs
    >= nfev such trips).  When the working set fits VMEM (the flat solve's
    regime at small/mid n) the HBM bytes terms are dropped — dropping a
    lower-bound term keeps the bound valid."""
    batch, n, nfev = row["batch"], row["n"], row["nfev_per_iter"]
    resident = _vmem_resident(batch, n)
    if resident:
        light_us = 0.0
        k_us = kernel_model_us(batch, n, None, kind)
        ls_us = linesearch_model_us(batch, n, None, kind)
        ep_us = epilogue_model_us(batch, n, None, kind)
    elif _flat_active(n):
        # Flat solve with a working set larger than VMEM: only the
        # non-resident excess must cross HBM, once (read+write) per trip.
        excess = _flat_excess_bytes(batch, n)
        light_us = (
            nfev * 2 * excess / (peak_gbps * 1e9) * 1e6 if peak_gbps
            else 0.0
        )
        k_us = kernel_model_us(batch, n, None, kind)
        ls_us = linesearch_model_us(batch, n, None, kind)
        ep_us = epilogue_model_us(batch, n, None, kind)
    else:
        bytes_total, _ = traffic_model_bytes(batch, n, nfev)
        light_us = (
            bytes_total / (peak_gbps * 1e9) * 1e6 if peak_gbps else 0.0
        )
        k_us = kernel_model_us(batch, n, peak_gbps, kind)
        ls_us = linesearch_model_us(batch, n, peak_gbps, kind)
        ep_us = epilogue_model_us(batch, n, peak_gbps, kind)
    serial_us = (
        k_us + nfev * (eval_us + ls_us + trip_us) + ep_us
    )
    parts = {
        "kernel_model_us": k_us,
        "linesearch_model_us_per_trip": ls_us,
        "epilogue_model_us": ep_us,
        "loop_trip_floor_us": trip_us,
        "vmem_resident": resident,
    }
    return max(light_us, serial_us), light_us, serial_us, parts


def analyze_shape(row, peak_gbps, kind=None, eval_us=None):
    """Annotate a measured row with the traffic model, utilization, the
    hardware-derived attainable bound, and ONE bottleneck label derived
    from the bound's binding term — bench.py calls this same function, so
    BENCH and ROOFLINE.md cannot disagree on labels."""
    bytes_total, parts = traffic_model_bytes(
        row["batch"], row["n"], row["nfev_per_iter"]
    )
    t = row["per_batched_iter_us"] * 1e-6
    achieved = bytes_total / t
    row["model_bytes_per_iter"] = bytes_total
    row["achieved_gbps"] = achieved / 1e9
    if not peak_gbps:
        return row
    if kind is None:
        kind = jax.devices()[0].device_kind
    light = bytes_total / (peak_gbps * 1e9)
    row["hbm_utilization_pct"] = 100.0 * light / t
    if eval_us is None:
        eval_us = row.get("eval_us")
    if eval_us is None:
        # Advisor round-4: this fallback runs a long scanned device
        # measurement — make it loud so callers know where minutes went.
        print(
            f"[roofline] measuring standalone eval floor at "
            f"(B={row['batch']}, n={row['n']})...",
            file=sys.stderr, flush=True,
        )
        eval_us = measure_eval_standalone(row["batch"], row["n"]) * 1e6
    row["eval_us"] = eval_us
    trip_us = measure_loop_trip_overhead_us()
    attainable, light_us, serial_us, model_parts = attainable_bound_us(
        row, peak_gbps, kind, eval_us, trip_us
    )
    row.update(model_parts)
    row["attainable_us"] = attainable
    row["pct_of_attainable"] = 100.0 * attainable / row["per_batched_iter_us"]
    # The label names the BINDING term of the attainable bound.
    if light_us >= serial_us:
        row["bottleneck"] = "HBM bandwidth"
    elif row["kernel_model_us"] >= row["nfev_per_iter"] * (
        eval_us + row["linesearch_model_us_per_trip"] + trip_us
    ):
        row["bottleneck"] = "direction-step kernel"
    else:
        row["bottleneck"] = "line-search trips (eval + loop floor)"
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
        "fixed iteration budget inside the descent phase (convergence",
        "tests off); per-iteration time = profiler-captured device-side",
        "program duration / batched iterations (wall contrasts through",
        "the remote tunnel scatter several-fold at the flat solve's",
        "speed; methodology + models in benchmarks/roofline.py).",
        "",
        "| B | n | regime | us/iter (batched) | lane-iters/s | "
        "model MB/iter | achieved GB/s | HBM util % | "
        "kernel meas us (GB/s, % of step) | kernel MODEL us | eval us | "
        "attainable us | % of attainable | bottleneck |",
        "|---|---|---|---|---|---|---|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        kern = (
            f"{r['kernel_us']:.0f} ({r['kernel_gbps']:.0f}, "
            f"{r['kernel_pct_of_step']:.0f}%)"
            if "kernel_gbps" in r and r["kernel_us"] > 0
            else "n/a"  # wall-contrast diagnostic lost in tunnel jitter
        )
        regime = "VMEM" if r.get("vmem_resident") else "HBM"
        lines.append(
            f"| {r['batch']} | {r['n']} | {regime} | "
            f"{r['per_batched_iter_us']:.1f} | "
            f"{r['lane_iters_per_s']:.3g} | "
            f"{r['model_bytes_per_iter'] / 1e6:.2f} | "
            f"{r.get('achieved_gbps', float('nan')):.1f} | "
            f"{r.get('hbm_utilization_pct', float('nan')):.1f} | "
            f"{kern} | "
            f"{r.get('kernel_model_us', float('nan')):.1f} | "
            f"{r.get('eval_us', float('nan')):.1f} | "
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
        "per shape, `attainable = max(light-speed bytes time [dropped when "
        "the working set is VMEM-resident], kernel_model + nfev x (eval "
        "floor + linesearch_model + loop-trip floor) + epilogue_model)` — "
        "round-5 form, HARDWARE-DERIVED: every model term comes from chip "
        "parameters (peak HBM bandwidth, peak VPU element rate, "
        "dependent-op latency) and structural op counts, never from the "
        "kernel's own measured time, so the *% of attainable* column moves "
        "when a kernel improves (the rounds-3/4 bound could not indict its "
        "own kernel).  The measured standalone kernel column is a "
        "DIAGNOSTIC of the nested-path prologue; the objective-eval floor "
        "is measured (the one cost no solver restructuring can beat); the "
        "loop-trip floor is a kernel-independent runtime calibration "
        "(benchmarks/roofline.py attainable_bound_us / kernel_model_us).  "
        "The bottleneck label names the bound's binding term.",
        "",
        "VMEM-resident rows (flat trip-granular solve, ops/flat_solve.py): "
        "the whole batched carry lives in the chip's 128 MB VMEM across "
        "the solve, so HBM bytes terms are dropped from the bound "
        "(dropping a lower-bound term keeps it valid) and per-iteration "
        "times beat the HBM roofline outright.  HBM-streaming rows use "
        "the traffic model per lane-iteration (floats): history 4mn, "
        "kernel vector i/o ~5n, layout-boundary transposes ~10n "
        "(transposed path only), line search ~5n per objective "
        "evaluation, driver/progress ~12n.",
        "",
    ]
    def shapes_of(key):
        sel = [r for r in rows if r.get("bottleneck", "").startswith(key)]
        return sel, ", ".join(f"({r['batch']},{r['n']})" for r in sel)

    bw, bw_s = shapes_of("HBM")
    kern, kern_s = shapes_of("direction-step")
    ev, ev_s = shapes_of("line-search")
    if bw:
        best = max(r["hbm_utilization_pct"] for r in bw)
        lines.append(
            f"Bandwidth-bound shapes ({bw_s}): the fused kernel's history "
            f"traffic dominates; best achieved utilization {best:.0f}% of "
            "peak HBM bandwidth."
        )
    if kern:
        lines.append(
            f"Direction-step-bound shapes ({kern_s}): the modeled "
            "prologue kernel (history traffic + two-loop chain) dominates "
            "the attainable bound."
        )
    if ev:
        lines.append(
            f"Line-search-bound shapes ({ev_s}): the per-trip objective "
            "evaluation + MT kernel floor dominates the attainable bound — "
            "the step is within overhead of the floor no direction-step "
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
        # Measured active-path kernel floor: DIAGNOSTIC column only (the
        # attainable bound is hardware-derived; see kernel_model_us).
        kernel_s = measure_kernel_standalone(batch, n)
        row["kernel_us"] = kernel_s * 1e6
        row["kernel_pct_of_step"] = (
            100.0 * kernel_s / (row["per_batched_iter_us"] * 1e-6)
        )
        kernel_bytes = batch * 4 * (4 * M * n + 5 * n)
        row["kernel_gbps"] = kernel_bytes / kernel_s / 1e9
        rows.append(analyze_shape(row, peak, kind))
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
