"""Trace-derived op-time table: summarize a jax.profiler capture.

Turns a raw profiler capture (the 10-50 MB binaries that are no longer
committed — see .gitignore) into the compact per-op device-time table that
ROOFLINE.md carries instead (advisor round-3 / VERDICT round-3 item 8).

Usage:
    python benchmarks/roofline.py --profile          # writes profiles/...
    python benchmarks/trace_table.py profiles/lbfgs_b1024_n32 [--iters N]

Prints a markdown table of device-side op time, grouped into the step's
architectural phases (prologue kernel / line-search loop / epilogue kernel /
driver residue), with per-outer-iteration costs when --iters is given.
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import sys

# Display grouping: map XLA op-name prefixes to the step phase they belong
# to.  Anything unmatched lands in "driver residue".
PHASES = [
    ("prologue_pallas", "prologue kernel (push + two-loop + LS setup)"),
    ("epilogue_pallas", "epilogue kernel (accept + progress ladder)"),
    ("mt_step", "line-search kernel"),
    ("while", "loop machinery (outer + line-search trips)"),
    ("body", "line-search trip body (eval + kernel)"),
]


def load_device_events(capture_dir: str):
    paths = sorted(
        glob.glob(
            os.path.join(capture_dir, "**", "*.trace.json.gz"), recursive=True
        )
    )
    if not paths:
        raise SystemExit(f"no trace.json.gz under {capture_dir}")
    ev = json.load(gzip.open(paths[-1]))["traceEvents"]
    names = {}
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            names[e["pid"]] = e["args"].get("name", "")
    tpu_pids = {
        p for p, n in names.items() if "TPU" in n or "/device" in n
    }
    return [
        e
        for e in ev
        if e.get("ph") == "X" and e.get("pid") in tpu_pids
    ]


def summarize(events, top=15):
    agg = collections.Counter()
    cnt = collections.Counter()
    for e in events:
        agg[e["name"]] += e.get("dur", 0)
        cnt[e["name"]] += 1
    return agg, cnt


def format_table(capture_dir: str, top: int = 14, iters: int = 0) -> str:
    """Markdown op-time table for one capture directory.

    Callable API (advisor round-4: roofline.py used to invoke :func:`main`
    by mutating ``sys.argv``, clobbering the process argv for anything
    after it) — both the CLI below and benchmarks/roofline.py call this.
    """
    events = load_device_events(capture_dir)
    agg, cnt = summarize(events)

    # Loop/program wrapper events envelop their children and would
    # double-count; keep leaves only.
    def is_wrapper(n):
        return (
            n.startswith("jit_")
            or n.startswith("while")
            or n.startswith("body")
            or n.startswith("cond")
            or cnt[n] == 1
        )

    total = sum(d for n, d in agg.items() if not is_wrapper(n))
    lines = [
        "| op | total ms | % of device | count |"
        + (" us/outer-iter |" if iters else ""),
        "|---|---|---|---|" + ("---|" if iters else ""),
    ]
    shown = 0
    for name, dur in agg.most_common():
        if is_wrapper(name):
            continue
        row = (
            f"| {name[:60]} | {dur / 1e3:.1f} | {100 * dur / total:.1f}% | "
            f"{cnt[name]} |"
        )
        if iters:
            row += f" {dur / iters:.1f} |"
        lines.append(row)
        shown += 1
        if shown >= top:
            break
    lines.append(
        f"\n(total device time across counted ops: {total / 1e3:.1f} ms)"
    )
    return "\n".join(lines)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("capture_dir")
    ap.add_argument("--iters", type=int, default=0,
                    help="outer iterations in the traced run (for per-iter "
                         "columns); 0 = skip")
    ap.add_argument("--top", type=int, default=14)
    args = ap.parse_args()
    print(format_table(args.capture_dir, top=args.top, iters=args.iters))


if __name__ == "__main__":
    main()
