"""Per-instance regression diff for the MGH reliability suite.

Compares two BENCH_INSTANCES*.json artifacts (written by bench.py's
``write_instance_artifact``) and names every instance whose single-solve
success flipped, plus the aggregate nfev drift — the attribution trail the
round-4 verdict asked for (a converged-% move between rounds must name the
instances that flipped, not be a mystery).

Usage:
    python benchmarks/instance_diff.py BENCH_INSTANCES_r04.json BENCH_INSTANCES.json
"""

from __future__ import annotations

import json
import sys


def _load(path: str) -> dict:
    with open(path) as fh:
        rows = json.load(fh)["rows"]
    return {(r["problem"], r["start"]): r for r in rows}


def diff_files(old_path: str, new_path: str) -> dict:
    """Flip summary between two artifacts.

    Returns {baseline, to_fail: [...], to_ok: [...], nfev_mean_old/new,
    common} where the flip lists name "problem[start]" instances.  Only
    instances present in both files are compared (a suite change alters the
    key set; those appear in added/removed counts).
    """
    old, new = _load(old_path), _load(new_path)
    common = sorted(set(old) & set(new))
    to_fail = [k for k in common if old[k]["ok"] and not new[k]["ok"]]
    to_ok = [k for k in common if not old[k]["ok"] and new[k]["ok"]]
    name = lambda k: f"{k[0]}[{k[1]}]"  # noqa: E731
    return {
        "baseline": old_path,
        "common": len(common),
        "added": len(set(new) - set(old)),
        "removed": len(set(old) - set(new)),
        "to_fail": [name(k) for k in to_fail],
        "to_ok": [name(k) for k in to_ok],
        "nfev_mean_old": sum(old[k]["nfev"] for k in common) / max(len(common), 1),
        "nfev_mean_new": sum(new[k]["nfev"] for k in common) / max(len(common), 1),
    }


def main():
    if len(sys.argv) != 3:
        raise SystemExit(__doc__)
    d = diff_files(sys.argv[1], sys.argv[2])
    print(json.dumps(d, indent=2))
    if d["to_fail"] or d["to_ok"]:
        print(
            f"\n{len(d['to_fail'])} instance(s) regressed, "
            f"{len(d['to_ok'])} improved vs {d['baseline']}.",
            file=sys.stderr,
        )


if __name__ == "__main__":
    main()
