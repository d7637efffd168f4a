"""In-round bench regression guard.

Runs ``bench.py`` fresh and compares per-query timings against the
recorded baseline (``BENCH_r01.json`` — the self-recorded round-1
numbers per BASELINE.md's 2× rule), so a regression is caught the round
it happens, not by the next judge.

    python tools/check_bench.py [--baseline BENCH_r01.json] [--factor 2.0]
    python tools/check_bench.py --fresh fresh.json   # compare a saved run

Exit 0 = every query within factor× of baseline (new queries are
reported informationally); exit 1 = at least one regression.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_baseline(path: str) -> dict:
    with open(path) as f:
        raw = json.load(f)
    # driver artifact wraps the bench line under "parsed"; a raw bench
    # line is also accepted
    return raw.get("parsed", raw)


def run_bench() -> dict:
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True,
        text=True,
        cwd=REPO,
    )
    for line in out.stdout.splitlines():
        line = line.strip()
        if line.startswith("{") and '"metric"' in line:
            return json.loads(line)
    raise SystemExit(
        f"bench.py produced no JSON line\nstdout:\n{out.stdout[-2000:]}"
        f"\nstderr:\n{out.stderr[-2000:]}"
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--baseline", default=os.path.join(REPO, "BENCH_r01.json"))
    ap.add_argument("--factor", type=float, default=2.0)
    ap.add_argument(
        "--fresh", default=None, help="path to a saved bench JSON line instead of re-running"
    )
    args = ap.parse_args()

    base = load_baseline(args.baseline)
    if args.fresh:
        fresh = load_baseline(args.fresh)
    else:
        fresh = run_bench()

    base_q = base.get("queries", {})
    fresh_q = fresh.get("queries", {})
    regressions = []
    for name, b in sorted(base_q.items()):
        f = fresh_q.get(name)
        if f is None:
            print(f"MISSING  {name}: in baseline but not in fresh run")
            regressions.append(name)
            continue
        ratio = f / b if b else float("inf")
        flag = "REGRESS" if ratio > args.factor else "ok"
        print(f"{flag:8} {name}: {f:.3f}s vs baseline {b:.3f}s ({ratio:.2f}x)")
        if ratio > args.factor:
            regressions.append(name)
    for name in sorted(set(fresh_q) - set(base_q)):
        print(f"new      {name}: {fresh_q[name]:.3f}s (no baseline yet)")

    total_b, total_f = base.get("value"), fresh.get("value")
    if total_b and total_f:
        print(
            f"total    {total_f:.3f}s vs baseline {total_b:.3f}s "
            f"({total_f / total_b:.2f}x)"
        )
    if regressions:
        print(f"\nFAIL: {len(regressions)} regression(s) beyond {args.factor}x: "
              + ", ".join(regressions))
        return 1
    print(f"\nOK: all queries within {args.factor}x of baseline")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
