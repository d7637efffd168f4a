"""Simulate the driver's next 50-slot recording window.

The driver records the FIRST 50 entries of ``all_queries()`` each
round; registration order encodes the rotation policy (failures →
oracle upgrades → never-recorded → force-rerecord → stalest-first, see
``plans/__init__.py::all_queries``). This tool prints what the NEXT
CORRECTNESS artifact will contain given the artifacts currently on
disk, so a window-budget claim ("this round retires the r05 cohort")
is verifiable with one command instead of ad-hoc snippets.

    python tools/check_window.py            # table + cohort summary
    python tools/check_window.py --full     # every slot, not just 50

No Spark session is started (the registry imports are plan-free).
"""

from __future__ import annotations

import argparse
import collections
import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def recorded_rounds() -> dict[str, tuple[int, str]]:
    latest: dict[str, tuple[int, str]] = {}
    for p in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"_r(\d+)\.json$", p)
        rnd = int(m.group(1)) if m else 0
        for q, row in json.load(open(p)).items():
            if row.get("err") == "no_oracle":
                status = "no_oracle"
            elif row.get("hash_match") and row.get("rows_match"):
                status = "pass"
            else:
                status = "FAIL"
            prev = latest.get(q)
            if prev is None or rnd >= prev[0]:
                latest[q] = (rnd, status)
    return latest


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true")
    ap.add_argument("--slots", type=int, default=50)
    args = ap.parse_args()

    from spotify_tracks_etl_portfolio_spark.plans import all_queries

    ordered = list(all_queries())
    latest = recorded_rounds()
    window = ordered if args.full else ordered[: args.slots]

    cohorts: collections.Counter = collections.Counter()
    for i, name in enumerate(window):
        rec = latest.get(name)
        label = "never" if rec is None else f"r{rec[0]:02d}/{rec[1]}"
        cohorts[label] += 1
        print(f"{i:3d}  {label:12s}  {name}")
    print()
    print(f"registry: {len(ordered)} queries; window = first {len(window)}")
    print("cohorts:", dict(sorted(cohorts.items())))
    leftover = collections.Counter()
    for name in ordered[len(window):]:
        rec = latest.get(name)
        leftover["never" if rec is None else f"r{rec[0]:02d}"] += 1
    print("outside the window:", dict(sorted(leftover.items())))


if __name__ == "__main__":
    main()
