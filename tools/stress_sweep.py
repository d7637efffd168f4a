"""Cross-scale stress sweep (round-4 verdict item 3): run the headline
set at sf0.1 AND the 10x key-offset sf1 replica (tools/make_stress_sf.py)
in ONE session, record wall times, the sf1/sf0.1 ratio, and any join-
strategy / AQE plan-shape changes between the scales.

The 100x-scale claims rest on plan gates; this gives one order of
magnitude of empirical confirmation. A healthy ratio for scan-bound
queries on local[32] is <= ~10 (linear in input); materially above that
flags a superlinear term worth reading the plan for. Numbers land in
.stress/stress_sweep.json and are summarized in BENCH_NOTES.md.

Timing note (round 6): execution switched from a noop-format write to
``qe.toRdd().count()`` so the profiled plan is the SAME finalized AQE
QueryExecution that was timed — absolute times are therefore not
directly comparable to STRESS_r05 (both mechanisms materialize every
row; the row-conversion overhead differs slightly), but base/stress
RATIOS are.

Usage: python tools/stress_sweep.py [--base /root/testdata/sf0.1]
       [--stress <repo>/.stress/sf1] [--runs 2] [--only name[,name...]]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PLAN_MARKERS = (
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "AQEShuffleRead",
    "skewed=true",
)


def execute_df(df):
    """Materialize the FULL plan through the DataFrame's OWN
    QueryExecution and return that QE. The previous noop-write approach
    executed a different QueryExecution, so under AQE the profiled df
    plan was never the finalized adaptive plan (AQEShuffleRead /
    skewed=true markers and runtime join-strategy swaps could be
    missed). ``qe.toRdd().count()`` runs every stage of this QE's
    AdaptiveSparkPlanExec, so ``qe.executedPlan()`` afterwards IS the
    final plan (asserted via isFinalPlan); nothing ships to the driver
    beyond per-partition counts."""
    qe = df._jdf.queryExecution()
    qe.toRdd().count()
    return qe


def plan_profile(qe) -> dict[str, int]:
    s = qe.executedPlan().toString()
    if "AdaptiveSparkPlan" in s and "isFinalPlan=true" not in s:
        raise AssertionError("profiled plan is not the finalized AQE plan")
    # count markers in the FINAL plan only — the AQE toString appends
    # an "== Initial Plan ==" section whose stats-estimated strategies
    # differ between scales even when the executed plan is identical,
    # which made the r07 plan_changed flags ambiguous (final+initial
    # were counted together through r07's first artifact)
    s = s.split("== Initial Plan ==")[0]
    return {m: s.count(m) for m in PLAN_MARKERS if s.count(m)}


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--stress", default=os.path.join(repo, ".stress", "sf1"))
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--only", default=None)
    ap.add_argument(
        "--out", default=os.path.join(repo, ".stress", "stress_sweep.json")
    )
    args = ap.parse_args()

    from bench import HEADLINE

    from spotify_tracks_etl_portfolio_spark.plans import all_queries
    from spotify_tracks_etl_portfolio_spark.session import get_spark

    # the frozen-toy twins left bench.py's HEADLINE (round-9 verdict
    # item 4: demonstrated-superlinear by design) but STAY in the
    # stress sweep — they are the A/B contrast against their registered
    # *_wide scale geometries
    names = list(HEADLINE) + [
        "simhash_near_dups",
        "embedding_lsh_near_dups",
        "cowtable_merge_roundtrip",
    ]
    if args.only:
        names = args.only.split(",")

    spark = get_spark("stress")
    # marker counting reads plan strings — don't let toString truncate
    # wide nodes out of the profile
    spark.conf.set("spark.sql.debug.maxToStringFields", "2000")
    specs = all_queries()
    specs["row_count_lineitem"].fn(spark, args.base).collect()  # warm-up

    results: dict[str, dict] = {}
    for name in names:
        spec = specs.get(name)
        if spec is None:
            continue
        row: dict = {}
        for label, sf_dir in (("base", args.base), ("stress", args.stress)):
            # drop the PY-side refs to earlier queries' DataFrames so
            # their localCheckpoint blocks actually become collectable
            # before the JVM gc — without this, ~30 queries of
            # checkpointed blocks pile up in the block manager and the
            # LATE queries' timings degrade (r07: semantic_dedup served
            # in 1.5 s in a fresh session vs 43 s late in the sweep)
            import gc as _gc

            _gc.collect()
            spark._jvm.System.gc()
            samples = []
            qe = None
            for _ in range(args.runs):
                t0 = time.time()
                qe = execute_df(spec.fn(spark, sf_dir))
                samples.append(round(time.time() - t0, 3))
            row[label] = {
                "best": min(samples),
                "samples": samples,
                "plan": plan_profile(qe),
            }
        row["ratio"] = round(
            row["stress"]["best"] / max(row["base"]["best"], 1e-9), 2
        )
        row["plan_changed"] = row["base"]["plan"] != row["stress"]["plan"]
        results[name] = row
        flag = " PLAN-CHANGED" if row["plan_changed"] else ""
        print(
            f"{name}: base {row['base']['best']}s stress "
            f"{row['stress']['best']}s ratio {row['ratio']}x{flag}",
            flush=True,
        )

    out_dir = os.path.dirname(args.out)
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
    with open(args.out, "w") as fh:
        json.dump(results, fh, indent=1)
    total_b = sum(r["base"]["best"] for r in results.values())
    total_s = sum(r["stress"]["best"] for r in results.values())
    print(
        f"TOTAL base {total_b:.1f}s stress {total_s:.1f}s "
        f"ratio {total_s / max(total_b, 1e-9):.2f}x -> {args.out}"
    )


if __name__ == "__main__":
    main()
