"""Round-11 bucketed k-gram artifact probe — quantify what bucketing
the persisted corpus k-gram set buys the incremental-ExactSubstr SERVE
(the r10 verdict item 4 wiring, measured): with a FIXED batch (sf0.1
odd doc_ids), serve `incremental_substring_spans` against the corpus
k-gram artifact persisted (a) as plain parquet and (b) as a bucketed
catalog table (32 buckets on kg — the registered layout), at the 1x corpus and the .stress/sf1
10x replica. Broadcast is DISABLED for the serve legs: at the gate
scale the planner would happily broadcast the k-gram set and hide the
exchange; at 100 TB it never could, and the claim under test is the
100 TB shape — "the semi-join shuffles only the batch side".

Also records, per leg, the number of Exchange nodes under the
semi-join and which side scans Bucketed: true — the structural claim
the timing rides on (in-session ratios only; this host drifts 1.2-1.6x
between sessions, BENCH_NOTES round 4).

Executor: qe.toRdd().count() (NOT .count() — Catalyst prunes through
join-unique subtrees, BENCH_NOTES round 7).

Writes .stress/bucketed_kgram_probe_r11.json.

Usage: python tools/bucketed_kgram_probe.py [--reps 2]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ["PYTHONPATH"] = (
    REPO + os.pathsep + os.environ.get("PYTHONPATH", "")
)


def _best(xs: list[float]) -> float:
    return min(xs)


def _run(df) -> float:
    t0 = time.monotonic()
    df._jdf.queryExecution().toRdd().count()
    return time.monotonic() - t0


def _join_plan_stats(df) -> dict:
    plan = df._jdf.queryExecution().executedPlan().toString()
    if "SortMergeJoin" in plan:
        sub = plan[plan.index("SortMergeJoin"):]
    else:
        sub = plan
    return {
        "smj": "SortMergeJoin" in plan,
        "exchanges_under_join": sub.count("Exchange"),
        "bucketed_scan": "Bucketed: true" in sub,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--stress", default=os.path.join(REPO, ".stress", "sf1"))
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from spotify_tracks_etl_portfolio_spark.operators.dedup import (
        corpus_kgram_set,
        incremental_substring_spans,
    )
    from spotify_tracks_etl_portfolio_spark.sources.catalog import (
        create_bucketed_table,
    )

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    out: dict = {"reps": args.reps, "broadcast": "disabled for serve legs"}

    docs = {
        "base_1x": spark.read.parquet(f"{args.base}/documents.parquet"),
        "stress_10x": spark.read.parquet(f"{args.stress}/documents.parquet"),
    }
    batch = docs["base_1x"].filter(F.col("doc_id") % 2 == 1)

    scratch = os.path.join(REPO, ".stress", f"_bkg_probe_{os.getpid()}")
    os.makedirs(scratch, exist_ok=True)
    try:
        for scale, d in docs.items():
            corpus = d.filter(F.col("doc_id") % 2 == 0)
            kg = corpus_kgram_set(corpus, "doc_id", "text")
            res: dict = {}
            # plain parquet artifact
            plain_path = os.path.join(scratch, f"plain_{scale}")
            t0 = time.monotonic()
            kg.write.mode("overwrite").parquet(plain_path)
            res["build_plain_sec"] = round(time.monotonic() - t0, 3)
            # bucketed catalog table (the registered serve layout)
            tbl = f"probe_kgrams_{scale}"
            t0 = time.monotonic()
            create_bucketed_table(
                spark, tbl, kg, "kg", 32,
                os.path.join(scratch, f"bkt_{scale}"),
            )
            res["build_bucketed_sec"] = round(time.monotonic() - t0, 3)
            legs: dict = {"plain": [], "bucketed": []}
            for _ in range(args.reps):
                legs["plain"].append(
                    _run(
                        incremental_substring_spans(
                            batch, spark.read.parquet(plain_path),
                            "doc_id", "text",
                        )
                    )
                )
                legs["bucketed"].append(
                    _run(
                        incremental_substring_spans(
                            batch, spark.table(tbl), "doc_id", "text"
                        )
                    )
                )
            for k, v in legs.items():
                res[k] = {
                    "best": round(_best(v), 3),
                    "samples": [round(x, 3) for x in v],
                }
            res["bucketed_over_plain"] = round(
                res["bucketed"]["best"] / res["plain"]["best"], 3
            )
            res["plan_plain"] = _join_plan_stats(
                incremental_substring_spans(
                    batch, spark.read.parquet(plain_path), "doc_id", "text"
                )
            )
            res["plan_bucketed"] = _join_plan_stats(
                incremental_substring_spans(
                    batch, spark.table(tbl), "doc_id", "text"
                )
            )
            out[scale] = res
    finally:
        shutil.rmtree(scratch, ignore_errors=True)

    dst = os.path.join(REPO, ".stress", "bucketed_kgram_probe_r11.json")
    with open(dst, "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
