"""Round-12 bucketed MinHash band artifact probe — quantify what
persisting the corpus band + shingle tables buys the cross-corpus
near-dedup SERVE (the r11 verdict item 2 wiring, measured): with a
FIXED batch (sf0.1 odd doc_ids), compute the flagged near-dup ids
(a) the retired way — re-banding the corpus per call
(cross_corpus_near_dup_ids) — and (b) the registered way — served from
the two persisted bucketed catalog tables (bands bucketed on bkey,
shingles on id_old; cross_corpus_near_dup_ids_served) — at the 1x
corpus and the .stress/sf1 10x replica. Broadcast is DISABLED for the
serve legs: at the gate scale the planner would broadcast the band
table and hide the exchange; at 100 TB it never could, and the claim
under test is the 100 TB shape — "a serve shuffles only the batch
side".

Also records, per leg, the bkey/id_old exchange counts and which scans
read Bucketed: true — the structural claim the timing rides on
(in-session ratios only; this host drifts 1.2-1.6x between sessions,
BENCH_NOTES round 4).

Executor: qe.toRdd().count() (NOT .count() — Catalyst prunes through
join-unique subtrees, BENCH_NOTES round 7).

Writes .stress/bucketed_bands_probe_r12.json.

Usage: python tools/bucketed_bands_probe.py [--reps 2]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ["PYTHONPATH"] = (
    REPO + os.pathsep + os.environ.get("PYTHONPATH", "")
)

JACCARD = 0.5


def _best(xs: list[float]) -> float:
    return min(xs)


def _run(df) -> float:
    t0 = time.monotonic()
    df._jdf.queryExecution().toRdd().count()
    return time.monotonic() - t0


def _plan_stats(df) -> dict:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return {
        "smj": "SortMergeJoin" in plan,
        "bkey_exchanges": len(
            re.findall(r"Exchange hashpartitioning\(bkey", plan)
        ),
        "id_old_exchanges": len(
            re.findall(r"Exchange hashpartitioning\(id_old#\d+L?, \d+\)", plan)
        ),
        "bucketed_scans": plan.count("Bucketed: true"),
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
        corpus_minhash_artifacts,
        cross_corpus_near_dup_ids,
        cross_corpus_near_dup_ids_served,
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

    scratch = os.path.join(REPO, ".stress", f"_bnd_probe_{os.getpid()}")
    os.makedirs(scratch, exist_ok=True)
    try:
        for scale, d in docs.items():
            corpus = d.filter(F.col("doc_id") % 2 == 0)
            res: dict = {}
            bands_df, shingles_df = corpus_minhash_artifacts(
                corpus, "doc_id", "text"
            )
            sh_tbl = f"probe_mh_shingles_{scale}"
            bd_tbl = f"probe_mh_bands_{scale}"
            t0 = time.monotonic()
            create_bucketed_table(
                spark, sh_tbl, shingles_df, "id_old", 32,
                os.path.join(scratch, f"sh_{scale}"),
            )
            create_bucketed_table(
                spark, bd_tbl, bands_df, "bkey", 32,
                os.path.join(scratch, f"bd_{scale}"),
            )
            res["build_bucketed_sec"] = round(time.monotonic() - t0, 3)

            def reband():
                return cross_corpus_near_dup_ids(
                    batch, corpus, "doc_id", "text", JACCARD
                )

            def served():
                return cross_corpus_near_dup_ids_served(
                    batch,
                    spark.table(bd_tbl),
                    spark.table(sh_tbl),
                    "doc_id",
                    "text",
                    JACCARD,
                )

            legs: dict = {"reband_per_call": [], "served_bucketed": []}
            for _ in range(args.reps):
                legs["reband_per_call"].append(_run(reband()))
                legs["served_bucketed"].append(_run(served()))
            for k, v in legs.items():
                res[k] = {
                    "best": round(_best(v), 3),
                    "samples": [round(x, 3) for x in v],
                }
            res["served_over_reband"] = round(
                res["served_bucketed"]["best"]
                / res["reband_per_call"]["best"],
                3,
            )
            res["plan_reband"] = _plan_stats(reband())
            res["plan_served"] = _plan_stats(served())
            out[scale] = res
        out["serve_scaleup_10x_over_1x"] = round(
            out["stress_10x"]["served_bucketed"]["best"]
            / out["base_1x"]["served_bucketed"]["best"],
            3,
        )
        out["reband_scaleup_10x_over_1x"] = round(
            out["stress_10x"]["reband_per_call"]["best"]
            / out["base_1x"]["reband_per_call"]["best"],
            3,
        )
    finally:
        shutil.rmtree(scratch, ignore_errors=True)

    dst = os.path.join(REPO, ".stress", "bucketed_bands_probe_r12.json")
    with open(dst, "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
