"""Round-10 ExactSubstr evidence probe — two measurements in one
session (in-session ratios only; this host drifts 1.2-1.6x between
sessions, BENCH_NOTES round 4):

A. Formulation A/B at 10x (verdict item 4): time the default
   groupBy+join formulation of exact_substring_dup_spans against the
   window-formulation twin at sf0.1 and at the .stress/sf1 10x replica,
   legs alternating within each scale. The two are bit-identical in
   output (pytest-pinned); this records that making groupBy+join the
   default costs nothing (or wins) at 10x — the formulations differ
   only in where the per-k-gram occurrence list materializes, and the
   stress corpus (every doc has 10 exact twins) is exactly the
   duplicated-k-gram-heavy case.

B. Incremental serve scaling (verdict item 3): with a FIXED batch
   (sf0.1 odd doc_ids), serve exact_substring_new_vs_corpus's operator
   against the persisted corpus k-gram artifact of the 1x corpus vs
   the 10x corpus. Claim under test: per-batch serve cost scales with
   the BATCH, not the corpus — the corpus-sized work (explode +
   distinct) is the separately-timed nightly BUILD. The 10x-replica
   corpus adds exact twins, so its DISTINCT k-gram artifact is nearly
   the same size as 1x; the build still explodes 10x the text, which
   is the cost the artifact amortizes away.

Executor: qe.toRdd().count() (NOT .count() — Catalyst prunes through
join-unique subtrees, BENCH_NOTES round 7).

Writes .stress/exactsubstr_r10_probe.json.

Usage: python tools/exactsubstr_r10_probe.py [--reps 2]
"""

from __future__ import annotations

import argparse
import json
import os
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--stress", default=os.path.join(REPO, ".stress", "sf1"))
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from spotify_tracks_etl_portfolio_spark.operators import dedup as dd

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    out: dict = {"reps": args.reps}

    docs = {
        "base": spark.read.parquet(f"{args.base}/documents.parquet"),
        "stress": spark.read.parquet(f"{args.stress}/documents.parquet"),
    }

    # --- A: formulation A/B -------------------------------------------
    ab: dict = {}
    for scale, d in docs.items():
        legs = {"join_default": [], "window_twin": []}
        for _ in range(args.reps):
            legs["join_default"].append(
                _run(dd.exact_substring_dup_spans(d, "doc_id", "text"))
            )
            legs["window_twin"].append(
                _run(
                    dd.exact_substring_dup_spans(
                        d, "doc_id", "text", use_window_formulation=True
                    )
                )
            )
        ab[scale] = {
            k: {"best": round(_best(v), 3), "samples": [round(x, 3) for x in v]}
            for k, v in legs.items()
        }
        ab[scale]["join_over_window"] = round(
            ab[scale]["join_default"]["best"]
            / ab[scale]["window_twin"]["best"],
            3,
        )
    out["formulation_ab"] = ab

    # --- B: incremental serve scaling ---------------------------------
    batch = docs["base"].filter(F.col("doc_id") % 2 == 1)
    inc: dict = {}
    for scale, d in docs.items():
        corpus = d.filter(F.col("doc_id") % 2 == 0)
        t0 = time.monotonic()
        path = os.path.join(
            REPO, ".stress", f"_xs_kgrams_{scale}_{os.getpid()}"
        )
        dd.corpus_kgram_set(corpus, "doc_id", "text").write.mode(
            "overwrite"
        ).parquet(path)
        build_s = time.monotonic() - t0
        kg = spark.read.parquet(path)
        serves = [
            _run(
                dd.incremental_substring_spans(batch, kg, "doc_id", "text")
            )
            for _ in range(args.reps)
        ]
        inc[scale] = {
            "build_s": round(build_s, 3),
            "artifact_kgrams": kg.count(),
            "serve_best": round(_best(serves), 3),
            "serve_samples": [round(x, 3) for x in serves],
        }
        import shutil

        shutil.rmtree(path, ignore_errors=True)
    inc["serve_ratio_10x_corpus"] = round(
        inc["stress"]["serve_best"] / inc["base"]["serve_best"], 3
    )
    inc["build_ratio_10x_corpus"] = round(
        inc["stress"]["build_s"] / inc["base"]["build_s"], 3
    )
    out["incremental_serve"] = inc

    dst = os.path.join(REPO, ".stress", "exactsubstr_r10_probe.json")
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    with open(dst, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
