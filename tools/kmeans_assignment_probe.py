"""K-means TRAINING-assignment scale probe (round-7 verdict item 3).

Round 6 closed with the caveat "SemDeDup assignment is n·k GEMM ⇒
needs a coarse-quantizer tree past ~10⁶ vectors" (ROUND6.md item 8),
but the r06 two-level probe ALREADY serves the training path:
``kmeans_centroids`` assigns every Lloyd round through
``probe_cells_udf``, which routes past ``FLAT_PROBE_MAX_K`` centroids
into the deterministic coarse quantizer (√k coarse cells, nprobe-2
scan) — the caveat was stale. This probe certifies it empirically on a
VECTOR-COUNT synthetic (the sf replicas stop at 60 k vectors; the n·k
regime needs k ∝ n in the hundreds): for n with k = auto_semdedup_k(n)
= n/512, it times one full assignment pass through

  (a) the production path (two-level past 64 centroids), and
  (b) the flat n·k GEMM (FLAT_PROBE_MAX_K monkeypatched to ∞),

on identical deterministic synthetic vectors. Expected growth per n
doubling: flat ~4x (n·k, k ∝ n), two-level ~2.8x (n·√k) — the gap is
the caveat being closed. Determinism: both paths are pure functions of
the vectors (seeded data, zero-RNG probes); the registered queries'
gate-scale geometry (k=8) stays on the bit-exact flat path either way,
so oracle rows are untouched by construction.

Usage: python tools/kmeans_assignment_probe.py [--ns 65536,131072,262144]
Numbers land in .stress/kmeans_assignment_probe.json and are
summarized in BENCH_NOTES.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DIM = 64


def synth(spark, n: int):
    """Deterministic clustered synthetic vectors: ~n/512 latent centers
    (matching the auto-k target cell population), each vector = its
    center plus a small id-derived perturbation — Column-math only, so
    generation is cheap and identical on every run."""
    from pyspark.sql import functions as F

    centers = max(1, n // 512)
    df = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(DIM - 1)),
            lambda d: (
                F.cos((F.col("id") % centers) * (d + 1) * 0.7)
                + (F.pmod(F.col("id") * 31 + d * 17, F.lit(997)) - 498)
                / F.lit(49700.0)
            ),
        ).alias("embedding"),
    )
    return df.localCheckpoint(eager=True)


def time_assignment(df, cent_rows) -> float:
    from pyspark.sql import functions as F

    from spotify_tracks_etl_portfolio_spark.operators import similarity as sim

    probe = sim.probe_cells_udf(cent_rows, nprobe=1)
    t0 = time.time()
    (
        df.select(F.element_at(probe(F.col("embedding")), 1).alias("c"))
        .groupBy("c")
        .count()
        .collect()
    )
    return time.time() - t0


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ap = argparse.ArgumentParser()
    ap.add_argument("--ns", default="65536,131072,262144")
    ap.add_argument(
        "--out",
        default=os.path.join(repo, ".stress", "kmeans_assignment_probe.json"),
    )
    args = ap.parse_args()

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")

    from spotify_tracks_etl_portfolio_spark.operators import similarity as sim
    from spotify_tracks_etl_portfolio_spark.session import get_spark

    results = []
    for n in [int(x) for x in args.ns.split(",")]:
        # fresh context per scale point: the per-n localCheckpoint
        # blocks otherwise accumulate in the block manager across the
        # sweep and GC churn poisons the larger points' timings
        spark = get_spark("kmeans-assignment-probe")
        k = sim.auto_semdedup_k(n)
        df = synth(spark, n)
        # seed centroids exactly as kmeans_centroids does (smallest ids)
        seed = (
            df.orderBy("vec_id").limit(k).collect()
        )
        cent_rows = [
            (i, [float(x) for x in r["embedding"]])
            for i, r in enumerate(seed)
        ]
        # warm with one full untimed pass: Python worker spawn, Arrow
        # serializer init, and whole-stage-codegen compilation all land
        # here instead of in the first sample (fresh context per n)
        time_assignment(df, cent_rows)

        two_level = min(
            time_assignment(df, cent_rows) for _ in range(3)
        )
        orig = sim.FLAT_PROBE_MAX_K
        sim.FLAT_PROBE_MAX_K = 1 << 30
        try:
            time_assignment(df, cent_rows)  # rebuilt probe → new warm
            flat = min(time_assignment(df, cent_rows) for _ in range(3))
        finally:
            sim.FLAT_PROBE_MAX_K = orig
        row = {
            "n": n,
            "k": k,
            "two_level_sec": round(two_level, 2),
            "flat_sec": round(flat, 2),
            "flat_over_two_level": round(flat / two_level, 2),
        }
        print(row, flush=True)
        results.append(row)
        spark.stop()

    for prev, cur in zip(results, results[1:]):
        cur["two_level_growth_vs_prev"] = round(
            cur["two_level_sec"] / prev["two_level_sec"], 2
        )
        cur["flat_growth_vs_prev"] = round(
            cur["flat_sec"] / prev["flat_sec"], 2
        )
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
