"""Forced-engagement probe for the IVF clamp raise (round-9 verdict
item 2): demonstrate, with measured numbers at locally feasible scale,
that the per-query serving cost under the OLD bound-clamp geometry grows
LINEARLY with corpus size while the raised-clamp √n geometry grows
sublinearly (~n^(3/4) while nprobe still derives, →√n once nprobe caps).

Method — a scaled-down miniature of the 4096→65536 raise, same recipe as
the round-8 SemDeDup split probe: the real clamp binds at n ≈ 16.8M
(old) which no local corpus reaches, so we contrast a stand-in OLD clamp
(32 cells — binding BELOW the smallest scale, exactly the bound-clamp
regime) against the true derived geometry (unbound at every local
scale). The MECHANISM is identical to the production constants — both
legs run `_sqrt_clamped(n, 8, clamp)` + `auto_ivf_nprobe` + the same
two-level Arrow probe + the same scored join — only the clamp constant
is scaled so engagement happens at 2k/20k/60k vectors instead of 16.8M.

Metrics per (scale, geometry) leg:
- candidates_per_query: rows of the scored join / |queries| — the exact
  per-query re-rank pool, deterministic (no timing noise), and THE
  quantity the clamp controls (nprobe·n/k).
- wall_serve_s: median wall of the scoring+topk phase over an eagerly
  materialized assignment (the serving shape: assignment is build-time
  in the persisted-index world). Executor is qe.toRdd().count() — NOT
  .count(), which Catalyst prunes through join-unique subtrees
  (BENCH_NOTES round 7).
Legs alternate old/new within each scale in one session so host drift
cancels (only in-session ratios are valid on this host).

Writes .stress/ivf_clamp_probe.json; the BENCH_NOTES round-9 table is
derived from it.

Usage: python tools/ivf_clamp_probe.py [--reps 3]
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

#: Stand-in for the OLD IVF_MAX_CELLS=4096: binds below the smallest
#: probed scale (√2000 ≈ 45 > 32), putting every old-geometry leg in
#: the bound-clamp regime — the regime n > 16.8M puts 4096 in.
OLD_CLAMP_MINIATURE = 32


def _median(xs: list[float]) -> float:
    s = sorted(xs)
    return s[len(s) // 2]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from spotify_tracks_etl_portfolio_spark.functions import (
        vec_dot,
        vec_norm_safe,
    )
    from spotify_tracks_etl_portfolio_spark.operators import similarity as sim
    from spotify_tracks_etl_portfolio_spark.operators.similarity import (
        per_group_topk,
    )
    from spotify_tracks_etl_portfolio_spark.sources.readers import (
        read_parquet_table,
    )

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .appName("ivf_clamp_probe")
        .getOrCreate()
    )
    scales = [
        ("sf0.1", "/root/testdata/sf0.1"),
        ("sf1", os.path.join(REPO, ".stress", "sf1")),
        ("sf3", os.path.join(REPO, ".stress", "sf3")),
    ]
    results = []
    for label, sf_dir in scales:
        if not os.path.exists(os.path.join(sf_dir, "embeddings.parquet")):
            print(f"skip {label}: no embeddings at {sf_dir}", file=sys.stderr)
            continue
        emb = read_parquet_table(spark, sf_dir, "embeddings")
        n = emb.count()
        queries = emb.orderBy(F.asc("vec_id")).limit(10).localCheckpoint()
        legs = []
        for geom, clamp in (
            ("old_clamped", OLD_CLAMP_MINIATURE),
            ("new_sqrt", sim.IVF_MAX_CELLS),
        ):
            k = sim._sqrt_clamped(n, 8, clamp)
            nprobe = sim.auto_ivf_nprobe(k)
            cents = sim.kmeans_centroids(
                emb, "vec_id", "embedding", k=k, iters=2
            )
            cent_rows = [
                (int(r["cell"]), [float(x) for x in r["embedding"]])
                for r in cents.collect()
            ]
            assign1 = sim.probe_cells_udf(cent_rows, nprobe=1)
            assigned = (
                sim.scan_parallelism(emb)
                .select(
                    "vec_id",
                    "embedding",
                    F.element_at(assign1(F.col("embedding")), 1).alias(
                        "cell"
                    ),
                    vec_norm_safe("embedding").alias("__vn"),
                )
                .localCheckpoint(eager=True)
            )
            probe_n = sim.probe_cells_udf(cent_rows, nprobe=nprobe)
            qcells = queries.select(
                F.col("vec_id").alias("query_id"),
                F.col("embedding").alias("__qv"),
                vec_norm_safe("embedding").alias("__qn"),
                F.explode(probe_n(F.col("embedding"))).alias("cell"),
            ).localCheckpoint(eager=True)

            def scored():
                return (
                    assigned.join(qcells, "cell")
                    .filter(F.col("vec_id") != F.col("query_id"))
                    .withColumn(
                        "cosine",
                        F.round(
                            vec_dot("embedding", "__qv")
                            / (F.col("__vn") * F.col("__qn")),
                            6,
                        ),
                    )
                )

            cand = scored().count()
            walls = []
            for _ in range(args.reps):
                out = per_group_topk(
                    scored(), "query_id", "cosine", "vec_id", 5, "rank"
                )
                t0 = time.monotonic()
                out._jdf.queryExecution().toRdd().count()
                walls.append(time.monotonic() - t0)
            legs.append(
                {
                    "geom": geom,
                    "clamp": clamp,
                    "k": k,
                    "nprobe": nprobe,
                    "candidates_per_query": cand / 10.0,
                    "wall_serve_s": round(_median(walls), 3),
                }
            )
        results.append({"sf": label, "n": n, "legs": legs})
        print(json.dumps(results[-1]), file=sys.stderr)

    out_path = os.path.join(REPO, ".stress", "ivf_clamp_probe.json")
    with open(out_path, "w") as fh:
        json.dump({"reps": args.reps, "scales": results}, fh, indent=1)
    print(json.dumps({"written": out_path, "scales": results}))


if __name__ == "__main__":
    main()
