"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is executed twice: a warm-up pass is NOT used — we measure a
single cold run per query after one whole-pipeline warm query to absorb
JVM/codegen startup, which is what a steady-state cluster job looks like.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from spotify_tracks_etl_portfolio_spark.plans import all_queries
from spotify_tracks_etl_portfolio_spark.session import get_spark

# Headline set: flagship medallion + heaviest aggregation/join/window/
# extension queries — the ones whose plans matter at scale.
HEADLINE = [
    "medallion_silver_events",
    "q1_pricing_summary",
    "top10_customers_by_revenue",
    "regional_revenue",
    "user_session_windows",
    "hourly_event_rollup",
    "dedup_exact_documents",
    "document_fingerprints",
    "minhash_lsh_near_dups",
    "embedding_cosine_topk",
    "asof_click_purchase",
    "embedding_lsh_near_dups",
    "q6_forecast_revenue",
    "top3_customers_per_nation",
    "curate_training_documents",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")
    specs = all_queries()

    # warm-up: small query to absorb JVM + codegen startup cost
    specs["row_count_lineitem"].fn(spark, sf_dir).collect()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        spec = specs.get(name)
        if spec is None:
            continue
        t0 = time.time()
        df = spec.fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)

    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf),
            }
        )
    )


if __name__ == "__main__":
    main()
