"""SparkSession factory with scale-aware defaults.

The reference delegates all execution to MySQL/pandas and has no session
concept (SURVEY.md §4.1); here the session *is* the engine configuration
surface, so the scale knobs live in one place.

Local-mode notes: tests/bench run on ``local[N]`` where the driver is the
only JVM. On a real cluster the same builder applies — only
``master``/memory come from the environment.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Number of cores the driver harness gives us (local mode).
DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

#: The directory containing the engine package — what Python workers
#: must see on PYTHONPATH to resolve pandas-UDF closures.
REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def export_repo_pythonpath(repo_root: str = REPO_ROOT) -> None:
    """Export ``repo_root`` on PYTHONPATH for Python WORKERS (the
    multimodal/ANN pandas-UDF seams): workers resolve closure
    references by module name on their own interpreter, which sees
    PYTHONPATH only — a driver-side ``sys.path`` entry never reaches
    them. Idempotent; must run before the first session/worker spawns.
    The single implementation for every entry point (session factory,
    ``__spark_entry__``, ``tools/check_oracle.py``) so the bootstraps
    can't drift."""
    if repo_root not in os.environ.get("PYTHONPATH", "").split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            repo_root + os.pathsep + os.environ["PYTHONPATH"]
            if os.environ.get("PYTHONPATH")
            else repo_root
        )


def get_spark(
    app_name: str = "spotify_tracks_etl_portfolio_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for this engine.

    Scale posture (matters at 100 TB, harmless at sf0.001):
    - AQE on: runtime shuffle-partition coalescing + skew-join splitting,
      so a plan sized for the small SF re-plans itself at the large one.
    - ``shuffle.partitions`` ~ cores locally; on a cluster AQE's
      coalescing makes the static value a ceiling, not a commitment.
    - UTC session timezone: deterministic timestamp semantics and parity
      with the DuckDB oracle (UTC-naive timestamps).
    - Arrow on: vectorized pandas interchange for the few Pandas-UDF
      operators (similarity/multimodal paths).
    """
    export_repo_pythonpath()

    cpus = DEFAULT_CPUS
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # Some testdata vintages ship events.ts as INT64 TIMESTAMP(NANOS)
        # which Spark rejects natively; with this conf such columns read
        # as long and the readers convert via `div 1000` (exact, matches
        # DuckDB's ns→µs truncation). Harmless when the data is µs — the
        # readers probe the actual type and skip the conversion.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # InferFiltersFromGenerate turns explode(expensive_expr) into a
        # pushed-down `size(expensive_expr) > 0` filter whose alias gets
        # substituted with the FULL expression tree — the shingle-hash
        # pipeline then re-evaluates per row inside the filter (observed
        # 10× regression on the Jaccard self-join). The inferred filter
        # saves nothing for our always-non-empty arrays; exclude the rule.
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    if master:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_MASTER"):
        builder = builder.master(f"local[{cpus}]")
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
