"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The actual engine lives in ``spotify_tracks_etl_portfolio_spark/``;
queries are registered in ``spotify_tracks_etl_portfolio_spark/plans/``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# Make the engine importable for BOTH the driver process and its Python
# WORKERS. The driver may import this file from any cwd via sys.path
# surgery, but pandas-UDF workers (the multimodal/ANN seams) resolve
# closure references by MODULE NAME on their own interpreter, which only
# sees PYTHONPATH — a sys.path.insert in the driver never reaches them.
# Exporting PYTHONPATH before the first session/worker spawns closes the
# gap for every launch cwd.
_ROOT = os.path.dirname(os.path.abspath(__file__))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)

from spotify_tracks_etl_portfolio_spark.session import (  # noqa: E402
    export_repo_pythonpath,
)

export_repo_pythonpath(_ROOT)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the full medallion
    silver transform over ``events`` (two-phase stats → median impute →
    clamp → window dedup), SURVEY.md §3.2."""
    from spotify_tracks_etl_portfolio_spark.plans import all_queries

    spec = all_queries()["medallion_silver_events"]
    return spec.fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from spotify_tracks_etl_portfolio_spark.plans import all_queries

    return {name: spec.fn for name, spec in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted → rows-only check)."""
    from spotify_tracks_etl_portfolio_spark.plans import all_queries

    return {
        name: spec.oracle
        for name, spec in all_queries().items()
        if spec.oracle is not None
    }
