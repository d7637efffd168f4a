"""Query-plan surface: the named queries the engine exposes.

Each query is a ``QuerySpec``: a DataFrame-producing function
``(spark, sf_dir) -> DataFrame`` plus (where SQL-expressible) the exact
ANSI-SQL oracle DuckDB runs on the same parquet for the correctness gate.

Registry contract (driver harness, see ``__spark_entry__.py``):
- Output column NAMES must match between Spark and oracle (the driver
  sorts columns by name before hashing).
- Output VALUES must be bit-deterministic: exact DECIMAL sums cast to
  double, explicit tie-breaks on every LIMIT, rounded outputs for
  fixed-length float math (see ``functions/__init__.py``).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL; None → driver does rows-only check
    description: str = ""
    tags: tuple[str, ...] = ()


QUERIES: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None,
    description: str = "",
    tags: tuple[str, ...] = (),
):
    """Decorator: add a query function to the registry."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = QuerySpec(name, fn, oracle, description, tags)
        return fn

    return deco


def all_queries() -> dict[str, QuerySpec]:
    """Import every plan module (side-effect: registration) and return the
    full registry."""
    from spotify_tracks_etl_portfolio_spark.plans import (  # noqa: F401
        analytics,
        extensions,
        medallion_queries,
        relational,
    )

    return QUERIES
