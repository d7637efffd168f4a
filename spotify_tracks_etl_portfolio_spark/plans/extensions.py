"""LLM-data-pipeline extension queries: dedup, text analysis, similarity
search over ``documents`` / ``embeddings`` (BASELINE.json north star;
SURVEY.md §7 M4).

Implementations live in ``operators/{dedup,text,similarity}.py``; this
module registers the oracle-checked query surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spotify_tracks_etl_portfolio_spark.functions import rolling_hash, token_count
from spotify_tracks_etl_portfolio_spark.plans import register
from spotify_tracks_etl_portfolio_spark.sources.readers import read_parquet_table


@register(
    "dedup_exact_documents",
    oracle="""
SELECT min(doc_id) AS doc_id, CAST(count(*) AS BIGINT) AS n_copies
FROM documents
GROUP BY text
""",
    description="Exact dedup: hash-groupBy on content, keep lowest doc_id "
    "(one shuffle on the content hash; at scale group by xxhash64(text) "
    "instead of the full text)",
    tags=("extension", "dedup"),
)
def dedup_exact_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_parquet_table(spark, sf_dir, "documents")
    return docs.groupBy("text").agg(
        F.min("doc_id").alias("doc_id"), F.count(F.lit(1)).alias("n_copies")
    ).select("doc_id", "n_copies")


@register(
    "text_stats_documents",
    oracle="""
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_chars,
       CAST(CASE WHEN trim(text) = '' THEN 0
                 ELSE len(string_split_regex(trim(text), '\\s+')) END AS BIGINT) AS n_tokens,
       CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
                 t -> t IN ('the', 'a', 'of', 'and', 'to'))) AS BIGINT) AS n_stopwords
FROM documents
""",
    description="Text quality stats: char count, whitespace token count, "
    "stopword count — all JVM-side array ops, no UDF",
    tags=("extension", "text"),
)
def text_stats_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_parquet_table(spark, sf_dir, "documents")
    toks = F.split(F.trim("text"), r"\s+")
    stop = F.filter(toks, lambda t: t.isin("the", "a", "of", "and", "to"))
    return docs.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars"),
        token_count("text").cast("long").alias("n_tokens"),
        F.when(F.trim("text") == "", F.lit(0))
        .otherwise(F.size(stop))
        .cast("long")
        .alias("n_stopwords"),
    )


@register(
    "document_fingerprints",
    oracle="""
SELECT doc_id,
       list_reduce(
         list_prepend(CAST(0 AS BIGINT),
                      list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT))),
         (a, b) -> (a * 31 + b) % 1000000007
       ) AS fingerprint
FROM documents
""",
    description="Document fingerprint: polynomial rolling hash over the "
    "characters, overflow-free mod 1e9+7 (deterministic across engines)",
    tags=("extension", "text"),
)
def document_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_parquet_table(spark, sf_dir, "documents")
    return docs.select("doc_id", rolling_hash("text").alias("fingerprint"))
