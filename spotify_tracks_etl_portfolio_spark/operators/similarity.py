"""Similarity search over embedding columns (north star: ANN for
training-data pipelines).

Baseline: brute-force cosine top-k — broadcast the (small) query set
against the full corpus, rank per query with a window. This is the
exact answer and the oracle-checkable path.

Scale paths (approximate, rows-only checked):
- IVF: assign corpus vectors to their nearest centroid (equi-partition),
  probe only the query's nearest ``nprobe`` cells. Centroids here are a
  deterministic subset of the corpus (a k-means step would be the
  production upgrade); the *plumbing* — assignment join, cell-pruned
  search — is the part that matters at 100 TB.
- Random-hyperplane LSH: sign-bit sketch over fixed pseudo-random
  planes → Hamming blocking, same machinery as SimHash.

All vector math is ``zip_with``/``aggregate`` Column expressions
(JVM-side); no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from spotify_tracks_etl_portfolio_spark.functions import cosine_similarity, vec_norm


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    query_id_col: str | None = None,
) -> DataFrame:
    """Exact top-k neighbors per query by cosine (self excluded).

    Cosine is rounded to 6 dp BEFORE ranking so rank membership is
    deterministic across engines; ties then break to the smaller
    neighbor id. Queries are broadcast (they're the small side by
    construction); the corpus scan stays partition-parallel with no
    shuffle until the per-query top-k window.
    """
    qid = query_id_col or id_col
    q = queries.select(
        F.col(qid).alias("query_id"), F.col(vec_col).alias("__qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", F.round(cosine_similarity("__cv", "__qv"), 6))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", F.col("rank").cast("long"))
    )


def ivf_assign(
    corpus: DataFrame, centroids: DataFrame, id_col: str, vec_col: str
) -> DataFrame:
    """Assign every corpus vector to its nearest centroid (max cosine,
    ties to smaller centroid id): broadcast-join + per-vector argmax
    window. Output: (id, cell, vec)."""
    cent = centroids.select(
        F.col(id_col).alias("cell"), F.col(vec_col).alias("__centv")
    )
    scored = corpus.select(
        id_col, F.col(vec_col).alias("__v")
    ).crossJoin(F.broadcast(cent)).withColumn(
        "__sim", F.round(cosine_similarity("__v", "__centv"), 6)
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("__sim"), F.asc("cell"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(F.col(id_col), "cell", F.col("__v").alias(vec_col))
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    nprobe: int = 2,
) -> DataFrame:
    """IVF approximate top-k: search only the ``nprobe`` cells nearest to
    each query. Recall < 1.0 by design; the win is touching
    nprobe/n_cells of the corpus."""
    assigned = ivf_assign(corpus, centroids, id_col, vec_col)
    cent = centroids.select(
        F.col(id_col).alias("cell"), F.col(vec_col).alias("__centv")
    )
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv"))
    qcells = (
        q.crossJoin(F.broadcast(cent))
        .withColumn("__sim", F.round(cosine_similarity("__qv", "__centv"), 6))
        .withColumn(
            "__rn",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.desc("__sim"), F.asc("cell")
                )
            ),
        )
        .filter(F.col("__rn") <= nprobe)
        .select("query_id", "cell", "__qv")
    )
    scored = (
        assigned.join(qcells, "cell")
        .filter(F.col(id_col) != F.col("query_id"))
        .withColumn("cosine", F.round(cosine_similarity(vec_col, "__qv"), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            "cosine",
            F.col("rank").cast("long"),
        )
    )


def normalize_vectors(df: DataFrame, vec_col: str) -> DataFrame:
    """L2-normalize an embedding column (zip_with over the array)."""
    norm = vec_norm(vec_col)
    return df.withColumn(
        vec_col,
        F.transform(F.col(vec_col), lambda x: x.cast("double") / norm),
    )
