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

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from spotify_tracks_etl_portfolio_spark.sources.readers import read_parquet_memo

from spotify_tracks_etl_portfolio_spark.functions import (
    scan_parallelism,
    vec_dot,
    vec_norm_safe,
)

#: Pre-top-k fanout buckets for the two-stage per-query rank: the
#: candidate stream first keeps a per-(query, bucket) top-k — group
#: cardinality query_count × this, so the heavy sort parallelizes —
#: then the tiny survivor set (≤ queries × buckets × k rows) takes the
#: exact global rank. 32 matches the test session's core count; at
#: cluster scale raise it toward executor-cores × executors / queries.
TOPK_FANOUT_BUCKETS = 32


def per_group_topk(
    scored: DataFrame,
    group_col: str,
    order_col: str,
    tie_col: str | tuple[str, ...] | list[str],
    k: int,
    rank_col: str,
    buckets: int = TOPK_FANOUT_BUCKETS,
    descending: bool = True,
) -> DataFrame:
    """Exact top-k rows per group, ranked by (``order_col`` DESC,
    ``tie_col`` ASC), WITHOUT the one-task-per-group reduction tail: a
    single ``Window.partitionBy(group)`` rank-filter does get Spark's
    map-side WindowGroupLimit prune (each input task forwards only its
    own top-k per group), but everything that survives —
    input_partitions × k rows per group — still merges in ONE task per
    group, and AQE cannot split skewed window partitions; with 10
    queries over a 10⁵-partition corpus scan that serial tail IS the
    query. Stage 1 buckets candidates by a hash of the tie column and
    keeps each (group, bucket) top-k — any global top-k row has at most
    k−1 rows above it globally, hence at most k−1 in its own bucket, so
    it always survives — parallelizing the reduction ``buckets``-wide
    (WindowGroupLimit applies per (group, bucket) too); stage 2 ranks
    the ≤ groups × buckets × k survivors exactly. Same rows, same ranks
    as the single window; measured ~1% overhead at sf0.1.
    ``descending=False`` ranks by (order ASC, tie ASC) — the bottom-k —
    with the identical survival argument.

    EXACTNESS REQUIREMENT (round-7 advice item): the comparator
    (order, *ties) must be TOTAL within each group — the combined
    ``tie_col`` column(s) must be unique per group. With duplicate
    (order, ties) rows, equal rows hash into ONE bucket and stage 1
    keeps an arbitrary k of them, which can differ nondeterministically
    from the single window's arbitrary pick. ``tie_col`` accepts a
    tuple/list of columns to build a provably total tie-break (e.g.
    ``("category", "row_id")`` when one column alone is not unique);
    every call site in this package passes a per-group primary key
    (neighbor/customer/doc id)."""
    ties = [tie_col] if isinstance(tie_col, str) else list(tie_col)
    lead = F.desc(order_col) if descending else F.asc(order_col)
    tie_order = [F.asc(c) for c in ties]
    w1 = Window.partitionBy(group_col, "__tb").orderBy(lead, *tie_order)
    pre = (
        scored.withColumn(
            "__tb",
            F.pmod(F.xxhash64(*[F.col(c) for c in ties]), F.lit(buckets)),
        )
        .withColumn("__pr", F.row_number().over(w1))
        .filter(F.col("__pr") <= k)
        .drop("__tb", "__pr")
    )
    w2 = Window.partitionBy(group_col).orderBy(lead, *tie_order)
    return pre.withColumn(rank_col, F.row_number().over(w2)).filter(
        F.col(rank_col) <= k
    )


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
    shuffle until the two-stage per-query top-k rank
    (``per_group_topk`` — the heavy sort parallelizes over
    query × bucket, not one task per query). Norms are computed ONCE
    per vector before the pair join — per pair only the dot product
    remains (3× less higher-order-function work than norm-per-pair).
    """
    qid = query_id_col or id_col
    q = queries.select(
        F.col(qid).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        vec_norm_safe(vec_col).alias("__qn"),
    )
    # scan_parallelism: the pair-scoring HOFs below run on the corpus
    # scan's partitioning (broadcast join inserts no shuffle) — rescue
    # the unsplittable-small-file layout (no-op at real scale)
    c = scan_parallelism(corpus).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        vec_norm_safe(vec_col).alias("__cn"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            F.round(vec_dot("__cv", "__qv") / (F.col("__cn") * F.col("__qn")), 6),
        )
    )
    return per_group_topk(
        scored, "query_id", "cosine", "neighbor_id", k, "rank"
    ).select("query_id", "neighbor_id", "cosine", F.col("rank").cast("long"))


def ivf_assign(
    corpus: DataFrame, centroids: DataFrame, id_col: str, vec_col: str
) -> DataFrame:
    """Assign every corpus vector to its nearest centroid (max cosine,
    ties to smaller centroid id): broadcast-join + per-vector argmax
    window. Output: (id, cell, vec)."""
    cent = centroids.select(
        F.col(id_col).alias("cell"),
        F.col(vec_col).alias("__centv"),
        vec_norm_safe(vec_col).alias("__centn"),
    )
    scored = corpus.select(
        id_col, F.col(vec_col).alias("__v"), vec_norm_safe(vec_col).alias("__vn")
    ).crossJoin(F.broadcast(cent)).withColumn(
        "__sim",
        F.round(vec_dot("__v", "__centv") / (F.col("__vn") * F.col("__centn")), 6),
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("__sim"), F.asc("cell"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(F.col(id_col), "cell", F.col("__v").alias(vec_col))
    )


#: Centroid count past which the Arrow probe switches from the flat
#: n×k GEMM to the two-level coarse-quantizer scan. 64 keeps every
#: registered query (k ≤ 16) and every frozen-geometry test on the
#: bit-exact flat path; above it the flat scan's n·k cost is what made
#: auto-k SemDeDup quadratic (k ∝ n ⇒ n²/512 GEMM, BENCH_NOTES r6).
FLAT_PROBE_MAX_K = 64
#: Coarse cells probed per vector in the two-level path. 2 is the
#: standard IVF guard against nearest-fine-centroid-in-neighboring-
#: coarse-cell misses; exact duplicates always agree regardless.
COARSE_NPROBE = 2


def _book_matrix(cent_rows: list[tuple[int, list[float]]]):
    """(cells, unit_matrix) prep shared by every flat probe
    (``probe_cells_udf``, ``_grouped_probe_udf``, ``pq_encode``):
    centroids sorted by cell id so stable argsort resolves ties to the
    smallest cell, norms clamped so an all-zero vector/centroid gets
    similarity 0 and a defined assignment instead of NaN everywhere.
    One implementation keeps the three probes provably in sync."""
    import numpy as np

    cents = sorted(cent_rows)
    cells = np.array([c for c, _ in cents], dtype=np.int64)
    m = np.array([v for _, v in cents], dtype=np.float64)
    mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
    return cells, mn


def probe_cells_fn(cent_rows: list[tuple[int, list[float]]], nprobe: int):
    """The numpy core of :func:`probe_cells_udf`: a callable
    ``(n, dim) float64 matrix -> (n, nprobe) int64 cell matrix``. One
    implementation serves BOTH the Arrow-batched executor UDF and the
    driver-side probe of a bounded, already-collected query batch
    (``ivfpq_query_index``'s literal serve path — r14 optimization
    round): the exact same numpy ops run either place, so the two call
    sites are bit-identical by construction."""
    import numpy as np

    cells, mn = _book_matrix(cent_rows)

    if len(cells) <= FLAT_PROBE_MAX_K:

        def run(x):
            xn = x / np.maximum(
                np.linalg.norm(x, axis=1, keepdims=True), 1e-12
            )
            sims = np.round(xn @ mn.T, 6)
            order = np.argsort(-sims, axis=1, kind="stable")[:, :nprobe]
            return cells[order]

        return run

    # ---- two-level path: deterministic coarse k-means OVER the fine
    # centroids (driver-side numpy; first-√k init, 3 Lloyd rounds,
    # cosine assignment with smallest-index ties, empty cells keep
    # their previous coarse centroid) ----
    n_coarse = int(np.ceil(np.sqrt(len(cells))))
    coarse = mn[:n_coarse].copy()
    for _ in range(3):
        cn = coarse / np.maximum(
            np.linalg.norm(coarse, axis=1, keepdims=True), 1e-12
        )
        sims = np.round(mn @ cn.T, 6)
        # np.argmax returns the FIRST maximal index — smallest-index ties
        assign = np.argmax(sims, axis=1)
        for ci in range(n_coarse):
            members = mn[assign == ci]
            if len(members):
                coarse[ci] = members.mean(axis=0)
    cn = coarse / np.maximum(
        np.linalg.norm(coarse, axis=1, keepdims=True), 1e-12
    )
    sims = np.round(mn @ cn.T, 6)
    assign = np.argmax(sims, axis=1)
    member_idx = [np.where(assign == ci)[0] for ci in range(n_coarse)]

    def run2(x):
        xn = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        csims = np.round(xn @ cn.T, 6)
        corder = np.argsort(-csims, axis=1, kind="stable")[:, :COARSE_NPROBE]
        out = np.empty((len(xn), nprobe), dtype=np.int64)
        # group rows by their probed coarse-cell tuple: one small GEMM
        # per group against just those cells' fine members
        keys = [tuple(row) for row in corder]
        groups: dict[tuple, list[int]] = {}
        for i, key in enumerate(keys):
            groups.setdefault(key, []).append(i)
        for key, rows in groups.items():
            cand = np.unique(np.concatenate([member_idx[ci] for ci in key]))
            if len(cand) < nprobe:  # degenerate coarse cells: full scan
                cand = np.arange(len(cells))
            fsims = np.round(xn[rows] @ mn[cand].T, 6)
            order = np.argsort(-fsims, axis=1, kind="stable")[:, :nprobe]
            out[rows] = cells[cand[order]]
        return out

    return run2


def probe_cells_udf(cent_rows: list[tuple[int, list[float]]], nprobe: int):
    """Arrow-batched cell-probe: cosine of each vector against the (tiny,
    closure-captured) centroid matrix as ONE numpy matmul per batch,
    returning the ``nprobe`` best cells. This is the sanctioned Pandas-UDF
    case — a dense 64×k GEMM per row that interpreted Column HOFs evaluate
    element-by-element (~20× slower measured). Ties resolve to the
    smallest cell (stable argsort over ascending cells), matching the
    exact path's (desc sim, asc cell) ordering; similarities are rounded
    to 6 dp before ranking, also matching.

    Past ``FLAT_PROBE_MAX_K`` centroids the probe is two-level (a
    deterministic coarse quantizer over the centroids themselves, then
    a scan of only the best ``COARSE_NPROBE`` coarse cells' members):
    per-vector cost drops from k to ~2·√k dot products, which is what
    keeps k ∝ n SemDeDup assignment near-linear instead of n²/512.
    The two-level result is approximate in WHICH cell a borderline
    vector lands (identical vectors still always land identically —
    the assignment stays a pure deterministic function of the vector),
    exact in everything downstream: zero RNG, so re-runs reproduce the
    identical output. The numpy math lives in :func:`probe_cells_fn`
    (shared with the driver-side bounded-batch probe)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    run = probe_cells_fn(cent_rows, nprobe)

    # no type hints: module-level `from __future__ import annotations`
    # stringifies them and pyspark can't resolve function-local `pd`
    @pandas_udf("array<long>")
    def probe(vs):
        x = np.stack(vs.to_numpy()).astype(np.float64)
        return pd.Series(list(run(x)))

    return probe


def _exploded_assignment(df: DataFrame, probe, vec_col: str) -> DataFrame:
    """(cell, dim, value) stream for the k-means update step. The probe
    MUST land in its own projection BEFORE the posexplode: with both in
    one select, ExtractPythonUDFs plants ArrowEvalPython ABOVE the
    Generate, so the probe re-evaluates on every exploded (cell, dim)
    row — dim× redundant Python work (measured 24.1s vs 0.9s per
    update step at 60k×64 vectors, k=118). Plan-gated by
    ``test_kmeans_update_probes_before_the_explode``."""
    return df.select(
        F.element_at(probe(F.col(vec_col)), 1).alias("__cell"),
        vec_col,
    ).select("__cell", F.posexplode(vec_col).alias("__d", "__x"))


#: Fixed-point scale for the order-independent Lloyd mean update:
#: 9 decimal places, matching the embedding_dimension_stats DECIMAL(28,9)
#: rounding.
MEAN_SCALE = 1_000_000_000


def _fixed_point_mean(col: Column) -> Column:
    """Partition-order-INDEPENDENT mean for the Lloyd update (round-7
    advice item): values round to 9-dp fixed-point BIGINTs whose sum is
    exact, so centroids are bit-identical under any partitioning —
    where a float ``avg`` depends on partial-sum order. The long sum is
    the vectorized fast path (~4× cheaper than the equivalent
    DECIMAL(28,9) sum, measured 0.8 s vs 3.4 s per update at 20 k×64);
    the final ``sum → double, /scale, /count`` chain is plain IEEE ops
    the DuckDB oracle replays verbatim. Magnitude contract: needs
    max|x|·1e9·rows_per_cell < 2^63 — embeddings are O(1)-bounded, and
    an ANSI long-sum overflow raises loudly, never wraps silently."""
    return (
        F.sum(F.round(col * MEAN_SCALE).cast("long")).cast("double")
        / F.lit(float(MEAN_SCALE))
        / F.count(F.lit(1))
    )


def kmeans_centroids(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 16,
    iters: int = 3,
) -> DataFrame:
    """Deterministic distributed Lloyd's k-means over an embedding
    column, expressed entirely in DataFrame ops (the iterative-algorithm
    pattern: the loop lives on the driver, each step is a distributed
    job; nothing is collected except the implicit broadcast of k
    centroids per iteration).

    - init: the k rows with the smallest ids (deterministic, no RNG);
    - assign: the Arrow-batched numpy probe (``probe_cells_udf`` with
      nprobe=1) — same 6-dp rounding and smallest-cell tie order as
      ``ivf_assign``, ~20× faster than the Column-HOF path;
    - update: per-cell per-dimension mean via posexplode + one hash
      aggregation, arrays rebuilt with sort_array(collect_list) —
      shuffle carries (cell, dim, partial sums), never vectors;
    - empty cells keep their previous centroid (left join + coalesce).

    Output: (cell, <vec_col>) — feed straight into ``ivf_topk``.
    """
    # scan_parallelism: every Lloyd round's assignment probe + update
    # aggregation map-side run on df's partitioning — rescue the
    # unsplittable-small-file layout (no-op at real scale; seed order
    # and the fixed-point means are partitioning-independent)
    df = scan_parallelism(df)
    seed = df.select(id_col, vec_col).orderBy(F.asc(id_col)).limit(k)
    # Centroids are driver state (k×dim doubles — MLlib holds them the
    # same way): each iteration collects the k new means, so plans stay
    # flat instead of nesting the whole training history into the
    # consumer's lineage.
    cent_rows: list[tuple[int, list[float]]] = [
        (i, [float(x) for x in r[vec_col]])
        for i, r in enumerate(seed.collect())
    ]
    for _ in range(iters):
        probe = probe_cells_udf(cent_rows, nprobe=1)
        assigned = _exploded_assignment(df, probe, vec_col)
        # per-cell per-dimension mean: one hash aggregation over
        # (cell, dim) — the shuffle carries partial sums, never vectors.
        # _fixed_point_mean makes the update partition-order-INDEPENDENT
        # (centroids must be bit-stable across partitionings for the
        # oracle replay / joint-trainer equality to hold at any cluster
        # size — round-7 advice item).
        means = (
            assigned.groupBy("__cell", "__d")
            .agg(_fixed_point_mean(F.col("__x")).alias("__m"))
            .groupBy("__cell")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("__d", "__m"))),
                    lambda s: s.getField("__m"),
                ).alias("__newv")
            )
        )
        new = {
            r["__cell"]: [float(x) for x in r["__newv"]] for r in means.collect()
        }
        # empty cells keep their previous centroid
        cent_rows = [(c, new.get(c, v)) for c, v in cent_rows]
    return df.sparkSession.createDataFrame(
        cent_rows, f"cell long, {vec_col} array<double>"
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
    nprobe/n_cells of the corpus. Cell assignment (corpus) and cell
    probing (queries) run through the Arrow-batched numpy probe; the
    final candidate scoring stays exact Column math."""
    cent_rows = [
        (int(r[id_col]), [float(x) for x in r[vec_col]])
        for r in centroids.select(id_col, vec_col).collect()
    ]
    assign1 = probe_cells_udf(cent_rows, nprobe=1)
    # scan_parallelism: the Arrow probe + exact scoring inherit the
    # scan's partitioning (qcells broadcasts) — no-op at real scale
    assigned = scan_parallelism(corpus).select(
        id_col,
        F.col(vec_col),
        F.element_at(assign1(F.col(vec_col)), 1).alias("cell"),
    )
    probe_n = probe_cells_udf(cent_rows, nprobe=nprobe)
    qcells = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        vec_norm_safe(vec_col).alias("__qn"),
        F.explode(probe_n(F.col(vec_col))).alias("cell"),
    )
    scored = (
        assigned.withColumn("__vn", vec_norm_safe(vec_col))
        .join(qcells, "cell")
        .filter(F.col(id_col) != F.col("query_id"))
        .withColumn(
            "cosine",
            F.round(vec_dot(vec_col, "__qv") / (F.col("__vn") * F.col("__qn")), 6),
        )
    )
    return per_group_topk(
        scored, "query_id", "cosine", id_col, k, "rank"
    ).select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        "cosine",
        F.col("rank").cast("long"),
    )


def build_ivf_index(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    index_root: str,
    k: int = 8,
    iters: int = 3,
) -> None:
    """Persist an IVF index as an on-disk artifact: the k centroids plus
    the corpus PARTITIONED BY CELL — the build-once/query-many serving
    pattern (training the quantizer per query, as the self-contained
    ``ivf_topk`` query does, is the demo shape; at 100 TB the index is
    a nightly batch artifact and queries just read it).

    Partitioning by cell is the scale point: a query probing nprobe of
    k cells reads nprobe directories and nothing else — file-level
    partition pruning, not just row skipping."""
    cents = kmeans_centroids(df, id_col, vec_col, k=k, iters=iters)
    cents.write.parquet(f"{index_root}/centroids")
    cent_rows = [
        (int(r["cell"]), [float(x) for x in r[vec_col]])
        for r in cents.collect()
    ]
    assign1 = probe_cells_udf(cent_rows, nprobe=1)
    assigned = df.select(
        F.col(id_col),
        F.col(vec_col),
        F.element_at(assign1(F.col(vec_col)), 1).alias("cell"),
    )
    assigned.write.partitionBy("cell").parquet(f"{index_root}/assignments")


def ivf_query_index(
    spark,
    index_root: str,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    nprobe: int = 2,
    where: Column | None = None,
) -> DataFrame:
    """Query a persisted IVF index: probe each query's top-``nprobe``
    cells against the stored centroids, then scan ONLY those cells'
    partitions of the assignments artifact (static partition pruning —
    the probed-cell set is bounded by |queries| × nprobe, tiny by the
    definition of a query set, so collecting it is driver metadata, not
    data). Scoring and ranking are identical to ``ivf_topk`` — same
    6-dp rounding, same tie order — so a prebuilt index returns
    bit-identical results to the self-contained query.

    ``where``: optional metadata predicate over the index's corpus
    columns — FILTERED vector search (the vector-store "search within a
    category" shape). Applied directly on the pruned assignments scan,
    so Catalyst pushes it to the parquet reader alongside the partition
    filters and non-matching vectors die before the norm/score math.
    PRE-FILTER semantics: the result is the exact top-k among passing
    vectors WITHIN the probed cells — never fewer than k survivors from
    post-filtering a fixed candidate list (the recall failure mode of
    filter-after-search); recall vs a filtered brute force is the same
    nprobe/k trade as unfiltered IVF."""
    cents = read_parquet_memo(spark, f"{index_root}/centroids")
    cent_rows = [
        (int(r["cell"]), [float(x) for x in r[vec_col]])
        for r in cents.collect()
    ]
    probe_n = probe_cells_udf(cent_rows, nprobe=nprobe)
    qcells = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        vec_norm_safe(vec_col).alias("__qn"),
        F.explode(probe_n(F.col(vec_col))).alias("cell"),
    )
    probed = sorted(
        {r["cell"] for r in qcells.select("cell").distinct().collect()}
    )
    corpus = read_parquet_memo(spark, f"{index_root}/assignments")
    if len(probed) <= IVF_PRUNE_LITERAL_MAX:
        # literal IN on the partition column → PartitionFilters prune
        # the scan to the probed cell directories (plan-gated)
        corpus = corpus.filter(F.col("cell").isin(*[int(c) for c in probed]))
    # else: a query set wide enough to probe more cells than the literal
    # cap is touching most of the index anyway — compiling a 10⁴-10⁵
    # literal IN just bloats the plan (analysis + codegen cost per
    # literal) for pruning the equi-join below already provides; scan
    # unfiltered and let the join drop unprobed cells (round-9 guard for
    # the raised IVF_MAX_CELLS: probed is bounded by min(|q|·nprobe, k)
    # and k can now be 65536)
    if where is not None:
        corpus = corpus.filter(where)
    scored = (
        # scan_parallelism sits ABOVE the partition-filtered scan, so
        # the pruning keeps its PartitionFilters (plan-gated) while the
        # exact scoring parallelizes past the probed directories' file
        # count (no-op at real scale)
        scan_parallelism(corpus)
        .withColumn("__vn", vec_norm_safe(vec_col))
        .join(qcells, "cell")
        .filter(F.col(id_col) != F.col("query_id"))
        .withColumn(
            "cosine",
            F.round(
                vec_dot(vec_col, "__qv") / (F.col("__vn") * F.col("__qn")), 6
            ),
        )
    )
    return per_group_topk(
        scored, "query_id", "cosine", id_col, k, "rank"
    ).select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        "cosine",
        F.col("rank").cast("long"),
    )


# --------------------------------------------------------------------------
# Random-hyperplane LSH (frozen deterministic planes — the DuckDB oracle in
# plans/extensions.py regenerates the SAME coefficients from these numbers).
# plane weight w(j, d) = ((j·A + d·B + C) mod M) / M − 0.5  ∈ [−0.5, 0.5)
# --------------------------------------------------------------------------

HP_PLANES = 32
HP_BANDS = 4
HP_ROWS = HP_PLANES // HP_BANDS
HP_A, HP_B, HP_C, HP_M = 131_071, 524_287, 99_991, 1_000_003
HP_DIM = 64
#: Sign decisions use INTEGER arithmetic end-to-end: the vector is
#: quantized to round(x·2²⁴) and the plane weight to (2r − M) — the sign
#: of Σ q·w equals the sign of the quantized real dot product (positive
#: scaling), is exactly reproducible on any engine regardless of
#: reduction order, and costs long adds instead of decimal ops.
#: Overflow: |q| < 2²⁵·max|x|, |w| < 2²⁰ → 64-term sum ≪ 2⁶³.
HP_SCALE = 1 << 24


def plane_weights_int(j: int, dim: int = HP_DIM) -> list[int]:
    """Frozen integer plane weights: w(j,d) = 2·((j·A + d·B + C) mod M) − M
    (an integer in (−M, M), uniform-ish sign pattern)."""
    return [2 * ((j * HP_A + d * HP_B + HP_C) % HP_M) - HP_M for d in range(dim)]


def plane_dots(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    n_planes: int,
    prefix: str = "__dot_",
) -> DataFrame:
    """Integer dot products of every vector against the first
    ``n_planes`` frozen planes — the shared kernel under both the
    hyperplane sign sketch and random-projection dimensionality
    reduction. posexplode the quantized vector, then ONE hash
    aggregation computes all plane sums (weights from the closed
    formula, inline integer arithmetic in generated code); map-side
    partials collapse each vector's rows before the only shuffle."""
    quantized = F.transform(
        F.col(vec_col),
        lambda x: F.round(x.cast("double") * F.lit(float(HP_SCALE))).cast("long"),
    )
    # scan_parallelism: the quantize+explode+partial-agg map side runs
    # on df's partitioning — rescue the unsplittable-small-file layout
    # (no-op at real scale; the plane sums are order-independent longs)
    exploded = scan_parallelism(df).select(
        F.col(id_col), F.posexplode(quantized).alias("__d", "__q")
    )

    # Plane-sum aggregates as JVM-parsed SQL strings (r13 optimization
    # round): the Column-API form was ~10 py4j round-trips per plane —
    # a real driver constant at 64 planes (the wide LSH geometry);
    # arithmetic is identical (same closed-formula long ops: every
    # literal carries an L suffix and __d is cast BIGINT, exactly the
    # promotion the lit/cast chain produced — hash-identical outputs).
    return exploded.groupBy(id_col).agg(
        *[
            F.expr(
                f"sum(__q * ((({j * HP_A}L + CAST(__d AS BIGINT) * "
                f"{HP_B}L + {HP_C}L) % {HP_M}L) * 2L - {HP_M}L))"
            ).alias(f"{prefix}{j}")
            for j in range(n_planes)
        ]
    )


#: Output dimensionality of the random projection (Johnson–Lindenstrauss
#: style reduction with the frozen integer planes). 64 → 8 dims.
RP_DIMS = 8


def random_projection(
    df: DataFrame, id_col: str, vec_col: str, out_dims: int = RP_DIMS
) -> DataFrame:
    """Dimensionality reduction by deterministic random projection:
    project each embedding onto the first ``out_dims`` frozen integer
    planes (the same closed-formula family the LSH sketch signs). The
    projected coordinates stay INTEGERS — exact on any engine and any
    reduction order, no RNG, no fitted model to ship — so downstream
    coarse filtering / bucketing on the reduced vectors is reproducible
    across reruns and engines (JL-style distance preservation comes from
    the planes' uniform-ish signs; signs-only is the LSH special case).
    One narrow shuffle per corpus, identical plan shape to the sketch."""
    return plane_dots(df, id_col, vec_col, out_dims, "proj_")


#: Auto-width ceiling for band signatures: 24-bit buckets cover ~10⁷
#: vectors before saturating again; each extra row is one more plane
#: dot per vector (cost linear, overflow-safe to 64 rows — see
#: HP_SCALE note).
HP_MAX_ROWS = 24


def auto_hyperplane_rows(n_vectors: int) -> int:
    """Corpus-size-aware band width (round-6 verdict item): each band's
    bucket space is 2^rows, so candidate growth stays near-linear while
    2^rows keeps pace with the corpus — rows ≈ ⌈log₂ n⌉, clamped to
    [HP_ROWS, HP_MAX_ROWS] (never narrower than the frozen 8-row
    oracle geometry). Wider bands trade per-band recall for weaker
    pairs (exact twins still collide on every band at any width)."""
    import math

    want = math.ceil(math.log2(max(n_vectors, 2)))
    return max(HP_ROWS, min(HP_MAX_ROWS, want))


def hyperplane_sketch(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int = HP_DIM,
    bands: int = HP_BANDS,
    rows: int | None = None,
) -> DataFrame:
    """Per-vector sign-bit sketch: bit_j = (v · plane_j ≥ 0), packed into
    ``bands`` band signatures of ``rows`` bits each → (id, band_0..).

    Shape: posexplode the quantized vector and compute all bands·rows
    dot products as ONE hash aggregation (sum of q·w per plane, weights
    from the closed formula — defined for any plane index). The whole
    thing runs inside whole-stage codegen; the higher-order-function
    formulation (aggregate(zip_with(...)) per plane) is interpreted per
    element and measured ~10× slower. Costs one narrow shuffle of
    (id, dots) — the partial aggregation collapses each vector's rows
    map-side.

    ``rows`` is the SCALE knob: each band's bucket space is 2^rows —
    the frozen 8-bit signatures saturate around 10⁵ vectors (measured
    at the 10× stress scale, BENCH_NOTES round 5); rows=16 takes
    buckets to 2¹⁶ at the cost of per-band recall for weaker pairs
    (exact twins always collide on every band). Default
    (``rows=None``): auto-derive from a corpus count
    (``auto_hyperplane_rows`` — one extra count job); pass
    ``rows=HP_ROWS`` to pin the frozen oracle geometry, as the
    registered queries do."""
    if rows is None:
        rows = auto_hyperplane_rows(df.count())
    dots = plane_dots(df, id_col, vec_col, bands * rows, "__dot_")

    # Sign-bit packing as a JVM-parsed SQL string per band (r13
    # optimization round — same py4j-constant rationale as plane_dots);
    # plain INT literals keep the band columns the IntegerType the
    # lit(1 << r) chain produced (rows ≤ 24 always fits).
    def band_sig(bi: int) -> Column:
        return F.expr(
            " + ".join(
                f"(CASE WHEN __dot_{bi * rows + r} >= 0 "
                f"THEN {1 << r} ELSE 0 END)"
                for r in range(rows)
            )
        ).alias(f"band_{bi}")

    return dots.select(F.col(id_col), *[band_sig(bi) for bi in range(bands)])


def hyperplane_lsh_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
    n_bands: int = HP_BANDS,
    rows: int | None = None,
) -> DataFrame:
    """ANN near-dup pairs: vectors agreeing on ANY band of hyperplane
    sign bits become candidates (narrow (band, sig) equi-join — the same
    banding machinery as MinHash LSH); candidates are then verified with
    the EXACT cosine, so precision is 1.0 and only recall is
    approximate. At 100 TB the band join touches collision buckets only
    — never the |v|² pair space — PROVIDED the band bucket space
    2^rows outnumbers the corpus: ``rows=None`` (default) auto-derives
    the width from a corpus count (``auto_hyperplane_rows``); pass
    ``rows=HP_ROWS`` to pin the frozen oracle geometry."""
    if rows is None:
        rows = auto_hyperplane_rows(df.count())
    sk = hyperplane_sketch(df, id_col, vec_col, bands=n_bands, rows=rows)
    bands = sk.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"), F.col(f"band_{bi}").alias("sig")
                    )
                    for bi in range(n_bands)
                ]
            )
        ).alias("bs"),
    ).select(id_col, "bs.band", "bs.sig")
    a = bands.select(F.col(id_col).alias("id_a"), "band", "sig")
    b = bands.select(F.col(id_col).alias("id_b"), "band", "sig")
    cands = (
        a.join(b, ["band", "sig"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    va = df.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("__va"),
        vec_norm_safe(vec_col).alias("__na"),
    )
    vb = df.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("__vb"),
        vec_norm_safe(vec_col).alias("__nb"),
    )
    return (
        cands.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn(
            "cosine",
            F.round(vec_dot("__va", "__vb") / (F.col("__na") * F.col("__nb")), 6),
        )
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def normalize_vectors(df: DataFrame, vec_col: str) -> DataFrame:
    """L2-normalize an embedding column (zip_with over the array);
    all-zero vectors stay all-zero (clamped denominator) instead of
    going NaN."""
    norm = vec_norm_safe(vec_col)
    return df.withColumn(
        vec_col,
        F.transform(F.col(vec_col), lambda x: x.cast("double") / norm),
    )


def diversity_sample_cells(
    df: DataFrame, id_col: str, vec_col: str
) -> DataFrame:
    """Coverage-first diversity subsampling: quantize each embedding to
    its HP_ROWS-bit hyperplane sign cell (band 0 of the frozen sketch —
    2^HP_ROWS coarse cells partitioning the embedding space) and keep
    ONE representative per occupied cell (min id, with the member count
    so samplers can weight by density).

    This is the cheap semantic-diversity primitive for corpus curation:
    where uniform sampling over-represents dense regions, one-per-cell
    keeps coverage of the space. Cost at 100 TB: the sketch's one
    narrow (id, dots) aggregation plus one groupBy on the cell — no
    pairwise term anywhere. Integer-exact sign decisions make the cell
    assignment bit-reproducible on any engine (same constants as the
    near-dup LSH, see plane_weights_int)."""
    # frozen rows=HP_ROWS by design: the cell layout IS the semantic
    # (2^8 coarse cells, oracle-replayed) — coverage sampling wants a
    # FIXED coarse grid, not one that tracks corpus size
    sk = hyperplane_sketch(df, id_col, vec_col, rows=HP_ROWS)
    return (
        # long cell: match the oracle's BIGINT so the driver's
        # dtype-aware hash sees int64 on both engines.
        sk.groupBy(F.col("band_0").cast("long").alias("cell"))
        .agg(
            F.min(id_col).alias("rep_id"),
            F.count(F.lit(1)).alias("n_members"),
        )
    )


#: Clamp rails for the derived IVF geometry. Round-9 verdict item 2:
#: the round-8 clamp of 4096 bound at n = 4096² ≈ 16.8M vectors, past
#: which cells grow linearly and the per-query exact re-rank pool
#: nprobe·(n/k) becomes a linear wall (15.6M candidates/query at
#: n = 10⁹). 65536 rides the machinery that already exists for wide k:
#: - assignment/probing switched to the two-level coarse quantizer at
#:   FLAT_PROBE_MAX_K = 64 cells long before either clamp, so per-vector
#:   cost is ~2·√k dot products, not k;
#: - pyspark auto-broadcasts pickled UDF commands above 1 MB
#:   (``_prepare_for_python_RDD``: torrent broadcast, fetched once per
#:   executor, NOT per task), so the k×dim probe matrix at the new
#:   clamp (65536 × 64 dims × 8 B ≈ 34 MB) ships like any broadcast
#:   join side rather than inflating every task;
#: - k-means training collects k×dim fixed-point means per Lloyd round
#:   (~34 MB/round at the clamp) — nightly index-build cost, unchanged
#:   in kind from MLlib's driver-held centroids.
#: The clamp now binds at n = 65536² ≈ 4.3×10⁹ vectors and the re-rank
#: pool at the bind point is nprobe·√n (nprobe caps at 64), i.e. √n
#: growth past the OLD wall instead of linear (measured forced-
#: engagement contrast: tools/ivf_clamp_probe.py, BENCH_NOTES round 9).
#: Past the new bind point, shard the corpus — the same documented
#: answer as FAISS's IVF sharding. 64 probes is the standard flat-IVF
#: serving ceiling — with k ∝ √n the probed corpus fraction nprobe/k
#: keeps SHRINKING as n grows even at the caps.
IVF_MAX_CELLS = 65536
IVF_MAX_NPROBE = 64
#: Max distinct probed cells compiled as a literal IN for partition
#: pruning in ``ivf_query_index``. Below it (every recorded geometry:
#: gate probes ≤ 23 cells) the literal filter gives static
#: PartitionFilters, the plan-gated serving win. Above it — possible
#: only for query sets wide enough to probe thousands of the (now up
#: to 65536) cells — the IN would bloat analysis/codegen per literal
#: while pruning almost nothing, so the scan goes unfiltered and the
#: cell equi-join drops unprobed cells instead.
IVF_PRUNE_LITERAL_MAX = 4096


def _sqrt_clamped(n: int, lo: int, hi: int) -> int:
    """clamp(⌈√n⌉, lo, hi) — the shared closed form behind the derived
    IVF/PQ geometries (one definition engine-side; each recorded
    oracle replays it as ``GREATEST(lo, LEAST(hi, CAST(ceil(sqrt(n))
    AS BIGINT)))``, and ceil(sqrt()) is IEEE-exact on both engines)."""
    import math

    return max(lo, min(hi, math.ceil(math.sqrt(max(n, 1)))))


def auto_ivf_cells(n_vectors: int) -> int:
    """Corpus-size-aware IVF cell count (round-8 verdict item: the
    recorded k_cells=8 is a toy — probing nprobe=2 of 8 cells scans
    25% of the corpus, a linear-scan shape). The classical IVF design
    point k ≈ ⌈√n⌉ balances the two per-query terms — k centroid
    comparisons + nprobe·n/k candidate scans — so the touched fraction
    falls as n^(-1/2). Clamped to [8, IVF_MAX_CELLS]: 8 = the frozen
    oracle geometry floor; a deterministic closed form, so the
    recorded auto-geometry query replays it as a scalar SQL CTE
    (ceil(sqrt(n)) is IEEE-exact on both engines)."""
    return _sqrt_clamped(n_vectors, 8, IVF_MAX_CELLS)


def auto_ivf_nprobe(k_cells: int) -> int:
    """Probe width matched to the derived cell count: nprobe ≈ ⌈√k⌉
    keeps the probed cell fraction √k/k = k^(-1/2) SHRINKING with the
    corpus, while recall holds up because wider k means tighter cells
    (measured recall@5 0.94 at sf0.01 under the derived k=23/nprobe=5
    vs 0.86 for the frozen toy 8/2). Clamped to [2, IVF_MAX_NPROBE];
    same replayable-closed-form contract as ``auto_ivf_cells``."""
    return _sqrt_clamped(k_cells, 2, IVF_MAX_NPROBE)


#: Auto-k target cell population for SemDeDup: cells of ~512 vectors
#: keep the per-cell self-join (|cell|² pairs) comfortably inside one
#: task while k stays small enough that the k×dim centroid state and
#: per-batch probe GEMM remain trivial.
SEMDEDUP_TARGET_CELL = 512
SEMDEDUP_MAX_K = 4096


def auto_semdedup_k(
    n_vectors: int, target_cell: int = SEMDEDUP_TARGET_CELL
) -> int:
    """Corpus-size-aware cluster count (round-6 verdict item): pairwise
    work is Σ|cell|² ≈ n²/k, so k must grow ∝ n to keep the per-cell
    quadratic term bounded — k ≈ ⌈n / target_cell⌉ caps expected
    pairwise work at ~n·target_cell. Clamped to [8, SEMDEDUP_MAX_K]
    (8 = the frozen oracle geometry; past 4096 cells the driver-side
    centroid state is still only ~2 MB but k-means collect rounds
    start to dominate). Past the clamp (n ≳ 2M) cells grow beyond
    target_cell; ``semantic_dedup``'s ``max_cell`` guard then refines
    oversized cells with a second per-cell clustering level
    (``SEMDEDUP_SPLIT_CELL``), so the verify stays ~n·target_cell to
    ~10⁷-vector cells; shard the corpus beyond that."""
    want = -(-max(n_vectors, 1) // target_cell)  # ceil division
    return max(8, min(SEMDEDUP_MAX_K, want))


#: Cell population past which ``semantic_dedup`` refines the cell with
#: a second, per-cell clustering level (8× the target population:
#: auto-k keeps cells ≈ SEMDEDUP_TARGET_CELL until the SEMDEDUP_MAX_K
#: clamp engages at n ≈ 2M vectors, so the split path is INACTIVE at
#: every recorded/stress scale and self-activates around n ≈ 16.8M —
#: the point where the clamp would otherwise let the per-cell n²/k
#: verify go quadratic again).
SEMDEDUP_SPLIT_CELL = 8 * SEMDEDUP_TARGET_CELL


def _np_round_half_away(x, dp: int):
    """numpy HALF_UP (round half away from zero) at ``dp`` decimals —
    matching Spark's F.round / DuckDB's round (np.round is banker's
    rounding, which would diverge on exact .5 boundaries)."""
    import numpy as np

    s = 10.0**dp
    return np.sign(x) * np.floor(np.abs(x) * s + 0.5) / s


def _subcluster_fn(id_col: str, target_cell: int, iters: int):
    """Per-cell deterministic sub-clustering for ``applyInPandas`` —
    a LOCAL replay of the engine's zero-RNG Lloyd semantics inside one
    oversized cell: seeds = the sub_k smallest-id members, assignment
    by 6-dp-rounded cosine (ties → smallest subcell; norms clamped at
    1e-12), mean update sums 9-dp fixed-point integers (HALF_UP, the
    _fixed_point_mean contract), empty subcells keep their centroid.
    Input order cannot matter: the group sorts by id first, so the
    result is partition- and shuffle-order-independent. This is the
    sanctioned pandas seam (a dense GEMM per group that Column HOFs
    evaluate element-by-element).

    Cross-engine determinism seam (round-9 advice item, same ACCEPTED
    seam as ``probe_cells_udf``): the cosine here is a numpy GEMM
    (``X @ C.T``, BLAS-reordered summation) while the DuckDB oracle
    replays it as a sequential ``list_dot_product`` fold — the two can
    differ by a float ulp BEFORE the 6-dp HALF_UP round, so an
    unrounded cosine within one ulp of a 0.5e-6 boundary could in
    principle flip a subcell across engines. The round absorbs every
    realistic case (no occurrence across all recorded/stress runs, same
    as the probe's history since round 5); if a driver row ever
    hash-fails with a 6th-decimal signature on a split-path query, this
    seam is the cause — fix by switching this dot to a sequential
    reduction, not by re-rolling the recording."""
    import math

    def fn(pdf):
        import numpy as np
        import pandas as pd

        pdf = pdf.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        X = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf["__v"]])
        n = len(pdf)
        sub_k = math.ceil(n / target_cell)
        if sub_k <= 1:
            return pd.DataFrame(
                {id_col: pdf[id_col], "subcell": np.zeros(n, dtype=np.int32)}
            )
        xn = np.maximum(np.sqrt((X * X).sum(axis=1)), 1e-12)

        def assign(C):
            cn = np.maximum(np.sqrt((C * C).sum(axis=1)), 1e-12)
            sims = _np_round_half_away((X @ C.T) / np.outer(xn, cn), 6)
            # argmax returns the FIRST maximum → smallest subcell tie
            return sims.argmax(axis=1)

        C = X[:sub_k].copy()
        for _ in range(iters):
            asg = assign(C)
            for c in range(sub_k):
                m = asg == c
                if m.any():
                    # sum the 1e9-scaled fixed-point values as int64 —
                    # exact for any realistic cell (float64 summation
                    # would start rounding past 2^53 accumulated
                    # magnitude, ~10^7 unit-scale members, breaking
                    # parity with the oracle's exact BIGINT SUM —
                    # round-8 review finding); the final int64→double
                    # conversion rounds identically on both engines
                    # because both convert the same exact integer.
                    fixed = (
                        (np.sign(X[m]) * np.floor(np.abs(X[m]) * 1e9 + 0.5))
                        .astype(np.int64)
                        .sum(axis=0, dtype=np.int64)
                    )
                    C[c] = fixed.astype(np.float64) / 1e9 / m.sum()
        final = assign(C).astype(np.int32)
        return pd.DataFrame({id_col: pdf[id_col], "subcell": final})

    return fn


def semantic_dedup(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    k: int | None = None,
    iters: int = 3,
    centroids: DataFrame | None = None,
    max_cell: int | None = SEMDEDUP_SPLIT_CELL,
    target_cell: int = SEMDEDUP_TARGET_CELL,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster the embedding space with deterministic
    k-means, then WITHIN each cluster drop every vector that has a
    lower-id neighbor with cosine ≥ ``threshold`` — semantic duplicates
    (paraphrases, re-crawls, template variants) collapse to one
    canonical representative per cluster.

    Scale design: the pairwise comparison is scoped to cluster members
    only — one shuffle on the cell id, then a per-cell self-join whose
    cost is Σ|cell|² ≈ n²/k instead of n² (pick k so cells fit a task;
    at 100 TB k is 10⁴-10⁵ and cells are ~10⁴ vectors). Cell
    assignment reuses the Arrow-batched k-means probe; the verify stays
    exact Column math. Deterministic end-to-end: no RNG anywhere, so
    re-runs drop the identical set.

    ``k=None`` (default) auto-derives k ∝ n from a corpus count
    (``auto_semdedup_k`` — keeps the n²/k term ~linear as the corpus
    grows; measured at 10× stress scale: frozen k=8 went 41.7×, k∝n
    went 7.6×, BENCH_NOTES round 5). Pass ``k=8`` to pin the frozen
    oracle geometry, as the registered query does.

    ``centroids`` (a ``(cell, <vec_col>)`` DataFrame, the
    ``kmeans_centroids`` output shape) skips training entirely — the
    build-once/query-many model-artifact pattern shared with the IVF
    index and PQ codebooks: training is zero-RNG so a persisted model
    changes the cost, never the answer. ``k`` is ignored when centroids
    are supplied; ``iters`` still governs the oversized-cell refinement
    below (the per-cell Lloyd in ``_subcluster_fn`` runs ``iters``
    rounds whether the TOP-level centroids were trained or supplied),
    so replays that must match a recorded split-path answer must pass
    the same ``iters`` the recording used (the registered queries pin
    the default, 3; round-9 advice item).

    ``max_cell`` (round 8): cells larger than this are REFINED with a
    second, per-cell clustering level before the verify join — the
    scale guard for corpora past the SEMDEDUP_MAX_K clamp (n ≳ 2M),
    where auto-k can no longer hold cells near ``target_cell`` and the
    per-cell self-join would go quadratic again (Σ|cell|² ≈ n²/4096 at
    n = 10⁹). Oversized cells sub-cluster into ⌈|cell|/target_cell⌉
    subcells via a deterministic per-cell Lloyd (``applyInPandas``,
    one task per oversized cell — handles cells to ~10⁷ vectors; the
    split is one level, so shard the corpus beyond that), and the
    near-dup scope becomes (cell, subcell). Standard SemDeDup
    semantics: refining the partition is exactly what growing k does —
    duplicates collapse within finer clusters; exact twins always
    share a subcell because the assignment is deterministic in the
    vector value. INACTIVE (bit-identical plan and result) whenever no
    cell exceeds ``max_cell`` — i.e. at every recorded gate/stress
    scale, where only a tiny cell-size aggregation is added.
    ``max_cell=None`` disables the guard.

    Returns (id, cell, is_kept) for every input vector.
    """
    if centroids is not None:
        cents = centroids
    else:
        if k is None:
            k = auto_semdedup_k(df.count())
        cents = kmeans_centroids(df, id_col, vec_col, k=k, iters=iters)
    cent_rows = [
        (int(r["cell"]), [float(x) for x in r[vec_col]])
        for r in cents.collect()
    ]
    assign1 = probe_cells_udf(cent_rows, nprobe=1)
    # Three consumers (both self-join sides + the final keep join) each
    # re-ran the Arrow probe and the norm fold over the whole corpus;
    # materializing the assignment once removes 2/3 of that work
    # (values unchanged — measured 5.1s → 3.4s at sf0.1).
    # scan_parallelism: the probe AND the within-cell pair HOFs below
    # all run on this frame's partitioning (the cell self-join
    # broadcasts one side, inserting no shuffle) — a single-row-group
    # input file would serialize the whole n²/k verify into one task
    # (measured 40 s vs ~2 s at the 10x stress replica, identical rows)
    assigned = scan_parallelism(df).select(
        F.col(id_col),
        F.col(vec_col),
        F.element_at(assign1(F.col(vec_col)), 1).alias("cell"),
        vec_norm_safe(vec_col).alias("__n"),
    ).localCheckpoint(eager=True)
    key = ["cell"]
    if max_cell is not None:
        oversized = [
            r["cell"]
            for r in assigned.groupBy("cell")
            .count()
            .filter(F.col("count") > max_cell)
            .collect()  # bounded by k rows — the sanctioned k-scaled collect
        ]
        if oversized:
            # output schema carries the id column's ACTUAL type — the
            # operator is generic over orderable ids (string doc ids
            # included), so a hardcoded long would break/corrupt
            # non-long callers (round-8 review finding)
            id_type = dict(assigned.dtypes)[id_col]
            sub = (
                assigned.filter(F.col("cell").isin(oversized))
                .select(id_col, "cell", F.col(vec_col).alias("__v"))
                .groupBy("cell")
                .applyInPandas(
                    _subcluster_fn(id_col, target_cell, iters),
                    f"{id_col} {id_type}, subcell int",
                )
            )
            assigned = (
                assigned.join(sub, id_col, "left")
                .withColumn(
                    "subcell", F.coalesce(F.col("subcell"), F.lit(0))
                )
                .localCheckpoint(eager=True)
            )
            key = ["cell", "subcell"]
    a = assigned.select(
        *key,
        F.col(id_col).alias("__ida"),
        F.col(vec_col).alias("__va"),
        F.col("__n").alias("__na"),
    )
    b = assigned.select(
        *key,
        F.col(id_col).alias("__idb"),
        F.col(vec_col).alias("__vb"),
        F.col("__n").alias("__nb"),
    )
    # every vector with a LOWER-id near-duplicate in its cell is dropped
    dropped = (
        a.join(b, key)
        .filter(F.col("__idb") < F.col("__ida"))
        .withColumn(
            "__cos",
            F.round(
                vec_dot("__va", "__vb") / (F.col("__na") * F.col("__nb")), 6
            ),
        )
        .filter(F.col("__cos") >= threshold)
        .select(F.col("__ida").alias(id_col))
        .distinct()
    )
    return assigned.join(
        dropped.withColumn("__drop", F.lit(True)), id_col, "left"
    ).select(
        id_col,
        "cell",
        F.col("__drop").isNull().alias("is_kept"),
    )


def semantic_dedup_new_vs_corpus(
    new_df: DataFrame,
    corpus_df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    k: int | None = None,
    iters: int = 3,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """Cross-corpus SEMANTIC dedup — the SemDeDup twin of the MinHash
    ``cross_corpus_near_dup_ids``: flag every NEW vector whose cosine
    against ANY existing-corpus vector in its k-means cell reaches
    ``threshold`` (the continuous-ingestion serving shape: dedup one
    day's crawl embeddings against the full training corpus without
    re-deduping the corpus itself).

    Scale shape at 100 TB: centroids are trained on the CORPUS (or
    supplied as a persisted model — zero-RNG, so the artifact changes
    cost, never the answer); both sides assign through the
    Arrow-batched probe; the verify is a (cell)-scoped new×corpus
    equi-join touching only same-cell candidates (~|new|·target_cell
    pairs with auto-k), never |new|×|corpus|. Deterministic
    end-to-end, so the pipeline replays as SQL for the oracle gate.

    ``k=None`` auto-derives from the CORPUS count (``auto_semdedup_k``
    — the corpus, not the batch, is what the cells must cover).
    Returns (id, cell, is_dup) for every NEW vector."""
    if centroids is not None:
        cents = centroids
    else:
        if k is None:
            k = auto_semdedup_k(corpus_df.count())
        cents = kmeans_centroids(corpus_df, id_col, vec_col, k=k, iters=iters)
    cent_rows = [
        (int(r["cell"]), [float(x) for x in r[vec_col]])
        for r in cents.collect()
    ]
    assign1 = probe_cells_udf(cent_rows, nprobe=1)

    def assigned(df: DataFrame) -> DataFrame:
        # scan_parallelism: probe + per-pair verify run on the scan's
        # partitioning (the cell join broadcasts nothing; no-op at
        # real scale)
        return scan_parallelism(df).select(
            F.col(id_col),
            F.element_at(assign1(F.col(vec_col)), 1).alias("cell"),
            F.col(vec_col).alias("__v"),
            vec_norm_safe(vec_col).alias("__n"),
        )

    # the new side feeds BOTH the verify join and the final flag join —
    # materialize its assignment once (the in-corpus semantic_dedup
    # pattern; the corpus side is consumed once and stays lazy)
    new_a = assigned(new_df).localCheckpoint(eager=True)
    old_a = assigned(corpus_df).select(
        "cell",
        F.col("__v").alias("__vo"),
        F.col("__n").alias("__no"),
    )
    dup_ids = (
        new_a.join(old_a, "cell")
        .withColumn(
            "__cos",
            F.round(vec_dot("__v", "__vo") / (F.col("__n") * F.col("__no")), 6),
        )
        .filter(F.col("__cos") >= threshold)
        .select(id_col)
        .distinct()
    )
    return new_a.join(
        dup_ids.withColumn("__dup", F.lit(True)), id_col, "left"
    ).select(
        id_col,
        "cell",
        F.coalesce(F.col("__dup"), F.lit(False)).alias("is_dup"),
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ) — the memory-side ANN scale path
# ---------------------------------------------------------------------------

#: Frozen PQ geometry so the oracle can replay it: 64-dim vectors split
#: into PQ_M contiguous PQ_SUB_DIM-dim subspaces (8×8), each quantized
#: against its own PQ_K-centroid codebook from the deterministic k-means.
PQ_M = 8
PQ_SUB_DIM = 8
PQ_K = 16
PQ_ITERS = 2
#: Standard PQ codebook ceiling: 256 centroids per subspace = 8-bit
#: codes, the industry PQ design point; resolution below it only
#: because tiny corpora can't train 256 centroids per subspace.
PQ_MAX_K = 256


def auto_pq_k(n_vectors: int) -> int:
    """Corpus-size-aware PQ codebook size: ⌈√n⌉ per subspace until the
    standard 8-bit 256 cap (n ≈ 65k) — distortion falls as the
    codebook grows, and √n keeps ≥ √n training points per centroid so
    the zero-RNG Lloyd stays well-conditioned (measured recall@5 0.98
    at sf0.01 under the derived k=23 vs 0.94 for the frozen toy 16).
    Clamped to [PQ_K, PQ_MAX_K] (PQ_K=16 = the frozen oracle geometry
    floor); deterministic closed form, replayable as a scalar SQL
    CTE."""
    return _sqrt_clamped(n_vectors, PQ_K, PQ_MAX_K)
#: ADC scores shortlist this many candidates per query; the exact
#: re-rank then keeps topk. 100 holds measured top5-in-shortlist
#: recall at 0.94 on the driver testdata (random synthetic embeddings
#: — PQ's worst case; clustered real embeddings only do better).
PQ_SHORTLIST = 100
#: Literal-LUT serving embeds n_queries × m × k micro-int literals in
#: the projection and collects the query VECTORS driver-side; past this
#: entry count pq_topk switches to the broadcast-join LUT formulation,
#: which stays fully distributed (query vectors never leave the
#: cluster) at the cost of m broadcast joins on the shortlist path.
#: Both paths are answer-identical
#: (test_pq_literal_lut_matches_join_lut /
#: test_pq_topk_join_lut_fallback_matches_literal).
PQ_LITERAL_LUT_MAX = 65536
#: Hard ceiling for the HINTED literal path (a generous 8× the auto
#: gate): adc="literal" skips the auto gate's sparse-id probe job, but
#: a declared id range past this many LUT entries still bounces to the
#: join path (the hint must never turn into an unbounded driver-side
#: collect of query vectors). An absolute entry count, not a live
#: multiple of PQ_LITERAL_LUT_MAX, so tuning the auto gate down (tests
#: zero it to force the probe regime) cannot silently re-gate hints.
PQ_LITERAL_HINT_MAX_ENTRIES = 8 * PQ_LITERAL_LUT_MAX


def _grouped_probe_udf(books: list[list[tuple[int, list[float]]]]):
    """Arrow-batched nearest-cell probe for ALL subspaces at once: rows
    carry (subspace, subvector) and each subspace's batch slice runs one
    numpy GEMM against ITS codebook — the per-subspace math (6-dp
    rounding, smallest-cell stable ties, clamped norms) is identical to
    ``probe_cells_udf``'s flat path, just grouped so the whole joint
    assignment is ONE Python evaluation instead of m. Flat ONLY —
    callers route books wider than ``FLAT_PROBE_MAX_K`` through
    ``probe_cells_udf`` (two-level) instead."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    cells, mats = [], []
    for book in books:
        bc, bm = _book_matrix(book)
        cells.append(bc)
        mats.append(bm)

    @pandas_udf("long")
    def probe(ms, vs):
        x = np.stack(vs.to_numpy()).astype(np.float64)
        xn = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        marr = ms.to_numpy()
        out = np.empty(len(xn), dtype=np.int64)
        for mi in np.unique(marr):
            rows = np.where(marr == mi)[0]
            sims = np.round(xn[rows] @ mats[mi].T, 6)
            best = np.argsort(-sims, axis=1, kind="stable")[:, 0]
            out[rows] = cells[mi][best]
        return pd.Series(out)

    return probe


def _pq_long_form(
    emb: DataFrame, id_col: str, vec_col: str, m: int, sub_dim: int
) -> DataFrame:
    """(id, subspace, subvector) long form: one row per (vector,
    subspace), built with a single inline-array explode so the corpus
    is scanned once per consumer pass instead of once per subspace."""
    parts = F.array(
        *[
            F.struct(
                F.lit(mi).alias("__m"),
                F.slice(vec_col, mi * sub_dim + 1, sub_dim).alias("__sv"),
            )
            for mi in range(m)
        ]
    )
    return emb.select(F.col(id_col).alias("__id"), F.explode(parts).alias("__p")).select(
        "__id", F.col("__p.__m").alias("__m"), F.col("__p.__sv").alias("__sv")
    )


def pq_train_codebooks(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    m: int = PQ_M,
    sub_dim: int = PQ_SUB_DIM,
    k: int = PQ_K,
    iters: int = PQ_ITERS,
) -> list[list[tuple[int, list[float]]]]:
    """One deterministic k-means per subspace (zero-RNG: smallest-id
    seeds, 6-dp-rounded cosine assignment with smallest-cell ties,
    per-dimension mean update, empty cells keep their previous
    centroid) — trained JOINTLY: the m independent per-subspace chains
    run over one (id, subspace, subvector) long-form table, so each
    Lloyd round is ONE corpus pass + ONE grouped aggregation for all m
    codebooks instead of m separate k-means (m×iters corpus scans and
    ~3m driver round-trips before; at 100 TB the training passes drop
    from m×iters to iters). Per-subspace math is unchanged —
    ``test_pq_joint_training_equals_per_subspace_kmeans`` pins
    equality against the reference ``kmeans_centroids``-per-subspace
    chain, and the DuckDB oracle replays that same chain. Driver holds
    only the m×k×sub_dim codebook floats — the same bounded-state
    sanction as the IVF centroids.

    Past ``FLAT_PROBE_MAX_K`` centroids the per-subspace chains route
    through ``kmeans_centroids`` unchanged, so the assignment keeps the
    two-level probe semantics the rest of the module uses at wide k —
    the joint one-pass path is flat-probe only."""
    if k > FLAT_PROBE_MAX_K:
        books_wide: list[list[tuple[int, list[float]]]] = []
        for mi in range(m):
            sub = emb.select(
                F.col(id_col),
                F.slice(vec_col, mi * sub_dim + 1, sub_dim).alias("__sv"),
            )
            cb = kmeans_centroids(sub, id_col, "__sv", k=k, iters=iters)
            books_wide.append(
                [(r["cell"], [float(x) for x in r["__sv"]]) for r in cb.collect()]
            )
        return books_wide
    # seeds: the k smallest-id vectors, sliced per subspace — identical
    # to each per-subspace chain's orderBy(id).limit(k) seed set
    seed_rows = (
        emb.select(id_col, vec_col).orderBy(F.asc(id_col)).limit(k).collect()
    )
    books: list[list[tuple[int, list[float]]]] = [
        [
            (i, [float(x) for x in r[vec_col]][mi * sub_dim : (mi + 1) * sub_dim])
            for i, r in enumerate(seed_rows)
        ]
        for mi in range(m)
    ]
    # scan_parallelism: each joint Lloyd round's probe + update run on
    # this frame's partitioning (no-op at real scale)
    long = _pq_long_form(scan_parallelism(emb), id_col, vec_col, m, sub_dim)
    for _ in range(iters):
        new: dict[tuple[int, int], list[float]] = {
            (r["__m"], r["__cell"]): [float(x) for x in r["__newv"]]
            for r in _joint_lloyd_means(long, books).collect()
        }
        books = [
            [(c, new.get((mi, c), v)) for c, v in book]
            for mi, book in enumerate(books)
        ]
    return books


def _joint_lloyd_means(long: DataFrame, books) -> DataFrame:
    """One Lloyd update for ALL m codebooks: (subspace, cell, new
    centroid vector) from a single grouped aggregation over the
    long-form corpus. The probe sits in its own projection BEFORE the
    posexplode (the ExtractPythonUDFs dim×-re-evaluation trap,
    BENCH_NOTES r6) — plan-gated by
    ``test_joint_pq_update_probes_before_the_explode``."""
    probe = _grouped_probe_udf(books)
    assigned = long.select(
        probe("__m", "__sv").alias("__cell"), "__m", "__sv"
    )
    return (
        assigned.select(
            "__m", "__cell", F.posexplode("__sv").alias("__d", "__x")
        )
        .groupBy("__m", "__cell", "__d")
        # same order-independent fixed-point mean as kmeans_centroids —
        # the joint long-form plan partitions differently than the
        # per-subspace frames, so bit-equality between the two chains
        # must not ride on float partial-sum order (round-7 advice)
        .agg(_fixed_point_mean(F.col("__x")).alias("__mean"))
        .groupBy("__m", "__cell")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__d", "__mean"))),
                lambda s: s.getField("__mean"),
            ).alias("__newv")
        )
    )


def save_pq_codebooks(
    spark, books: list[list[tuple[int, list[float]]]], path: str
) -> None:
    """Persist trained PQ codebooks as a (subspace, cell, centroid)
    parquet — the PQ twin of the IVF centroids artifact. The whole
    table is m×k rows (~128 at the frozen 8×16 geometry), so one file;
    at 100 TB the codebooks are still this small — only the CODES
    table scales with the corpus."""
    rows = [
        (mi, int(c), [float(x) for x in v])
        for mi, book in enumerate(books)
        for c, v in book
    ]
    spark.createDataFrame(
        rows, "subspace int, cell long, centroid array<double>"
    ).coalesce(1).write.parquet(path)


def load_pq_codebooks(
    spark, path: str
) -> list[list[tuple[int, list[float]]]]:
    """Read codebooks persisted by ``save_pq_codebooks`` back into the
    driver-side list shape the probe UDF closures capture (m×k×sub_dim
    floats — the same bounded-state sanction as the IVF centroids)."""
    rows = spark.read.parquet(path).collect()
    m = max(r["subspace"] for r in rows) + 1
    books: list[list[tuple[int, list[float]]]] = [[] for _ in range(m)]
    for r in rows:
        books[r["subspace"]].append(
            (int(r["cell"]), [float(x) for x in r["centroid"]])
        )
    for book in books:
        book.sort()
    return books


def pq_encode(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    books: list[list[tuple[int, list[float]]]],
    sub_dim: int | None = None,
) -> DataFrame:
    """Corpus → PQ codes: per subspace, the Arrow-batched nearest-
    centroid probe (one numpy GEMM per batch). Output is one BIGINT
    code per subspace — the 100 TB win: ~64 floats compress to m
    bytes-scale codes, and serving scans codes, never vectors.
    ``sub_dim`` defaults to the width the books were trained at (their
    centroid length) — passing a mismatched override would slice the
    wrong vector segments. Books wider than ``FLAT_PROBE_MAX_K`` route
    per subspace through ``probe_cells_udf``'s two-level path, matching
    the assignment semantics the books were trained with — at the cost
    of m Arrow evaluations per batch (vs the flat path's one joint
    evaluation); no registered query uses wide PQ books, so the joint
    two-level probe is deliberately unbuilt until a consumer exists."""
    if sub_dim is None:
        sub_dim = len(books[0][0][1])
    m = len(books)

    if max(len(book) for book in books) > FLAT_PROBE_MAX_K:
        out = scan_parallelism(emb).select(F.col(id_col), F.col(vec_col))
        for mi, book in enumerate(books):
            probe = probe_cells_udf(book, nprobe=1)
            out = out.withColumn(
                f"code_{mi}",
                F.element_at(
                    probe(F.slice(vec_col, mi * sub_dim + 1, sub_dim)), 1
                ),
            )
        return out.drop(vec_col)

    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    cellss, mats = [], []
    for book in books:
        bc, bm = _book_matrix(book)
        cellss.append(bc)
        mats.append(bm)

    # one Arrow evaluation emitting ALL m codes per vector (the old
    # per-subspace probe chain was m separate UDF columns); per-subspace
    # math — slice, clamped-norm cosine, 6-dp round, smallest-cell
    # stable ties — is identical to probe_cells_udf's flat path
    @pandas_udf("array<long>")
    def codes(vs):
        x = np.stack(vs.to_numpy()).astype(np.float64)
        out = np.empty((len(x), m), dtype=np.int64)
        for mi in range(m):
            sub = x[:, mi * sub_dim : (mi + 1) * sub_dim]
            sn = sub / np.maximum(
                np.linalg.norm(sub, axis=1, keepdims=True), 1e-12
            )
            sims = np.round(sn @ mats[mi].T, 6)
            best = np.argsort(-sims, axis=1, kind="stable")[:, 0]
            out[:, mi] = cellss[mi][best]
        return pd.Series(list(out))

    # scan_parallelism: the code UDF runs on emb's partitioning
    out = scan_parallelism(emb).select(
        F.col(id_col), codes(F.col(vec_col)).alias("__codes")
    )
    return out.select(
        id_col,
        *[
            F.element_at("__codes", mi + 1).alias(f"code_{mi}")
            for mi in range(m)
        ],
    )


class _AdcLutOverflow(Exception):
    """Literal-LUT micro-int sum could wrap BIGINT — caller must use
    the DECIMAL-sum join path (round-7 advice item: m entries of up to
    ~1e18 magnitude each can exceed 2^63 for large-magnitude
    unnormalized dot products; unreachable for bounded embeddings, but
    unguarded wrap would be silent wrong answers)."""


def _pq_adc_literal(
    codes: DataFrame,
    qs: DataFrame,
    books: list[list[tuple[int, list[float]]]],
    m: int,
    sub_dim: int,
) -> DataFrame:
    """(neighbor_id, query_id, __adc) via the literal-array LUT: the
    per-(query, subspace, cell) partial similarities are folded into
    the projection as exact ×10⁶ micro-int literals — zero joins, one
    whole-stage-codegen pass over the codes. Entries are driver-side
    exact integer math with a provability guard (see
    ``_adc_micro_luts`` — values the guard cannot prove fall back to
    the original one-tiny-Spark-job path, bit-identical either way).
    Collects the query VECTORS driver-side, so it is gated behind
    ``PQ_LITERAL_LUT_MAX`` by the caller."""
    import functools
    import operator

    q_rows = sorted(
        (r["query_id"], [float(x) for x in r["__qv"]]) for r in qs.collect()
    )
    spark = codes.sparkSession
    qid_lit, lut_lits = _adc_micro_luts(spark, books, q_rows, m, sub_dim)

    fanout = codes.select(
        "neighbor_id",
        *[f"code_{mi}" for mi in range(m)],
        F.explode(
            F.array(*[F.lit(i) for i in range(len(q_rows))])
        ).alias("__qi"),
    )
    adc_micro = functools.reduce(
        operator.add,
        [
            F.element_at(
                F.element_at(lut_lits[mi], F.col("__qi") + 1),
                F.col(f"code_{mi}").cast("int") + 1,
            )
            for mi in range(m)
        ],
    )
    return fanout.select(
        "neighbor_id",
        F.element_at(qid_lit, F.col("__qi") + 1).alias("query_id"),
        # exact integer sum → one correctly-rounded division: equals
        # the DECIMAL(18,6)-sum path's BigDecimal.doubleValue
        (adc_micro.cast("double") / F.lit(1000000.0)).alias("__adc"),
    )


def _micro_int_exact(x: float) -> int | None:
    """Driver-side replay of Spark's
    ``round(x, 6) :: DECIMAL(18,6) × 10⁶ :: BIGINT`` for a double ``x``
    — returns the micro-int ONLY when the result is PROVABLY the one
    any JVM computes, else ``None`` (caller falls back to the Spark
    job; r14 optimization round).

    Why provable: Spark's ``round(double, 6)`` is
    ``BigDecimal.valueOf(x).setScale(6, HALF_UP)`` —
    ``Double.toString``-based, and the JDK's decimal rendering of a
    double is any round-tripping representation r (shortest on 19+,
    sometimes longer digits of the exact expansion before JDK-4511638).
    Every round-tripping r lies within one ulp of x, and HALF_UP at 6 dp
    maps the whole interval (x−ulp, x+ulp) to the SAME grid value
    unless a half-grid boundary (k+½)·10⁻⁶ falls inside it. So: check
    exactly (integer arithmetic on ``as_integer_ratio``) that no
    boundary is within one ulp — then the nearest-grid value computed
    from x's exact rational equals Spark's result on ANY JDK; otherwise
    report unprovable. The follow-up double→DECIMAL(18,6) cast is the
    identity on the rounded value (a 6-dp grid double's own interval
    never reaches a boundary below ~4×10⁹, guarded by the magnitude
    check)."""
    import math

    if not math.isfinite(x) or abs(x) > 1e9:
        return None
    num, den = x.as_integer_ratio()  # exact rational of x (den = 2^e)
    un, ud = math.ulp(x).as_integer_ratio()
    snum = num * 1_000_000  # x·10⁶ = snum/den, exact
    fl = snum // den  # floor toward −inf
    rem = snum - fl * den  # 0 ≤ rem < den
    # boundary-distance check, all integers:
    #   |x·10⁶ − (fl+½)| > ulp(x)·10⁶  ⇔  |2·rem − den|·ud > 2·den·un·10⁶
    if abs(2 * rem - den) * ud <= 2 * den * un * 1_000_000:
        return None
    return fl + 1 if 2 * rem > den else fl


def _adc_micro_entries_driver(books, q_rows, sub_dim) -> dict | None:
    """The r14 zero-job LUT-entry path: vec_dot's exact IEEE fold
    replayed in Python (same binary64 ops, same order) + the provable
    round chain (``_micro_int_exact``). Returns None as soon as any
    entry is unprovable — the caller then runs the Spark-job twin for
    the WHOLE batch (``test_adc_micro_luts_driver_math_matches_spark_job``
    pins dict equality between the two)."""
    micro: dict = {}
    for mi, book in enumerate(books):
        for qi, (_, qv) in enumerate(q_rows):
            sub = qv[mi * sub_dim : (mi + 1) * sub_dim]
            for cell, cv in sorted(book):
                if len(sub) != len(cv):
                    # zip_with would null-pad — not replayable here
                    return None
                acc = 0.0
                for a, b in zip(sub, cv):
                    acc = acc + a * b  # vec_dot's exact fold order
                v = _micro_int_exact(acc)
                if v is None:
                    return None
                micro[(mi, qi, cell)] = v
    return micro


def _adc_micro_entries_spark(spark, books, q_rows, sub_dim) -> dict:
    """The original one-tiny-Spark-job LUT-entry computation — each
    entry IS Spark's own ``round(vec_dot(...), 6) :: DECIMAL(18,6)``.
    Kept as the fallback for entries the driver-side integer replay
    cannot prove (``_micro_int_exact`` → None)."""
    lut_src = spark.createDataFrame(
        [
            (mi, qi, cell, qv[mi * sub_dim : (mi + 1) * sub_dim], cv)
            for mi, book in enumerate(books)
            for qi, (_, qv) in enumerate(q_rows)
            for cell, cv in sorted(book)
        ],
        "mi int, qi int, cell int, qv array<double>, cv array<double>",
    )
    return {
        (r["mi"], r["qi"], r["cell"]): r["micro"]
        for r in lut_src.select(
            "mi",
            "qi",
            "cell",
            (
                F.round(vec_dot("qv", "cv"), 6).cast("decimal(18,6)")
                * F.lit(1000000)
            )
            .cast("long")
            .alias("micro"),
        ).collect()
    }


def _adc_micro_luts(
    spark,
    books: list[list[tuple[int, list[float]]]],
    q_rows: list[tuple[int, list[float]]],
    m: int,
    sub_dim: int,
) -> tuple[Column, list[Column]]:
    """(qid_lit, lut_lits) — the literal-array halves of the exact ×10⁶
    micro-int ADC LUT for a driver-bounded query batch: ``qid_lit`` is
    the sorted query-id array, ``lut_lits[mi][qi][cell]`` the partial
    similarity of query ``qid_lit[qi]`` against subspace ``mi``'s cell.
    Shared by :func:`_pq_adc_literal` (flat PQ serve) and the composed
    IVF×PQ serve's literal ADC (r13 optimization round — replaces its m
    broadcast LUT joins for bounded batches).

    Entries are computed DRIVER-SIDE with zero Spark jobs (r14
    optimization round): the dot product replays ``vec_dot``'s exact
    IEEE fold (acc = 0.0; acc = acc + qv[i]·cv[i] — Python doubles and
    JVM doubles run the identical binary64 ops in the identical order),
    and the round→DECIMAL→×10⁶ chain replays through
    ``_micro_int_exact``, which PROVES each value equals Spark's own
    (any value whose JDK decimal rendering could be HALF_UP-ambiguous
    reports unprovable). If ANY entry is unprovable the whole batch
    falls back to the original one-tiny-Spark-job path
    (``_adc_micro_entries_spark``) — bit-identical either way, pinned by
    ``test_adc_micro_luts_driver_math_matches_spark_job``. Raises
    ``_AdcLutOverflow`` when the integer ADC sum could wrap (callers
    fall back to the DECIMAL-sum join path, answers identical)."""
    for book in books:
        if sorted(c for c, _ in book) != list(range(len(book))):
            raise ValueError(
                "pq literal-LUT serving requires contiguous 0..k-1 "
                "cell ids (every codebook this module trains has them); "
                f"got {sorted(c for c, _ in book)}"
            )
    micro = _adc_micro_entries_driver(books, q_rows, sub_dim)
    if micro is None:
        micro = _adc_micro_entries_spark(spark, books, q_rows, sub_dim)

    # the ADC score sums m micro-int entries: validate the worst-case
    # |sum| fits BIGINT (exactness guarantee of the integer-sum path);
    # out-of-range magnitudes bounce to the DECIMAL-sum join path
    worst = max((abs(v) for v in micro.values()), default=0) * m
    if worst >= 2**63:
        raise _AdcLutOverflow(
            f"max |LUT entry| × m = {worst} ≥ 2^63 — literal ADC sum "
            "could wrap; serving falls back to the DECIMAL-sum join LUT"
        )

    # lut[mi][qi][cell] — micro-int partial similarities; arrays typed
    # long (the L suffix) so the ADC sum can never wrap int32, and
    # element_at returns BIGINT down the whole chain. ONE SQL expr()
    # per book (r13 optimization round): both the per-element
    # F.array(F.lit(...)) form AND pyspark's F.lit(nested_list) expand
    # to one py4j round-trip per element — measured 2.5-3.4 s of pure
    # driver time at the gate geometry (3,600 entries); a single
    # JVM-parsed array literal string is ~0.01 s. Values identical:
    # exact integer literals, same array<array<bigint>> column.
    def _larr(xs) -> str:
        return "array(" + ",".join(f"{int(x)}L" for x in xs) + ")"

    # the trailing casts are value no-ops that keep containsNull=true —
    # the nullability the F.array(F.lit...).cast(...) form produced, so
    # downstream schemas (element_at nullability) are bit-identical to
    # the pre-r13 plans (pinned by the literal-vs-join schema tests)
    lut_lits = [
        F.expr(
            "array("
            + ",".join(
                _larr(
                    micro[(mi, qi, cell)] for cell, _ in sorted(book)
                )
                for qi in range(len(q_rows))
            )
            + ")"
        ).cast("array<array<long>>")
        for mi, book in enumerate(books)
    ]
    qid_lit = F.expr(_larr(qid for qid, _ in q_rows)).cast("array<long>")
    return qid_lit, lut_lits


def _pq_adc_join(
    codes: DataFrame,
    qs: DataFrame,
    books: list[list[tuple[int, list[float]]]],
    m: int,
    sub_dim: int,
) -> DataFrame:
    """(neighbor_id, query_id, __adc) via broadcast LUT joins: each
    subspace's (query, cell) partial-similarity table is built ON the
    cluster (query vectors never reach the driver) and broadcast-joined
    onto the codes. This is the scale path past ``PQ_LITERAL_LUT_MAX``
    — the LUT is still tiny (n_queries × k rows per subspace) but too
    wide to fold into the plan as literals. DECIMAL(18,6)-exact entries
    and sum keep it hash-identical to the literal path
    (``test_pq_topk_join_lut_fallback_matches_literal``)."""
    import functools
    import operator

    spark = codes.sparkSession
    scored = codes
    for mi, book in enumerate(books):
        cb = spark.createDataFrame(
            [(c, v) for c, v in book], "cell long, __cv array<double>"
        )
        lut = qs.crossJoin(F.broadcast(cb)).select(
            "query_id",
            F.col("cell").alias(f"code_{mi}"),
            F.round(
                vec_dot(F.slice("__qv", mi * sub_dim + 1, sub_dim), "__cv"), 6
            )
            .cast("decimal(18,6)")
            .alias(f"__lv{mi}"),
        )
        on = [f"code_{mi}"] if mi == 0 else ["query_id", f"code_{mi}"]
        scored = scored.join(F.broadcast(lut), on)
    lv_sum = functools.reduce(
        operator.add, [F.col(f"__lv{mi}") for mi in range(m)]
    )
    return scored.select(
        "neighbor_id",
        "query_id",
        F.round(lv_sum, 6).cast("double").alias("__adc"),
    )


def pq_topk(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    m: int = PQ_M,
    sub_dim: int = PQ_SUB_DIM,
    k: int = PQ_K,
    iters: int = PQ_ITERS,
    n_queries: int = 10,
    topk: int = 5,
    shortlist: int = PQ_SHORTLIST,
    books: list[list[tuple[int, list[float]]]] | None = None,
    codes: DataFrame | None = None,
    adc: str = "auto",
) -> DataFrame:
    """Approximate inner-product top-k by product quantization:
    ADC shortlist, then exact re-rank — the production PQ serving
    shape. Queries stay exact; corpus vectors are represented by their
    per-subspace codes; each (query, code) partial similarity comes
    from a tiny LOOKUP TABLE folded into the projection as literal
    arrays (m × n_queries × k micro-int entries, ~10 KB at the frozen
    geometry — computed driver-side, zero LUT-build jobs, zero joins on
    the shortlist path), so the shortlist scan touches CODES only (the
    memory-side win: m small codes per vector instead of the full float
    payload) in ONE whole-stage-codegen pass. Only the per-query
    ``shortlist`` survivors are re-scored against their true vectors.
    Past ``PQ_LITERAL_LUT_MAX`` entries (large query batches) the ADC
    scoring falls back to broadcast LUT joins built on the cluster —
    query vectors never reach the driver, answers identical
    (``test_pq_topk_join_lut_fallback_matches_literal``).

    Determinism: every LUT entry IS Spark's
    ``round(vec_dot(...), 6) :: DECIMAL(18,6)`` — computed driver-side
    by an exact integer replay with a provability guard (unprovable
    values fall back to the original one-tiny-Spark-job path, see
    ``_adc_micro_luts``) and folded back as an exact ×10⁶ BIGINT
    literal; the ADC score is the exact integer sum cast to double via
    one correctly-rounded division, which equals the DECIMAL-sum
    path's value (both correctly round the same rational). The exact re-rank rounds the true dot to 6 dp — the
    full pipeline (codebooks → codes → LUTs → shortlist → re-rank) is
    hash-checkable, and ``test_pq_literal_lut_matches_join_lut`` pins
    equality against the broadcast-LUT-join formulation. Approximate =
    whether a true neighbor survives the shortlist, never
    nondeterminism.

    ``books=None`` trains the codebooks in-line (the self-contained demo
    shape); pass pre-trained codebooks (see ``save_pq_codebooks``/
    ``load_pq_codebooks``) for the build-once/query-many serving shape —
    training changes the COST, not the answer, because the k-means is
    zero-RNG deterministic. ``codes`` (requires ``books``) additionally
    skips the per-call corpus encode: pass the persisted
    ``pq_encode(...)`` output — (id_col, code_0..code_{m-1}), encoded
    with THESE books — and the shortlist scan starts straight from the
    index, the full build-once/serve-many shape (encode is
    deterministic, so the artifact changes cost, never the answer:
    ``test_pq_topk_pre_encoded_codes_match_inline``).

    ``adc`` picks the ADC scoring path: ``"auto"`` (default) gates on
    the LUT entry count — when the declared ``n_queries`` id range
    exceeds ``PQ_LITERAL_LUT_MAX`` entries it probes the ACTUAL query
    count once (ids can be sparse) before giving up the literal path;
    serve-many callers that already know their regime pass
    ``"literal"`` or ``"join"`` to skip that probe job entirely
    (round-7 advice item). The hints are answer-identical (the two
    formulations are equality-pinned), and every literal attempt —
    hinted or auto — still bounces to the join path when the LUT
    magnitudes could wrap the BIGINT ADC sum (``_AdcLutOverflow``).
    """
    if adc not in ("auto", "literal", "join"):
        raise ValueError(f"adc must be auto|literal|join, got {adc!r}")
    if books is None:
        if codes is not None:
            raise ValueError(
                "pq_topk(codes=...) requires the books the codes were "
                "encoded with — pass both or neither"
            )
        books = pq_train_codebooks(emb, id_col, vec_col, m, sub_dim, k, iters)
    else:
        # Pre-trained codebooks CARRY their geometry — derive (m,
        # sub_dim) from them instead of trusting the parameters, so
        # books trained at a non-default shape can never silently sum
        # too few subspaces (wrong shortlist) or reference missing LUT
        # columns (AnalysisException).
        m = len(books)
        sub_dim = len(books[0][0][1])
    if codes is None:
        codes = pq_encode(emb, id_col, vec_col, books, sub_dim)
    codes = codes.withColumnRenamed(id_col, "neighbor_id")
    qs = emb.filter(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")
    )
    if adc == "auto":
        total_k = sum(len(book) for book in books)
        lut_entries = n_queries * total_k
        if lut_entries > PQ_LITERAL_LUT_MAX:
            # the parameter bounds the id range, not the match count —
            # ids can be sparse, so probe the ACTUAL query set before
            # giving up the literal path. limit() caps the probe at
            # one-past-the-threshold so the check never scans a
            # genuinely large query set end-to-end just to confirm the
            # fallback. Serve-many loops that know their regime skip
            # this job with an explicit adc hint.
            cap = PQ_LITERAL_LUT_MAX // total_k + 1
            lut_entries = qs.limit(cap).count() * total_k
        use_literal = lut_entries <= PQ_LITERAL_LUT_MAX
    else:
        use_literal = adc == "literal"
        if use_literal:
            # The hint skips the sparse-id PROBE job, not the size
            # contract (round-8 advice item): an unbounded hinted
            # literal path would collect every query vector
            # driver-side and fold an n_queries×m×k literal array
            # into the plan. Gate on the DECLARED id range (zero
            # extra jobs, same as the hint's promise) with a generous
            # multiple of the auto gate — sparse-id callers inside
            # the ceiling keep their skip; a declared range this far
            # past the gate is the join regime regardless of
            # sparsity, and the two paths are answer-identical.
            total_k = sum(len(book) for book in books)
            if n_queries * total_k > PQ_LITERAL_HINT_MAX_ENTRIES:
                use_literal = False
    if use_literal:
        try:
            scored = _pq_adc_literal(codes, qs, books, m, sub_dim)
        except _AdcLutOverflow:
            # entries too large for the exact integer sum — the
            # DECIMAL-sum join formulation is exact at any magnitude
            use_literal = False
            scored = _pq_adc_join(codes, qs, books, m, sub_dim)
    else:
        scored = _pq_adc_join(codes, qs, books, m, sub_dim)
    cand = per_group_topk(
        scored.filter(F.col("neighbor_id") != F.col("query_id")),
        "query_id",
        "__adc",
        "neighbor_id",
        shortlist,
        "__crn",
    ).select("query_id", "neighbor_id")
    # Exact re-rank of the shortlist: candidates are bounded per query,
    # so the vector fetch is an equi-join touching only survivors.
    nv = emb.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__nv")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("neighbor_id")
    )
    # broadcast the query vectors only in the literal regime, where the
    # set is provably tiny; on the fallback path qs is by definition
    # large — let the planner pick the join strategy
    qv_side = F.broadcast(qs) if use_literal else qs
    return (
        cand.join(nv, "neighbor_id")
        .join(qv_side, "query_id")
        .withColumn("score", F.round(vec_dot("__nv", "__qv"), 6))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
        .select(
            "query_id",
            "neighbor_id",
            "score",
            F.col("rank").cast("long").alias("rank"),
        )
    )


# --------------------------------------------------------------------------
# Composed IVF×PQ index — the billion-scale serving shape (round-10
# verdict item 2): PQ codes stored PER IVF CELL, ADC scored within
# probed cells only, exact re-rank from source vectors.
# --------------------------------------------------------------------------


def build_ivfpq_index(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    index_root: str,
    k_cells: int,
    pq_k: int = PQ_K,
    iters: int = 3,
    pq_iters: int = PQ_ITERS,
) -> None:
    """Persist a composed IVF×PQ index: IVF centroids + PQ codebooks +
    the corpus's PQ CODES partitioned by IVF cell — the production
    billion-scale ANN artifact (FAISS's IVFPQ layout, re-expressed as
    parquet partitions): a query probes nprobe cell directories
    (partition pruning), ADC-scores the m-byte-scale codes it finds
    there — never full vectors, never unprobed cells — and only the
    shortlist survivors fetch true vectors for the exact re-rank.

    Build plan (nightly, offline): one k-means for the coarse
    quantizer, one joint PQ training pass, one encode pass, and one
    equi-join stitching (id → cell) onto (id → codes) before the
    partitioned write — at 100 TB that join is the build's only
    shuffle of corpus-sized data and runs once per index version.
    Every component is the zero-RNG deterministic kernel the separate
    IVF and PQ indexes already use, so the composed index inherits
    their identical-answer contract: the artifact changes COST, never
    the answer."""
    spark = df.sparkSession
    cents = kmeans_centroids(df, id_col, vec_col, k=k_cells, iters=iters)
    cents.write.parquet(f"{index_root}/centroids")
    books = pq_train_codebooks(
        df, id_col, vec_col, k=pq_k, iters=pq_iters
    )
    save_pq_codebooks(spark, books, f"{index_root}/codebooks")
    cent_rows = [
        (int(r["cell"]), [float(x) for x in r[vec_col]])
        for r in cents.collect()
    ]
    assign1 = probe_cells_udf(cent_rows, nprobe=1)
    cells = df.select(
        F.col(id_col),
        F.element_at(assign1(F.col(vec_col)), 1).alias("cell"),
    )
    codes = pq_encode(df, id_col, vec_col, books)
    codes.join(cells, id_col).write.partitionBy("cell").parquet(
        f"{index_root}/codes"
    )


def append_to_ivfpq_index(
    new_batch: DataFrame,
    index_root: str,
    id_col: str,
    vec_col: str,
) -> int:
    """INCREMENTAL maintenance of a persisted IVF×PQ index (the
    continuous-ingestion twin of the nightly ``build_ivfpq_index`` —
    round-10 verdict item 5): assign the new batch's vectors to their
    nearest cells against the FROZEN coarse centroids, PQ-encode them
    against the FROZEN codebooks (no retrain anywhere — the index
    version stays answer-stable; recall decays only with genuine
    distribution drift, which the nightly rebuild resets), and APPEND
    the codes into the existing per-cell partition directories
    (dynamic-partition append: only touched cell dirs gain files; no
    existing file is rewritten, so concurrent readers keep a
    consistent view and the append is batch-cost, never index-cost).

    Returns the new artifact version number; each append records a
    ``versions/v{n}.json`` manifest (rows appended, cells touched) so
    serving/monitoring can see what each increment added.

    Scale shape: per-batch cost = one bounded centroid collect
    (k_cells rows), one Arrow-batched assignment + encode pass over
    the BATCH, one batch-sized shuffle into cell partitions. The
    100 TB base corpus is never read, never re-encoded, never
    re-shuffled. Queries served from the index see base + all appended
    batches identically to a from-scratch build with the same frozen
    centroids/codebooks (pytest-pinned; hash-gated via
    ``embedding_ivfpq_append_topk``).

    Rebuild threshold (measured): recall@5 under appends is pinned by
    ``test_ivfpq_recall_holds_under_appends`` — on same-distribution
    appends it stays flat (0.96 → 0.96 → 0.92 → 0.96 at 23%/45%/67%
    of base appended, sf0.001 geometry k=18/nprobe=5), because frozen
    quantizers only lose recall with genuine DISTRIBUTION drift, not
    with volume. Operational rule: schedule the nightly/weekly rebuild
    when EITHER (a) cumulative appended rows exceed ~50% of the base
    build (past the measured flat region — cheap insurance even
    without drift), or (b) ``ivfpq_cell_drift`` shows the appended
    batch's cell-occupancy distribution diverging from the base's
    (ratio_new_vs_base outside ~[0.5, 2.0] on cells holding a
    meaningful share) — that skew is exactly what stale centroids look
    like, and it degrades both recall and probe balance before any
    volume rule fires.

    Concurrency contract: SINGLE WRITER. Index maintenance (appends and
    ``optimize_ivfpq_cells``) is a serialized nightly/periodic job, the
    same contract as ``build_ivfpq_index`` itself — two concurrent
    appenders could interleave partition files and race the version
    counter. The manifest write is an O_EXCL create that retries on
    collision, so a violated contract can mislabel which rows belong to
    which version but can never silently LOSE a manifest; the data
    files themselves are append-only either way. The manifest lives on
    the same filesystem as ``index_root`` (driver-visible here; at
    production scale index_root is an object-store prefix and the
    manifest goes through the same store as the codes)."""
    import json
    import os

    spark = new_batch.sparkSession
    cents = read_parquet_memo(spark, f"{index_root}/centroids")
    cent_rows = [
        (int(r["cell"]), [float(x) for x in r[vec_col]])
        for r in cents.collect()
    ]
    assign1 = probe_cells_udf(cent_rows, nprobe=1)
    cells = new_batch.select(
        F.col(id_col),
        F.element_at(assign1(F.col(vec_col)), 1).alias("cell"),
    )
    books = load_pq_codebooks(spark, f"{index_root}/codebooks")
    codes = pq_encode(new_batch, id_col, vec_col, books).join(cells, id_col)
    codes.persist()
    try:
        touched = sorted(
            int(r["cell"])
            for r in codes.select("cell").distinct().collect()
        )
        n_rows = codes.count()
        codes.write.mode("append").partitionBy("cell").parquet(
            f"{index_root}/codes"
        )
    finally:
        codes.unpersist()
    return _record_index_version(
        index_root, {"type": "append", "rows": n_rows, "cells": touched}
    )


def _record_index_version(index_root: str, payload: dict) -> int:
    """Atomically claim the next version number for an index-maintenance
    manifest: O_EXCL create of ``versions/v{n}.json`` — if two writers
    violate the single-writer contract and race the same n, the loser's
    create fails and retries at n+1 instead of silently overwriting the
    winner's manifest (round-11 advice)."""
    import json
    import os

    vdir = os.path.join(index_root, "versions")
    os.makedirs(vdir, exist_ok=True)
    while True:
        version = (
            max(
                (
                    int(f[1:-5])
                    for f in os.listdir(vdir)
                    if f.startswith("v") and f.endswith(".json")
                ),
                default=0,
            )
            + 1
        )
        path = os.path.join(vdir, f"v{version}.json")
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            continue
        with os.fdopen(fd, "w") as fh:
            json.dump({"version": version, **payload}, fh)
        return version


#: Target bytes per compacted cell file. Local-test sized; at 100 TB
#: set to the store's sweet spot (e.g. 128-512 MiB for HDFS/S3 parquet).
IVFPQ_COMPACT_TARGET_BYTES = 32 << 20


def optimize_ivfpq_cells(
    spark,
    index_root: str,
    target_file_bytes: int = IVFPQ_COMPACT_TARGET_BYTES,
    min_files: int = 2,
) -> dict:
    """Compact the small-file tail that :func:`append_to_ivfpq_index`
    accumulates (each append adds >= 1 file per touched cell; after N
    nightly increments a hot cell holds N tiny files and every probe
    pays N footer reads + task setups): rewrite each cell partition
    whose file count exceeds ``min_files`` into
    ``ceil(cell_bytes / target_file_bytes)`` files, leaving cold cells
    untouched.

    Answer- and content-stable by construction: compaction reads a cell
    partition and writes the SAME rows back (coalesce, no shuffle, no
    re-encode — codes are already frozen-codebook products), so queries
    before and after return identical results (pytest-pinned against
    the ``embedding_ivfpq_append_topk`` oracle semantics). The rewrite
    is staged: new files land in a ``.compact_<cell>`` sibling, then
    the old files are swapped out dir-atomically — a reader mid-swap on
    a local FS could glimpse the swap window, which is why compaction
    runs under the index's SINGLE-WRITER maintenance contract (see
    ``append_to_ivfpq_index``); a production deployment wanting
    concurrent readers puts the codes table behind a snapshot-isolated
    table format (the sources/cowtable.py pattern: manifest-swap
    commits).

    Scale shape: cost = read + write of the TOUCHED cells only (driver
    lists directories, never rows; the base corpus is never re-read,
    centroids/codebooks never loaded). Version-recorded like appends
    (``versions/v{n}.json`` with type=optimize), so monitoring sees
    compactions in the same ledger. Returns the summary manifest."""
    import glob as _glob
    import math
    import os
    import shutil

    codes_root = os.path.join(index_root, "codes")
    compacted: list[int] = []
    files_before = 0
    files_after = 0
    for cell_dir in sorted(_glob.glob(os.path.join(codes_root, "cell=*"))):
        parts = [
            p
            for p in _glob.glob(os.path.join(cell_dir, "*.parquet"))
            if os.path.isfile(p)
        ]
        if len(parts) <= min_files:
            continue
        cell = int(os.path.basename(cell_dir).split("=", 1)[1])
        nbytes = sum(os.path.getsize(p) for p in parts)
        n_target = max(1, math.ceil(nbytes / target_file_bytes))
        if n_target >= len(parts):
            continue
        staged = os.path.join(
            os.path.dirname(cell_dir), f".compact_{cell}"
        )
        shutil.rmtree(staged, ignore_errors=True)
        spark.read.parquet(cell_dir).coalesce(n_target).write.parquet(staged)
        new_parts = [
            p
            for p in _glob.glob(os.path.join(staged, "*.parquet"))
            if os.path.isfile(p)
        ]
        for p in parts:
            os.remove(p)
        for p in new_parts:
            shutil.move(p, os.path.join(cell_dir, os.path.basename(p)))
        shutil.rmtree(staged, ignore_errors=True)
        compacted.append(cell)
        files_before += len(parts)
        files_after += len(new_parts)
    summary = {
        "type": "optimize",
        "cells": compacted,
        "files_before": files_before,
        "files_after": files_after,
    }
    if compacted:
        summary["version"] = _record_index_version(index_root, summary)
    return summary


def ivfpq_index_version(index_root: str) -> int:
    """Current version of a persisted IVF×PQ index: 0 = the initial
    build, +1 per :func:`append_to_ivfpq_index` increment."""
    import os

    vdir = os.path.join(index_root, "versions")
    if not os.path.isdir(vdir):
        return 0
    return max(
        (
            int(f[1:-5])
            for f in os.listdir(vdir)
            if f.startswith("v") and f.endswith(".json")
        ),
        default=0,
    )


def ivfpq_query_index(
    spark,
    index_root: str,
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    topk: int,
    nprobe: int = 2,
    shortlist: int = PQ_SHORTLIST,
    where: Column | None = None,
) -> DataFrame:
    """Query a persisted IVF×PQ index (``build_ivfpq_index``):

    1. probe each query's top-``nprobe`` cells against the stored IVF
       centroids (same math as ``ivf_query_index``; for a
       driver-bounded query batch the probe runs driver-side on the
       collected vectors via the shared ``probe_cells_fn`` numpy core —
       bit-identical cells, zero probe jobs — wider batches keep the
       Arrow-batched executor UDF);
    2. scan ONLY the probed cells' partitions of the CODES table
       (static partition pruning via a literal IN under
       ``IVF_PRUNE_LITERAL_MAX``, else the equi-join prunes) — the
       scan touches m small codes per vector, never embeddings;
    3. ADC-score candidates: for driver-bounded query batches (≤
       ``PQ_LITERAL_LUT_MAX`` LUT entries — the serving norm) the
       per-(query, subspace, cell) partial similarities fold into the
       projection as exact ×10⁶ micro-int LITERALS (zero LUT joins —
       the ``_pq_adc_literal`` machinery); wider batches fall back to
       per-subspace DECIMAL(18,6) lookup tables built ON the cluster
       and broadcast (the ``_pq_adc_join`` formulation — query vectors
       never reach the driver). Both paths are answer-identical
       (equality pytest-pinned); keep the per-query ``shortlist``
       survivors;
    4. exact re-rank: survivors equi-join their TRUE vectors from
       ``corpus`` (bounded: shortlist × |queries| rows fetched).

    ``where``: optional metadata predicate over the CODES table's
    columns (the id at minimum; store metadata columns alongside the
    codes to widen it) — FILTERED composed ANN with PRE-FILTER
    semantics, the same contract as ``ivf_query_index(where=...)``:
    the predicate lands directly on the pruned codes scan (Catalyst
    pushes it to the parquet reader beside the cell PartitionFilters),
    non-matching candidates die before any ADC math, and the shortlist
    is the top among PASSING candidates within the probed cells —
    never the filter-after-search starvation hole.

    Per-query IO at scale: (nprobe/k_cells) of the CODES table — which
    is itself ~m bytes per vector instead of dim floats — so composed
    pruning multiplies: IVF cuts the candidate rows, PQ cuts the bytes
    per row. Determinism: every stage is the same 6-dp-rounded,
    DECIMAL-exact, stable-tie kernel the separate IVF and PQ paths
    hash-check with; 'approximate' is recall (does a true neighbor's
    cell get probed / survive the shortlist), never nondeterminism."""
    import functools
    import operator

    cents = read_parquet_memo(spark, f"{index_root}/centroids")
    cent_rows = [
        (int(r["cell"]), [float(x) for x in r[vec_col]])
        for r in cents.collect()
    ]
    qs = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")
    )
    books = load_pq_codebooks(spark, f"{index_root}/codebooks")
    m = len(books)
    sub_dim = len(books[0][0][1])
    # ADC scoring gate (r13/r14 optimization rounds): for a
    # driver-bounded query batch (the serving norm) the per-(query,
    # subspace, cell) partial similarities fold into the projection as
    # exact ×10⁶ micro-int LITERALS (the _pq_adc_literal machinery) —
    # zero LUT joins, zero broadcast builds, one whole-stage-codegen
    # pass over the pruned candidates. Gate = the same
    # PQ_LITERAL_LUT_MAX entry budget the flat-PQ serve uses; the
    # bounded limit(cap+1).collect() probes the ACTUAL batch size with
    # one tiny job (collecting ≤ cap+1 query vectors — the same driver
    # sanction as _pq_adc_literal). Wide batches and LUT-magnitude
    # overflows keep the broadcast DECIMAL-sum join formulation below —
    # answers identical either way (integer micro-sum/1e6 and the
    # DECIMAL(18,6) sum correctly round the same rational; equality
    # pytest-pinned).
    #
    # For the bounded batch, the collected rows ARE the query set for
    # the WHOLE serve (r14): the cell probe runs driver-side on them
    # (probe_cells_fn — the same numpy core the executor UDF wraps, so
    # cells are bit-identical), qcells/probed/the re-rank broadcast all
    # derive from this ONE evaluation of `queries`. That removes two
    # driver jobs per serve (the qcells distinct().collect() and the
    # separate re-rank scan of `queries`) AND makes the literal LUT
    # consistent with the candidate set by construction even when the
    # caller's frame is nondeterministic (r13 advice item: a sampled
    # `queries` evaluated twice could otherwise put a query_id in the
    # candidates that is absent from the LUT, and element_at(..., 0)
    # raised instead of falling back).
    total_k = sum(len(book) for book in books)
    cap = PQ_LITERAL_LUT_MAX // total_k if total_k else 0
    q_probe = qs.limit(cap + 1).collect() if cap else []
    bounded = 0 < len(q_probe) <= cap
    if bounded:
        import numpy as np

        from pyspark.sql.types import LongType, StructField, StructType

        q_rows = sorted(
            (r["query_id"], [float(x) for x in r["__qv"]]) for r in q_probe
        )
        cell_rows = probe_cells_fn(cent_rows, nprobe=nprobe)(
            np.array([qv for _, qv in q_rows], dtype=np.float64)
        )
        qcell_pairs = [
            (qid, int(c))
            for (qid, _), row in zip(q_rows, cell_rows)
            for c in row
        ]
        qcells = spark.createDataFrame(
            qcell_pairs,
            StructType(
                [qs.schema["query_id"], StructField("cell", LongType())]
            ),
        )
        probed = sorted({c for _, c in qcell_pairs})
        # every later use of the query set reads the collected batch —
        # `queries` is evaluated exactly once per serve
        qs = spark.createDataFrame(q_probe, qs.schema)
    else:
        probe_n = probe_cells_udf(cent_rows, nprobe=nprobe)
        qcells = qs.select(
            "query_id", F.explode(probe_n(F.col("__qv"))).alias("cell")
        )
        # probed-cell set: bounded by |queries| × nprobe — driver
        # metadata, same sanction as ivf_query_index
        probed = sorted(
            {r["cell"] for r in qcells.select("cell").distinct().collect()}
        )
    codes = read_parquet_memo(spark, f"{index_root}/codes")
    if len(probed) <= IVF_PRUNE_LITERAL_MAX:
        # literal IN on the partition column → PartitionFilters prune
        # the scan to the probed cell directories (plan-gated)
        codes = codes.filter(F.col("cell").isin(*[int(c) for c in probed]))
    # else: the equi-join below drops unprobed cells (the raised-clamp
    # guard ivf_query_index documents)
    if where is not None:
        codes = codes.filter(where)
    cand = (
        scan_parallelism(codes)
        .withColumnRenamed(id_col, "neighbor_id")
        .join(qcells, "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
    )
    adc = None
    if bounded:
        try:
            qid_lit, lut_lits = _adc_micro_luts(
                spark, books, q_rows, m, sub_dim
            )
        except _AdcLutOverflow:
            pass
        else:
            qi = F.array_position(qid_lit, F.col("query_id")).cast("int")
            adc_micro = functools.reduce(
                operator.add,
                [
                    F.element_at(
                        F.element_at(lut_lits[mi], qi),
                        F.col(f"code_{mi}").cast("int") + 1,
                    )
                    for mi in range(m)
                ],
            )
            adc = cand.select(
                "query_id",
                "neighbor_id",
                # exact integer sum → one correctly-rounded division:
                # equals the DECIMAL-sum path's BigDecimal.doubleValue
                (adc_micro.cast("double") / F.lit(1000000.0)).alias(
                    "__adc"
                ),
            )
    if adc is None:
        # ADC via broadcast LUT joins — identical math to _pq_adc_join
        # (DECIMAL(18,6) entries and sum), but candidates already carry
        # query_id from the cell join, so every LUT join is on
        # (query_id, code); the codebook frame's cell-id column is named
        # apart from the IVF "cell" partition column
        scored = cand
        for mi, book in enumerate(books):
            cb = spark.createDataFrame(
                [(c, v) for c, v in book], "pq_cell long, __cv array<double>"
            )
            lut = qs.crossJoin(F.broadcast(cb)).select(
                "query_id",
                F.col("pq_cell").alias(f"code_{mi}"),
                F.round(
                    vec_dot(
                        F.slice("__qv", mi * sub_dim + 1, sub_dim), "__cv"
                    ),
                    6,
                )
                .cast("decimal(18,6)")
                .alias(f"__lv{mi}"),
            )
            scored = scored.join(F.broadcast(lut), ["query_id", f"code_{mi}"])
        lv_sum = functools.reduce(
            operator.add, [F.col(f"__lv{mi}") for mi in range(m)]
        )
        adc = scored.select(
            "query_id",
            "neighbor_id",
            F.round(lv_sum, 6).cast("double").alias("__adc"),
        )
    cand_ids = per_group_topk(
        adc, "query_id", "__adc", "neighbor_id", shortlist, "__crn"
    ).select("query_id", "neighbor_id")
    nv = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__nv")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("neighbor_id")
    )
    return (
        cand_ids.join(nv, "neighbor_id")
        .join(F.broadcast(qs), "query_id")
        .withColumn("score", F.round(vec_dot("__nv", "__qv"), 6))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
        .select(
            "query_id",
            "neighbor_id",
            "score",
            F.col("rank").cast("long").alias("rank"),
        )
    )
