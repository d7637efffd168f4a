"""Scalar / array function layer (SURVEY.md §2.8) — pure Column expressions.

Everything here is built from ``pyspark.sql.functions`` so it stays inside
whole-stage codegen (no Python in the hot path). Functions that feed the
DuckDB oracle are written for *bit-deterministic* results:

- Big aggregations go through DECIMAL (exact, order-insensitive) and are
  cast to DOUBLE at the output — the same exact value converts to the
  same double on both engines, so the order Spark reduces partitions in
  cannot perturb the hash. Plain double sums would differ in the last
  ulps between engines/orders.
- Small fixed-length float reductions (e.g. 64-dim dot products) are
  rounded at the output instead.
- Known oracle-side hazard: DuckDB's direct decimal→double cast divides
  the int128 mantissa by 10^scale in binary and can land 1 ulp off the
  correctly-rounded double at whole-table magnitudes (≳2^53 scaled
  units), while Spark/Python convert correctly rounded. Where a single
  output aggregates the entire fact table, route the oracle through
  ``CAST(CAST(x AS VARCHAR) AS DOUBLE)`` — DuckDB's string→double parse
  IS correctly rounded (see lineitem_grouping_sets).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Decimal wide enough for sf-scale money sums; scale 6 keeps cents exact.
_DEC = "decimal(28,6)"


def clamp(col: Column | str, lo: float, hi: float) -> Column:
    """Range clamp ``LEAST(GREATEST(x, lo), hi)``
    (reference: dags/sql/de_spotify_silver.sql:19-31)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.least(F.greatest(c, F.lit(lo)), F.lit(hi))


def dsum(col: Column | str, alias: str | None = None) -> Column:
    """Order-insensitive exact sum of a money-like double column:
    cast→DECIMAL, sum exactly, cast back to DOUBLE."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.cast(_DEC)).cast("double")
    return out.alias(alias) if alias else out


def davg(col: Column | str, alias: str | None = None) -> Column:
    """Deterministic mean: exact decimal sum → double, divided by count."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.cast(_DEC)).cast("double") / F.count(c)
    return out.alias(alias) if alias else out


def bin_floor(col: Column | str, width: float, lo: float = 0.0) -> Column:
    """Histogram bin lower edge: ``lo + floor((x - lo)/width) * width``
    (dashboard binned aggregations, SURVEY.md §2.4 A10)."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.floor((c - F.lit(lo)) / F.lit(width)) * F.lit(width) + F.lit(lo)).cast(
        "double"
    )


# ---------------------------------------------------------------------------
# Vector functions over array<float|double> embeddings (similarity surface)
# ---------------------------------------------------------------------------


def vec_dot(a: Column | str, b: Column | str) -> Column:
    """Dot product via ``zip_with`` + ``aggregate`` — JVM-side, no UDF.

    Measured note (round 7): an unrolled fixed-dim form (64 explicit
    ``element_at`` multiply-adds) was prototyped and REVERTED — in the
    pair-verify join plans it ran on the interpreted expression path
    and lost 3-11× to this fold (BENCH_NOTES round 7); the specialized
    HOF fold is the fast exact formulation here."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    prods = F.zip_with(ca, cb, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def vec_norm(a: Column | str) -> Column:
    ca = F.col(a) if isinstance(a, str) else a
    sq = F.aggregate(
        ca, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
    )
    return F.sqrt(sq)


#: Norm clamp for cosine denominators: an all-zero vector would divide
#: by 0 (NULL/NaN cosine + engine-dependent handling downstream); a
#: norm below this is replaced so zero vectors get cosine 0 — a defined,
#: engine-independent answer. No-op for any real vector (norm ≫ eps).
VEC_NORM_EPS = 1e-12


def vec_norm_safe(a: Column | str, eps: float = VEC_NORM_EPS) -> Column:
    """``vec_norm`` clamped away from zero — use in any cosine
    denominator so all-zero embeddings yield 0.0, not NaN."""
    return F.greatest(vec_norm(a), F.lit(eps))


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    return vec_dot(a, b) / (vec_norm_safe(a) * vec_norm_safe(b))


# ---------------------------------------------------------------------------
# Text functions (text-analysis surface)
# ---------------------------------------------------------------------------

#: Large Mersenne-ish prime that keeps ``acc*31 + ch`` inside int64
#: (acc < 1e9+7 → acc*31+255 < 3.2e10 ≪ 2^63) so the rolling hash is
#: overflow-free on engines with checked 64-bit arithmetic.
FINGERPRINT_MOD = 1_000_000_007


def token_count(col: Column | str) -> Column:
    """Whitespace token count; empty/blank strings count 0."""
    c = F.col(col) if isinstance(col, str) else col
    trimmed = F.trim(c)
    return F.when(trimmed == "", F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    )


def rolling_hash(
    col: Column | str, mult: int = 31, mod: int = FINGERPRINT_MOD
) -> Column:
    """Polynomial rolling hash of the characters (document fingerprint):
    ``h = (h*mult + ascii(ch)) mod `` — expressible identically in
    DuckDB via ``list_reduce`` for oracle parity. The defaults (31,
    1e9+7) are the FROZEN oracle-shared constants; alternate (mult,
    mod) pairs give independent ~30-bit hash streams (used to widen
    SimHash fingerprints past 30 bits)."""
    c = F.col(col) if isinstance(col, str) else col
    chars = F.split(c, "")
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * F.lit(mult) + F.ascii(ch)) % F.lit(mod),
    )


def morton_code(a: Column | str, b: Column | str, bits: int = 16) -> Column:
    """Z-order (Morton) interleave of two non-negative integer columns:
    bit i of ``a`` lands at position 2i, bit i of ``b`` at 2i+1.

    Sorting by the interleaved code clusters rows that are close in
    BOTH dimensions, so parquet row-group min/max stats stay tight for
    both columns at once — multi-dimensional data skipping from a
    one-dimensional sort, the standard layout trick for two-predicate
    scans at 100 TB (a plain sort on ``a`` leaves ``b``'s per-row-group
    ranges as wide as the whole table). Pure integer Column arithmetic,
    whole-stage-codegen friendly; values are masked to ``bits`` low
    bits first (rank/bucket wider domains before encoding).
    """
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    ca = ca.cast("long").bitwiseAND(F.lit((1 << bits) - 1))
    cb = cb.cast("long").bitwiseAND(F.lit((1 << bits) - 1))
    code = F.lit(0).cast("long")
    for i in range(bits):
        code = (
            code
            + (F.shiftright(ca, i).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * i)))
            + (F.shiftright(cb, i).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * i + 1)))
        )
    return code


def scan_parallelism(df):
    """Round-robin repartition to the cluster's default parallelism —
    ONLY when the frame currently has fewer partitions (returns ``df``
    untouched otherwise, so this is a NO-OP at production scale, where
    any real table scan yields at least cores-many splits).

    Why it exists (round 7): heavy per-row compute that sits between a
    scan and the first shuffle — pair-join cosine HOFs, LSH sketches,
    k-means assignment probes, shingle hashing — inherits the SCAN's
    partitioning. A small parquet file with a single row group is
    unsplittable (Spark's byte-range splits align to row groups), so at
    toy/stress scale that whole phase serializes into 1-2 tasks and the
    measured cost of the quadratic-ish operators is ~cores× inflated
    (semantic dedup at the 10× stress replica: 40 s serial vs ~2 s
    parallel, identical rows). The shuffle this inserts moves only the
    small frame that failed the partition check, and every consumer in
    this package applies it to per-row-deterministic work whose
    downstream aggregations are order-independent, so answers are
    bit-identical.

    Returns a DataFrame; computing ``rdd.getNumPartitions`` converts
    the plan driver-side without launching a job."""
    sc = df.sparkSession.sparkContext
    want = sc.defaultParallelism
    if df.rdd.getNumPartitions() < want:
        return df.repartition(want)
    return df
