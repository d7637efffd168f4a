"""Temporal join operators Spark lacks natively: as-of join and banded
interval join (SURVEY.md §2.3 notes the reference has NO joins; these are
the engine's extension surface for event/time-series data).

Scale design:

- ``asof_join`` is the MERGE form: union both sides, one shuffle on the
  ``by`` keys, a sort within partitions, and a ``last(ignoreNulls)``
  running window. The naive form — inequality join then argmax — builds
  |left| × |right-per-key| intermediates; the merge form is linear in
  the union and is the only shape that survives 100 TB. Skewed keys
  split fine under AQE because the window partitions on ``by`` exactly
  like the shuffle.
- ``interval_pairs_within`` relies on an equi-key (the band) so Catalyst
  plans a hash join, never a broadcast-nested-loop: each row joins only
  its own and its neighbor band, turning an O(n²) theta join into
  O(n × band_width) — the standard banded range-join decomposition.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _orderable_type(dt) -> bool:
    """True when Spark can sort the type: maps are unorderable; arrays
    and structs inherit from their element/field types."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    if isinstance(dt, MapType):
        return False
    if isinstance(dt, ArrayType):
        return _orderable_type(dt.elementType)
    if isinstance(dt, StructType):
        return all(_orderable_type(f.dataType) for f in dt.fields)
    return True


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: list[str],
    left_ts: str,
    right_ts: str,
    right_prefix: str = "right_",
    how: str = "inner",
) -> DataFrame:
    """For every left row, attach the LATEST right row with
    ``right_ts <= left_ts`` sharing the ``by`` keys (backward as-of, the
    pandas ``merge_asof`` / DuckDB ``ASOF JOIN`` semantics).

    Implementation: union-merge, not a join —

    1. tag right rows 0 / left rows 1, union on (by, ts) with the whole
       right row packed into ONE struct (so a running ``last`` can never
       mix columns from different right rows, even through NULL fields);
    2. one window per ``by`` key ordered by (ts, side, payload):
       ``last(payload, ignoreNulls)`` over unbounded-preceding..current.
       Right-before-left at equal ts makes the match inclusive; payload
       as the final sort key makes equal-timestamp right rows resolve
       deterministically (greatest struct wins);
    3. keep left rows; ``how='inner'`` drops unmatched, ``'left'`` keeps
       them with NULL right columns.

    Output: all left columns + every right column prefixed with
    ``right_prefix``.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"asof_join: how must be 'inner' or 'left', got {how!r}")
    payload = F.struct(*[F.col(c) for c in right.columns])
    r = right.select(
        *by,
        F.col(right_ts).alias("__ts"),
        payload.alias("__payload"),
        F.lit(0).alias("__side"),
    )
    l = (
        left.withColumn("__ts", F.col(left_ts))
        .withColumn("__payload", F.lit(None).cast(r.schema["__payload"].dataType))
        .withColumn("__side", F.lit(1))
    )
    u = l.unionByName(r, allowMissingColumns=True)
    # The payload's place in the sort is ONLY the equal-timestamp
    # tie-break; a right table carrying an unorderable column (map)
    # would fail the whole window sort, so tie-break on the orderable
    # subset of right columns instead (identity: the full payload when
    # every column is orderable — the common case keeps its exact sort).
    # A right table with NO orderable column degrades to arbitrary-but-
    # single-valued ties (last() still picks exactly one right row).
    orderable = [
        c for c in right.columns if _orderable_type(right.schema[c].dataType)
    ]
    if len(orderable) == len(right.columns):
        tie = F.col("__payload")
    elif orderable:
        tie = F.struct(*[F.col("__payload").getField(c) for c in orderable])
    else:
        tie = F.lit(0)
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col("__ts").asc(), F.col("__side").asc(), tie.asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.withColumn("__m", F.last("__payload", ignorenulls=True).over(w)).filter(
        F.col("__side") == 1
    )
    if how == "inner":
        matched = matched.filter(F.col("__m").isNotNull())
    out_cols = [F.col(c) for c in left.columns] + [
        F.col("__m").getField(c).alias(f"{right_prefix}{c}") for c in right.columns
    ]
    return matched.select(*out_cols)


def interval_pairs_within(
    df: DataFrame,
    by: list[str],
    ts_col: str,
    id_col: str,
    max_gap: Column,
) -> DataFrame:
    """Ordered pairs (a, b) of rows sharing ``by`` where b happens no
    later than ``max_gap`` after a (a strictly before b by
    (ts, id) — so equal timestamps pair exactly once, never self).

    The equi-join on ``by`` keeps this a hash join; the gap predicate is
    evaluated post-match. When no equi-key exists at all, bucketize
    ``ts`` by ``max_gap`` width and join bucket ∪ bucket+1 instead (the
    banded decomposition) — with ``by`` present the key already bounds
    the fanout.
    """
    a = df.select(
        *by, F.col(id_col).alias("id_a"), F.col(ts_col).alias("__ts_a")
    )
    b = df.select(
        *by, F.col(id_col).alias("id_b"), F.col(ts_col).alias("__ts_b")
    )
    after_a = (F.col("__ts_b") > F.col("__ts_a")) | (
        (F.col("__ts_b") == F.col("__ts_a")) & (F.col("id_b") > F.col("id_a"))
    )
    return (
        a.join(b, by)
        .filter(after_a & (F.col("__ts_b") <= F.col("__ts_a") + max_gap))
        .select(
            *by,
            "id_a",
            "id_b",
            F.col("__ts_a").alias("ts_a"),
            F.col("__ts_b").alias("ts_b"),
        )
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    salt_from: str,
    buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant shuffle join: the big (left) side gets a
    deterministic salt in [0, buckets) from ``hash(salt_from)``; the
    right side is replicated buckets× via an exploded sequence; the join
    key becomes (key, salt), so one hot key's rows spread over
    ``buckets`` reducers instead of melting a single task. Result is
    row-identical to the plain join — the salt only reshapes the
    shuffle.

    The salt source is a hash of an existing column, never ``rand()``:
    a retried/speculated task must salt a row identically or join
    results change under retry. Cost: the right side's shuffle volume
    multiplies by ``buckets`` — use AQE's skew-join split for moderate
    skew and salting when a single key exceeds one executor's memory
    (the 100 TB hot-partition case: a null-ish default key, a celebrity
    user, a boilerplate document hash).

    ``how`` is restricted to the LEFT-side-preserving joins: salting
    replicates the right side, so right/full outer joins would emit one
    phantom unmatched row per non-matching replica — buckets-1 extras
    per matched key — breaking the row-identity contract. For a skewed
    right-preserving join, swap the sides and call with the mirrored
    ``how``."""
    allowed = {"inner", "left", "leftouter", "left_outer",
               "leftsemi", "left_semi", "leftanti", "left_anti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join: how={how!r} would emit phantom rows for "
            f"replicated right-side non-matches; use one of {sorted(allowed)}"
        )
    sl = left.withColumn(
        "__salt_l", F.pmod(F.xxhash64(salt_from), F.lit(buckets))
    )
    sr = right.withColumn(
        "__salt_r",
        F.explode(
            F.sequence(F.lit(0).cast("long"), F.lit(buckets - 1).cast("long"))
        ),
    )
    out = sl.join(
        sr,
        (sl[left_key] == sr[right_key]) & (sl["__salt_l"] == sr["__salt_r"]),
        how,
    )
    return out.drop("__salt_l", "__salt_r")


# ---------------------------------------------------------------------------
# Bloom-filter semi-join reduction
# ---------------------------------------------------------------------------

#: Frozen Bloom geometry: 2^18 bits as 4096 64-bit words, 3 pairwise
#: hashes. The filter is TRANSPARENT — no false negatives by
#: construction, false positives removed by the real join — so results
#: never depend on the sizing; only the shuffle volume saved does.
BLOOM_BITS = 1 << 18
BLOOM_WORDS = BLOOM_BITS // 64
BLOOM_HASHES = ((31, 7), (131, 17), (1031, 29))
BLOOM_P = 1_000_000_007


def _bloom_positions(key: Column) -> list[Column]:
    """Bit positions for a key of ANY type: the key goes through
    xxhash64 first (arithmetic on the raw column crashed ANSI casts on
    string keys — or worse, silently NULLed every position with ANSI
    off, a 100% false-negative filter). ``pmod`` keeps positions
    non-negative on the signed hash, and reducing by BLOOM_P before the
    multiply bounds the product under 2^41 — no ANSI overflow."""
    h = F.pmod(F.xxhash64(key), F.lit(BLOOM_P))
    return [
        F.pmod(h * F.lit(a) + F.lit(b), F.lit(BLOOM_P)) % BLOOM_BITS
        for a, b in BLOOM_HASHES
    ]


def bloom_build(keys: DataFrame, key_col: str) -> DataFrame:
    """Distributed Bloom build: explode each key into its bit
    positions, one hash aggregation of per-word OR masks. Output is a
    (word, mask) table of at most BLOOM_WORDS rows — broadcastable at
    any build-side cardinality, and mergeable (bit_or is associative),
    so partial filters combine map-side exactly like partial sums."""
    pos = F.explode(F.array(*_bloom_positions(F.col(key_col)))).alias("pos")
    return (
        keys.select(pos)
        .select(
            (F.col("pos") / 64).cast("long").alias("word"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").alias(
                "mask"
            ),
        )
        .groupBy("word")
        .agg(F.bit_or("mask").alias("mask"))
    )


def bloom_probe(probe: DataFrame, key_col: str, bloom: DataFrame) -> DataFrame:
    """Pre-filter the probe side before its shuffle: three broadcast
    lookups into the (word, mask) table, keep rows whose every hash bit
    is set. Rows that would die in the join die HERE, before the
    exchange — the semi-join reduction that cuts shuffle volume when
    the build side is selective (what Spark's runtime bloom AQE does,
    expressed as an explicit, testable operator)."""
    out = probe
    conds = []
    for i, p in enumerate(_bloom_positions(F.col(key_col))):
        out = (
            out.withColumn(f"__bp{i}", p)
            .withColumn(f"__bw{i}", (F.col(f"__bp{i}") / 64).cast("long"))
            .join(
                F.broadcast(
                    bloom.select(
                        F.col("word").alias(f"__bw{i}"),
                        F.col("mask").alias(f"__bm{i}"),
                    )
                ),
                f"__bw{i}",
                "left",
            )
        )
        conds.append(
            F.expr(
                f"(shiftright(coalesce(__bm{i}, CAST(0 AS BIGINT)), "
                f"CAST(__bp{i} % 64 AS INT)) & 1) = 1"
            )
        )
    keep = conds[0]
    for c in conds[1:]:
        keep = keep & c
    drop = [c for i in range(len(BLOOM_HASHES)) for c in (f"__bp{i}", f"__bw{i}", f"__bm{i}")]
    return out.filter(keep).drop(*drop)
