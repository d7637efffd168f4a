"""Planted-case tests for the temporal join operators (as-of, interval),
the salted aggregation, and hyperplane-LSH ANN."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from spotify_tracks_etl_portfolio_spark.operators import similarity as sim
from spotify_tracks_etl_portfolio_spark.operators.joins import (
    asof_join,
    interval_pairs_within,
)
from spotify_tracks_etl_portfolio_spark.operators.stats import salted_count


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


def test_asof_join_backward_inclusive(spark):
    left = spark.createDataFrame(
        [
            (1, 10, _ts("2024-01-01T10:00:00")),  # after p100, p101
            (2, 10, _ts("2024-01-01T08:00:00")),  # exactly at p100 (inclusive)
            (3, 10, _ts("2024-01-01T07:00:00")),  # before any purchase
            (4, 20, _ts("2024-01-01T12:00:00")),  # other user
        ],
        "click_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (100, 10, _ts("2024-01-01T08:00:00"), 5.0),
            (101, 10, _ts("2024-01-01T09:30:00"), 7.0),
            (200, 20, _ts("2024-01-01T11:59:59"), 9.0),
        ],
        "event_id long, user_id long, ts timestamp, value double",
    )
    out = {
        r["click_id"]: (r["p_event_id"], r["p_value"])
        for r in asof_join(
            left, right, ["user_id"], "ts", "ts", right_prefix="p_"
        ).collect()
    }
    assert out[1] == (101, 7.0)  # latest of the two earlier purchases
    assert out[2] == (100, 5.0)  # equal timestamps match (inclusive)
    assert 3 not in out  # inner: no purchase at-or-before
    assert out[4] == (200, 9.0)

    left_out = {
        r["click_id"]: r["p_event_id"]
        for r in asof_join(
            left, right, ["user_id"], "ts", "ts", right_prefix="p_", how="left"
        ).collect()
    }
    assert left_out[3] is None  # left keeps unmatched with NULLs


def test_asof_join_equal_right_ts_deterministic(spark):
    """Two right rows at the identical (key, ts): the greatest packed
    struct (= greatest event_id here) must win, every run."""
    left = spark.createDataFrame(
        [(1, 10, _ts("2024-01-01T10:00:00"))],
        "click_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (100, 10, _ts("2024-01-01T09:00:00"), 1.0),
            (101, 10, _ts("2024-01-01T09:00:00"), 2.0),
        ],
        "event_id long, user_id long, ts timestamp, value double",
    )
    for _ in range(3):
        row = asof_join(
            left, right, ["user_id"], "ts", "ts", right_prefix="p_"
        ).collect()[0]
        assert row["p_event_id"] == 101


def test_interval_pairs_within(spark):
    orders = spark.createDataFrame(
        [
            (1, 5, _ts("2024-01-01T00:00:00")),
            (2, 5, _ts("2024-01-15T00:00:00")),  # 14d after #1
            (3, 5, _ts("2024-03-01T00:00:00")),  # far from both
            (4, 6, _ts("2024-01-02T00:00:00")),  # other customer
            (5, 5, _ts("2024-01-15T00:00:00")),  # same instant as #2
        ],
        "o_orderkey long, o_custkey long, o_orderdate timestamp",
    )
    pairs = {
        (r["id_a"], r["id_b"])
        for r in interval_pairs_within(
            orders,
            ["o_custkey"],
            "o_orderdate",
            "o_orderkey",
            F.expr("INTERVAL 30 DAYS"),
        ).collect()
    }
    assert (1, 2) in pairs and (1, 5) in pairs
    assert (2, 5) in pairs  # equal ts pairs once, id order
    assert (5, 2) not in pairs and (2, 2) not in pairs
    assert not any(3 in p or 4 in p for p in pairs)


def test_salted_count_matches_direct(spark, sf_dir):
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    direct = {
        r["user_id"]: r["n"]
        for r in events.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    salted = {
        r["user_id"]: r["n"]
        for r in salted_count(events, ["user_id"], "event_id", out_col="n").collect()
    }
    assert salted == direct


def test_hyperplane_lsh_subset_of_bruteforce(spark, sf_dir):
    """Planted exact duplicates collide in EVERY band (recall 1.0 for
    identical vectors); and the verify step gives precision 1.0 — every
    reported pair appears in the brute-force set with the same cosine."""
    from spotify_tracks_etl_portfolio_spark.operators.dedup import (
        embedding_near_dup_pairs,
    )

    base = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(200)
    dup = base.filter(F.col("vec_id") < 5).withColumn(
        "vec_id", F.col("vec_id") + 100_000
    )
    emb = base.unionByName(dup)
    brute = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in embedding_near_dup_pairs(emb, "vec_id", "embedding", 0.4).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in sim.hyperplane_lsh_near_dup_pairs(
            emb, "vec_id", "embedding", 0.4
        ).collect()
    }
    for i in range(5):
        assert lsh[(i, i + 100_000)] == 1.0  # planted dup always recalled
    for pair, cos in lsh.items():
        assert brute[pair] == cos  # precision 1.0, identical cosine


def test_hyperplane_sketch_deterministic(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(50)
    a = sim.hyperplane_sketch(emb, "vec_id", "embedding").drop("embedding").collect()
    b = sim.hyperplane_sketch(emb, "vec_id", "embedding").drop("embedding").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_salted_join_matches_plain_join(spark):
    """Salting only reshapes the shuffle: on a deliberately skewed key
    distribution (one key holding half the rows) the salted join must
    return exactly the plain join's rows."""
    from spotify_tracks_etl_portfolio_spark.operators.joins import salted_join

    left = spark.createDataFrame(
        [(1 if i < 50 else i, i, float(i)) for i in range(100)],
        "k long, rid long, v double",
    )
    right = spark.createDataFrame(
        [(k, f"dim{k}") for k in set([1] + list(range(50, 100)))],
        "rk long, name string",
    )
    plain = {
        (r["rid"], r["name"])
        for r in left.join(right, left.k == right.rk).collect()
    }
    salted = {
        (r["rid"], r["name"])
        for r in salted_join(left, right, "k", "rk", "rid", buckets=4).collect()
    }
    assert salted == plain and len(plain) == 100


def test_bloom_probe_no_false_negatives_and_filters(spark, sf_dir):
    """Every true match survives the Bloom probe (transparency), the
    probe drops a meaningful share of non-matching rows, and the build
    compiles to at most BLOOM_WORDS broadcastable rows."""
    from pyspark.sql import functions as F

    from spotify_tracks_etl_portfolio_spark.operators.joins import (
        BLOOM_WORDS,
        bloom_build,
        bloom_probe,
    )
    from spotify_tracks_etl_portfolio_spark.sources.readers import (
        read_parquet_table,
    )

    orders = read_parquet_table(spark, sf_dir, "orders")
    lineitem = read_parquet_table(spark, sf_dir, "lineitem")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_orderkey"
    )
    bloom = bloom_build(urgent, "o_orderkey")
    assert bloom.count() <= BLOOM_WORDS
    survivors = bloom_probe(lineitem, "l_orderkey", bloom)
    true_matches = lineitem.join(
        urgent, F.col("l_orderkey") == F.col("o_orderkey"), "left_semi"
    )
    n_total, n_surv, n_true = (
        lineitem.count(),
        survivors.count(),
        true_matches.count(),
    )
    assert n_true <= n_surv <= n_total
    # transparency: no true match is dropped
    assert true_matches.join(
        survivors.select("l_orderkey", "l_linenumber"),
        ["l_orderkey", "l_linenumber"],
        "left_anti",
    ).count() == 0
    # selectivity: the filter actually removes most non-matching rows
    # (~20% of orders are urgent; fpp at this sizing is near zero)
    assert n_surv < 0.5 * n_total


def test_salted_join_rejects_right_preserving_hows(spark):
    """Round-6 review fix: salting replicates the right side, so
    right/full outer joins would emit phantom unmatched rows per
    replica — the operator must refuse them instead of silently
    breaking its row-identity contract."""
    import pytest

    from spotify_tracks_etl_portfolio_spark.operators.joins import salted_join

    left = spark.createDataFrame([(1, 10)], "k long, rid long")
    right = spark.createDataFrame([(1, "a"), (2, "b")], "rk long, name string")
    for how in ("right", "full", "full_outer", "right_outer"):
        with pytest.raises(ValueError, match="phantom"):
            salted_join(left, right, "k", "rk", "rid", buckets=4, how=how)
    # the left-preserving hows keep working
    got = salted_join(left, right, "k", "rk", "rid", buckets=4, how="left")
    assert got.count() == 1


def test_bloom_handles_string_keys_transparently(spark):
    """Round-6 review fix: bit positions now come from xxhash64(key),
    so non-numeric keys work (raw-column arithmetic crashed ANSI casts
    — or silently dropped EVERY probe row with ANSI off)."""
    from spotify_tracks_etl_portfolio_spark.operators.joins import (
        bloom_build,
        bloom_probe,
    )

    build = spark.createDataFrame(
        [(f"key_{i}",) for i in range(50)], "k string"
    )
    probe = spark.createDataFrame(
        [(f"key_{i}",) for i in range(40, 400)], "k string"
    )
    bloom = bloom_build(build, "k")
    survivors = {r["k"] for r in bloom_probe(probe, "k", bloom).collect()}
    # transparency: every true match survives
    assert {f"key_{i}" for i in range(40, 50)} <= survivors
    # selectivity: the filter actually drops most non-members
    assert len(survivors) < 360


def test_asof_join_right_table_with_map_column(spark):
    """Round-6 review fix: the equal-ts tie-break sorts the ORDERABLE
    subset of right columns, so a map-bearing right table as-of joins
    instead of failing the window sort."""
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01T10:00:00"))], "uid long, ts timestamp"
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T09:00:00"), {"a": 1}),
            (1, _ts("2024-01-01T09:30:00"), {"b": 2}),
        ],
        "uid long, rts timestamp, attrs map<string,int>",
    )
    got = asof_join(left, right, ["uid"], "ts", "rts").collect()
    assert len(got) == 1
    assert got[0]["right_rts"] == _ts("2024-01-01T09:30:00")
    assert dict(got[0]["right_attrs"]) == {"b": 2}


def test_pq_topk_derives_geometry_from_pretrained_books(spark, sf_dir):
    """Round-6 review fix: pq_topk with pre-trained codebooks derives
    (m, sub_dim) from the books themselves — a non-default-geometry
    model can never silently sum too few subspaces."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(200)
    books16 = sim.pq_train_codebooks(
        emb, "vec_id", "embedding", m=16, sub_dim=4, k=8, iters=1
    )
    assert len(books16) == 16 and len(books16[0][0][1]) == 4
    # defaults say m=8/sub_dim=8; the books must win — the pretrained
    # call must equal the self-trained call at the books' geometry
    # (training is zero-RNG, so the codebooks are identical)
    pre = sorted(
        map(
            tuple,
            sim.pq_topk(
                emb, "vec_id", "embedding", books=books16, topk=3
            ).collect(),
        )
    )
    selftrained = sorted(
        map(
            tuple,
            sim.pq_topk(
                emb, "vec_id", "embedding",
                m=16, sub_dim=4, k=8, iters=1, topk=3,
            ).collect(),
        )
    )
    assert pre == selftrained and pre
