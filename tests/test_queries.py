"""Smoke + shape tests for every registered query at sf0.001.

The value-level gate is the DuckDB oracle (tools/check_oracle.py and the
driver's CORRECTNESS run); here we assert each query executes, returns a
stable schema, and satisfies cheap invariants.
"""

from __future__ import annotations

import pytest

from spotify_tracks_etl_portfolio_spark.plans import all_queries

SPECS = all_queries()


@pytest.mark.parametrize("name", sorted(SPECS))
def test_query_runs(spark, sf_dir, name):
    spec = SPECS[name]
    df = spec.fn(spark, sf_dir)
    rows = df.collect()
    assert df.columns, name
    assert rows is not None


def test_flagship_entry(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0


def test_registry_contract():
    import __spark_entry__ as e

    qs, os_ = e.queries(), e.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 20


def test_winsorized_null_robust(spark, tmp_path):
    """winsorized_event_values must agree with its DuckDB oracle even
    when events.value contains NULLs (ADVICE r2: Spark's non-nullable
    greatest(value, lit) would otherwise clamp NULLs to p01 and count
    them in the mean while the oracle drops them)."""
    import duckdb
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "event_id": range(100),
            "ts": pd.to_datetime("2024-01-01") + pd.to_timedelta(range(100), "h"),
            "user_id": [i % 7 for i in range(100)],
            "event_type": ["click"] * 100,
            "value": [float(i) if i % 5 else None for i in range(100)],
            "props": ["{}"] * 100,
        }
    )
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    sf = tmp_path / "sfnull"
    sf.mkdir()
    pdf.to_parquet(sf / "events.parquet")

    spec = SPECS["winsorized_event_values"]
    got = spec.fn(spark, str(sf)).first().asDict()

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')"
    )
    cols = [d[0] for d in con.execute(spec.oracle).description]
    want = dict(zip(cols, con.execute(spec.oracle).fetchone()))
    assert got == pytest.approx(want), (got, want)


def test_queries_pin_utc_on_foreign_timezone_session(spark, sf_dir):
    """The driver hands queries a session IT built (no factory confs).
    On a non-UTC host every date_format/window string would shift
    against the UTC-naive DuckDB oracle — so the reader layer must pin
    the session timezone itself, same as nanosAsLong."""
    import duckdb

    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        df = SPECS["hourly_event_rollup"].fn(spark, sf_dir)
        # constructing the query re-pinned the session to UTC
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
        got = df.orderBy("hour").first()["hour"]
        want = duckdb.sql(
            "SELECT strftime(date_trunc('hour', min(ts)), '%Y-%m-%d %H:%M:%S') "
            f"FROM '{sf_dir}/events.parquet'"
        ).fetchone()[0]
        assert got == want
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")


def _load_check_oracle_mod():
    import importlib.util
    import pathlib

    path = pathlib.Path(__file__).resolve().parents[1] / "tools" / "check_oracle.py"
    spec = importlib.util.spec_from_file_location("_check_oracle_mod", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _duck_con(sf):
    import os

    import duckdb

    from spotify_tracks_etl_portfolio_spark.schemas import TESTDATA_TABLES

    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        path = os.path.join(sf, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE OR REPLACE VIEW {t} AS "
                f"SELECT * FROM read_parquet('{path}')"
            )
    return con


def _driver_style_multisets(spark, fn, oracle, sf, chk):
    """(spark_multiset, oracle_multiset) under the driver's type-strict
    normalization — DuckDB fetched through Arrow, exactly like the
    harness."""
    sdf = fn(spark, sf)
    s_cols = list(sdf.columns)
    s_rows = [tuple(r) for r in sdf.collect()]
    tbl = _duck_con(sf).execute(oracle).fetch_arrow_table()
    o_cols = list(tbl.column_names)
    o_rows = [tuple(d[c] for c in o_cols) for d in tbl.to_pylist()]
    assert sorted(s_cols) == sorted(o_cols)
    s_idx = [s_cols.index(c) for c in sorted(s_cols)]
    o_idx = [o_cols.index(c) for c in sorted(o_cols)]
    return (
        chk._multiset([[r[i] for i in s_idx] for r in s_rows]),
        chk._multiset([[r[i] for i in o_idx] for r in o_rows]),
    )


def test_decimal_contingency_variants_hash_match_duckdb(spark, sf_dir):
    """The dormant decimal-output contingency (round-6 verdict item 6,
    plans/decimal_contingency.py): each variant must hash-match DuckDB
    under the driver's type-strict comparison at the regular test
    scale. DECIMAL(24,8) crosses Arrow as decimal128(24,8) on both
    engines, so there is no decimal->double conversion for the oracle
    channel to double-round."""
    from spotify_tracks_etl_portfolio_spark.plans.decimal_contingency import (
        DECIMAL_VARIANTS,
    )

    chk = _load_check_oracle_mod()
    for name, (fn, oracle) in DECIMAL_VARIANTS.items():
        sm, om = _driver_style_multisets(spark, fn, oracle, sf_dir, chk)
        assert sm == om, name
        # the retyped sum columns really are Decimal-typed on both sides
        assert any(
            isinstance(v, tuple) and v[0] == "dec" for row in sm for v in row
        ), name


@pytest.mark.skipif(
    not __import__("os").path.isdir(
        __import__("os").path.join(
            __import__("os").path.dirname(__import__("os").path.dirname(
                __import__("os").path.abspath(__file__))),
            ".stress", "sf1",
        )
    ),
    reason="sf1 stress replica not generated (tools/make_stress_sf.py)",
)
def test_decimal_contingency_fixes_sf1_ulp_mismatch(spark):
    """At the sf1 stress scale the DOUBLE-typed registered form
    demonstrably mismatches DuckDB by 1-2 ulp (the decimal->double
    conversion artifact, ROUND5.md) — and the decimal-typed variant of
    the same query must hash-match exactly at that same scale. This is
    the evidence that the contingency actually fixes the exposure it
    exists for."""
    import os

    from spotify_tracks_etl_portfolio_spark.plans.decimal_contingency import (
        DECIMAL_VARIANTS,
    )

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sf1 = os.path.join(repo, ".stress", "sf1")
    chk = _load_check_oracle_mod()

    # the double-typed registered form shows the classified ulp artifact
    spec = SPECS["regional_revenue"]
    sm, om = _driver_style_multisets(spark, spec.fn, spec.oracle, sf1, chk)
    diffs = [(a, b) for a, b in zip(sm, om) if a != b]
    assert diffs, "sf1 no longer reproduces the ulp artifact"
    assert all(chk._only_ulp_floats(a, b) for a, b in diffs)

    # the decimal-typed variant hash-matches at the same scale
    fn, oracle = DECIMAL_VARIANTS["regional_revenue"]
    sm, om = _driver_style_multisets(spark, fn, oracle, sf1, chk)
    assert sm == om


def test_width_parametric_oracles_generalize_beyond_registered_widths(
    spark, sf_dir
):
    """Round-8 twins made the simhash/hyperplane oracles width-
    parametric. The claim 'any STATIC width replays exactly' must not
    silently hold only at the two registered widths (30/59, 8/16):
    pick third widths never used by any registered query and pin
    engine == DuckDB replay for both operator families."""
    import duckdb

    from spotify_tracks_etl_portfolio_spark.operators import dedup as dd
    from spotify_tracks_etl_portfolio_spark.operators import (
        similarity as sim,
    )
    from spotify_tracks_etl_portfolio_spark.plans import extensions as ext
    from spotify_tracks_etl_portfolio_spark.sources.readers import (
        read_parquet_table,
    )

    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    # SimHash at bits=45 (spans both hash streams, unregistered width)
    docs = read_parquet_table(spark, sf_dir, "documents")
    got = {
        (r.doc_id, r.simhash)
        for r in dd.simhash(docs, "doc_id", "text", bits=45).collect()
    }
    want = {
        tuple(r)
        for r in con.execute(
            f"WITH {ext._SHINGLE_CTES},\n{ext._simhash_sql(bits=45)}\n"
            "SELECT doc_id, simhash FROM simh"
        ).fetchall()
    }
    assert got == want
    # Hyperplane LSH at rows=12 (unregistered band width)
    emb = read_parquet_table(spark, sf_dir, "embeddings")
    got_pairs = {
        (r.id_a, r.id_b, r.cosine)
        for r in sim.hyperplane_lsh_near_dup_pairs(
            emb, "vec_id", "embedding", ext.EMB_NEAR_DUP_THRESHOLD, rows=12
        ).collect()
    }
    want_pairs = {
        tuple(r)
        for r in con.execute(ext._hyperplane_lsh_oracle(rows=12)).fetchall()
    }
    assert got_pairs == want_pairs


def test_pending_r11_registration_gate(monkeypatch):
    """The round-10 pending-debut gate: the two late-r10 queries stay
    UNREGISTERED until a CORRECTNESS artifact of round >= 10 exists
    (protecting the r10 window's stale-cohort budget), then debut
    automatically (never-recorded = priority group 2). The decorator's
    both branches are exercised directly; the module-level outcome is
    asserted against whatever the checkout's artifact state implies."""
    from spotify_tracks_etl_portfolio_spark import plans

    pending = {
        "embedding_ivfpq_filtered_topk",
        "exact_substring_cut_new_vs_corpus",
        "streaming_incremental_substring_sync",
        "event_type_value_quantiles_sketch",
        "bpe_segment_documents_served",
        "temperature_sampled_language_mix",
    }
    monkeypatch.delenv("SPARK_GRAFT_INCLUDE_PENDING", raising=False)
    qs = set(plans.all_queries())
    if plans._round10_recorded():
        # post-r10 checkout (or the import ran with the override):
        # the debuts must be live ONLY if the import-time gate saw it
        assert pending <= qs or not (pending & qs)
    else:
        assert not (pending & qs)
    # decorator behavior, both branches, via a throwaway name
    monkeypatch.setenv("SPARK_GRAFT_INCLUDE_PENDING", "1")
    assert plans._round10_recorded()

    @plans.register_pending_r11("___pending_probe", oracle=None)
    def _probe(spark, sf_dir):  # pragma: no cover - never executed
        raise AssertionError

    assert "___pending_probe" in plans.QUERIES
    del plans.QUERIES["___pending_probe"]
    monkeypatch.delenv("SPARK_GRAFT_INCLUDE_PENDING", raising=False)


def test_pending_r12_registration_gate(monkeypatch):
    """The round-11 pending-debut gate (same contract as the r11 one,
    one round later): late-r11 queries stay unregistered until a
    CORRECTNESS artifact of round >= 11 exists, protecting the r11
    window's exact 50-slot budget (8 debuts + 12 force + 30 r06)."""
    from spotify_tracks_etl_portfolio_spark import plans

    pending = set(plans.PENDING_R12_NAMES)
    assert "embedding_ivfpq_append_topk" in pending
    monkeypatch.delenv("SPARK_GRAFT_INCLUDE_PENDING", raising=False)
    qs = set(plans.all_queries())
    # registration is decided at IMPORT time (artifact on disk or the
    # override env var), so the debuts are either ALL live or ALL held
    assert pending <= qs or not (pending & qs)
    if not plans._round_recorded(11):
        # with no r11 artifact NOW, live debuts can only mean the
        # import ran under the override — never a partial registration
        assert pending <= qs or not (pending & qs)
    monkeypatch.setenv("SPARK_GRAFT_INCLUDE_PENDING", "1")
    assert plans._round_recorded(11)

    @plans.register_pending_r12("___pending_probe12", oracle=None)
    def _probe(spark, sf_dir):  # pragma: no cover - never executed
        raise AssertionError

    assert "___pending_probe12" in plans.QUERIES
    del plans.QUERIES["___pending_probe12"]
    plans.PENDING_R12_NAMES.remove("___pending_probe12")
    monkeypatch.delenv("SPARK_GRAFT_INCLUDE_PENDING", raising=False)


def test_pending_r13_registration_gate(monkeypatch):
    """The round-12 pending-debut gate (same contract as the r12 one,
    one round later): late-r12 queries stay unregistered until a
    CORRECTNESS artifact of round >= 12 exists, protecting the r12
    window's exact 50-slot budget (5 debuts + 1 promoted re-record +
    the whole r07 cohort + the r08 head)."""
    from spotify_tracks_etl_portfolio_spark import plans

    pending = set(plans.PENDING_R13_NAMES)
    monkeypatch.delenv("SPARK_GRAFT_INCLUDE_PENDING", raising=False)
    qs = set(plans.all_queries())
    # registration is decided at IMPORT time (artifact on disk or the
    # override env var), so the debuts are either ALL live or ALL held
    assert pending <= qs or not (pending & qs)
    monkeypatch.setenv("SPARK_GRAFT_INCLUDE_PENDING", "1")
    assert plans._round_recorded(12)

    @plans.register_pending_r13("___pending_probe13", oracle=None)
    def _probe(spark, sf_dir):  # pragma: no cover - never executed
        raise AssertionError

    assert "___pending_probe13" in plans.QUERIES
    del plans.QUERIES["___pending_probe13"]
    plans.PENDING_R13_NAMES.remove("___pending_probe13")
    monkeypatch.delenv("SPARK_GRAFT_INCLUDE_PENDING", raising=False)


def test_pending_r14_registration_gate(monkeypatch):
    """The round-13 pending-debut gate (same contract as the r13 one,
    one round later): late-r13 queries stay unregistered until a
    CORRECTNESS artifact of round >= 13 exists, protecting the r13
    window's exact 50-slot budget (2 debuts + 4 promoted force
    re-records + the r08 remainder + the r09 head)."""
    from spotify_tracks_etl_portfolio_spark import plans

    pending = set(plans.PENDING_R14_NAMES)
    monkeypatch.delenv("SPARK_GRAFT_INCLUDE_PENDING", raising=False)
    qs = set(plans.all_queries())
    # registration is decided at IMPORT time (artifact on disk or the
    # override env var), so the debuts are either ALL live or ALL held
    assert pending <= qs or not (pending & qs)
    if not plans._round_recorded(13):
        assert not (pending & qs) or pending <= qs
    monkeypatch.setenv("SPARK_GRAFT_INCLUDE_PENDING", "1")
    assert plans._round_recorded(13)

    @plans.register_pending_r14("___pending_probe14", oracle=None)
    def _probe(spark, sf_dir):  # pragma: no cover - never executed
        raise AssertionError

    assert "___pending_probe14" in plans.QUERIES
    del plans.QUERIES["___pending_probe14"]
    plans.PENDING_R14_NAMES.remove("___pending_probe14")
    monkeypatch.delenv("SPARK_GRAFT_INCLUDE_PENDING", raising=False)


# The round-11 force queue as it stood when CORRECTNESS_r11 was
# recorded (cleared from plans/__init__.py at round-12 start per the
# per-round hygiene — this literal pins the historical handoff).
_R11_FORCE_QUEUE = (
    "simhash_documents",
    # round-10 deferred changed-path consumers (_FORCE_RERECORD_AFTER_R10)
    "exact_substring_dup_spans",
    "exact_substring_dedup_documents",
    "curate_training_corpus_v2",
    "bpe_train_merges_documents",
    "bpe_segment_documents",
    "cowtable_merge_roundtrip",
    "cowtable_snapshot_diff",
    "cow_incremental_rollup",
    "streaming_cow_upsert_sync",
    "cowtable_zorder_pruned_scan",
    "cowtable_bloom_point_lookup",
)


def test_r11_window_landed_as_pinned():
    """The r11 handoff is now HISTORY: CORRECTNESS_r11.json must contain
    exactly what the round-11 window pin predicted — the promoted force
    queue (simhash + the 11 r10-deferred changed-path consumers, the
    literal above) all green, every row green, and no registered
    query's latest row older than r07 afterwards. This is the artifact
    the round-12 queue-clearing hygiene is justified by."""
    import json
    import os

    from spotify_tracks_etl_portfolio_spark import plans

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "CORRECTNESS_r11.json")) as fh:
        r11 = json.load(fh)
    assert len(r11) == 50
    for name in _R11_FORCE_QUEUE:
        row = r11.get(name)
        assert row is not None, f"{name} missing from CORRECTNESS_r11"
        assert row["hash_match"] and row["rows_match"], name
    assert all(v["hash_match"] and v["rows_match"] for v in r11.values())
    # the queues those rows certify are cleared (round-12 hygiene)
    assert plans._FORCE_RERECORD == ()
    assert plans._FORCE_RERECORD_AFTER_R10 == ()
    # staleness floor: no registered query's latest row older than r07
    plans.all_queries()  # side-effect: populate QUERIES
    rec = plans._recorded_status(max_round=11)
    stale = [
        (n, r) for n, (r, _s) in rec.items()
        if n in plans.QUERIES and r < 7
    ]
    assert stale == [], stale


# The round-12 force queue as it stood when CORRECTNESS_r12 was
# recorded (cleared from plans/__init__.py at round-13 start per the
# per-round hygiene — this literal pins the historical handoff).
_R12_FORCE_QUEUE = ("exact_substring_new_vs_corpus",)


def test_r12_window_landed_as_pinned():
    """The r12 handoff is now HISTORY: CORRECTNESS_r12.json must contain
    exactly what the round-12 window pin predicted — the 5 pending-r12
    debuts, the promoted r11 force queue (the bucketed k-gram serve,
    the literal above) all green, every row green, and no registered
    query's latest row older than r08 afterwards. This is the artifact
    the round-13 queue-clearing hygiene is justified by."""
    import json
    import os

    from spotify_tracks_etl_portfolio_spark import plans

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "CORRECTNESS_r12.json")) as fh:
        r12 = json.load(fh)
    assert len(r12) == 50
    for name in _R12_FORCE_QUEUE + tuple(plans.PENDING_R12_NAMES):
        row = r12.get(name)
        assert row is not None, f"{name} missing from CORRECTNESS_r12"
        assert row["hash_match"] and row["rows_match"], name
    assert all(v["hash_match"] and v["rows_match"] for v in r12.values())
    # the queue those rows certify is cleared (round-13 hygiene)
    assert plans._FORCE_RERECORD == ()
    assert plans._FORCE_RERECORD_AFTER_R10 == ()
    assert plans._FORCE_RERECORD_AFTER_R11 == ()
    # staleness floor: no registered query's latest row older than r08
    plans.all_queries()  # side-effect: populate QUERIES
    rec = plans._recorded_status(max_round=12)
    stale = [
        (n, r) for n, (r, _s) in rec.items()
        if n in plans.QUERIES and r < 8
    ]
    assert stale == [], stale


def test_r12_window_promotes_r11_deferred(monkeypatch):
    """Pin the r12 window against the REAL recorded state as of the r11
    artifact landing (``_recorded_status(max_round=11)`` — stable after
    CORRECTNESS_r12+ land): the 5 pending-r12 debuts lead (group 2,
    never recorded), the r11 changed-path consumer (the bucketed k-gram
    serve — the _R12_FORCE_QUEUE literal; the live tuple was cleared at
    round-13 start after its r12 row landed green) promotes into the
    force group, and the remaining slots go stalest-first — the WHOLE
    r07 cohort (29 rows) before any r08 row. Pending-r13 debuts are
    excluded: they are unregistered as of the r11 state this test pins,
    but the freeze-time forced-open gate registers them."""
    from spotify_tracks_etl_portfolio_spark import plans

    as_of_r11 = plans._recorded_status(max_round=11)
    monkeypatch.setattr(plans, "_recorded_status", lambda: as_of_r11)
    monkeypatch.setattr(plans, "_FORCE_RERECORD_AFTER_R11", _R12_FORCE_QUEUE)
    ordered = [
        n for n in plans.all_queries()
        if n not in plans.PENDING_R13_NAMES
        and n not in plans.PENDING_R14_NAMES
    ]
    window = ordered[:50]
    # the five pending-r12 debuts are registered (the r11 artifact is
    # on disk) and never recorded as of r11 → they lead the window
    debuts = [n for n in window if n not in as_of_r11]
    assert set(debuts) == set(plans.PENDING_R12_NAMES), debuts
    assert window[: len(debuts)] == debuts, window[:8]
    # the promoted r11 deferred re-record is next (force group)
    assert set(_R12_FORCE_QUEUE) <= set(window)
    assert window[len(debuts)] == "exact_substring_new_vs_corpus"
    # remaining slots go stalest-first: the WHOLE r07 cohort plus the
    # head of r08 — never anything younger while an older cohort is
    # incomplete
    rest = [
        n for n in window
        if n not in _R12_FORCE_QUEUE and n in as_of_r11
    ]
    rounds = [as_of_r11[n][0] for n in rest]
    assert set(rounds) <= {7, 8}, set(rounds)
    assert rounds.count(7) == sum(
        1 for n, (r, _s) in as_of_r11.items()
        if r == 7 and n in plans.QUERIES
    ), "an r07 row was left out while r08 rows got slots"


def test_r13_window_promotes_r12_deferred(monkeypatch):
    """One round ahead: once the predicted r12 window records (all
    green), the round-12 changed-path consumers
    (_FORCE_RERECORD_AFTER_R12) must promote into the force group and
    land inside the r13 window, with the remaining slots going
    stalest-first — the r08 remainder cohort before any r09 row.
    Registration-state agnostic: pending-r13 debuts (if the import saw
    the gate open) occupy head slots and are excluded here."""
    from spotify_tracks_etl_portfolio_spark import plans

    as_of_r11 = plans._recorded_status(max_round=11)
    monkeypatch.setattr(plans, "_recorded_status", lambda: as_of_r11)
    # replay history: the r12 window was computed while the (since
    # cleared) r11 force queue was still live
    monkeypatch.setattr(plans, "_FORCE_RERECORD_AFTER_R11", _R12_FORCE_QUEUE)
    r12_window = [
        n for n in plans.all_queries()
        if n not in plans.PENDING_R13_NAMES
        and n not in plans.PENDING_R14_NAMES
    ][:50]
    fake = dict(as_of_r11)
    for n in r12_window:
        fake[n] = (12, "pass")
    # the r13 window runs on the LIVE code: the r11 queue cleared at
    # round-13 start (its r12 row is green), only the r12 queue promotes
    monkeypatch.setattr(plans, "_FORCE_RERECORD_AFTER_R11", ())
    monkeypatch.setattr(plans, "_recorded_status", lambda: fake)
    window = [
        n for n in plans.all_queries()
        if n not in plans.PENDING_R13_NAMES
        and n not in plans.PENDING_R14_NAMES
    ][:50]
    assert set(plans._FORCE_RERECORD_AFTER_R12) <= set(window), sorted(
        set(plans._FORCE_RERECORD_AFTER_R12) - set(window)
    )
    # the spent re-record must NOT burn a second slot: its r12 row is
    # green and the cleared queue leaves it in the stalest-first pool
    assert "exact_substring_new_vs_corpus" not in window
    force_names = (
        set(plans._FORCE_RERECORD)
        | set(plans._FORCE_RERECORD_AFTER_R12)
    )
    rest = [n for n in window if n not in force_names and n in fake]
    rounds = [fake[n][0] for n in rest]
    # r08 remainder (8 rows) + r09 head fill the rest of the window
    assert set(rounds) <= {8, 9}, set(rounds)
    assert rounds.count(8) == sum(
        1 for n, (r, _s) in fake.items() if r == 8 and n in plans.QUERIES
    ), "an r08 row was left out while r09 rows got slots"


def test_r14_window_debuts_and_stalest_first(monkeypatch):
    """One round ahead: once the predicted r13 window records all green
    (the 2 pending-r13 debuts lead, the r12 force group re-records, the
    r08 remainder + r09 head retire), the r14 window carries NO force
    entries — the r12 queue names all own green r13 rows, and the
    round-14 hygiene clears the tuple so none re-burns a slot — and the
    non-debut slots go purely stalest-first: the r09 remainder before
    any r10 row. Pending-r14 debuts (the JPEG roundtrip and the unigram
    trainer/segmenter) occupy head slots and are excluded here."""
    import pytest as _pytest

    from spotify_tracks_etl_portfolio_spark import plans

    if any(n not in plans.all_queries() for n in plans.PENDING_R13_NAMES):
        _pytest.skip("pending-r13 debuts not registered in this state")
    as_of_r12 = plans._recorded_status(max_round=12)
    monkeypatch.setattr(plans, "_recorded_status", lambda: as_of_r12)
    r13_window = [
        n for n in plans.all_queries()
        if n not in plans.PENDING_R14_NAMES
    ][:50]
    # sanity: the pending-r13 debuts really lead that window
    assert set(plans.PENDING_R13_NAMES) <= set(
        r13_window[: len(plans.PENDING_R13_NAMES)]
    )
    fake = dict(as_of_r12)
    for n in r13_window:
        fake[n] = (13, "pass")
    # the r14 window runs with the r12 queue cleared (round-14 hygiene)
    monkeypatch.setattr(plans, "_FORCE_RERECORD_AFTER_R12", ())
    monkeypatch.setattr(plans, "_recorded_status", lambda: fake)
    window = [
        n for n in plans.all_queries()
        if n not in plans.PENDING_R14_NAMES
    ][:50]
    # none of the spent r12 force names re-burns a slot
    for n in (
        "near_dedup_new_vs_corpus",
        "streaming_near_dedup_sync",
        "gopher_quality_gate_documents",
    ):
        assert n not in window, n
    rounds = [fake[n][0] for n in window if n in fake]
    assert set(rounds) <= {9, 10}, set(rounds)
    assert rounds.count(9) == min(
        len(rounds),
        sum(
            1 for n, (r, _s) in fake.items()
            if r == 9 and n in plans.QUERIES
        ),
    ), "an r09 row was left out while r10 rows got slots"
