"""Copy-on-write table format: snapshot isolation, file-granular
DELETE/MERGE, footer-stats pruning, atomic commit conflicts."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from spotify_tracks_etl_portfolio_spark.sources import cowtable as ct


@pytest.fixture()
def table(spark, tmp_path):
    root = str(tmp_path / "tbl")
    df = spark.range(0, 1000).select(
        F.col("id").alias("k"),
        (F.col("id") * 2).alias("v"),
    )
    ct.create_table(spark, root, df, cluster_by="k", n_files=8)
    return root


def test_create_read_roundtrip_and_history(spark, table):
    got = ct.read_table(spark, table)
    assert got.count() == 1000
    assert {r["k"] for r in got.filter("k < 5").collect()} == {0, 1, 2, 3, 4}
    (h,) = ct.history(table)
    assert h == {
        "version": 0, "operation": "create", "n_files": 8, "n_rows": 1000,
    }


def test_delete_rewrites_only_overlapping_files(spark, table):
    m0 = ct._load_snapshot(table, 0)
    # keys 100-119 live in one clustered file's range
    keys = spark.range(100, 120).select(F.col("id").alias("k"))
    res = ct.delete_where(spark, table, "k", keys)
    assert res["files_kept"] > 0, "stats pruning never skipped a file"
    assert res["files_rewritten"] + res["files_kept"] == 8
    m1 = ct._load_snapshot(table, 1)
    kept_paths = {f["path"] for f in m0["files"]} & {
        f["path"] for f in m1["files"]
    }
    assert len(kept_paths) == res["files_kept"], (
        "untouched files must carry over BY REFERENCE, not be rewritten"
    )
    got = ct.read_table(spark, table)
    assert got.count() == 980
    assert got.filter((F.col("k") >= 100) & (F.col("k") < 120)).count() == 0


def test_merge_upserts_and_inserts(spark, table):
    updates = spark.createDataFrame(
        [(5, -5), (6, -6), (2000, -1)], "k long, v long"
    )
    res = ct.merge_into(spark, table, updates, "k")
    assert res["files_kept"] > 0
    got = {r["k"]: r["v"] for r in ct.read_table(spark, table).collect()}
    assert len(got) == 1001  # 1000 original + 1 insert
    assert got[5] == -5 and got[6] == -6 and got[2000] == -1
    assert got[7] == 14  # untouched row intact


def test_time_travel_snapshot_isolation(spark, table):
    keys = spark.range(0, 500).select(F.col("id").alias("k"))
    ct.delete_where(spark, table, "k", keys)
    assert ct.read_table(spark, table).count() == 500
    # version 0 still reads the full original table
    assert ct.read_table(spark, table, version=0).count() == 1000
    ops = [h["operation"] for h in ct.history(table)]
    assert ops == ["create", "delete"]


def test_commit_conflict_is_detected_not_corrupting(spark, table):
    m = ct._read_manifest(table, 0)
    ct._commit(table, 1, {**m, "version": 1, "operation": "delete"})
    with pytest.raises(ct.CommitConflictError):
        ct._commit(table, 1, {**m, "version": 1, "operation": "merge"})
    # the winning commit is intact
    assert ct._read_manifest(table, 1)["operation"] == "delete"


def test_scan_pruned_skips_files_and_matches_full_scan(spark, table):
    df, scanned, total = ct.scan_pruned(spark, table, "k", 250, 260)
    assert total == 8 and 0 < scanned < total
    want = set(range(250, 261))
    assert {r["k"] for r in df.collect()} == want
    # physical plan reads only the pruned subset of files
    n_input_files = df.select(F.input_file_name()).distinct().count()
    assert n_input_files == scanned


def test_empty_delete_is_metadata_only_commit(spark, table):
    keys = spark.createDataFrame([], "k long")
    res = ct.delete_where(spark, table, "k", keys)
    assert res == {"version": 1, "files_rewritten": 0, "files_kept": 8}
    assert ct.read_table(spark, table).count() == 1000


def test_vacuum_drops_only_unreferenced_files(spark, table):
    keys = spark.range(100, 120).select(F.col("id").alias("k"))
    ct.delete_where(spark, table, "k", keys)
    assert ct.read_table(spark, table, version=0).count() == 1000
    res = ct.vacuum(table, retain_last=1, min_age_seconds=0)
    assert res["manifests_dropped"] == 1
    assert res["files_deleted"] > 0
    # the retained snapshot reads exactly as committed
    assert ct.read_table(spark, table).count() == 980
    # time travel beyond the horizon fails cleanly, no partial data
    with pytest.raises(FileNotFoundError):
        ct.read_table(spark, table, version=0)


def test_vacuum_sweeps_files_from_failed_commits(spark, table, tmp_path):
    # simulate a loser of a commit race: data written, manifest lost
    orphan_df = spark.range(5).select(F.col("id").alias("k"), F.col("id").alias("v"))
    ct._write_data_files(orphan_df, table)
    before = ct.read_table(spark, table).count()
    res = ct.vacuum(table, retain_last=1, min_age_seconds=0)
    assert res["files_deleted"] > 0  # the orphans
    assert ct.read_table(spark, table).count() == before


def test_merge_latest_wins_and_replay_is_idempotent(spark, table):
    # older update for k=5 (v column is the order key: stored v=10 wins)
    older = spark.createDataFrame([(5, 1)], "k long, v long")
    r1 = ct.merge_latest(spark, table, older, "k", ["v"], stream_batch_id=0)
    assert not r1["skipped_replay"]
    got = {r["k"]: r["v"] for r in ct.read_table(spark, table).collect()}
    assert got[5] == 10  # existing row had the greater order key — it stays
    # newer update wins
    newer = spark.createDataFrame([(5, 99)], "k long, v long")
    r2 = ct.merge_latest(spark, table, newer, "k", ["v"], stream_batch_id=1)
    v2 = r2["version"]
    assert {r["k"]: r["v"] for r in ct.read_table(spark, table).collect()}[5] == 99
    # replaying batch 1 (foreachBatch at-least-once) is a NO-OP
    r3 = ct.merge_latest(spark, table, newer, "k", ["v"], stream_batch_id=1)
    assert r3 == {"version": v2, "skipped_replay": True}
    assert ct.latest_version(table) == v2
    # the watermark survives an unrelated batch commit (delete)
    ct.delete_where(
        spark, table, "k", spark.createDataFrame([(7,)], "k long")
    )
    assert ct.last_stream_batch_id(table) == 1


def test_history_and_stream_watermark_survive_vacuum(spark, table):
    """Round-6 fix: the chain walkers must start at the vacuum horizon,
    never v0 — ``history()`` on a vacuumed table lists exactly the
    retained versions (including a rewritten delta-horizon manifest),
    and ``last_stream_batch_id()`` keeps serving the streaming sink
    instead of crashing on a dropped manifest."""
    for i in range(11):  # v1..v11, crossing the v10 checkpoint boundary
        ct.delete_where(
            spark, table, "k", spark.createDataFrame([(i,)], "k long")
        )
    upd = spark.createDataFrame([(5000, 1)], "k long, v long")
    ct.merge_latest(spark, table, upd, "k", ["v"], stream_batch_id=7)  # v12
    # horizon 11 is a DELTA manifest → exercises the vacuum rewrite
    ct.vacuum(table, retain_last=2, min_age_seconds=0)
    hist = ct.history(table)
    assert [h["version"] for h in hist] == [11, 12]
    assert hist[-1]["n_rows"] == ct.read_table(spark, table).count()
    assert ct.last_stream_batch_id(table) == 7
    # commits carry the watermark forward, so it survives vacuuming the
    # manifest that first recorded it, and the sink keeps committing
    ct.delete_where(
        spark, table, "k", spark.createDataFrame([(20,)], "k long")
    )  # v13
    ct.vacuum(table, retain_last=1, min_age_seconds=0)
    assert ct.last_stream_batch_id(table) == 7
    nxt = spark.createDataFrame([(5001, 2)], "k long, v long")
    r = ct.merge_latest(spark, table, nxt, "k", ["v"], stream_batch_id=8)
    assert not r.get("skipped_replay")
    assert ct.last_stream_batch_id(table) == 8


def test_first_stream_batch_on_vacuumed_batch_only_table(spark, table):
    """The backward watermark walk on a BATCH-ONLY table (no manifest
    carries an id) must stop at the vacuum horizon and return None —
    the old v0-bound walk raised FileNotFoundError, wedging the first
    streaming commit into a vacuumed batch table."""
    ct.delete_where(
        spark, table, "k", spark.createDataFrame([(1,)], "k long")
    )
    ct.vacuum(table, retain_last=1, min_age_seconds=0)  # drops v0: walk can't reach it
    assert ct.last_stream_batch_id(table) is None
    upd = spark.createDataFrame([(6000, 1)], "k long, v long")
    r = ct.merge_latest(spark, table, upd, "k", ["v"], stream_batch_id=0)
    assert not r.get("skipped_replay")
    assert ct.last_stream_batch_id(table) == 0


def test_snapshot_diff_reports_adds_removes_changes(spark, table):
    ct.delete_where(
        spark, table, "k",
        spark.createDataFrame([(3,), (4,)], "k long"),
    )
    ct.merge_into(
        spark, table,
        spark.createDataFrame([(5, -5), (2000, -1)], "k long, v long"),
        "k",
    )
    diff = {
        r["k"]: r["status"]
        for r in ct.snapshot_diff(spark, table, "k", 0).collect()
    }
    assert diff == {
        3: "removed", 4: "removed", 5: "changed", 2000: "added",
    }


def test_compact_restores_pruning_after_scattered_merges(spark, table):
    """Scattered merges leave overlapping small files; compaction must
    restore tight disjoint ranges so later deletes prune again — and
    old snapshots still time-travel until vacuumed."""
    for batch in range(3):
        upd = spark.createDataFrame(
            [(k, -k) for k in range(batch, 1000, 97)], "k long, v long"
        )
        ct.merge_into(spark, table, upd, "k")
    v_before = ct.latest_version(table)
    pre_df, pre_scanned, pre_total = ct.scan_pruned(spark, table, "k", 10, 20)
    res = ct.compact(spark, table, "k", n_files=8)
    assert res["files_out"] == 8
    _, post_scanned, post_total = ct.scan_pruned(spark, table, "k", 10, 20)
    assert post_total == 8 and post_scanned < post_total
    assert post_scanned / post_total <= pre_scanned / pre_total
    # content identical across the rewrite, old snapshot intact
    a = sorted(map(tuple, ct.read_table(spark, table).collect()))
    b = sorted(map(tuple, ct.read_table(spark, table, v_before).collect()))
    assert a == b
    # incremental variant: nothing small enough → metadata-only commit
    res2 = ct.compact(spark, table, "k", small_file_rows=2)
    assert res2["files_rewritten"] == 0 and res2["files_kept"] == 8


def test_string_key_falls_back_to_conservative_rewrite(spark, tmp_path):
    """Keys without footer stats (strings are excluded from the stats
    harvest) must degrade to correct-but-conservative behavior: every
    file counts as affected, results stay exact."""
    root = str(tmp_path / "stbl")
    df = spark.createDataFrame(
        [(f"k{i:04d}", i) for i in range(100)], "k string, v long"
    )
    ct.create_table(spark, root, df, cluster_by="k", n_files=4)
    keys = spark.createDataFrame([("k0005",), ("k0042",)], "k string")
    res = ct.delete_where(spark, root, "k", keys)
    assert res["files_kept"] == 0  # no stats → nothing provably safe
    got = {r["k"] for r in ct.read_table(spark, root).collect()}
    assert len(got) == 98 and "k0005" not in got and "k0042" not in got


def test_create_refuses_existing_table(spark, table):
    with pytest.raises(FileExistsError):
        ct.create_table(spark, table, spark.range(1))


def test_changed_file_scans_are_delta_sized_and_complete(spark, table):
    """The file-diff change set (a) reads FEWER files than the table
    holds when the delete is pruned, and (b) replays to exactly the
    full-recompute state when folded into a v0 rollup."""
    v0_files = {f["path"] for f in ct._load_snapshot(table, 0)["files"]}
    # Pruned delete: a narrow key range touches few files.
    keys = spark.range(0, 20).select(F.col("id").alias("k"))
    ct.delete_where(spark, table, "k", keys)
    added, removed = ct.changed_file_scans(spark, table, 0)
    m1_files = {f["path"] for f in ct._load_snapshot(table, 1)["files"]}
    n_added_files = len(m1_files - v0_files)
    n_removed_files = len(v0_files - m1_files)
    assert n_removed_files < len(v0_files)  # most files untouched
    assert n_added_files <= n_removed_files  # rewrite, not expansion
    # Incremental fold == full recompute.
    r0 = ct.read_table(spark, table, 0).agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")
    )
    inc = (
        r0.select("n", "s")
        .unionByName(
            added.agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
        )
        .unionByName(
            removed.agg(
                (-F.count(F.lit(1))).alias("n"), (-F.sum("v")).alias("s")
            )
        )
        .agg(F.sum("n").alias("n"), F.sum("s").alias("s"))
        .first()
    )
    full = ct.read_table(spark, table).agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")
    ).first()
    assert (inc["n"], inc["s"]) == (full["n"], full["s"])


def test_add_columns_is_metadata_only_with_typed_null_fill(spark, table):
    """ADD COLUMNS commits a new snapshot without moving a single data
    file; old files read back with typed NULLs; time travel to the
    pre-evolution version shows the old shape."""
    files_before = {f["path"] for f in ct._load_snapshot(table, 0)["files"]}
    v = ct.add_columns(table, {"score": "double"})
    assert v == 1
    assert {f["path"] for f in ct._load_snapshot(table, 1)["files"]} == files_before
    evolved = ct.read_table(spark, table)
    assert evolved.schema["score"].dataType.simpleString() == "double"
    assert evolved.filter(F.col("score").isNotNull()).count() == 0
    assert "score" not in ct.read_table(spark, table, 0).columns
    with pytest.raises(ValueError):
        ct.add_columns(table, {"k": "long"})


def test_merge_after_evolution_mixes_schemas_without_data_loss(spark, table):
    """A merge writing the evolved column must not lose it when old and
    new files mix — survivor rewrites conform to the manifest schema,
    and pruned scans see the evolved shape too."""
    ct.add_columns(table, {"score": "double"})
    updates = spark.range(10, 30).select(
        F.col("id").alias("k"),
        (F.col("id") * 100).alias("v"),
        (F.col("id") * 0.5).alias("score"),
    )
    ct.merge_into(spark, table, updates, "k")
    got = ct.read_table(spark, table)
    assert got.count() == 1000
    scored = got.filter(F.col("score").isNotNull())
    assert scored.count() == 20
    assert {r["k"] for r in scored.collect()} == set(range(10, 30))
    # old rows keep their values and carry a NULL score
    r5 = got.filter("k = 5").first()
    assert r5["v"] == 10 and r5["score"] is None
    # pruned range scan across old+new files conforms to the schema
    df, scanned, total = ct.scan_pruned(spark, table, "k", 0, 40)
    assert "score" in df.columns
    assert scanned < total or total == 1
    # compaction rewrites mixed files without dropping the column
    ct.compact(spark, table, cluster_by="k", n_files=2)
    after = ct.read_table(spark, table)
    assert after.filter(F.col("score").isNotNull()).count() == 20


def test_add_columns_commit_race_conflicts_cleanly(spark, table):
    """Two concurrent schema evolutions race for the same version: the
    loser gets CommitConflictError and the table keeps exactly one of
    the columns — never a corrupted manifest."""
    v_before = ct.latest_version(table)
    ct.add_columns(table, {"a1": "double"})
    # simulate the losing writer: it read v_before, then tries to
    # commit v_before+1 which the first writer already took
    m = ct._read_manifest(table, v_before)
    with pytest.raises(ct.CommitConflictError):
        ct._commit(table, v_before + 1, dict(m, version=v_before + 1))
    cols = ct.read_table(spark, table).columns
    assert "a1" in cols
    assert ct.latest_version(table) == v_before + 1


def test_n_racing_writers_exactly_one_winner_per_version_and_clean_vacuum(
    spark, table
):
    """Concurrency property (round-4 verdict stretch): N writers race
    merges from the same starting snapshot, retrying on conflict. The
    O_EXCL commit protocol must yield EXACTLY one winner per version
    (contiguous chain, each parent = version-1, one manifest file per
    version), every writer's change must land exactly once, and a
    vacuum afterwards must sweep every loser-orphaned data file while
    deleting nothing any retained manifest references."""
    import threading
    from concurrent.futures import ThreadPoolExecutor

    n_writers = 5
    rows_per_writer = 10
    barrier = threading.Barrier(n_writers)
    conflicts = []

    def writer(i: int) -> int:
        lo = 2000 + i * rows_per_writer
        updates = spark.range(lo, lo + rows_per_writer).select(
            F.col("id").alias("k"), F.lit(i).cast("long").alias("v")
        )
        barrier.wait()
        for _ in range(10 * n_writers):  # bounded retry
            try:
                return ct.merge_into(spark, table, updates, "k")["version"]
            except ct.CommitConflictError:
                conflicts.append(i)
        raise AssertionError(f"writer {i} starved past the retry bound")

    with ThreadPoolExecutor(max_workers=n_writers) as ex:
        won_versions = list(ex.map(writer, range(n_writers)))

    # exactly one winner per version: each writer took a distinct
    # version, the chain is contiguous, parents are linear, and O_EXCL
    # left exactly one manifest file per version
    assert sorted(won_versions) == list(range(1, n_writers + 1))
    assert ct.latest_version(table) == n_writers
    for v in range(1, n_writers + 1):
        m = ct._read_manifest(table, v)
        assert m["version"] == v and m["parent"] == v - 1
    mdir = os.path.join(table, "_manifests")
    assert sorted(os.listdir(mdir)) == sorted(
        f"v{v}.json" for v in range(n_writers + 1)
    )

    # every writer's rows landed exactly once
    final = ct.read_table(spark, table)
    assert final.count() == 1000 + n_writers * rows_per_writer
    got = {
        (r["k"], r["v"])
        for r in final.filter(F.col("k") >= 2000).collect()
    }
    want = {
        (2000 + i * rows_per_writer + j, i)
        for i in range(n_writers)
        for j in range(rows_per_writer)
    }
    assert got == want

    before = {tuple(sorted(r)) for r in final.collect()}
    res = ct.vacuum(table, retain_last=1, min_age_seconds=0)
    assert res["manifests_dropped"] == n_writers  # v0..v(n-1) swept

    # nothing a retained manifest references was touched...
    retained = ct._read_manifest(table, n_writers)
    for f in retained["files"]:
        assert os.path.exists(f["path"])
    after = {
        tuple(sorted(r)) for r in ct.read_table(spark, table).collect()
    }
    assert after == before
    # ...and ZERO unreferenced files survive: losers' orphaned writes
    # and pre-horizon files are all gone
    referenced = {f["path"] for f in retained["files"]}
    data_root = os.path.join(table, "data")
    on_disk = set()
    for prefix in os.listdir(data_root):
        d = os.path.join(data_root, prefix)
        on_disk |= {
            os.path.join(d, name)
            for name in os.listdir(d)
            if name.endswith(".parquet")
        }
    assert on_disk == referenced


def test_delta_manifest_chain_reads_identically_and_vacuums_safely(
    spark, tmp_path
):
    """Round-6 checkpointed-log property: commits between checkpoints
    record only (files_added, files_removed) deltas, yet every version
    must read back EXACTLY as committed (verified against a Python-side
    snapshot of each version's expected state), checkpoints must land
    on the cadence with full file lists, and vacuum across a checkpoint
    boundary must rewrite the horizon manifest self-contained, keep
    every retained version byte-identical, and never touch a referenced
    data file."""
    import json

    root = str(tmp_path / "chain")
    df = spark.range(0, 200).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    ct.create_table(spark, root, df, cluster_by="k", n_files=2)

    expected = {0: {(k, 2 * k) for k in range(200)}}
    state = dict(expected[0])
    state = {k: 2 * k for k in range(200)}

    n_commits = 2 * ct._CHECKPOINT_EVERY + 3  # crosses two checkpoints
    for i in range(1, n_commits + 1):
        if i % 3 == 0:
            keys = [((i * 7) % 200,), ((i * 11) % 200,)]
            ct.delete_where(
                spark, root, "k", spark.createDataFrame(keys, "k long")
            )
            for (k,) in keys:
                state.pop(k, None)
        else:
            ups = [((i * 13) % 250, -i), ((i * 17) % 250, -i)]
            ct.merge_into(
                spark, root, spark.createDataFrame(ups, "k long, v long"), "k"
            )
            for k, v in ups:
                state[k] = v
        expected[i] = set(state.items())

    # manifest forms follow the cadence
    for v in range(n_commits + 1):
        raw = ct._read_manifest(root, v)
        if v % ct._CHECKPOINT_EVERY == 0:
            assert "files" in raw, f"v{v} should be a checkpoint"
        else:
            assert "files" not in raw, f"v{v} should be a delta"
            assert "files_added" in raw and "files_removed" in raw

    # every version time-travels to exactly its committed state
    for v, want in expected.items():
        got = {(r["k"], r["v"]) for r in ct.read_table(spark, root, v).collect()}
        assert got == want, f"version {v} mismatch"

    # changed_file_scans across a checkpoint boundary is consistent:
    # (v0 rows - removed + added) == latest rows, as multisets
    added, removed = ct.changed_file_scans(spark, root, 0)
    base = [(r["k"], r["v"]) for r in ct.read_table(spark, root, 0).collect()]
    add = [(r["k"], r["v"]) for r in added.collect()]
    rem = [(r["k"], r["v"]) for r in removed.collect()]
    latest = [(r["k"], r["v"]) for r in ct.read_table(spark, root).collect()]
    recon = sorted(base) + sorted(add)
    for row in rem:
        recon.remove(row)
    assert sorted(recon) == sorted(latest)

    # vacuum with the horizon on a DELTA version: its manifest must be
    # rewritten self-contained, ancestors dropped, retained versions
    # identical, referenced files untouched
    retain = 5
    horizon = n_commits - retain + 1
    assert horizon % ct._CHECKPOINT_EVERY != 0  # really a delta version
    pre = {
        v: expected[v] for v in range(horizon, n_commits + 1)
    }
    res = ct.vacuum(root, retain_last=retain, min_age_seconds=0)
    assert res["manifests_dropped"] == horizon
    raw = ct._read_manifest(root, horizon)
    assert "files" in raw and "files_added" not in raw
    for v, want in pre.items():
        got = {(r["k"], r["v"]) for r in ct.read_table(spark, root, v).collect()}
        assert got == want, f"retained version {v} corrupted by vacuum"
        for f in ct._load_snapshot(root, v)["files"]:
            assert os.path.exists(f["path"])
    with pytest.raises(FileNotFoundError):
        ct.read_table(spark, root, version=horizon - 1)


def test_merge_latest_preserves_null_keyed_rows(spark, tmp_path):
    """Round-6 review fix: NULL-keyed rows in a rewritten file used to
    collapse to ONE row (groupBy puts every NULL in a single group);
    they now pass through rewrites verbatim, matching the anti-join
    paths' never-equal NULL semantics."""
    root = str(tmp_path / "nulltbl")
    df = spark.createDataFrame(
        [(1, 10), (2, 20), (None, 77), (None, 88), (None, 99)],
        "k long, v long",
    )
    ct.create_table(spark, root, df, n_files=1)
    upd = spark.createDataFrame([(2, 21)], "k long, v long")
    ct.merge_latest(spark, root, upd, "k", ["v"])
    rows = sorted(
        [(r["k"], r["v"]) for r in ct.read_table(spark, root).collect()],
        key=lambda t: (t[0] is None, t[0] or 0, t[1]),
    )
    assert rows == [(1, 10), (2, 21), (None, 77), (None, 88), (None, 99)]


def test_merge_latest_replay_guard_scoped_by_app_id(spark, table):
    """Round-6 review fix (Delta txnAppId pattern): a stream restarted
    on a FRESH checkpoint restarts epochs at 0 — with an app id the
    guard no longer silently skips every batch up to the old
    watermark."""
    upd = spark.createDataFrame([(5, 100)], "k long, v long")
    r1 = ct.merge_latest(
        spark, table, upd, "k", ["v"],
        stream_batch_id=41, stream_app_id="ckpt-A",
    )
    assert not r1["skipped_replay"]
    # same app, replayed epoch: skipped
    r2 = ct.merge_latest(
        spark, table, upd, "k", ["v"],
        stream_batch_id=41, stream_app_id="ckpt-A",
    )
    assert r2["skipped_replay"]
    # NEW checkpoint (epochs restart at 0) must COMMIT, not skip
    upd2 = spark.createDataFrame([(5, 200)], "k long, v long")
    r3 = ct.merge_latest(
        spark, table, upd2, "k", ["v"],
        stream_batch_id=0, stream_app_id="ckpt-B",
    )
    assert not r3["skipped_replay"]
    assert {r["v"] for r in ct.read_table(spark, table).filter("k = 5").collect()} == {200}


def test_vacuum_grace_period_protects_inflight_writer_files(spark, table):
    """Round-6 review fix: an uncommitted writer's freshly-written data
    files are invisible to the reference walk; the min_age_seconds
    window must leave them for the next vacuum instead of corrupting
    the commit that lands moments later."""
    inflight = spark.range(3).select(F.col("id").alias("k"), F.col("id").alias("v"))
    new_files = ct._write_data_files(inflight, table)  # written, NOT committed
    res = ct.vacuum(table, retain_last=1, min_age_seconds=3600)
    assert res["files_deleted"] == 0
    for f in new_files:
        assert os.path.exists(f["path"]), "in-flight file was vacuumed"
    # age-0 still sweeps them (the tests/maintenance-window mode)
    res0 = ct.vacuum(table, retain_last=1, min_age_seconds=0)
    assert res0["files_deleted"] == len(new_files)


def test_snapshot_diff_sees_changes_in_evolved_columns(spark, table):
    """Round-6 review fix: the diff compares the UNION of both
    snapshots' columns, so a merge that only touches a schema-evolved
    column still reports 'changed'."""
    v0 = ct.latest_version(table)
    ct.add_columns(table, {"w": "double"})
    upd = spark.createDataFrame([(5, 10, 1.5)], "k long, v long, w double")
    ct.merge_latest(spark, table, upd, "k", ["v", "w"])
    diff = {r["k"]: r["status"] for r in ct.snapshot_diff(spark, table, "k", v0).collect()}
    assert diff.get(5) == "changed"
    assert len(diff) == 1  # v untouched for every other key


def test_merge_into_duplicate_update_keys_reduce_to_one(spark, table):
    """Round-6 review fix: duplicate keys within one update batch
    reduce deterministically (greatest row struct wins) instead of
    each landing in the table and breaking key uniqueness."""
    upd = spark.createDataFrame(
        [(7, 1), (7, 9), (7, 4)], "k long, v long"
    )
    ct.merge_into(spark, table, upd, "k")
    rows = ct.read_table(spark, table).filter("k = 7").collect()
    assert len(rows) == 1
    assert rows[0]["v"] == 9


# ---------------------------------------------------------------------------
# OPTIMIZE ZORDER — multi-dimensional clustering + multi-column pruning


def test_zorder_expr_interleaves_known_bits(spark):
    """Morton-code ground truth: for 2 cols already scaled to exactly
    [0, 2^bits), the interleaved value matches the hand-computed code
    (bit i of col j at position i*2 + j)."""
    df = spark.createDataFrame(
        [(0, 0), (255, 255), (255, 0), (0, 255), (3, 5)], "x long, y long"
    )
    z = ct._zorder_expr(["x", "y"], {"x": (0, 255), "y": (0, 255)}, 8)
    got = {(r["x"], r["y"]): r["z"] for r in df.select("x", "y", z.alias("z")).collect()}

    def morton(x, y):
        v = 0
        for i in range(8):
            v |= ((x >> i) & 1) << (2 * i)
            v |= ((y >> i) & 1) << (2 * i + 1)
        return v

    # scaling with lo=0, hi=255 maps v -> floor(v*256/255), clamped 255
    def scale(v):
        return min(255, v * 256 // 255)

    for (x, y), zv in got.items():
        assert zv == morton(scale(x), scale(y))


def test_optimize_zorder_preserves_content_and_prunes_both_dims(spark, tmp_path):
    """After OPTIMIZE ZORDER BY (x, y): (1) row content is identical;
    (2) a box predicate on BOTH columns scans a small fraction of
    files; (3) a predicate on y ALONE also prunes — the property linear
    cluster_by='x' cannot give (pre-optimize, every file spans all of
    y, so the y-only scan touches everything)."""
    n = 40_000
    # independent 200x200 grid: every x value co-occurs with every y
    df = spark.range(n).select(
        (F.col("id") % 200).alias("x"),
        (F.col("id") / 200).cast("long").alias("y"),
        F.col("id").alias("payload"),
    )
    root = str(tmp_path / "zt")
    ct.create_table(spark, root, df, cluster_by="x", n_files=16)

    before = ct.read_table(spark, root)
    _, y_scan_before, total_before = ct.scan_pruned_multi(
        spark, root, {"y": (0, 19)}
    )
    assert total_before == 16
    assert y_scan_before == total_before  # linear-on-x: y never prunes

    res = ct.optimize_zorder(spark, root, ["x", "y"], n_files=16)
    assert res["files_out"] >= 1

    after = ct.read_table(spark, root)
    assert sorted(map(tuple, before.collect())) == sorted(
        map(tuple, after.collect())
    )

    box, box_scan, total = ct.scan_pruned_multi(
        spark, root, {"x": (0, 19), "y": (0, 19)}
    )
    assert box_scan <= total // 2
    # the residual filter keeps the answer exact
    expected = df.filter(
        (F.col("x") <= 19) & (F.col("y") <= 19)
    ).count()
    assert box.count() == expected

    ydf, y_scan, _ = ct.scan_pruned_multi(spark, root, {"y": (0, 19)})
    assert y_scan < total_before
    assert ydf.count() == df.filter(F.col("y") <= 19).count()


def test_optimize_zorder_time_travel_and_degenerate_column(spark, tmp_path):
    """The optimize commit is a normal version: the pre-optimize
    snapshot still time-travels; a single-valued column contributes
    nothing to the curve but doesn't break the rewrite."""
    df = spark.range(1000).select(
        (F.col("id") % 10).alias("x"), F.lit(7).alias("c"), F.col("id").alias("p")
    )
    root = str(tmp_path / "zt2")
    ct.create_table(spark, root, df, cluster_by="x", n_files=4)
    v0 = ct.latest_version(root)
    ct.optimize_zorder(spark, root, ["x", "c"], n_files=4)
    assert ct.read_table(spark, root, version=v0).count() == 1000
    assert ct.read_table(spark, root).count() == 1000
    assert ct._read_manifest(root, v0 + 1)["operation"] == "optimize_zorder"


# ---------------------------------------------------------------------------
# Bloom-index file skipping — equality pruning on UNCLUSTERED columns


def test_bloom_lookup_prunes_unclustered_column(spark, tmp_path):
    """Table clustered on x; u is a scrambled id so every file's
    [min,max] on u spans ~the whole domain (range stats useless).
    Bloom lookup: (1) never a false negative — every probed present
    value returns its exact rows; (2) scans FAR fewer files than the
    table holds; (3) an absent value scans ~0 files and returns 0
    rows."""
    # 12k rows / 16 files = 750 distinct u per file — UNDER the ~850
    # 1%-FP design point of the 8192-bit/5-hash geometry (round-9
    # advice item: the old 1250/file sat at ~4% FP per file, so the
    # thresholds below held only by deterministic-hash luck).
    n = 12_000
    df = spark.range(n).select(
        (F.col("id") % 100).alias("x"),
        ((F.col("id") * 2654435761) % (2**31)).alias("u"),
        F.col("id").alias("payload"),
    )
    root = str(tmp_path / "bt")
    ct.create_table(
        spark, root, df, cluster_by="x", n_files=16, bloom_cols=["u"]
    )
    total_scanned = 0
    probes = [(i * 2654435761) % (2**31) for i in (0, 7, 123, 9999, 11999)]
    for u in probes:
        hit, scanned, total = ct.scan_pruned_eq(spark, root, "u", u)
        assert total == 16
        rows = hit.collect()
        assert len(rows) == 1 and rows[0]["u"] == u  # no false negative
        total_scanned += scanned
    # 5 point lookups over 16 files: sort order gives no pruning on u.
    # Ideal = 5 (the one true file each); at the <=1% design FP rate
    # the expected extra is 5 probes × 15 other files × 1% = 0.75
    # false-positive files, so <=10 leaves >5σ of margin.
    assert total_scanned <= 10
    miss, scanned, _ = ct.scan_pruned_eq(spark, root, "u", -12345)
    assert miss.count() == 0
    # expected false-positive files for an absent value: 16 × 1% = 0.16
    assert scanned <= 1


def test_bloom_property_inherited_through_merge_and_compact(spark, tmp_path):
    """bloom_cols is a table property: files written by later MERGE and
    COMPACT commits carry fresh blooms, and lookups stay exact for both
    updated and untouched keys."""
    df = spark.range(2_000).select(
        F.col("id").alias("k"), (F.col("id") * 31 % 997).alias("u")
    )
    root = str(tmp_path / "bt2")
    ct.create_table(spark, root, df, cluster_by="k", n_files=8, bloom_cols=["u"])
    upd = spark.createDataFrame([(5, 100_000), (6, 100_000)], "k long, u long")
    ct.merge_into(spark, root, upd, "k")
    m = ct._load_snapshot(root, ct.latest_version(root))
    assert m.get("bloom_cols") == ["u"]
    assert all("bloom" in f and "u" in f["bloom"] for f in m["files"])
    hit, scanned, total = ct.scan_pruned_eq(spark, root, "u", 100_000)
    assert {r["k"] for r in hit.collect()} == {5, 6}
    assert scanned < total
    ct.compact(spark, root, cluster_by="k", n_files=4)
    m2 = ct._load_snapshot(root, ct.latest_version(root))
    assert all("bloom" in f for f in m2["files"])
    hit2, _, _ = ct.scan_pruned_eq(spark, root, "u", 100_000)
    assert {r["k"] for r in hit2.collect()} == {5, 6}


def test_bloom_absent_table_scans_conservatively(spark, tmp_path):
    """A table created WITHOUT bloom_cols answers equality lookups
    correctly by scanning every range-compatible file (no bloom entries
    to consult)."""
    df = spark.range(500).select(F.col("id").alias("k"), (F.col("id") % 7).alias("u"))
    root = str(tmp_path / "bt3")
    ct.create_table(spark, root, df, cluster_by="k", n_files=4)
    hit, scanned, total = ct.scan_pruned_eq(spark, root, "u", 3)
    assert scanned == total == 4
    assert hit.count() == df.filter(F.col("u") == 3).count()


def test_bloom_numeric_probe_type_coercion(spark, tmp_path):
    """Spark's equality residual coerces int/float: probing a long
    column with 7.0 (or a double column with 7) must not Bloom-miss
    (round-9 advice item — repr-keyed hashing was type-strict, so the
    documented no-false-negative contract broke for integral-float
    probes: the residual would match rows in files the bloom had
    already pruned away)."""
    assert ct._bloom_key(7.0) == ct._bloom_key(7)
    assert ct._bloom_key(True) != ct._bloom_key(1)  # bool stays distinct
    assert ct._bloom_key(7.5) != ct._bloom_key(7)
    assert ct._bloom_key("7") != ct._bloom_key(7)  # strings stay strict

    df = spark.range(200).select(
        F.col("id").alias("k"), (F.col("id") % 50).alias("u")
    )
    root = str(tmp_path / "btc")
    ct.create_table(spark, root, df, cluster_by="k", n_files=2, bloom_cols=["u"])
    hit, _, _ = ct.scan_pruned_eq(spark, root, "u", 7.0)
    assert hit.count() == 4  # long column, float probe: no false negative

    dfd = spark.range(200).select(
        F.col("id").alias("k"), (F.col("id") % 50).cast("double").alias("u")
    )
    root2 = str(tmp_path / "btc2")
    ct.create_table(
        spark, root2, dfd, cluster_by="k", n_files=2, bloom_cols=["u"]
    )
    hit2, _, _ = ct.scan_pruned_eq(spark, root2, "u", 7)
    assert hit2.count() == 4  # double column, int probe


def test_manifest_sharding_end_to_end(spark, tmp_path, monkeypatch):
    """Manifest-of-manifests (round-10 verdict item 7), forced active by
    shrinking the thresholds: a table whose checkpoints exceed
    _SHARD_AFTER files stores the file list as shard files referenced
    from the manifest. Exercises, on a genuinely multi-shard table:
    create (v0 sharded) → read → MERGE deltas → time travel → the v10
    checkpoint REUSING unchanged v0 shards by reference → range-pruned
    and Bloom-pruned scans → vacuum (horizon rewrite + shard GC) with
    every retained version still reading exactly as committed."""
    monkeypatch.setattr(ct, "_SHARD_AFTER", 4)
    monkeypatch.setattr(ct, "_SHARD_TARGET", 2)

    df = spark.range(4_000).select(
        F.col("id").alias("k"),
        (F.col("id") % 97).alias("u"),
        (F.col("id") * 3).alias("payload"),
    )
    root = str(tmp_path / "sharded")
    # 48 files at target 2 → 32 shards; ten merges net ~+10 files,
    # still ≤ 64 so the power-of-two shard count HOLDS across the next
    # checkpoint — the regime where shard reuse fires (a count change
    # legitimately rewrites all shards, documented in _shard_count)
    ct.create_table(
        spark, root, df, cluster_by="k", n_files=48, bloom_cols=["u"]
    )
    m0 = ct._read_manifest(root, 0)
    assert "files" not in m0 and len(m0["file_shards"]) == 32
    assert ct.read_table(spark, root).count() == 4_000

    # ten MERGE commits (deltas v1..v9, checkpoint v10) touching only
    # the files that hold each key — most shards' content is unchanged
    for i in range(10):
        upd = spark.createDataFrame(
            [(i * 37, i * 37 % 97, -1)], "k long, u long, payload long"
        )
        ct.merge_into(spark, root, upd, "k")
    assert ct.latest_version(root) == 10
    m10 = ct._read_manifest(root, 10)
    assert "file_shards" in m10
    reused = set(m0["file_shards"]) & set(m10["file_shards"])
    assert reused, "v10 checkpoint reuses no v0 shards"
    assert set(m10["file_shards"]) - set(m0["file_shards"]), (
        "v10 rewrote nothing — the merges must have changed some shard"
    )

    # reads: latest, time travel to v0 and a delta version, history
    assert ct.read_table(spark, root).count() == 4_000
    assert ct.read_table(spark, root, version=0).count() == 4_000
    v5 = ct.read_table(spark, root, version=5)
    assert v5.filter(F.col("k") == 4 * 37).first()["payload"] == -1
    hist = ct.history(root)
    assert [h["version"] for h in hist] == list(range(11))
    assert all(h["n_rows"] == 4_000 for h in hist)

    # pruned scans still work over the sharded snapshot
    hit, scanned, total = ct.scan_pruned(spark, root, "k", 100, 120)
    assert hit.count() == 21 and scanned < total
    bhit, bscanned, btotal = ct.scan_pruned_eq(spark, root, "u", 96)
    assert bhit.count() == df.filter(F.col("u") == 96).count()
    assert bscanned <= btotal

    # vacuum: horizon rewrite + manifest drop + shard GC; retained
    # versions keep reading, dropped shard files are gone
    res = ct.vacuum(root, retain_last=3, min_age_seconds=0.0)
    assert res["manifests_dropped"] == 8
    assert ct.oldest_version(root) == 8
    assert ct.read_table(spark, root).count() == 4_000
    assert ct.read_table(spark, root, version=8).count() == 4_000
    live_refs = set()
    for v in range(8, 11):
        live_refs |= set(ct._read_manifest(root, v).get("file_shards", ()))
    sdir = tmp_path / "sharded" / "_manifests" / "shards"
    on_disk = {f"shards/{p.name}" for p in sdir.iterdir()}
    assert on_disk == live_refs, (on_disk, live_refs)


def test_manifest_shard_writers_never_collide(tmp_path, monkeypatch):
    """Two writers racing to the SAME checkpoint version write
    uniquely-named shard files (the shard twin of data files' uuid
    prefixes): the commit-CAS loser can never overwrite shard content
    the winner's manifest references — its shards are unreferenced
    garbage for the vacuum GC."""
    monkeypatch.setattr(ct, "_SHARD_AFTER", 1)
    monkeypatch.setattr(ct, "_SHARD_TARGET", 1)
    root = str(tmp_path / "race")

    def entries(tag, n):
        return [
            {"path": f"{root}/data/{tag}/{i}.parquet", "n_rows": 1,
             "min": {}, "max": {}}
            for i in range(n)
        ]

    files_a = entries("a", 6)
    files_b = entries("b", 6)
    refs_a = ct._write_shards(root, 10, files_a)
    refs_b = ct._write_shards(root, 10, files_b)
    assert not set(refs_a) & set(refs_b)  # disjoint paths by token
    # writer B's writes did not disturb what A's refs resolve to
    got_a = sorted(
        f["path"] for ref in refs_a for f in ct._read_shard(root, ref)
    )
    assert got_a == sorted(f["path"] for f in files_a)
    got_b = sorted(
        f["path"] for ref in refs_b for f in ct._read_shard(root, ref)
    )
    assert got_b == sorted(f["path"] for f in files_b)


def test_zorder_rejects_bit_overflow(spark, tmp_path):
    df = spark.range(10).select(*[(F.col("id")).alias(f"c{i}") for i in range(8)])
    root = str(tmp_path / "zo")
    ct.create_table(spark, root, df, n_files=2)
    with pytest.raises(ValueError, match="overflows the int64"):
        ct.optimize_zorder(spark, root, [f"c{i}" for i in range(8)])
