"""DQ suite semantics: one-pass expectation evaluation, soft/hard gates,
corrected value-range checks (SURVEY.md §5)."""

from __future__ import annotations

import pytest

from spotify_tracks_etl_portfolio_spark.operators.dq import (
    DataQualityError,
    Suite,
)

SCHEMA = "id long, name string, score double"
ROWS = [
    (1, "a", 0.5),
    (2, "b", 1.5),   # out of [0,1]
    (2, None, 0.7),  # dup id + null name
]


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(ROWS, SCHEMA)


def test_suite_detects_all_violations(df):
    suite = Suite(
        name="t",
        not_null=["name"],
        unique=["id"],
        between={"score": (0.0, 1.0)},
        column_types={"score": "double", "id": "bigint"},
        row_count_min=1,
    )
    report = suite.run(df)
    by_name = {r.name: r for r in report.results}
    assert not report.success
    assert not by_name["not_null:name"].success
    assert by_name["not_null:name"].observed == 1
    assert not by_name["unique:id"].success
    assert not by_name["between:score"].success
    assert by_name["between:score"].observed == 1
    assert by_name["column_type:score"].success
    assert by_name["row_count_min"].success


def test_hard_gate_raises(df):
    suite = Suite(name="t", unique=["id"])
    with pytest.raises(DataQualityError, match="unique:id"):
        suite.run(df).raise_on_failure()


def test_clean_data_passes(spark):
    clean = spark.createDataFrame([(1, "a", 0.5), (2, "b", 0.9)], SCHEMA)
    suite = Suite(
        name="t",
        not_null=["id", "name", "score"],
        unique=["id"],
        compound_unique=[["id", "name"]],
        between={"score": (0.0, 1.0)},
        min_value={"score": 0.0},
        row_count_equals=2,
    )
    report = suite.run(clean)
    assert report.success, [r.name for r in report.failures()]
    report.raise_on_failure()  # no-op


def test_nulls_dont_trip_range_checks(spark):
    df = spark.createDataFrame([(1, "a", None)], SCHEMA)
    report = Suite(name="t", between={"score": (0.0, 1.0)}).run(df)
    assert report.success


def test_validation_report_renders_markdown(spark):
    """Human-readable one-page artifact from ValidationReport — the
    engine's twin of the reference's rendered GX evidence
    (images/ss_silver_validation_gx.png). Failures lead the table."""
    suite = Suite(
        name="render_demo",
        not_null=["a"],
        between={"b": (0.0, 1.0)},
        row_count_min=1,
    )
    df = spark.createDataFrame(
        [(None, 0.5), ("x", 5.0)], "a string, b double"
    )
    report = suite.run(df)
    md = report.to_markdown()
    assert "# Validation report — `render_demo`" in md
    assert "**FAILED**" in md and "1/3 expectations met" in md
    # every expectation appears exactly once
    for name in ("not_null:a", "between:b", "row_count_min"):
        assert md.count(f"`{name}`") == 1
    # failures come before the passing row
    assert md.index("not_null:a") < md.index("row_count_min")
    assert md.index("between:b") < md.index("row_count_min")
    assert "❌ FAIL" in md and "✅ pass" in md

    ok = Suite(name="all_green", row_count_min=1).run(df)
    assert "**PASSED**" in ok.to_markdown()
