"""Local replica of the driver's correctness gate.

Runs every registered query on Spark and its DuckDB oracle at sf0.01,
then compares row count, column names, and an order-insensitive value
multiset (columns sorted by name, rows sorted, values normalized).
Use while iterating so CORRECTNESS_r{N}.json holds no surprises.

    python tools/check_oracle.py [--sf /root/testdata/sf0.01] [name ...]
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
# Python workers need the repo on PYTHONPATH (sys.path doesn't reach
# them) — matters when running this tool from any cwd outside the repo.
from spotify_tracks_etl_portfolio_spark.session import (  # noqa: E402
    export_repo_pythonpath,
)

export_repo_pythonpath(_REPO)

import duckdb

from spotify_tracks_etl_portfolio_spark.schemas import TESTDATA_TABLES


def _norm(v):
    """TYPE-STRICT value normalization.

    The driver's hash is dtype-aware: DuckDB's uncast ``sum(BIGINT)``
    yields HUGEINT, which crosses the Arrow/pandas boundary as
    decimal128/float64 and hash-mismatches Spark's int64 even when the
    numeric values are identical (the round-3
    ``embedding_random_projection`` / ``embedding_diverse_sample``
    failures).  Python's ``5 == 5.0 == Decimal(5)`` hid that here, so we
    tag every value with its type family: int vs float vs Decimal vs
    bool never compare equal across families.
    """
    import datetime
    import decimal

    if v is None:
        return None
    if isinstance(v, bool):  # before int (bool subclasses int)
        return ("b", v)
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "NaN")
        return ("f", repr(v))
    if isinstance(v, decimal.Decimal):
        return ("dec", str(v))
    if isinstance(v, str):
        return ("s", v)
    if isinstance(v, (datetime.datetime, datetime.date)):
        return ("t", str(v))
    return ("o", str(v))


def _multiset(rows):
    return sorted(
        (tuple(_norm(v) for v in row) for row in rows),
        key=lambda r: tuple((x is None, str(type(x)), str(x)) for x in r),
    )


def _only_ulp_floats(ra, rb) -> bool:
    """True when two normalized rows differ ONLY in float cells that are
    within 2 ulp of each other — the decimal→double conversion-artifact
    signature (the engines' exact DECIMAL values agree; one engine
    double-rounds the conversion). Classifier only: the row still FAILS;
    this just labels the failure so it isn't chased as nondeterminism."""
    if len(ra) != len(rb):
        return False
    saw_float_diff = False
    for a, b in zip(ra, rb):
        if a == b:
            continue
        if not (
            isinstance(a, tuple) and isinstance(b, tuple)
            and a[0] == "f" and b[0] == "f"
        ):
            return False
        fa, fb = float(a[1]), float(b[1])
        if fa != fa or fb != fb:  # NaN never counts as a ulp pair
            return False
        if abs(fa - fb) > 2 * math.ulp(max(abs(fa), abs(fb))):
            return False
        saw_float_diff = True
    return saw_float_diff


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument(
        "--plain",
        action="store_true",
        help="worst-case driver session: a BARE SparkSession with none "
        "of session.py's confs (no UTC timezone, no AQE, no "
        "nanosAsLong) — what the real harness runs queries under",
    )
    ap.add_argument("--first", type=int, default=0,
                    help="only the first N registry entries (0 = all)")
    ap.add_argument("--json", default=None, metavar="PATH",
                    help="also write per-query results as JSON (the "
                    "committed SWEEP_r{N}.json full-registry artifact — "
                    "replica evidence, NOT the driver's hard signal)")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    from spotify_tracks_etl_portfolio_spark.plans import all_queries

    specs = all_queries()
    names = args.names or list(specs)
    if args.first:
        names = names[: args.first]

    if args.plain:
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[8]")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
    else:
        from spotify_tracks_etl_portfolio_spark.session import get_spark

        spark = get_spark("check_oracle", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        path = os.path.join(args.sf, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )

    failures = []
    report: dict[str, dict] = {}
    for name in names:
        spec = specs[name]
        t0 = time.time()
        try:
            sdf = spec.fn(spark, args.sf)
            s_cols = list(sdf.columns)
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failures.append(name)
            report[name] = {"status": "fail", "err": f"spark: {e}"}
            continue
        if spec.oracle is None:
            print(f"pass {name}: rows-only ({len(s_rows)} rows) "
                  f"[{time.time()-t0:.1f}s]")
            report[name] = {
                "status": "rows_only",
                "rows": len(s_rows),
                "sec": round(time.time() - t0, 1),
            }
            continue
        try:
            # Fetch through Arrow, like the driver: DuckDB HUGEINT /
            # other exotic types take the same conversion hit they take
            # in the real harness (uncast sums become decimal128, not
            # exact Python ints), so the replica can no longer pass an
            # oracle the driver would hash-fail.
            tbl = con.execute(spec.oracle).fetch_arrow_table()
            o_cols = list(tbl.column_names)
            o_rows = [
                tuple(d[c] for c in o_cols) for d in tbl.to_pylist()
            ]
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            failures.append(name)
            report[name] = {"status": "fail", "err": f"oracle: {e}"}
            continue

        ok = True
        if sorted(s_cols) != sorted(o_cols):
            print(f"FAIL {name}: columns spark={sorted(s_cols)} oracle={sorted(o_cols)}")
            ok = False
        if len(s_rows) != len(o_rows):
            print(f"FAIL {name}: rowcount spark={len(s_rows)} oracle={len(o_rows)}")
            ok = False
        if ok:
            s_idx = [s_cols.index(c) for c in sorted(s_cols)]
            o_idx = [o_cols.index(c) for c in sorted(o_cols)]
            sm = _multiset([[r[i] for i in s_idx] for r in s_rows])
            om = _multiset([[r[i] for i in o_idx] for r in o_rows])
            if sm != om:
                ok = False
                diffs = [(a, b) for a, b in zip(sm, om) if a != b]
                ulp_note = (
                    " [every diff is a <=2-ulp float pair: decimal->double "
                    "CONVERSION artifact (DuckDB double-rounds int128-scaled "
                    "decimals; Spark/BigDecimal round correctly) — the "
                    "engines' exact DECIMAL sums agree, see BENCH_NOTES r5. "
                    "Bites only when |sum| pushes the double ulp above the "
                    "decimal scale — not seen at the sf0.01 driver gate]"
                    if diffs and all(_only_ulp_floats(a, b) for a, b in diffs)
                    else ""
                )
                print(f"FAIL {name}: value mismatch ({len(diffs)} differing rows); "
                      f"first: spark={diffs[0][0]} oracle={diffs[0][1]}{ulp_note}")
        if ok:
            print(f"PASS {name} ({len(s_rows)} rows) [{time.time()-t0:.1f}s]")
        else:
            failures.append(name)
        report[name] = {
            "status": "pass" if ok else "fail",
            "rows": len(s_rows),
            "sec": round(time.time() - t0, 1),
        }

    print(f"\n{len(names)-len(failures)}/{len(names)} passed")
    if args.json:
        import json

        with open(args.json, "w") as fh:
            json.dump(
                {
                    "sf": args.sf,
                    "session": "plain" if args.plain else "configured",
                    "n_pass": len(names) - len(failures),
                    "n_total": len(names),
                    "queries": report,
                },
                fh,
                indent=1,
            )
        print(f"wrote {args.json}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
