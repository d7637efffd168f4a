"""Generate a key-offset xN replica of a driver testdata dir for STRESS
TIMING ONLY — never correctness (oracles always run on the driver's own
parquet; this tool exists because the round-4 verdict asked for one
order of magnitude of empirical scale confirmation and the driver ships
no sf1).

Construction: every fact/entity table is unioned N times; replica r
adds ``r * K`` to each key column, where K is the smallest power of 10
above the source max of that key family, so (a) keys never collide
across replicas and (b) every foreign key stays valid because both
sides of each FK family shift by the same offset. ``region``/``nation``
(bounded dimensions, referenced by unshifted nationkey columns) copy
verbatim. Non-key attributes — timestamps, text, embeddings — are kept
IDENTICAL across replicas: same date range at 10x daily density (the
realistic growth mode for an event stream), and a dedup-heavy corpus
where every document gains N-1 exact twins (a stress case for exactly
the dedup/ANN components under audit, documented in BENCH_NOTES.md).

Usage: python tools/make_stress_sf.py [--src /root/testdata/sf0.1]
       [--dst <repo>/.stress/sf1] [--factor 10]
"""

from __future__ import annotations

import argparse
import math
import os

import duckdb

#: key column -> offset family; every column in a family shares one K
#: (computed from the family's max across ALL tables referencing it).
KEY_FAMILIES: dict[str, list[tuple[str, str]]] = {
    "cust": [("customer", "c_custkey"), ("orders", "o_custkey")],
    "supp": [("supplier", "s_suppkey"), ("lineitem", "l_suppkey")],
    "part": [("part", "p_partkey"), ("lineitem", "l_partkey")],
    "order": [("orders", "o_orderkey"), ("lineitem", "l_orderkey")],
    "event": [("events", "event_id")],
    "user": [("events", "user_id")],
    "doc": [("documents", "doc_id")],
    "vec": [("embeddings", "vec_id")],
}

COPY_VERBATIM = ("region", "nation")
REPLICATED = (
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def family_offsets(con: duckdb.DuckDBPyConnection, src: str) -> dict[str, int]:
    out: dict[str, int] = {}
    for fam, cols in KEY_FAMILIES.items():
        mx = 0
        for table, col in cols:
            v = con.sql(
                f"SELECT max({col}) FROM '{src}/{table}.parquet'"
            ).fetchone()[0]
            mx = max(mx, int(v))
        out[fam] = 10 ** math.ceil(math.log10(mx + 1))
    return out


def shifted_cols(table: str, offsets: dict[str, int]) -> dict[str, int]:
    return {
        col: offsets[fam]
        for fam, cols in KEY_FAMILIES.items()
        for t, col in cols
        if t == table
    }


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default=os.path.join(repo, ".stress", "sf1"))
    ap.add_argument("--factor", type=int, default=10)
    args = ap.parse_args()
    os.makedirs(args.dst, exist_ok=True)

    con = duckdb.connect()
    offsets = family_offsets(con, args.src)
    print(f"key offsets: {offsets}")

    for table in COPY_VERBATIM:
        con.sql(
            f"COPY (SELECT * FROM '{args.src}/{table}.parquet') "
            f"TO '{args.dst}/{table}.parquet' (FORMAT PARQUET)"
        )
        print(f"{table}: copied verbatim")

    for table in REPLICATED:
        shifts = shifted_cols(table, offsets)
        cols = [
            c[0]
            for c in con.sql(
                f"DESCRIBE SELECT * FROM '{args.src}/{table}.parquet'"
            ).fetchall()
        ]
        sel = ", ".join(
            f"t.{c} + r.r * {shifts[c]} AS {c}" if c in shifts else f"t.{c}"
            for c in cols
        )
        con.sql(
            f"COPY (SELECT {sel} FROM '{args.src}/{table}.parquet' t "
            f"CROSS JOIN range({args.factor}) r(r)) "
            f"TO '{args.dst}/{table}.parquet' (FORMAT PARQUET)"
        )
        n = con.sql(
            f"SELECT count(*) FROM '{args.dst}/{table}.parquet'"
        ).fetchone()[0]
        print(f"{table}: {n} rows (x{args.factor}, shifted {sorted(shifts)})")


if __name__ == "__main__":
    main()
