"""Same-session alternating A/B probe for optimization evidence.

Times a list of named DataFrame builders (callables returning a DF) with
the noop sink, alternating legs A/B/A/B... so host drift hits both legs
equally (the repo's established evidence standard, BENCH_NOTES r4-r12).

Usage: import from an interactive driver script; see probes under
/tmp/probe_*.py written per optimization.
"""

from __future__ import annotations

import time


def noop_time(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def ab(spark, legs: dict, laps: int = 3, gc_between: bool = True) -> dict:
    """legs: {name: zero-arg callable -> DataFrame}. Returns
    {name: [seconds per lap]} with legs alternated each lap."""
    out = {name: [] for name in legs}
    for _ in range(laps):
        for name, build in legs.items():
            if gc_between:
                import gc

                gc.collect()
                spark._jvm.System.gc()
            spark.sparkContext.setJobDescription(f"ab:{name}")
            out[name].append(round(noop_time(build()), 3))
            spark.sparkContext.setJobDescription(None)
    return out


def median(xs):
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2
