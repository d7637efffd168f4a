"""Auto-width scale probe (round-6 verdict items 2 + stretch 8): time
the three formerly bucket-saturating operators — SimHash near-dups,
hyperplane-LSH near-dups, SemDeDup — at several stress scales with NO
manual knobs (the r06 auto-derived widths) and, for contrast, with the
frozen toy geometry. Sublinear growth under defaults is the acceptance
criterion; the r05 evidence needed hand-passed knobs (bits=59, rows=16,
k=80) to get there.

EXECUTOR (round-8 verdict item 3): ``qe.toRdd().count()`` — the same
honest materializer as tools/stress_sweep.py. The original
``df.count()`` executor let Catalyst prune entire subtrees under the
count aggregate (a count over the left-join-unique dedup shapes never
runs the pair-verify join), which silently reduced the r06 semantic
rows to assignment-only timings — retracted in BENCH_NOTES r7. toRdd
materializes EVERY operator of the frame's own finalized AQE plan.

Usage: python tools/auto_width_probe.py [--dirs sf0.1,sf1,sf3]
       (names resolve under /root/testdata or <repo>/.stress)

Numbers land in .stress/auto_width_probe.json and are summarized in
BENCH_NOTES.md. Timing only — oracles always run on driver parquet.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _resolve(name: str, repo: str) -> str:
    for base in ("/root/testdata", os.path.join(repo, ".stress")):
        p = os.path.join(base, name)
        if os.path.isdir(p):
            return p
    raise FileNotFoundError(name)


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ap = argparse.ArgumentParser()
    ap.add_argument("--dirs", default="sf0.1,sf1,sf3")
    ap.add_argument(
        "--out", default=os.path.join(repo, ".stress", "auto_width_probe.json")
    )
    args = ap.parse_args()

    from spotify_tracks_etl_portfolio_spark.operators import dedup as dd
    from spotify_tracks_etl_portfolio_spark.operators import similarity as sim
    from spotify_tracks_etl_portfolio_spark.session import get_spark

    spark = get_spark("auto_width_probe")

    def timed(fn):
        # toRdd().count() materializes the FULL finalized plan (no
        # count-aggregate subtree pruning — round-8 verdict item 3);
        # row count comes from the same RDD pass, zero extra jobs
        import gc as _gc

        _gc.collect()
        spark._jvm.System.gc()
        t0 = time.time()
        n = fn()._jdf.queryExecution().toRdd().count()
        return round(time.time() - t0, 1), n

    results: dict[str, dict] = {}
    for name in args.dirs.split(","):
        sf = _resolve(name, repo)
        docs = spark.read.parquet(f"{sf}/documents.parquet")
        emb = spark.read.parquet(f"{sf}/embeddings.parquet")
        n_docs, n_vecs = docs.count(), emb.count()
        row: dict = {"n_docs": n_docs, "n_vecs": n_vecs, "ops": {}}

        cases = [
            (
                "simhash_near_dups",
                {"auto_width": dd.auto_simhash_bits(n_docs, 3)},
                lambda: dd.simhash_near_dup_pairs(docs, "doc_id", "text", 3),
                lambda: dd.simhash_near_dup_pairs(
                    docs, "doc_id", "text", 3, bits=dd.SIMHASH_BITS
                ),
            ),
            (
                "hyperplane_lsh_near_dups",
                {"auto_width": sim.auto_hyperplane_rows(n_vecs)},
                lambda: sim.hyperplane_lsh_near_dup_pairs(
                    emb, "vec_id", "embedding", 0.4
                ),
                lambda: sim.hyperplane_lsh_near_dup_pairs(
                    emb, "vec_id", "embedding", 0.4, rows=sim.HP_ROWS
                ),
            ),
            (
                "semantic_dedup",
                {"auto_width": sim.auto_semdedup_k(n_vecs)},
                lambda: sim.semantic_dedup(emb, "vec_id", "embedding", 0.9),
                lambda: sim.semantic_dedup(emb, "vec_id", "embedding", 0.9, k=8),
            ),
        ]
        for op, meta, auto_fn, frozen_fn in cases:
            sec, n = timed(auto_fn)
            entry = {**meta, "auto_sec": sec, "auto_rows": n}
            # the frozen toy geometry for contrast — skipped at the
            # biggest scale where it is known-quadratic (no point
            # burning minutes proving the cliff a third time)
            if name != "sf3":
                fsec, fn_rows = timed(frozen_fn)
                entry["frozen_sec"] = fsec
                entry["frozen_rows"] = fn_rows
            row["ops"][op] = entry
            print(f"{name} {op}: {entry}", flush=True)
        results[name] = row

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as fh:
        json.dump(results, fh, indent=1)
    print(f"-> {args.out}")


if __name__ == "__main__":
    main()
