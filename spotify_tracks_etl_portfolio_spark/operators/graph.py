"""Iterative graph analytics over relational edge lists (north star:
BASELINE.json LLM-pipeline extensions; complements the connected-
components propagation in ``operators/dedup.py``).

PageRank here is the classic power iteration with a FIXED, unrolled
round count — the same determinism pattern as the zero-RNG k-means in
``operators/similarity.py``: every floating-point step is either an
IEEE-exact scalar operation (one division, one multiply, one add —
bit-identical on any engine) or an order-insensitive DECIMAL sum of
12-dp-rounded terms, so a DuckDB oracle can replay the iterations as
an unrolled CTE chain and hash-match bit-for-bit.

Scale posture (100 TB): each iteration is ONE equi-join of the edge
list with the current rank vector (shuffle on src) plus ONE hash
aggregation (shuffle on dst) — no driver-side state beyond the scalar
node count, no collect of ranks, no all-pairs term. Unrolled
iterations reuse the same edge subtree (Spark dedupes the scan via
exchange reuse; persist() the edge list when iterating many rounds).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Damping factor and iteration count are FROZEN so the oracle SQL can
#: unroll the same constants.
PAGERANK_DAMPING = 0.85
PAGERANK_ITERS = 3

#: Per-edge contributions are rounded to this many decimals and summed
#: as DECIMAL(28,12) — exact and order-insensitive regardless of
#: partitioning (same contract as the unigram-LM logprob sums).
CONTRIB_DP = 12


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = PAGERANK_ITERS,
    damping: float = PAGERANK_DAMPING,
) -> DataFrame:
    """PageRank over a directed edge list; returns ``(node, rank)``.

    Nodes are those appearing as a source (callers feeding an
    undirected graph emit both edge directions, so every node has both
    in- and out-edges and there is no dangling mass to redistribute).

    Determinism: rank updates are
    ``r' = round((1-d)/N + d * S, 12)`` where ``S`` is the DECIMAL-exact
    sum of ``round(r/deg, 12)`` contributions — each scalar op is a
    single IEEE double operation, so the trajectory is bit-identical
    across engines and partitionings.
    """
    # The edge list and degree table feed EVERY iteration: persist the
    # edges and truncate each iteration's lineage with an eager
    # localCheckpoint (same pattern as connected_components) — without
    # this the fact-join subtree re-executes once per iteration and the
    # plan doubles per round (measured 12.8s → ~4s at sf0.1).
    # Hash-partition the cached edges on the join key so every
    # iteration's contribution join reuses the layout (only the small
    # rank vector moves), and build the per-iteration hash map from the
    # rank side (shuffle_hash hint): ranks scale with NODES, edges with
    # EDGES — hashing the small side avoids re-sorting the big cached
    # side every round, without ever broadcasting a node-scaled table.
    e = (
        edges.select(F.col(src).alias("__src"), F.col(dst).alias("__dst"))
        .repartition("__src")
        .persist()
    )
    deg = (
        e.groupBy(F.col("__src").alias("node"))
        .agg(F.count(F.lit(1)).alias("deg"))
        .localCheckpoint(eager=True)
    )
    # Node count as a DRIVER SCALAR (r13 optimization round): one
    # bounded count over the checkpointed degree table replaces a
    # 1-row broadcast nested-loop join per iteration (plus its agg
    # subtree re-executing every round). The two scalar terms below
    # replay the ORIGINAL IEEE op sequence exactly — Python doubles
    # and Spark doubles run the same hardware ops in the same order
    # (1/N; (1-d) then /N) — so every rank trajectory is bit-identical
    # to the broadcast formulation and the unrolled DuckDB oracle.
    n = deg.count()
    inv_n = 1.0 / float(n) if n else 0.0
    teleport = (1.0 - damping) / float(n) if n else 0.0

    # r0 = 1/N for every node (one IEEE division — exact).
    ranks = deg.select("node", "deg", F.lit(inv_n).alias("rank"))

    for _ in range(iters):
        contrib = e.join(
            ranks.withColumnRenamed("node", "__src").hint("shuffle_hash"),
            "__src",
        ).select(
            F.col("__dst").alias("node"),
            F.round(F.col("rank") / F.col("deg"), CONTRIB_DP)
            .cast(f"decimal(28,{CONTRIB_DP})")
            .alias("__c"),
        )
        summed = contrib.groupBy("node").agg(F.sum("__c").alias("__s"))
        ranks = (
            deg.join(summed, "node", "left")
            .select(
                "node",
                "deg",
                F.round(
                    F.lit(teleport)
                    + F.lit(damping)
                    * F.coalesce(
                        F.col("__s").cast("double"), F.lit(0.0)
                    ),
                    CONTRIB_DP,
                ).alias("rank"),
            )
        ).localCheckpoint(eager=True)
    # ranks is materialized by the checkpoint — its plan no longer
    # references the persisted edges, so the cache can go now.
    e.unpersist()
    return ranks.select("node", "rank")


def trade_graph_edges(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """Undirected customer–supplier trade graph as a directed edge list
    (both directions): distinct ``(o_custkey, l_suppkey)`` pairs from
    the orders⋈lineitem fact join. Node ids are made disjoint by
    parity: customer ``c → 2c``, supplier ``s → 2s+1``.
    """
    pairs = (
        lineitem.select("l_orderkey", "l_suppkey")
        .join(
            orders.select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(
            (F.col("o_custkey") * 2).alias("cnode"),
            (F.col("l_suppkey") * 2 + 1).alias("snode"),
        )
        .distinct()
    )
    fwd = pairs.select(F.col("cnode").alias("src"), F.col("snode").alias("dst"))
    rev = pairs.select(F.col("snode").alias("src"), F.col("cnode").alias("dst"))
    return fwd.unionByName(rev)
