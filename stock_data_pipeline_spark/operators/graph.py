"""Graph analytics as unrolled declarative rounds — PageRank.

The reference has no graph operators; this is the extension family for
link-style analyses over pipeline-derived graphs (event-transition
graphs, dup-pair graphs from llm.dedup, citation/url graphs at corpus
scale). Same execution philosophy as llm.clustering.kmeans_fixed: a
FIXED number of rounds unrolled into one lazy Catalyst plan — no
driver-side loop state, no actions during plan construction, resumable
and oracle-reproducible because every round is pure DataFrame algebra.

Determinism discipline (what makes a full value oracle possible):
- edge weights and out-degrees are exact integers;
- each node's incoming contributions are folded LEFT-TO-RIGHT in
  source-node order (sorted struct fold), not hash-aggregated — double
  addition is order-sensitive, so the fold order is pinned;
- the damping update ``(1-d)/N + d * s`` applies the identical IEEE
  operation sequence in any engine.

Scale: each round is one equi-join (ranks × edges on src) plus one
grouped fold on dst — shuffle ∝ |edges|, the same cost profile as the
Pregel supersteps in distributed PageRank. The sorted-fold per dst
bounds memory by in-degree; for web-scale in-degrees (millions) you'd
swap the pinned fold for a plain SUM and accept ulp drift — the fold
is the price of bit-exact cross-engine verification, not a scaling
requirement. Rank state between rounds stays columnar; N (node count)
is a 1-row broadcast, never a driver action.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank_fixed(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str = "weight",
    rounds: int = 3,
    damping: float = 0.85,
) -> DataFrame:
    """Weighted PageRank, ``rounds`` unrolled iterations, uniform init.

    ``edges`` must carry integer weights (e.g. transition counts).
    Nodes are the union of sources and destinations. Returns
    ``(node, pr)`` with ``pr`` the rank after the final round.

    Dangling nodes (no out-edges) leak their mass — standard
    simplification; document it where the invariant matters. Nodes with
    no in-edges receive the teleport term only.
    """
    nodes = (
        edges.select(F.col(src).alias("node"))
        .unionByName(edges.select(F.col(dst).alias("node")))
        .distinct()
    )
    n1 = nodes.agg(F.count(F.lit(1)).alias("__n"))
    # rank state: node, pr, plus the broadcast N every round reuses
    ranks = nodes.crossJoin(F.broadcast(n1)).select(
        "node",
        "__n",
        (F.lit(1.0) / F.col("__n").cast("double")).alias("pr"),
    )

    outw = edges.groupBy(src).agg(F.sum(weight).alias("__outw"))
    e = edges.join(outw, src).select(
        F.col(src).alias("__src"),
        F.col(dst).alias("__dst"),
        # exact ints → one correctly-rounded double division
        (F.col(weight).cast("double") / F.col("__outw").cast("double")).alias("__p"),
    )

    teleport = F.lit(1.0 - damping) / F.col("__n").cast("double")
    for _ in range(rounds):
        contrib = (
            ranks.join(e, ranks.node == e.__src)
            .select(
                F.col("__dst").alias("node"),
                F.col("__src").alias("__from"),
                (F.col("pr") * F.col("__p")).alias("__c"),
            )
            .groupBy("node")
            .agg(
                F.aggregate(
                    F.array_sort(F.collect_list(F.struct("__from", "__c"))),
                    F.lit(0.0),
                    lambda acc, x: acc + x["__c"],
                ).alias("__s")
            )
        )
        ranks = (
            ranks.join(contrib, "node", "left")
            .select(
                "node",
                "__n",
                (teleport + F.lit(damping) * F.coalesce("__s", F.lit(0.0))).alias("pr"),
            )
        )
    return ranks.select("node", "pr")
