"""Iterative graph operators (PageRank) as DataFrame loops.

The reference has no graph processing (SURVEY.md §2.3); this implements the
engine-target "iterative algorithm" surface alongside k-means
(``operators/clustering.py``) and the connected-components near-dup
representative (``operators/dedup.py``). The design rule is the same one
k-means proved out: the DATA never leaves the cluster — per-iteration
driver state is nothing (ranks stay a DataFrame); only the node count (one
scalar) is collected up front.

Scale notes (100 TB posture):
- Each Lloyd-style iteration is ONE equi-join (ranks ⋈ edges on src — both
  sides hash-partitioned on the node id, so consecutive iterations reuse
  the same partitioning) and ONE groupBy(dst) with map-side partial sums.
  Shuffle volume per iteration is O(|E|) ids+doubles; edge payloads/attrs
  never ride.
- Ranks are a DataFrame of (node, rank) — for a billion-node graph that is
  the only iteration state, and it stays distributed.
- Determinism: floating summation order varies with partitioning, so each
  edge contribution is rounded and cast to an exact DECIMAL before the
  sum; the per-iteration rank is then re-rounded. Every engine that
  follows the same contract (DuckDB oracle does) produces bit-identical
  ranks, which is what makes an iterative algorithm oracle-checkable at
  all (same trick as the exact-decimal mean update in k-means,
  operators/clustering.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: decimal scale used for the deterministic per-edge contribution sum
_SCALE = 12


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    n_iter: int = 3,
    damping: float = 0.85,
) -> DataFrame:
    """Weighted PageRank with ``n_iter`` synchronous iterations.

    ``edges`` is a DataFrame of (src, dst[, weight]); duplicate edges are
    aggregated. Nodes are the union of endpoints. The simple variant:
    dangling nodes (no out-edges) keep the teleport term only and their
    rank mass is NOT redistributed — the oracle must follow the same
    convention. Returns (node, rank) with rank rounded to 12 decimals.
    """
    w = (
        F.col(weight).cast("double")
        if weight is not None
        else F.lit(1.0)
    )
    agg = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"), w.alias("w"))
        .groupBy("src", "dst")
        .agg(F.sum("w").alias("w"))
    )
    nodes = (
        agg.select(F.col("src").alias("node"))
        .union(agg.select(F.col("dst").alias("node")))
        .distinct()
    )
    # Bounded driver state: ONE scalar (the node count), needed as a
    # literal inside the teleport term.
    n = nodes.count()
    if n == 0:
        return nodes.select("node", F.lit(0.0).alias("rank"))
    out_w = agg.groupBy("src").agg(F.sum("w").alias("out_w"))
    edges_n = agg.join(out_w, "src")

    teleport = (1.0 - damping) / n
    ranks = nodes.select("node", F.round(F.lit(1.0 / n), _SCALE).alias("rank"))
    for _ in range(n_iter):
        contrib = (
            edges_n.join(ranks, edges_n["src"] == ranks["node"])
            .select(
                F.col("dst"),
                F.round(
                    F.col("rank") * F.col("w") / F.col("out_w"), _SCALE
                )
                .cast(f"decimal(26,{_SCALE})")
                .alias("c"),
            )
            .groupBy("dst")
            .agg(F.sum("c").cast("double").alias("in_mass"))
        )
        ranks = nodes.join(
            contrib, nodes["node"] == contrib["dst"], "left"
        ).select(
            "node",
            F.round(
                F.lit(teleport)
                + F.lit(damping) * F.coalesce(F.col("in_mass"), F.lit(0.0)),
                _SCALE,
            ).alias("rank"),
        )
    return ranks
