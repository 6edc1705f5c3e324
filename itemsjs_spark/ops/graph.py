"""Graph centrality over transition graphs.

PageRank (Page et al. 1999) over a weighted edge list — e.g. the
tool-transition or event-type-transition graph mined from agent
transcripts: which states dominate the long-run behavior of the fleet.

Determinism contract: the power iteration runs in EXACT INTEGER
micro-units (ranks are bigints at a 1e-9 grid; every per-edge
contribution is one integer floor division; sums are integer and thus
order-independent), so any engine — including a SQL oracle unrolling
the same iterations as CTEs — reproduces every iterate bit-for-bit.
The repo's PCA power method learned this the hard way: float grids
land matvec sums on decimal rounding ties and a normalize amplifies
each cross-engine tie-flip (see `ops/embeddings.py::pca_power_fit`).

Scale: the iteration is pure DataFrame algebra (edge join + one
groupBy per step, map-side combinable); only the node COUNT reaches
the driver. Dangling nodes (no out-edges) leak their mass — the
standard simplification; redistribute driver-side if needed.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000_000  # 1e-9 rank grid


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: Optional[str] = None,
    iters: int = 3,
    damping_pct: int = 85,
) -> DataFrame:
    """(node, pr_micro, pagerank) after ``iters`` damped power steps.

    pr0(v) = SCALE DIV N; each step:
      contrib(u->v) = (pr(u) * w(u,v)) DIV out(u)
      pr'(v) = ((100-damping_pct)*SCALE DIV 100) DIV N
               + (damping_pct * sum_in contrib) DIV 100
    All integer; ``pagerank`` is pr_micro / SCALE rounded to 6 decimals
    (one IEEE division of exact integers — engine-portable)."""
    w = F.col("__w")
    if weight_col is None:
        wedges = edges.groupBy(src_col, dst_col).agg(
            F.count("*").alias("__w")
        )
    else:
        wedges = edges.groupBy(src_col, dst_col).agg(
            F.sum(weight_col).cast("long").alias("__w")
        )
    out = wedges.groupBy(src_col).agg(F.sum("__w").alias("__out"))
    # persisted loop invariants: every power step joins the SAME
    # weighted-edge and node tables — without the caches each iteration
    # re-ran the edge aggregation and the node-distinct over the raw
    # edges (measured: 14 FileScan, zero cache, at 3 iterations).
    # Standard iterative-job hygiene at any scale; both tables are
    # graph-dimension-sized (distinct edges / nodes), never row-count
    # sized. Iterates are NOT persisted — each is consumed exactly once
    # by the next step, and LRU storage should hold the two invariants,
    # not a dead iterate per step. (Op-internal caches here and in
    # dedup/sampling/text are dimension-sized, MEMORY_AND_DISK, and
    # LRU-evictable — the deliberate trade for lazy return values that
    # cannot unpersist before the caller's action.)
    ew = wedges.join(out, src_col).persist()
    nodes = (
        edges.select(F.col(src_col).alias("node"))
        .union(edges.select(F.col(dst_col).alias("node")))
        .distinct()
        .persist()
    )
    n = nodes.count()  # dimension-sized (distinct states), driver-safe
    teleport = ((100 - damping_pct) * SCALE // 100) // n
    pr = nodes.withColumn("pr", F.lit(SCALE // n).cast("long"))
    for _ in range(iters):
        contrib = (
            ew.join(pr, ew[src_col] == pr["node"])
            .select(
                F.col(dst_col).alias("node"),
                F.expr("pr * __w DIV __out").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("s"))
        )
        pr = nodes.join(contrib, "node", "left").select(
            "node",
            (
                F.lit(teleport)
                + F.expr(
                    f"{damping_pct} * coalesce(s, CAST(0 AS BIGINT)) DIV 100"
                )
            ).cast("long").alias("pr"),
        )
    return pr.select(
        "node",
        F.col("pr").alias("pr_micro"),
        F.round(F.col("pr") / F.lit(float(SCALE)), 6).alias("pagerank"),
    )
