"""Bounded-memory frequency sketches.

Exact term counting needs vocabulary-sized aggregation state — at a
10^12-turn corpus the (term, count) table is itself huge and hot terms
skew its shuffle. A count-min sketch caps the state at depth x width
counters REGARDLESS of vocabulary size: every occurrence increments one
counter per row (hash-bucketed), point estimates take the min over the
rows, and the classic guarantee holds (estimate >= true count;
overestimate <= N/width with probability 1 - (1/2)^depth ish).

The bucket hash is the repo's portable md5-prefix idiom
(`ops/sampling.py::hash_fraction`), so any engine — including the
DuckDB oracle — reproduces the sketch bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(term: Column, row: int, width: int) -> Column:
    hx = F.md5(F.concat(F.lit(f"{row}:"), term))
    return F.conv(F.substring(hx, 1, 8), 16, 10).cast("long") % width


def cms_build(
    tokens: DataFrame, term_col: str = "term", depth: int = 4, width: int = 512
) -> DataFrame:
    """Build the sketch from one-row-per-occurrence tokens: returns the
    ``(r, b, cnt)`` counter table, exactly depth x width rows at most.

    Plan: each occurrence projects its depth (row, bucket) pairs (a
    literal-sized array, exploded in the same codegen stage), then ONE
    groupBy — partial aggregation map-side combines into <= depth*width
    states per task, so the shuffle carries counters, not occurrences.
    No vocabulary-sized state anywhere."""
    t = F.col(term_col)
    pairs = F.array(
        *[
            F.struct(
                F.lit(r).cast("int").alias("r"),
                _bucket(t, r, width).alias("b"),
            )
            for r in range(depth)
        ]
    )
    return (
        tokens.select(F.explode(pairs).alias("rb"))
        .groupBy(F.col("rb.r").alias("r"), F.col("rb.b").alias("b"))
        .agg(F.count("*").alias("cnt"))
    )


def cms_estimate(
    terms: DataFrame,
    sketch: DataFrame,
    term_col: str = "term",
    depth: int = 4,
    width: int = 512,
) -> DataFrame:
    """Point estimates for a candidate term set: min over the sketch
    rows of each term's bucket counter. The sketch is depth x width —
    always broadcastable — so estimation is a map-side join however
    large the candidate set is. Terms whose buckets were never
    incremented estimate 0."""
    t = F.col(term_col)
    probes = F.array(
        *[
            F.struct(
                F.lit(r).cast("int").alias("r"),
                _bucket(t, r, width).alias("b"),
            )
            for r in range(depth)
        ]
    )
    p = terms.select(t, F.explode(probes).alias("rb")).select(
        term_col, F.col("rb.r").alias("r"), F.col("rb.b").alias("b")
    )
    joined = p.join(F.broadcast(sketch), ["r", "b"], "left")
    return joined.groupBy(term_col).agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est_count")
    )
