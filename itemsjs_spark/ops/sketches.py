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


# ---------------------------------------------------------------------------
# HyperLogLog distinct counting (Flajolet et al. 2007)
# ---------------------------------------------------------------------------
#
# Exact COUNT(DISTINCT) over 10^12 turns needs a value-sized shuffle; a
# HyperLogLog register file is 2^b max-rank counters regardless of
# cardinality. This implementation is DETERMINISTIC AND ENGINE-PORTABLE:
# the bucket is an md5 hex prefix, the rank (rho) is an integer CASE
# ladder over a 32-bit md5 slice, and the estimate is one IEEE division
# of exact integers — so an independent engine (the DuckDB oracle)
# reproduces the ESTIMATE bit-for-bit, which `approx_count_distinct`
# (Spark's native HLL++) can never offer a hash-equal check for.
#
# The reported value is the RAW HLL estimator alpha*m^2/sum(2^-M_j).
# The small-range (linear-counting) bias correction is deliberately
# omitted: it needs ln(), whose last-ulp behavior is libm-dependent, so
# it cannot be cross-engine exact. Callers wanting the corrected figure
# can apply m*ln(m/V) driver-side from the returned register stats.

HLL_B = 8  # bucket bits -> m = 256 registers, std error ~1.04/sqrt(m) = 6.5%
HLL_M = 1 << HLL_B


def hll_alpha_num(m: int = HLL_M) -> float:
    """alpha_m * m^2 * 2^33 — the whole numerator as ONE python float,
    inlined verbatim on both the Spark and the SQL side so the final
    division is the only floating-point operation."""
    alpha = 0.7213 / (1.0 + 1.079 / m)
    return alpha * m * m * float(1 << 33)


def hll_rho_case_sql(x_expr: str) -> str:
    """Leading-zero rank of a 32-bit integer SQL expression as an
    integer CASE ladder (1 + #leading zero bits; 33 when x == 0) —
    shared decision text for any SQL engine."""
    whens = " ".join(
        f"WHEN {x_expr} >= {1 << (32 - r)} THEN {r}" for r in range(1, 33)
    )
    return f"(CASE {whens} ELSE 33 END)"


def _hll_rho(x: Column) -> Column:
    col = F.when(x >= F.lit(1 << 31), 1)
    for r in range(2, 33):
        col = col.when(x >= F.lit(1 << (32 - r)), r)
    return col.otherwise(33)


def hll_cardinality(
    df: DataFrame,
    value_col: str = "value",
    group_cols: list | None = None,
    salt: str = "hll",
) -> DataFrame:
    """Per-group distinct-count estimate: (*group_cols, est_distinct).

    Plan: map-only (group, bucket, rho) projection, then TWO bounded
    aggregations — max(rho) per (group, bucket) (map-side combine caps
    every task's state at groups x 256 registers however many raw rows
    it scans) and the per-group register fold. The shuffle carries
    registers, not values: distinct counting at corpus scale costs one
    exchange of ~256 rows per group."""
    g = list(group_cols or [])
    hx = F.md5(
        F.concat(F.lit(salt + ":"), F.col(value_col).cast("string"))
    )
    bucket = F.conv(F.substring(hx, 1, 2), 16, 10).cast("int")
    x = F.conv(F.substring(hx, 3, 8), 16, 10).cast("long")
    regs = (
        df.select(*g, bucket.alias("b"), _hll_rho(x).alias("rho"))
        .groupBy(*g, "b")
        .agg(F.max("rho").alias("mj"))
    )
    # S = sum over ALL m registers of 2^(33 - M_j); absent buckets have
    # M_j = 0 and contribute 2^33 each. Exact BIGINT arithmetic
    # (S <= 256 * 2^33 = 2^41 << 2^63), order-independent.
    s_total = F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 33 - mj)")) + (
        F.lit(HLL_M) - F.count("*")
    ) * F.lit(1 << 33)
    return regs.groupBy(*g).agg(
        F.round(
            F.lit(hll_alpha_num()) / s_total.cast("double"), 6
        ).alias("est_distinct")
    )


# ---------------------------------------------------------------------------
# Bloom filter term membership (Bloom 1970)
# ---------------------------------------------------------------------------
#
# The pruning counterpart of the counting sketches above: a fixed
# n_bits-wide bit set answers "definitely absent / maybe present" for any
# term with ZERO false negatives — the structure a 1000-executor query
# router broadcasts to skip shards that cannot contain a term. Words are
# 32-bit (stored in BIGINT) so every shift/OR stays far from the sign
# bit and any SQL engine reproduces the words exactly; the position hash
# is the repo's portable md5-prefix idiom.

BLOOM_BITS = 1024
BLOOM_HASHES = 3


def _bloom_pos(term: Column, j: int, n_bits: int) -> Column:
    hx = F.md5(F.concat(F.lit(f"bloom{j}:"), term))
    return F.conv(F.substring(hx, 1, 8), 16, 10).cast("long") % n_bits


def bloom_build(
    terms: DataFrame,
    term_col: str = "term",
    n_bits: int = BLOOM_BITS,
    n_hashes: int = BLOOM_HASHES,
) -> DataFrame:
    """Build the filter from a term set: returns the (word_idx, word)
    table — at most ``n_bits / 32`` rows regardless of input size.

    Plan: each term projects its ``n_hashes`` bit positions (literal
    array exploded in the same codegen stage), one bit_or groupBy —
    map-side combine caps every task's state at the word count, so the
    shuffle carries words, not terms."""
    t = F.col(term_col)
    pos = F.array(*[_bloom_pos(t, j, n_bits) for j in range(n_hashes)])
    return (
        terms.select(F.explode(pos).alias("p"))
        .select(
            F.expr("p DIV 32").cast("int").alias("word_idx"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 32 AS INT))").alias(
                "__bit"
            ),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("__bit").alias("word"))
    )


def bloom_maybe_contains(
    probes: DataFrame,
    words: DataFrame,
    term_col: str = "term",
    n_bits: int = BLOOM_BITS,
    n_hashes: int = BLOOM_HASHES,
) -> DataFrame:
    """Membership check: (term, maybe_present) per probe term —
    ``maybe_present`` is true iff ALL ``n_hashes`` bits are set. The
    words table is word-count-sized, so the join broadcasts and the
    check is map-side however large the probe set is. False negatives
    are impossible by construction; false positives happen at the
    classic (1 - e^{-kn/m})^k rate."""
    t = F.col(term_col)
    pos = F.array(*[_bloom_pos(t, j, n_bits) for j in range(n_hashes)])
    p = probes.select(t, F.explode(pos).alias("p")).select(
        term_col,
        F.expr("p DIV 32").cast("int").alias("word_idx"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 32 AS INT))").alias(
            "__bit"
        ),
    )
    j = p.join(F.broadcast(words), "word_idx", "left")
    hit = (
        F.coalesce(F.col("word"), F.lit(0)).bitwiseAND(F.col("__bit")) != 0
    ).cast("int")
    return (
        j.groupBy(term_col)
        .agg(F.min(hit).alias("__all_set"))
        .select(term_col, (F.col("__all_set") == 1).alias("maybe_present"))
    )
