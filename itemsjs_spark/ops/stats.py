"""Per-bucket quantiles: the percentile extension of facet_stats.

itemsjs's `facet_stats` (min/max/avg/sum — reference
`/root/reference/src/helpers.ts` facet stats fields) covers first-moment
stats; real OLAP dashboards also want p50/p90/p99 per bucket. Two
physical paths, same API:

* ``exact=True`` — Catalyst's ``percentile`` aggregate (exact, linear
  interpolation at rank ``(n-1)*p`` — the same definition DuckDB's
  ``quantile_cont`` uses, so the oracle can match to 6 decimals).
  Exact percentile buffers each group's values inside the aggregate, so
  its memory is bounded by the largest bucket — fine for facet buckets
  (bounded by corpus/|values|), wrong for million-row groups.
* ``exact=False`` — ``approx_percentile`` (Greenwald-Khanna sketch,
  bounded memory ``O(accuracy)`` per group regardless of group size):
  the 100 TB path. Error is rank-bounded by ``1/accuracy``; the test
  pins approx-vs-exact agreement on real data.
"""

from __future__ import annotations

from typing import Dict, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _pname(p: float) -> str:
    # p25 / p50 / p99 / p99_9-style column names
    pct = p * 100
    if float(pct).is_integer():
        return f"p{int(pct)}"
    return "p" + f"{pct:g}".replace(".", "_")


def bucket_percentiles(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    ps: Sequence[float] = (0.5, 0.9, 0.99),
    exact: bool = True,
    accuracy: int = 10_000,
) -> DataFrame:
    """(group cols, n, p<pp>...) — one shuffle, map-side partial
    aggregation; percentile columns rounded to 6 decimals (the oracle
    contract used across the repo)."""
    aggs = [F.count("*").alias("n")]
    for p in ps:
        if exact:
            expr = f"percentile(CAST({value_col} AS DOUBLE), {p!r})"
        else:
            expr = (
                f"approx_percentile(CAST({value_col} AS DOUBLE), {p!r}, "
                f"{accuracy})"
            )
        aggs.append(F.round(F.expr(expr), 6).alias(_pname(p)))
    return df.groupBy(*group_cols).agg(*aggs)


def equi_depth_histogram(
    df: DataFrame,
    value_col: str,
    n_buckets: int = 8,
    exact: bool = True,
    accuracy: int = 10_000,
) -> DataFrame:
    """Equi-depth (quantile) histogram: buckets hold ~equal row counts,
    the complement of the engine's equi-width ``facet_histogram``.

    Shape matters at scale: the naive formulation —
    ``ntile(n) OVER (ORDER BY v)`` — is a GLOBAL single-partition
    window, a scale-killer. Instead: one boundary job (exact
    ``percentile`` for bounded inputs, ``approx_percentile``'s
    Greenwald-Khanna sketch as the 100 TB path) collects ``n-1``
    doubles to the driver, then ONE map-only pass assigns
    ``bucket = Σ (v > boundary)`` against the broadcast-literal
    boundaries and aggregates (map-side combine, ``n_buckets`` groups).
    Ties sit in the lower bucket; every decision input rounds to 6
    decimals, so an oracle computing the same boundaries reproduces
    the assignment exactly."""
    ps = [i / n_buckets for i in range(1, n_buckets)]
    arr = ", ".join(repr(p) for p in ps)
    fn = "percentile" if exact else "approx_percentile"
    acc = "" if exact else f", {accuracy}"
    src = df.filter(F.col(value_col).isNotNull())
    row = src.select(
        F.expr(f"{fn}(CAST({value_col} AS DOUBLE), array({arr}){acc})").alias("b")
    ).first()
    bounds = [round(float(x), 6) for x in row["b"]] if row and row["b"] else []
    v = F.round(F.col(value_col).cast("double"), 6)
    bucket = F.lit(0)
    for b in bounds:
        bucket = bucket + F.when(v > F.lit(b), 1).otherwise(0)
    return (
        src.select(v.alias("v"), bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n"),
            F.round(F.min("v"), 6).alias("lo"),
            F.round(F.max("v"), 6).alias("hi"),
        )
    )


def facet_cardinality(
    df: DataFrame,
    fields: Sequence[str],
    exact: bool = True,
    rsd: float = 0.05,
) -> DataFrame:
    """Distinct-value cardinality per facet field — the Elasticsearch
    ``cardinality`` aggregation itemsjs lacks (its buckets imply it only
    by materializing every bucket). One stacked result
    ``(field, n_values, n_docs)`` so a dashboard sizes every facet
    widget from a single pass.

    * ``exact=True`` — ``count(DISTINCT col)``: Catalyst expands the
      distinct into a two-level aggregate (partial per partition, merge
      on the field's values), memory bounded by the true cardinality —
      right whenever cardinality ≪ corpus (facet fields by definition).
    * ``exact=False`` — ``approx_count_distinct`` (HyperLogLog++,
      fixed ``O(1/rsd²)`` registers per field regardless of
      cardinality): the 100 TB path for unbounded-cardinality columns
      (user ids, conv ids). The test pins approx-vs-exact relative
      error on real data.

    The per-field frames union before the aggregate, so Spark runs ONE
    job; each branch scans only its own column (columnar parquet reads
    one stripe per field, not the whole row)."""
    parts = []
    for f in fields:
        agg = (
            F.countDistinct(F.col("v"))
            if exact
            else F.approx_count_distinct(F.col("v"), rsd)
        )
        parts.append(
            df.select(F.col(f).cast("string").alias("v"))
            .withColumn("field", F.lit(f))
            .groupBy("field")
            .agg(
                agg.alias("n_values"),
                F.count(F.col("v")).alias("n_docs"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def bucket_anomalies(
    df: DataFrame,
    ts_col: str = "ts",
    interval: int = 3600,
    z: float = 2.0,
) -> DataFrame:
    """Anomalous time buckets: bin events into ``interval``-second
    buckets, then flag buckets whose count deviates from the mean by at
    least ``z`` population standard deviations — the monitoring
    companion to the engine's ``facet_histogram`` (traffic spikes,
    outage troughs). Returns ``(bucket, n, zscore)`` for flagged
    buckets; ``zscore`` rounds to 6 decimals.

    The moments are computed EXPLICITLY from exact integer sums
    (``mean = Σn/B``, ``var = Σn²/B − mean²``) rather than a streaming
    stddev aggregate, so any engine computing the same two sums
    reproduces the z-scores bit-for-bit. Plan shape: one
    map-side-combined groupBy(bucket), one single-row moment aggregate
    broadcast back over the bucket table (dimension-sized, never the
    corpus), one filter."""
    epoch = F.expr(
        f"timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', "
        f"CAST({ts_col} AS TIMESTAMP_NTZ))"
    )
    step = int(interval)
    bucket = (F.floor(epoch / F.lit(step)) * F.lit(step)).cast("long")
    counts = (
        df.filter(F.col(ts_col).isNotNull())
        .groupBy(bucket.alias("bucket"))
        .agg(F.count("*").cast("long").alias("n"))
    )
    moments = counts.agg(
        F.count("*").cast("long").alias("__b"),
        F.sum("n").cast("long").alias("__s"),
        F.sum(F.col("n") * F.col("n")).cast("long").alias("__ss"),
    )
    withm = counts.crossJoin(F.broadcast(moments))
    mean = F.col("__s").cast("double") / F.col("__b").cast("double")
    var = (
        F.col("__ss").cast("double") / F.col("__b").cast("double")
        - mean * mean
    )
    std = F.sqrt(F.greatest(var, F.lit(0.0)))
    zscore = F.round((F.col("n").cast("double") - mean) / std, 6)
    return (
        withm.filter(std > 0)
        .select("bucket", "n", zscore.alias("zscore"))
        .filter(F.abs(F.col("zscore")) >= float(z))
    )


def percentile_ranks(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    values: Sequence[float],
) -> DataFrame:
    """ES ``percentile_ranks`` aggregation, exact: for each probe value
    ``v`` the percentage of the group's docs with ``value <= v``
    (inverse of ``bucket_percentiles``). ES approximates with a
    TDigest; the exact definition here is ``100 * count(<=v) / n`` —
    an integer-count ratio, ONE IEEE division per (group, probe),
    rounded to the repo's 6-decimal grid, so the oracle is bit-exact.

    One map-side-combined groupBy regardless of probe count: every
    probe is a conditional sum inside the same aggregate — the
    100 TB shape (no per-probe pass, no sort, no buffering)."""
    v = F.col(value_col).cast("double")
    aggs = [F.count("*").cast("long").alias("n")]
    for i, x in enumerate(values):
        aggs.append(
            F.sum(F.when(v <= float(x), 1).otherwise(0))
            .cast("long")
            .alias(f"__le{i}")
        )
    out = df.groupBy(*group_cols).agg(*aggs)
    proj = [F.col(c) for c in group_cols] + [F.col("n")]
    for i, x in enumerate(values):
        name = "rank_" + f"{x:g}".replace(".", "_").replace("-", "m")
        proj.append(
            F.round(
                F.col(f"__le{i}").cast("double") * 100.0
                / F.col("n").cast("double"),
                6,
            ).alias(name)
        )
    return out.select(*proj)


def adjacency_matrix(
    df: DataFrame, filters: Dict[str, Column]
) -> DataFrame:
    """ES ``adjacency_matrix`` aggregation: named filter predicates →
    doc counts of every filter AND every pairwise intersection, keys
    ``a`` / ``a&b`` (names sorted, ES's key convention), zero-count
    intersections omitted like ES.

    ONE whole-input aggregate: with k filters the plan is k(k+1)/2
    conditional sums inside a single map-side-combined agg — no joins,
    no explode, no per-pair pass. k is config-sized (ES caps it at
    100), so the row count is bounded regardless of corpus size."""
    names = sorted(filters)
    aggs = []
    keys = []
    for i, a in enumerate(names):
        for b in names[i:]:
            key = a if a == b else f"{a}&{b}"
            keys.append(key)
            cond = filters[a] & filters[b] if a != b else filters[a]
            aggs.append(
                F.sum(F.when(cond, 1).otherwise(0))
                .cast("long")
                .alias(f"__c{len(keys) - 1}")
            )
    row = df.agg(*aggs)
    pairs = F.array(
        *[
            F.struct(
                F.lit(k).alias("key"), F.col(f"__c{i}").alias("doc_count")
            )
            for i, k in enumerate(keys)
        ]
    )
    out = row.select(F.explode(pairs).alias("kv")).select(
        F.col("kv.key").alias("key"), F.col("kv.doc_count").alias("doc_count")
    )
    return out.filter(F.col("doc_count") > 0)


def sharded_terms(
    df: DataFrame,
    term_col: str = "term",
    shard_col: str = "shard",
    shard_size: int = 10,
    k: int = 10,
) -> DataFrame:
    """Elasticsearch-style sharded terms aggregation with
    ``doc_count_error_upper_bound``: each shard reports only its top
    ``shard_size`` terms (count DESC, term ASC), the coordinator sums
    the reported counts, and every merged term carries the worst-case
    undercount — the sum, over shards that did NOT report it, of that
    shard's last-reported count (a term the shard omitted can hide at
    most just below its reporting floor). A shard with fewer than
    ``shard_size`` distinct terms reported everything, so it
    contributes 0 to any bound.

    This is the honest distributed-top-k contract: at corpus scale the
    coordinator never sees full per-shard term tables, and the bound is
    what makes the truncated merge trustworthy. Exact integers end to
    end — the oracle restates the same windows.

    Plan shape: ONE corpus-sized groupBy((shard, term)); everything
    after operates on per-shard count tables (vocabulary x shards at
    most): two windows partitioned by shard, dimension-sized joins, a
    1-row total broadcast. Returns the final top-``k`` (term,
    doc_count, doc_count_error_upper_bound).
    """
    counts = df.groupBy(shard_col, term_col).agg(F.count("*").alias("__c"))
    w = Window.partitionBy(shard_col).orderBy(
        F.col("__c").desc(), F.col(term_col).asc()
    )
    ranked = counts.withColumn("__rn", F.row_number().over(w))
    reported = ranked.filter(F.col("__rn") <= int(shard_size))
    contrib = reported.groupBy(shard_col).agg(
        F.when(F.max("__rn") >= int(shard_size), F.min("__c"))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("__contrib")
    )
    total = contrib.agg(F.sum("__contrib").alias("__tot"))
    merged = (
        reported.join(contrib, shard_col)
        .groupBy(term_col)
        .agg(
            F.sum("__c").cast("long").alias("doc_count"),
            F.sum("__contrib").cast("long").alias("__covered"),
        )
        .crossJoin(F.broadcast(total))
        .select(
            term_col,
            "doc_count",
            (F.col("__tot") - F.col("__covered"))
            .cast("long")
            .alias("doc_count_error_upper_bound"),
        )
    )
    return merged.orderBy(
        F.col("doc_count").desc(), F.col(term_col).asc()
    ).limit(int(k))


def extended_stats(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """ES ``extended_stats`` aggregation: count/min/max/sum/avg plus
    population variance and standard deviation per group. All
    accumulation is EXACT (decimal/integer sums and sums of squares —
    no float partial sums, so no aggregation-order drift); variance is
    one final double expression ``(n·Σx² - (Σx)²) / n²`` and std_dev
    one correctly-rounded IEEE sqrt on top, both restatable verbatim
    in any engine. One map-side-combined groupBy."""
    g = list(group_cols)
    v = F.col(value_col)
    agg = df.groupBy(*g).agg(
        F.count("*").cast("long").alias("n"),
        F.min(v).alias("__min"),
        F.max(v).alias("__max"),
        F.sum(v).alias("__sum"),
        F.sum(v * v).alias("__sumsq"),
    )
    nn = F.col("n").cast("double")
    s = F.col("__sum").cast("double")
    sq = F.col("__sumsq").cast("double")
    var = (nn * sq - s * s) / (nn * nn)
    return agg.select(
        *g,
        "n",
        F.col("__min").cast("double").alias("vmin"),
        F.col("__max").cast("double").alias("vmax"),
        F.round(s, 6).alias("vsum"),
        F.round(s / nn, 6).alias("vavg"),
        F.round(var, 6).alias("variance"),
        F.round(F.sqrt(var), 6).alias("std_dev"),
    )


def weighted_avg(
    df: DataFrame,
    value_col: str,
    weight_col: str,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """ES ``weighted_avg`` aggregation: Σ(value·weight) / Σ(weight) per
    group — exact decimal/integer product sums, ONE final IEEE
    division on the 6-decimal grid. One map-side-combined groupBy."""
    g = list(group_cols)
    agg = df.groupBy(*g).agg(
        F.sum(F.col(value_col) * F.col(weight_col)).alias("__vw"),
        F.sum(F.col(weight_col)).alias("__w"),
        F.count("*").cast("long").alias("n"),
    )
    return agg.select(
        *g,
        "n",
        F.round(
            F.col("__vw").cast("double") / F.col("__w").cast("double"), 6
        ).alias("wavg"),
    )


def top_metrics(
    df: DataFrame,
    sort_col: str,
    metric_cols: Sequence[str],
    group_cols: Sequence[str] = (),
    tie_cols: Sequence[str] = (),
) -> DataFrame:
    """ES ``top_metrics`` aggregation: per group, the metric values on
    the row with the LARGEST ``sort_col`` (``tie_cols`` break exact
    sort-value ties deterministically). One algebraic ``max(struct)``
    aggregate — map-side partials, no window over the corpus, the same
    skew-safe shape as grouped_topk."""
    g = list(group_cols)
    parts = [F.col(sort_col)] + [F.col(t) for t in tie_cols] + [
        F.col(m) for m in metric_cols
    ]
    agg = df.groupBy(*g).agg(F.max(F.struct(*parts)).alias("__top"))
    return agg.select(
        *g,
        F.col(f"__top.{sort_col}").alias(f"top_{sort_col}"),
        *[F.col(f"__top.{m}").alias(f"top_{m}") for m in metric_cols],
    )


def string_stats(
    df: DataFrame,
    text_col: str = "text",
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """ES ``string_stats`` aggregation: count, min/max/avg length and
    Shannon CHARACTER entropy per group. Length stats are exact integer
    aggregation + one division; the entropy sum runs over the per-group
    character histogram folded IN CHARACTER ORDER (sort_array + one JVM
    higher-order aggregate), so float addition order is fixed and any
    engine reproduces the value — a plain SUM over the histogram would
    be aggregation-order-dependent. The histogram is alphabet-bounded
    (≤ distinct characters), never corpus-sized.

    Plan shape: one char explode + (group, char) groupBy, one
    dimension-sized collect_list fold, one length aggregate joined
    back. Returns (*group_cols, n_docs, min_len, max_len, avg_len,
    entropy) on the 6-decimal grid."""
    g = list(group_cols)
    lens = df.groupBy(*g).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.min(F.length(text_col)).cast("long").alias("min_len"),
        F.max(F.length(text_col)).cast("long").alias("max_len"),
        F.sum(F.length(text_col)).alias("__tot"),
    )
    chars = df.select(
        *g, F.explode(F.split(F.col(text_col), "")).alias("__ch")
    ).filter(F.col("__ch") != "")
    hist = chars.groupBy(*g, "__ch").agg(F.count("*").alias("__c"))
    folded = hist.groupBy(*g).agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("__ch"), F.col("__c")))
        ).alias("__h"),
        F.sum("__c").alias("__nch"),
    )
    ent = folded.select(
        *g,
        F.expr(
            "aggregate(__h, CAST(0.0 AS DOUBLE), (acc, x) -> "
            "acc - (CAST(x.__c AS DOUBLE) / CAST(__nch AS DOUBLE)) "
            "* log2(CAST(x.__c AS DOUBLE) / CAST(__nch AS DOUBLE)))"
        ).alias("__ent"),
    )
    # LEFT join: a group whose every text is '' has no character rows,
    # so the entropy side is empty — ES still reports the bucket, so
    # keep the length stats and coalesce entropy to 0.0
    out = lens.join(ent, g, "left") if g else lens.crossJoin(ent)
    return out.select(
        *g,
        "n_docs",
        "min_len",
        "max_len",
        F.round(
            F.col("__tot").cast("double") / F.col("n_docs").cast("double"), 6
        ).alias("avg_len"),
        F.round(F.coalesce(F.col("__ent"), F.lit(0.0)), 6).alias("entropy"),
    )


def named_filter_counts(
    df: DataFrame,
    filters: Dict[str, Column],
) -> DataFrame:
    """ES ``filters`` aggregation: arbitrary named predicates become
    buckets, counted in ONE corpus pass of conditional sums (no
    per-filter scan, no union). Returns (key, doc_count) with one row
    per named filter, zero-kept."""
    aggs = [
        F.sum(F.when(pred, 1).otherwise(0)).cast("long").alias(name)
        for name, pred in filters.items()
    ]
    wide = df.agg(*aggs)
    stack = ", ".join(f"'{n}', {n}" for n in filters)
    return wide.select(
        F.expr(
            f"stack({len(filters)}, {stack}) AS (key, doc_count)"
        )
    )


def median_absolute_deviation(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """ES ``median_absolute_deviation`` aggregation, EXACT where ES
    ships a TDigest approximation: median of |x - median(x)| per
    group. Two exact Catalyst percentile aggregates (the repo's
    bucket_percentiles precedent: exact `percentile` == DuckDB
    `quantile_cont` on the 6-decimal grid) with the per-group median
    broadcast back between them. Group-dimension state only; two
    corpus passes.

    Returns (*group_cols, n, median, mad) on the 6-decimal grid."""
    g = list(group_cols)
    v = F.col(value_col).cast("double")
    med = df.groupBy(*g).agg(
        F.count("*").cast("long").alias("n"),
        F.expr(f"percentile({value_col}, 0.5)").alias("__med"),
    )
    joined = (
        df.join(F.broadcast(med), g)
        if g
        else df.crossJoin(F.broadcast(med))
    )
    dev = joined.select(
        *g, "n", "__med", F.abs(v - F.col("__med")).alias("__dev")
    )
    out = dev.groupBy(*g).agg(
        F.first("n").alias("n"),
        F.first("__med").alias("__med"),
        F.expr("percentile(__dev, 0.5)").alias("__mad"),
    )
    return out.select(
        *g,
        "n",
        F.round(F.col("__med"), 6).alias("median"),
        F.round(F.col("__mad"), 6).alias("mad"),
    )


def welch_t_test(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group_a: str,
    group_b: str,
) -> DataFrame:
    """ES ``t_test`` aggregation (heteroscedastic / Welch): t statistic
    and Welch-Satterthwaite degrees of freedom between two named
    groups. Values quantize ONCE to integer micro-units via floor
    (floor has no rounding ties — the repo's JL lesson is that
    round-half ties are never engine-safe; floor(v·1e6) is identical
    IEEE arithmetic in any engine), all accumulation is exact BIGINT,
    and t/df are single final double expressions over six integers.

    One map-side-combined conditional-sum aggregate; one output row:
    (n_a, n_b, mean_a, mean_b, t_stat, welch_df) on the 6-decimal
    grid (NULL t when either group has < 2 rows or zero variance
    denominators)."""
    q = F.floor(F.col(value_col).cast("double") * F.lit(1e6)).cast("long")
    # squares of micro-units overflow BIGINT (1e6-unit values square to
    # ~1e18 per row) — accumulate them in exact DECIMAL (HUGEINT on the
    # DuckDB side); the plain sums stay BIGINT
    qd = q.cast("decimal(19,0)")
    zero = F.lit(0).cast("decimal(19,0)")
    is_a = F.col(group_col) == group_a
    is_b = F.col(group_col) == group_b
    agg = df.filter(is_a | is_b).agg(
        F.sum(F.when(is_a, 1).otherwise(0)).cast("long").alias("n_a"),
        F.sum(F.when(is_b, 1).otherwise(0)).cast("long").alias("n_b"),
        F.sum(F.when(is_a, q).otherwise(F.lit(0))).alias("sa"),
        F.sum(F.when(is_b, q).otherwise(F.lit(0))).alias("sb"),
        F.sum(F.when(is_a, qd * qd).otherwise(zero)).alias("ssa"),
        F.sum(F.when(is_b, qd * qd).otherwise(zero)).alias("ssb"),
    )
    na, nb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    sa, sb = F.col("sa").cast("double"), F.col("sb").cast("double")
    ssa, ssb = F.col("ssa").cast("double"), F.col("ssb").cast("double")
    # sample variance over micro-units: (n·Σx² - (Σx)²) / (n·(n-1))
    va = (na * ssa - sa * sa) / (na * (na - 1.0))
    vb = (nb * ssb - sb * sb) / (nb * (nb - 1.0))
    se2 = va / na + vb / nb
    t = ((sa / na) - (sb / nb)) / F.sqrt(se2)
    wdf = (se2 * se2) / (
        (va / na) * (va / na) / (na - 1.0)
        + (vb / nb) * (vb / nb) / (nb - 1.0)
    )
    ok = (F.col("n_a") >= 2) & (F.col("n_b") >= 2)
    # means share the NULL discipline of t/df: an empty group must not
    # leak 0/0 (NaN) or x/0 (Inf) doubles, whose rendering is
    # engine-specific
    return agg.select(
        "n_a",
        "n_b",
        F.when(
            F.col("n_a") > 0, F.round(sa / na / F.lit(1e6), 6)
        ).alias("mean_a"),
        F.when(
            F.col("n_b") > 0, F.round(sb / nb / F.lit(1e6), 6)
        ).alias("mean_b"),
        F.when(ok & (se2 > 0), F.round(t, 6)).alias("t_stat"),
        F.when(ok & (se2 > 0), F.round(wdf, 6)).alias("welch_df"),
    )


def boxplot(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """ES ``boxplot`` aggregation, exact quartiles (ES ships TDigest):
    min/q1/q2/q3/max plus the 1.5-IQR Tukey fences per group. One
    exact multi-percentile aggregate (Catalyst `percentile` with a
    probability array == DuckDB `quantile_cont` list) — group-sized
    state only."""
    g = list(group_cols)
    agg = df.groupBy(*g).agg(
        F.count("*").cast("long").alias("n"),
        F.min(F.col(value_col).cast("double")).alias("__min"),
        F.max(F.col(value_col).cast("double")).alias("__max"),
        F.expr(
            f"percentile({value_col}, array(0.25, 0.5, 0.75))"
        ).alias("__q"),
    )
    q1, q2, q3 = (F.col("__q")[i] for i in range(3))
    iqr = q3 - q1
    return agg.select(
        *g,
        "n",
        F.round(F.col("__min"), 6).alias("vmin"),
        F.round(q1, 6).alias("q1"),
        F.round(q2, 6).alias("q2"),
        F.round(q3, 6).alias("q3"),
        F.round(F.col("__max"), 6).alias("vmax"),
        F.round(q1 - F.lit(1.5) * iqr, 6).alias("lower_fence"),
        F.round(q3 + F.lit(1.5) * iqr, 6).alias("upper_fence"),
    )
