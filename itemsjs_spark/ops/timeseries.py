"""ES-style pipeline aggregations over histogram buckets.

Elasticsearch layers *pipeline* aggregations on top of a date-histogram:
``cumulative_sum``, ``derivative``, ``moving_fn`` (moving average),
``serial_diff`` and ``bucket_selector`` all post-process the bucket
series rather than the documents.  itemsjs has no analog (its buckets
are categorical — reference ``/root/reference/src/helpers.ts``), so this
is a §2.4 ES-surface extension like ``facet_ranges``/``facet_rollup``:
same engine result-set semantics underneath (the histogram is produced
by ``SearchEngine.facet_histogram``), new derived metrics on top.

Scale shape: every function here operates on the HISTOGRAM OUTPUT, whose
cardinality is ``time_range / interval`` — bounded by the calendar, not
the corpus (10 years of hourly buckets is 87 600 rows).  A single
ordered window over that series is therefore safe at 10^12 turns; the
corpus-proportional work already happened inside the one
map-side-combined groupBy that built the histogram.

Determinism contract (what makes these oracle-checkable):

* ``cumulative_sum`` / ``derivative`` / ``serial_diff`` stay in exact
  BIGINT arithmetic — no float accumulation at all.
* ``moving_avg`` divides an exact BIGINT window sum by an exact window
  count — ONE IEEE division per bucket, rounded to the repo's 6-decimal
  grid.  No engine-order-dependent float sums anywhere.
"""

from __future__ import annotations

import re
from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def densify_histogram(
    hist: DataFrame,
    interval: int,
    bucket_col: str = "bucket",
    count_cols: Sequence[str] = ("doc_count",),
) -> DataFrame:
    """Zero-fill the gaps of a sparse histogram.

    ``facet_histogram`` omits empty bins (materializing the time axis at
    build time would be wrong at scale), but pipeline aggregations are
    defined over the *dense* series — ES's ``min_doc_count: 0`` — or a
    derivative would silently span a gap.  The dense grid is generated
    from the series' own [min, max] extent with ``F.sequence`` (one
    1-row aggregate + one explode — grid-sized, never corpus-sized) and
    left-joined back; missing counts become 0.
    """
    ext = hist.agg(
        F.min(bucket_col).alias("__lo"), F.max(bucket_col).alias("__hi")
    )
    grid = ext.select(
        F.explode(
            F.sequence("__lo", "__hi", F.lit(interval).cast("long"))
        ).alias(bucket_col)
    )
    out = grid.join(F.broadcast(hist), bucket_col, "left")
    return out.select(
        bucket_col,
        *[
            F.coalesce(F.col(c), F.lit(0).cast("long")).alias(c)
            for c in count_cols
        ],
    )


def pipeline_aggs(
    hist: DataFrame,
    bucket_col: str = "bucket",
    value_col: str = "doc_count",
    window: int = 3,
    lag: int = 1,
    interval: Optional[int] = None,
    having: Optional[Column] = None,
) -> DataFrame:
    """The ES pipeline-aggregation bundle over one bucket series.

    Returns ``(bucket, <value>, cum_sum, derivative, serial_diff,
    moving_avg)`` ordered by bucket:

    * ``cum_sum`` — running BIGINT total (ES ``cumulative_sum``).
    * ``derivative`` — ``value - lag(value, 1)``; NULL on the first
      bucket, exactly like ES (no derivative without a predecessor).
    * ``serial_diff`` — ``value - lag(value, lag)`` (ES ``serial_diff``
      with period ``lag``); NULL for the first ``lag`` buckets.
    * ``moving_avg`` — mean of the trailing ``window`` buckets
      *including* the current one (rows between ``window-1`` preceding
      and current), rounded to 6 decimals.  Early buckets average over
      the shorter available prefix, matching ES's default
      ``MovingFunctions.unweightedAvg`` over a partial window.

    ``interval`` (when given) densifies first via
    :func:`densify_histogram`, so gaps contribute zeros rather than
    being skipped — required for derivative semantics on sparse series.
    ``having`` (a Column over the output columns) applies ES's
    ``bucket_selector`` as a final filter — buckets are dropped AFTER
    the window math, so selection never changes the metrics.

    One ordered window over a calendar-bounded series (see module
    docstring); everything inside is exact integer arithmetic except the
    single division in ``moving_avg``.
    """
    if interval is not None:
        hist = densify_histogram(hist, interval, bucket_col, (value_col,))
    w = Window.orderBy(F.col(bucket_col).asc())
    v = F.col(value_col).cast("long")
    mov = Window.orderBy(F.col(bucket_col).asc()).rowsBetween(
        -(window - 1), 0
    )
    out = hist.select(
        F.col(bucket_col),
        v.alias(value_col),
        F.sum(v).over(w).alias("cum_sum"),
        (v - F.lag(v, 1).over(w)).alias("derivative"),
        (v - F.lag(v, lag).over(w)).alias("serial_diff"),
        F.round(
            F.sum(v).over(mov)
            / F.count(F.lit(1)).over(mov).cast("double"),
            6,
        ).alias("moving_avg"),
    )
    if having is not None:
        out = out.filter(having)
    return out


def auto_histogram(
    df: DataFrame,
    ts_col: str = "ts",
    target_buckets: int = 40,
    ladder: Sequence[int] = (60, 3600, 86400, 604800),
) -> DataFrame:
    """ES ``auto_date_histogram`` analog: pick the FINEST fixed-width
    interval from ``ladder`` (seconds, ascending) whose bucket span for
    the observed [min, max] time range stays within ``target_buckets``
    — the coarsest rung wins if none fits. Bucket span counts
    calendar-aligned slots ``floor(max/i) - floor(min/i) + 1``; the
    ladder is fixed-width only (no months), keeping the whole selection
    exact integer arithmetic that any engine reproduces.

    The interval choice stays IN-PLAN: a 1-row min/max aggregate is
    broadcast under every row and a CASE ladder picks the rung — no
    driver decision, so the operator composes inside larger plans and
    re-resolves per micro-batch under streaming. Two corpus passes
    (bounds + the histogram groupBy), both map-side combined.

    Returns non-empty buckets only (documented deviation from ES's
    zero-filled response; `densify_histogram` composes on top):
    (interval_s, bucket_start, n_events).
    """
    steps = sorted(int(s) for s in ladder)
    # wall-clock epoch seconds, NTZ-safe (the repo's timezone-proof
    # idiom — see conversations.sliding_window_stats)
    ep = F.expr(
        "timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', "
        f"CAST({ts_col} AS TIMESTAMP_NTZ))"
    ).cast("long")
    bounds = df.agg(
        F.min(ep).alias("__lo"), F.max(ep).alias("__hi")
    )
    span = lambda s: F.expr(  # noqa: E731 — slots the range covers at rung s
        f"(__hi DIV {s}) - (__lo DIV {s}) + 1"
    )
    interval = F.lit(steps[-1])
    for s in reversed(steps[:-1]):
        interval = F.when(span(s) <= target_buckets, F.lit(s)).otherwise(
            interval
        )
    return (
        df.select(ep.alias("__e"))
        .crossJoin(F.broadcast(bounds))
        .select(
            interval.cast("long").alias("interval_s"), F.col("__e")
        )
        .groupBy(
            "interval_s",
            F.expr("(__e DIV interval_s) * interval_s")
            .cast("long")
            .alias("bucket_start"),
        )
        .agg(F.count("*").cast("long").alias("n_events"))
    )


def holt_forecast(
    df: DataFrame,
    bucket_col: str = "bucket",
    value_col: str = "value",
    alpha: float = 0.5,
    beta: float = 0.3,
    horizon: int = 1,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Holt linear (double-exponential) smoothing over a bucket series —
    the ES ``moving_fn holt`` / forecast analog. Recurrence (documented
    convention: l0 = x0, b0 = 0):
    ``l_t = α·x_t + (1-α)·(l + b);  b_t = β·(l_t - l) + (1-β)·b``,
    forecast = l + horizon·b after the last bucket.

    The fold is inherently sequential, but the SERIES is histogram
    output — bounded by the calendar, never by the corpus (see module
    docstring) — so collecting it per group into an array and folding
    with a JVM higher-order `aggregate` is safe at any corpus size; the
    corpus-proportional work already happened in the groupBy that built
    the buckets. Every fold step is fixed-order float arithmetic with
    one parse shape, so an independent engine (DuckDB `list_reduce`)
    reproduces level/trend/forecast bit-for-bit.

    Returns (*group_cols, n_buckets, level, trend, forecast) on the
    6-decimal grid.
    """
    g = list(group_cols)
    a, b = float(alpha), float(beta)
    ser = df.groupBy(*g).agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col(bucket_col).alias("k"),
                    F.col(value_col).cast("double").alias("v"),
                )
            )
        ).alias("__s"),
        F.count("*").cast("long").alias("n_buckets"),
    )
    lnew = f"({a!r} * x.v + {1 - a!r} * (acc.l + acc.b))"
    fold = F.expr(
        # greatest(0, ·): an EMPTY ungrouped input still emits one row
        # (global agg) whose __s is []; size-1 = -1 would make slice
        # throw instead of folding nothing.
        "aggregate(slice(__s, 2, greatest(0, size(__s) - 1)), "
        "struct(CAST(__s[0].v AS DOUBLE) AS l, CAST(0.0 AS DOUBLE) AS b), "
        f"(acc, x) -> struct({lnew} AS l, "
        f"({b!r} * ({lnew} - acc.l) + {1 - b!r} * acc.b) AS b))"
    )
    # n_buckets = 0 ⇒ no series: NULL level/trend/forecast, not a
    # crash on __s[0] under ANSI.
    out = ser.withColumn(
        "__st", F.when(F.col("n_buckets") > 0, fold)
    )
    return out.select(
        *g,
        "n_buckets",
        F.round(F.col("__st.l"), 6).alias("level"),
        F.round(F.col("__st.b"), 6).alias("trend"),
        F.round(
            F.col("__st.l") + F.lit(int(horizon)) * F.col("__st.b"), 6
        ).alias("forecast"),
    )


def series_autocorr(
    hist: DataFrame,
    bucket_col: str = "bucket",
    value_col: str = "value",
    lag: int = 1,
) -> DataFrame:
    """Lag-``lag`` Pearson autocorrelation of a bucket series — the
    seasonality/trend diagnostic next to ``serial_diff``. The series is
    histogram output (calendar-bounded; see module docstring), so one
    ordered window builds the lag pairs and every accumulation is an
    exact BIGINT sum; the correlation is ONE final double expression
    both engines evaluate identically.

    Returns one row: (n_pairs, autocorr) on the 6-decimal grid —
    autocorr NULL when fewer than 2 pairs or zero variance.
    """
    w = Window.orderBy(F.col(bucket_col).asc())
    v = F.col(value_col).cast("long")
    pairs = (
        hist.select(v.alias("__y"), F.lag(v, int(lag)).over(w).alias("__x"))
        .filter(F.col("__x").isNotNull())
    )
    agg = pairs.agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.sum("__x").alias("sx"),
        F.sum("__y").alias("sy"),
        F.sum(F.col("__x") * F.col("__x")).alias("sxx"),
        F.sum(F.col("__y") * F.col("__y")).alias("syy"),
        F.sum(F.col("__x") * F.col("__y")).alias("sxy"),
    )
    n = F.col("n_pairs").cast("double")
    num = n * F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col(
        "sy"
    ).cast("double")
    varx = n * F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col(
        "sx"
    ).cast("double")
    vary = n * F.col("syy").cast("double") - F.col("sy").cast("double") * F.col(
        "sy"
    ).cast("double")
    return agg.select(
        "n_pairs",
        F.when(
            (F.col("n_pairs") >= 2) & (varx > 0) & (vary > 0),
            F.round(num / F.sqrt(varx * vary), 6),
        ).alias("autocorr"),
    )


def cumulative_cardinality(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    interval: int = 86400,
) -> DataFrame:
    """ES ``cumulative_cardinality`` pipeline aggregation, exact: per
    time bucket, how many DISTINCT keys have been seen up to and
    including it (the "total unique users over time" curve). Exact via
    first-seen-bucket — each key aggregates to its min bucket (one
    map-side-combined groupBy; key-dimension state), then a
    series-sized cumsum window. ES needs a HLL sketch per bucket; the
    first-seen trick gives the exact answer with ONE corpus pass.

    Returns (bucket_start, new_keys, cumulative_keys) for buckets
    where at least one key first appeared (zero-new buckets between
    them would carry the same cumulative value; compose
    `densify_histogram` + a forward fill if the dense series is
    needed)."""
    ep = F.expr(
        "timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', "
        f"CAST({ts_col} AS TIMESTAMP_NTZ))"
    ).cast("long")
    first = (
        df.select(F.col(key_col).alias("__k"), ep.alias("__e"))
        .select("__k", F.expr(f"__e DIV {int(interval)}").alias("__b"))
        .groupBy("__k")
        .agg(F.min("__b").alias("__fb"))
    )
    per_bucket = first.groupBy("__fb").agg(
        F.count("*").cast("long").alias("new_keys")
    )
    cum = Window.orderBy(F.col("__fb").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return per_bucket.select(
        (F.col("__fb") * int(interval)).cast("long").alias("bucket_start"),
        "new_keys",
        F.sum("new_keys").over(cum).cast("long").alias("cumulative_keys"),
    )


def normalize_series(
    hist: DataFrame,
    bucket_col: str = "bucket",
    value_col: str = "value",
    method: str = "percent_of_sum",
) -> DataFrame:
    """ES ``normalize`` pipeline aggregation over one bucket series:
    ``percent_of_sum`` (v / Σv), ``range`` ((v - min) / (max - min),
    NULL on zero range), or ``mean`` (v / mean). Exact BIGINT
    aggregates + one IEEE division per bucket on the 6-decimal grid;
    series-sized window state only.

    Integer-valued series only (count/cardinality histograms — the ES
    use this emulates): a fractional value column is REJECTED rather
    than silently truncated, because the exact-BIGINT accumulation
    that makes the result engine-portable has no float counterpart
    without a fixed-order fold."""
    dt = dict(hist.dtypes).get(value_col, "")
    _m = re.match(r"decimal\((\d+),(\d+)\)", dt)
    if dt in ("double", "float") or (_m and int(_m.group(2)) > 0):
        raise ValueError(
            "normalize_series requires an integer-valued series "
            f"(count histograms); got {value_col!r}: {dt}. Pre-round "
            "or rescale to integers explicitly."
        )
    w = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    v = F.col(value_col).cast("long")
    if method == "percent_of_sum":
        norm = F.round(
            v.cast("double") / F.sum(v).over(w).cast("double"), 6
        )
    elif method == "range":
        rng = (F.max(v).over(w) - F.min(v).over(w)).cast("double")
        norm = F.when(
            rng > 0,
            F.round((v - F.min(v).over(w)).cast("double") / rng, 6),
        )
    elif method == "mean":
        norm = F.round(
            v.cast("double")
            / (
                F.sum(v).over(w).cast("double")
                / F.count(F.lit(1)).over(w).cast("double")
            ),
            6,
        )
    else:
        raise ValueError(f"unknown method {method!r}")
    return hist.select(
        F.col(bucket_col), v.alias(value_col), norm.alias("normalized")
    )


def moving_percentiles(
    hist: DataFrame,
    window: int,
    probs: Sequence[float] = (0.5,),
    bucket_col: str = "bucket",
    value_col: str = "value",
) -> DataFrame:
    """ES ``moving_percentiles`` pipeline aggregation: for each bucket,
    exact linear-interpolation percentiles over the TRAILING ``window``
    buckets of the series (ES runs TDigest over a shift window; exact
    quantiles are this engine's standing upgrade, same as `boxplot` /
    `lineitem_mad`). Catalyst ``percentile`` over a bounded rows frame
    == DuckDB ``quantile_cont`` over the same frame (repo precedent).

    The frame is series-sized (histogram buckets, calendar-bounded —
    see module docstring), so the single-partition window is bounded
    by the calendar, never the corpus. Returns
    (bucket, value, p<prob> ...) on the 6-decimal grid."""
    if window < 1:
        raise ValueError("window must be >= 1")
    w = Window.orderBy(bucket_col).rowsBetween(-(int(window) - 1), 0)
    cols = [F.col(bucket_col), F.col(value_col).cast("long").alias(value_col)]
    for p in probs:
        if not 0.0 <= float(p) <= 1.0:
            raise ValueError(f"percentile prob out of [0, 1]: {p!r}")
        # percent-based names (p50, p90, p99_9): stable, dot-free, no
        # collision for any practical grid incl. p=1.0 -> p100. Round
        # BEFORE the integer test: 0.29*100 is 28.999999999999996 in
        # floats and must still name p29, not p29_0.
        pct = round(float(p) * 100.0, 4)
        name = "p" + (
            str(int(pct)) if pct == int(pct) else str(pct).replace(".", "_")
        )
        cols.append(
            F.round(
                F.expr(f"percentile({value_col}, {float(p)!r})").over(w), 6
            ).alias(name)
        )
    return hist.select(*cols)


def change_point(
    hist: DataFrame,
    bucket_col: str = "bucket",
    value_col: str = "value",
) -> DataFrame:
    """ES ``change_point`` aggregation, step-change form (simplified:
    ES fits several curve types; the step/spike detector reduces to the
    largest absolute first difference, which is the deterministic,
    cross-engine-exact core). Returns ONE row:
    (bucket, value, prev_value, delta) for the bucket whose
    ``value - lag(value)`` has the largest absolute value (ties: the
    earliest bucket). All integer arithmetic over the calendar-bounded
    series; the selection is a TakeOrdered limit 1, not a full sort."""
    w = Window.orderBy(bucket_col)
    v = F.col(value_col).cast("long")
    d = hist.select(
        F.col(bucket_col),
        v.alias(value_col),
        F.lag(v, 1).over(w).alias("prev_value"),
    ).withColumn("delta", F.col(value_col) - F.col("prev_value"))
    return (
        d.filter(F.col("prev_value").isNotNull())
        .orderBy(F.abs(F.col("delta")).desc(), F.col(bucket_col).asc())
        .limit(1)
    )
