"""Distributed-aggregation contracts: sharded terms with ES-style
doc_count_error_upper_bound, auto-interval histograms, Bloom membership.

Driver rows (terms_shard_error_bounds / auto_date_histogram /
bloom_term_membership) pin the DuckDB-oracle equality; these tests pin
the guarantees themselves: the error bound really bounds, the ladder
rung really is the finest fit, false negatives really are impossible."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from itemsjs_spark.ops import sketches
from itemsjs_spark.ops import timeseries
from itemsjs_spark.ops.stats import sharded_terms


# ---------------------------------------------------------------------------
# sharded_terms
# ---------------------------------------------------------------------------


def _tokens(spark, rows):
    return spark.createDataFrame(rows, "shard int, term string")


def test_sharded_terms_bound_holds_when_term_hides(spark):
    # shard 0 reports top-2 of {a:5, b:4, c:3}: c is cut with floor 4;
    # shard 1 reports {c:6, d:5}: full table (2 terms) -> contrib 5
    rows = (
        [(0, "a")] * 5 + [(0, "b")] * 4 + [(0, "c")] * 3
        + [(1, "c")] * 6 + [(1, "d")] * 5
    )
    got = {
        r.term: (r.doc_count, r.doc_count_error_upper_bound)
        for r in sharded_terms(
            _tokens(spark, rows), shard_size=2, k=10
        ).collect()
    }
    true = {"a": 5, "b": 4, "c": 9, "d": 5}
    # c's merged count misses shard 0's hidden 3, but the bound (shard
    # 0's floor = 4) covers it; terms reported everywhere bound at 0
    assert got["c"] == (6, 4)
    for t, (dc, err) in got.items():
        assert dc <= true[t] <= dc + err, (t, dc, err, true[t])


def test_sharded_terms_small_shard_contributes_zero(spark):
    # a shard with fewer distinct terms than shard_size reported
    # everything -> it can hide nothing, so it adds 0 to every bound
    rows = [(0, "a")] * 3 + [(0, "b")] * 2 + [(1, "a")] * 1
    got = {
        r.term: (r.doc_count, r.doc_count_error_upper_bound)
        for r in sharded_terms(
            _tokens(spark, rows), shard_size=5, k=10
        ).collect()
    }
    assert got == {"a": (4, 0), "b": (2, 0)}


def test_sharded_terms_topk_order(spark):
    rows = [(0, "x")] * 3 + [(0, "y")] * 3 + [(0, "z")] * 1
    got = [
        r.term
        for r in sharded_terms(
            _tokens(spark, rows), shard_size=3, k=2
        ).collect()
    ]
    assert got == ["x", "y"]  # tie on count -> term ASC


# ---------------------------------------------------------------------------
# auto_histogram
# ---------------------------------------------------------------------------


def _events(spark, epochs):
    base = datetime.datetime(1970, 1, 1)
    rows = [(base + datetime.timedelta(seconds=e),) for e in epochs]
    df = spark.createDataFrame(rows, "ts timestamp")
    return df.select(F.col("ts").cast("timestamp_ntz").alias("ts"))


def test_auto_histogram_picks_finest_fitting_rung(spark):
    # 30 minutes of data, target 40 buckets -> minute rung fits (31)
    df = _events(spark, [1_000_000 + i * 60 for i in range(31)])
    rows = timeseries.auto_histogram(df, "ts", target_buckets=40).collect()
    assert {r.interval_s for r in rows} == {60}
    assert sum(r.n_events for r in rows) == 31
    # same data, target 10 -> minute doesn't fit, hour collapses to 1
    rows = timeseries.auto_histogram(df, "ts", target_buckets=10).collect()
    assert {r.interval_s for r in rows} == {3600}


def test_auto_histogram_falls_back_to_coarsest(spark):
    # ten years of daily points: even the weekly rung exceeds 40
    df = _events(spark, [i * 86_400 for i in range(0, 3650, 50)])
    rows = timeseries.auto_histogram(df, "ts", target_buckets=40).collect()
    assert {r.interval_s for r in rows} == {604_800}
    assert sum(r.n_events for r in rows) == 73


def test_auto_histogram_buckets_align(spark):
    df = _events(spark, [100, 110, 190])
    rows = sorted(
        timeseries.auto_histogram(df, "ts", target_buckets=40).collect(),
        key=lambda r: r.bucket_start,
    )
    assert [(r.bucket_start, r.n_events) for r in rows] == [(60, 2), (180, 1)]


# ---------------------------------------------------------------------------
# bloom
# ---------------------------------------------------------------------------


def test_bloom_no_false_negatives_and_some_power(spark):
    terms = spark.createDataFrame(
        [(f"term{i}",) for i in range(120)], "term string"
    )
    words = sketches.bloom_build(terms)
    assert words.count() <= 1024 // 32
    present = terms
    absent = spark.createDataFrame(
        [(f"absent{i}",) for i in range(200)], "term string"
    )
    got_p = sketches.bloom_maybe_contains(present, words).collect()
    assert all(r.maybe_present for r in got_p)  # the Bloom guarantee
    got_a = sketches.bloom_maybe_contains(absent, words).collect()
    fp = sum(r.maybe_present for r in got_a)
    # 120 terms * 3 hashes in 1024 bits -> expected fp ~ (1-e^-0.35)^3
    # ~ 2.6%; 200 probes should stay far under 15%
    assert fp <= 30, fp


def test_bloom_words_deterministic(spark):
    terms = spark.createDataFrame([("a",), ("b",), ("c",)], "term string")
    w1 = sorted(map(tuple, sketches.bloom_build(terms).collect()))
    w2 = sorted(map(tuple, sketches.bloom_build(terms).collect()))
    assert w1 == w2
    # 32-bit packing: every word fits in an unsigned 32-bit value
    assert all(0 <= w < (1 << 32) for _, w in w1)


# ---------------------------------------------------------------------------
# holt_forecast
# ---------------------------------------------------------------------------


def test_holt_matches_reference_fold(spark):
    df = spark.createDataFrame(
        [(10, 5), (20, 7), (30, 6), (40, 9)], "bucket long, value long"
    )
    (r,) = timeseries.holt_forecast(
        df, alpha=0.5, beta=0.3, horizon=2
    ).collect()
    l, b = 5.0, 0.0
    for x in [7.0, 6.0, 9.0]:
        ln = 0.5 * x + 0.5 * (l + b)
        b = 0.3 * (ln - l) + 0.7 * b
        l = ln
    assert (r.n_buckets, r.level, r.trend) == (4, round(l, 6), round(b, 6))
    assert r.forecast == round(l + 2 * b, 6)


def test_holt_single_bucket_flat(spark):
    df = spark.createDataFrame([(10, 3)], "bucket long, value long")
    (r,) = timeseries.holt_forecast(df, horizon=5).collect()
    assert (r.level, r.trend, r.forecast) == (3.0, 0.0, 3.0)


def test_holt_linear_series_forecasts_linearly(spark):
    # a perfectly linear series: trend converges toward the slope and
    # the forecast continues the line (inequality, not exact: Holt
    # needs warm-up from b0 = 0)
    df = spark.createDataFrame(
        [(i, 10 + 5 * i) for i in range(40)], "bucket long, value long"
    )
    (r,) = timeseries.holt_forecast(
        df, alpha=0.5, beta=0.3, horizon=1
    ).collect()
    assert abs(r.trend - 5.0) < 0.05
    assert abs(r.forecast - (10 + 5 * 40)) < 0.5


def test_holt_grouped(spark):
    df = spark.createDataFrame(
        [("a", 1, 1), ("a", 2, 2), ("b", 1, 10), ("b", 2, 10)],
        "g string, bucket long, value long",
    )
    got = {
        r.g: r.trend
        for r in timeseries.holt_forecast(df, group_cols=("g",)).collect()
    }
    assert got["a"] > 0 and got["b"] == 0.0


# ---------------------------------------------------------------------------
# extended_stats / weighted_avg
# ---------------------------------------------------------------------------


def test_extended_stats_hand_computed(spark):
    from itemsjs_spark.ops.stats import extended_stats

    df = spark.createDataFrame(
        [("a", 2), ("a", 4), ("a", 6), ("b", 5)], "g string, v long"
    )
    got = {
        r.g: r for r in extended_stats(df, "v", ("g",)).collect()
    }
    a = got["a"]
    assert (a.n, a.vmin, a.vmax, a.vsum, a.vavg) == (3, 2.0, 6.0, 12.0, 4.0)
    # population variance of {2,4,6} = 8/3
    assert a.variance == round(8 / 3, 6)
    assert a.std_dev == round((8 / 3) ** 0.5, 6)
    b = got["b"]
    assert (b.variance, b.std_dev) == (0.0, 0.0)


def test_weighted_avg_hand_computed(spark):
    from itemsjs_spark.ops.stats import weighted_avg

    df = spark.createDataFrame(
        [("a", 10.0, 1.0), ("a", 20.0, 3.0)], "g string, v double, w double"
    )
    (r,) = weighted_avg(df, "v", "w", ("g",)).collect()
    assert (r.n, r.wavg) == (2, round(70 / 4, 6))


# ---------------------------------------------------------------------------
# string_stats / named_filter_counts
# ---------------------------------------------------------------------------


def test_string_stats_hand_computed(spark):
    import math

    from itemsjs_spark.ops.stats import string_stats

    df = spark.createDataFrame(
        [("en", "aab"), ("en", "b")], "lang string, text string"
    )
    (r,) = string_stats(df, "text", ("lang",)).collect()
    assert (r.n_docs, r.min_len, r.max_len, r.avg_len) == (2, 1, 3, 2.0)
    # chars: a=2, b=2 of 4 -> entropy = 1 bit
    assert r.entropy == 1.0
    # uniform over 4 distinct chars -> 2 bits
    df2 = spark.createDataFrame([("x", "abcd")], "lang string, text string")
    (r2,) = string_stats(df2, "text", ("lang",)).collect()
    assert r2.entropy == 2.0
    # skewed: {a:3, b:1}
    df3 = spark.createDataFrame([("x", "aaab")], "lang string, text string")
    (r3,) = string_stats(df3, "text", ("lang",)).collect()
    want = -(0.75 * math.log2(0.75) + 0.25 * math.log2(0.25))
    assert r3.entropy == round(want, 6)


def test_named_filter_counts_zero_kept(spark):
    from itemsjs_spark.ops.stats import named_filter_counts

    df = spark.createDataFrame(
        [(1, "en"), (2, "de"), (3, "en")], "id long, lang string"
    )
    got = {
        r.key: r.doc_count
        for r in named_filter_counts(
            df,
            {
                "en": F.col("lang") == "en",
                "zz": F.col("lang") == "zz",
            },
        ).collect()
    }
    assert got == {"en": 2, "zz": 0}


def test_mad_hand_computed(spark):
    from itemsjs_spark.ops.stats import median_absolute_deviation

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("a", 4.0), ("a", 100.0), ("b", 7.0)],
        "g string, v double",
    )
    got = {
        r.g: r for r in median_absolute_deviation(df, "v", ("g",)).collect()
    }
    # median of {1,2,4,100} = 3 (interpolated); |x-3| = {2,1,1,97} ->
    # median = 1.5 — the outlier barely moves it (the point of MAD)
    assert (got["a"].n, got["a"].median, got["a"].mad) == (4, 3.0, 1.5)
    assert (got["b"].median, got["b"].mad) == (7.0, 0.0)


def test_series_autocorr_signs_and_edges(spark):
    from itemsjs_spark.ops.timeseries import series_autocorr

    def acf(vals, lag=1):
        df = spark.createDataFrame(
            [(i, v) for i, v in enumerate(vals)], "bucket long, value long"
        )
        (r,) = series_autocorr(df, lag=lag).collect()
        return r

    up = acf([1, 2, 3, 4, 5, 6])          # trending -> strong positive
    assert up.autocorr == 1.0
    alt = acf([1, 9, 1, 9, 1, 9])          # alternating -> -1 at lag 1
    assert alt.autocorr == -1.0
    assert acf([1, 9, 1, 9, 1, 9], lag=2).autocorr == 1.0
    flat = acf([5, 5, 5, 5])               # zero variance -> NULL
    assert flat.autocorr is None
    single = acf([3, 4], lag=2)            # no pairs at this lag
    assert single.n_pairs == 0 and single.autocorr is None


def test_welch_t_hand_computed(spark):
    from itemsjs_spark.ops.stats import welch_t_test

    rows = [("a", v) for v in [1.0, 2.0, 3.0, 4.0]] + [
        ("b", v) for v in [10.0, 12.0, 14.0]
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    (r,) = welch_t_test(df, "v", "g", "a", "b").collect()
    import math

    va = 5 / 3 / 4            # var({1..4})/n = (5/3)/4
    vb = 4.0 / 3              # var({10,12,14})/n = 4/3
    t = (2.5 - 12.0) / math.sqrt(va + vb)
    wdf = (va + vb) ** 2 / (va * va / 3 + vb * vb / 2)
    assert (r.n_a, r.n_b, r.mean_a, r.mean_b) == (4, 3, 2.5, 12.0)
    assert r.t_stat == round(t, 6)
    assert r.welch_df == round(wdf, 6)


def test_welch_t_degenerate_groups(spark):
    from itemsjs_spark.ops.stats import welch_t_test

    df = spark.createDataFrame(
        [("a", 1.0), ("b", 2.0), ("b", 3.0)], "g string, v double"
    )
    (r,) = welch_t_test(df, "v", "g", "a", "b").collect()
    assert r.n_a == 1 and r.t_stat is None and r.welch_df is None


def test_boxplot_hand_computed(spark):
    from itemsjs_spark.ops.stats import boxplot

    df = spark.createDataFrame(
        [("g", float(v)) for v in [1, 2, 3, 4, 100]], "g string, v double"
    )
    (r,) = boxplot(df, "v", ("g",)).collect()
    assert (r.n, r.vmin, r.q2, r.vmax) == (5, 1.0, 3.0, 100.0)
    assert (r.q1, r.q3) == (2.0, 4.0)
    assert (r.lower_fence, r.upper_fence) == (-1.0, 7.0)


def test_cumulative_cardinality_first_seen(spark):
    import datetime

    from itemsjs_spark.ops.timeseries import cumulative_cardinality

    base = datetime.datetime(1970, 1, 1)
    rows = [
        # day 0: users 1, 2 (user 1 twice)
        (1, base + datetime.timedelta(seconds=100)),
        (1, base + datetime.timedelta(seconds=200)),
        (2, base + datetime.timedelta(seconds=300)),
        # day 1: user 1 again (NOT new) + user 3 (new)
        (1, base + datetime.timedelta(days=1, seconds=10)),
        (3, base + datetime.timedelta(days=1, seconds=20)),
        # day 3: nobody new
        (2, base + datetime.timedelta(days=3)),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp").select(
        "user_id", F.col("ts").cast("timestamp_ntz").alias("ts")
    )
    got = sorted(
        map(tuple, cumulative_cardinality(df, "ts", "user_id").collect())
    )
    # day 3 emits nothing (no first-seen user there)
    assert got == [(0, 2, 2), (86400, 1, 3)]


def test_normalize_series_methods(spark):
    from itemsjs_spark.ops.timeseries import normalize_series

    df = spark.createDataFrame(
        [(0, 2), (1, 6), (2, 12)], "bucket long, value long"
    )
    ps = {r.bucket: r.normalized
          for r in normalize_series(df, method="percent_of_sum").collect()}
    assert ps == {0: 0.1, 1: 0.3, 2: 0.6}
    rg = {r.bucket: r.normalized
          for r in normalize_series(df, method="range").collect()}
    assert rg == {0: 0.0, 1: 0.4, 2: 1.0}
    mn = {r.bucket: r.normalized
          for r in normalize_series(df, method="mean").collect()}
    assert mn[1] == round(6 / (20 / 3), 6)
    # zero-range series -> NULL under "range"
    flat = spark.createDataFrame([(0, 5), (1, 5)], "bucket long, value long")
    assert all(
        r.normalized is None
        for r in normalize_series(flat, method="range").collect()
    )
    import pytest as _pytest

    with _pytest.raises(ValueError):
        normalize_series(df, method="nope")


def test_holt_empty_input_yields_nulls(spark):
    # a global agg on an empty frame still emits one row (empty series
    # array); the fold must yield NULLs, not an ANSI slice/index error
    df = spark.createDataFrame([], "bucket long, value long")
    (r,) = timeseries.holt_forecast(df).collect()
    assert r.n_buckets == 0
    assert r.level is None and r.trend is None and r.forecast is None


def test_welch_t_zero_row_group_null_means(spark):
    # a named group with ZERO rows must report NULL mean, not the
    # engine-specific rendering of 0/0 (NaN) or x/0 (Inf)
    from itemsjs_spark.ops.stats import welch_t_test

    df = spark.createDataFrame(
        [("b", 2.0), ("b", 3.0)], "g string, v double"
    )
    (r,) = welch_t_test(df, "v", "g", "a", "b").collect()
    assert (r.n_a, r.n_b) == (0, 2)
    assert r.mean_a is None and r.mean_b == 2.5
    assert r.t_stat is None and r.welch_df is None


def test_normalize_series_rejects_fractional_values(spark):
    # ES normalize on doubles would need a fixed-order float fold;
    # this implementation is exact-BIGINT and must refuse (not
    # silently truncate) a fractional series
    import pytest as _pytest

    from itemsjs_spark.ops.timeseries import normalize_series

    df = spark.createDataFrame(
        [(0, 1.5), (1, 2.5)], "bucket long, value double"
    )
    with _pytest.raises(ValueError, match="integer-valued"):
        normalize_series(df)


def test_string_stats_all_empty_group_kept(spark):
    # a group whose every text is '' has no character rows; ES still
    # reports the bucket -> length stats kept, entropy coalesced to 0
    from itemsjs_spark.ops.stats import string_stats

    df = spark.createDataFrame(
        [("en", "aab"), ("xx", ""), ("xx", "")], "lang string, text string"
    )
    got = {r.lang: r for r in string_stats(df, "text", ("lang",)).collect()}
    assert set(got) == {"en", "xx"}
    r = got["xx"]
    assert (r.n_docs, r.min_len, r.max_len, r.avg_len) == (2, 0, 0, 0.0)
    assert r.entropy == 0.0


def test_moving_percentiles_trailing_window(spark):
    df = spark.createDataFrame(
        [(0, 1), (1, 3), (2, 5), (3, 7)], "bucket long, value long"
    )
    got = {
        r.bucket: (r.p50, r.p90)
        for r in timeseries.moving_percentiles(
            df, window=3, probs=(0.5, 0.9)
        ).collect()
    }
    # bucket 0: frame [1]; bucket 1: [1,3]; bucket 2: [1,3,5]; 3: [3,5,7]
    assert got[0] == (1.0, 1.0)
    assert got[1] == (2.0, round(1 + 0.9 * 2, 6))
    assert got[2] == (3.0, round(3 + 0.8 * 2, 6))
    assert got[3] == (5.0, round(5 + 0.8 * 2, 6))
    import pytest as _pytest

    with _pytest.raises(ValueError):
        timeseries.moving_percentiles(df, window=0)


def test_diversified_sample_caps_per_key(spark):
    from pyspark.sql import functions as F

    from itemsjs_spark.ops.sampling import diversified_sample

    rows = [(i, "a" if i < 5 else "b", 100 - i) for i in range(8)]
    df = spark.createDataFrame(rows, "doc_id long, src string, score long")
    got = diversified_sample(
        df, "src", [F.col("score").desc(), F.col("doc_id").asc()], 2
    ).collect()
    by_key = {}
    for r in got:
        by_key.setdefault(r.src, []).append((r.sample_rank, r.doc_id))
    # top-2 by score desc: key a -> docs 0,1 (scores 100,99); b -> 5,6
    assert sorted(by_key["a"]) == [(1, 0), (2, 1)]
    assert sorted(by_key["b"]) == [(1, 5), (2, 6)]


def test_moving_percentiles_float_prob_names_stable(spark):
    # 0.29*100 is 28.999... in floats; the name must still be p29
    df = spark.createDataFrame([(0, 1), (1, 3)], "bucket long, value long")
    out = timeseries.moving_percentiles(df, window=2, probs=(0.29, 1.0))
    assert out.columns == ["bucket", "value", "p29", "p100"]
    import pytest as _pytest

    with _pytest.raises(ValueError, match="prob"):
        timeseries.moving_percentiles(df, window=2, probs=(1.5,))


def test_change_point_largest_step_earliest_tie(spark):
    df = spark.createDataFrame(
        [(0, 10), (1, 12), (2, 30), (3, 12), (4, 30)],
        "bucket long, value long",
    )
    # |deltas|: b1=2, b2=18, b3=18, b4=18 -> tie broken by earliest
    (r,) = timeseries.change_point(df).collect()
    assert (r.bucket, r.value, r.prev_value, r.delta) == (2, 30, 12, 18)
    # single bucket: no predecessor, empty result
    one = spark.createDataFrame([(0, 5)], "bucket long, value long")
    assert timeseries.change_point(one).count() == 0
