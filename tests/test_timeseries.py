"""ES pipeline-aggregation tests (itemsjs_spark.ops.timeseries):
densify zero-fill, cumulative sum / derivative / serial diff exactness,
trailing moving average, bucket_selector filtering."""

from __future__ import annotations

from pyspark.sql import functions as F

from itemsjs_spark.ops import timeseries


def _hist(spark, pairs):
    return spark.createDataFrame(pairs, "bucket long, doc_count long")


def test_densify_fills_gaps_with_zeros(spark):
    h = _hist(spark, [(0, 3), (20, 1), (50, 7)])
    got = {
        r["bucket"]: r["doc_count"]
        for r in timeseries.densify_histogram(h, 10).collect()
    }
    assert got == {0: 3, 10: 0, 20: 1, 30: 0, 40: 0, 50: 7}


def test_pipeline_aggs_match_python_replay(spark):
    pairs = [(0, 4), (10, 1), (40, 6), (50, 2), (60, 2)]
    got = {
        r["bucket"]: (
            r["cum_sum"],
            r["derivative"],
            r["serial_diff"],
            r["moving_avg"],
        )
        for r in timeseries.pipeline_aggs(
            _hist(spark, pairs), window=3, lag=2, interval=10
        ).collect()
    }
    dense = {b: 0 for b in range(0, 70, 10)}
    dense.update(dict(pairs))
    series = sorted(dense.items())
    cum = 0
    want = {}
    for i, (b, v) in enumerate(series):
        cum += v
        deriv = v - series[i - 1][1] if i >= 1 else None
        sdiff = v - series[i - 2][1] if i >= 2 else None
        win = [x for _, x in series[max(0, i - 2) : i + 1]]
        want[b] = (cum, deriv, sdiff, round(sum(win) / len(win), 6))
    assert got == want


def test_pipeline_aggs_first_bucket_nulls_and_selector(spark):
    h = _hist(spark, [(0, 5), (10, 2), (20, 9)])
    rows = {
        r["bucket"]: r
        for r in timeseries.pipeline_aggs(h, window=2).collect()
    }
    assert rows[0]["derivative"] is None and rows[0]["serial_diff"] is None
    assert rows[10]["derivative"] == -3 and rows[20]["derivative"] == 7
    # bucket_selector drops buckets AFTER the window math
    kept = timeseries.pipeline_aggs(
        h, window=2, having=F.col("derivative") > 0
    ).collect()
    assert [r["bucket"] for r in kept] == [20]
    assert kept[0]["cum_sum"] == 16  # metric unchanged by selection


# --- the other small ES agg extensions (stats.py / facet_rare_terms) ---

from itemsjs_spark.ops import stats as stats_ops


def test_percentile_ranks_exact(spark):
    df = spark.createDataFrame(
        [("a", float(v)) for v in [1, 2, 3, 4, 5, 6, 7, 8, 9, 10]]
        + [("b", float(v)) for v in [5, 5, 5, 20]],
        "g string, v double",
    )
    got = {
        r["g"]: (r["n"], r["rank_5"], r["rank_9_5"])
        for r in stats_ops.percentile_ranks(
            df, ["g"], "v", (5.0, 9.5)
        ).collect()
    }
    assert got["a"] == (10, 50.0, 90.0)
    assert got["b"] == (4, 75.0, 75.0)


def test_adjacency_matrix_pairwise_counts(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, "x", 10.0), (2, "x", 300.0), (3, "y", 300.0), (4, "z", 5.0)],
        "id long, t string, v double",
    )
    got = {
        r["key"]: r["doc_count"]
        for r in stats_ops.adjacency_matrix(
            df,
            {"isx": F.col("t") == "x", "hi": F.col("v") >= 200.0,
             "isz": F.col("t") == "z"},
        ).collect()
    }
    # keys sorted; zero-count pairs (hi&isz, isx&isz) absent
    assert got == {"isx": 2, "hi": 2, "isz": 1, "hi&isx": 1}


def test_facet_rare_terms_long_tail(spark):
    from itemsjs_spark.engine import itemsjs_spark

    items = [
        {"id": 1, "cat": "a", "text": "zebra"},
        {"id": 2, "cat": "a", "text": "zebra"},
        {"id": 3, "cat": "a", "text": "zebra"},
        {"id": 4, "cat": "b", "text": "zebra"},
        {"id": 5, "cat": "b", "text": "zebra"},
        {"id": 6, "cat": "c", "text": "zebra"},
    ]
    eng = itemsjs_spark(
        spark, items,
        {"searchableFields": ["text"], "custom_id_field": "id",
         "aggregations": {"cat": {}}},
    )
    rows = [
        (r["key"], r["doc_count"])
        for r in eng.facet_rare_terms("cat", max_doc_count=2).collect()
    ]
    assert rows == [("c", 1), ("b", 2)]  # doc_count asc, key asc; 'a' absent
