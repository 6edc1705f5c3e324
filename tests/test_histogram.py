"""facet_histogram: date/numeric histogram over the search result set
(query + categorical + range filters compose), sparse buckets."""

from __future__ import annotations

from datetime import datetime, timezone

import pytest

from itemsjs_spark.engine import EngineError, itemsjs_spark


@pytest.fixture(scope="module")
def eng(spark):
    rows = [
        (0, 3, "x", "alpha", datetime.fromtimestamp(1000, tz=timezone.utc)),
        (1, 9, "y", "alpha", datetime.fromtimestamp(1050, tz=timezone.utc)),
        (2, 10, "x", "alpha", datetime.fromtimestamp(1100, tz=timezone.utc)),
        (3, 19, "x", "beta", datetime.fromtimestamp(1210, tz=timezone.utc)),
        (4, 40, "x", "alpha", datetime.fromtimestamp(5000, tz=timezone.utc)),
    ]
    # typed DataFrame input: histogram needs real numeric/timestamp
    # columns (the items path JS-coerces mixed values to strings)
    df = spark.createDataFrame(
        rows, "id long, n long, kind string, text string, ts timestamp"
    )
    return itemsjs_spark(
        df.sparkSession,
        df,
        {
            "searchableFields": ["text"],
            "aggregations": {"kind": {"size": 10}},
            "custom_id_field": "id",
        },
        docid_col="id",
    )


def _h(df):
    return {r["bucket"]: r["doc_count"] for r in df.collect()}


def test_numeric_bins_inclusive_lower(eng):
    got = _h(eng.facet_histogram("n", 10))
    # bins [0,10): n=3,9 | [10,20): 10,19 | [40,50): 40 — sparse gaps
    assert got == {0: 2, 10: 2, 40: 1}


def test_origin_shifts_bins(eng):
    got = _h(eng.facet_histogram("n", 10, origin=5))
    # anchored at 5: [-5,5): 3 | [5,15): 9,10 | [15,25): 19 | [35,45): 40
    assert got == {-5: 1, 5: 2, 15: 1, 35: 1}


def test_timestamp_bins_epoch_seconds(eng):
    got = _h(eng.facet_histogram("ts", 100))
    assert got == {1000: 2, 1100: 1, 1200: 1, 5000: 1}


def test_composes_with_query_filters_and_ranges(eng):
    got = _h(eng.facet_histogram("ts", 100, {"query": "alpha"}))
    assert got == {1000: 2, 1100: 1, 5000: 1}  # beta doc 3 drops
    got2 = _h(eng.facet_histogram(
        "ts", 100, {"query": "alpha", "filters": {"kind": ["x"]}}
    ))
    assert got2 == {1000: 1, 1100: 1, 5000: 1}  # y doc 1 drops
    got3 = _h(eng.facet_histogram(
        "ts", 100, {"query": "alpha", "range_filters": {"n": [5, 30]}}
    ))
    assert got3 == {1000: 1, 1100: 1}  # n=3 and n=40 drop


def test_unknown_field_raises(eng):
    with pytest.raises(EngineError, match="unknown histogram field"):
        eng.facet_histogram("nope", 10)
    with pytest.raises(EngineError, match="must be numeric/timestamp"):
        eng.facet_histogram("kind", 10)


def test_float_interval_buckets(eng):
    got = _h(eng.facet_histogram("n", 2.5))
    assert got[2.5] == 1 and got[7.5] == 1 and got[10.0] == 1
    assert sum(got.values()) == 5


def test_calendar_week_histogram_truncates_to_mondays(spark):
    from datetime import datetime, timezone

    from itemsjs_spark.engine import itemsjs_spark

    def ts(d, h=0):
        return datetime(2024, 1, d, h, tzinfo=timezone.utc)

    # Jan 1 2024 is a Monday; Jan 7 is a Sunday (same week bucket)
    rows = [
        (1, ts(1)), (2, ts(7, 23)),        # week of Jan 1
        (3, ts(8)),                         # week of Jan 8
        (4, ts(21, 5)),                     # Jan 21 is a Sunday -> week of Jan 15
    ]
    df = spark.createDataFrame(rows, "id long, t timestamp")
    eng = itemsjs_spark(
        spark, df, {"custom_id_field": "id"}, docid_col="id"
    )
    got = {
        r["bucket"]: r["doc_count"]
        for r in eng.facet_histogram("t", "week").collect()
    }
    jan1 = int(ts(1).timestamp())
    jan8 = int(ts(8).timestamp())
    jan15 = int(ts(15).timestamp())
    assert got == {jan1: 2, jan8: 1, jan15: 1}
    # a fixed 7-day width anchored at origin 0 would NOT give Mondays:
    # epoch 0 is a Thursday, so the fixed bins differ from the calendar
    fixed = {
        r["bucket"]
        for r in eng.facet_histogram("t", 604800).collect()
    }
    assert fixed != set(got)


def test_calendar_interval_requires_time_field(spark):
    from itemsjs_spark.engine import EngineError, itemsjs_spark

    df = spark.createDataFrame([(1, 5)], "id long, n long")
    eng = itemsjs_spark(spark, df, {"custom_id_field": "id"}, docid_col="id")
    with pytest.raises(EngineError, match="calendar interval"):
        eng.facet_histogram("n", "week").collect()
    with pytest.raises(EngineError, match="unknown calendar interval"):
        eng.facet_histogram("n", "fortnight").collect()


def test_facet_ranges_named_buckets(eng):
    """Half-open [from,to) semantics, overlapping ranges allowed,
    zero-count ranges reported, filters compose, errors on unknown
    field / empty ranges."""
    out = _h(
        eng.facet_ranges(
            "n",
            [
                {"key": "all"},
                {"key": "neg", "to": 0},
                {"key": "lo", "from": 0, "to": 10},
                {"key": "hi", "from": 10},
                {"key": "overlap", "from": 5, "to": 15},
            ],
        ).withColumnRenamed("doc_count", "doc_count")
    )
    # n values: 3, 9, 10, 19, 40
    assert out == {"all": 5, "neg": 0, "lo": 2, "hi": 3, "overlap": 2}
    flt = _h(
        eng.facet_ranges(
            "n", [{"key": "lo", "to": 10}], {"filters": {"kind": ["y"]}}
        )
    )
    assert flt == {"lo": 1}
    with pytest.raises(EngineError):
        eng.facet_ranges("nope", [{"key": "x"}])
    with pytest.raises(EngineError):
        eng.facet_ranges("n", [])
