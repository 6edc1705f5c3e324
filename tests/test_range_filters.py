"""range_filters extension: per-field [lo, hi] / {gt,gte,lt,lte} bounds
(itemsjs filters are categorical — ranges cover the transcript ts /
numeric use case). They join the candidate set like the query does, so
facet buckets cross with them; fast routes decline them."""

from __future__ import annotations

from datetime import datetime, timezone

import pytest

from itemsjs_spark.engine import EngineError, itemsjs_spark


@pytest.fixture(scope="module")
def eng(spark):
    items = [
        {"id": i, "n": i * 10, "kind": ("x" if i % 2 == 0 else "y"),
         "text": "alpha" if i < 4 else "beta",
         "ts": datetime.fromtimestamp(1704067200 + i * 100, tz=timezone.utc)}
        for i in range(6)
    ]
    return itemsjs_spark(
        spark,
        items,
        {
            "searchableFields": ["text"],
            "aggregations": {"kind": {"size": 10}},
            "custom_id_field": "id",
        },
    )


def _ids(res):
    return sorted(it["id"] for it in res["data"]["items"])


def test_range_inclusive_and_open_ends(eng):
    res = eng.search({"range_filters": {"n": [10, 30]}})
    assert _ids(res) == [1, 2, 3]
    assert res["pagination"]["total"] == 3
    assert _ids(eng.search({"range_filters": {"n": [None, 20]}})) == [0, 1, 2]
    assert _ids(eng.search({"range_filters": {"n": [40, None]}})) == [4, 5]


def test_range_dict_ops_and_multi_field(eng):
    assert _ids(eng.search({"range_filters": {"n": {"gt": 10, "lte": 40}}})) \
        == [2, 3, 4]
    # conjunction across fields
    res = eng.search({"range_filters": {
        "n": [10, 50],
        "ts": {"lt": datetime.fromtimestamp(1704067200 + 400,
                                            tz=timezone.utc)},
    }})
    assert _ids(res) == [1, 2, 3]


def test_range_timestamp_bounds(eng):
    lo = datetime.fromtimestamp(1704067200 + 200, tz=timezone.utc)
    hi = datetime.fromtimestamp(1704067200 + 400, tz=timezone.utc)
    assert _ids(eng.search({"range_filters": {"ts": [lo, hi]}})) == [2, 3, 4]


def test_range_crosses_into_buckets_and_composes(eng):
    # the range set restricts every facet bucket, like the query set
    res = eng.search({"range_filters": {"n": [0, 20]}})
    buckets = {
        b["key"]: b["doc_count"]
        for b in res["data"]["aggregations"]["kind"]["buckets"]
    }
    assert buckets == {"x": 2, "y": 1}  # ids 0,2 (x) and 1 (y)
    # composes with a categorical filter
    res2 = eng.search({"range_filters": {"n": [0, 20]},
                       "filters": {"kind": ["y"]}})
    assert _ids(res2) == [1]
    # composes with a query (conjunctive): alpha docs are ids 0-3
    res3 = eng.search({"query": "alpha", "range_filters": {"n": [20, 50]}})
    assert _ids(res3) == [2, 3]
    assert res3["pagination"]["total"] == 2


def test_range_filter_only_keeps_input_order(eng):
    res = eng.search({"range_filters": {"n": [10, 40]}, "per_page": 2})
    # no sort, no query: docid (input) order, paged
    assert [it["id"] for it in res["data"]["items"]] == [1, 2]


def test_range_unknown_field_and_op(eng):
    with pytest.raises(EngineError, match="unknown range filter field"):
        eng.search({"range_filters": {"nope": [1, 2]}})
    with pytest.raises(EngineError, match="unknown range filter op"):
        eng.search({"range_filters": {"n": {"between": 3}}})


def test_range_result_df_parity(eng):
    df = eng.result_df({"query": "beta", "range_filters": {"n": [40, 50]}})
    assert sorted(r["id"] for r in df.collect()) == [4, 5]
