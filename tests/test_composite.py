"""Composite aggregation: multi-field buckets with after-key paging
(extension; ES composite agg). The after-key is a filter predicate, not
an offset — pages never rescan skipped buckets."""

from __future__ import annotations

import pytest

from itemsjs_spark.engine import itemsjs_spark
from itemsjs_spark.engine.query import EngineError


@pytest.fixture(scope="module")
def eng(spark):
    items = [
        {"id": 1, "cat": "x", "tag": ["a", "b"], "text": "zebra yak"},
        {"id": 2, "cat": "x", "tag": ["a"], "text": "zebra"},
        {"id": 3, "cat": "y", "tag": ["b"], "text": "yak"},
        {"id": 4, "cat": "y", "tag": ["a", "c"], "text": "zebra lion"},
        {"id": 5, "cat": "z", "tag": ["c"], "text": "lion"},
    ]
    return itemsjs_spark(
        spark,
        items,
        {
            "searchableFields": ["text"],
            "custom_id_field": "id",
            "aggregations": {"cat": {}, "tag": {}},
        },
    )


def _rows(df):
    return [(r["cat"], r["tag"], r["doc_count"]) for r in df.collect()]


def test_composite_cross_of_multivalued_fields(eng):
    got = _rows(eng.composite_buckets(["cat", "tag"], size=100))
    assert got == [
        ("x", "a", 2), ("x", "b", 1),
        ("y", "a", 1), ("y", "b", 1), ("y", "c", 1),
        ("z", "c", 1),
    ]


def test_composite_after_key_pages_without_overlap(eng):
    p1 = _rows(eng.composite_buckets(["cat", "tag"], size=2))
    assert p1 == [("x", "a", 2), ("x", "b", 1)]
    p2 = _rows(
        eng.composite_buckets(["cat", "tag"], size=2, after=list(p1[-1][:2]))
    )
    assert p2 == [("y", "a", 1), ("y", "b", 1)]
    p3 = _rows(
        eng.composite_buckets(["cat", "tag"], size=2, after=list(p2[-1][:2]))
    )
    assert p3 == [("y", "c", 1), ("z", "c", 1)]
    assert _rows(
        eng.composite_buckets(["cat", "tag"], size=2, after=list(p3[-1][:2]))
    ) == []


def test_composite_composes_with_query_and_filters(eng):
    got = _rows(
        eng.composite_buckets(
            ["cat", "tag"], size=100, input={"query": "zebra"}
        )
    )
    assert got == [
        ("x", "a", 2), ("x", "b", 1),
        ("y", "a", 1), ("y", "c", 1),
    ]
    got = _rows(
        eng.composite_buckets(
            ["cat", "tag"], size=100, input={"filters": {"cat": ["y"]}}
        )
    )
    assert got == [("y", "a", 1), ("y", "b", 1), ("y", "c", 1)]


def test_composite_unknown_field_panics(eng):
    with pytest.raises(EngineError, match="does not exist in facets"):
        eng.composite_buckets(["nope"])
    with pytest.raises(EngineError, match="arity"):
        eng.composite_buckets(["cat", "tag"], after=["x"])


def test_facet_rollup_levels(eng):
    rows = {
        (r["cat"], r["tag"], r["level"]): r["doc_count"]
        for r in eng.facet_rollup(["cat", "tag"]).collect()
    }
    # leaf level: same combinations as the composite cross
    assert rows[("x", "a", 2)] == 2 and rows[("y", "c", 2)] == 1
    # per-cat subtotals count value COMBINATIONS (multi-valued docs
    # contribute once per tag value)
    assert rows[("x", None, 1)] == 3  # (1,a),(1,b),(2,a)
    assert rows[("y", None, 1)] == 3
    assert rows[("z", None, 1)] == 1
    # grand total
    assert rows[(None, None, 0)] == 7


def test_facet_rollup_composes_with_filters(eng):
    rows = {
        (r["cat"], r["tag"], r["level"]): r["doc_count"]
        for r in eng.facet_rollup(
            ["cat", "tag"], input={"filters": {"cat": ["y"]}}
        ).collect()
    }
    assert (None, None, 0) in rows and rows[(None, None, 0)] == 3
    assert all(c in ("y", None) for c, _, _ in rows)


def test_facet_rollup_unknown_field_panics(eng):
    with pytest.raises(EngineError, match="does not exist in facets"):
        eng.facet_rollup(["nope"])
