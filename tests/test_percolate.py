"""Reverse search (percolator): match saved queries against the indexed
corpus — the alerting/routing primitive. Extension beyond the reference
(which has no stored-query surface); term matching is exact-analyzed
conjunction, filters use the reference's OR-within/AND-across facet
semantics (`src/helpers.ts:165-207`)."""

from __future__ import annotations

import pytest

from itemsjs_spark.engine import itemsjs_spark
from itemsjs_spark.engine.query import EngineError


@pytest.fixture(scope="module")
def eng(spark):
    items = [
        {"id": 1, "cat": "x", "text": "zebra yak zebra"},
        {"id": 2, "cat": "x", "text": "zebra yak walrus"},
        {"id": 3, "cat": "y", "text": "zebra lion lion"},
        {"id": 4, "cat": "y", "text": "lion tiger puma"},
        {"id": 5, "cat": "x", "text": "yak yak yak"},
    ]
    return itemsjs_spark(
        spark,
        items,
        {
            "searchableFields": ["text"],
            "custom_id_field": "id",
            "aggregations": {"cat": {}},
        },
    )


def _pairs(df):
    return {(r["query_id"], r["_docid"]) for r in df.collect()}


def test_term_conjunction(eng):
    got = _pairs(eng.percolate([{"id": "a", "query": "zebra yak"}]))
    assert got == {("a", 1), ("a", 2)}


def test_query_is_analyzed(eng):
    # 'Zebras' stems to 'zebra'; the stopword 'the' drops out
    got = _pairs(eng.percolate([{"id": "a", "query": "the Zebras"}]))
    assert got == {("a", 1), ("a", 2), ("a", 3)}


def test_exact_terms_no_prefix_expansion(eng):
    assert _pairs(eng.percolate([{"id": "a", "query": "zeb"}])) == set()


def test_filters_only_rule(eng):
    got = _pairs(eng.percolate([{"id": "b", "filters": {"cat": ["y"]}}]))
    assert got == {("b", 3), ("b", 4)}


def test_or_within_field(eng):
    got = _pairs(
        eng.percolate([{"id": "b", "filters": {"cat": ["x", "y"]}}])
    )
    assert {d for _, d in got} == {1, 2, 3, 4, 5}


def test_query_and_filters_compose(eng):
    got = _pairs(
        eng.percolate(
            [{"id": "c", "query": "zebra", "filters": {"cat": ["y"]}}]
        )
    )
    assert got == {("c", 3)}


def test_many_rules_one_pass(eng):
    got = _pairs(
        eng.percolate(
            [
                {"id": "a", "query": "zebra yak"},
                {"id": "b", "filters": {"cat": ["y"]}},
                {"id": "c", "query": "lion", "filters": {"cat": ["y"]}},
                {"id": "d", "query": "walrus tiger"},  # no doc has both
            ]
        )
    )
    assert got == {
        ("a", 1), ("a", 2),
        ("b", 3), ("b", 4),
        ("c", 3), ("c", 4),
    }


def test_empty_rule_matches_nothing(eng):
    assert _pairs(eng.percolate([{"id": "z"}])) == set()
    assert _pairs(eng.percolate([])) == set()


def test_unknown_facet_field_panics(eng):
    with pytest.raises(EngineError, match="does not exist in facets"):
        eng.percolate([{"id": "a", "filters": {"nope": ["x"]}}])


def test_percolate_respects_tombstones(spark):
    items = [
        {"id": 1, "cat": "x", "text": "zebra"},
        {"id": 2, "cat": "x", "text": "zebra"},
    ]
    e = itemsjs_spark(
        spark,
        items,
        {
            "searchableFields": ["text"],
            "custom_id_field": "id",
            "aggregations": {"cat": {}},
        },
    )
    e.delete([1])
    got = _pairs(e.percolate([
        {"id": "t", "query": "zebra"},
        {"id": "f", "filters": {"cat": ["x"]}},
    ]))
    assert got == {("t", 2), ("f", 2)}


def test_multivalued_field_counts_unit_once(spark):
    items = [
        {"id": 1, "tags": ["a", "b"], "text": "zebra"},
        {"id": 2, "tags": ["a"], "text": "zebra"},
        {"id": 3, "tags": ["c"], "text": "zebra"},
    ]
    e = itemsjs_spark(
        spark,
        items,
        {
            "searchableFields": ["text"],
            "custom_id_field": "id",
            "aggregations": {"tags": {}},
        },
    )
    # doc 1 matches BOTH listed values of one field: the unit must count
    # once, so the rule's arity check still passes (and only once)
    got = _pairs(e.percolate([
        {"id": "m", "query": "zebra", "filters": {"tags": ["a", "b"]}},
        {"id": "dupvals", "filters": {"tags": ["a", "a"]}},
    ]))
    assert got == {("m", 1), ("m", 2), ("dupvals", 1), ("dupvals", 2)}
