"""Fuzzy query rewrite: search({query, fuzzy}) corrects dictionary-
missing analyzed tokens to their nearest term before standard lunr
scoring; known tokens (incl. pure prefixes) are never touched."""

from __future__ import annotations

import pytest

from itemsjs_spark.engine import itemsjs_spark


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


def _hits(df):
    return {r["_docid"]: r["__score"] for r in df.collect()}


def test_fuzzy_rewrite_unknown_token(eng):
    # "zebraa" is not a term and no term starts with it -> nearest is
    # zebra (1 edit); scores must equal the correctly spelled query
    want = _hits(eng.fulltext_hits("zebra"))
    got = _hits(eng.fulltext_hits("zebraa", fuzzy=True))
    assert got == want and len(got) == 3


def test_fuzzy_leaves_known_tokens_alone(eng):
    # exact term and pure prefix both count as known
    assert _hits(eng.fulltext_hits("zebra", fuzzy=True)) == _hits(
        eng.fulltext_hits("zebra")
    )
    assert _hits(eng.fulltext_hits("zeb", fuzzy=True)) == _hits(
        eng.fulltext_hits("zeb")
    )


def test_fuzzy_multi_token_conjunctive(eng):
    # both tokens misspelled -> both corrected -> conjunctive AND
    want = _hits(eng.fulltext_hits("zebra yak"))
    got = _hits(eng.fulltext_hits("zebr5a y5ak", fuzzy=True))
    assert got == want and set(got) == {1, 2}


def test_fuzzy_uncorrectable_token_empties_result(eng):
    assert eng.fulltext_hits("zebra qqqqqqqqqq", fuzzy=True).count() == 0


def test_fuzzy_without_flag_stays_strict(eng):
    assert eng.fulltext_hits("zebraa").count() == 0


def _cursor_walk(eng, query, per_page, **extra):
    """Walk the whole result set via search_after cursors."""
    out, cursor = [], [1e9, ""]
    while True:
        res = eng.search(
            {"query": query, "search_after": cursor, "per_page": per_page,
             **extra}
        )
        items = res["data"]["items"]
        if not items:
            return out
        out.extend((it["id"], it["_score"]) for it in items)
        last = items[-1]
        cursor = [last["_score"], str(last["_id"])]


def test_search_after_walks_without_overlap_or_gaps(eng):
    got = _cursor_walk(eng, "zebra", per_page=2)
    ids = [i for i, _ in got]
    assert sorted(ids) == [1, 2, 3]          # every hit exactly once
    scores = [s for _, s in got]
    assert scores == sorted(scores, reverse=True)  # cursor order


def test_search_after_composes_with_filters(eng):
    got = _cursor_walk(
        eng, "zebra", per_page=1, filters={"cat": ["x"]}
    )
    assert sorted(i for i, _ in got) == [1, 2]


def test_search_after_page_costs_a_filter_not_an_offset(eng):
    # the plan must contain the keyset predicate, not a global offset
    res = eng.search(
        {"query": "zebra", "search_after": [1e9, ""], "per_page": 2}
    )
    assert len(res["data"]["items"]) == 2
    assert res["data"]["items"][0]["_score"] >= res["data"]["items"][1]["_score"]


def test_search_after_errors(eng):
    from itemsjs_spark.engine.query import EngineError

    with pytest.raises(EngineError, match="relevance-ordered"):
        eng.search({"search_after": [1.0, "1"]})  # no query
    with pytest.raises(EngineError, match="relevance-ordered"):
        eng.search(
            {"query": "zebra", "sort": {"field": "id"},
             "search_after": [1.0, "1"]}
        )
    with pytest.raises(EngineError, match="last_score"):
        eng.search({"query": "zebra", "search_after": ["x", "y"]})


def test_fuzzy_search_endpoint_composes_with_facets(eng):
    res = eng.search(
        {"query": "zebraa", "fuzzy": True, "filters": {"cat": ["x"]}}
    )
    ids = [it["id"] for it in res["data"]["items"]]
    assert set(ids) == {1, 2}
    buckets = {
        b["key"]: b["doc_count"]
        for b in res["data"]["aggregations"]["cat"]["buckets"]
    }
    # conjunctive filters intersect into EVERY bucket (itemsjs matrix
    # step a), so cat=y counts query ∩ cat=x ∩ cat=y = 0
    assert buckets == {"x": 2, "y": 0}
    # identical to the correctly spelled request
    res2 = eng.search({"query": "zebra", "filters": {"cat": ["x"]}})
    assert [it["id"] for it in res2["data"]["items"]] == ids
