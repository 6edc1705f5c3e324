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
