"""Query-time synonym expansion: fulltext_hits(query, synonyms=...)
rewrites configured pipeline tokens to their expansion lists before
standard lunr scoring — exactly as if the user typed the rewritten
query (per-position qtf, prefix expansion, conjunctive AND)."""

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


def test_synonym_rewrite_scores_like_typed_query(eng):
    # 'qqq' matches nothing; the map rewrites it to [zebra, yak] so the
    # query must score bit-identically to the typed 'zebra yak'
    want = _hits(eng.fulltext_hits("zebra yak"))
    got = _hits(eng.fulltext_hits("qqq", synonyms={"qqq": ["zebra", "yak"]}))
    assert got == want and set(got) == {1, 2}


def test_synonyms_leave_unmapped_tokens_alone(eng):
    want = _hits(eng.fulltext_hits("zebra lion"))
    got = _hits(
        eng.fulltext_hits("zebra lion", synonyms={"walrus": ["yak"]})
    )
    assert got == want


def test_synonym_replacements_run_through_pipeline(eng):
    # replacement words are analyzed like query text: 'lions' stems to
    # 'lion' before matching
    want = _hits(eng.fulltext_hits("lion"))
    got = _hits(eng.fulltext_hits("qqq", synonyms={"qqq": ["lions"]}))
    assert got == want and set(got) == {3, 4}


def test_empty_expansion_drops_the_position(eng):
    # a key mapped to [] removes that conjunctive position entirely
    want = _hits(eng.fulltext_hits("zebra"))
    got = _hits(eng.fulltext_hits("zebra lion", synonyms={"lion": []}))
    assert got == want


def test_expansion_to_unknown_token_empties_conjunction(eng):
    got = eng.fulltext_hits("zebra", synonyms={"zebra": ["qqq"]})
    assert got.count() == 0


def test_self_plus_synonym_keeps_original_word(eng):
    # Elasticsearch-style 'expand' config lists the original too
    want = _hits(eng.fulltext_hits("zebra lion"))
    got = _hits(eng.fulltext_hits("zebra", synonyms={"zebra": ["zebra", "lion"]}))
    assert got == want


def test_search_endpoint_threads_synonyms(eng):
    want = eng.search({"query": "zebra yak", "per_page": 10})
    got = eng.search(
        {"query": "qqq", "synonyms": {"qqq": ["zebra", "yak"]}, "per_page": 10}
    )
    w = [(it["_id"], it.get("_score")) for it in want["data"]["items"]]
    g = [(it["_id"], it.get("_score")) for it in got["data"]["items"]]
    assert g == w and len(g) == 2
    assert (
        got["pagination"]["total"] == want["pagination"]["total"] == 2
    )
    # facet counts follow the rewritten result set too
    assert (
        got["data"]["aggregations"]["cat"]["buckets"]
        == want["data"]["aggregations"]["cat"]["buckets"]
    )


def test_search_endpoint_synonyms_compose_with_filters(eng):
    got = eng.search(
        {
            "query": "qqq",
            "synonyms": {"qqq": ["zebra"]},
            "filters": {"cat": ["y"]},
        }
    )
    assert [it["_id"] for it in got["data"]["items"]] == [3]
