"""Substring (infix) search: char-trigram index prune + JVM contains
verify. Covers case folding, non-overlapping occurrence counting, the
trigrams-present-but-not-contiguous case the prune alone cannot decide,
scan-vs-trigram route equality, short-needle fallback, tombstone
filtering, and the join fetch route past PHRASE_ISIN_MAX."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from itemsjs_spark.engine import itemsjs_spark
from itemsjs_spark.engine.indexer import DOCID


@pytest.fixture(scope="module")
def eng(spark):
    items = [
        {"id": 1, "text": "the QUICK brown fox"},
        {"id": 2, "text": "quicksilver surfer"},
        {"id": 3, "text": "a qu ick gap"},            # grams qui/uic/ick absent? qu_/u_i... not contiguous
        {"id": 4, "text": "slow snail"},
        {"id": 5, "text": "quickquick echo"},          # two non-overlapping hits
        {"id": 6, "text": "ab"},                        # shorter than a trigram
        # trigram-superset trap: contains every trigram of "abcabd"
        # ("abc","bca","cab","abd") but not the substring itself
        {"id": 7, "text": "abcabx zabd cabq bcaq"},
        {"id": 8, "text": "xx abcabd yy"},
    ]
    return itemsjs_spark(
        spark, items, {"searchableFields": ["text"], "custom_id_field": "id"}
    )


def _got(eng, needle, **kw):
    return {
        r[DOCID]: r["n_occurrences"]
        for r in eng.contains_hits(needle, **kw).collect()
    }


def test_scan_route_case_insensitive_counts(eng):
    got = _got(eng, "quick", use_trigrams=False)
    assert got == {1: 1, 2: 1, 5: 2}


def test_trigram_route_matches_scan(eng):
    eng.enable_trigrams()
    for needle in ["quick", "Quick", "abcabd", "brown fox", "zzz"]:
        assert _got(eng, needle, use_trigrams=True) == _got(
            eng, needle, use_trigrams=False
        ), needle


def test_trigram_superset_rejected_by_verify(eng):
    eng.enable_trigrams()
    # doc 7 carries every trigram of the needle but not the substring:
    # the prune admits it, the contains verify must reject it
    got = _got(eng, "abcabd")
    assert got == {8: 1}


def test_short_needle_uses_scan(eng):
    # auto-route: no trigram for len<3 — still answers, via the scan
    got = _got(eng, "ab")
    assert got == {6: 1, 7: 4, 8: 2}
    with pytest.raises(Exception):
        eng.contains_hits("ab", use_trigrams=True)


def test_contains_respects_tombstones(eng):
    # fresh tombstone state over the shared (cached) index
    deng = eng.reconfigured(eng.configuration)
    deng.enable_trigrams()
    deng.delete([2])
    assert _got(deng, "quick", use_trigrams=True) == {1: 1, 5: 2}
    assert _got(deng, "quick", use_trigrams=False) == {1: 1, 5: 2}


def test_join_fetch_route_past_isin_cap(spark):
    items = [
        {"id": i, "text": f"needleful text {i}"} for i in range(1, 41)
    ]
    eng = itemsjs_spark(
        spark, items, {"searchableFields": ["text"], "custom_id_field": "id"}
    )
    eng.enable_trigrams()
    old = eng.PHRASE_ISIN_MAX
    eng.PHRASE_ISIN_MAX = 5  # force the projection-join fetch
    try:
        got = _got(eng, "needleful", use_trigrams=True)
    finally:
        eng.PHRASE_ISIN_MAX = old
    assert got == {i: 1 for i in range(1, 41)}


def test_trigram_cache_is_distinct_grams(spark):
    items = [{"id": 1, "text": "aaaa"}]
    eng = itemsjs_spark(
        spark, items, {"searchableFields": ["text"], "custom_id_field": "id"}
    )
    cache = eng.enable_trigrams()
    rows = cache.collect()
    assert [(r["gram"], r[DOCID]) for r in rows] == [("aaa", 1)]
    # non-overlapping replace semantics: "aaaa" contains "aa" twice
    assert _got(eng, "aa") == {1: 2}


def test_trigram_persists_through_write_read(spark, tmp_path):
    from itemsjs_spark.engine import SearchEngine
    from itemsjs_spark.engine.indexer import Index

    items = [
        {"id": 1, "text": "the QUICK brown fox"},
        {"id": 2, "text": "quicksilver surfer"},
        {"id": 3, "text": "slow snail"},
    ]
    eng = itemsjs_spark(
        spark, items, {"searchableFields": ["text"], "custom_id_field": "id"}
    )
    eng.enable_trigrams()
    path = str(tmp_path / "idx")
    eng.index.write(path)

    idx2 = Index.read(spark, path)
    assert idx2.trigram_fields == ["text"]
    eng2 = SearchEngine(idx2)
    # lazily disk-backed: no enable_trigrams call, no session cache —
    # the route still engages and reads the persisted artifact
    assert not eng2._trigrams
    got = _got(eng2, "quick")  # auto-route: artifact present
    assert got == {1: 1, 2: 1}
    # the candidate prune really reads the parquet trigram table
    files = idx2.trigram.inputFiles()
    assert files and all("/trigram/" in f or "trigram" in f for f in files)
    # pinning via enable_trigrams adopts the artifact (no re-derive):
    cache = eng2.enable_trigrams()
    assert {r["gram"] for r in cache.filter(F.col(DOCID) == 3).collect()} == {
        "slo", "low", "ow ", "w s", " sn", "sna", "nai", "ail"
    }


def test_trigram_append_carries_delta(spark):
    from itemsjs_spark.engine import SearchEngine

    items = [{"id": 1, "text": "alpha needle beta"}]
    eng = itemsjs_spark(
        spark, items, {"searchableFields": ["text"], "custom_id_field": "id"}
    )
    eng.enable_trigrams()
    delta = spark.createDataFrame(
        [(2, "gamma needle delta")], "id long, text string"
    )
    eng2 = eng.append(delta, docid_col="id")
    assert eng2.index.trigram_fields == ["text"]
    got = _got(eng2, "needle")
    assert got == {1: 1, 2: 1}


def test_trigram_merge_shifts_docids(spark):
    from itemsjs_spark.engine import SearchEngine
    from itemsjs_spark.engine.indexer import merge_indexes

    cfg = {"searchableFields": ["text"]}  # default dense docids
    a = itemsjs_spark(spark, [{"text": "alpha needle"}], cfg)
    b = itemsjs_spark(spark, [{"text": "needle gamma"}], cfg)
    a.enable_trigrams()
    b.enable_trigrams()
    merged = SearchEngine(merge_indexes(a.index, b.index))
    got = _got(merged, "needle")
    assert got == {1: 1, 2: 1}


@pytest.fixture(scope="module")
def seng(spark):
    items = [
        {"id": 0, "text": "alpha quickstep", "kind": "x"},
        {"id": 1, "text": "alpha quicksilver", "kind": "y"},
        {"id": 2, "text": "alpha slow march", "kind": "x"},
        {"id": 3, "text": "beta QUICK steps", "kind": "y"},
    ]
    return itemsjs_spark(
        spark,
        items,
        {
            "searchableFields": ["text"],
            "custom_id_field": "id",
            "aggregations": {"kind": {"size": 10}},
        },
    )


def _sids(res):
    return [it["id"] for it in res["data"]["items"]]


def test_search_contains_filter_only_keeps_input_order(seng):
    res = seng.search({"contains": "quick"})
    assert _sids(res) == [0, 1, 3]
    assert res["pagination"]["total"] == 3


def test_search_contains_crosses_buckets_and_composes(seng):
    res = seng.search({"contains": "quicks"})
    buckets = {
        b["key"]: b["doc_count"]
        for b in res["data"]["aggregations"]["kind"]["buckets"]
    }
    assert buckets == {"x": 1, "y": 1}
    # composes with a categorical filter
    res2 = seng.search({"contains": "quicks", "filters": {"kind": ["y"]}})
    assert _sids(res2) == [1]
    # composes with a query (conjunctive with the substring set)
    res3 = seng.search({"query": "alpha", "contains": "quick"})
    assert sorted(_sids(res3)) == [0, 1]
    # dict form conjoins per-field needles
    res4 = seng.search({"contains": {"text": "quick"}})
    assert _sids(res4) == [0, 1, 3]


def test_search_contains_uses_trigram_route_when_enabled(seng):
    seng.enable_trigrams()
    res = seng.search({"contains": "quicks"})
    assert _sids(res) == [0, 1]


def test_search_contains_declines_fast_routes(seng):
    info = seng.explain_search({"query": "alpha", "contains": "quick"})
    assert info["route"] not in ("wand_topk", "wand_filtered", "facet_blocks")
