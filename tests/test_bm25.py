"""True BM25 scoring mode (extension; the parity scorer is lunr 1.0.0
TF-IDF — SURVEY.md §2.4 flags BM25 as the standard-IR extra). Scores
pinned against a pure-Python re-computation of the same formula."""

from __future__ import annotations

import math

import pytest

from itemsjs_spark.engine import itemsjs_spark

DOCS = {
    1: "zebra yak zebra",
    2: "zebra yak walrus",
    3: "zebra lion lion",
    4: "lion tiger puma",
    5: "yak yak yak",
}


@pytest.fixture(scope="module")
def eng(spark):
    items = [
        {"id": i, "cat": "x", "text": t} for i, t in DOCS.items()
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


def _py_bm25(query_terms, k1=1.2, b=0.75, m=1):
    toks = {d: t.split() for d, t in DOCS.items()}
    n = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / n
    out = {}
    for d, tl in toks.items():
        score, matched = 0.0, 0
        for t in sorted(set(query_terms)):
            c = tl.count(t)
            if not c:
                continue
            df = sum(1 for v in toks.values() if t in v)
            idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
            denom = float(c) + k1 * ((1.0 - b) + b * float(len(tl)) / avgdl)
            score = score + idf * (float(c) * (k1 + 1.0)) / denom
            matched += 1
        if matched >= m:
            out[d] = score
    return out


def _hits(df):
    return {r["_docid"]: r["__score"] for r in df.collect()}


def test_bm25_single_term_matches_python_exactly(eng):
    got = _hits(eng.bm25_topk("zebra", k=10))
    assert got == _py_bm25(["zebra"])


def test_bm25_or_mode_and_min_should_match(eng):
    got = _hits(eng.bm25_topk("zebra yak", k=10))
    assert got == _py_bm25(["zebra", "yak"], m=1)
    got2 = _hits(eng.bm25_topk("zebra yak", k=10, min_should_match=2))
    assert got2 == _py_bm25(["zebra", "yak"], m=2)
    assert set(got2) == {1, 2}


def test_bm25_saturation_rewards_count_but_sublinearly(eng):
    s = _hits(eng.bm25_topk("yak", k=10))
    # doc 5 has 3 yaks, docs 1-2 have one: higher but < 3x
    assert s[5] > s[1] and s[5] < 3 * s[1]


def test_bm25_unknown_terms_and_empty_query(eng):
    assert eng.bm25_topk("qqqq", k=10).count() == 0
    assert eng.bm25_topk("", k=10).count() == 0
    # unknown token contributes nothing but m counts the TYPED arity
    got = _hits(eng.bm25_topk("zebra qqqq", k=10))
    assert got == _py_bm25(["zebra"])


def test_bm25_respects_tombstones_with_stale_df(spark):
    items = [
        {"id": i, "cat": "x", "text": t} for i, t in DOCS.items()
    ]
    e = itemsjs_spark(
        spark, items,
        {"searchableFields": ["text"], "custom_id_field": "id",
         "aggregations": {"cat": {}}},
    )
    before = _hits(e.bm25_topk("zebra", k=10))
    e.delete([1])
    after = _hits(e.bm25_topk("zebra", k=10))
    assert set(after) == set(before) - {1}
    for d in after:  # stale df: surviving scores unchanged
        assert after[d] == before[d]
    e.release_bm25()


def test_bm25_artifact_persists_and_reopens_without_retokenize(
    spark, tmp_path, monkeypatch
):
    from itemsjs_spark.engine import indexer as idxmod
    from itemsjs_spark.engine.indexer import Index
    from itemsjs_spark.engine.query import SearchEngine

    items = [
        {"id": i, "cat": "x", "text": t} for i, t in DOCS.items()
    ]
    e = itemsjs_spark(
        spark, items,
        {"searchableFields": ["text"], "custom_id_field": "id",
         "aggregations": {"cat": {}}},
    )
    want = _hits(e.bm25_topk("zebra yak", k=10))
    e.enable_bm25()  # materialize, so write() persists the artifact
    path = str(tmp_path / "idx")
    e.index.write(path)
    e.release_bm25()

    # the reopened index must serve BM25 from disk: poison the builder
    def boom(*a, **k):
        raise AssertionError("bm25_postings re-ran on a disk artifact")

    monkeypatch.setattr(idxmod, "bm25_postings", boom)
    reopened = SearchEngine(Index.read(spark, path))
    got = _hits(reopened.bm25_topk("zebra yak", k=10))
    assert got == want
    reopened.release_bm25()
