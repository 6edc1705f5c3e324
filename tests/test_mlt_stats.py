"""more_like_this (content-based similar, disjunctive tf·idf query) and
index_stats (corpus/vocabulary/posting counts from the terms table)."""

from __future__ import annotations

import math

import pytest

from itemsjs_spark.engine import itemsjs_spark


@pytest.fixture(scope="module")
def eng(spark):
    items = [
        {"id": 1, "text": "zebra yak zebra"},     # source: rare terms
        {"id": 2, "text": "zebra yak walrus"},    # shares both rares
        {"id": 3, "text": "zebra lion lion"},     # shares one
        {"id": 4, "text": "lion tiger puma"},     # shares none
        {"id": 5, "text": "yak yak yak"},         # one rare, high tf
    ]
    return itemsjs_spark(
        spark, items, {"searchableFields": ["text"], "custom_id_field": "id"}
    )


def _mlt(eng, src, **kw):
    return [
        (r["_docid"], r["__score"])
        for r in eng.more_like_this(src, **kw).collect()
    ]


def test_mlt_excludes_source_and_ranks_overlap(eng):
    got = _mlt(eng, 1, k=10)
    ids = [d for d, _ in got]
    assert 1 not in ids
    assert 4 not in ids  # no shared term -> no score at all
    assert set(ids) == {2, 3, 5}
    # doc 2 shares both source terms; it must outrank single-term docs
    assert ids[0] == 2
    # scores strictly descending (rounded ordering with docid tie-break)
    scores = [s for _, s in got]
    assert scores == sorted(scores, reverse=True)


def test_mlt_score_formula(eng):
    # hand-check doc 5 for source 1: score = qw(yak)*idf(yak)*tf_5(yak)
    # tf_1(yak)=1/3, idf(yak)=1+ln(5/3), tf_5(yak)=1
    idf_yak = 1.0 + math.log(5 / 3)
    want = round((1 / 3) * idf_yak * idf_yak * 1.0, 6)
    got = dict(_mlt(eng, 1, k=10))
    assert got[5] == pytest.approx(want, abs=1e-6)


def test_mlt_max_terms_cut(eng):
    # source 1 vector ranked by tf*idf: zebra (2/3 * idf(3/5-df)) vs yak
    # (1/3). With max_terms=1 only the top term (zebra) queries: doc 5
    # (yak-only) drops out
    got = dict(_mlt(eng, 1, k=10, max_terms=1))
    assert 5 not in got and set(got) == {2, 3}


def test_mlt_missing_source_is_empty(eng):
    assert _mlt(eng, 999) == []


def test_suggest_prefix_df_order(eng):
    got = [(r["term"], r["df"]) for r in eng.suggest("z").collect()]
    assert got == [("zebra", 3)]
    # case-insensitive (query analysis), df desc then term asc
    got2 = [(r["term"], r["df"]) for r in eng.suggest("L").collect()]
    assert got2 == [("lion", 2)]
    # k cuts deterministically; no-match and stopword prefixes are empty
    all_terms = [r["term"] for r in eng.suggest("", k=3).collect()]
    assert all_terms == []  # empty prefix tokenizes to nothing
    assert eng.suggest("q").count() == 0
    assert eng.suggest("the").count() == 0  # stopword analyzes away


def _dym(eng, word, **kw):
    return [
        (r["term"], r["df"], r["dist"])
        for r in eng.did_you_mean(word, **kw).collect()
    ]


def test_did_you_mean_orders_by_distance_then_df(eng):
    # vocabulary: zebra(3) yak(3) walrus(1) lion(2) tiger(1) puma(1)
    # "zebr" -> dist 1 to zebra only (others > 2 edits away at e=1)
    assert _dym(eng, "zebr", max_edits=1) == [("zebra", 3, 1)]
    # exact vocabulary word suggests itself first at dist 0
    got = _dym(eng, "lion", max_edits=2)
    assert got[0] == ("lion", 2, 0)
    # ties on distance break by df desc then term asc: "yaks" analyzes
    # (stems) to "yak" -> dist 0; nothing else within 2 of "yak" except...
    got2 = _dym(eng, "yak", max_edits=2)
    assert got2[0] == ("yak", 3, 0)
    assert all(d <= 2 for _, _, d in got2)


def test_did_you_mean_bounds_and_edges(eng):
    # k cuts after the (dist, df desc, term) order
    got = _dym(eng, "lions", max_edits=2, k=1)
    assert len(got) == 1
    # no term within the edit budget -> empty
    assert _dym(eng, "qqqqqqqq", max_edits=1) == []
    # stopwords analyze away -> empty; empty input -> empty
    assert _dym(eng, "the") == []
    assert _dym(eng, "   ") == []


def test_top_terms_weights_and_cut(spark):
    from itemsjs_spark.engine.query import EngineError

    items = [
        {"id": 1, "grp": "g1", "text": "zebra zebra yak"},
        {"id": 2, "grp": "g1", "text": "zebra lion"},
        {"id": 3, "grp": "g2", "text": "lion lion lion"},
    ]
    eng2 = itemsjs_spark(
        spark,
        items,
        {
            "searchableFields": ["text"],
            "custom_id_field": "id",
            "aggregations": {"grp": {}},
        },
    )
    got = {
        (r["grp"], r["term"]): r["weight"]
        for r in eng2.top_terms("grp", k=2).collect()
    }
    # idf: zebra df2 -> 1+ln(3/2); yak df1 -> 1+ln(3); lion df2 -> 1+ln(3/2)
    idf_z, idf_y = 1 + math.log(3 / 2), 1 + math.log(3)
    # g1 zebra: tf 2/3 + 1/2; g1 yak: 1/3; g1 lion: 1/2
    assert got[("g1", "zebra")] == pytest.approx(
        round((2 / 3 + 1 / 2) * idf_z, 6), abs=1e-6
    )
    # k=2 cut: g1 weights are zebra 1.639, lion 0.5·idf_z≈0.7027,
    # yak (1/3)·idf_y≈0.6997 — lion edges out yak by 0.003
    assert got[("g1", "lion")] == pytest.approx(
        round((1 / 2) * idf_z, 6), abs=1e-6
    )
    g1_terms = {t for (g, t) in got if g == "g1"}
    assert g1_terms == {"zebra", "lion"}
    assert idf_y > 0  # (kept for the hand-math above)
    # g2 is pure lion: tf 1 * idf_z
    assert got[("g2", "lion")] == pytest.approx(round(idf_z, 6), abs=1e-6)
    with pytest.raises(EngineError):
        eng2.top_terms("nope")


def test_related_terms_pmi(eng):
    # corpus (5 docs): zebra in {1,2,3}; yak in {1,2,5}; walrus {2};
    # lion {3,4}; tiger {4}; puma {4}
    got = {
        r["term"]: (r["co_df"], r["pmi"])
        for r in eng.related_terms("zebra", k=10, min_co_df=1).collect()
    }
    assert "zebra" not in got  # seed excluded
    # yak co-occurs in docs 1,2 -> pmi = ln(2*5/(3*3))
    assert got["yak"] == (2, pytest.approx(round(math.log(10 / 9), 6)))
    # walrus stems to "walru"; co {2} -> ln(1*5/(3*1)); lion co {3} ->
    # ln(1*5/(3*2))
    assert got["walru"] == (1, pytest.approx(round(math.log(5 / 3), 6)))
    assert got["lion"] == (1, pytest.approx(round(math.log(5 / 6), 6)))
    assert "tiger" not in got and "puma" not in got  # never co-occur
    # min_co_df suppresses one-off pairs
    only = [r["term"] for r in eng.related_terms("zebra", min_co_df=2).collect()]
    assert only == ["yak"]
    # unknown / stopword seeds are empty
    assert eng.related_terms("qqqq").count() == 0
    assert eng.related_terms("the").count() == 0


def test_index_stats_counts(eng):
    row = eng.index_stats().collect()[0]
    # 5 docs; vocabulary: zebra yak walrus lion tiger puma = 6;
    # postings = distinct (doc, term): 2+3+2+3+1 = 11
    assert (row["n_docs"], row["n_terms"], row["n_postings"]) == (5, 6, 11)


def test_doc_vectors_match_hand_tfidf(eng):
    """The tf-idf export reproduces the lunr math by hand: weight =
    (count/len) * (1 + ln(N/df)), rounded to 6; one row per (doc, term)
    posting, keyed by the external id."""
    rows = {(r["id"], r["term"]): r["weight"]
            for r in eng.doc_vectors().collect()}
    # doc 1 "zebra yak zebra": tf(zebra)=2/3, df(zebra)=3, N=5
    assert rows[(1, "zebra")] == round((2 / 3) * (1 + math.log(5 / 3)), 6)
    # doc 5 "yak yak yak": tf(yak)=1.0, df(yak)=3
    assert rows[(5, "yak")] == round(1.0 * (1 + math.log(5 / 3)), 6)
    # doc 4: three singleton terms, df(tiger)=1
    assert rows[(4, "tiger")] == round((1 / 3) * (1 + math.log(5 / 1)), 6)
    assert len(rows) == eng.index.postings.count()


def test_facet_value_suggest_orders_and_cases(spark):
    from itemsjs_spark.engine import EngineError, itemsjs_spark

    items = [
        {"id": 1, "cat": "Alpha"},
        {"id": 2, "cat": "Alpha"},
        {"id": 3, "cat": "alpine"},
        {"id": 4, "cat": "beta"},
        {"id": 5, "cat": "ALPS"},
    ]
    eng = itemsjs_spark(
        spark,
        items,
        {"aggregations": {"cat": {"size": 10}}, "custom_id_field": "id"},
    )
    got = [
        (r["key"], r["doc_count"])
        for r in eng.facet_value_suggest("cat", "al", k=10).collect()
    ]
    # count desc, then key asc; prefix is case-insensitive both ways
    assert got == [("Alpha", 2), ("ALPS", 1), ("alpine", 1)]
    assert eng.facet_value_suggest("cat", "al", k=1).collect()[0]["key"] == "Alpha"
    with pytest.raises(EngineError, match="unknown facet field"):
        eng.facet_value_suggest("nope", "a")


@pytest.fixture(scope="module")
def sig_eng(spark):
    # kind=a docs all contain 'jargon'; only one background doc does.
    items = [
        {"id": 1, "kind": "a", "text": "jargon shared alpha"},
        {"id": 2, "kind": "a", "text": "jargon shared beta"},
        {"id": 3, "kind": "a", "text": "jargon gamma alpha"},
        {"id": 4, "kind": "b", "text": "shared delta epsilon"},
        {"id": 5, "kind": "b", "text": "shared zeta eta"},
        {"id": 6, "kind": "b", "text": "jargon theta iota"},
    ]
    return itemsjs_spark(
        spark,
        items,
        {
            "aggregations": {"kind": {"size": 10}},
            "searchableFields": ["text"],
            "custom_id_field": "id",
        },
    )


def test_significant_terms_lift_and_order(sig_eng):
    rows = sig_eng.significant_terms(
        {"filters": {"kind": ["a"]}}, k=10, min_fg=2
    ).collect()
    got = {r["term"]: r for r in rows}
    # jargon: fg 3/3 vs bg 4/6 -> lift (3*6)/(3*4) = 1.5
    assert got["jargon"]["fg_df"] == 3 and got["jargon"]["bg_df"] == 4
    assert got["jargon"]["lift"] == pytest.approx(1.5, abs=1e-6)
    # shared (stems to 'share'): fg 2/3 vs bg 4/6 -> lift 1.0; ranks below
    assert got["share"]["lift"] == pytest.approx(1.0, abs=1e-6)
    assert rows[0]["term"] in ("jargon", "alpha")
    # min_fg=2 suppresses the one-off fg terms (alpha has fg 2 -> kept)
    assert "gamma" not in got and "beta" not in got
    assert got["alpha"]["fg_df"] == 2
    # lift = (2*6)/(3*2) = 2.0 -> alpha actually outranks jargon
    assert got["alpha"]["lift"] == pytest.approx(2.0, abs=1e-6)


def test_significant_terms_empty_filter_set(sig_eng):
    out = sig_eng.significant_terms(
        {"filters": {"kind": ["nope"]}}, k=5
    )
    assert out.count() == 0
