"""Transcript-native retrieval operators: hit_context (surrounding
turns of each top-k hit) and grouped_topk (best turn per conversation).

Both are extensions beyond the reference (itemsjs returns whole items);
the driver rows pin them against DuckDB oracles — these tests pin the
edge semantics: window clamping at conversation boundaries, group
isolation, overlapping hit windows, tie-breaks, and empty queries."""

from __future__ import annotations

import pandas as pd
import pytest

from itemsjs_spark.engine import itemsjs_spark


@pytest.fixture(scope="module")
def eng(spark):
    items = [
        # conversation a: the unique-term hit sits mid-conversation
        {"id": 1, "conv": "a", "turn": 0, "text": "alpha beta"},
        {"id": 2, "conv": "a", "turn": 1, "text": "gamma delta"},
        {"id": 3, "conv": "a", "turn": 2, "text": "zmagic gamma"},
        {"id": 4, "conv": "a", "turn": 3, "text": "beta beta"},
        {"id": 5, "conv": "a", "turn": 4, "text": "delta"},
        # conversation b: hit at the very first turn (left clamp)
        {"id": 6, "conv": "b", "turn": 0, "text": "zmagic zmagic"},
        {"id": 7, "conv": "b", "turn": 1, "text": "alpha"},
        # conversation c: no hits — must never appear in context output
        {"id": 8, "conv": "c", "turn": 0, "text": "alpha beta gamma"},
        {"id": 9, "conv": "c", "turn": 1, "text": "beta"},
    ]
    return itemsjs_spark(
        spark,
        items,
        {"searchableFields": ["text"], "custom_id_field": "id"},
        order_by=["conv", "turn"],
    )


def _ranked_hits(eng, query):
    rows = eng.fulltext_hits(query).collect()
    return sorted(
        [(round(r["__score"], 6), str(r["_docid"])) for r in rows],
        key=lambda t: (-t[0], t[1]),
    )


def test_hit_context_window_and_clamping(eng):
    got = eng.hit_context(
        "zmagic", "conv", "turn", k=10, before=1, after=1,
        fields=["conv", "turn", "text"],
    ).collect()
    by_hit = {}
    for r in got:
        by_hit.setdefault(r["hit_id"], []).append(r)
    docid = {  # custom ids map 1:1 onto docids via order_by
        (r["conv"], r["turn"]): r["hit_id"] for r in got if r["offset"] == 0
    }
    a_hit, b_hit = docid[("a", 2)], docid[("b", 0)]
    assert set(by_hit) == {a_hit, b_hit}
    # mid-conversation hit: full ±1 window, in the same conversation
    a = sorted((r["offset"], r["conv"], r["turn"]) for r in by_hit[a_hit])
    assert a == [(-1, "a", 1), (0, "a", 2), (1, "a", 3)]
    # hit at turn 0: left side clamps away
    b = sorted((r["offset"], r["conv"], r["turn"]) for r in by_hit[b_hit])
    assert b == [(0, "b", 0), (1, "b", 1)]
    # conversation c never matched: not in any context
    assert all(r["conv"] != "c" for r in got)


def test_hit_context_k_limits_hits_not_context(eng):
    got = eng.hit_context(
        "zmagic", "conv", "turn", k=1, before=2, after=2,
        fields=["conv", "turn"],
    ).collect()
    # k=1 keeps only the best hit (doc 6 "zmagic zmagic": higher tf)
    (score, best_id) = _ranked_hits(eng, "zmagic")[0]
    assert {r["hit_id"] for r in got} == {int(best_id)}
    assert all(r["hit_score"] == score for r in got)
    assert sorted(r["offset"] for r in got) == [0, 1]  # conv b has 2 turns


def test_hit_context_scores_match_fulltext(eng):
    got = eng.hit_context(
        "gamma", "conv", "turn", k=10, before=0, after=0, fields=["conv"]
    ).collect()
    want = dict()
    for s, d in _ranked_hits(eng, "gamma"):
        want[int(d)] = s
    assert {r["hit_id"]: r["hit_score"] for r in got} == want
    # before=after=0: exactly one context row per hit, offset 0
    assert sorted(r["offset"] for r in got) == [0] * len(want)


def test_hit_context_empty_query(eng):
    df = eng.hit_context("nosuchterm", "conv", "turn", fields=["conv"])
    assert df.count() == 0
    assert df.columns == ["hit_id", "hit_score", "offset", "conv"]
    assert eng.hit_context("the", "conv", "turn").count() == 0


def test_grouped_topk_matches_window_reference(eng):
    got = eng.grouped_topk("gamma", "conv", n_groups=10).collect()
    hits = {int(d): s for s, d in _ranked_hits(eng, "gamma")}
    docs = {
        r["_docid"]: r["conv"]
        for r in eng.index.docs.select("_docid", "conv").collect()
    }
    ref = {}
    for did, s in hits.items():
        g = docs[did]
        cur = ref.get(g)
        if cur is None or (s, -did) > (cur[0], -cur[1]):
            ref[g] = (s, did)
    assert {r["conv"]: (r["best_score"], r["best_id"]) for r in got} == ref


def test_grouped_topk_n_groups_order(eng):
    got = eng.grouped_topk("beta", "conv", n_groups=1).collect()
    assert len(got) == 1
    full = eng.grouped_topk("beta", "conv", n_groups=10).collect()
    ordered = sorted(full, key=lambda r: (-r["best_score"], r["conv"]))
    assert got[0] == ordered[0]


def test_grouped_topk_empty(eng):
    assert eng.grouped_topk("nosuchterm", "conv").count() == 0


@pytest.fixture(scope="module")
def ts_eng(spark):
    """Corpus with a controlled time axis: epochs 1000·turn, split at
    2500 puts turns 0..2 in the prior window and 3..5 in the recent."""
    import datetime as dt

    def t(e):
        return dt.datetime.fromtimestamp(e, dt.timezone.utc)

    items = [
        # "zold" only in the prior window; "znew" only recent; "zboth"
        # once per window; "zdup zdup" twice in ONE doc (df counts docs)
        {"id": 1, "conv": "a", "turn": 0, "text": "zold zboth", "ts": t(0)},
        {"id": 2, "conv": "a", "turn": 1, "text": "zold zdup zdup", "ts": t(1000)},
        {"id": 3, "conv": "a", "turn": 2, "text": "filler", "ts": t(2000)},
        {"id": 4, "conv": "a", "turn": 3, "text": "znew zboth", "ts": t(3000)},
        {"id": 5, "conv": "a", "turn": 4, "text": "znew words", "ts": t(4000)},
        {"id": 6, "conv": "a", "turn": 5, "text": "znew zdup", "ts": t(5000)},
    ]
    return itemsjs_spark(
        spark,
        items,
        {"searchableFields": ["text"], "custom_id_field": "id"},
        order_by=["conv", "turn"],
    )


def test_trending_terms_growth_and_df_semantics(ts_eng):
    got = {
        r["term"]: (r["recent_docs"], r["prior_docs"], r["growth"])
        for r in ts_eng.trending_terms("ts", 2500, k=50).collect()
    }
    # znew: 3 recent docs, 0 prior -> growth (3+1)/(0+1) = 4
    assert got["znew"] == (3, 0, 4.0)
    # zboth: one doc each side -> growth 1.0
    assert got["zboth"] == (1, 1, 1.0)
    # zdup appears twice in doc 2 but df counts DOCS: prior=1, recent=1
    assert got["zdup"] == (1, 1, 1.0)
    # zold never recent -> filtered by min_recent=1
    assert "zold" not in got


def test_trending_terms_min_recent_and_k(ts_eng):
    top = ts_eng.trending_terms("ts", 2500, k=1).collect()
    assert len(top) == 1 and top[0]["term"] == "znew"
    strict = {
        r["term"]
        for r in ts_eng.trending_terms("ts", 2500, k=50, min_recent=2).collect()
    }
    assert strict == {"znew"}


def test_recency_boost_reranks_full_scored_set(ts_eng):
    # raw scores: doc 2 ("zdup zdup", higher tf) beats doc 6 ("znew zdup")
    raw = _ranked_hits(ts_eng, "zdup")
    assert [d for _, d in raw] == ["2", "6"]
    # ref at epoch 5000, tau small enough that doc 6 (age 0) wins
    got = ts_eng.recency_boosted_topk("zdup", "ts", 500.0, 5000, k=10).collect()
    assert [str(r["_id"]) for r in got] == ["6", "2"]
    # boosted = round(round(score,6) * exp((ts-ref)/tau), 6), checked
    import math

    by_id = {str(r["_id"]): r for r in got}
    ages = {"2": 1000, "6": 5000}
    for (score, did) in raw:
        exp_boost = round(score * math.exp((ages[did] - 5000) / 500.0), 6)
        assert by_id[did]["boosted"] == exp_boost
        assert by_id[did]["score"] == score


def test_recency_boost_empty_query(ts_eng):
    assert ts_eng.recency_boosted_topk("nosuchterm", "ts", 500.0, 5000).count() == 0


def test_extractive_summary_picks_high_idf_sentence(spark):
    from itemsjs_spark.ops import text as t

    df = spark.createDataFrame(
        [
            (1, "common words here. unique zebra quark. common words here."),
            (2, "common words here. another plain sentence."),
        ],
        "doc_id long, text string",
    )
    import math
    top = {r["doc_id"]: r for r in t.extractive_summary(df).collect()}
    assert top[1]["sentence"] == "unique zebra quark."
    assert top[1]["score"] == round(math.log(2), 6)
    assert top[2]["sentence"] == "another plain sentence."
    # n=2: the runner-up is the EARLIER of the tied zero-score sentences
    two = sorted(
        (r["doc_id"], r["sent_idx"])
        for r in t.extractive_summary(df, n_sentences=2).collect()
    )
    assert two == [(1, 0), (1, 1), (2, 0), (2, 1)]


def test_extractive_summary_ignores_stopword_mass(spark):
    from itemsjs_spark.ops import text as t

    df = spark.createDataFrame(
        [(1, "the of and with is. tiny quark!")],
        "doc_id long, text string",
    )
    rows = t.extractive_summary(df, n_sentences=5).collect()
    by_idx = {r["sent_idx"]: r for r in rows}
    # the stopword-only sentence contributes no tokens at all
    assert set(by_idx) == {1}
    assert by_idx[1]["sentence"] == "tiny quark!"


def test_term_drift_flags_planted_overrepresented_term(spark):
    """A term frequent in slice A but absent from B tops the drift
    list; a term with identical relative frequency in both slices
    scores ~0; counts are exact."""
    from itemsjs_spark.ops.text import term_drift

    a = spark.createDataFrame(
        [(1, "common zebra zebra zebra"), (2, "common zebra zebra zebra")],
        ["doc_id", "text"],
    )
    b = spark.createDataFrame(
        [(3, "common filler filler filler"), (4, "common filler filler filler")],
        ["doc_id", "text"],
    )
    rows = term_drift(a, b, top_n=10).collect()
    by_term = {r["term"]: r for r in rows}
    assert rows[0]["term"] == "zebra"
    assert by_term["zebra"]["count_a"] == 6
    assert by_term["zebra"]["count_b"] == 0
    assert by_term["zebra"]["kl_term"] > 0
    # 'common' has the same relative frequency on both sides → |kl| tiny
    assert abs(by_term["common"]["kl_term"]) < 0.01
    assert by_term["common"]["count_a"] == 2
