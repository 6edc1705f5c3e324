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
