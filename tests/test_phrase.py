"""Phrase search (extension): postings-intersection prune + Arrow
adjacency verify. Covers stopword-squeezed adjacency, stemming,
overlapping occurrences, the present-but-not-adjacent case the pruning
stage alone cannot decide, and field selection."""

from __future__ import annotations

import pytest

from itemsjs_spark.engine import itemsjs_spark


@pytest.fixture(scope="module")
def eng(spark):
    items = [
        {"id": 1, "text": "alpha beta gamma"},
        {"id": 2, "text": "beta alpha beta"},          # not adjacent as "alpha beta"? (alpha beta at 1-2)
        {"id": 3, "text": "alpha the beta"},            # stopword squeezed -> adjacent
        {"id": 4, "text": "beta gamma alpha"},          # both present, NOT adjacent
        {"id": 5, "text": "alpha beta alpha beta"},     # two occurrences
        {"id": 6, "text": "running quickly"},           # stems to "run quickli"
        {"id": 7, "text": "gamma gamma gamma"},         # overlap: "gamma gamma" x2
        {"id": 8, "text": "alpha"},                     # missing a term
    ]
    return itemsjs_spark(
        spark, items, {"searchableFields": ["text"], "custom_id_field": "id"}
    )


def _got(eng, phrase, **kw):
    return {
        r["_docid"]: r["n_occurrences"]
        for r in eng.phrase_hits(phrase, **kw).collect()
    }


def test_phrase_adjacency_and_counts(eng):
    # docid == id here (custom_id_field dense 1..8 maps via assign order)
    got = _got(eng, "alpha beta")
    # doc 4 has both terms but not adjacent: pruning passes it, the
    # verify stage must reject it
    assert set(got) == {1, 2, 3, 5}
    assert got[5] == 2 and got[1] == 1 and got[2] == 1
    # stopword squeeze: "alpha the beta" matches "alpha beta"
    assert got[3] == 1


def test_phrase_stopwords_in_query_are_squeezed(eng):
    assert _got(eng, "alpha the beta") == _got(eng, "alpha beta")


def test_phrase_overlapping_occurrences(eng):
    assert _got(eng, "gamma gamma") == {7: 2}


def test_phrase_is_stemmed(eng):
    # "runs" -> "run", "quickly" -> "quickli": both sides stem
    assert set(_got(eng, "runs quickly")) == {6}


def test_phrase_single_term_counts_occurrences(eng):
    got = _got(eng, "gamma")
    assert got == {1: 1, 4: 1, 7: 3}


def test_phrase_no_match_and_empty(eng):
    assert _got(eng, "beta delta") == {}
    assert _got(eng, "the a") == {}  # all stopwords -> empty analysis
    assert _got(eng, "") == {}


def test_phrase_slop_widens_the_match_window(eng):
    # doc 4 "beta gamma alpha": "beta alpha" not adjacent (slop 0) but
    # within one intervening token (slop 1); doc 2 "beta alpha beta"
    # matches at slop 0 already
    # doc 5 "alpha beta alpha beta" also holds "beta alpha" at 2-3
    assert set(_got(eng, "beta alpha")) == {2, 5}
    got = _got(eng, "beta alpha", slop=1)
    assert set(got) == {2, 4, 5} and got[4] == 1
    # order still matters under slop: "gamma alpha" exists in doc 4,
    # "alpha gamma" only via doc 1's adjacency
    assert set(_got(eng, "alpha gamma", slop=1)) == {1}


def test_phrase_slop_greedy_counts_per_start(eng):
    # doc 5 "alpha beta alpha beta": starts at tokens 1 and 3 both
    # complete under any slop; greedy binds each to the nearest beta
    assert _got(eng, "alpha beta", slop=2)[5] == 2


def test_phrase_slop_zero_equals_consecutive(eng):
    for q in ("alpha beta", "gamma gamma"):
        assert _got(eng, q) == _got(eng, q, slop=0)


def test_phrase_join_route_matches_isin_route(eng):
    # force the common-phrase fallback (join against the candidate
    # DataFrame) and prove it returns exactly what the point-lookup
    # route returns
    want = _got(eng, "alpha beta")
    eng.PHRASE_ISIN_MAX = 0  # instance override shadows the class attr
    try:
        assert _got(eng, "alpha beta") == want and want
    finally:
        del eng.PHRASE_ISIN_MAX


def test_phrase_unknown_field_raises(eng):
    from itemsjs_spark.engine.query import EngineError

    with pytest.raises(EngineError):
        eng.phrase_hits("alpha beta", field="nope")
