"""snippet_hits: highlight spans + context snippets for phrase queries.

The highlight indices live in RAW token space (lunr tokenizer output,
before stopword/stem filtering) while matching runs in analyzed space —
the tests pin that mapping (stopword squeeze widens the raw span), the
context window clamping, occurrence counting, slop, and stemming."""

from __future__ import annotations

import pytest

from itemsjs_spark.engine import itemsjs_spark


@pytest.fixture(scope="module")
def eng(spark):
    items = [
        {"id": 1, "text": "alpha beta gamma"},
        {"id": 2, "text": "beta alpha beta"},
        {"id": 3, "text": "alpha the beta"},          # stopword widens raw span
        {"id": 4, "text": "beta gamma alpha"},        # present, not adjacent
        {"id": 5, "text": "alpha beta alpha beta"},   # two occurrences
        {"id": 6, "text": "one two three running quickly four five six"},
        {"id": 7, "text": "gamma gamma gamma"},
    ]
    return itemsjs_spark(
        spark, items, {"searchableFields": ["text"], "custom_id_field": "id"}
    )


def _got(eng, phrase, **kw):
    return {
        r["_docid"]: (
            r["n_occurrences"], r["hl_from"], r["hl_to"], r["snippet"]
        )
        for r in eng.snippet_hits(phrase, **kw).collect()
    }


def test_snippet_basic_span_and_counts(eng):
    got = _got(eng, "alpha beta")
    assert set(got) == {1, 2, 3, 5}
    # doc 1: match at raw 0-1, whole (short) doc is the snippet
    assert got[1] == (1, 0, 1, "alpha beta gamma")
    # doc 2: match at raw 1-2
    assert got[2] == (1, 1, 2, "beta alpha beta")
    # doc 5: first occurrence highlighted, both counted
    assert got[5] == (2, 0, 1, "alpha beta alpha beta")


def test_snippet_stopword_widens_raw_span(eng):
    # "alpha the beta": analyzed-adjacent, raw span covers the stopword
    got = _got(eng, "alpha beta")
    assert got[3] == (1, 0, 2, "alpha the beta")


def test_snippet_window_clamps_and_trims(eng):
    got = _got(eng, "running quickly", before=2, after=1)
    assert got == {6: (1, 3, 4, "two three running quickly four")}
    # zero-width context: just the match (raw tokens)
    got0 = _got(eng, "running quickly", before=0, after=0)
    assert got0[6] == (1, 3, 4, "running quickly")
    # window larger than the doc clamps to the doc bounds
    gotb = _got(eng, "running quickly", before=99, after=99)
    assert gotb[6][3] == "one two three running quickly four five six"


def test_snippet_query_is_analyzed_like_the_index(eng):
    # stems + stopword squeeze in the QUERY: "runs the quickly" matches
    assert set(_got(eng, "runs the quickly")) == {6}


def test_snippet_slop_span_ends_at_bound_position(eng):
    # doc 4 "beta gamma alpha": "beta alpha" within slop 1 — the
    # highlight runs to where the chain's last term bound
    got = _got(eng, "beta alpha", slop=1)
    assert got[4] == (1, 0, 2, "beta gamma alpha")
    assert set(got) == {2, 4, 5}


def test_snippet_overlap_counts_first_highlight(eng):
    got = _got(eng, "gamma gamma")
    assert got == {7: (2, 0, 1, "gamma gamma gamma")}


def test_snippet_no_match_and_empty(eng):
    assert _got(eng, "beta delta") == {}
    assert _got(eng, "the a") == {}
    assert _got(eng, "") == {}


def test_snippet_schema(eng):
    df = eng.snippet_hits("alpha beta")
    assert [f.name for f in df.schema.fields] == [
        "_docid", "n_occurrences", "hl_from", "hl_to", "snippet"
    ]
