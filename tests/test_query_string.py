"""Lucene-style query_string parsing + execution (extension — the
reference's query is a plain token bag, src/search.ts): +must /
-must_not / bare-should clauses, quoted phrase constraints,
field:value facet clauses, with the exact lunr dot product over the
matched scoring terms."""

from __future__ import annotations

import pytest

from itemsjs_spark.engine import itemsjs_spark
from itemsjs_spark.engine.query import parse_query_string


@pytest.fixture(scope="module")
def eng(spark):
    items = [
        {"id": 1, "cat": "x", "text": "zebra yak zebra"},
        {"id": 2, "cat": "x", "text": "zebra yak walrus"},
        {"id": 3, "cat": "y", "text": "zebra lion lion"},
        {"id": 4, "cat": "y", "text": "lion tiger puma"},
        {"id": 5, "cat": "x", "text": "yak yak yak"},
        {"id": 6, "cat": "y", "text": "zebra walrus yak"},
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


def test_parser_classifies_clauses():
    spec = parse_query_string(
        '+spark merge -batch -lang:de source:src1 "value a" -"bad seq" x:y',
        facet_fields=["lang", "source"],
    )
    assert spec.units == [("spark", "m"), ("merge", "s"),
                          ("value", "m"), ("a", "m"), ("x:y", "s")]
    assert spec.not_words == ["batch"]
    assert spec.must_phrases == ["value a"] and spec.not_phrases == ["bad seq"]
    assert spec.filters == {"source": ["src1"]}
    assert spec.not_filters == {"lang": ["de"]}


def test_parser_default_operator_and():
    spec = parse_query_string("spark merge", default_operator="and")
    assert spec.units == [("spark", "m"), ("merge", "m")]


def test_must_only_equals_conjunctive(eng):
    assert _hits(eng.query_string_hits("+zebra +yak")) == _hits(
        eng.fulltext_hits("zebra yak")
    )


def test_should_only_equals_min_should_match_one(eng):
    assert _hits(eng.query_string_hits("zebra yak")) == _hits(
        eng.fulltext_hits("zebra yak", min_should_match=1)
    )


def test_must_plus_should_and_scores_are_bag_scores(eng):
    got = _hits(eng.query_string_hits("+zebra yak"))
    # zebra required, yak optional-but-at-least-one-should: docs 1, 2, 6
    assert set(got) == {1, 2, 6}
    # scores equal the OR-mode bag over the same text (admission never
    # changes the scored formula)
    ref = _hits(eng.fulltext_hits("zebra yak", min_should_match=1))
    for d, s in got.items():
        assert s == ref[d]


def test_must_not_excludes_prefix_matches(eng):
    got = _hits(eng.query_string_hits("+zebra -walrus"))
    assert set(got) == {1, 3}
    # -wal excludes by prefix expansion, same as full word
    assert set(_hits(eng.query_string_hits("+zebra -wal"))) == {1, 3}


def test_facet_clause_filters_without_touching_scores(eng):
    got = _hits(eng.query_string_hits("+zebra cat:x"))
    assert set(got) == {1, 2}
    neg = _hits(eng.query_string_hits("+zebra -cat:x"))
    assert set(neg) == {3, 6}
    base = _hits(eng.query_string_hits("+zebra"))
    for d in got:
        assert got[d] == base[d]


def test_phrase_constraint_and_negated_phrase(eng):
    got = _hits(eng.query_string_hits('"zebra yak"'))
    assert set(got) == {1, 2}  # adjacency: doc 6 has zebra..yak apart
    neg = _hits(eng.query_string_hits('+zebra -"zebra yak"'))
    assert set(neg) == {3, 6}


def test_unmatchable_must_token_empties(eng):
    assert _hits(eng.query_string_hits("+qqqq zebra")) == {}


def test_filter_only_query_string_refuses(eng):
    with pytest.raises(Exception, match="scoring term"):
        eng.query_string_hits("cat:x")


# --- property: the parser is total and classification-faithful --------

from hypothesis import given, settings, strategies as st

_WORD = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyz0123456789", min_size=1, max_size=8
)
_CLAUSE = st.one_of(
    _WORD,
    _WORD.map(lambda w: "+" + w),
    _WORD.map(lambda w: "-" + w),
    _WORD.map(lambda w: f'"{w} {w}"'),
    _WORD.map(lambda w: f'-"{w}"'),
    st.tuples(st.sampled_from(["lang", "source"]), _WORD).map(
        lambda t: f"{t[0]}:{t[1]}"
    ),
    st.tuples(st.sampled_from(["lang", "source"]), _WORD).map(
        lambda t: f"-{t[0]}:{t[1]}"
    ),
)


@settings(max_examples=200, deadline=None)
@given(st.lists(_CLAUSE, max_size=8))
def test_parser_total_and_faithful(clauses):
    q = " ".join(clauses)
    spec = parse_query_string(q, facet_fields=["lang", "source"])
    # every clause lands in exactly one bucket; nothing is invented
    n_parsed = (
        len([u for u in spec.units if u[1] != "phrase-extra"])
        + len(spec.not_words)
        + len(spec.not_phrases)
        + sum(len(v) for v in spec.filters.values())
        + sum(len(v) for v in spec.not_filters.values())
    )
    # phrase words inflate units (2 words per must phrase) but each
    # phrase itself adds exactly one constraint entry
    n_phrase_words = sum(len(p.split()) for p in spec.must_phrases)
    assert n_parsed - n_phrase_words + len(spec.must_phrases) == len(
        [c for c in clauses if c.strip('+-"')]
    )
    # classes are only m/s; phrase words are must
    assert all(kl in ("m", "s") for _, kl in spec.units)
    # reparse is idempotent on the same input
    spec2 = parse_query_string(q, facet_fields=["lang", "source"])
    assert spec.units == spec2.units
    assert spec.not_words == spec2.not_words
    assert spec.filters == spec2.filters
    assert spec.not_filters == spec2.not_filters
