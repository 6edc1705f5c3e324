"""Wildcard TERM search (Lucene WildcardQuery analog, extension):
patterns match the analyzed term dictionary; docs score Σ tf·idf over
their matching terms (expansion union, single-token semantics)."""

from __future__ import annotations

import math

import pytest

from itemsjs_spark.engine import itemsjs_spark
from itemsjs_spark.engine.query import EngineError


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


def test_wildcard_question_mark_single_char(eng):
    got = _hits(eng.wildcard_hits("z?bra"))
    assert set(got) == {1, 2, 3}
    got = _hits(eng.wildcard_hits("l??n"))
    assert set(got) == {3, 4}


def test_wildcard_exact_pattern_scores_tf_idf(eng):
    got = _hits(eng.wildcard_hits("zebra"))
    idf = 1.0 + math.log(5 / 3)
    assert got[1] == (2 / 3) * idf
    assert got[2] == (1 / 3) * idf


def test_wildcard_star_unions_expansions(eng):
    # '*a*' matches zebra, yak, walrus, puma — not lion/tiger
    got = _hits(eng.wildcard_hits("*a*"))
    assert set(got) == {1, 2, 3, 4, 5}
    # doc 4 matches only via puma
    idf_puma = 1.0 + math.log(5 / 1)
    assert got[4] == (1 / 3) * idf_puma


def test_wildcard_case_folds_and_misses_cleanly(eng):
    assert _hits(eng.wildcard_hits("ZEB*")) == _hits(eng.wildcard_hits("zeb*"))
    assert eng.wildcard_hits("q*").count() == 0
    assert eng.wildcard_hits("").count() == 0


def test_wildcard_expansion_cap_refuses(eng):
    with pytest.raises(EngineError, match="expands past"):
        eng.wildcard_hits("*a*", max_expansion=2)


def test_explain_hits_contributions_sum_to_score(eng):
    import pytest as _pt

    scores = _hits(eng.fulltext_hits("zebra yak"))
    rows = eng.explain_hits("zebra yak", k_docs=10).collect()
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r["_docid"], {})[r["term"]] = r["contribution"]
    assert set(per_doc) == set(scores)
    for d, terms in per_doc.items():
        assert set(terms) == {"zebra", "yak"}
        assert sum(terms.values()) == _pt.approx(scores[d], abs=3e-6)


def test_explain_hits_k_bounds_docs(eng):
    rows = eng.explain_hits("zebra", k_docs=1).collect()
    assert len({r["_docid"] for r in rows}) == 1
    assert eng.explain_hits("qqqq").count() == 0
