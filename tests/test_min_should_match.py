"""min_should_match OR-mode admission (extension beyond the reference:
the reference's multi-token queries are strictly conjunctive —
SURVEY.md §2.4, `tests/fulltext.spec.ts:49,63`). A doc qualifies when
it matches >= m of the query's token positions; scores stay the exact
lunr dot product over the matched terms."""

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


def test_msm_full_arity_equals_conjunctive_bit_exactly(eng):
    assert _hits(eng.fulltext_hits("zebra yak", min_should_match=2)) == _hits(
        eng.fulltext_hits("zebra yak")
    )


def test_msm_one_is_union_of_per_token_hits(eng):
    got = _hits(eng.fulltext_hits("zebra yak", min_should_match=1))
    union = set(_hits(eng.fulltext_hits("zebra"))) | set(
        _hits(eng.fulltext_hits("yak"))
    )
    assert set(got) == union == {1, 2, 3, 5}


def test_msm_monotone_and_score_consistent(eng):
    m1 = _hits(eng.fulltext_hits("zebra yak", min_should_match=1))
    m2 = _hits(eng.fulltext_hits("zebra yak", min_should_match=2))
    assert set(m2) <= set(m1)
    # the scored formula is arity-independent: docs admitted by both
    # modes carry identical scores
    for d in m2:
        assert m1[d] == m2[d]


def test_msm_survives_unexpandable_token(eng):
    # conjunctive: a token with no trie path empties the result
    assert eng.fulltext_hits("zebra qqqq").count() == 0
    got = _hits(eng.fulltext_hits("zebra qqqq", min_should_match=1))
    assert set(got) == {1, 2, 3}
    # the dead token still contributes to n_tokens but can never match:
    # m=2 is unsatisfiable
    assert eng.fulltext_hits("zebra qqqq", min_should_match=2).count() == 0


def test_msm_all_tokens_unexpandable_is_empty(eng):
    assert eng.fulltext_hits("qqqq wwww", min_should_match=1).count() == 0


def test_msm_clamps_out_of_range(eng):
    lo = _hits(eng.fulltext_hits("zebra yak", min_should_match=0))
    assert lo == _hits(eng.fulltext_hits("zebra yak", min_should_match=1))
    hi = _hits(eng.fulltext_hits("zebra yak", min_should_match=99))
    assert hi == _hits(eng.fulltext_hits("zebra yak"))


def test_msm_distributed_expansion_path_matches_driver_path(eng):
    want = _hits(eng.fulltext_hits("zebra yak", min_should_match=1))
    got = _hits(
        eng._fulltext_hits_distributed_expansion("zebra yak", min_should_match=1)
    )
    assert set(got) == set(want)
    for d in want:
        assert got[d] == pytest.approx(want[d], rel=1e-9)
    eng.release_expansion_caches()


def test_msm_distributed_path_keeps_partial_expansions(eng):
    got = _hits(
        eng._fulltext_hits_distributed_expansion(
            "zebra qqqq", min_should_match=1
        )
    )
    assert set(got) == {1, 2, 3}
    eng.release_expansion_caches()
