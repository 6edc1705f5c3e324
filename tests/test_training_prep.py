"""Training-prep operators: RAG sliding-window chunking, SFT
context-budget truncation, loss-mask accounting, vocab coverage.

The driver rows (chunk_sliding_window / context_truncate /
sft_mask_stats / vocab_oov_rate) pin each against a DuckDB oracle at
sf0.01; these tests pin the edge semantics on hand-built corpora."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from itemsjs_spark.ops import conversations as conv_ops
from itemsjs_spark.ops import text as text_ops


# ---------------------------------------------------------------------------
# chunk_text
# ---------------------------------------------------------------------------


def _chunks(spark, text, chunk, stride):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = (
        text_ops.chunk_text(df, chunk_tokens=chunk, stride=stride)
        .orderBy("chunk_idx")
        .collect()
    )
    return [(r.chunk_idx, r.n_chunk_toks, r.chunk_text) for r in rows]


def test_chunk_windows_and_overlap(spark):
    text = " ".join(f"t{i}" for i in range(10))
    got = _chunks(spark, text, chunk=4, stride=3)
    # starts 0,3,6: ceil((10-4)/3)+1 = 3 chunks; last covers t6..t9
    assert got == [
        (0, 4, "t0 t1 t2 t3"),
        (1, 4, "t3 t4 t5 t6"),
        (2, 4, "t6 t7 t8 t9"),
    ]


def test_chunk_exact_fit_single_chunk(spark):
    text = "a b c d"
    assert _chunks(spark, text, chunk=4, stride=3) == [(0, 4, "a b c d")]
    # shorter than the window: one chunk, actual length reported
    assert _chunks(spark, "a b", chunk=4, stride=3) == [(0, 2, "a b")]
    assert _chunks(spark, "a", chunk=4, stride=3) == [(0, 1, "a")]


def test_chunk_boundary_divisible(spark):
    # n=7, chunk=4, stride=3: (7-4)/3 = 1 exactly -> 2 chunks, the
    # second ends exactly at the last token (no empty third chunk)
    got = _chunks(spark, "a b c d e f g", chunk=4, stride=3)
    assert got == [(0, 4, "a b c d"), (1, 4, "d e f g")]


def test_chunk_short_tail_kept_once(spark):
    # n=6, chunk=4, stride=3: starts 0,3 -> tail chunk has 3 tokens
    got = _chunks(spark, "a b c d e f", chunk=4, stride=3)
    assert got == [(0, 4, "a b c d"), (1, 3, "d e f")]


def test_chunk_every_token_covered(spark):
    text = " ".join(f"w{i}" for i in range(57))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = text_ops.chunk_text(df, chunk_tokens=8, stride=5).collect()
    seen = set()
    for r in rows:
        seen.update(r.chunk_text.split(" "))
    assert seen == {f"w{i}" for i in range(57)}


def test_chunk_rejects_bad_params(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        text_ops.chunk_text(df, chunk_tokens=0, stride=1)
    with pytest.raises(ValueError):
        text_ops.chunk_text(df, chunk_tokens=4, stride=0)


# ---------------------------------------------------------------------------
# truncate_to_context
# ---------------------------------------------------------------------------


def _tx(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string"
    )


def test_truncate_keeps_longest_suffix(spark):
    df = _tx(
        spark,
        [
            ("c", 0, "user", "a b c d"),        # 4 toks
            ("c", 1, "assistant", "a b c"),     # 3 toks
            ("c", 2, "user", "a b"),            # 2 toks
            ("c", 3, "assistant", "a"),         # 1 tok
        ],
    )
    kept = {
        r.turn_idx: r.suffix_toks
        for r in conv_ops.truncate_to_context(df, budget=6).collect()
    }
    # suffix sums from the end: 1, 3, 6, 10 -> turns 1..3 fit
    assert kept == {3: 1, 2: 3, 1: 6}


def test_truncate_oversize_turn_blocks_older(spark):
    # a mid-conversation giant turn exceeds the budget on its own:
    # it and everything older are dropped (pure suffix rule)
    df = _tx(
        spark,
        [
            ("c", 0, "user", "a"),
            ("c", 1, "user", " ".join(["x"] * 50)),
            ("c", 2, "assistant", "a b"),
        ],
    )
    kept = [r.turn_idx for r in conv_ops.truncate_to_context(df, budget=10).collect()]
    assert kept == [2]


def test_truncate_per_conversation_isolation(spark):
    df = _tx(
        spark,
        [
            ("a", 0, "user", "x y z"),
            ("b", 0, "user", "x"),
            ("b", 1, "user", "y"),
        ],
    )
    got = sorted(
        (r.conv_id, r.turn_idx)
        for r in conv_ops.truncate_to_context(df, budget=3).collect()
    )
    assert got == [("a", 0), ("b", 0), ("b", 1)]


# ---------------------------------------------------------------------------
# sft_mask_stats
# ---------------------------------------------------------------------------


def test_sft_mask_ratio(spark):
    df = _tx(
        spark,
        [
            ("c", 0, "user", "a b c"),
            ("c", 1, "assistant", "d e"),
            ("c", 2, "tool", "f"),
            ("c", 3, "assistant", "g h i j"),
        ],
    )
    (r,) = conv_ops.sft_mask_stats(df).collect()
    assert (r.n_turns, r.total_toks, r.trainable_toks) == (4, 10, 6)
    assert r.trainable_ratio == 0.6


def test_sft_mask_custom_roles(spark):
    df = _tx(spark, [("c", 0, "user", "a b"), ("c", 1, "tool", "c d e f")])
    (r,) = conv_ops.sft_mask_stats(
        df, trainable_roles=("user", "tool")
    ).collect()
    assert (r.total_toks, r.trainable_toks, r.trainable_ratio) == (6, 6, 1.0)


# ---------------------------------------------------------------------------
# vocab_coverage
# ---------------------------------------------------------------------------


def test_vocab_coverage_top_v_and_ties(spark):
    df = spark.createDataFrame(
        [
            (1, "aa aa aa bb bb cc"),
            (2, "bb cc dd"),
            (3, "aa zz"),
        ],
        "doc_id long, text string",
    )
    # counts: aa=4 bb=3 cc=2 dd=1 zz=1 -> V=3 vocab {aa,bb,cc}
    got = {
        r.doc_id: (r.n_toks, r.oov_toks, r.coverage)
        for r in text_ops.vocab_coverage(df, vocab_size=3).collect()
    }
    assert got == {
        1: (6, 0, 1.0),
        2: (3, 1, round(2 / 3, 6)),
        3: (2, 1, 0.5),
    }
    # tie at the boundary (dd vs zz, both 1) resolves token-ASC:
    # with V=4, dd is in-vocab and zz is not
    got4 = {
        r.doc_id: r.oov_toks
        for r in text_ops.vocab_coverage(df, vocab_size=4).collect()
    }
    assert got4 == {1: 0, 2: 0, 3: 1}


# ---------------------------------------------------------------------------
# kneser_ney_logprob
# ---------------------------------------------------------------------------


def test_kneser_ney_hand_computed(spark):
    import math

    # corpus bigrams: (a b) x2 from docs 1,2; (b a) x1; (b c) x1
    df = spark.createDataFrame(
        [(1, "a b a"), (2, "a b c"), (3, "x")],
        "doc_id long, text string",
    )
    rows = {
        r.doc_id: (r.n_bigrams, r.kn_neg_logprob)
        for r in text_ops.kneser_ney_logprob(df, "doc_id").collect()
    }
    D, B = 0.75, 3.0  # types: (a,b), (b,a), (b,c)
    # stats: c(a,b)=2, c(b,a)=1, c(b,c)=1; cv(a)=2, cv(b)=2;
    # n1p_v(a)=1, n1p_v(b)=2; n1p_w(b)=1, n1p_w(a)=1, n1p_w(c)=1
    def p(c2, cv, n1pv, n1pw):
        return (max(c2 - D, 0.0) + (D * n1pv) * (n1pw / B)) / cv

    nll_ab = -math.log(p(2, 2, 1, 1))
    nll_ba = -math.log(p(1, 2, 2, 1))
    nll_bc = -math.log(p(1, 2, 2, 1))
    assert rows[1] == (2, round((nll_ab + nll_ba) / 2, 6))
    assert rows[2] == (2, round((nll_ab + nll_bc) / 2, 6))
    assert rows[3] == (0, None)  # single-token doc: no bigrams


def test_kneser_ney_continuation_effect(spark):
    # "francisco" only ever follows "san": its continuation count is 1
    # however frequent it is, so after an unseen-ish context it must be
    # dearer than an equally frequent word with many contexts.
    # "q common" and "q unique" are symmetric in every raw count
    # (c=1, cv(q)=2, n1p_v(q)=2); they differ ONLY in the continuation
    # count n1p_w — "common" follows five distinct contexts, "unique"
    # one — so interpolated KN must price "q common" strictly cheaper.
    texts = ["q common", "q unique", "a common", "b common", "c common",
             "d common"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    out = text_ops.kneser_ney_logprob(df, "doc_id").collect()
    com = next(r.kn_neg_logprob for r in out if r.doc_id == 0)
    uni = next(r.kn_neg_logprob for r in out if r.doc_id == 1)
    assert com < uni


# ---------------------------------------------------------------------------
# preference_pairs
# ---------------------------------------------------------------------------


def test_preference_pairs_basic(spark):
    df = _tx(
        spark,
        [
            # prompt "help me" answered in two conversations
            ("c1", 0, "user", "help me"),
            ("c1", 1, "assistant", "long detailed answer here"),
            ("c2", 0, "user", "help me"),
            ("c2", 1, "assistant", "short"),
            # a prompt answered only once: no pair
            ("c3", 0, "user", "other thing"),
            ("c3", 1, "assistant", "whatever"),
        ],
    )
    (r,) = conv_ops.preference_pairs(df).collect()
    assert r.prompt == "help me"
    assert r.chosen == "long detailed answer here"
    assert r.rejected == "short"
    assert (r.chosen_toks, r.rejected_toks, r.n_responses) == (4, 1, 2)


def test_preference_pairs_gap_skips_tool_turn(spark):
    df = _tx(
        spark,
        [
            ("c1", 0, "user", "q"),
            ("c1", 1, "tool", "tool output"),
            ("c1", 2, "assistant", "answer one two"),
            ("c2", 0, "user", "q"),
            ("c2", 1, "assistant", "a"),
        ],
    )
    # gap 1: c1's user turn has no adjacent assistant -> only c2's
    # response, so no pair; gap 2 finds c1's too
    assert conv_ops.preference_pairs(df, max_gap=1).count() == 0
    (r,) = conv_ops.preference_pairs(df, max_gap=2).collect()
    assert r.chosen == "answer one two" and r.rejected == "a"


def test_preference_pairs_identical_responses_dropped(spark):
    df = _tx(
        spark,
        [
            ("c1", 0, "user", "p"),
            ("c1", 1, "assistant", "same answer"),
            ("c2", 0, "user", "p"),
            ("c2", 1, "assistant", "same answer"),
        ],
    )
    assert conv_ops.preference_pairs(df).count() == 0


# ---------------------------------------------------------------------------
# datacard
# ---------------------------------------------------------------------------


def test_datacard_summary(spark):
    from itemsjs_spark.ops import pipeline as P

    df = spark.createDataFrame(
        [
            (1, "a b c", "en", "s1"),
            (2, "a b c", "en", "s2"),
            (3, "x y", "de", "s1"),
        ],
        "doc_id long, text string, lang string, source string",
    )
    (r,) = P.datacard(df).collect()
    assert (r.n_docs, r.total_toks, r.total_chars) == (3, 8, 13)
    assert (r.distinct_texts, r.dup_docs) == (2, 1)
    assert (r.n_lang, r.n_source) == (2, 2)
    assert r.dup_ratio == round(1 / 3, 6)
    assert r.avg_toks == round(8 / 3, 6)


# ---------------------------------------------------------------------------
# vocab_growth / memorization_risk
# ---------------------------------------------------------------------------


def test_vocab_growth_curve(spark):
    df = spark.createDataFrame(
        [(1, "a b"), (2, "a c"), (3, "d d"), (4, "a b")],
        "doc_id long, text string",
    )
    rows = sorted(
        text_ops.vocab_growth(df, n_buckets=2).collect(),
        key=lambda r: r.bucket,
    )
    # bucket 0 = docs 1,2 (terms a,b,c); bucket 1 = docs 3,4 (new: d)
    assert [(r.bucket, r.n_docs, r.new_terms, r.vocab_size) for r in rows] \
        == [(0, 2, 3, 3), (1, 2, 1, 4)]


def test_vocab_growth_monotone_and_total(spark):
    df = spark.createDataFrame(
        [(i, f"w{i % 7} w{i % 11}") for i in range(50)],
        "doc_id long, text string",
    )
    rows = sorted(
        text_ops.vocab_growth(df, n_buckets=5).collect(),
        key=lambda r: r.bucket,
    )
    sizes = [r.vocab_size for r in rows]
    assert sizes == sorted(sizes)
    assert sizes[-1] == 11  # w0..w10 all appear
    assert sum(r.n_docs for r in rows) == 50


def test_memorization_risk_flags_shared_grams(spark):
    df = spark.createDataFrame(
        [
            (1, "a b c d e unique1 tail one"),
            (2, "a b c d e unique2 tail two"),
            (3, "completely different text here now"),
            (4, "tiny"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in text_ops.memorization_risk(df, n=5).collect()}
    # docs 1,2 share exactly the gram "a b c d e" (their other grams
    # diverge at unique1/unique2)
    assert got[1].n_grams == 4 and got[1].dup_grams == 1
    assert got[1].risk == 0.25
    assert got[3].dup_grams == 0 and got[3].risk == 0.0
    assert got[4].n_grams == 0 and got[4].risk is None


def test_vocab_growth_rank_col_matches_fallback(spark):
    df = spark.createDataFrame(
        [(i, f"w{i % 7} w{i % 11}", i) for i in range(50)],
        "doc_id long, text string, rk long",
    )
    a = sorted(map(tuple, text_ops.vocab_growth(
        df.select("doc_id", "text"), n_buckets=5).collect()))
    b = sorted(map(tuple, text_ops.vocab_growth(
        df, n_buckets=5, rank_col="rk").collect()))
    assert a == b


def test_preference_pairs_gap_stops_at_intervening_prompt(spark):
    # user1, user2, assistant: the assistant answers user2 ONLY — the
    # gap-2 search from user1 is blocked by the intervening user turn,
    # so "q1" mines no second response and produces no pair
    df = _tx(
        spark,
        [
            ("c1", 0, "user", "q1"),
            ("c1", 1, "user", "q2"),
            ("c1", 2, "assistant", "answer for q2 only"),
            # q1 answered directly elsewhere (single response -> no pair)
            ("c2", 0, "user", "q1"),
            ("c2", 1, "assistant", "direct"),
            # q2 answered differently elsewhere -> the only pair
            ("c3", 0, "user", "q2"),
            ("c3", 1, "assistant", "short"),
        ],
    )
    rows = conv_ops.preference_pairs(df, max_gap=2).collect()
    assert len(rows) == 1
    (r,) = rows
    assert r.prompt == "q2"
    assert r.chosen == "answer for q2 only" and r.rejected == "short"


def test_categorize_text_pattern_buckets(spark):
    df = spark.createDataFrame(
        [
            (1, "Error 404 at node12 path /a"),
            (2, "error 500 at node7 path /b"),
            (3, "Login ok user42"),
        ],
        "doc_id long, text string",
    )
    got = {
        r.category: (r.doc_count, r.example_id)
        for r in text_ops.categorize_text(
            df, "doc_id", "text", max_tokens=3
        ).collect()
    }
    # digit runs collapse -> the two error lines share one template
    assert got["error # at"] == (2, 1)
    assert got["login ok user#"] == (1, 3)
