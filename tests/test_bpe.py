"""BPE tokenizer: deterministic training, GPT-2-shape greedy apply,
round-trip reconstruction, distributed apply == driver-side encode."""

from __future__ import annotations

from pyspark.sql import functions as F

from itemsjs_spark.ops import bpe


def _df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_most_frequent_pair_merges_first(spark):
    df = _df(spark, ["aaab aaab aaab ccc", "aaab xyz"])
    merges = bpe.train_bpe(df, n_merges=3)
    # 'aa' occurs twice per 'aaab' (4 docs' worth) — the clear winner
    assert merges[0] == ("a", "a")


def test_train_is_deterministic(spark):
    df = _df(spark, ["the cat sat on the mat", "the bat and the rat", "cats"])
    a = bpe.train_bpe(df, n_merges=20)
    b = bpe.train_bpe(df, n_merges=20)
    # this corpus exhausts its pair vocabulary at 18 merges — training
    # stops early, identically, both times
    assert a == b and len(a) == 18


def test_apply_round_trips_and_matches_driver_encode(spark):
    texts = [
        "spark shuffle partition broadcast join",
        "the quick brown fox jumps over the lazy dog",
        "spark spark spark shuffle shuffle",
    ]
    df = _df(spark, texts)
    merges = bpe.train_bpe(df, n_merges=30)
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    rows = bpe.apply_bpe(df, merges).orderBy("doc_id").collect()
    for row, text in zip(rows, texts):
        toks = list(row["bpe_tokens"])
        assert row["n_bpe_tokens"] == len(toks)
        # round trip: concatenating tokens reconstructs word+EOW stream
        assert "".join(toks) == "".join(w + bpe.EOW for w in text.split(" "))
        # distributed apply == driver-side reference encode per word
        expect = []
        for w in text.split(" "):
            expect.extend(bpe.encode_word(w, ranks))
        assert toks == expect


def test_zero_merges_is_character_segmentation(spark):
    df = _df(spark, ["ab c"])
    rows = bpe.apply_bpe(df, []).collect()
    assert list(rows[0]["bpe_tokens"]) == ["a", "b", bpe.EOW, "c", bpe.EOW]


def test_word_frequencies_truncation_is_deterministic(spark):
    df = _df(spark, ["b b b a a c", "a c"])
    rows = bpe.word_frequencies(df, max_words=2).collect()
    # count desc, word asc: a(3), b(3) tie -> a first; c(2) truncated
    assert [(r["w"], r["cnt"]) for r in rows] == [("a", 3), ("b", 3)]


def test_distributed_training_equals_driver_training(spark):
    """train_bpe_distributed produces the EXACT merge list of the
    driver-side trainer on the same corpus (same counts, same
    lexicographic tie-break, same non-overlapping merge), including
    repeated-character words that stress the fold-vs-two-pointer
    equivalence."""
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox",
        "aaaa aaab baaa",
        "sssss sss ss s",
        "low lower lowest newest newer new",
        "the the the them theme",
    ] * 3
    df = _df(spark, texts)
    want = bpe.train_bpe(df, n_merges=40)
    got = bpe.train_bpe_distributed(df, n_merges=40, checkpoint_every=7)
    assert got == want


def test_distributed_training_from_words_table(spark):
    """The from-words entry point (what a 10^6+-word vocabulary uses)
    matches driver training over the identical word-count table."""
    words = spark.createDataFrame(
        [("hello", 5), ("help", 3), ("held", 2), ("hell", 7), ("shell", 1)],
        "w string, cnt long",
    )
    got = bpe.train_bpe_distributed_from_words(words, n_merges=10)
    # driver reference over the same table
    vocab = {tuple(w) + (bpe.EOW,): c for w, c in
             [("hello", 5), ("help", 3), ("held", 2), ("hell", 7), ("shell", 1)]}
    merges = []
    for _ in range(10):
        pairs = bpe._count_pairs(vocab)
        if not pairs:
            break
        top = max(pairs.values())
        best = min(p for p, c in pairs.items() if c == top)
        merges.append(best)
        vocab = bpe._merge_vocab(vocab, best)
    assert got == merges
