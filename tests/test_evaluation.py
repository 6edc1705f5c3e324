"""rank_eval (recall@k / MRR@k / nDCG@k) and normalize_text unit tests —
hand-computed expectations."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from itemsjs_spark.ops import embeddings, text
from itemsjs_spark.ops.evaluation import rank_eval


def test_rank_eval_hand_computed(spark):
    results = spark.createDataFrame(
        [
            (1, "b", 0.9),
            (1, "x", 0.8),
            (1, "a", 0.7),
            (1, "y", 0.6),
            (2, "x", 0.5),
            (2, "y", 0.4),
        ],
        "query_id int, doc_id string, score double",
    )
    judgments = spark.createDataFrame(
        [
            (1, "a", 2),
            (1, "b", 1),
            (1, "c", 1),
            (1, "d", 0),
            (2, "z", 0),
        ],
        "query_id int, doc_id string, grade int",
    )
    out = {
        r["query_id"]: r
        for r in rank_eval(results, judgments, k=3).collect()
    }
    r1 = out[1]
    assert r1["n_rel"] == 3
    assert r1["hits_at_k"] == 2
    assert r1["recall_at_k"] == round(2 / 3, 6)
    assert r1["mrr_at_k"] == 1.0
    dcg = 1.0 / math.log2(2) + 3.0 / math.log2(4)
    idcg = 3.0 / math.log2(2) + 1.0 / math.log2(3) + 1.0 / math.log2(4)
    assert r1["ndcg_at_k"] == round(dcg / idcg, 6)

    r2 = out[2]
    assert r2["n_rel"] == 0
    assert r2["hits_at_k"] == 0
    assert r2["recall_at_k"] is None
    assert r2["mrr_at_k"] == 0.0
    assert r2["ndcg_at_k"] is None


def test_rank_eval_k_cuts_both_run_and_ideal(spark):
    # 3 relevant docs but k=1: recall can reach at most 1/3, and the
    # ideal DCG is cut to one term, so a perfect first hit is ndcg=1.0.
    results = spark.createDataFrame(
        [(1, "a", 0.9), (1, "b", 0.8)], "query_id int, doc_id string, score double"
    )
    judgments = spark.createDataFrame(
        [(1, "a", 1), (1, "b", 1), (1, "c", 1)],
        "query_id int, doc_id string, grade int",
    )
    row = rank_eval(results, judgments, k=1).collect()[0]
    assert row["recall_at_k"] == round(1 / 3, 6)
    assert row["ndcg_at_k"] == 1.0
    assert row["mrr_at_k"] == 1.0


def test_rank_eval_tie_breaks_on_doc_id(spark):
    # equal scores: doc id ascending decides the rank deterministically
    results = spark.createDataFrame(
        [(1, "b", 0.5), (1, "a", 0.5)], "query_id int, doc_id string, score double"
    )
    judgments = spark.createDataFrame(
        [(1, "b", 1)], "query_id int, doc_id string, grade int"
    )
    row = rank_eval(results, judgments, k=2).collect()[0]
    # "a" outranks "b" on the tie, so the relevant doc sits at rank 2
    assert row["mrr_at_k"] == 0.5


def _vec(*xs):
    return [float(x) for x in xs]


def test_hard_negatives_excludes_self_and_positives(spark):
    corpus = spark.createDataFrame(
        [
            (0, _vec(1, 0)),
            (1, _vec(0.99, 0.1)),   # nearest to 0
            (2, _vec(0.9, 0.3)),
            (3, _vec(0.5, 0.8)),
            (4, _vec(0, 1)),
        ],
        "vec_id int, embedding array<double>",
    )
    queries = corpus.filter(F.col("vec_id") == 0)
    positives = spark.createDataFrame(
        [(0, 1)], "query_id int, positive_id int"
    )
    rows = embeddings.hard_negatives(corpus, queries, positives, k=2).collect()
    got = [(r["query_id"], r["neighbor_id"], r["rank"]) for r in rows]
    # vec 1 is the labelled positive (excluded), vec 0 is self (excluded):
    # the 2 hardest negatives are 2 then 3.
    assert got == [(0, 2, 1), (0, 3, 2)]


def test_hard_negatives_candidates_path_matches_exact(spark):
    corpus = spark.createDataFrame(
        [(i, _vec(math.cos(i / 7.0), math.sin(i / 7.0))) for i in range(30)],
        "vec_id int, embedding array<double>",
    )
    queries = corpus.filter(F.col("vec_id") < 3)
    positives = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 4)], "query_id int, positive_id int"
    )
    exact = embeddings.hard_negatives(corpus, queries, positives, k=5)
    cands = embeddings.cosine_topk(corpus, queries, k=29)
    via_cands = embeddings.hard_negatives(
        corpus, queries, positives, k=5, candidates=cands
    )
    key = lambda r: (r["query_id"], r["rank"])
    a = sorted(map(lambda r: r.asDict(), exact.collect()), key=lambda d: (d["query_id"], d["rank"]))
    b = sorted(map(lambda r: r.asDict(), via_cands.collect()), key=lambda d: (d["query_id"], d["rank"]))
    assert a == b


def test_normalize_text_nfc_controls_whitespace(spark):
    df = spark.createDataFrame(
        [
            (1, "Café\t du\x00monde  "),
            (2, "  already clean  "),
            (3, None),
        ],
        "doc_id int, text string",
    )
    out = {
        r["doc_id"]: r["norm_text"]
        for r in text.normalize_text(df, lowercase=True).collect()
    }
    assert out[1] == "café du monde"
    assert out[2] == "already clean"
    assert out[3] is None


def test_normalize_text_is_idempotent(spark):
    df = spark.createDataFrame(
        [(1, "Å  b\x1fc")], "doc_id int, text string"
    )
    once = text.normalize_text(df).select("doc_id", F.col("norm_text").alias("text"))
    twice = text.normalize_text(once)
    row = twice.collect()[0]
    assert row["text"] == row["norm_text"] == "Å b c"


def _rc(spark, pairs_a, pairs_b):
    from itemsjs_spark.ops.evaluation import rank_correlation

    a = spark.createDataFrame(pairs_a, "_id string, score double")
    b = spark.createDataFrame(pairs_b, "_id string, score double")
    return rank_correlation(a, b).collect()[0]


def test_rank_correlation_perfect_agreement(spark):
    a = [("x", 3.0), ("y", 2.0), ("z", 1.0)]
    r = _rc(spark, a, a)
    assert (r["n_common"], r["spearman_rho"]) == (3, 1.0)


def test_rank_correlation_perfect_reversal(spark):
    a = [("x", 3.0), ("y", 2.0), ("z", 1.0)]
    b = [("x", 1.0), ("y", 2.0), ("z", 3.0)]
    r = _rc(spark, a, b)
    assert (r["n_common"], r["spearman_rho"]) == (3, -1.0)


def test_rank_correlation_intersection_and_undefined(spark):
    # only the shared id survives the join -> n=1 -> rho undefined
    r = _rc(spark, [("x", 1.0), ("w", 5.0)], [("x", 9.0), ("v", 2.0)])
    assert r["n_common"] == 1 and r["spearman_rho"] is None
