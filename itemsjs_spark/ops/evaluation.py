"""Retrieval rank-evaluation metrics (recall@k, MRR@k, nDCG@k).

A training-data / retrieval pipeline needs to score its own candidate
generators (ANN indexes, hybrid fusion, rerankers) against judgment
sets.  ``rank_eval`` computes the standard ranked-retrieval metrics as
pure JVM DataFrame work:

* one window over the run (rank within query, deterministic tie-break
  by document id),
* one window over the judgments (the *ideal* ranking for nDCG),
* two map-side-combined groupBys + a broadcastable join.

Per-query state is bounded by that query's result list (≤k) and its
judged set — nothing corpus-sized is ever grouped, so the same plan
holds when the run table has 10^9 (query, doc) rows.  All emitted
metrics round to 6 decimals (the repo-wide decision grid shared with
the DuckDB oracles).

Metric definitions (binary relevance = grade > 0; graded gain =
2^grade - 1, the web-search convention):

* ``recall_at_k``  = |relevant ∩ top-k| / |relevant|          (NULL when the query has no judged-relevant docs)
* ``mrr_at_k``     = 1 / rank of first relevant in top-k      (0.0 when none retrieved)
* ``ndcg_at_k``    = DCG@k / IDCG@k with DCG = Σ (2^grade - 1) / log2(rank + 1)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rank_eval(
    results: DataFrame,
    judgments: DataFrame,
    k: int = 10,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    score_col: str = "score",
    grade_col: str = "grade",
    judgments_query_col: str = "query_id",
    judgments_doc_col: str = "doc_id",
) -> DataFrame:
    """Score a retrieval run against graded judgments.

    ``results``: one row per (query, candidate) with a relevance score
    (higher = better); its columns are named by ``query_col`` /
    ``doc_col`` / ``score_col``.  ``judgments``: one row per judged
    (query, doc) with an integer ``grade`` (0 = not relevant); its key
    columns are named by ``judgments_query_col`` / ``judgments_doc_col``.
    Returns one row per query appearing in ``results``:
    ``(query_id, n_rel, hits_at_k, recall_at_k, mrr_at_k, ndcg_at_k)``.
    """
    query_col_out = "query_id"
    q = F.col(query_col_out)
    gain = F.pow(F.lit(2.0), F.col(grade_col).cast("double")) - F.lit(1.0)

    # canonicalize both inputs to (query_id, doc_id[, score/grade])
    results = results.select(
        F.col(query_col).alias("query_id"),
        F.col(doc_col).alias("doc_id"),
        F.col(score_col).alias("__score"),
    )
    judgments = judgments.select(
        F.col(judgments_query_col).alias("query_id"),
        F.col(judgments_doc_col).alias("doc_id"),
        F.col(grade_col),
    )
    query_col, doc_col, score_col = "query_id", "doc_id", "__score"

    run_w = Window.partitionBy(query_col).orderBy(
        F.col(score_col).desc(), F.col(doc_col).asc()
    )
    ranked = (
        results.withColumn("rank", F.row_number().over(run_w))
        .filter(F.col("rank") <= k)
    )

    rel = judgments.filter(F.col(grade_col) > 0)

    hit = ranked.join(rel, [query_col, doc_col], "left").select(
        query_col,
        "rank",
        F.coalesce(F.col(grade_col), F.lit(0)).alias("grade"),
    )
    got = hit.groupBy(query_col).agg(
        F.sum((F.col("grade") > 0).cast("long")).alias("hits_at_k"),
        F.min(F.when(F.col("grade") > 0, F.col("rank"))).alias("first_rel"),
        F.sum(
            F.when(
                F.col("grade") > 0,
                (F.pow(F.lit(2.0), F.col("grade").cast("double")) - 1.0)
                / F.log2(F.col("rank").cast("double") + 1.0),
            ).otherwise(F.lit(0.0))
        ).alias("dcg"),
    )

    ideal_w = Window.partitionBy(query_col).orderBy(
        F.col(grade_col).desc(), F.col(doc_col).asc()
    )
    ideal = (
        rel.withColumn("irank", F.row_number().over(ideal_w))
        .groupBy(query_col)
        .agg(
            F.count(F.lit(1)).alias("n_rel"),
            F.sum(
                F.when(
                    F.col("irank") <= k,
                    gain / F.log2(F.col("irank").cast("double") + 1.0),
                ).otherwise(F.lit(0.0))
            ).alias("idcg"),
        )
    )

    out = (
        got.join(ideal, query_col, "left")
        .select(
            q.alias("query_id"),
            F.coalesce(F.col("n_rel"), F.lit(0)).cast("long").alias("n_rel"),
            F.col("hits_at_k").cast("long").alias("hits_at_k"),
            F.when(
                F.col("n_rel") > 0,
                F.round(F.col("hits_at_k") / F.col("n_rel"), 6),
            ).alias("recall_at_k"),
            F.round(
                F.coalesce(1.0 / F.col("first_rel"), F.lit(0.0)), 6
            ).alias("mrr_at_k"),
            F.when(
                F.col("idcg") > 0, F.round(F.col("dcg") / F.col("idcg"), 6)
            ).alias("ndcg_at_k"),
        )
    )
    return out


def rank_correlation(
    a: DataFrame,
    b: DataFrame,
    id_col: str = "_id",
    score_a: str = "score",
    score_b: str = "score",
) -> DataFrame:
    """Spearman rank correlation between two rankers over their COMMON
    candidates — the ranker-agreement diagnostic (how much did a boost /
    fusion / model swap rearrange the ordering?). Returns one row
    ``(n_common, spearman_rho)`` with
    ``rho = 1 − 6·Σd² / (n·(n²−1))`` over ranks re-assigned within the
    intersection (score desc, id-string asc tie-break — the engine-wide
    cursor convention), rounded to 6 decimals. ``n_common < 2`` yields a
    NULL rho (correlation is undefined).

    Scale shape: both inputs are top-N candidate lists bounded by their
    producers (WAND top-k, ANN rerank, boosted top-k), so the join and
    the two rank windows run over ≤N rows — single-partition windows
    over a deliberately bounded set, never the corpus."""
    ra = a.select(
        F.col(id_col).alias("_id"), F.col(score_a).alias("__sa")
    )
    rb = b.select(
        F.col(id_col).alias("_id"), F.col(score_b).alias("__sb")
    )
    j = ra.join(rb, "_id")
    wa = Window.orderBy(
        F.col("__sa").desc(), F.col("_id").cast("string").asc()
    )
    wb = Window.orderBy(
        F.col("__sb").desc(), F.col("_id").cast("string").asc()
    )
    ranked = j.select(
        F.row_number().over(wa).alias("ra"),
        F.row_number().over(wb).alias("rb"),
    )
    d = (F.col("ra") - F.col("rb")).cast("long")
    agg = ranked.agg(
        F.count("*").cast("long").alias("n_common"),
        F.coalesce(F.sum(d * d), F.lit(0)).cast("long").alias("__d2"),
    )
    n = F.col("n_common").cast("double")
    rho = F.when(
        F.col("n_common") >= 2,
        F.round(
            F.lit(1.0)
            - F.lit(6.0) * F.col("__d2").cast("double")
            / (n * (n * n - F.lit(1.0))),
            6,
        ),
    )
    return agg.select("n_common", rho.alias("spearman_rho"))
