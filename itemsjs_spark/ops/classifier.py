"""Distributed logistic regression — the learned quality-filter step of
an LLM data pipeline (fastText-style classifiers that score documents
as keep/drop are standard practice; this is the same shape with
relational features).

Training is batch gradient descent with the ``kmeans_fit`` execution
pattern: the weight vector lives driver-side (it is tiny), each
iteration broadcasts the weights as column literals and runs ONE
map-side-combined whole-table aggregate to produce the gradient — no
shuffle of the corpus, no per-row Python, cost per iteration = one scan
at any corpus size. Every decision input rounds to 6 decimals (the
repo-wide grid), so a SQL engine unrolling the same iterations as plain
CTE stages reproduces the weights and predictions exactly (the DuckDB
driver oracle does exactly that).

Gradient of the mean log-loss for weights w over rows (x, y):
    p   = sigmoid(w · x + b)
    g_j = avg((p - y) * x_j)      g_b = avg(p - y)
    w'  = w - lr * g              b'  = b - lr * g_b
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _margin(feature_cols: Sequence[str], weights: Sequence[float], bias: float):
    z = F.lit(float(bias))
    for c, w in zip(feature_cols, weights):
        z = z + F.col(c).cast("double") * F.lit(float(w))
    return F.round(z, 6)


def _prob(feature_cols: Sequence[str], weights: Sequence[float], bias: float):
    # sigmoid on the rounded margin, itself rounded: both engines
    # evaluate exp() on identical float64 inputs
    z = _margin(feature_cols, weights, bias)
    return F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6)


def logreg_fit(
    df: DataFrame,
    feature_cols: Sequence[str],
    label_col: str,
    iters: int = 3,
    lr: float = 1.0,
) -> Tuple[List[float], float]:
    """Fit (weights, bias) by ``iters`` full-batch GD steps from zero
    init. One whole-table aggregate per step; only len(features)+1
    doubles ever reach the driver."""
    weights = [0.0] * len(feature_cols)
    bias = 0.0
    # every GD step re-reads the feature frame: pin the slim
    # (features, label) projection once so iterations 2..n scan the
    # cache instead of re-deriving features from the source table
    feats = df.select(
        *[F.col(c).cast("double").alias(c) for c in feature_cols],
        F.col(label_col).cast("double").alias("__y"),
    ).persist()
    try:
        for _ in range(int(iters)):
            p = _prob(feature_cols, weights, bias)
            err = p - F.col("__y")
            aggs = [F.round(F.avg(err), 6).alias("__gb")] + [
                F.round(F.avg(err * F.col(c)), 6).alias(f"__g{i}")
                for i, c in enumerate(feature_cols)
            ]
            row = feats.agg(*aggs).collect()[0]
            bias = round(bias - lr * row["__gb"], 6)
            weights = [
                round(w - lr * row[f"__g{i}"], 6)
                for i, w in enumerate(weights)
            ]
    finally:
        feats.unpersist()
    return weights, bias


def logreg_score(
    df: DataFrame,
    feature_cols: Sequence[str],
    weights: Sequence[float],
    bias: float,
    threshold: float = 0.5,
) -> DataFrame:
    """Attach the model's probability (``lr_score``) and the thresholded
    keep/drop decision (``lr_keep``) — a pure map-only projection."""
    p = _prob(feature_cols, weights, bias)
    return df.withColumn("lr_score", p).withColumn(
        "lr_keep", (p >= F.lit(float(threshold))).cast("int")
    )


def logreg_sql(
    feature_exprs: Dict[str, str],
    label_expr: str,
    source: str,
    iters: int = 3,
    lr: float = 1.0,
    threshold: float = 0.5,
) -> str:
    """The SAME training loop unrolled as plain SQL CTE stages (one
    feature CTE + one gradient/weights CTE per iteration) — the oracle
    generator for ``logreg_fit``+``logreg_score``. ``feature_exprs``
    maps feature name -> SQL expression over ``source``; weights chain
    through scalar CTEs exactly as the driver chains them through
    ``collect()`` rounds."""
    feats = list(feature_exprs)
    cols = ",\n       ".join(
        f"({e}) AS {n}" for n, e in feature_exprs.items()
    )
    parts = [
        f"f AS (SELECT *, {cols}, ({label_expr}) AS __y FROM {source})",
        "w0 AS (SELECT "
        + ", ".join(["0.0 AS b"] + [f"0.0 AS w{i}" for i in range(len(feats))])
        + ")",
    ]
    for r in range(int(iters)):
        z = " + ".join(
            [f"w{r}.b"] + [f"f.{n} * w{r}.w{i}" for i, n in enumerate(feats)]
        )
        p = f"round(1.0 / (1.0 + exp(-round({z}, 6))), 6)"
        grads = ", ".join(
            [f"round(avg({p} - f.__y), 6) AS gb"]
            + [
                f"round(avg(({p} - f.__y) * f.{n}), 6) AS g{i}"
                for i, n in enumerate(feats)
            ]
        )
        parts.append(f"g{r} AS (SELECT {grads} FROM f, w{r})")
        upd = ", ".join(
            [f"round(w{r}.b - {lr} * g{r}.gb, 6) AS b"]
            + [
                f"round(w{r}.w{i} - {lr} * g{r}.g{i}, 6) AS w{i}"
                for i in range(len(feats))
            ]
        )
        parts.append(f"w{r + 1} AS (SELECT {upd} FROM w{r}, g{r})")
    n = int(iters)
    zf = " + ".join(
        [f"w{n}.b"] + [f"f.{nm} * w{n}.w{i}" for i, nm in enumerate(feats)]
    )
    pf = f"round(1.0 / (1.0 + exp(-round({zf}, 6))), 6)"
    return (
        "WITH " + ",\n".join(parts) + f"""
SELECT f.doc_id AS doc_id, {pf} AS lr_score,
       CASE WHEN {pf} >= {float(threshold)} THEN 1 ELSE 0 END AS lr_keep
FROM f, w{n}"""
    )
