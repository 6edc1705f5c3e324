"""End-to-end curation pipeline composition.

The individual curation operators (`ops/text.py`, `ops/dedup.py`) are
each oracle-proven in isolation; real training-data builds run them as
ONE chained pass — dedup first (never spend quality/PII compute on rows
a cheaper stage already kills), then language gate, then quality gate,
then PII scrub on the survivors. `curate` composes the same proven
expressions into a single DataFrame plan with full auditability: every
INPUT row comes back with its first-match drop reason (or NULL = kept),
so acceptance dashboards and per-stage loss accounting fall out of one
groupBy over the result.

Plan shape: one hash exchange for the exact-dedup canonical window
(partitioned by the text hash — duplicate groups are the unit of state,
bounded by duplication factor, never corpus size); every other stage is
map-only JVM expressions fused into the same whole-stage-codegen span.
No second corpus pass, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from itemsjs_spark.ops.text import language_id, pii_scrub, quality_score


def curate(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_threshold: float = 0.03,
    lang_keep: str = "en",
    min_quality: float = 0.5,
) -> DataFrame:
    """Chained curation pass: exact dedup (keep the min-id canonical per
    text hash) → language-ID gate (stopword-ratio heuristic, keep
    ``lang_keep``) → quality gate (``quality_score >= min_quality``) →
    PII scrub of the survivors. Returns one row per input row:
    ``(id, drop_reason, lang_pred, quality, scrubbed_text)`` where
    ``drop_reason`` is the FIRST failing stage ('exact_dup' | 'lang' |
    'quality') or NULL for kept rows, and ``scrubbed_text`` is non-NULL
    only for kept rows."""
    w = Window.partitionBy("__h")
    s = (
        df.withColumn("__h", F.md5(F.col(text_col)))
        .withColumn("__canon", F.min(id_col).over(w))
    )
    s = language_id(s, text_col, lang_threshold)
    s = quality_score(s, text_col)
    reason = (
        F.when(F.col(id_col) != F.col("__canon"), F.lit("exact_dup"))
        .when(F.col("lang_pred") != F.lit(lang_keep), F.lit("lang"))
        .when(F.col("quality") < F.lit(float(min_quality)), F.lit("quality"))
    )
    s = s.withColumn("drop_reason", reason)
    s = pii_scrub(s, text_col)
    return s.select(
        id_col,
        "drop_reason",
        "lang_pred",
        "quality",
        F.when(F.col("drop_reason").isNull(), F.col("scrubbed_text")).alias(
            "scrubbed_text"
        ),
    )


def datacard(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim_cols: tuple = ("lang", "source"),
) -> DataFrame:
    """One-row corpus data card: the summary block a dataset release
    ships with (docs, tokens, chars, exact-dup rate, dimension
    cardinalities, average length). Everything is exact integer
    aggregation except two final divisions on the 6-decimal grid.

    Plan shape: ONE aggregate over the corpus; the distinct counts ride
    Spark's expand-based multi-distinct in the same pass — no second
    scan, no window, no Python. The output is a single row however
    large the corpus."""
    n_toks = F.size(F.split(F.col(text_col), " ")).cast("long")
    aggs = [
        F.count("*").cast("long").alias("n_docs"),
        F.sum(n_toks).alias("total_toks"),
        F.sum(F.length(text_col)).cast("long").alias("total_chars"),
        F.countDistinct(F.md5(F.col(text_col))).cast("long").alias(
            "distinct_texts"
        ),
    ]
    for c in dim_cols:
        aggs.append(F.countDistinct(F.col(c)).cast("long").alias(f"n_{c}"))
    out = df.agg(*aggs)
    return out.select(
        "*",
        (F.col("n_docs") - F.col("distinct_texts"))
        .cast("long")
        .alias("dup_docs"),
        F.round(
            (F.col("n_docs") - F.col("distinct_texts")).cast("double")
            / F.col("n_docs").cast("double"),
            6,
        ).alias("dup_ratio"),
        F.round(
            F.col("total_toks").cast("double") / F.col("n_docs").cast("double"),
            6,
        ).alias("avg_toks"),
    )
