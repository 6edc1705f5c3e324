"""Deterministic synthetic transcript corpus (BASELINE.json input_hint).

Schema: (conv_id string, turn_idx int, role string, text string,
tool string, ts timestamp) — the authoritative engine input shape
(FIXTURES.md §F1).

Scale design: every column is a pure JVM expression of the row id
(xxhash64-seeded), so generation is embarrassingly parallel — no Python
in the loop, no shuffle except the per-conversation turn numbering
(window partitioned by conv_id, which is exactly the partitioning the
engine wants downstream anyway). Conversation sizes follow a power law
(hot conversations) to exercise the skew paths; every ~97-id block
plants exact and near duplicate texts to exercise dedup operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# 64-word vocabulary: content words + english stopwords (so the lunr
# stopword filter and tf denominators are exercised) + tool-ish terms.
VOCAB = [
    "spark", "join", "shuffle", "partition", "broadcast", "skew", "salt",
    "index", "posting", "merge", "sort", "scan", "filter", "facet",
    "bucket", "count", "score", "rank", "query", "search", "token",
    "stem", "prefix", "trie", "bitmap", "varint", "delta", "block",
    "checkpoint", "lineage", "resume", "executor", "driver", "cluster",
    "table", "iceberg", "parquet", "snapshot", "commit", "rollback",
    "agent", "user", "tool", "call", "result", "error", "retry",
    "timeout", "plan", "stage", "task", "batch", "stream", "window",
    "the", "a", "and", "of", "to", "in", "is", "that", "it", "for",
]

TOOLS = ["bash", "read", "write", "grep", "search", "browser", "sql"]
ROLES_SQL = (
    "CASE WHEN __u2 < 0.42 THEN 'user' WHEN __u2 < 0.88 THEN 'assistant' "
    "WHEN __u2 < 0.94 THEN 'system' ELSE 'tool' END"
)


def transcripts_df(
    spark: SparkSession,
    n_turns: int = 2000,
    n_convs: int = 200,
    seed: int = 42,
    num_partitions: int | None = None,
) -> DataFrame:
    """Deterministic transcripts table with ``n_turns`` rows.

    The same (n_turns, n_convs, seed) always yields the same rows, no
    matter the parallelism — every value derives from the row id.
    """
    vocab_sql = "array(" + ",".join(f"'{w}'" for w in VOCAB) + ")"
    tools_sql = "array(" + ",".join(f"'{t}'" for t in TOOLS) + ")"

    df = spark.range(0, n_turns, 1, num_partitions or spark.sparkContext.defaultParallelism)
    u = lambda salt: (  # noqa: E731 — uniform [0,1) from (id, salt, seed)
        (F.pmod(F.xxhash64(F.col("id"), F.lit(salt), F.lit(seed)), F.lit(100000))
         / F.lit(100000.0))
    )
    # power-law conversation assignment → hot conversations (skew)
    df = df.withColumn("__u1", u(1)).withColumn("__u2", u(2))
    df = df.withColumn(
        "conv_idx",
        F.least(
            F.floor(F.lit(n_convs) * F.pow(F.col("__u1"), F.lit(2.5))),
            F.lit(n_convs - 1),
        ).cast("int"),
    )
    df = df.withColumn("conv_id", F.concat(F.lit("c"), F.lpad(F.col("conv_idx").cast("string"), 6, "0")))
    df = df.withColumn("role", F.expr(ROLES_SQL))

    # text: L words, each picked by a hash of (text_seed, position).
    # Duplicate planting: ids with id%97 in {1,2} reuse the block base id
    # as text_seed (exact dup of id%97==0's text when lengths agree; the
    # +1-word variant is a near dup).
    df = df.withColumn("__base", (F.col("id") - F.pmod(F.col("id"), F.lit(97))))
    df = df.withColumn(
        "__tseed",
        F.when(F.pmod(F.col("id"), F.lit(97)) < 3, F.col("__base")).otherwise(F.col("id")),
    )
    df = df.withColumn(
        "__len",
        (F.lit(6) + F.pmod(F.xxhash64(F.col("__tseed"), F.lit(3), F.lit(seed)), F.lit(35))).cast("int"),
    )
    # near-dup rows (id%97==2) get one extra trailing word
    df = df.withColumn(
        "__len", F.col("__len") + F.when(F.pmod(F.col("id"), F.lit(97)) == 2, 1).otherwise(0)
    )
    df = df.withColumn(
        "text",
        F.expr(
            f"concat_ws(' ', transform(sequence(1, __len), "
            f"j -> element_at({vocab_sql}, cast(pmod(xxhash64(__tseed, j, {seed}), {len(VOCAB)}) + 1 as int))))"
        ),
    )
    df = df.withColumn(
        "tool",
        F.when(
            F.col("role") == "tool",
            F.expr(
                f"element_at({tools_sql}, cast(pmod(xxhash64(id, 4, {seed}), {len(TOOLS)}) + 1 as int))"
            ),
        ),
    )
    df = df.withColumn(
        "ts", F.timestamp_seconds(F.lit(1704067200) + F.col("id") * F.lit(37))
    )
    # per-conversation turn numbering: parallel across conversations
    w = Window.partitionBy("conv_id").orderBy("id")
    df = df.withColumn("turn_idx", (F.row_number().over(w) - 1).cast("int"))
    return df.select("conv_id", "turn_idx", "role", "text", "tool", "ts")
