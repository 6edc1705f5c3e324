"""Text-analysis operators for large-scale training-data pipelines.

All pure DataFrame expressions (JVM-side, whole-stage codegen) — no
Python in the hot path. Each operator returns (input columns +) derived
columns and is verified against an independent DuckDB oracle through
``__spark_entry__`` at sf=0.01.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..analysis.lunr_analysis import STOP_WORDS

def ws_tokens(text: Column) -> Column:
    return F.split(text, " ")


def stopword_ratio(text: Column, stoplist: Optional[Sequence[str]] = None) -> Column:
    """Fraction of whitespace tokens in the (english) stopword list —
    the backbone of the n-gram language-ID heuristic. Built from the
    passed Column (works for any column expression, not just `text`)."""
    stops = sorted(w for w in (stoplist or STOP_WORDS) if w)
    toks = ws_tokens(text)
    stop_arr = F.array(*[F.lit(w) for w in stops])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    return hits.cast("double") / F.size(toks)


def language_id(
    df: DataFrame, text_col: str = "text", threshold: float = 0.03
) -> DataFrame:
    ratio = F.round(stopword_ratio(F.col(text_col)), 6)
    return df.withColumn("stopword_ratio", ratio).withColumn(
        "lang_pred",
        F.when(F.col("stopword_ratio") >= threshold, F.lit("en")).otherwise(
            F.lit("und")
        ),
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length/diversity quality heuristic: 0.5·distinct-token-ratio +
    0.5·min(n_tokens/50, 1)."""
    toks = ws_tokens(F.col(text_col))
    nt = F.size(toks)
    nd = F.size(F.array_distinct(toks))
    q = F.round(
        0.5 * (nd.cast("double") / nt)
        + 0.5 * F.least(nt.cast("double") / 50.0, F.lit(1.0)),
        6,
    )
    return (
        df.withColumn("n_tokens", nt.cast("long"))
        .withColumn("n_distinct", nd.cast("long"))
        .withColumn("quality", q)
    )


def token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count, char count, and a BPE-ish estimate
    (chars/4 — the classic byte-pair heuristic for english text)."""
    return (
        df.withColumn("ws_tokens", F.size(ws_tokens(F.col(text_col))).cast("long"))
        .withColumn("chars", F.length(text_col).cast("long"))
        .withColumn("bpe_est", F.ceil(F.length(text_col) / 4.0).cast("long"))
    )


def unigram_logprob(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """Perplexity proxy for quality filtering: per-doc mean negative log
    probability of its tokens under the CORPUS unigram model (the
    classic cheap stand-in for LM perplexity — boilerplate and natural
    text score low, gibberish/rare-token soup scores high).

    Plan shape: one explode, one token-frequency aggregate (map-side
    combined), one equi-join token→frequency, one per-doc aggregate.
    No driver-side state; the token model never leaves the cluster."""
    tok = df.select(F.col(id_col), F.explode(ws_tokens(F.col(text_col))).alias("tok"))
    freq = tok.groupBy("tok").agg(F.count("*").alias("cnt"))
    # corpus size derived INSIDE the plan (Σ cnt over the small frequency
    # table, broadcast as one row) — no separate driver count() job, and
    # the exploded tokens are scanned only where the plan needs them
    total = freq.agg(F.sum("cnt").cast("double").alias("__tot"))
    scored = tok.join(freq, "tok").crossJoin(F.broadcast(total)).select(
        id_col,
        (-F.log(F.col("cnt").cast("double") / F.col("__tot"))).alias("nll"),
    )
    return scored.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_tokens"),
        F.round(F.avg("nll"), 6).alias("avg_neg_logprob"),
    )


def charngram_profile_fit(
    df: DataFrame, id_col: str, text_col: str = "text", n: int = 3
) -> DataFrame:
    """Domain-fit score: cosine similarity between a document's char
    n-gram count vector and the corpus-wide profile — low-fit documents
    are encoding junk / off-domain content (the char-n-gram analog of
    the langid profile method, with the corpus itself as the profile).

    All sparse-vector algebra stays relational: the dot product is an
    equi-join on the n-gram, norms are aggregates."""
    grams = F.expr(
        f"CASE WHEN length({text_col}) >= {n} THEN "
        f"transform(sequence(1, length({text_col}) - {n - 1}), "
        f"i -> substring({text_col}, i, {n})) ELSE array() END"
    )
    g = df.select(F.col(id_col), F.explode(grams).alias("g"))
    dvec = g.groupBy(id_col, "g").agg(F.count("*").alias("c"))
    profile = dvec.groupBy("g").agg(F.sum("c").alias("cf"))
    cnorm = float(
        profile.agg(F.sqrt(F.sum(F.col("cf") * F.col("cf")))).collect()[0][0]
    )
    return (
        dvec.join(profile, "g")
        .groupBy(id_col)
        .agg(
            F.sum(F.col("c") * F.col("cf")).alias("__dot"),
            F.sqrt(F.sum(F.col("c") * F.col("c"))).alias("__dn"),
        )
        .select(
            id_col,
            F.round(
                F.col("__dot") / (F.col("__dn") * F.lit(cnorm)), 6
            ).alias("profile_fit"),
        )
    )


def fingerprint(df: DataFrame, text_col: str = "text", window: int = 8) -> DataFrame:
    """Winnowing-style document fingerprint: min hash over all
    ``window``-char shingles (rolling-hash family; md5 keeps it portable
    across engines for oracle checks)."""
    fp = F.expr(
        f"array_min(transform(sequence(1, greatest(length({text_col}) - {window - 1}, 1)), "
        f"i -> md5(substring({text_col}, i, {window}))))"
    )
    return df.withColumn("fingerprint", fp)
