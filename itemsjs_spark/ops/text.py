"""Text-analysis operators for large-scale training-data pipelines.

All pure DataFrame expressions (JVM-side, whole-stage codegen) — no
Python in the hot path. Each operator returns (input columns +) derived
columns and is verified against an independent DuckDB oracle through
``__spark_entry__`` at sf=0.01.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, Window
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
    # persisted: the frequency table feeds two branches (Σcnt broadcast
    # + the scoring join); without the cache each branch re-runs the
    # corpus explode — dimension-sized (vocabulary), never corpus-sized
    freq = tok.groupBy("tok").agg(F.count("*").alias("cnt")).persist()
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


def bigram_logprob(
    df: DataFrame, id_col: str, text_col: str = "text", k: float = 0.5
) -> DataFrame:
    """Stronger perplexity proxy: per-doc mean negative log probability
    of its token BIGRAMS under the corpus bigram model with add-k
    smoothing — the honest relational analog of the KenLM-style
    perplexity filters (CCNet) that rank documents by LM fluency.
    ``p(w2|w1) = (c(w1,w2) + k) / (c(w1) + k·V)`` with V = corpus
    unigram vocabulary size.

    Plan shape: one bigram explode (JVM transform/sequence — no
    Python), two map-side-combined count aggregates (bigram + unigram
    context), a 1-row vocabulary size broadcast, one join back, one
    per-doc aggregate. Shuffles are keyed on (w1, w2) / w1 — hot
    contexts ("the") stay pre-aggregated counts, never row explosions.
    Docs with fewer than 2 tokens emit n_bigrams = 0, score NULL."""
    toks = ws_tokens(F.col(text_col))
    big = (
        df.select(F.col(id_col), toks.alias("__t"))
        .filter(F.size("__t") >= 2)
        .select(
            id_col,
            F.explode(
                F.expr(
                    "transform(sequence(1, size(__t) - 1), "
                    "i -> struct(__t[i - 1] AS w1, __t[i] AS w2))"
                )
            ).alias("bg"),
        )
        .select(id_col, F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    )
    c2 = big.groupBy("w1", "w2").agg(F.count("*").alias("c2"))
    tok = df.select(F.explode(toks).alias("tok"))
    # persisted: c1 feeds the vocabulary-size broadcast AND the scoring
    # join — the cache stops the second corpus-explode lineage run
    # (dimension-sized: unigram vocabulary)
    c1 = tok.groupBy("tok").agg(F.count("*").alias("c1")).persist()
    vocab = c1.agg(F.count("*").cast("double").alias("__v"))
    kk = float(k)
    scored = (
        big.join(c2, ["w1", "w2"])
        .join(c1.withColumnRenamed("tok", "w1"), "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            id_col,
            (
                -F.log(
                    (F.col("c2").cast("double") + F.lit(kk))
                    / (F.col("c1").cast("double") + F.lit(kk) * F.col("__v"))
                )
            ).alias("nll"),
        )
    )
    per_doc = scored.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_bigrams"),
        F.round(F.avg("nll"), 6).alias("avg_neg_logprob"),
    )
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
            F.col("avg_neg_logprob"),
        )
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
    # corpus norm derived INSIDE the plan (one-row aggregate over the
    # small profile table, broadcast) — no separate driver collect()
    # job per call, exactly the unigram_logprob pattern
    cnorm = profile.agg(
        F.sqrt(F.sum(F.col("cf") * F.col("cf"))).alias("__cn")
    )
    return (
        dvec.join(profile, "g")
        .groupBy(id_col)
        .agg(
            F.sum(F.col("c") * F.col("cf")).alias("__dot"),
            F.sqrt(F.sum(F.col("c") * F.col("c"))).alias("__dn"),
        )
        .crossJoin(F.broadcast(cnorm))
        .select(
            id_col,
            F.round(
                F.col("__dot") / (F.col("__dn") * F.col("__cn")), 6
            ).alias("profile_fit"),
        )
    )


# ---------------------------------------------------------------------------
# multi-language char-gram language ID
# ---------------------------------------------------------------------------

# deterministic per-language character-gram profiles (function-word and
# affix grams; weights hand-set). The mechanism is the standard char-
# n-gram profile method (Cavnar & Trenkle 1994) — the profile CONTENT is
# a pluggable dict, these defaults just make the operator usable out of
# the box. Grams must be quote-free: the same literal is inlined into
# the Spark expression and the DuckDB oracle SQL.
CHARGRAM_PROFILES = {
    "de": {" der ": 1.0, " die ": 1.0, " und ": 1.0, " ein ": 1.0, " nicht ": 1.0, "sch": 0.5},
    "en": {" the ": 1.0, " and ": 1.0, " of ": 1.0, " to ": 1.0, " is ": 0.5, "ing ": 0.5},
    "es": {" el ": 1.0, " los ": 1.0, " una ": 1.0, " que ": 1.0, "cion": 1.0, " y ": 0.5},
    "fr": {" le ": 1.0, " les ": 1.0, " une ": 1.0, " est ": 1.0, " dans ": 1.0, " et ": 0.5},
}


def learn_chargram_profiles(
    df: DataFrame,
    text_col: str = "text",
    label_col: str = "lang",
    grams_per_lang: int = 8,
    gram_len: int = 4,
    min_count: int = 2,
) -> dict:
    """Learn per-language char-gram profiles from a LABELED sample —
    the data-derived replacement for the hand-set
    ``CHARGRAM_PROFILES`` (same output shape; plug straight into
    ``langid_chargram(profiles=...)``).

    One distributed pass: normalize (lowercase, non-letters → space),
    explode every ``gram_len``-gram, aggregate (lang, gram) counts
    map-side-combined, score each gram by in-language purity ×
    log-frequency, keep the top ``grams_per_lang`` per language (window
    over the aggregated gram table, partitioned by language — the
    post-agg table is |distinct grams| sized, and only
    n_langs × grams_per_lang rows reach the driver). Weights are
    normalized to max 1.0 and rounded so the learned profile inlines
    into the same SQL formula text on both engines; grams are
    restricted to ``[a-z ]`` so the literal is always quote-safe.

    Scoring normalization contract: profiles are learned over
    lowercased text, so score a lowercased column (or lowercase
    upstream) for faithful matches — the hand-set defaults have the
    same caveat for capitalized function words."""
    norm = F.concat(
        F.lit(" "),
        F.trim(F.regexp_replace(F.lower(F.col(text_col)), "[^a-z]+", " ")),
        F.lit(" "),
    )
    base = df.filter(F.col(label_col).isNotNull()).select(
        F.col(label_col).alias("lang"), norm.alias("t")
    )
    grams = base.select(
        "lang",
        F.explode(
            F.expr(
                f"transform(sequence(1, greatest(length(t) - {gram_len - 1},"
                f" 0)), i -> substring(t, i, {gram_len}))"
            )
        ).alias("gram"),
    ).filter(
        (F.length("gram") == gram_len) & F.col("gram").rlike("^[a-z ]+$")
    )
    counts = grams.groupBy("lang", "gram").agg(F.count("*").alias("c"))
    tot = counts.groupBy("gram").agg(F.sum("c").alias("ct"))
    scored = (
        counts.filter(F.col("c") >= min_count)
        .join(tot, "gram")
        .withColumn(
            "w",
            # purity (share owned by this lang) × log in-language evidence,
            # rounded to 9 decimals BEFORE ranking so the top-N selection
            # is reproducible across engines whose ln() differs in the
            # last ulp (the DuckDB oracle re-derives this ranking)
            F.round(
                (F.col("c") / F.col("ct")) * F.log1p(F.col("c")), 9
            ),
        )
    )
    from pyspark.sql import Window

    wn = Window.partitionBy("lang").orderBy(F.col("w").desc(), F.col("gram"))
    top = (
        scored.withColumn("r", F.row_number().over(wn))
        .filter(F.col("r") <= grams_per_lang)
        .select("lang", "gram", "w")
        .collect()
    )
    profiles: dict = {}
    for r in top:
        profiles.setdefault(r["lang"], {})[r["gram"]] = float(r["w"])
    for lang, p in profiles.items():
        mx = max(p.values()) or 1.0
        # half-up, not Python's banker's round: matches SQL round()
        # semantics (Spark HALF_UP / DuckDB half-away) so an oracle that
        # re-derives the normalization lands on the same 3-decimal weight
        profiles[lang] = {
            g: math.floor(w / mx * 1000.0 + 0.5) / 1000.0 for g, w in p.items()
        }
    return profiles


def chargram_score_sql(text_ref: str, profile: dict) -> str:
    """Weighted non-overlapping gram-count score as a SQL expression
    valid in BOTH Spark SQL and DuckDB (length/replace arithmetic only)
    — the engine and the oracle evaluate the exact same formula text."""
    terms = [
        f"{float(w)} * ((length({text_ref}) - "
        f"length(replace({text_ref}, '{g}', ''))) / {float(len(g))})"
        for g, w in profile.items()
    ]
    return " + ".join(terms)


def langid_chargram(
    df: DataFrame, text_col: str = "text", profiles: Optional[dict] = None
) -> DataFrame:
    """Multi-language ID: score the text against each language's char-
    gram profile, predict the argmax (ties break toward the first
    language in code order). Pure length/replace JVM expressions — no
    tokenizer, no Python, linear in text size; profiles are literals in
    the plan, so the whole thing stays inside whole-stage codegen."""
    profiles = profiles or CHARGRAM_PROFILES
    langs = sorted(profiles)
    out = df
    for lang in langs:
        out = out.withColumn(
            f"score_{lang}",
            F.expr(
                f"round(cast({chargram_score_sql(text_col, profiles[lang])} "
                "as double), 6)"
            ),
        )
    best = F.greatest(*[F.col(f"score_{lang}") for lang in langs])
    pred = F.when(F.col(f"score_{langs[0]}") == best, F.lit(langs[0]))
    for lang in langs[1:]:
        pred = pred.when(F.col(f"score_{lang}") == best, F.lit(lang))
    return out.withColumn("lang_pred", pred).withColumn("lang_score", best)


# ---------------------------------------------------------------------------
# corpus-level repeated-chunk removal (C4-style line dedup)
# ---------------------------------------------------------------------------

def chunk_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    window: int = 3,
    min_docs: int = 3,
) -> DataFrame:
    """Boilerplate removal à la C4/RefinedWeb line-dedup: split each
    document into fixed ``window``-token chunks, drop every chunk that
    occurs in ≥ ``min_docs`` DISTINCT documents, and reassemble the
    remaining chunks in order. Returns (id, n_chunks, n_removed,
    clean_text).

    Plan shape: one explode, one chunk-frequency aggregate (map-side
    combined), one anti-join against the (small) repeated-chunk set,
    one per-doc ordered reassembly — no driver state, no corpus
    rescans; the repeated-chunk set is the only broadcast-sized side."""
    chunk_arr = (
        f"transform(sequence(1, cast(ceil(size(split({text_col}, ' ')) "
        f"/ {window}.0) as int)), i -> array_join(slice(split({text_col}, ' '), "
        f"(i-1)*{window}+1, {window}), ' '))"
    )
    chunks = df.select(
        F.col(id_col), F.posexplode(F.expr(chunk_arr)).alias("pos", "chunk")
    )
    repeated = (
        chunks.groupBy("chunk")
        .agg(F.countDistinct(id_col).alias("nd"))
        .filter(F.col("nd") >= min_docs)
        .select("chunk")
    )
    kept = chunks.join(repeated, "chunk", "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "chunk"))),
                lambda s: s["chunk"],
            ),
            " ",
        ).alias("clean_text"),
        F.count("*").alias("__kept"),
    )
    totals = chunks.groupBy(id_col).agg(F.count("*").alias("n_chunks"))
    return (
        df.select(id_col)
        .join(totals, id_col, "left")
        .join(rebuilt, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_chunks", F.lit(0)).cast("long").alias("n_chunks"),
            (F.coalesce("n_chunks", F.lit(0)) - F.coalesce("__kept", F.lit(0)))
            .cast("long")
            .alias("n_removed"),
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        )
    )


# ---------------------------------------------------------------------------
# PII scrubbing
# ---------------------------------------------------------------------------

# backslash-free patterns: the same literal works unescaped in Spark SQL
# strings and DuckDB SQL strings (and RE2 vs java.util.regex agree on
# this character-class-only subset)
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z][A-Za-z]+"
URL_RE = "https?://[^ ]+"


def pii_scrub(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Mask emails and URLs (the two deterministic regex classes every
    training-data pipeline scrubs first) and count what was masked.
    Pure JVM regexp expressions; emails are masked before URLs so the
    URL pass never sees mailto-like tails."""
    n_emails = F.expr(
        f"size(regexp_extract_all({text_col}, '{EMAIL_RE}', 0))"
    ).cast("long")
    n_urls = F.expr(
        f"size(regexp_extract_all({text_col}, '{URL_RE}', 0))"
    ).cast("long")
    scrubbed = F.expr(
        f"regexp_replace(regexp_replace({text_col}, '{EMAIL_RE}', '<EMAIL>'), "
        f"'{URL_RE}', '<URL>')"
    )
    return (
        df.withColumn("n_emails", n_emails)
        .withColumn("n_urls", n_urls)
        .withColumn("scrubbed_text", scrubbed)
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


def repetition_signals(
    df: DataFrame, id_col: str, text_col: str = "text"
) -> DataFrame:
    """Gopher-style within-document repetition signals (Rae et al. 2021
    §A1.1 quality filters, re-expressed relationally):

    * ``top_bigram_frac`` — fraction of all token bigrams covered by the
      single most frequent bigram (boilerplate/chant detector);
    * ``dup_trigram_frac`` — fraction of token trigrams that are repeats
      of an earlier trigram in the same document (1 − distinct/total).

    One explode + two-level aggregate per signal, all JVM expressions;
    rounded to 6 decimals so an independent SQL engine reproduces the
    values exactly. Documents too short for a bigram/trigram report 0.
    """

    def grams(n: int):
        return F.expr(
            f"CASE WHEN size(split({text_col}, ' ')) >= {n} THEN "
            f"transform(sequence(1, size(split({text_col}, ' ')) - {n - 1}), "
            f"i -> concat_ws(' ', slice(split({text_col}, ' '), i, {n}))) "
            "ELSE array() END"
        )

    bi = (
        df.select(id_col, F.explode(grams(2)).alias("g"))
        .groupBy(id_col, "g")
        .agg(F.count("*").alias("c"))
        .groupBy(id_col)
        .agg(
            F.round(F.max("c") / F.sum("c"), 6).alias("top_bigram_frac")
        )
    )
    tri = (
        df.select(id_col, F.explode(grams(3)).alias("g"))
        .groupBy(id_col)
        .agg(
            F.round(
                1 - F.count_distinct("g") / F.count("*"), 6
            ).alias("dup_trigram_frac")
        )
    )
    return (
        df.select(id_col)
        .join(bi, id_col, "left")
        .join(tri, id_col, "left")
        .withColumn(
            "top_bigram_frac",
            F.coalesce(F.col("top_bigram_frac"), F.lit(0.0)),
        )
        .withColumn(
            "dup_trigram_frac",
            F.coalesce(F.col("dup_trigram_frac"), F.lit(0.0)),
        )
    )


# ---------------------------------------------------------------------------
# Unicode / whitespace normalization
# ---------------------------------------------------------------------------

# Character-class-only pattern (no shorthand escapes): java.util.regex,
# RE2 and DuckDB read it identically. Covers every C0 control plus DEL;
# replacing them with spaces FIRST means the collapse pass below only
# ever has to merge plain spaces.
_CONTROL_RE = "[\\x00-\\x1f\\x7f]"


def normalize_text(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "norm_text",
    form: str = "NFC",
    lowercase: bool = False,
) -> DataFrame:
    """Canonical text normalization — the first pass of every
    training-data pipeline: Unicode canonical composition (NFC by
    default, so decomposed accents from different crawlers hash/dedup
    identically), control characters to spaces, whitespace runs
    collapsed, edges trimmed, optional lowercase.

    The NFC step is the only part Spark has no built-in for; it runs as
    one vectorized Arrow batch (``unicodedata`` over a pandas block —
    the same boundary as the index tokenizer). Everything after is JVM
    ``regexp_replace``/``trim`` expressions, so the normalization chain
    stays inside whole-stage codegen for its string-heavy tail and the
    op is a single map-only pass — no shuffle at any scale.
    """
    import unicodedata

    from pyspark.sql.pandas.functions import pandas_udf

    @pandas_udf("string")
    def _nfc(s):
        return s.map(
            lambda x: None if x is None else unicodedata.normalize(form, x)
        )

    c = _nfc(F.col(text_col))
    c = F.regexp_replace(c, _CONTROL_RE, " ")
    c = F.regexp_replace(c, "  *", " ")
    c = F.trim(c)
    if lowercase:
        c = F.lower(c)
    return df.withColumn(out_col, c)


def readability(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Flesch reading-ease score with a vowel-group syllable heuristic —
    ``(id, n_words, n_sentences, n_syllables, flesch)`` where
    ``flesch = 206.835 − 1.015·(words/sentences) − 84.6·(syllables/
    words)`` (Flesch 1948; public formula). Words are ``[a-z]+`` runs of
    the lowercased text, sentences are ``[.!?]+`` runs (min 1 each so
    the formula is total on junk rows), and syllables are approximated
    by ``[aeiouy]+`` vowel groups — the standard cheap estimator, and
    deliberately expressed as three regexes that mean the same thing in
    Java regex and ANSI/DuckDB ``regexp_extract_all`` so the oracle can
    restate the formula verbatim.

    Plan shape: one map-only projection of pure JVM regexp expressions —
    no shuffle, no Python, corpus-linear at any scale."""
    lt = F.lower(F.col(text_col))
    n_words = F.greatest(
        F.lit(1), F.size(F.regexp_extract_all(lt, F.lit("[a-z]+"), F.lit(0)))
    )
    n_sent = F.greatest(
        F.lit(1),
        F.size(
            F.regexp_extract_all(F.col(text_col), F.lit("[.!?]+"), F.lit(0))
        ),
    )
    n_syll = F.size(
        F.regexp_extract_all(lt, F.lit("[aeiouy]+"), F.lit(0))
    )
    w = n_words.cast("double")
    flesch = F.round(
        F.lit(206.835)
        - F.lit(1.015) * (w / n_sent.cast("double"))
        - F.lit(84.6) * (n_syll.cast("double") / w),
        6,
    )
    return df.select(
        F.col(id_col),
        n_words.cast("int").alias("n_words"),
        n_sent.cast("int").alias("n_sentences"),
        n_syll.cast("int").alias("n_syllables"),
        flesch.alias("flesch"),
    )


def quality_quantile_filter(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    q: float = 0.25,
    exact: bool = True,
) -> DataFrame:
    """Per-domain quality-quantile gate (the FineWeb/CCNet-style curation
    step): score every document with :func:`quality_score`, compute each
    domain's ``q``-quantile of the (6-decimal-rounded) score, and keep
    documents at or above their OWN domain's threshold — an absolute
    cutoff would silently drop whole domains whose style scores low
    (code, forums) while a per-domain quantile removes each domain's
    worst tail. Returns the kept rows as ``(doc_id, <group>, quality,
    q_threshold)``.

    Plan: one map-side-combined groupBy for the threshold table —
    DIMENSION-sized (one row per domain) — broadcast-joined back onto
    the scored corpus; no corpus self-join, no window over the corpus.
    ``exact=True`` uses Catalyst's linear-interpolation ``percentile``
    (bit-matches DuckDB ``quantile_cont`` on the 6-decimal grid — same
    trade as `ops/stats.py`); ``exact=False`` swaps in
    ``approx_percentile`` for corpora where a single domain's value
    buffer shouldn't live in one aggregation state."""
    scored = quality_score(df, text_col)
    fn = "percentile" if exact else "approx_percentile"
    thr = scored.groupBy(group_col).agg(
        F.round(F.expr(f"{fn}(quality, {q!r})"), 6).alias("q_threshold")
    )
    return (
        scored.join(F.broadcast(thr), group_col)
        .filter(F.col("quality") >= F.col("q_threshold"))
        .select("doc_id", group_col, "quality", "q_threshold")
    )


# fenced markdown code block: optional info-string language tag, then
# everything (non-greedy, DOTALL via an inline-flag group so the same
# pattern runs under Java regex and RE2) up to the closing fence
CODE_FENCE_RE = "```([A-Za-z0-9_+-]*)\\n((?s:.*?))```"


def extract_code_blocks(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Structured extraction of fenced markdown code blocks — the
    standard first step when mining code from agent transcripts /
    chat corpora. Returns one row per block:
    ``(id, block_idx, lang, code, n_lines)`` in document order;
    documents without a closed fence contribute no rows (an unclosed
    trailing fence never matches).

    Map-only JVM plan: two ``regexp_extract_all`` projections (lang
    group, body group — matches align positionally by construction)
    zipped and posexploded inside the scan's codegen stage. No Python,
    no shuffle, no join: at 10^12 turns the cost is the one corpus
    pass that reads the text column."""
    langs = F.regexp_extract_all(F.col(text_col), F.lit(CODE_FENCE_RE), 1)
    codes = F.regexp_extract_all(F.col(text_col), F.lit(CODE_FENCE_RE), 2)
    blocks = F.zip_with(
        langs, codes, lambda l, c: F.struct(l.alias("lang"), c.alias("code"))
    )
    return df.select(
        F.col(id_col), F.posexplode(blocks).alias("block_idx", "__b")
    ).select(
        id_col,
        F.col("block_idx").cast("int").alias("block_idx"),
        F.col("__b.lang").alias("lang"),
        F.col("__b.code").alias("code"),
        F.size(F.split("__b.code", "\n")).cast("int").alias("n_lines"),
    )


def dedup_paragraphs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n\n",
) -> DataFrame:
    """WITHIN-document paragraph dedup (the C4/Gopher intra-doc step —
    distinct from `ops/dedup.py::chunk_dedup`, which removes chunks
    repeated ACROSS the corpus): split on ``sep``, keep only the FIRST
    occurrence of each paragraph inside its own document, reassemble in
    original order. Returns ``(id, n_paras, n_kept, clean_text)``.

    Plan: posexplode -> min(pos) window partitioned by (doc, paragraph)
    — window state is bounded by a single document's paragraph count,
    never the corpus — -> one algebraic sort_array(collect_list)
    reassembly groupBy. Two shuffles both keyed by the document id; at
    10^12 turns nothing exceeds per-doc state."""
    w = Window.partitionBy(id_col, "para")
    parts = F.split(F.col(text_col), sep)
    p = df.select(
        F.col(id_col),
        F.size(parts).cast("int").alias("n_paras"),
        F.posexplode(parts).alias("pos", "para"),
    )
    kept = p.withColumn("mn", F.min("pos").over(w)).filter(
        F.col("pos") == F.col("mn")
    )
    return kept.groupBy(id_col).agg(
        F.max("n_paras").alias("n_paras"),
        F.count("*").alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "para"))),
                lambda s: s["para"],
            ),
            sep,
        ).alias("clean_text"),
    )


def strip_common_prefix(
    df: DataFrame,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Boilerplate removal: strip the longest common prefix shared by
    ALL documents of a group (site header / scrape banner). Returns
    ``(id, group, prefix_len, stripped_text)``; single-document groups
    strip nothing (their 'common prefix' is the whole document).

    The LCP of a set equals the LCP of its lexicographic min and max,
    so the plan is ONE map-side-combined groupBy (min, max, count — a
    group-dimension-sized table), a JVM left-fold computing the
    mismatch point, and a broadcast join back: no corpus self-join, no
    second pass, no Python. At 10^12 turns the cost is the one corpus
    aggregate."""
    g = F.col(group_col)
    dims = df.groupBy(group_col).agg(
        F.min(text_col).alias("__mn"),
        F.max(text_col).alias("__mx"),
        F.count("*").alias("__n"),
    )
    bound = F.least(F.length("__mn"), F.length("__mx"))
    # left fold over the candidate positions: acc advances while every
    # position so far matched (Spark sequence(1, 0) would count DOWN, so
    # an empty-bound group needs the explicit empty-array branch)
    chars_mn = F.split(F.col("__mn"), "")
    chars_mx = F.split(F.col("__mx"), "")
    fold = F.aggregate(
        F.when(bound >= 1, F.sequence(F.lit(1), bound)).otherwise(
            F.array().cast("array<int>")
        ),
        F.lit(0),
        lambda acc, i: F.when(
            (acc == i - 1)
            & (F.element_at(chars_mn, i) == F.element_at(chars_mx, i)),
            i,
        ).otherwise(acc),
    )
    dims = dims.withColumn(
        "prefix_len",
        F.when(F.col("__n") >= 2, fold).otherwise(F.lit(0)).cast("int"),
    ).select(group_col, "prefix_len")
    out = df.join(F.broadcast(dims), group_col)
    return out.select(
        F.col(id_col),
        g,
        F.col("prefix_len"),
        F.expr(f"substr({text_col}, prefix_len + 1)").alias("stripped_text"),
    )


def extractive_summary(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_sentences: int = 1,
) -> DataFrame:
    """Extractive summarization, TextRank-lite: per document, keep the
    ``n_sentences`` sentences whose idf-weighted token mass is highest —
    the cheap "which sentence carries this doc's information" primitive
    a training pipeline uses for previews, highlight seeds, or short-
    context distillation targets.

    Sentence score = Σ over its distinct non-stopword tokens of corpus
    idf (ln(N/df), df counted doc-level), length-normalized by the
    sentence's token count (so long rambles don't win by mass alone),
    rounded to 6 decimals before ranking; ties break to the earlier
    sentence. Returns (id_col, sent_idx, sentence, round(score, 6)).

    Plan: sentence split + posexplode (map-only), token explode, ONE
    doc-level df aggregate (dimension-sized, broadcast back), one
    (doc, sentence) aggregation, one per-doc window for the top-n —
    per-doc-bounded state everywhere; the only corpus-wide exchange is
    the df aggregate any tf-idf derivation needs."""
    sid = F.col(id_col)
    # sentence boundary = ender + whitespace, marked with a sentinel then
    # split — the lookbehind-free phrasing RE2 engines (the SQL oracle)
    # can restate exactly
    sent_arr = F.split(
        F.regexp_replace(F.col(text_col), r"([.!?])\s+", "$1\x1e"), "\x1e"
    )
    sents = df.select(
        sid,
        F.posexplode(
            F.filter(
                F.transform(sent_arr, lambda s: F.trim(s)),
                lambda s: s != "",
            )
        ).alias("sent_idx", "sentence"),
    )
    toks = sents.select(
        sid,
        "sent_idx",
        F.explode(
            F.array_distinct(
                F.filter(
                    F.split(F.lower("sentence"), r"[^a-z0-9']+"),
                    lambda t: (t != "")
                    & ~t.isin(*[w for w in STOP_WORDS if w]),
                )
            )
        ).alias("tok"),
    )
    n_docs = df.count()
    dfs = (
        toks.select(sid, "tok")
        .distinct()
        .groupBy("tok")
        .agg(F.count("*").alias("df"))
        .withColumn(
            "idf", F.log(F.lit(float(n_docs)) / F.col("df").cast("double"))
        )
    )
    scored = (
        toks.join(dfs, "tok")
        .groupBy(sid, "sent_idx")
        .agg(F.sum("idf").alias("__mass"), F.count("*").alias("__n"))
        .withColumn(
            "score", F.round(F.col("__mass") / F.col("__n"), 6)
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("sent_idx").asc()
    )
    return (
        scored.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= n_sentences)
        .join(sents, [id_col, "sent_idx"])
        .select(id_col, "sent_idx", "sentence", "score")
    )


def term_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    text_col: str = "text",
    top_n: int = 30,
    k: float = 0.5,
) -> DataFrame:
    """Corpus-drift detection: which terms does slice A over-represent
    versus slice B? Per-term KL contribution
    ``p_a(t)·ln(p_a(t)/p_b(t))`` over the union vocabulary with add-k
    smoothing — the monitoring primitive for "did this week's crawl /
    source / snapshot shift distribution", run before a new slice is
    allowed into a training mix. Returns the ``top_n`` drifted terms
    ``(term, count_a, count_b, kl_term)`` (kl desc, term asc).

    Per-term contributions are each ONE double expression over exact
    integer counts — no cross-term float sum anywhere, so there is no
    accumulation-order hazard at all (the total KL, if a caller wants
    it, is the sum of this bounded result set driver-side).

    Distributed shape: two vocabulary-keyed count aggregates (map-side
    combined; hot terms are counts, not rows), a full outer join on the
    term key, two 1-row totals broadcast, map-only scoring, TakeOrdered
    top-N. Nothing driver-sized except the final N rows."""
    kk = float(k)

    def counts(df: DataFrame, name: str) -> DataFrame:
        return (
            df.select(F.explode(ws_tokens(F.col(text_col))).alias("term"))
            .groupBy("term")
            .agg(F.count("*").cast("long").alias(name))
        )

    ca = counts(df_a, "count_a")
    cb = counts(df_b, "count_b")
    vocab = ca.join(cb, "term", "full_outer").select(
        "term",
        F.coalesce("count_a", F.lit(0)).cast("long").alias("count_a"),
        F.coalesce("count_b", F.lit(0)).cast("long").alias("count_b"),
    )
    totals = vocab.agg(
        F.sum("count_a").cast("double").alias("__ta"),
        F.sum("count_b").cast("double").alias("__tb"),
        F.count("*").cast("double").alias("__v"),
    )
    scored = vocab.crossJoin(F.broadcast(totals)).select(
        "term",
        "count_a",
        "count_b",
        F.round(
            (
                (F.col("count_a").cast("double") + F.lit(kk))
                / (F.col("__ta") + F.lit(kk) * F.col("__v"))
            )
            * F.log(
                (
                    (F.col("count_a").cast("double") + F.lit(kk))
                    / (F.col("__ta") + F.lit(kk) * F.col("__v"))
                )
                / (
                    (F.col("count_b").cast("double") + F.lit(kk))
                    / (F.col("__tb") + F.lit(kk) * F.col("__v"))
                )
            ),
            6,
        ).alias("kl_term"),
    )
    return scored.orderBy(
        F.col("kl_term").desc(), F.col("term").asc()
    ).limit(int(top_n))


def chunk_text(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 32,
    stride: int = 24,
) -> DataFrame:
    """RAG-style sliding-window chunking: split each document into
    overlapping token windows of ``chunk_tokens`` whitespace tokens,
    window i starting at token ``i * stride`` (stride < chunk_tokens
    gives the usual overlap so no retrieval-relevant span straddles a
    boundary without appearing whole in some chunk).

    Chunk-count rule (deterministic): 1 chunk if the doc fits, else
    ``ceil((n - chunk) / stride) + 1`` — the last chunk is the first
    one whose window reaches the end of the document; no degenerate
    tail chunks that only repeat the previous window's suffix.

    Map-only plan: split → sequence → posexplode → slice/array_join,
    all JVM expressions inside one whole-stage codegen span (no
    shuffle, no Python) — the shape that survives a 100 TB corpus
    untouched. Returns (id, chunk_idx, n_chunk_toks, chunk_text).
    """
    if stride <= 0 or chunk_tokens <= 0:
        raise ValueError("chunk_tokens and stride must be positive")
    toks = ws_tokens(F.col(text_col))
    n = F.size(toks)
    n_chunks = F.when(n <= chunk_tokens, F.lit(1)).otherwise(
        F.ceil(
            (n - F.lit(chunk_tokens)).cast("double") / F.lit(float(stride))
        ).cast("int")
        + 1
    )
    base = df.select(
        F.col(id_col), toks.alias("__t"), n_chunks.alias("__nc")
    )
    out = base.select(
        id_col,
        F.posexplode(F.expr("sequence(0, __nc - 1)")).alias(
            "chunk_idx", "__s"
        ),
        F.col("__t"),
    ).select(
        id_col,
        F.col("chunk_idx"),
        F.least(
            F.lit(chunk_tokens),
            F.size("__t") - F.col("__s") * stride,
        ).cast("long").alias("n_chunk_toks"),
        F.array_join(
            F.slice(
                F.col("__t"),
                F.col("__s") * stride + 1,
                F.lit(chunk_tokens),
            ),
            " ",
        ).alias("chunk_text"),
    )
    return out


def vocab_coverage(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab_size: int = 16,
) -> DataFrame:
    """Tokenizer-fit diagnostic: coverage of each document by the
    corpus's top-``vocab_size`` word types (count DESC, token ASC —
    deterministic tie-break). The corpus-level OOV rate this induces is
    the first number checked when sizing a tokenizer vocabulary against
    a new data source.

    Plan shape: one token-count aggregate, top-V cut (V is tiny —
    a driver-bounded TakeOrdered), broadcast membership join back to
    the exploded tokens, one per-doc conditional-sum aggregate. The
    corpus-sized paths are two map-side-combined groupBys keyed on
    token / id — no window over the corpus, no Python.

    Returns (id, n_toks, oov_toks, coverage) with coverage on the
    6-decimal grid.
    """
    toks = df.select(
        F.col(id_col), F.explode(ws_tokens(F.col(text_col))).alias("__tok")
    )
    vocab = (
        toks.groupBy("__tok")
        .agg(F.count("*").alias("__c"))
        .orderBy(F.col("__c").desc(), F.col("__tok").asc())
        .limit(int(vocab_size))
        .select("__tok", F.lit(1).alias("__in_vocab"))
    )
    joined = toks.join(F.broadcast(vocab), "__tok", "left")
    out = joined.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_toks"),
        F.sum(
            F.when(F.col("__in_vocab").isNull(), F.lit(1)).otherwise(
                F.lit(0)
            )
        ).cast("long").alias("oov_toks"),
    )
    return out.withColumn(
        "coverage",
        F.round(
            F.lit(1.0)
            - F.col("oov_toks").cast("double") / F.col("n_toks").cast("double"),
            6,
        ),
    )


def kneser_ney_logprob(
    df: DataFrame, id_col: str, text_col: str = "text", discount: float = 0.75
) -> DataFrame:
    """Interpolated Kneser-Ney bigram perplexity proxy — the smoothing
    the KenLM-style quality filters actually use (Kneser & Ney 1995;
    Chen & Goodman 1998), upgrading `bigram_logprob`'s add-k:
    ``p(w|v) = (max(c(vw) - D, 0) + (D * N1+(v·)) * (N1+(·w) / B)) / c(v)``
    with D the absolute discount, N1+(v·) the distinct continuations of
    v, N1+(·w) the distinct contexts preceding w (the continuation
    count that makes "francisco" cheap after anything but "san"), and B
    the total distinct bigram types.

    All five model statistics are exact integer aggregates over the
    bigram table; each scored bigram evaluates ONE float expression
    (identical parse shape in the DuckDB oracle). Per-doc score is the
    mean negative log probability over the doc's bigrams.

    Plan shape: one bigram explode, three dimension-sized aggregates
    (bigram counts / per-context stats / per-word continuation counts),
    a 1-row type-count broadcast, two joins back keyed on (w1, w2) / w1
    / w2 — hot contexts stay pre-aggregated counts. Docs with < 2
    tokens report n_bigrams = 0, score NULL."""
    dd = float(discount)
    toks = ws_tokens(F.col(text_col))
    big = (
        df.select(F.col(id_col), toks.alias("__t"))
        .filter(F.size("__t") >= 2)
        .select(
            id_col,
            F.explode(
                F.expr(
                    "transform(sequence(1, size(__t) - 1), "
                    "i -> struct(__t[i - 1] AS w1, __t[i] AS w2))"
                )
            ).alias("bg"),
        )
        .select(id_col, F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    )
    # persisted: every model statistic (ctx / cont / B) derives from the
    # bigram-count table, and the scoring join reads it again — without
    # the cache each branch re-runs the corpus bigram explode (measured:
    # 6 file scans and 5 Generate nodes in one action at sf0.1, zero
    # exchange reuse). The cache is dimension-sized (distinct bigram
    # types), the right trade at any corpus size.
    c2 = big.groupBy("w1", "w2").agg(F.count("*").alias("c2")).persist()
    ctx = c2.groupBy("w1").agg(
        F.sum("c2").alias("cv"), F.count("*").alias("n1p_v")
    )
    cont = c2.groupBy("w2").agg(F.count("*").alias("n1p_w"))
    types = c2.agg(F.count("*").cast("double").alias("__b"))
    prob = (
        F.greatest(F.col("c2").cast("double") - F.lit(dd), F.lit(0.0))
        + (F.lit(dd) * F.col("n1p_v").cast("double"))
        * (F.col("n1p_w").cast("double") / F.col("__b"))
    ) / F.col("cv").cast("double")
    scored = (
        big.join(c2, ["w1", "w2"])
        .join(ctx, "w1")
        .join(cont, "w2")
        .crossJoin(F.broadcast(types))
        .select(id_col, (-F.log(prob)).alias("nll"))
    )
    per_doc = scored.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_bigrams"),
        F.round(F.avg("nll"), 6).alias("kn_neg_logprob"),
    )
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
            F.col("kn_neg_logprob"),
        )
    )


def vocab_growth(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 10,
    rank_col: Optional[str] = None,
) -> DataFrame:
    """Heaps-law vocabulary-growth curve: documents are split into
    ``n_buckets`` equal prefixes in ``id_col`` order and each bucket
    reports the cumulative distinct-term count after ingesting it — the
    curve a tokenizer team reads to decide whether vocabulary has
    saturated for a source.

    Plan shape: one explode + min-bucket groupBy per term, then an
    ``n_buckets``-row cumsum — the single term aggregate is the only
    corpus-proportional work. Pass ``rank_col`` (a dense 0-based
    position, e.g. the engine's distributed `assign_docids` output)
    to skip the fallback global ranking window, which is a
    single-partition sort acceptable only at test scale.

    Returns (bucket, n_docs, new_terms, vocab_size), bucket 0-based.
    """
    b = int(n_buckets)
    if rank_col is not None:
        ranked = df.select(
            F.col(id_col),
            ws_tokens(F.col(text_col)).alias("__t"),
            F.col(rank_col).cast("long").alias("__rk"),
        )
    else:
        w = Window.orderBy(F.col(id_col).asc())
        ranked = df.select(
            F.col(id_col),
            ws_tokens(F.col(text_col)).alias("__t"),
            (F.row_number().over(w) - 1).alias("__rk"),
        )
    total = ranked.agg(F.count("*").alias("__n"))
    with_bucket = ranked.crossJoin(F.broadcast(total)).select(
        F.expr(f"CAST((__rk * {b}) DIV __n AS INT)").alias("__bucket"),
        "__t",
    )
    first = (
        with_bucket.select(
            "__bucket", F.explode("__t").alias("__tok")
        )
        .groupBy("__tok")
        .agg(F.min("__bucket").alias("__fb"))
    )
    new_terms = first.groupBy("__fb").agg(
        F.count("*").cast("long").alias("new_terms")
    )
    docs_per = with_bucket.groupBy("__bucket").agg(
        F.count("*").cast("long").alias("n_docs")
    )
    cum = Window.orderBy(F.col("bucket").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        docs_per.join(
            new_terms.withColumnRenamed("__fb", "__bucket"),
            "__bucket",
            "left",
        )
        .select(
            F.col("__bucket").alias("bucket"),
            "n_docs",
            F.coalesce("new_terms", F.lit(0)).cast("long").alias("new_terms"),
        )
        .withColumn("vocab_size", F.sum("new_terms").over(cum))
    )


def memorization_risk(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
) -> DataFrame:
    """Cross-document repeated-n-gram exposure (the Lee et al. 2022
    memorization-risk signal): per document, the fraction of its token
    ``n``-grams that also occur in at least one OTHER document. High
    values flag boilerplate/templated text a model would memorize.

    Plan shape: one n-gram explode (JVM transform/sequence), one
    distinct-doc-count aggregate per gram (map-side combined — hot
    grams stay counts), one join back keyed on the gram, one per-doc
    aggregate. Docs with fewer than ``n`` tokens report n_grams = 0,
    NULL risk.

    Returns (id, n_grams, dup_grams, risk) on the 6-decimal grid.
    """
    toks = ws_tokens(F.col(text_col))
    grams = (
        df.select(F.col(id_col), toks.alias("__t"))
        .filter(F.size("__t") >= n)
        .select(
            id_col,
            F.explode(
                F.expr(
                    f"transform(sequence(0, size(__t) - {n}), "
                    f"i -> array_join(slice(__t, i + 1, {n}), ' '))"
                )
            ).alias("__g"),
        )
    )
    gdf = grams.groupBy("__g").agg(
        F.countDistinct(id_col).cast("long").alias("__df")
    )
    per_doc = (
        grams.join(gdf, "__g")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_grams"),
            F.sum(F.when(F.col("__df") >= 2, 1).otherwise(0))
            .cast("long")
            .alias("dup_grams"),
        )
    )
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
            F.coalesce("dup_grams", F.lit(0)).cast("long").alias("dup_grams"),
            F.when(
                F.col("n_grams") > 0,
                F.round(
                    F.col("dup_grams").cast("double")
                    / F.col("n_grams").cast("double"),
                    6,
                ),
            ).alias("risk"),
        )
    )


def categorize_text(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_tokens: int = 4,
) -> DataFrame:
    """ES ``categorize_text`` analog: deterministic log-pattern buckets.
    ES runs a drain-style online tree; a reproducible batch pipeline
    wants a pure function of the text, so the category key here is the
    normalized prefix: lowercase, digit runs collapsed to ``#``, first
    ``max_tokens`` whitespace tokens joined — the standard
    log-templating trick (timestamps/ids/counters stop splitting
    templates apart), restatable verbatim by any SQL engine.

    One map-side-combined groupBy; returns
    (category, doc_count, example_id) with example_id = the smallest
    ``id_col`` in the bucket (deterministic representative)."""
    norm = F.lower(F.regexp_replace(F.col(text_col), "[0-9]+", "#"))
    toks = F.slice(F.split(F.trim(norm), r"\s+"), 1, int(max_tokens))
    return (
        df.select(
            F.array_join(toks, " ").alias("category"),
            F.col(id_col).cast("long").alias("__id"),
        )
        .groupBy("category")
        .agg(
            F.count("*").cast("long").alias("doc_count"),
            F.min("__id").alias("example_id"),
        )
    )
