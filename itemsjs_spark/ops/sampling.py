"""Deterministic corpus sampling, split assignment, and sequence
packing — the bookkeeping operators every training-data pipeline needs
before anything reaches a trainer.

All engine-portable by construction: the randomness source is an md5
hex prefix of the (seeded) document key, so ANY engine — including the
DuckDB oracle — reproduces membership bit-for-bit. No RNG state, no
driver coordination, stable under retries, appends and re-partitioning
(the classic salted-hash sampling design used in place of ``rand()``,
which is neither stable nor engine-portable).

* ``hash_fraction``   — uniform [0,1) per row: first 8 md5 hex chars of
  ``seed:key`` as an integer / 2^32.
* ``sample_fraction`` — keep ~``rate`` of rows, deterministically.
* ``deterministic_split`` — named-split assignment (train/val/test) by
  cumulative weight over the same hash fraction.
* ``pack_sequences``  — shard-local greedy packing: documents are
  hash-sharded, ordered within the shard, and cut into bins whose token
  budget is ``budget`` (cumulative-sum bin assignment). Work is one
  window per shard partition — shards bound the window state, so the
  plan has no single-partition stage at any corpus size; packing is
  shard-local exactly like production sequence packers, which never
  pack across workers either.
"""

from __future__ import annotations

from typing import Dict, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def hash_fraction(key: Column, seed: str = "0") -> Column:
    """Deterministic uniform [0,1) from the row key: int(md5 prefix)/2^32."""
    hx = F.md5(F.concat(F.lit(seed + ":"), key.cast("string")))
    return F.conv(F.substring(hx, 1, 8), 16, 10).cast("double") / F.lit(
        float(1 << 32)
    )


def sample_fraction(
    df: DataFrame, id_col: str, rate: float, seed: str = "0"
) -> DataFrame:
    """Keep ~``rate`` of rows — membership depends only on (seed, id)."""
    return df.filter(hash_fraction(F.col(id_col), seed) < rate)


def split_bounds(weights: Dict[str, float]):
    """[(name, upper_bound)] cumulative intervals over [0,1) — the LAST
    split has no bound (the otherwise-branch). Shared by the engine and
    the oracle-SQL generator so float thresholds match bit-for-bit."""
    total = float(sum(weights.values()))
    names = list(weights)
    out = []
    cum = 0.0
    for name in names[:-1]:
        cum += weights[name] / total
        out.append((name, cum))
    out.append((names[-1], None))
    return out


def deterministic_split(
    df: DataFrame,
    id_col: str,
    weights: Dict[str, float],
    seed: str = "0",
) -> DataFrame:
    """Assign each row a named split with probability ∝ ``weights``
    (insertion order defines the cumulative intervals). Adds ``split``."""
    frac = hash_fraction(F.col(id_col), seed)
    expr = None
    bounds = split_bounds(weights)
    for name, upper in bounds[:-1]:
        branch = F.when(frac < upper, F.lit(name))
        expr = branch if expr is None else expr.when(frac < upper, F.lit(name))
    last = F.lit(bounds[-1][0])
    return df.withColumn(
        "split", last if expr is None else expr.otherwise(last)
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    token_col: str,
    budget: int,
    n_shards: int = 1024,
    seed: str = "0",
) -> DataFrame:
    """Greedy contiguous sequence packing: documents are hash-assigned
    to ``n_shards`` shards, ordered by id within the shard, and cut
    into bins so each bin's token sum stays ≤ ``budget`` (documents
    longer than the budget get a bin of their own). Adds ``shard`` and
    ``bin`` (bin ids are per-shard).

    Bin id = number of CUTS strictly before the document, where a cut
    falls whenever the running token total since the last cut would
    exceed the budget. Computed as a per-shard window scan — the shard
    count bounds every window partition, so no stage sees more than
    corpus/n_shards rows regardless of scale."""
    shard = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(seed + "#"), F.col(id_col).cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % n_shards
    )
    out = df.withColumn("shard", shard)
    # the greedy fold carries (fill, bin) state across the shard's rows —
    # expressed over collect_list prefixes it would be quadratic, so it
    # runs as ONE per-shard Arrow scan (shard size bounds the state)
    import pandas as pd

    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in out.schema.fields
    ) + ", bin long"

    cap = int(budget)

    def assign(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        bins = []
        fill = 0
        b = 0
        first = True
        for t in pdf[token_col].astype("int64"):
            t = int(t)
            if not first and fill + t > cap:
                b += 1
                fill = 0
            first = False
            fill += t
            bins.append(b)
        pdf["bin"] = pd.Series(bins, dtype="int64")
        return pdf

    return out.groupBy("shard").applyInPandas(assign, schema=schema)


def mixture_weights(
    df: DataFrame, group_col: str, target: Dict[str, float]
) -> DataFrame:
    """Per-group keep-rates that reshape the corpus toward a TARGET
    domain mixture by downsampling only (never upsampling — rates are
    capped at 1, the standard pretraining-mix practice).

    rate_g = min(1, (target_g / max_over_h(target_h / observed_h)) ×
    N / n_g): the scaling constant is chosen so the most over-demanded
    group keeps everything and every other group is downsampled to the
    exact target proportions RELATIVE to it. Groups absent from
    ``target`` get rate 0. One aggregate over the group column; the
    group table is dimension-sized."""
    tgt = F.create_map(
        *[x for k, v in target.items() for x in (F.lit(k), F.lit(float(v)))]
    )
    obs = df.groupBy(group_col).agg(F.count("*").alias("n_g"))
    tot = obs.agg(F.sum("n_g").cast("double").alias("__n"))
    scored = (
        obs.crossJoin(F.broadcast(tot))
        .withColumn("__t", F.coalesce(tgt[F.col(group_col)], F.lit(0.0)))
        .withColumn("__demand", F.col("__t") / (F.col("n_g") / F.col("__n")))
    )
    peak = scored.agg(F.max("__demand").alias("__peak"))
    return (
        scored.crossJoin(F.broadcast(peak))
        .withColumn(
            "keep_rate",
            # peak == 0 ⇔ no observed group appears in the target: every
            # rate is 0 (an unguarded __demand/__peak would throw
            # DIVIDE_BY_ZERO under Spark's ANSI default here)
            F.when(F.col("__peak") > 0, F.round(
                F.least(F.lit(1.0), F.col("__demand") / F.col("__peak")), 6
            )).otherwise(F.lit(0.0)),
        )
        .select(group_col, F.col("n_g").cast("long").alias("n_g"), "keep_rate")
    )


def upsample_rates(
    df: DataFrame, group_col: str, target: Dict[str, float]
) -> DataFrame:
    """Per-group REPEAT rates that reshape the corpus to exactly the
    target mixture while preserving the corpus size in expectation:
    rate_g = (target_g / Σtarget) / (n_g / N). Rates above 1 mean the
    group is over-demanded and gets repeated (the upsampling companion
    to ``mixture_weights``, which caps at 1 instead). Groups absent from
    ``target`` get rate 0. One aggregate; the rate table is
    dimension-sized. Rates are rounded to 6 decimals so any engine
    reproduces the floor/remainder split bit-for-bit."""
    total = float(sum(target.values()))
    tgt = F.create_map(
        *[
            x
            for k, v in target.items()
            for x in (F.lit(k), F.lit(float(v) / total))
        ]
    )
    obs = df.groupBy(group_col).agg(F.count("*").alias("n_g"))
    tot = obs.agg(F.sum("n_g").cast("double").alias("__n"))
    return (
        obs.crossJoin(F.broadcast(tot))
        .withColumn("__t", F.coalesce(tgt[F.col(group_col)], F.lit(0.0)))
        .withColumn(
            "rate",
            F.round(F.col("__t") / (F.col("n_g") / F.col("__n")), 6),
        )
        .select(group_col, F.col("n_g").cast("long").alias("n_g"), "rate")
    )


def mixture_upsample(
    df: DataFrame,
    id_col: str,
    group_col: str,
    target: Dict[str, float],
    seed: str = "0",
) -> DataFrame:
    """Resample ``df`` to the ``target`` mixture with upsampling allowed:
    each row is emitted ``floor(rate_g)`` times plus one more when its
    hash fraction falls under the fractional remainder — integer repeats
    plus a deterministically-chosen remainder set, so expected group
    sizes hit the target exactly and membership is a pure function of
    (seed, id, group rates). Adds ``copy`` (0-based repeat index); rows
    whose group draws 0 copies disappear. The rate join is broadcast
    (dimension-sized); the explode multiplies rows only by each group's
    own repeat factor — no shuffle is introduced."""
    rates = upsample_rates(df, group_col, target)
    frac = hash_fraction(F.col(id_col), seed)
    base = F.floor(F.col("rate")).cast("long")
    extra = F.when(frac < F.col("rate") - F.floor(F.col("rate")), 1).otherwise(
        0
    )
    n_copies = (base + extra).alias("n_copies")
    return (
        df.join(F.broadcast(rates.select(group_col, "rate")), group_col)
        .withColumn("n_copies", n_copies)
        .withColumn(
            "copy",
            F.explode(
                F.when(
                    F.col("n_copies") > 0,
                    F.sequence(F.lit(0).cast("long"), F.col("n_copies") - 1),
                ).otherwise(F.array().cast("array<long>"))
            ),
        )
        .drop("rate", "n_copies")
    )


def mixture_sample(
    df: DataFrame,
    id_col: str,
    group_col: str,
    target: Dict[str, float],
    seed: str = "0",
) -> DataFrame:
    """Deterministically downsample ``df`` to the ``target`` mixture:
    join the dimension-sized ``mixture_weights`` table (broadcast) and
    keep rows whose hash fraction falls under their group's rate —
    membership is a pure function of (seed, id, group rates), so any
    engine reproduces it bit-for-bit."""
    rates = mixture_weights(df, group_col, target)
    return (
        df.join(F.broadcast(rates.select(group_col, "keep_rate")), group_col)
        .filter(hash_fraction(F.col(id_col), seed) < F.col("keep_rate"))
        .drop("keep_rate")
    )


def stratified_sample(
    df: DataFrame,
    id_col: str,
    group_col: str,
    n: int,
    seed: str = "0",
    salt_buckets: int = 16,
) -> DataFrame:
    """EXACTLY ``min(n, |group|)`` rows per group, chosen by the same
    deterministic hash order as every sampler here (uniform, engine-
    portable, stable under retries/appends/partitioning): per group,
    the ``n`` rows with the smallest ``(hash_fraction, id)`` key.

    Physical plan — the salted two-phase top-n, never one task per hot
    group: rows first rank within ``(group, salt)`` where salt =
    pmod(xxhash64(id), salt_buckets), bounding any window partition to
    ~1/salt_buckets of its group; survivors (≤ salt_buckets·n per
    group, dimension-sized) rank once more within the group alone. A
    10^9-row group costs ⌈1/16th⌉-group windows plus a 16·n-row final
    window — no single-task stage at any corpus size."""
    frac = hash_fraction(F.col(id_col), seed)
    salt = F.pmod(F.xxhash64(F.col(id_col).cast("string")), F.lit(salt_buckets))
    from pyspark.sql import Window

    w_local = (
        Window.partitionBy(F.col(group_col), salt)
        .orderBy(frac.asc(), F.col(id_col).cast("string").asc())
    )
    survivors = (
        df.withColumn("__frac", frac)
        .withColumn("__rn", F.row_number().over(w_local))
        .filter(F.col("__rn") <= n)
        .drop("__rn")
    )
    w_group = Window.partitionBy(group_col).orderBy(
        F.col("__frac").asc(), F.col(id_col).cast("string").asc()
    )
    return (
        survivors.withColumn("__rn", F.row_number().over(w_group))
        .filter(F.col("__rn") <= n)
        .drop("__rn", "__frac")
    )


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    n: int,
    seed: str = "0",
) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis–Spirakis
    A-Res, IPL 2006): per-row key ``-ln(u)/w`` with ``u`` the
    deterministic `hash_fraction`; the n SMALLEST keys are exactly a
    weight-proportional sample without replacement. Same portability
    contract as every sampler here: u is an md5 integer ratio (exact in
    any engine), the key rounds to 6 decimals and ties break on
    ``str(id)``, so the DuckDB oracle reproduces membership row-for-row.

    Scale shape: the key is map-only; ``orderBy().limit(n)`` compiles
    to TakeOrdered — per-partition partial top-n then a driver merge of
    n·n_partitions rows, no global sort, no shuffle of the corpus.
    Non-positive weights are excluded (zero weight = never sampled);
    u = 0 (p = 2^-32) maps to key +inf, i.e. sorts last — consistent
    with the u^(1/w) = 0 formulation."""
    u = hash_fraction(F.col(id_col), seed)
    w = F.col(weight_col).cast("double")
    key = F.round(-F.log(u) / w, 6)
    return (
        df.filter(w > 0)
        .select(
            F.col(id_col), w.alias("weight"), key.alias("sort_key")
        )
        .orderBy(
            F.col("sort_key").asc(), F.col(id_col).cast("string").asc()
        )
        .limit(n)
    )


def dsir_weights(
    raw: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 256,
    k: float = 0.5,
) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): score every raw
    document by how much its hashed n-gram distribution looks like the
    ``target`` corpus rather than the raw pool —
    ``w(doc) = Σ_grams log(p_target(bucket)/q_raw(bucket))`` over
    word unigrams + bigrams hashed into ``n_buckets`` buckets with
    add-k smoothing. Returns ``(id, n_grams, weight)``.

    Engine-portable and order-free by construction: the bucket hash is
    the repo's md5-prefix scheme; the two bucket distributions are
    exact integer counts; each bucket's log-ratio is quantized ONCE to
    integer nano-units (the PageRank/PCA lesson — identical double
    inputs give identical nano-units, and everything after is exact
    BIGINT arithmetic, so no distributed float-sum order can drift);
    a document's weight is the exact integer dot product of its bucket
    counts with that 256-row broadcast table, divided once at the end.

    Distributed shape: ONE gram explode per corpus — the raw pool's
    per-(doc, bucket) count table is persisted and its bucket
    distribution derived from it by a second (tiny, bucket-keyed)
    aggregate, the target corpus gets one map-side-combined bucket
    count — plus one ``n_buckets``-row spine joined broadcast and one
    broadcast join + per-doc integer sum. Nothing corpus-sized crosses
    the driver; the model is n_buckets rows regardless of vocabulary —
    the bounded-memory property that makes DSIR runnable at 10^12
    turns."""
    from itemsjs_spark.ops.text import ws_tokens as ws_tokens_col

    spark = raw.sparkSession
    bcount = int(n_buckets)
    kk = float(k)

    def bucket(g: Column) -> Column:
        return F.conv(F.substring(F.md5(g), 1, 6), 16, 10).cast(
            "long"
        ) % F.lit(bcount)

    def gram_stream(df: DataFrame, keep_id: bool) -> DataFrame:
        toks = ws_tokens_col(F.col(text_col))
        cols = [F.col(id_col).alias("__id")] if keep_id else []
        uni = df.select(*cols, F.explode(toks).alias("g"))
        big = (
            df.select(*cols, toks.alias("__t"))
            .filter(F.size("__t") >= 2)
            .select(
                *([F.col("__id")] if keep_id else []),
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(__t) - 1), "
                        "i -> concat(__t[i - 1], ' ', __t[i]))"
                    )
                ).alias("g"),
            )
        )
        return uni.unionByName(big)

    def bucket_counts(df: DataFrame) -> DataFrame:
        return (
            gram_stream(df, keep_id=False)
            .select(bucket(F.col("g")).alias("b"))
            .groupBy("b")
            .agg(F.count("*").cast("long").alias("c"))
        )

    spine = spark.range(bcount).select(F.col("id").alias("b"))
    # per-(doc, bucket) counts computed ONCE and persisted: the raw
    # pool's bucket distribution is DERIVED from this table (Σ over
    # docs — identical exact integers), so the raw corpus is exploded
    # once, not once per consumer; tgt/rawc are n_buckets-row tables
    # persisted because each feeds its total AND the ratio join
    # (pre-change plan: 11 FileScan + 10 Generate in one action)
    doc_b = (
        gram_stream(raw, keep_id=True)
        .select("__id", bucket(F.col("g")).alias("b"))
        .groupBy("__id", "b")
        .agg(F.count("*").cast("long").alias("n"))
        .persist()
    )
    tgt = spine.join(bucket_counts(target), "b", "left").select(
        "b", F.coalesce("c", F.lit(0)).cast("long").alias("ct")
    ).persist()
    rawc = spine.join(
        doc_b.groupBy("b").agg(F.sum("n").cast("long").alias("c")),
        "b",
        "left",
    ).select(
        "b", F.coalesce("c", F.lit(0)).cast("long").alias("cr")
    ).persist()
    totals_t = tgt.agg(F.sum("ct").cast("double").alias("__tt"))
    totals_r = rawc.agg(F.sum("cr").cast("double").alias("__tr"))
    ratio = (
        tgt.join(rawc, "b")
        .crossJoin(F.broadcast(totals_t))
        .crossJoin(F.broadcast(totals_r))
        .select(
            "b",
            F.round(
                (
                    F.log(
                        (F.col("ct").cast("double") + F.lit(kk))
                        / (F.col("__tt") + F.lit(kk * bcount))
                    )
                    - F.log(
                        (F.col("cr").cast("double") + F.lit(kk))
                        / (F.col("__tr") + F.lit(kk * bcount))
                    )
                )
                * F.lit(1e9),
                0,
            )
            .cast("long")
            .alias("ld_nano"),
        )
    )
    per_doc = (
        doc_b.join(F.broadcast(ratio), "b")
        .groupBy("__id")
        .agg(
            F.sum("n").cast("long").alias("n_grams"),
            F.sum(F.col("n") * F.col("ld_nano")).cast("long").alias("__wn"),
        )
        .select(
            F.col("__id"),
            "n_grams",
            F.round(F.col("__wn").cast("double") / F.lit(1e9), 6).alias(
                "weight"
            ),
        )
    )
    return (
        raw.select(F.col(id_col).alias("__id"))
        .join(per_doc, "__id", "left")
        .select(
            F.col("__id").alias(id_col),
            F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
            F.coalesce("weight", F.lit(0.0)).alias("weight"),
        )
    )


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 256,
    top_n: int = 100,
    k: float = 0.5,
) -> DataFrame:
    """Deterministic DSIR selection: rank raw docs by
    :func:`dsir_weights` and keep the ``top_n`` (weight desc, id asc) —
    the greedy variant of the paper's Gumbel resampling (determinism is
    what makes the run verifiable cross-engine and resumable). The
    final cut is a TakeOrdered top-N, never a full sort."""
    from pyspark.sql import Window

    w = dsir_weights(
        raw, target, id_col=id_col, text_col=text_col,
        n_buckets=n_buckets, k=k,
    )
    return (
        w.orderBy(F.col("weight").desc(), F.col(id_col).asc())
        .limit(int(top_n))
        .withColumn(
            "rank",
            F.row_number().over(
                Window.orderBy(F.col("weight").desc(), F.col(id_col).asc())
            ),
        )
    )


FIM_PRE, FIM_SUF, FIM_MID = "<|fim_pre|>", "<|fim_suf|>", "<|fim_mid|>"


def fim_split(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    rate: float = 0.5,
    seed: str = "0",
) -> DataFrame:
    """Fill-in-the-middle transform (Bavarian et al. 2022 — the code-LLM
    pretraining augmentation): a deterministic ``rate`` fraction of
    documents is rewritten into PSM order (prefix, suffix, middle with
    sentinel tokens); the rest pass through untouched.

    All randomness is the repo's engine-portable md5 idiom — the apply
    decision is :func:`hash_fraction` and the two character cut points
    are independent md5-prefix integers mod ``len+1`` — so ANY engine
    (including the DuckDB oracle) reproduces every byte, and the
    transform is stable under retries/repartitioning. Cuts are
    character-level (the paper splits at character level specifically
    so spans need not align to token boundaries).

    Map-only: one projection, no shuffle, no UDF — at 10^12 turns this
    is a pure scan stage that fuses into whatever reads it. Returns
    ``(id, fim, prefix, middle, suffix, fim_text)`` where ``fim_text``
    is the training string (sentinel-joined PSM for FIM rows, the raw
    text otherwise)."""
    text = F.col(text_col)
    n = F.length(text)

    def cut(salt: str) -> Column:
        hx = F.md5(
            F.concat(F.lit(f"{seed}:{salt}:"), F.col(id_col).cast("string"))
        )
        return F.conv(F.substring(hx, 1, 8), 16, 10).cast("long") % (
            n.cast("long") + F.lit(1).cast("long")
        )

    c1, c2 = cut("fim1"), cut("fim2")
    lo, hi = F.least(c1, c2).cast("int"), F.greatest(c1, c2).cast("int")
    is_fim = hash_fraction(F.col(id_col), seed + ":fim") < F.lit(float(rate))
    prefix = F.when(is_fim, text.substr(F.lit(1), lo)).otherwise(text)
    middle = F.when(
        is_fim, text.substr(lo + F.lit(1), hi - lo)
    ).otherwise(F.lit(""))
    suffix = F.when(
        is_fim, text.substr(hi + F.lit(1), n - hi)
    ).otherwise(F.lit(""))
    fim_text = F.when(
        is_fim,
        F.concat(
            F.lit(FIM_PRE), prefix, F.lit(FIM_SUF), suffix,
            F.lit(FIM_MID), middle,
        ),
    ).otherwise(text)
    return df.select(
        F.col(id_col),
        is_fim.alias("fim"),
        prefix.alias("prefix"),
        middle.alias("middle"),
        suffix.alias("suffix"),
        fim_text.alias("fim_text"),
    )


def diversified_sample(
    df: DataFrame,
    key_col: str,
    order_by: Sequence[Column],
    max_per_key: int,
) -> DataFrame:
    """ES ``diversified_sampler`` aggregation: keep at most
    ``max_per_key`` rows per de-duplication key, choosing them by the
    deterministic ``order_by`` ranking (ES picks by shard order /
    score; a reproducible pipeline needs an explicit total order — pass
    tie-breaking columns). The standard anti-domination step before
    significant-terms / training-mix work: no source, author, or
    conversation may contribute more than the cap.

    One row_number window PARTITIONED BY the key — per-key state only,
    a hot key costs its own row count (the same skew shape as every
    grouped top-k here). Returns the input columns plus ``sample_rank``
    (1-based rank within the key)."""
    if max_per_key < 1:
        raise ValueError("max_per_key must be >= 1")
    w = Window.partitionBy(key_col).orderBy(*order_by)
    return (
        df.withColumn("sample_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("sample_rank") <= int(max_per_key))
    )
