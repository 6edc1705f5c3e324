"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Designed for 100 TB corpora:
* candidate generation is always bounded (hash groupBy / band buckets /
  shared-shingle equi-joins) — never an all-pairs cross join;
* every hash is a pure function of row values (md5-derived), so retries,
  speculative tasks, and re-runs are deterministic, and an independent
  SQL engine can reproduce results bit-for-bit for oracle checks;
* MinHash values are compared as hex STRINGS (min over lexicographic
  order) — portable across engines with no 64-bit integer-parsing
  mismatch risk.
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def shingles(text_col: str = "text", n: int = 3) -> Column:
    """n-token shingles from whitespace tokens (JVM expression)."""
    return F.expr(
        f"CASE WHEN size(split({text_col}, ' ')) >= {n} THEN "
        f"transform(sequence(1, size(split({text_col}, ' ')) - {n - 1}), "
        f"i -> concat_ws(' ', slice(split({text_col}, ' '), i, {n}))) "
        f"ELSE array() END"
    )


def exact_groups(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """(text_hash, dup_count, canonical_id): exact-duplicate clusters;
    one shuffle, map-side partial agg."""
    return df.groupBy(F.md5(text_col).alias("text_hash")).agg(
        F.count("*").alias("dup_count"), F.min(id_col).alias("canonical_id")
    )


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str = "text", k: int = 8, n: int = 3
) -> DataFrame:
    """k MinHash values per doc over n-token shingles: h_i = min over
    shingles of md5('i:'||shingle). One explode + one groupBy."""
    ex = df.select(id_col, F.explode(shingles(text_col, n)).alias("g"))
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("g")))).alias(f"h{i}")
        for i in range(k)
    ]
    return ex.groupBy(id_col).agg(*aggs)


def lsh_candidate_pairs(
    sigs: DataFrame,
    id_col: str,
    k: int = 8,
    rows_per_band: int = 2,
    collapse_exact: bool = True,
    max_bucket_size: Optional[int] = 10_000,
) -> DataFrame:
    """(a, b) candidate edges connecting docs that share at least one LSH
    band bucket. Band key = concat of the band's minhash values; the
    self-join is an equi-join on (band_idx, band_key) — shuffle-bounded,
    never a cross join.

    Skew bounds (the two ways a 100 TB run blows up without them):

    * ``collapse_exact`` (default on): docs with IDENTICAL full
      signatures — exact/near-exact duplicate clusters, the classic web
      boilerplate case — are collapsed to one representative (min id)
      before the band join. The cluster's members attach via LINEAR star
      edges (rep, member) instead of |cluster|²/2 clique pairs, and only
      representatives enter band buckets. The output is therefore a
      candidate GRAPH, not the full pair relation: its connected
      components equal the naive all-pairs components (any naive pair
      (a, b) maps to the rep pair (rep(a), rep(b)) plus the two stars),
      which is the property downstream clustering needs.
    * ``max_bucket_size``: band buckets holding more than this many
      representatives contribute NO pairs (the spill rule). Such buckets
      are boilerplate signatures whose pair expansion is quadratic;
      membership alone says little at that density. Set None to disable.
    """
    hcols = [f"h{i}" for i in range(k)]
    star = None
    if collapse_exact:
        reps = sigs.groupBy(*hcols).agg(F.min(id_col).alias("__rep"))
        with_rep = sigs.join(reps, hcols)
        star = (
            with_rep.filter(F.col(id_col) != F.col("__rep"))
            .select(F.col("__rep").alias("a"), F.col(id_col).alias("b"))
        )
        base = reps.select(F.col("__rep").alias(id_col), *hcols)
    else:
        base = sigs

    bands = []
    for b in range(k // rows_per_band):
        cols = [f"h{b * rows_per_band + r}" for r in range(rows_per_band)]
        bands.append(
            F.struct(F.lit(b).alias("band"), F.concat_ws("|", *cols).alias("key"))
        )
    e = base.select(
        F.col(id_col), F.explode(F.array(*bands)).alias("bk")
    ).select(id_col, "bk.band", "bk.key")
    if max_bucket_size is not None:
        ok_buckets = (
            e.groupBy("band", "key")
            .agg(F.count("*").alias("__bsz"))
            .filter(F.col("__bsz") <= max_bucket_size)
            .select("band", "key")
        )
        e = e.join(ok_buckets, ["band", "key"])
    x, y = e.alias("x"), e.alias("y")
    pairs = (
        x.join(y, ["band", "key"])
        .filter(F.col(f"x.{id_col}") < F.col(f"y.{id_col}"))
        .select(
            F.col(f"x.{id_col}").alias("a"), F.col(f"y.{id_col}").alias("b")
        )
        .distinct()
    )
    return pairs.unionByName(star) if star is not None else pairs


def band_keys(
    sigs: DataFrame, id_col: str, k: int = 8, rows_per_band: int = 2
) -> DataFrame:
    """(id, band, bkey) LSH band rows from a signature table: band key =
    '|'-joined minhash values of the band's rows (same key construction
    as :func:`lsh_candidate_pairs`)."""
    bands = []
    for b in range(k // rows_per_band):
        cols = [f"h{b * rows_per_band + r}" for r in range(rows_per_band)]
        bands.append(
            F.struct(F.lit(b).alias("band"), F.concat_ws("|", *cols).alias("bkey"))
        )
    return sigs.select(
        F.col(id_col), F.explode(F.array(*bands)).alias("bk")
    ).select(id_col, "bk.band", "bk.bkey")


def incremental_dedup(
    new_df: DataFrame,
    old_sigs: DataFrame,
    id_col: str,
    text_col: str = "text",
    k: int = 8,
    n: int = 3,
    rows_per_band: int = 2,
) -> DataFrame:
    """Dedup a NEW batch against an already-signed historical corpus:
    (id, kept, dup_of) for every new doc. The daily-crawl flow at scale —
    history is represented ONLY by its MinHash signature table (k hex
    strings per doc, ~100 bytes/doc, built once by
    :func:`minhash_signatures`); the old corpus text is never re-read or
    re-tokenized, and old×old is never re-examined.

    Drop policy (deterministic, one pass, no iteration):

    * a new doc sharing ≥1 LSH band bucket with ANY historical doc is
      dropped with ``dup_of`` = the smallest colliding old id;
    * otherwise, a new doc sharing a band bucket with a SMALLER new id
      is dropped with ``dup_of`` = the smallest such id ("min id wins
      per bucket" — the standard LSH-dedup batch rule; slightly stricter
      than connected-component keep-first since the smaller id may
      itself have been dropped against history);
    * otherwise ``kept`` is true (including docs too short to produce
      any n-token shingle — no signature, no collisions).

    Skew-free by construction: both collision joins are aggregate-then-
    join on the unique ``(band, bkey)`` bucket key — the old side
    collapses to ``min(old_id)`` per bucket and the new side to
    ``min(new_id)`` per bucket BEFORE joining, so a boilerplate bucket
    holding a million docs contributes exactly one row to each join
    (contrast the pair-expansion d²/2 blow-up that
    :func:`lsh_candidate_pairs` needs a bucket cap for). No self-join,
    no pair materialization, output is exactly one row per new doc.
    """
    sigs = minhash_signatures(new_df, id_col, text_col, k=k, n=n)
    nb = band_keys(sigs, id_col, k, rows_per_band)
    ob = (
        band_keys(old_sigs, id_col, k, rows_per_band)
        .groupBy("band", "bkey")
        .agg(F.min(id_col).alias("__omin"))
    )
    bmin = nb.groupBy("band", "bkey").agg(F.min(id_col).alias("__nmin"))
    old_hit = (
        nb.join(ob, ["band", "bkey"])
        .groupBy(id_col)
        .agg(F.min("__omin").alias("__dup_old"))
    )
    new_hit = (
        nb.join(bmin, ["band", "bkey"])
        .filter(F.col("__nmin") < F.col(id_col))
        .groupBy(id_col)
        .agg(F.min("__nmin").alias("__dup_new"))
    )
    return (
        new_df.select(id_col)
        .join(old_hit, id_col, "left")
        .join(new_hit, id_col, "left")
        .select(
            id_col,
            (F.col("__dup_old").isNull() & F.col("__dup_new").isNull()).alias(
                "kept"
            ),
            F.coalesce("__dup_old", "__dup_new").alias("dup_of"),
        )
    )


def jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    max_shingle_df: Optional[int] = None,
) -> DataFrame:
    """(a, b, jaccard) over distinct n-token shingles, candidates from
    shared shingles (equi-join on the shingle).

    ``max_shingle_df`` bounds skew: a shingle appearing in d docs emits
    d²/2 join rows, so one ubiquitous shingle ("the of a …") makes the
    candidate join quadratic in its document frequency. With the cap,
    shingles with df > max_shingle_df are EXCLUDED from the shingle
    universe entirely — both candidate generation and the jaccard
    numerator/denominator use the capped universe, so the score stays a
    true Jaccard (of the informative shingle sets) rather than a biased
    ratio. This is the standard df-cut from near-dup literature; near
    duplicates still share many rare shingles.

    Physical plans (chosen by the cap, same result semantics):

    * capped — posting-list plan: ONE groupBy on the shingle absorbs the
      distinct AND the df-cut (``collect_set`` dedups, ``size(ids)``
      filters), and candidate pairs come from in-row array combinations
      (bounded by the cap, ≤ cap²/2 per shingle) — no df-cut join, no
      self-join, and the corpus is scanned/exploded once per consumer
      instead of four times.
    * uncapped — equi-join plan: posting lists are unbounded, so rows
      stream through the shingle self-join instead of materializing a
      per-shingle array (a ubiquitous shingle would otherwise put its
      whole posting list in one row)."""
    if max_shingle_df is not None:
        # persisted: the capped posting table feeds BOTH the per-doc
        # cardinalities and the pair combinations, and card feeds two
        # joins (a-side, b-side) — without the caches the corpus
        # shingle explode+groupBy lineage ran three times per action
        # (measured: 3 FileScan + 6 Generate at sf0.1, zero reuse)
        post = (
            df.select(id_col, F.explode(shingles(text_col, n)).alias("g"))
            .groupBy("g")
            .agg(F.array_sort(F.collect_set(id_col)).alias("ids"))
            .filter(F.size("ids") <= max_shingle_df)
            .persist()
        )
        card = (
            post.select(F.explode("ids").alias(id_col))
            .groupBy(id_col)
            .agg(F.count("*").alias("c"))
            .persist()
        )
        combos = F.expr(
            "flatten(transform(ids, (x, i) -> "
            "transform(slice(ids, i + 2, size(ids)), "
            "y -> named_struct('a', x, 'b', y))))"
        )
        pairs = (
            post.select(F.explode(combos).alias("p"))
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.count("*").alias("common"))
        )
    else:
        # same sharing: e feeds card + both sides of the self-join
        e = df.select(
            id_col, F.explode(shingles(text_col, n)).alias("g")
        ).distinct().persist()
        card = e.groupBy(id_col).agg(F.count("*").alias("c")).persist()
        x, y = e.alias("x"), e.alias("y")
        pairs = (
            x.join(y, "g")
            .filter(F.col(f"x.{id_col}") < F.col(f"y.{id_col}"))
            .groupBy(
                F.col(f"x.{id_col}").alias("a"), F.col(f"y.{id_col}").alias("b")
            )
            .agg(F.count("*").alias("common"))
        )
    ca = card.select(F.col(id_col).alias("a"), F.col("c").alias("ca"))
    cb = card.select(F.col(id_col).alias("b"), F.col("c").alias("cb"))
    jac = F.col("common") / (F.col("ca") + F.col("cb") - F.col("common"))
    return (
        pairs.join(ca, "a")
        .join(cb, "b")
        .withColumn("jaccard", F.round(jac, 6))
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )


def cluster_pairs(
    ids: DataFrame, pairs: DataFrame, id_col: str, max_iters: int = 50
) -> DataFrame:
    """Connected components over a near-duplicate pair graph by
    min-label propagation: (id, cluster_id) where cluster_id is the
    smallest doc id in the component (singletons keep their own id).

    The iterative shape for Spark: each round is one join + one groupBy
    (both equi-shuffles on id); rounds needed = graph diameter, which
    for near-dup graphs is tiny (clusters are cliques or short chains).
    Deterministic: labels are pure min-folds over ids."""
    labels = ids.select(F.col(id_col).alias("id")).withColumn(
        "label", F.col("id")
    ).persist()
    edges = (
        pairs.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .unionByName(pairs.select(F.col("b").alias("src"), F.col("a").alias("dst")))
        .persist()
    )
    for _ in range(max_iters):
        nbr = (
            edges.join(labels, edges["dst"] == labels["id"])
            .groupBy("src")
            .agg(F.min("label").alias("nlabel"))
        )
        new = (
            labels.join(nbr, labels["id"] == nbr["src"], "left")
            .select(
                labels["id"],
                F.least(
                    labels["label"], F.coalesce(nbr["nlabel"], labels["label"])
                ).alias("label"),
            )
            .persist()
        )
        changed = (
            new.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels.unpersist()
        labels = new
        if changed == 0:
            break
    edges.unpersist()
    return labels.select(F.col("id").alias(id_col), F.col("label").alias("cluster_id"))


def simhash(
    df: DataFrame, id_col: str, text_col: str = "text", bits: int = 32
) -> DataFrame:
    """``bits``-bit SimHash from md5 nibbles of whitespace tokens,
    weighted by in-doc term frequency. Pure JVM expressions."""
    t = (
        df.select(id_col, F.explode(F.split(text_col, " ")).alias("tok"))
        .groupBy(id_col, "tok")
        .agg(F.count("*").alias("cnt"))
        .withColumn("h", F.md5("tok"))
    )
    aggs = []
    for j in range(bits):
        pos, bit = j // 4 + 1, 3 - j % 4
        aggs.append(
            F.sum(
                F.expr(
                    f"CASE WHEN ((instr('0123456789abcdef', substring(h, {pos}, 1)) - 1) >> {bit}) & 1 = 1 "
                    f"THEN cnt ELSE -cnt END"
                )
            ).alias(f"s{j}")
        )
    g = t.groupBy(id_col).agg(*aggs)
    sim = F.lit(0).cast("long")
    for j in range(bits):
        sim = sim + F.when(F.col(f"s{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
    return g.select(id_col, sim.cast("long").alias("simhash"))


def decontaminate(
    df: DataFrame,
    id_col: str,
    ref_df: DataFrame,
    text_col: str = "text",
    ref_text_col: Optional[str] = None,
    n: int = 3,
    min_hits: int = 1,
) -> DataFrame:
    """Benchmark decontamination: per-document count of DISTINCT
    ``n``-token shingles shared with a reference set (the test/benchmark
    documents a training corpus must not leak), plus the resulting
    ``contaminated`` flag (``n_overlap >= min_hits``).

    Plan: both sides explode to distinct (id, gram) / (gram) rows; the
    overlap is ONE equi-join on the gram. The join is inherently
    skew-safe — the reference gram set is distinct, so every corpus
    (doc, gram) row matches at most one reference row and the join
    output is bounded by the corpus gram count; no df-cut is needed
    (unlike the pair join in ``jaccard_pairs``). The reference side is
    benchmark-sized and broadcasts under AQE when small. Documents with
    no overlap keep n_overlap = 0 (left join back to the id universe).
    """
    ref_grams = (
        ref_df.select(
            F.explode(shingles(ref_text_col or text_col, n)).alias("g")
        ).distinct()
    )
    e = df.select(
        id_col, F.explode(shingles(text_col, n)).alias("g")
    ).distinct()
    hits = (
        e.join(ref_grams, "g")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_overlap"))
    )
    return (
        df.select(id_col)
        .join(hits, id_col, "left")
        .withColumn(
            "n_overlap", F.coalesce(F.col("n_overlap"), F.lit(0)).cast("long")
        )
        .withColumn("contaminated", F.col("n_overlap") >= F.lit(min_hits))
    )


def dedup_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    span: int = 5,
) -> DataFrame:
    """Cross-document duplicated-SPAN removal — the exact-substring
    dedup of Lee et al. 2022 ("Deduplicating Training Data Makes
    Language Models Better"), n-gram-approximated: their suffix array
    finds duplicated byte ranges; here a token ``span``-gram marks a
    duplicated range, which is what a distributed engine can do in
    bounded aggregations (a global suffix array is a single giant sort).

    Semantics: tokenize on whitespace (empties dropped, tokens
    renumbered 0..n-1 per doc); every window of ``span`` consecutive
    tokens is a gram; a gram occurring more than once corpus-wide is
    duplicated; its globally FIRST occurrence (min (doc_id, rank)) is
    canonical and survives; every token covered by any NON-canonical
    occurrence of a duplicated gram is dropped. Overlapping duplicated
    grams chain, so a long repeated region disappears wholesale (keeping
    its first occurrence), exactly like the suffix-array method.

    Returns (id_col, n_tokens, n_dropped, clean_text) for EVERY input
    row. Plan: one per-doc window (rank + leads — per-doc-bounded
    state), one gram aggregation (count + algebraic min canonical, so
    map-side combine bounds the shuffle at distinct-gram size), one
    join back (each occurrence meets exactly one stats row — no pair
    expansion; a hot gram costs its own occurrence count, never a
    product), one anti-join, one per-doc reassembly groupBy."""
    from pyspark.sql import Window

    sep = "\x1f"
    w = Window.partitionBy(id_col).orderBy("__p")
    toks = (
        df.select(
            id_col, F.posexplode(F.split(text_col, " ")).alias("__p", "tok")
        )
        .filter(F.col("tok") != "")
        .select(
            id_col,
            "tok",
            (F.row_number().over(w) - 1).alias("r"),
            F.count("*").over(Window.partitionBy(id_col)).alias("__n"),
        )
    )
    wr = Window.partitionBy(id_col).orderBy("r")
    parts = [F.col("tok")] + [
        F.lead("tok", i).over(wr) for i in range(1, span)
    ]
    # concat_ws skips NULLs, so gate on the farthest lead (leads are
    # monotone within the partition: only the last span-1 ranks lack one)
    gram = F.when(
        parts[-1].isNotNull(), F.concat_ws(sep, *parts)
    ).alias("gram")
    occ = toks.select(id_col, "r", gram).filter(F.col("gram").isNotNull())
    stats = (
        occ.groupBy("gram")
        .agg(
            F.count("*").alias("__cnt"),
            F.min(F.struct(F.col(id_col), F.col("r"))).alias("__can"),
        )
        .filter(F.col("__cnt") > 1)
    )
    bad = occ.join(stats, "gram").filter(
        ~(
            (F.col(id_col) == F.col(f"__can.{id_col}"))
            & (F.col("r") == F.col("__can.r"))
        )
    )
    covered = bad.select(
        id_col, F.explode(F.sequence(F.col("r"), F.col("r") + span - 1)).alias("r")
    ).distinct()
    kept = toks.join(covered, [id_col, "r"], "left_anti")
    agg = kept.groupBy(id_col).agg(
        F.max("__n").alias("n_tokens"),
        F.count("*").alias("n_kept"),
        F.concat_ws(
            " ",
            F.transform(
                F.sort_array(F.collect_list(F.struct("r", "tok"))),
                lambda x: x["tok"],
            ),
        ).alias("clean_text"),
    )
    totals = toks.groupBy(id_col).agg(F.max("__n").alias("__tot"))
    return (
        df.select(id_col)
        .join(totals, id_col, "left")
        .join(agg.drop("n_tokens"), id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("__tot"), F.lit(0)).cast("long").alias("n_tokens"),
            (
                F.coalesce(F.col("__tot"), F.lit(0))
                - F.coalesce(F.col("n_kept"), F.lit(0))
            ).cast("long").alias("n_dropped"),
            F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
        )
    )
