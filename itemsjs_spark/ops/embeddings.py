"""Similarity search over embedding columns (array<float>).

* ``cosine_topk`` — exact brute-force baseline: broadcast the (small)
  query set against the corpus; JVM-side ``zip_with``/``aggregate`` dot
  products (no Python), per-query top-k via a window.
* ``lsh_bucketed_topk`` — the scale path: deterministic random-
  hyperplane LSH restricts candidates to same-bucket rows before exact
  re-ranking. Recall is tunable via n_planes (fewer planes → bigger
  buckets → higher recall). The hyperplanes derive from a seeded LCG so
  any engine (incl. the DuckDB oracle) reproduces the bucketing exactly.
* ``ivf_topk`` — IVF-style variant: k-means-free coarse quantization
  (hyperplane sign pattern = the inverted-file cell key); queries probe
  their own cell PLUS every cell at Hamming distance ≤ n_probe_bits
  (multi-probe), trading a bounded candidate-set growth (1 + planes
  cells per query) for much higher recall than single-cell LSH.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Union

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b)))


def lsh_planes(n_planes: int = 8, dim: int = 64) -> List[List[int]]:
    """Deterministic ±1 hyperplanes from a 64-bit LCG (seeded)."""
    planes = []
    state = 0x9E3779B97F4A7C15
    for _ in range(n_planes):
        row = []
        for _ in range(dim):
            state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
            row.append(1 if (state >> 33) & 1 else -1)
        planes.append(row)
    return planes


def lsh_bucket(emb: Column, planes: Sequence[Sequence[int]]) -> Column:
    return F.concat(
        *[
            F.when(
                _dot(emb, F.lit(list(p)).cast("array<double>")) >= 0, F.lit("1")
            ).otherwise(F.lit("0"))
            for p in planes
        ]
    )


def probe_cells(bucket: Column, n_planes: int) -> Column:
    """The multi-probe cell set for a sign-pattern key: the cell itself
    plus each single-bit flip (all distinct, so no candidate dedup is
    needed downstream)."""
    flips = []
    for i in range(n_planes):
        flipped = F.when(
            F.substring(bucket, i + 1, 1) == "1", F.lit("0")
        ).otherwise(F.lit("1"))
        flips.append(
            F.concat(
                F.substring(bucket, 1, i),
                flipped,
                F.substring(bucket, i + 2, n_planes - i - 1),
            )
        )
    return F.array(bucket, *flips)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    k: int = 10,
    n_planes: int = 8,
    dim: int = 64,
) -> DataFrame:
    """IVF-style approximate top-k: corpus rows live in ONE coarse cell
    (hyperplane sign pattern); each query probes its cell + all
    Hamming-1 neighbors, then candidates re-rank by exact cosine.
    Candidate generation is an equi-join on the cell key — at corpus
    scale the probed-cell fan-out is 1 + n_planes broadcast rows per
    query, never a cross join."""
    planes = lsh_planes(n_planes, dim)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(emb_col).cast("array<double>").alias("emb"),
    ).withColumn("cell", lsh_bucket(F.col("emb"), planes))
    q = (
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(emb_col).cast("array<double>").alias("qe"),
        )
        .withColumn("qcell", lsh_bucket(F.col("qe"), planes))
        .withColumn("cell", F.explode(probe_cells(F.col("qcell"), n_planes)))
    )
    cand = c.join(F.broadcast(q), "cell").filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    scored = cand.select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("qe"), F.col("emb")), 6).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def cosine_neardup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    threshold: float = 0.9,
    n_planes: int = 8,
    dim: int = 64,
    max_cell_size: int | None = 10_000,
) -> DataFrame:
    """Embedding-cosine near-duplicate PAIRS: candidates are rows sharing
    an LSH cell (equi-join on the sign-pattern key — never a cross
    join), verified by exact cosine at ``threshold``. The task-brief
    dedup family's embedding member, shaped like ``dedup.jaccard_pairs``.

    ``max_cell_size`` is the skew spill rule (mirrors
    ``lsh_candidate_pairs``, same default — ON): a cluster of
    near-identical vectors puts its whole mass in one cell and makes the
    self-join quadratic there — cells above the cap are dropped from
    PAIR GENERATION (their members are better handled by exact dedup
    first; documented recall trade-off, bounded cost). Pass ``None`` to
    disable (small corpora only)."""
    planes = lsh_planes(n_planes, dim)
    e = df.select(
        F.col(id_col).alias("id"),
        F.col(emb_col).cast("array<double>").alias("emb"),
    ).withColumn("cell", lsh_bucket(F.col("emb"), planes))
    if max_cell_size is not None:
        ok = (
            e.groupBy("cell")
            .agg(F.count("*").alias("__n"))
            .filter(F.col("__n") <= max_cell_size)
            .select("cell")
        )
        e = e.join(ok, "cell")
    a = e.select("cell", F.col("id").alias("id_a"), F.col("emb").alias("ea"))
    b = e.select("cell", F.col("id").alias("id_b"), F.col("emb").alias("eb"))
    return (
        a.join(b, "cell")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(cosine(F.col("ea"), F.col("eb")), 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact top-k: (query_id, neighbor_id, cosine). ``queries`` must be
    broadcastable (the usual shape: few query vectors vs a huge corpus)."""
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(emb_col).cast("array<double>").alias("emb"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(emb_col).cast("array<double>").alias("qe"),
    )
    j = c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
    scored = j.select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("qe"), F.col("emb")), 6).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def lsh_bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    k: int = 10,
    n_planes: int = 8,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH
    bucket, then exact cosine re-rank. At corpus scale the bucket join
    is an equi-join on the bucket key (shuffle-bounded)."""
    planes = lsh_planes(n_planes, dim)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(emb_col).cast("array<double>").alias("emb"),
    ).withColumn("bucket", lsh_bucket(F.col("emb"), planes))
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(emb_col).cast("array<double>").alias("qe"),
    ).withColumn("qbucket", lsh_bucket(F.col("qe"), planes))
    cand = c.join(
        F.broadcast(q),
        (F.col("bucket") == F.col("qbucket"))
        & (F.col("neighbor_id") != F.col("query_id")),
    )
    scored = cand.select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("qe"), F.col("emb")), 6).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def mmr_rerank(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    k: int = 5,
    fetch: int = 20,
    lam: float = 0.7,
    mu: float = 0.3,
) -> DataFrame:
    """Diversified top-k via maximal marginal relevance: from each
    query's top-``fetch`` exact-cosine candidates, greedily select ``k``
    maximizing ``lam*rel(c) - mu*max_sim(c, selected)`` (Carbonell &
    Goldstein 1998). (query_id, neighbor_id, rank, cosine).

    Distributed shape: the candidate fetch and the fetch² pairwise-sim
    matrix are JVM DataFrame work (broadcast queries, bounded
    ``fetch*(fetch-1)`` rows per query); only the inherently sequential
    greedy loop runs in Python — one Arrow ``applyInPandas`` group per
    query with state bounded by the candidate set, never the corpus.

    Determinism contract (mirrored by the SQL oracle): rel and sim are
    rounded to 6 decimals JVM-side BEFORE any decision; the MMR score
    is evaluated as ``lam*rel - mu*maxsim`` (both constants explicit —
    ``mu`` is a parameter, not ``1-lam``, so both engines use the same
    double literal); ties break on the smaller neighbor id.
    """
    from pyspark.sql.types import (
        DoubleType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    cands = cosine_topk(corpus, queries, id_col, emb_col, k=fetch)
    emb = corpus.select(
        F.col(id_col).alias("__id"),
        F.col(emb_col).cast("array<double>").alias("__e"),
    )
    a = (
        cands.select("query_id", F.col("neighbor_id").alias("a"),
                     F.col("cosine").alias("rel_a"))
        .join(emb, F.col("a") == F.col("__id"))
        .select("query_id", "a", "rel_a", F.col("__e").alias("ea"))
    )
    b = (
        cands.select(F.col("query_id").alias("qb"),
                     F.col("neighbor_id").alias("b"))
        .join(emb, F.col("b") == F.col("__id"))
        .select("qb", "b", F.col("__e").alias("eb"))
    )
    pairs = (
        a.join(b, (F.col("query_id") == F.col("qb")))
        .select(
            "query_id", "a", "rel_a", "b",
            F.when(
                F.col("a") != F.col("b"),
                F.round(cosine(F.col("ea"), F.col("eb")), 6),
            ).alias("sim"),
        )
    )

    schema = StructType(
        [
            StructField("query_id", LongType()),
            StructField("neighbor_id", LongType()),
            StructField("rank", IntegerType()),
            StructField("cosine", DoubleType()),
        ]
    )

    def greedy(pdf):
        import pandas as pd

        rel = {}
        sim = {}
        for r in pdf.itertuples(index=False):
            rel[r.a] = r.rel_a
            if r.sim == r.sim and r.sim is not None:  # skip a==b NULLs
                sim[(r.a, r.b)] = r.sim
        qid = pdf["query_id"].iloc[0]
        remaining = set(rel)
        picked = []
        out = []
        while remaining and len(picked) < k:
            if not picked:
                best = min(remaining, key=lambda c: (-rel[c], c))
            else:
                def score(c):
                    ms = max(sim[(c, s)] for s in picked)
                    return lam * rel[c] - mu * ms
                best = min(remaining, key=lambda c: (-score(c), c))
            picked.append(best)
            remaining.discard(best)
            out.append((qid, best, len(picked), rel[best]))
        return pd.DataFrame(
            out, columns=["query_id", "neighbor_id", "rank", "cosine"]
        )

    return pairs.groupBy("query_id").applyInPandas(greedy, schema)


def _sqdist(a: Column, b: Column) -> Column:
    d = F.zip_with(a, b, lambda x, y: (x - y) * (x - y))
    return F.aggregate(d, F.lit(0.0), lambda acc, v: acc + v)


def kmeans_fit(
    corpus: DataFrame,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    k: int = 4,
    iters: int = 3,
    init_ids: Optional[Sequence[int]] = None,
):
    """Lloyd's k-means over an embedding column, engine-portable:
    returns ``(centroids, assignments)`` where centroids is the ordered
    ``[(cluster, vector)]`` list after ``iters`` updates and assignments
    is ``(id, cluster)`` under the final centroids.

    Distributed shape per iteration: centroids broadcast as literals
    (k·dim doubles), assignment is a map-only argmin over k rounded
    squared distances (ties to the smaller cluster id), the update is
    ONE posexplode + groupBy(cluster, dim) mean — k·dim rows collect to
    the driver. Nothing corpus-sized ever leaves the executors; the
    sequential part is the ``iters`` loop itself, which is the
    algorithm, not a scale compromise.

    Portability contract (the same one MMR uses): every DECISION input
    is rounded to 6 decimals first — squared distances before the
    argmin, centroid coordinates after each mean — so an independent
    engine (the DuckDB oracle unrolls the same ``iters`` stages as
    plain CTEs) reproduces assignments exactly. Initial centroids are
    the ``init_ids`` rows (default: the k smallest ids), numbered 0..k-1
    in ascending id order. A cluster that loses all members drops out
    (consistent across engines)."""
    e = corpus.select(
        F.col(id_col).alias("__id"),
        F.col(emb_col).cast("array<double>").alias("__v"),
    )
    if init_ids is None:
        init_ids = [r["__id"] for r in e.orderBy("__id").limit(k).collect()]
    init_ids = sorted(init_ids)
    got = {
        r["__id"]: list(r["__v"])
        for r in e.filter(F.col("__id").isin(list(init_ids))).collect()
    }
    cents = [(i, got[d]) for i, d in enumerate(init_ids)]

    def assign(cents_list):
        structs = [
            F.struct(
                F.round(
                    _sqdist(F.col("__v"), F.lit(c).cast("array<double>")), 6
                ).alias("d"),
                F.lit(int(cl)).cast("long").alias("cl"),
            )
            for cl, c in cents_list
        ]
        return e.withColumn("cl", F.array_min(F.array(*structs))["cl"])

    for _ in range(iters):
        rows = (
            assign(cents)
            .select("cl", F.posexplode("__v").alias("pos", "val"))
            .groupBy("cl", "pos")
            .agg(F.round(F.avg("val"), 6).alias("m"))
            .collect()
        )
        acc = {}
        for r in rows:
            acc.setdefault(r["cl"], {})[r["pos"]] = r["m"]
        cents = [
            (cl, [dims[p] for p in sorted(dims)])
            for cl, dims in sorted(acc.items())
        ]
    out = assign(cents).select(
        F.col("__id").alias(id_col), F.col("cl").alias("cluster")
    )
    return cents, out


def ivf_kmeans_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    k: int = 10,
    n_probe: int = 2,
) -> DataFrame:
    """IVF over TRAINED coarse centroids (the canonical inverted-file
    ANN, vs ``ivf_topk``'s hyperplane cells): corpus rows assign to
    their nearest centroid cell map-only; each query probes its
    ``n_probe`` nearest cells and reranks exactly inside them.
    ``centroids`` is ``kmeans_fit``'s ordered [(cluster, vector)] list —
    broadcast as literals, so assignment adds no join. Same decision
    rounding as ``kmeans_fit`` (distances to 6 decimals, ties to the
    smaller cluster), so the oracle reproduces cells and probes exactly.
    Candidate work per query is bounded by its probed cells' sizes,
    never the corpus."""

    def cell_structs(v):
        return F.array(
            *[
                F.struct(
                    F.round(
                        _sqdist(v, F.lit(c).cast("array<double>")), 6
                    ).alias("d"),
                    F.lit(int(cl)).cast("long").alias("cl"),
                )
                for cl, c in centroids
            ]
        )

    e = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(emb_col).cast("array<double>").alias("emb"),
    ).withColumn("cell", F.array_min(cell_structs(F.col("emb")))["cl"])
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(emb_col).cast("array<double>").alias("qe"),
    )
    probes = F.transform(
        F.slice(F.array_sort(cell_structs(F.col("qe"))), 1, n_probe),
        lambda s: s["cl"],
    )
    qp = q.select("query_id", "qe", F.explode(probes).alias("qcell"))
    j = e.join(
        F.broadcast(qp),
        (F.col("cell") == F.col("qcell"))
        & (F.col("neighbor_id") != F.col("query_id")),
    )
    scored = j.select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("qe"), F.col("emb")), 6).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def semdedup(
    corpus: DataFrame,
    centroids,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    threshold: float = 0.95,
    max_cluster_size: Optional[int] = 10_000,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): SEMANTIC
    deduplication — cluster the embedding space with k-means, then
    inside each cluster drop every row whose cosine to a SMALLER-id
    row of the same cluster reaches ``threshold`` (keep-first; the
    deterministic stand-in for the paper's keep-farthest-from-centroid,
    same dedup set shape). Returns (id, cluster, keep) for the whole
    corpus — filter ``keep`` to materialize the deduplicated set.

    ``centroids`` is ``kmeans_fit``'s ordered [(cluster, vector)] list:
    training is the caller's one-time step; this pass is then map-only
    assignment (broadcast-literal centroids, the exact rounded-argmin
    decision grid ``kmeans_fit``/``ivf_kmeans_topk`` use) plus a
    WITHIN-CLUSTER self-join — the whole point of SemDeDup is that k
    scales with N (k ≈ N/target_cluster_size) so the quadratic stays
    per-cluster-bounded. ``max_cluster_size`` is the same skew spill
    rule as ``cosine_neardup_pairs``: clusters past the cap skip pair
    generation (their rows all keep; a mega-cluster means k was chosen
    too small — resize k, don't melt one join task)."""

    def cell_structs(v):
        return F.array(
            *[
                F.struct(
                    F.round(
                        _sqdist(v, F.lit(c).cast("array<double>")), 6
                    ).alias("d"),
                    F.lit(int(cl)).cast("long").alias("cl"),
                )
                for cl, c in centroids
            ]
        )

    e = corpus.select(
        F.col(id_col).alias("id"),
        F.col(emb_col).cast("array<double>").alias("emb"),
    ).withColumn("cluster", F.array_min(cell_structs(F.col("emb")))["cl"])
    paired = e
    if max_cluster_size is not None:
        ok = (
            e.groupBy("cluster")
            .agg(F.count("*").alias("__n"))
            .filter(F.col("__n") <= max_cluster_size)
            .select("cluster")
        )
        paired = e.join(ok, "cluster")
    a = paired.select(
        "cluster", F.col("id").alias("id_a"), F.col("emb").alias("ea")
    )
    b = paired.select(
        "cluster", F.col("id").alias("id_b"), F.col("emb").alias("eb")
    )
    dups = (
        a.join(b, "cluster")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(
            F.round(cosine(F.col("ea"), F.col("eb")), 6)
            >= F.lit(float(threshold))
        )
        .select(F.col("id_b").alias("id"))
        .distinct()
    )
    return (
        e.join(dups.withColumn("__dup", F.lit(True)), "id", "left")
        .select(
            "id",
            "cluster",
            F.coalesce(~F.col("__dup"), F.lit(True)).alias("keep"),
        )
    )


def hard_negatives(
    corpus: DataFrame,
    queries: DataFrame,
    positives: DataFrame,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    k: int = 10,
    candidates: Optional[DataFrame] = None,
) -> DataFrame:
    """Hard-negative mining for contrastive / embedding training: for
    each query vector, the ``k`` most-cosine-similar corpus items that
    are NOT the query itself and NOT one of its labelled positives —
    exactly the "hardest" negatives a contrastive loss wants.

    ``positives``: (query_id, positive_id) — the labelled pairs to
    exclude.  Exclusion happens BEFORE the per-query top-k window, so
    the output is always k true negatives (not k minus however many
    positives happened to rank high).

    Scale shape: queries and positives are the small sides (broadcast);
    the corpus side is one scored scan + a per-query top-k window —
    identical to ``cosine_topk``.  At 10^12-doc scale pass
    ``candidates`` (any (query_id, neighbor_id, cosine) table from an
    ANN generator such as ``ivf_kmeans_topk`` with an over-fetched k)
    and only the anti-join + window run here.
    """
    if candidates is None:
        c = corpus.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(emb_col).cast("array<double>").alias("emb"),
        )
        q = queries.select(
            F.col(id_col).alias("query_id"),
            F.col(emb_col).cast("array<double>").alias("qe"),
        )
        j = c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        candidates = j.select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qe"), F.col("emb")), 6).alias("cosine"),
        )
    pos = positives.select(
        F.col(positives.columns[0]).alias("query_id"),
        F.col(positives.columns[1]).alias("neighbor_id"),
    )
    negs = candidates.join(
        F.broadcast(pos), ["query_id", "neighbor_id"], "left_anti"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        negs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def quantize_int8(
    corpus: DataFrame, id_col: str = "vec_id", emb_col: str = "embedding"
) -> DataFrame:
    """Per-dimension affine int8 scalar quantization — the standard
    4x compression applied to an embedding column before ANN serving
    (FAISS SQ8 semantics). Returns one row per input row:
    ``(id, qvec array<int> in [-128,127], max_abs_err)`` where qvec[i] =
    round((v[i]-mn_i)/(mx_i-mn_i)*255) - 128 under the corpus-global
    per-dimension (mn, mx), and max_abs_err is the vector's worst
    dequantization error (rounded 6).

    Distributed shape: ONE posexplode + groupBy(dim) min/max aggregate
    (d rows — map-side combined, shuffle volume d x partitions), the d
    stats rows fold into a single array row that broadcast-joins the
    corpus, and the quantize itself is a map-only JVM ``transform``
    inside the scan's codegen stage. Nothing Python, nothing
    corpus-sized shuffled: at 10^12 vectors the cost is one pass.

    Portability contract: the decision grid is
    ``round((v-mn)/(mx-mn)*255, 0)`` on doubles — the DuckDB oracle
    restates the identical expression (both engines round half away
    from zero for non-negative doubles); a constant dimension
    (mx == mn) quantizes to 0."""
    e = corpus.select(
        F.col(id_col).alias("__id"),
        F.col(emb_col).cast("array<double>").alias("__v"),
    )
    stats = (
        e.select(F.posexplode("__v").alias("pos", "val"))
        .groupBy("pos")
        .agg(F.min("val").alias("mn"), F.max("val").alias("mx"))
        .agg(
            F.array_sort(
                F.collect_list(F.struct("pos", "mn", "mx"))
            ).alias("__st")
        )
    )

    def _q0(v, i):
        st = F.element_at(F.col("__st"), i + 1)
        scale = st["mx"] - st["mn"]
        return (
            F.when(scale == 0, F.lit(0.0))
            .otherwise(
                F.least(
                    F.lit(255.0),
                    F.greatest(F.lit(0.0), F.round((v - st["mn"]) / scale * 255, 0)),
                )
            )
            .cast("int")
        )

    def _err(v, i):
        st = F.element_at(F.col("__st"), i + 1)
        scale = st["mx"] - st["mn"]
        dq = st["mn"] + _q0(v, i).cast("double") / 255.0 * scale
        return F.abs(v - dq)

    out = e.crossJoin(F.broadcast(stats))
    return out.select(
        F.col("__id").alias(id_col),
        F.transform("__v", lambda v, i: _q0(v, i) - 128).alias("qvec"),
        F.round(
            F.array_max(F.transform("__v", _err)), 6
        ).alias("max_abs_err"),
    )


def pca_power_fit(
    corpus: DataFrame,
    emb_col: str = "embedding",
    n_components: int = 2,
    iters: int = 10,
):
    """Distributed PCA fit via the deterministic power method: returns
    ``(mu, [(eigenvalue, component), ...])`` after exactly ``iters``
    matrix-vector steps per component with Hotelling deflation between
    components. Like ``kmeans_fit``, the CONTRACT is the fixed
    iteration schedule, not convergence (convergence follows the
    eigengap — near-isotropic inputs keep rotating); every decision
    value is rounded to 6 decimals so an independent engine (the DuckDB
    oracle unrolls the same steps as plain CTEs) reproduces the
    components exactly.

    Distributed shape: ONE corpus pass — an Arrow ``mapInPandas`` folds
    each partition into a d x d partial Gram matrix, per-dim sums and a
    count with vectorized numpy matmuls (nothing per-row in Python),
    emitting d^2+d+1 rows per partition; a groupBy sum reduces them and
    ~d^2 rows reach the driver. The O(d^2 * iters) power iteration runs
    on the driver — it is dimension-sized, not corpus-sized. At 10^12
    vectors the cost is the single pass.

    Decision grid shared with the oracle: mu_i = round(S_i/n, 6);
    gram_ij = round(G_ij/n, 6); cov_ij = round(gram_ij - mu_i*mu_j, 6);
    then the ITERATION runs in exact integer micro-units (1e-6):
    c = rint(cov*1e6), v0 = rint(1e6/sqrt(d)), w = rdiv(sum c*v, 1e6),
    nm = rint(sqrt(sum w^2)), v = rdiv(w*1e6, nm), eigenvalue
    l = rdiv(sum (c*v_i)*v_j, 1e12), deflation
    C' = rdiv(c*1e12 - (l*v_i)*v_j, 1e12), where rdiv is
    round-half-away integer division. Floats cannot carry this
    portably: with every input on the 1e-6 grid, matvec sums land
    EXACTLY on decimal rounding ties (x0 = 0.125 puts ~25% of step-1
    values on a tie) and the normalize divides by a small norm,
    amplifying each cross-engine tie-flip ~70x per step. Integer
    arithmetic is order-independent and exact in both engines
    (BIGINT/HUGEINT in the oracle, Python ints here).
    """
    import math

    import numpy as np

    e = corpus.select(F.col(emb_col).cast("array<double>").alias("__v"))

    def gram(batches):
        import numpy as np
        import pandas as pd

        G, S, n = None, None, 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.asarray(pdf["__v"].tolist(), dtype=np.float64)
            if G is None:
                d = X.shape[1]
                G, S = np.zeros((d, d)), np.zeros(d)
            G += X.T @ X
            S += X.sum(axis=0)
            n += len(X)
        if n == 0:
            return
        d = len(S)
        ii, jj = np.meshgrid(np.arange(d), np.arange(d), indexing="ij")
        yield pd.concat(
            [
                pd.DataFrame({"i": ii.ravel(), "j": jj.ravel(), "s": G.ravel()}),
                pd.DataFrame({"i": np.arange(d), "j": -1, "s": S}),
                pd.DataFrame({"i": [-1], "j": [-1], "s": [float(n)]}),
            ]
        )

    rows = (
        e.mapInPandas(gram, "i int, j int, s double")
        .groupBy("i", "j")
        .agg(F.sum("s").alias("s"))
        .collect()
    )
    n = next(r["s"] for r in rows if r["i"] == -1)
    sums = {r["i"]: r["s"] for r in rows if r["i"] >= 0 and r["j"] == -1}
    d = len(sums)
    mu = np.round(np.array([sums[i] for i in range(d)]) / n, 6)
    C = np.zeros((d, d))
    for r in rows:
        if r["i"] >= 0 and r["j"] >= 0:
            C[r["i"], r["j"]] = r["s"]
    C = np.round(np.round(C / n, 6) - (mu[:, None] * mu[None, :]), 6)

    def _ri(v):
        return (
            int(math.floor(v + 0.5)) if v >= 0 else -int(math.floor(-v + 0.5))
        )

    def _rdiv(a, b):
        return (2 * a + b) // (2 * b) if a >= 0 else -((-2 * a + b) // (2 * b))

    D6, D12 = 10**6, 10**12
    Ci = [[_ri(float(C[i, j]) * 1e6) for j in range(d)] for i in range(d)]
    comps = []
    for _ in range(int(n_components)):
        x = [_ri(1e6 / math.sqrt(d))] * d
        for _ in range(int(iters)):
            w = [
                _rdiv(sum(Ci[i][j] * x[j] for j in range(d)), D6)
                for i in range(d)
            ]
            nm = _ri(math.sqrt(float(sum(wi * wi for wi in w))))
            x = [_rdiv(wi * D6, nm) for wi in w]
        lam = _rdiv(
            sum(
                (Ci[i][j] * x[i]) * x[j]
                for i in range(d)
                for j in range(d)
            ),
            D12,
        )
        comps.append((lam / 1e6, [xi / 1e6 for xi in x]))
        Ci = [
            [
                _rdiv(Ci[i][j] * D12 - (lam * x[i]) * x[j], D12)
                for j in range(d)
            ]
            for i in range(d)
        ]
    return [float(m) for m in mu], comps


def pca_project(
    corpus: DataFrame,
    mu: Sequence[float],
    components: Sequence[Sequence[float]],
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Map-only projection onto fitted components: pc_c =
    round(sum_i (v_i - mu_i) * x_ci, 6). mu and the components ship as
    broadcast literals (d doubles each) inside the scan's codegen stage
    — no join, no shuffle, no Python."""
    mu_arr = F.array(*[F.lit(float(m)) for m in mu])
    v = F.col(emb_col).cast("array<double>")
    centered = F.zip_with(v, mu_arr, lambda a, b: a - b)
    cols = [F.col(id_col)]
    for c, comp in enumerate(components):
        x_arr = F.array(*[F.lit(float(x)) for x in comp])
        s = F.aggregate(
            F.zip_with(centered, x_arr, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, t: acc + t,
        )
        cols.append(F.round(s, 6).alias(f"pc{c}"))
    return corpus.select(*cols)


def pq_fit(
    corpus: DataFrame,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    m: int = 4,
    k: int = 4,
    iters: int = 2,
    init_ids: Optional[Sequence[int]] = None,
):
    """Product-quantization codebooks (Jégou et al. 2011): split the
    embedding into ``m`` equal subvectors and train an independent
    k-means codebook per subspace via :func:`kmeans_fit` — inheriting
    its decision-rounding portability contract, so an independent
    engine reproduces every codebook and code assignment exactly.

    Returns ``(codebooks, sub)``: ``codebooks[s]`` is the ordered
    ``[(code, subvector)]`` list for subspace ``s`` and ``sub`` the
    subvector width. Training cost is ``m`` independent kmeans runs
    (each a map-only assign + one k·sub-sized aggregate per iteration);
    at 10^12 rows the standard practice of fitting on a deterministic
    sample applies unchanged — pass a sampled ``corpus``."""
    first = corpus.select(F.col(emb_col)).first()
    dim = len(first[0])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible into {m} subvectors")
    sub = dim // m
    books = []
    for s in range(m):
        sl = corpus.select(
            F.col(id_col).alias(id_col),
            F.slice(
                F.col(emb_col).cast("array<double>"), s * sub + 1, sub
            ).alias("__sv"),
        )
        cents, _ = kmeans_fit(
            sl, id_col=id_col, emb_col="__sv", k=k, iters=iters,
            init_ids=list(init_ids) if init_ids is not None else None,
        )
        books.append(cents)
    return books, sub


def pq_encode(
    corpus: DataFrame,
    codebooks,
    sub: int,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Map-only PQ encoding: each row's subvector ``s`` maps to the
    nearest code of ``codebooks[s]`` (squared distance rounded to 6
    decimals before the argmin, ties to the smaller code — the shared
    decision grid). Output ``(id, code0..code{m-1})`` — m small ints
    per row instead of the full vector: the 100 TB story is exactly
    this bandwidth collapse (a 64-dim float32 row becomes m codes).
    Codebooks are broadcast literals; no join, no shuffle."""
    e = corpus.select(
        F.col(id_col).alias(id_col),
        F.col(emb_col).cast("array<double>").alias("__v"),
    )
    for s, cents in enumerate(codebooks):
        sv = F.slice(F.col("__v"), s * sub + 1, sub)
        structs = [
            F.struct(
                F.round(
                    _sqdist(sv, F.lit(c).cast("array<double>")), 6
                ).alias("d"),
                F.lit(int(cl)).cast("long").alias("cl"),
            )
            for cl, c in cents
        ]
        e = e.withColumn(f"code{s}", F.array_min(F.array(*structs))["cl"])
    return e.drop("__v")


def pq_adc_topk(
    corpus: DataFrame,
    queries: DataFrame,
    codebooks,
    sub: int,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over PQ codes: the corpus is
    scanned as codes only; each query precomputes a per-subspace lookup
    table of rounded squared distances to every codebook entry and a
    candidate's distance estimate is the LUT sum across subspaces —
    never touching the original corpus vectors. Returns
    ``(query_id, neighbor_id, adc)`` ascending by estimated distance.

    Distributed shape: encoding is map-only; queries (with their LUTs,
    m·k doubles each) broadcast; the scan is one map-only pass over the
    code table plus a per-query top-k window. The LUT sum is an
    UNROLLED left-to-right ``+`` chain in subspace order — the oracle
    restates the identical chain, so float addition order can't drift.
    At production scale ADC composes with IVF (scan only probed cells'
    code lists); this operator is the scan kernel of that pair."""
    enc = pq_encode(
        corpus, codebooks, sub, id_col=id_col, emb_col=emb_col
    ).withColumnRenamed(id_col, "neighbor_id")
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(emb_col).cast("array<double>").alias("__qe"),
    )
    for s, cents in enumerate(codebooks):
        sv = F.slice(F.col("__qe"), s * sub + 1, sub)
        keys = F.array(*[F.lit(int(cl)).cast("long") for cl, _ in cents])
        vals = F.array(
            *[
                F.round(_sqdist(sv, F.lit(c).cast("array<double>")), 6)
                for _, c in cents
            ]
        )
        q = q.withColumn(f"__lut{s}", F.map_from_arrays(keys, vals))
    j = enc.join(
        F.broadcast(q.drop("__qe")),
        F.col("neighbor_id") != F.col("query_id"),
    )
    adc = F.col("__lut0")[F.col("code0")]
    for s in range(1, len(codebooks)):
        adc = adc + F.col(f"__lut{s}")[F.col(f"code{s}")]
    scored = j.select(
        "query_id", "neighbor_id", F.round(adc, 6).alias("adc")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc").asc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def rp_signs(in_dim: int, out_dim: int, seed: int = 0) -> List[List[int]]:
    """Deterministic ±1 sign matrix for :func:`random_projection`:
    ``signs[j][i]`` is +1 iff the first md5 nibble of ``seed:i:j`` is
    < 8 — the same engine-portable md5 randomness source the sampling
    operators use, reproducible by any engine (and generated here once,
    driver-side, so it ships as a broadcast literal)."""
    import hashlib

    out = []
    for j in range(out_dim):
        row = []
        for i in range(in_dim):
            h = hashlib.md5(f"{seed}:{i}:{j}".encode()).hexdigest()
            row.append(1 if int(h[0], 16) < 8 else -1)
        out.append(row)
    return out


def random_projection(
    corpus: DataFrame,
    out_dim: int = 16,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    seed: int = 0,
) -> DataFrame:
    """Johnson–Lindenstrauss dimensionality reduction with a ±1 sign
    matrix (Achlioptas 2003): ``y_j = (1/√out_dim) · Σ_i s_ij x_i`` —
    the cheap, data-independent companion to :func:`pca_power_fit` for
    shrinking embedding bandwidth before dedup/ANN at corpus scale.
    Returns exploded ``(id, dim, val)`` rows.

    Exact-integer portability (the PCA/PageRank lesson): inputs
    quantize once to integer micro-units, each output coordinate is an
    exact BIGINT ±-chain over them (no float-sum order anywhere). The
    ``1/√out_dim`` scale is ALSO applied in integer space when √out_dim
    is integral (half-away-from-zero on the micro grid — a double
    ``round`` here would sit on structural quarter ties, where Spark's
    half-up and DuckDB's banker's rounding disagree; found the hard way
    at 28/8000 coordinates), so the only float op is one exact division
    by 1e6 and the result lands ON the 6-decimal grid.

    Distributed shape: pure map-only JVM expressions over a broadcast
    literal sign matrix — no shuffle, no join, no Python; the scan
    parallelizes perfectly and the plan survives any corpus size."""
    signs = rp_signs(_first_dim(corpus, emb_col), out_dim, seed)
    root = int(round(float(out_dim) ** 0.5))
    exact_root = root * root == out_dim
    vm = F.transform(
        F.col(emb_col).cast("array<double>"),
        lambda x: F.round(x * F.lit(1e6), 0).cast("long"),
    )
    e = corpus.select(F.col(id_col).alias(id_col), vm.alias("__vm"))
    outs = []
    for j, row in enumerate(signs):
        acc = None
        for i, s in enumerate(row):
            term = F.col("__vm")[i]
            term = term if s > 0 else -term
            acc = term if acc is None else acc + term
        if exact_root:
            # y_micro = round_half_away(acc / root), all integer:
            # (|acc| + root/2) div root, sign restored; / by the
            # power-of-2-friendly bound keeps floor() exact
            q = F.floor(
                (F.abs(acc) + F.lit(root // 2)) / F.lit(root)
            ).cast("long")
            y = F.when(acc < 0, -q).otherwise(q)
            outs.append(
                (y.cast("double") / F.lit(1e6)).alias(f"d{j}")
            )
        else:
            # irrational scale: ties are measure-zero; one double
            # division by the shared literal
            denom = 1e6 * float(out_dim) ** 0.5
            outs.append(
                F.round(acc.cast("double") / F.lit(denom), 6).alias(f"d{j}")
            )
    wide = e.select(id_col, *outs)
    pairs = F.array(
        *[
            F.struct(
                F.lit(j).cast("long").alias("dim"),
                F.col(f"d{j}").alias("val"),
            )
            for j in range(out_dim)
        ]
    )
    return wide.select(
        id_col, F.explode(pairs).alias("p")
    ).select(id_col, F.col("p.dim").alias("dim"), F.col("p.val").alias("val"))


def _first_dim(corpus: DataFrame, emb_col: str) -> int:
    return len(corpus.select(F.col(emb_col)).first()[0])


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids,
    codebooks,
    sub: int,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    k: int = 10,
    n_probe: int = 2,
) -> DataFrame:
    """IVF+PQ (the billion-scale ANN pairing, Jégou et al. 2011):
    corpus rows assign map-only to their nearest coarse k-means cell
    AND carry only their PQ codes; each query probes its ``n_probe``
    nearest cells and ranks candidates by the ADC LUT sum — so the scan
    touches just the probed cells' code lists, never a full pass and
    never an original vector. Non-residual variant (codes quantize the
    raw vectors, not cell residuals): every decision stays on the
    shared rounded-distance grid, so the DuckDB oracle chains the
    coarse-kmeans CTEs and the per-subspace PQ CTEs into the identical
    plan. Returns ``(query_id, neighbor_id, adc)``.

    Distributed shape: coarse centroids and codebooks are broadcast
    literals; encoding+assignment is one map-only pass; the probe join
    broadcasts queries; per-query candidate work is bounded by probed
    cell sizes. The inherent skew lever is the cell key — a hot cell
    bounds its own scan, and raising n_probe trades bounded extra
    candidates for recall exactly as in production IVF systems."""

    def cell_structs(v):
        return F.array(
            *[
                F.struct(
                    F.round(
                        _sqdist(v, F.lit(c).cast("array<double>")), 6
                    ).alias("d"),
                    F.lit(int(cl)).cast("long").alias("cl"),
                )
                for cl, c in centroids
            ]
        )

    enc = pq_encode(corpus, codebooks, sub, id_col=id_col, emb_col=emb_col)
    cells = corpus.select(
        F.col(id_col).alias(id_col),
        F.array_min(
            cell_structs(F.col(emb_col).cast("array<double>"))
        )["cl"].alias("cell"),
    )
    enc = enc.join(cells, id_col).withColumnRenamed(id_col, "neighbor_id")
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(emb_col).cast("array<double>").alias("__qe"),
    )
    for s, cents in enumerate(codebooks):
        sv = F.slice(F.col("__qe"), s * sub + 1, sub)
        keys = F.array(*[F.lit(int(cl)).cast("long") for cl, _ in cents])
        vals = F.array(
            *[
                F.round(_sqdist(sv, F.lit(c).cast("array<double>")), 6)
                for _, c in cents
            ]
        )
        q = q.withColumn(f"__lut{s}", F.map_from_arrays(keys, vals))
    probes = F.transform(
        F.slice(F.array_sort(cell_structs(F.col("__qe"))), 1, n_probe),
        lambda s: s["cl"],
    )
    qp = q.withColumn("qcell", F.explode(probes)).drop("__qe")
    j = enc.join(
        F.broadcast(qp),
        (F.col("cell") == F.col("qcell"))
        & (F.col("neighbor_id") != F.col("query_id")),
    )
    adc = F.col("__lut0")[F.col("code0")]
    for s in range(1, len(codebooks)):
        adc = adc + F.col(f"__lut{s}")[F.col(f"code{s}")]
    scored = j.select(
        "query_id", "neighbor_id", F.round(adc, 6).alias("adc")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc").asc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def binary_thresholds(
    corpus: DataFrame, emb_col: str = "embedding"
) -> DataFrame:
    """Per-dimension 1-bit quantization thresholds: the midpoint
    ``(mn_i + mx_i) / 2`` of each dimension's corpus range, folded into
    a single array row (same shape idiom as ``quantize_int8``).

    min/max are order-free over the input floats (no float-sum drift),
    and the midpoint is one IEEE add + one divide on doubles — any
    engine reading the same floats lands on the bit-identical
    threshold, which is what makes the binary codes (and therefore the
    whole Hamming ANN) oracle-checkable."""
    e = corpus.select(F.col(emb_col).cast("array<double>").alias("__v"))
    return (
        e.select(F.posexplode("__v").alias("pos", "val"))
        .groupBy("pos")
        .agg(((F.min("val") + F.max("val")) / F.lit(2.0)).alias("thr"))
        .agg(
            F.array_sort(F.collect_list(F.struct("pos", "thr"))).alias("__st")
        )
    )


def binary_quantize(
    corpus: DataFrame,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    dim: int = 64,
    thresholds: Union[DataFrame, Sequence[float], None] = None,
    keep_emb: bool = False,
) -> DataFrame:
    """1-bit binary quantization (the 32x compression used as the ANN
    prefilter in production vector stores): bit ``j`` of word ``w`` is
    set iff ``v[32w + j] > thr[32w + j]``, packed 32 bits per BIGINT
    word — ``ceil(dim/32)`` words per row, named ``w0, w1, ...``.

    Distributed shape: the threshold pass is one d-row aggregate
    (``binary_thresholds``); the packing itself is a map-only JVM
    expression (a 32-term conditional sum per word, all inside the
    scan's codegen stage). ``thresholds`` may be the stats DataFrame
    (broadcast-joined) or a plain d-length float sequence — the
    collected form is d-sized (NOT corpus-sized), so callers coding
    several inputs under one model (``hamming_topk``) collect once and
    inline literals, saving repeated aggregate jobs. Nothing
    corpus-sized shuffles; at 10^12 vectors this is one pass writing
    8 bytes per 32 dims.

    Bits live in positions 0..31 of a 64-bit word, so the conditional
    sum never touches the sign bit — no overflow semantics to match
    across engines."""
    words = (dim + 31) // 32
    e = corpus.select(
        F.col(id_col).alias("__id"),
        F.col(emb_col).cast("array<double>").alias("__v"),
    )
    thr_list: Optional[List[float]] = None
    if thresholds is None:
        st: Optional[DataFrame] = binary_thresholds(corpus, emb_col)
    elif isinstance(thresholds, DataFrame):
        st = thresholds
    else:
        st, thr_list = None, [float(t) for t in thresholds]

    def word(w: int) -> Column:
        acc = F.lit(0).cast("long")
        for j in range(32):
            d = 32 * w + j
            if d >= dim:
                break
            if thr_list is not None:
                thr: Column = F.lit(thr_list[d])
            else:
                thr = F.element_at(F.col("__st"), d + 1)["thr"]
            acc = acc + F.when(
                F.element_at("__v", d + 1) > thr, F.lit(1 << j).cast("long")
            ).otherwise(F.lit(0).cast("long"))
        return acc.alias(f"w{w}")

    cols = [F.col("__id").alias(id_col)] + [word(w) for w in range(words)]
    if keep_emb:
        cols.append(F.col("__v").alias("__emb"))
    if st is not None:
        e = e.crossJoin(F.broadcast(st))
    return e.select(*cols)


def hamming_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    shortlist: int = 50,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Binary-quantized ANN, the standard two-stage serving plan:
    Hamming distance over 1-bit codes admits a ``shortlist`` per query
    (cheap — XOR + popcount per candidate), then exact cosine re-ranks
    the shortlist to the final ``k``. Returns
    ``(query_id, neighbor_id, hamming, cosine)`` in rerank order.

    Both stages are deterministic and restated by the DuckDB oracle:
    corpus and queries are coded under the SAME corpus thresholds
    (``binary_thresholds`` — midpoints of order-free min/max), Hamming
    is ``sum_w bit_count(w_q XOR w_c)`` (integer-exact), the shortlist
    window orders ``(hamming ASC, neighbor_id ASC)``, and the rerank
    orders ``(round(cosine, 6) DESC, neighbor_id ASC)`` — the repo's
    decision grid for float comparisons.

    Distributed shape — the actual production serving plan: ONE d-row
    aggregate for thresholds, map-only coding, then the Hamming scan
    touches CODES ONLY (a broadcast of the coded query set against the
    coded candidates — 8 bytes per 32 dims, no float vector moves, no
    corpus shuffle); the per-query shortlist window carries just
    (query, neighbor, hamming); float embeddings are fetched for the
    ``shortlist x |queries|`` surviving rows alone via a broadcast
    point-lookup join. At 10^12 vectors the full-precision vectors are
    read for ~50 rows per query instead of the whole corpus — that IS
    the 32x bandwidth win binary quantization exists for."""
    words = (dim + 31) // 32
    # the threshold model is d-sized: collect ONCE and inline literals,
    # so coding corpus + queries costs one aggregate job, not two
    st_row = binary_thresholds(corpus, emb_col).collect()
    if not st_row:
        raise ValueError("hamming_topk needs a non-empty corpus")
    thr = [s["thr"] for s in st_row[0]["__st"]]
    cand = binary_quantize(
        corpus, id_col, emb_col, dim, thresholds=thr
    ).withColumnRenamed(id_col, "neighbor_id")
    qcodes = binary_quantize(
        queries, id_col, emb_col, dim, thresholds=thr
    ).select(
        F.col(id_col).alias("query_id"),
        *[F.col(f"w{w}").alias(f"qw{w}") for w in range(words)],
    )
    j = cand.join(
        F.broadcast(qcodes), F.col("neighbor_id") != F.col("query_id")
    )
    hd = F.lit(0).cast("int")
    for w in range(words):
        hd = hd + F.bit_count(
            F.col(f"w{w}").bitwiseXOR(F.col(f"qw{w}"))
        ).cast("int")
    slim = j.select("query_id", "neighbor_id", hd.alias("hamming"))
    wsl = Window.partitionBy("query_id").orderBy(
        F.col("hamming").asc(), F.col("neighbor_id").asc()
    )
    short = (
        slim.withColumn("srn", F.row_number().over(wsl))
        .filter(F.col("srn") <= shortlist)
        .drop("srn")
    )
    # exact rerank over the tiny surviving set: broadcast the shortlist
    # against the corpus (map-side vector fetch), broadcast the query
    # vectors (query-set-sized)
    emb_tbl = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(emb_col).cast("array<double>").alias("__emb"),
    )
    qe_tbl = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(emb_col).cast("array<double>").alias("__qe"),
    )
    rer = (
        emb_tbl.join(F.broadcast(short), "neighbor_id")
        .join(F.broadcast(qe_tbl), "query_id")
        .withColumn(
            "cosine", F.round(cosine(F.col("__qe"), F.col("__emb")), 6)
        )
    )
    wrk = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        rer.withColumn("rn", F.row_number().over(wrk))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "hamming", "cosine")
    )
