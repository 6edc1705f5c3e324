"""Training-data-pipeline operator tests (itemsjs_spark.ops): multimodal
plumbing, LSH recall vs brute force, MinHash-LSH candidate generation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from itemsjs_spark.ops import dedup, embeddings, multimodal, text

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").persist()


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").persist()


def test_multimodal_feature_plumbing(spark, docs):
    payloads = docs.select("doc_id", F.unhex(F.md5("text")).alias("payload"))
    out = multimodal.extract_features(payloads, dims=6)
    rows = out.collect()
    assert len(rows) == docs.count()
    for r in rows[:20]:
        assert r["n_bytes"] == 16
        assert len(r["features"]) == 6
        assert all(0.0 <= v <= 1.0 for v in r["features"])
    # deterministic across runs
    again = sorted(map(lambda r: (r["doc_id"], tuple(r["features"])), out.collect()))
    first = sorted(map(lambda r: (r["doc_id"], tuple(r["features"])), rows))
    assert again == first


def test_multimodal_frame_sampling(spark, docs):
    payloads = docs.limit(10).select("doc_id", F.unhex(F.md5("text")).alias("payload"))
    frames = multimodal.sample_frames(payloads, every_n_bytes=4)
    rows = frames.collect()
    # 16-byte payloads, 4-byte frames → 4 frames per doc
    assert len(rows) == 40
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r["doc_id"], []).append((r["frame_idx"], bytes(r["frame"])))
    for did, fr in per_doc.items():
        assert sorted(i for i, _ in fr) == [0, 1, 2, 3]
        assert b"".join(b for _, b in sorted(fr)) is not None


def test_multimodal_real_decoder_stub(spark, docs):
    payloads = docs.limit(2).select("doc_id", F.unhex(F.md5("text")).alias("payload"))
    with pytest.raises(Exception, match="NotImplementedError|plug"):
        multimodal.extract_features(payloads, fake=False).collect()


def test_lsh_topk_recall_vs_bruteforce(spark, emb):
    queries = emb.filter(F.col("vec_id") < 8)
    exact = embeddings.cosine_topk(emb, queries, k=10).collect()
    approx = embeddings.lsh_bucketed_topk(emb, queries, k=10, n_planes=2).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    approx_sets = {}
    for r in approx:
        approx_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    recalls = [
        len(exact_sets[q] & approx_sets.get(q, set())) / len(exact_sets[q])
        for q in exact_sets
    ]
    # 2 planes → 4 buckets over 500 vecs: random-hyperplane LSH on a
    # near-isotropic embedding set gives modest recall; assert sanity
    # (recall/precision tradeoffs are workload tuning, not correctness)
    assert sum(recalls) / len(recalls) >= 0.3
    # approx results are a subset of same-bucket exact rescoring: every
    # returned cosine must equal the exact cosine for that pair
    exact_cos = {(r["query_id"], r["neighbor_id"]): r["cosine"] for r in exact}
    for r in approx:
        key = (r["query_id"], r["neighbor_id"])
        if key in exact_cos:
            assert r["cosine"] == exact_cos[key]


def test_minhash_lsh_candidates_catch_near_dups(spark, docs):
    """Planted near-dups (jaccard ≥ 0.9) must appear among LSH candidates."""
    true_pairs = {
        (r["a"], r["b"])
        for r in dedup.jaccard_pairs(docs, "doc_id", threshold=0.9).collect()
    }
    assert true_pairs, "corpus should contain planted near-duplicates"
    sigs = dedup.minhash_signatures(docs, "doc_id", k=8)
    cands = {
        (r["a"], r["b"])
        for r in dedup.lsh_candidate_pairs(sigs, "doc_id", k=8).collect()
    }
    missed = true_pairs - cands
    # 4 bands × 2 rows at j≥0.9: P(miss) = (1-j^2)^4 ≈ 0.1% — allow none
    assert not missed, f"LSH missed near-dup pairs: {sorted(missed)[:5]}"


def test_text_ops_shapes(spark, docs):
    n = docs.count()
    assert text.language_id(docs).count() == n
    q = text.quality_score(docs).select("quality").agg(F.min("quality"), F.max("quality")).collect()[0]
    assert 0.0 <= q[0] <= q[1] <= 1.0
    fp = text.fingerprint(docs).select("fingerprint").distinct().count()
    assert fp > 1


def test_stopword_ratio_custom_column_name(spark, docs):
    """Regression: the numerator must come from the PASSED column, not a
    hardcoded `text` — language_id over a renamed body column."""
    renamed = docs.select("doc_id", F.col("text").alias("body"))
    out = text.language_id(renamed, text_col="body").select(
        "doc_id", "stopword_ratio"
    )
    ref = text.language_id(docs).select("doc_id", "stopword_ratio")
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, ref.collect()))
