"""Facet-posting-block path: index-side set algebra must reproduce the
scan path's (``bucket_counts_df``) results, including array-valued facet
columns, disjunctive value sets and zero-count keys."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from itemsjs_spark.data.transcripts import transcripts_df
from itemsjs_spark.engine import facetblocks as fb
from itemsjs_spark.engine import itemsjs_spark


@pytest.fixture(scope="module")
def eng_blocks(spark):
    tdf = transcripts_df(spark, n_turns=2500, n_convs=250, seed=13)
    cfg = {
        "aggregations": {"role": {"size": 10}, "tool": {"size": 10}},
        "native_search_enabled": False,
    }
    eng = itemsjs_spark(spark, tdf, cfg, order_by=["conv_id", "turn_idx"])
    blocks = fb.build_facet_blocks(eng.index, range_size=256, block_size=64).persist()
    blocks.count()
    return eng, blocks


def _scan_counts(eng, field, inp):
    return sorted(
        (r["key"], r["doc_count"])
        for r in eng.bucket_counts_df(field, inp).select("key", "doc_count").collect()
    )


def test_conjunctive_cross_matches_scan_path(eng_blocks):
    eng, blocks = eng_blocks
    fd = fb.intersect_all(
        [
            fb.docids_for_values(blocks, "role", ["assistant"]),
            fb.docids_for_values(blocks, "tool", ["bash"]),
        ]
    )
    got = sorted(
        (r["key"], r["doc_count"])
        for r in fb.crossed_bucket_counts(eng.index, blocks, "role", fd).collect()
    )
    want = _scan_counts(
        eng, "role", {"filters": {"role": ["assistant"], "tool": ["bash"]}}
    )
    assert got == want


def test_disjunctive_values_match_scan_semantics(eng_blocks):
    eng, blocks = eng_blocks
    # OR across values of one field: docids present for either role
    fd = fb.docids_for_values(
        blocks, "role", ["user", "system"], conjunctive=False
    )
    got = sorted(
        (r["key"], r["doc_count"])
        for r in fb.crossed_bucket_counts(eng.index, blocks, "tool", fd).collect()
    )
    docs = eng.index.docs
    want = sorted(
        (r["key"], r["doc_count"])
        for r in docs.filter(
            F.arrays_overlap("__fk_role", F.array(F.lit("user"), F.lit("system")))
        )
        .select(F.explode(F.array_distinct("__fk_tool")).alias("key"))
        .groupBy("key")
        .agg(F.count("*").alias("doc_count"))
        .join(
            eng.index.facet_values.filter(F.col("field") == "tool").select("key"),
            "key",
            "right",
        )
        .withColumn("doc_count", F.coalesce("doc_count", F.lit(0)))
        .collect()
    )
    assert got == want


def test_multivalue_conjunction_within_field(eng_blocks):
    """AND across two values of the SAME field over a scalar column is
    empty (no doc has two roles) — the groupBy-count path must agree."""
    _eng, blocks = eng_blocks
    fd = fb.docids_for_values(blocks, "role", ["user", "assistant"])
    assert fd.count() == 0


def test_term_predicate_prunes_facet_block_scan(eng_blocks, spark, tmp_path):
    eng, _blocks = eng_blocks
    import io, contextlib

    out = str(tmp_path / "fblocks")
    fb.build_facet_blocks(eng.index, range_size=256, block_size=64).write.mode(
        "overwrite"
    ).parquet(out)
    stored = spark.read.parquet(out)
    df = fb.docids_for_values(stored, "role", ["assistant"])
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    text = buf.getvalue()
    pushed = [ln for ln in text.splitlines() if "PushedFilters" in ln and "term" in ln]
    assert any("assistant" in ln for ln in pushed), text


def test_filtered_wand_matches_exact_filtered_topk(spark):
    """WAND with in-range facet filtering == exact scorer ∩ facet filter
    (ranks AND scores), across conjunctive multi-field filters."""
    from itemsjs_spark.engine.blocks import build_posting_blocks

    tdf = transcripts_df(spark, n_turns=2500, n_convs=250, seed=21)
    cfg = {
        "aggregations": {"role": {"size": 10}, "tool": {"size": 10}},
        "searchableFields": ["text"],
    }
    eng = itemsjs_spark(spark, tdf, cfg, order_by=["conv_id", "turn_idx"])
    eng._ensure_fulltext_materialized()
    blocks = build_posting_blocks(
        eng.index.postings, range_size=512, block_size=64
    ).persist()
    fblocks = fb.build_facet_blocks(
        eng.index, range_size=512, block_size=64
    ).persist()

    cases = [
        ("spark", {"role": ["assistant"]}),
        ("shuffle partition", {"role": ["assistant"], "tool": ["bash"]}),
        ("s", {"role": ["user", "system"]}),
        ("spark", {"tool": ["browser"]}),
    ]
    docs = eng.index.docs
    for q, filters in cases:
        got = sorted(
            map(tuple, eng.fulltext_topk_filtered(
                q, 10, filters, blocks=blocks, facet_blocks=fblocks
            ).collect())
        )
        pred = None
        for fld, vals in filters.items():
            c = F.arrays_overlap(
                f"__fk_{fld}", F.array(*[F.lit(v) for v in vals])
            )
            pred = c if pred is None else (pred & c)
        exact = (
            eng.fulltext_hits(q)
            .join(docs.filter(pred).select("_docid"), "_docid", "left_semi")
            .orderBy(F.col("__score").desc(), F.col("_docid").cast("string").asc())
            .limit(10)
        )
        want = sorted(map(tuple, exact.collect()))
        assert got == want, (q, filters)
    blocks.unpersist()
    fblocks.unpersist()
