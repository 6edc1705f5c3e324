"""Structured Streaming ingest: micro-batches append snapshots to the
index store; the opened index is query-identical to a full rebuild over
everything ingested (epochs arriving in order-key order), and epoch
replay is idempotent.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from itemsjs_spark.data.transcripts import transcripts_df
from itemsjs_spark.engine import SearchEngine, itemsjs_spark
from itemsjs_spark.streaming import StreamingIndexWriter, read_stream_index

CFG = {
    "aggregations": {"role": {"size": 10}, "tool": {"size": 10}},
    "searchableFields": ["text"],
}


@pytest.fixture(scope="module")
def streamed(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("stream")
    src, out, ckpt = str(root / "src"), str(root / "idx"), str(root / "ckpt")
    base = transcripts_df(spark, n_turns=1500, n_convs=150, seed=5).persist()
    delta = (
        transcripts_df(spark, n_turns=500, n_convs=50, seed=6)
        .withColumn("conv_id", F.concat(F.lit("d"), F.substring("conv_id", 2, 10)))
        .persist()
    )
    writer = StreamingIndexWriter(
        out, CFG, ["conv_id", "turn_idx"], n_buckets=4, range_size=512, block_size=64
    )
    # wave A: one file so it lands in one deterministic micro-batch
    base.coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema(base.schema).parquet(src)
    writer.attach(stream, ckpt).awaitTermination()
    # wave B arrives later; the stream checkpoint picks only new files
    delta.coalesce(1).write.mode("append").parquet(src)
    stream2 = spark.readStream.schema(base.schema).parquet(src)
    writer.attach(stream2, ckpt).awaitTermination()
    return base, delta, out, writer


def test_stream_index_matches_full_rebuild(spark, streamed):
    base, delta, out, _writer = streamed
    eng = SearchEngine(read_stream_index(spark, out, CFG))
    full = itemsjs_spark(
        spark, base.unionByName(delta), CFG, order_by=["conv_id", "turn_idx"]
    )
    assert eng.index.n_docs == full.index.n_docs == 2000
    for q in ("spark", "shuffle partition", "s"):
        a = sorted(map(tuple, eng.fulltext_hits(q).collect()))
        b = sorted(map(tuple, full.fulltext_hits(q).collect()))
        assert a == b, q
    for inp in (
        {"query": "broadcast", "per_page": 8},
        {"filters": {"role": ["assistant"]}, "per_page": 5},
    ):
        a = eng.search(dict(inp))
        b = full.search(dict(inp))
        assert a["pagination"] == b["pagination"], inp
        assert [i["_id"] for i in a["data"]["items"]] == [
            i["_id"] for i in b["data"]["items"]
        ], inp
        for fld, entry in b["data"]["aggregations"].items():
            assert (
                a["data"]["aggregations"][fld]["buckets"] == entry["buckets"]
            ), (inp, fld)


def test_stream_epoch_replay_is_idempotent(spark, streamed):
    base, _delta, out, writer = streamed
    from itemsjs_spark.engine.checkpoint import _HadoopFS

    before = writer._read_meta(_HadoopFS(spark, out))
    # replay an already-committed epoch (what a restarted stream does)
    writer.process_batch(base, epoch_id=before["epochs"][0])
    after = writer._read_meta(_HadoopFS(spark, out))
    assert after == before


def test_stream_facet_blocks_serve_filter_algebra(spark, streamed):
    """Per-epoch facet blocks merge into one store; filter-only searches
    over the streamed index route through the block set algebra and
    match a full batch rebuild (incl. negatives and DNF)."""
    base, delta, out, _writer = streamed
    eng = SearchEngine(read_stream_index(spark, out, CFG))
    assert eng.index.facet_posting_blocks is not None
    eng.ROUTER_FORCE = "blocks"  # tiny corpus: pin the route for parity testing
    assert eng._facetblock_search_applies({"filters": {"tool": ["bash"]}})
    full = itemsjs_spark(
        spark, base.unionByName(delta), CFG, order_by=["conv_id", "turn_idx"]
    )
    for inp in (
        {"filters": {"tool": ["bash"]}, "per_page": 6},
        {"not_filters": {"role": ["system"]}, "per_page": 5, "page": 3},
        {"filters_query": "role:assistant AND tool:bash"},
    ):
        a = eng.search(dict(inp))
        b = full.search(dict(inp))
        assert a["pagination"] == b["pagination"], inp
        assert [i["_id"] for i in a["data"]["items"]] == [
            i["_id"] for i in b["data"]["items"]
        ], inp
        for fld, entry in b["data"]["aggregations"].items():
            assert (
                a["data"]["aggregations"][fld]["buckets"] == entry["buckets"]
            ), (inp, fld)


def test_stream_wand_over_merged_store(spark, streamed):
    base, delta, out, _writer = streamed
    eng = SearchEngine(read_stream_index(spark, out, CFG))
    exact = eng.fulltext_hits("spark")
    top = sorted(
        map(tuple, exact.orderBy(
            F.col("__score").desc(), F.col("_docid").cast("string").asc()
        ).limit(10).collect())
    )
    wand = sorted(map(tuple, eng.fulltext_topk("spark", 10).collect()))
    assert wand == top


def test_stream_facet_block_compaction_preserves_filters(spark, streamed, tmp_path):
    """The facet-block store shares the posting-block layout, so offline
    compaction folds its per-epoch snap deltas too — filter searches
    over the compacted store stay response-identical."""
    import posixpath
    import shutil

    from itemsjs_spark.engine.checkpoint import compact_blocks

    base, delta, out, _writer = streamed
    # compact a COPY so the shared `streamed` fixture stays untouched
    out2 = str(tmp_path / "idx2")
    shutil.copytree(out, out2)
    before = SearchEngine(read_stream_index(spark, out2, CFG))
    before.ROUTER_FORCE = "blocks"  # tiny corpus: pin the route for parity testing
    inp = {"filters": {"tool": ["bash"]}, "per_page": 6}
    want = before.search(dict(inp))

    report = compact_blocks(
        spark, posixpath.join(out2, "facet_blocks"), n_buckets=4,
        range_size=512, block_size=64,
    )
    assert len(report["compacted"]) > 0
    assert all(m["compacted"] for m in report["manifests"])
    spark.catalog.clearCache()
    eng = SearchEngine(read_stream_index(spark, out2, CFG))
    eng.ROUTER_FORCE = "blocks"  # tiny corpus: pin the route for parity testing
    assert eng._facetblock_search_applies(dict(inp))
    got = eng.search(dict(inp))
    assert got["pagination"] == want["pagination"]
    assert [i["_id"] for i in got["data"]["items"]] == [
        i["_id"] for i in want["data"]["items"]
    ]
    for fld, entry in want["data"]["aggregations"].items():
        assert got["data"]["aggregations"][fld]["buckets"] == entry["buckets"]


def test_partial_facet_block_store_falls_back_to_scan(spark, streamed, tmp_path):
    """A store whose meta lacks facet-block coverage for every doc epoch
    (e.g. early epochs written by a pre-facet-block writer) must NOT
    serve the block store — filters fall back to the scan path."""
    import json
    import shutil

    base, delta, out, _writer = streamed
    out2 = str(tmp_path / "idxpartial")
    shutil.copytree(out, out2)
    meta_path = f"{out2}/meta.json"
    meta = json.loads(open(meta_path).read())
    assert set(meta["doc_epochs"]) <= set(meta["fb_epochs"])  # full store serves
    # simulate a first epoch that predates the facet-block feature
    meta["fb_epochs"] = meta["fb_epochs"][1:]
    open(meta_path, "w").write(json.dumps(meta))
    import os

    crc = f"{out2}/.meta.json.crc"  # stale Hadoop checksum of the edit
    if os.path.exists(crc):
        os.remove(crc)
    eng = SearchEngine(read_stream_index(spark, out2, CFG))
    assert eng.index.facet_posting_blocks is None
    eng.ROUTER_FORCE = "blocks"  # tiny corpus: pin the route for parity testing
    assert not eng._facetblock_search_applies({"filters": {"tool": ["bash"]}})
    # and the scan path still answers correctly
    r = eng.search({"filters": {"tool": ["bash"]}, "per_page": 3})
    assert r["pagination"]["total"] > 0


def test_writer_inline_compaction_every_n_epochs(spark, tmp_path):
    """compact_every wires compact_blocks into the ingest loop itself
    (the stream_index_job maintenance step): after every N
    doc-contributing epochs both block stores are folded, queries stay
    parity-identical with a batch rebuild, and the store's file count
    drops vs the append-only layout."""
    import glob as globmod
    import json as jsonmod

    out = str(tmp_path / "idx")
    out_plain = str(tmp_path / "idx_plain")
    waves = [
        transcripts_df(spark, n_turns=300, n_convs=30, seed=s)
        .withColumn(
            "conv_id", F.concat(F.lit(chr(97 + s)), F.substring("conv_id", 2, 10))
        )
        .persist()
        for s in range(3)
    ]
    kw = dict(n_buckets=2, range_size=256, block_size=32)
    w = StreamingIndexWriter(out, CFG, ["conv_id", "turn_idx"], compact_every=2, **kw)
    wp = StreamingIndexWriter(out_plain, CFG, ["conv_id", "turn_idx"], **kw)
    for i, wave in enumerate(waves):
        w.process_batch(wave, epoch_id=i)
        wp.process_batch(wave, epoch_id=i)

    meta = jsonmod.loads(open(f"{out}/meta.json").read())
    assert meta["compacted_at_n_epochs"] == 2  # tripped at epoch 2 of 3

    n_files = len(globmod.glob(f"{out}/posting_blocks/bucket=*/*.parquet"))
    n_plain = len(globmod.glob(f"{out_plain}/posting_blocks/bucket=*/*.parquet"))
    assert n_files < n_plain

    full = itemsjs_spark(
        spark,
        waves[0].unionByName(waves[1]).unionByName(waves[2]),
        CFG,
        order_by=["conv_id", "turn_idx"],
    )
    eng = SearchEngine(read_stream_index(spark, out, CFG))
    eng.ROUTER_FORCE = "blocks"  # tiny corpus: pin the route for parity testing
    assert eng.index.n_docs == full.index.n_docs == 900
    for q in ("spark", "shuffle partition"):
        a = sorted(map(tuple, eng.fulltext_hits(q).collect()))
        b = sorted(map(tuple, full.fulltext_hits(q).collect()))
        assert a == b, q
    inp = {"filters": {"tool": ["bash"]}, "per_page": 6}
    got, want = eng.search(dict(inp)), full.search(dict(inp))
    assert got["pagination"] == want["pagination"]
    for fld, entry in want["data"]["aggregations"].items():
        assert got["data"]["aggregations"][fld]["buckets"] == entry["buckets"]
    for wave in waves:
        wave.unpersist()
