"""Training-shard export sink: deterministic shard assignment,
manifest round-trip, order-independent checksum, tamper detection."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from itemsjs_spark.ops import export

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_write_verify_roundtrip(spark, tmp_path):
    path = str(tmp_path / "shards")
    docs = _docs(spark)
    man = export.write_training_shards(
        docs, path, "doc_id", n_shards=8, columns=["doc_id", "text", "lang"]
    )
    assert man["total_rows"] == docs.count()
    assert len(man["shards"]) == 8
    # hive layout on disk, one dir per non-empty shard
    dirs = {d for d in os.listdir(path) if d.startswith("shard=")}
    nonempty = {e["shard"] for e in man["shards"] if e["n_rows"] > 0}
    assert dirs == {f"shard={s}" for s in nonempty}
    res = export.verify_training_shards(spark, path)
    assert res["ok"] and res["bad_shards"] == []
    assert res["total_rows"] == man["total_rows"]


def test_shard_assignment_is_deterministic_and_total(spark):
    docs = _docs(spark).select("doc_id")
    a = {
        r["doc_id"]: r["s"]
        for r in docs.withColumn(
            "s", export.shard_of(F.col("doc_id"), 8)
        ).collect()
    }
    b = {
        r["doc_id"]: r["s"]
        for r in docs.withColumn(
            "s", export.shard_of(F.col("doc_id"), 8)
        ).collect()
    }
    assert a == b
    assert all(0 <= s < 8 for s in a.values())
    # a different seed reshuffles membership
    c = {
        r["doc_id"]: r["s"]
        for r in docs.withColumn(
            "s", export.shard_of(F.col("doc_id"), 8, seed="7")
        ).collect()
    }
    assert a != c


def test_checksum_is_order_independent(spark, tmp_path):
    path = str(tmp_path / "shards")
    docs = _docs(spark).limit(50)
    man = export.write_training_shards(docs, path, "doc_id", n_shards=2)
    # recompute from a deliberately reshuffled read: same checksums
    df = spark.read.parquet(path).repartition(13)
    got = {
        int(r["shard"]): (int(r["n_rows"]), int(r["checksum"]))
        for r in export._shard_stats(df, man["columns"]).collect()
    }
    want = {
        e["shard"]: (e["n_rows"], e["checksum"])
        for e in man["shards"]
        if e["n_rows"] > 0
    }
    assert got == want


def test_tampered_manifest_detected(spark, tmp_path):
    path = str(tmp_path / "shards")
    export.write_training_shards(
        _docs(spark).limit(60), path, "doc_id", n_shards=4
    )
    mp = os.path.join(path, export.MANIFEST_NAME)
    man = json.load(open(mp))
    nonempty = [e for e in man["shards"] if e["n_rows"] > 0]
    nonempty[0]["n_rows"] += 1  # simulate a lost row
    nonempty[1]["checksum"] ^= 1  # simulate a flipped byte
    json.dump(man, open(mp, "w"))
    res = export.verify_training_shards(spark, path)
    assert not res["ok"]
    assert {b["shard"] for b in res["bad_shards"]} == {
        nonempty[0]["shard"], nonempty[1]["shard"]
    }


# --- streaming shard export (foreachBatch incremental manifest) --------


def test_streaming_export_matches_batch_manifest(spark, tmp_path):
    """Two file-source waves stream into the shard store; the
    incrementally XOR-merged manifest equals a batch recompute over
    the union (the commutative-fold invariant), verify passes, and a
    replayed epoch is a no-op."""
    import json as _json

    from pyspark.sql import functions as F

    src = str(tmp_path / "src")
    out = str(tmp_path / "shards")
    ckpt = str(tmp_path / "ckpt")
    docs = _docs(spark).select("doc_id", "text", "lang").persist()
    a = docs.filter(F.col("doc_id") % 2 == 0)
    b = docs.filter(F.col("doc_id") % 2 == 1)
    exp = export.StreamingShardExporter(out, "doc_id", n_shards=4)

    a.coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema(docs.schema).parquet(src)
    exp.attach(stream, ckpt).awaitTermination()
    b.coalesce(1).write.mode("append").parquet(src)
    stream2 = spark.readStream.schema(docs.schema).parquet(src)
    exp.attach(stream2, ckpt).awaitTermination()

    man = _json.loads(open(out + "/" + export.MANIFEST_NAME).read())
    assert man["total_rows"] == docs.count()
    assert len(man["epochs"]) >= 2

    # the full-store verify validates the incrementally merged manifest
    res = export.verify_training_shards(spark, out)
    assert res["ok"] and res["total_rows"] == docs.count()

    # and it equals a one-shot batch manifest over the same rows
    batch_out = str(tmp_path / "batch")
    batch_man = export.write_training_shards(
        docs, batch_out, "doc_id", n_shards=4
    )
    stream_stats = {e["shard"]: (e["n_rows"], e["checksum"]) for e in man["shards"]}
    batch_stats = {
        e["shard"]: (e["n_rows"], e["checksum"]) for e in batch_man["shards"]
    }
    assert stream_stats == batch_stats

    # replaying a committed epoch changes nothing (exactly-once)
    before = open(out + "/" + export.MANIFEST_NAME).read()
    exp.process_batch(a, epoch_id=man["epochs"][0])
    assert open(out + "/" + export.MANIFEST_NAME).read() == before
