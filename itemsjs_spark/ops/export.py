"""Training-shard export sink: the last mile of a training-data
pipeline — write a curated corpus as N deterministic shards plus a
manifest that lets the trainer (or a resumed writer) verify every shard
without re-reading the source.

Production loaders (WebDataset/Megatron-style) want (a) a FIXED shard
count decided up front, (b) shard membership that is a pure function of
the document id — stable under retries, re-partitioning and re-runs —
and (c) per-shard row counts + content checksums recorded next to the
data.  All three are the same portable-md5 idiom the sampling module
uses, so a different engine (or the DuckDB oracle in tests) reproduces
shard membership and checksums bit-for-bit.

The checksum is ORDER-INDEPENDENT by construction: per row, a 60-bit
integer from the md5 of the concatenated row payload, folded per shard
with ``bit_xor`` (a commutative group op).  Writers may emit rows in any
partition order — Spark gives no ordering guarantee inside a shard — and
the checksum still verifies; a lost, duplicated or altered row flips it.

Scale shape: ONE hash-partitioned shuffle into the shard layout, one
shard-sized aggregate for the manifest, a driver-side JSON write
(manifest is n_shards rows — config-sized).  Verification re-reads only
the written shards and re-aggregates; it never touches the source."""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST_NAME = "_MANIFEST.json"
_SEP = "␟"  # symbol-for-unit-separator: never appears in test data


def shard_of(key, n_shards: int, seed: str = "0"):
    """Deterministic shard id in [0, n_shards): first 8 md5 hex chars of
    ``seed:key`` as an integer, mod ``n_shards`` (the sampling module's
    portable-hash idiom)."""
    hx = F.md5(F.concat(F.lit(seed + ":"), key.cast("string")))
    return (
        F.conv(F.substring(hx, 1, 8), 16, 10).cast("long")
        % F.lit(int(n_shards)).cast("long")
    ).cast("int")


def _row_token(cols: Sequence[str]):
    """60-bit content token per row: md5 over the unit-separator-joined
    column values (NULL → empty, documented), first 15 hex chars as an
    integer — fits a BIGINT with headroom, xor-foldable."""
    payload = F.concat_ws(
        _SEP, *[F.coalesce(F.col(c).cast("string"), F.lit("")) for c in cols]
    )
    return F.conv(F.substring(F.md5(payload), 1, 15), 16, 10).cast("long")


def _shard_stats(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    return df.groupBy("shard").agg(
        F.count("*").cast("long").alias("n_rows"),
        F.bit_xor(_row_token(cols)).alias("checksum"),
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    id_col: str,
    n_shards: int = 64,
    seed: str = "0",
    columns: Optional[List[str]] = None,
) -> Dict:
    """Write ``df`` as ``n_shards`` hash-assigned parquet shards under
    ``path`` (``shard=<i>/`` Hive layout) and a ``_MANIFEST.json``
    recording per-shard row counts and xor-fold checksums plus the
    column list, shard function parameters, and totals. Returns the
    manifest dict.

    The manifest is computed from the SAME single pass that shuffles
    rows into shards (one groupBy on the shard key — map-side combined,
    shard-count-sized result)."""
    cols = list(columns) if columns is not None else list(df.columns)
    out = df.select(*cols).withColumn(
        "shard", shard_of(F.col(id_col), n_shards, seed)
    )
    out.repartition("shard").write.mode("overwrite").partitionBy(
        "shard"
    ).parquet(path)
    stats = {
        int(r["shard"]): (int(r["n_rows"]), int(r["checksum"]))
        for r in _shard_stats(out, cols).collect()
    }
    manifest = {
        "format": "parquet",
        "id_col": id_col,
        "columns": cols,
        "n_shards": int(n_shards),
        "seed": seed,
        "total_rows": sum(n for n, _ in stats.values()),
        "shards": [
            {
                "shard": s,
                "n_rows": stats[s][0] if s in stats else 0,
                "checksum": stats[s][1] if s in stats else 0,
            }
            for s in range(int(n_shards))
        ],
    }
    with open(os.path.join(path, MANIFEST_NAME), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    return manifest


def read_manifest(path: str) -> Dict:
    with open(os.path.join(path, MANIFEST_NAME)) as f:
        return json.load(f)


def verify_training_shards(spark: SparkSession, path: str) -> Dict:
    """Re-read the written shards and check every non-empty shard's row
    count and xor checksum against the manifest. Returns
    ``{"ok": bool, "bad_shards": [...], "total_rows": int}`` — a failed
    shard reports both expected and observed values.  One scan of the
    shard store; nothing driver-sized beyond the shard list."""
    man = read_manifest(path)
    df = spark.read.parquet(path)
    got = {
        int(r["shard"]): (int(r["n_rows"]), int(r["checksum"]))
        for r in _shard_stats(df, man["columns"]).collect()
    }
    bad = []
    total = 0
    for entry in man["shards"]:
        s = entry["shard"]
        n, ck = got.get(s, (0, 0))
        total += n
        if (n, ck) != (entry["n_rows"], entry["checksum"]):
            bad.append(
                {
                    "shard": s,
                    "expected": {"n_rows": entry["n_rows"],
                                 "checksum": entry["checksum"]},
                    "observed": {"n_rows": n, "checksum": ck},
                }
            )
    return {"ok": not bad, "bad_shards": bad, "total_rows": total}


class StreamingShardExporter:
    """foreachBatch sink streaming micro-batches into the SAME shard
    layout ``write_training_shards`` produces — the continuous-ingest
    side of the export story (stream → dedup → curate → shards).

    Each epoch writes its rows under ``epoch=<N>/shard=<i>/`` (immutable
    delta files — no existing file is ever rewritten) and MERGES the
    epoch's per-shard stats into ``_MANIFEST.json``: row counts add,
    checksums XOR.  Because the row token fold is a commutative group
    op, the incrementally merged manifest is IDENTICAL to what a full
    recompute over every epoch yields — so :func:`verify_training_shards`
    (reading the whole store) validates a streamed store exactly like a
    batch one, and the equality is itself the exactly-once proof.

    Exactly-once across retries: Structured Streaming replays a failed
    epoch with the same ``epoch_id``; the epoch's parquet write is
    idempotent (deterministic path, overwrite mode) and an epoch already
    recorded in the manifest's ``epochs`` list is skipped outright, so
    its stats never double-merge.  Per-epoch work is delta-proportional:
    one hash-partitioned write + one shard-sized aggregate."""

    def __init__(
        self,
        out_path: str,
        id_col: str,
        n_shards: int = 64,
        seed: str = "0",
        columns: Optional[List[str]] = None,
    ):
        self.out_path = out_path
        self.id_col = id_col
        self.n_shards = int(n_shards)
        self.seed = seed
        self.columns = list(columns) if columns is not None else None

    def _manifest_path(self) -> str:
        return self.out_path.rstrip("/") + "/" + MANIFEST_NAME

    def process_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        from ..engine.checkpoint import _HadoopFS

        spark = batch_df.sparkSession
        fs = _HadoopFS(spark, self.out_path)
        fs.mkdirs(self.out_path)
        text = fs.read_text(self._manifest_path())
        if text is None:
            man = {
                "format": "parquet",
                "id_col": self.id_col,
                "columns": self.columns or list(batch_df.columns),
                "n_shards": self.n_shards,
                "seed": self.seed,
                "total_rows": 0,
                "epochs": [],
                "shards": [
                    {"shard": s, "n_rows": 0, "checksum": 0}
                    for s in range(self.n_shards)
                ],
            }
        else:
            man = json.loads(text)
        if int(epoch_id) in man["epochs"]:
            return  # replayed epoch: already committed
        cols = man["columns"]
        out = batch_df.select(*cols).withColumn(
            "shard", shard_of(F.col(self.id_col), self.n_shards, self.seed)
        )
        out = out.persist()
        try:
            out.repartition("shard").write.mode("overwrite").partitionBy(
                "shard"
            ).parquet(f"{self.out_path}/epoch={int(epoch_id)}")
            stats = {
                int(r["shard"]): (int(r["n_rows"]), int(r["checksum"]))
                for r in _shard_stats(out, cols).collect()
            }
        finally:
            out.unpersist()
        for entry in man["shards"]:
            n, ck = stats.get(entry["shard"], (0, 0))
            entry["n_rows"] += n
            entry["checksum"] ^= ck
            man["total_rows"] += n
        man["epochs"].append(int(epoch_id))
        fs.write_text(self._manifest_path(), json.dumps(man, sort_keys=True))

    def attach(self, stream_df: DataFrame, checkpoint_dir: str, **opts):
        """``writeStream.foreachBatch`` wiring; returns the query."""
        return (
            stream_df.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start(**opts)
        )
