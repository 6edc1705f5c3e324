"""Resumable index builds: per-partition checkpoints with lineage + metrics.

North-rule requirement: "index builds are resumable from per-partition
checkpoints with lineage and build metrics recorded per partition".

Unit of resumption = a *term-hash bucket*: postings are split by
``pmod(xxhash64(term), n_buckets)`` and each bucket's compressed posting
blocks are written as an independent parquet directory plus a manifest
JSON. A re-run (after a crash, a lost executor batch, or a deliberate
kill) skips every bucket whose manifest validates and recomputes only
the missing ones. Hot terms don't defeat the bucketing because blocks.py
already splits a term by docid range *inside* the bucket.

Manifest per bucket (the lineage/metrics record):
  {bucket, n_buckets, rows, blocks, bytes, duration_s, attempt,
   input_fingerprint, finished_at_epoch}

``input_fingerprint`` ties the checkpoint to its input snapshot (count +
schema hash of the postings frame); a fingerprint mismatch invalidates
all buckets, preventing a silent mixed-snapshot index.
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from typing import Dict, List, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .blocks import build_posting_blocks

# underscore prefix: invisible to Spark's file index (like _SUCCESS),
# so the manifest can live next to the data it describes
MANIFEST = "_manifest.json"


def input_fingerprint(postings: DataFrame, n_rows: Optional[int] = None) -> str:
    if n_rows is None:
        n_rows = postings.count()
    schema = ",".join(f"{f.name}:{f.dataType.simpleString()}" for f in postings.schema)
    return hashlib.sha256(f"{n_rows}|{schema}".encode()).hexdigest()[:16]


def _bucket_dir(path: str, bucket: int) -> str:
    return os.path.join(path, f"bucket={bucket}")


def _read_manifest(path: str, bucket: int) -> Optional[dict]:
    p = os.path.join(_bucket_dir(path, bucket), MANIFEST)
    if not os.path.exists(p):
        return None
    try:
        with open(p) as f:
            return json.load(f)
    except (OSError, json.JSONDecodeError):
        return None


def build_blocks_checkpointed(
    postings: DataFrame,
    out_path: str,
    n_buckets: int = 32,
    range_size: int = 1 << 20,
    block_size: int = 1 << 14,
) -> Dict[str, object]:
    """Build the compressed posting-block table under ``out_path``,
    bucket by bucket, skipping buckets whose checkpoint already exists.

    Returns a build report {resumed: [...], built: [...], manifests}.
    """
    os.makedirs(out_path, exist_ok=True)
    fp = input_fingerprint(postings)

    resumed: List[int] = []
    built: List[int] = []
    manifests: List[dict] = []
    bucketed = postings.withColumn(
        "__bucket", F.pmod(F.xxhash64("term"), F.lit(n_buckets)).cast("int")
    )
    for b in range(n_buckets):
        m = _read_manifest(out_path, b)
        if m and m.get("input_fingerprint") == fp:
            resumed.append(b)
            manifests.append(m)
            continue
        t0 = time.time()
        part = bucketed.filter(F.col("__bucket") == b).drop("__bucket")
        blocks = build_posting_blocks(
            part, range_size=range_size, block_size=block_size
        )
        bdir = _bucket_dir(out_path, b)
        blocks.write.mode("overwrite").parquet(bdir)
        stats = (
            part.agg(F.count("*").alias("rows")).collect()[0]
        )
        n_blocks = 0
        n_bytes = 0
        for root, _dirs, files in os.walk(bdir):
            for fn in files:
                if fn.endswith(".parquet"):
                    n_blocks += 1
                    n_bytes += os.path.getsize(os.path.join(root, fn))
        attempt = (m.get("attempt", 0) + 1) if m else 1
        manifest = {
            "bucket": b,
            "n_buckets": n_buckets,
            "rows": stats["rows"],
            "blocks": n_blocks,
            "bytes": n_bytes,
            "duration_s": round(time.time() - t0, 3),
            "attempt": attempt,
            "input_fingerprint": fp,
            "finished_at_epoch": int(time.time()),
        }
        with open(os.path.join(bdir, MANIFEST), "w") as f:
            json.dump(manifest, f)
        built.append(b)
        manifests.append(manifest)
    return {"resumed": resumed, "built": built, "manifests": manifests}


def read_blocks(spark: SparkSession, out_path: str) -> DataFrame:
    return spark.read.option("basePath", out_path).parquet(
        os.path.join(out_path, "bucket=*")
    )
