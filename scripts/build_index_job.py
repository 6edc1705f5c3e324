"""spark-submit entry point: build (or resume) the full index for a
transcripts table and answer a smoke query set.

Cluster usage (north_rule deployment shape):

    python -c "from itemsjs_spark.engine.packaging import build_pyfiles_zip; \
               print(build_pyfiles_zip('itemsjs_spark.zip'))"
    spark-submit --py-files itemsjs_spark.zip \
        scripts/build_index_job.py \
        --input  /path/to/transcripts_parquet_or_iceberg \
        --output /path/to/index_artifacts \
        --blocks-buckets 64

The job is resumable: kill it mid-build and re-run with the same
--output — finished posting-block buckets are skipped via their lineage
manifests (itemsjs_spark/engine/checkpoint.py).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True, help="transcripts table path (parquet)")
    p.add_argument("--output", required=True, help="index artifact directory")
    p.add_argument("--n-turns", type=int, default=0,
                   help="synthesize this many turns instead of reading --input")
    p.add_argument("--blocks-buckets", type=int, default=32)
    p.add_argument("--range-size", type=int, default=1 << 20)
    p.add_argument("--smoke-query", default="shuffle partition")
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("itemsjs-spark-index-build").getOrCreate()

    from itemsjs_spark.engine import itemsjs_spark
    from itemsjs_spark.engine.checkpoint import build_blocks_checkpointed, read_blocks

    if args.n_turns:
        from itemsjs_spark.data.transcripts import transcripts_df

        tdf = transcripts_df(spark, n_turns=args.n_turns,
                             n_convs=max(args.n_turns // 10, 1))
    else:
        tdf = spark.read.parquet(args.input)

    t0 = time.time()
    eng = itemsjs_spark(
        spark,
        tdf,
        {
            "aggregations": {"role": {"size": 10}, "tool": {"size": 10}},
            "searchableFields": ["text"],
        },
        order_by=["conv_id", "turn_idx"],
    )
    eng._ensure_fulltext_materialized()
    report = build_blocks_checkpointed(
        eng.index.postings,
        f"{args.output}/posting_blocks",
        n_buckets=args.blocks_buckets,
        range_size=args.range_size,
    )
    eng.index.write(args.output)
    build_s = time.time() - t0

    blocks = read_blocks(spark, f"{args.output}/posting_blocks")
    hits = eng.fulltext_topk(args.smoke_query, 10, blocks).collect()
    summary = {
        "build_sec": round(build_s, 2),
        "n_docs": eng.index.n_docs,
        "blocks_built": report["built"],
        "blocks_resumed": report["resumed"],
        "smoke_query": args.smoke_query,
        "smoke_top10": [[r["_docid"], round(r["__score"], 6)] for r in hits],
    }
    print(json.dumps(summary))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
