"""spark-submit entry point: continuously (or catch-up) index a growing
transcripts directory into the streaming snapshot store.

Cluster usage (north_rule deployment shape):

    python -c "from itemsjs_spark.engine.packaging import build_pyfiles_zip; \
               print(build_pyfiles_zip('itemsjs_spark.zip'))"
    spark-submit --py-files itemsjs_spark.zip \
        scripts/stream_index_job.py \
        --input  /path/to/growing_transcripts_dir \
        --output /path/to/stream_index \
        --checkpoint /path/to/stream_ckpt \
        --available-now            # one catch-up pass; omit for continuous

Each micro-batch appends an immutable snapshot (delta docs, per-bucket
posting-block append, per-epoch term/facet counts); restarts resume
from the streaming checkpoint with exactly-once epoch replay. Query the
store via itemsjs_spark.streaming.read_stream_index.
"""

from __future__ import annotations

import argparse
import json


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True, help="streaming parquet source dir")
    p.add_argument("--output", required=True, help="streaming index store")
    p.add_argument("--checkpoint", required=True, help="stream checkpoint dir")
    p.add_argument("--blocks-buckets", type=int, default=32)
    p.add_argument("--range-size", type=int, default=1 << 20)
    p.add_argument("--available-now", action="store_true",
                   help="process what's available, then exit (catch-up mode)")
    p.add_argument("--compact-every", type=int, default=16,
                   help="fold the block stores' snap deltas back into "
                        "packed blocks every N doc-contributing epochs "
                        "(0 disables; the swap is crash-safe and readable "
                        "mid-flight, so no reader quiescence is needed)")
    p.add_argument("--smoke-query", default="shuffle partition")
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("itemsjs-spark-stream-index").getOrCreate()

    from itemsjs_spark.engine.packaging import ensure_shipped

    # executors must unpickle foreachBatch closures that import
    # itemsjs_spark regardless of their cwd — ship the package zip even
    # when the operator forgot --py-files (idempotent when they didn't)
    ensure_shipped(spark)

    from itemsjs_spark.data.transcripts import transcripts_df
    from itemsjs_spark.engine import SearchEngine
    from itemsjs_spark.streaming import StreamingIndexWriter, read_stream_index

    cfg = {
        "aggregations": {"role": {"size": 10}, "tool": {"size": 10}},
        "searchableFields": ["text"],
    }
    schema = transcripts_df(spark, n_turns=1).schema
    writer = StreamingIndexWriter(
        args.output,
        cfg,
        ["conv_id", "turn_idx"],
        n_buckets=args.blocks_buckets,
        range_size=args.range_size,
        compact_every=args.compact_every or None,
    )
    stream = spark.readStream.schema(schema).parquet(args.input)
    query = writer.attach(
        stream, args.checkpoint, available_now=args.available_now
    )
    query.awaitTermination()

    eng = SearchEngine(read_stream_index(spark, args.output, cfg))
    hits = eng.fulltext_hits(args.smoke_query).count()
    from itemsjs_spark.engine.checkpoint import _HadoopFS

    meta = writer._read_meta(_HadoopFS(spark, args.output))
    print(json.dumps({
        "n_docs": eng.index.n_docs,
        "epochs": len(meta.get("epochs", [])),
        "compacted_at_n_epochs": int(meta.get("compacted_at_n_epochs", 0)),
        "smoke_query": args.smoke_query,
        "smoke_hits": int(hits),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
