"""Benchmark harness: headline queries + index-build + N→4N scaling probe.

Prints ONE JSON line:
  {"metric": "...", "value": <total_sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": <sf>,
   "build": {...}, "scaling": {...}}

Env knobs:
  SPARK_GRAFT_SF_DIR   parquet dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     cores for the main run (default 32)
  SPARK_GRAFT_BENCH_TURNS  transcript corpus size (default 60000)
  SPARK_GRAFT_SCALING  "0" to skip the local[8]-vs-local[32] probe

The scaling probe is the sandbox proxy for the north rule's N→4N
executor criterion (BASELINE.md): the same index-build + query job at
two parallelism levels on the same input, reporting throughput at both
and the efficiency ratio thr_4N / (4 * thr_N).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_TURNS = int(os.environ.get("SPARK_GRAFT_BENCH_TURNS", "60000"))
# the scaling probe needs compute-dominant work, not driver overhead:
# a bigger corpus than the headline run so per-core work is measurable
SCALING_TURNS = int(os.environ.get("SPARK_GRAFT_SCALING_TURNS", "240000"))
DO_SCALING = os.environ.get("SPARK_GRAFT_SCALING", "1") != "0"


def make_spark(cores: int):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(f"itemsjs-spark-bench-{cores}")
        .config("spark.sql.shuffle.partitions", str(cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )


def build_engine(spark, n_turns: int):
    """Index-build job: transcripts corpus -> docids + facet index +
    postings/terms, fully materialized. Returns (engine, n_postings)."""
    from itemsjs_spark.data.transcripts import transcripts_df
    from itemsjs_spark.engine import itemsjs_spark

    tdf = transcripts_df(spark, n_turns=n_turns, n_convs=max(n_turns // 10, 1))
    cfg = {
        "aggregations": {
            "role": {"size": 10},
            "tool": {"size": 10},
            "conv_id": {"size": 50},
        },
        "searchableFields": ["text"],
    }
    eng = itemsjs_spark(spark, tdf, cfg, order_by=["conv_id", "turn_idx"])
    eng._ensure_fulltext_materialized()
    eng.index.facet_values.count()
    n_post = eng.index.postings.count()
    return eng, n_post


def timed(fn):
    t0 = time.time()
    fn()
    return time.time() - t0


def headline_queries(spark, eng):
    """Reference-shaped query set over the transcript index + the
    training-data operators over the sf documents/embeddings tables."""
    import __spark_entry__ as entry

    qs = {}
    qs["ft_single"] = lambda: eng.fulltext_hits("spark").count()
    qs["ft_conjunctive"] = lambda: eng.fulltext_hits("shuffle partition").count()
    qs["ft_prefix"] = lambda: eng.fulltext_hits("s").count()
    qs["facet_counts"] = lambda: eng.bucket_counts_df(
        "role", {"filters": {"tool": ["bash"]}}
    ).count()
    qs["facet_search_page"] = lambda: eng.result_df(
        {"filters": {"role": ["assistant"]}}
    ).limit(12).count()
    qs["query_plus_facet"] = lambda: eng.result_df(
        {"query": "broadcast join", "filters": {"role": ["assistant"]}}
    ).count()
    Q = entry.queries()
    for name in (
        "dedup_minhash_signatures",
        "neardup_jaccard_pairs",
        "dedup_simhash",
        "embedding_topk_cosine",
        "similar_items",
    ):
        qs[name] = lambda name=name: Q[name](spark, SF_DIR).count()
    return qs


def run_suite(cores: int, n_turns: int, include_docs_ops: bool):
    spark = make_spark(cores)
    try:
        # warm-up: a tiny build first so JVM/codegen/Python-worker spin-up
        # doesn't pollute the throughput measurement
        warm, _ = build_engine(spark, 2000)
        warm.fulltext_hits("spark").count()
        warm.index.unpersist()

        t0 = time.time()
        eng, n_post = build_engine(spark, n_turns)
        t_build = time.time() - t0

        times = {}
        if include_docs_ops:
            qs = headline_queries(spark, eng)
        else:  # scaling probe: transcript-index queries only
            qs = {
                "ft_single": lambda: eng.fulltext_hits("spark").count(),
                "ft_conjunctive": lambda: eng.fulltext_hits(
                    "shuffle partition"
                ).count(),
                "facet_counts": lambda: eng.bucket_counts_df(
                    "role", {"filters": {"tool": ["bash"]}}
                ).count(),
            }
        # warm once (JIT/codegen/broadcast), then measure
        for name, fn in qs.items():
            fn()
            times[name] = timed(fn)
        return {
            "build_sec": t_build,
            "build_turns_per_sec": n_turns / t_build,
            "n_postings": n_post,
            "queries": times,
            "query_total_sec": sum(times.values()),
            "qps": len(times) / max(sum(times.values()), 1e-9),
        }
    finally:
        spark.stop()


def main():
    sf = SF_DIR.rstrip("/").split("sf")[-1]
    main_run = run_suite(CPUS, N_TURNS, include_docs_ops=True)

    out = {
        "metric": "headline suite total seconds (index-build excluded; see build/scaling keys)",
        "value": round(main_run["query_total_sec"], 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in main_run["queries"].items()},
        "sf": sf,
        "n_turns": N_TURNS,
        "build": {
            "sec": round(main_run["build_sec"], 3),
            "turns_per_sec": round(main_run["build_turns_per_sec"], 1),
            "n_postings": main_run["n_postings"],
        },
        "qps": round(main_run["qps"], 3),
    }

    if DO_SCALING:
        lo = run_suite(8, SCALING_TURNS, include_docs_ops=False)
        hi = run_suite(32, SCALING_TURNS, include_docs_ops=False)
        build_eff = (hi["build_turns_per_sec"] / lo["build_turns_per_sec"]) / 4.0
        q_lo = 3 / max(lo["query_total_sec"], 1e-9)
        q_hi = 3 / max(hi["query_total_sec"], 1e-9)
        out["scaling"] = {
            "proxy": "local[8] vs local[32] on identical input (N vs 4N)",
            "n_turns": SCALING_TURNS,
            "build_turns_per_sec_n8": round(lo["build_turns_per_sec"], 1),
            "build_turns_per_sec_n32": round(hi["build_turns_per_sec"], 1),
            "build_scaling_efficiency": round(build_eff, 3),
            "query_qps_n8": round(q_lo, 3),
            "query_qps_n32": round(q_hi, 3),
            "query_scaling_efficiency": round((q_hi / q_lo) / 4.0, 3),
        }

    print(json.dumps(out))


if __name__ == "__main__":
    main()
