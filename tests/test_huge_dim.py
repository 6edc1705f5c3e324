"""search() over a facet dimension larger than MAX_DRIVER_FACET_DIM must
run the distributed-head path: no full-dimension collect, correct heads,
working totals/selected flags/facet_stats (VERDICT r1 scale-killer #5).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from itemsjs_spark.engine import itemsjs_spark

N = 250_000  # > SearchEngine.MAX_DRIVER_FACET_DIM (200k)


@pytest.fixture(scope="module")
def huge_engine(spark):
    # 250k distinct keys; ids ending in 00 collapse onto 10 hot keys so
    # the count-descending head is non-trivial
    df = spark.range(N, numPartitions=16).select(
        F.col("id").alias("doc_id"),
        F.when(
            F.col("id") % 100 == 0, F.concat(F.lit("hot"), (F.col("id") % 1000).cast("string"))
        )
        .otherwise(F.concat(F.lit("k"), F.lpad(F.col("id").cast("string"), 7, "0")))
        .alias("k"),
        F.when(F.col("id") % 2 == 0, F.lit("en")).otherwise(F.lit("de")).alias("lang"),
        (F.col("id") % 7).cast("int").alias("score7"),
    )
    cfg = {
        "aggregations": {"k": {"size": 5}, "lang": {"size": 5}},
        "native_search_enabled": False,
    }
    eng = itemsjs_spark(spark, df, cfg, docid_col="doc_id")
    return eng


def test_huge_dim_uses_distributed_path(spark, huge_engine):
    assert huge_engine._facet_dim_cache() is None  # too big for the driver


def test_huge_dim_search_heads(spark, huge_engine):
    res = huge_engine.search({"filters": {"lang": ["en"]}, "per_page": 3})
    assert res["pagination"]["total"] == N // 2
    aggs = res["data"]["aggregations"]
    # hot keys: id%100==0 → always even → all pass lang=en; each hot key
    # holds N/1000 = 250 docs; head = 5 hottest by (count desc, key asc)
    k_buckets = aggs["k"]["buckets"]
    assert len(k_buckets) == 5
    assert all(b["doc_count"] == 250 for b in k_buckets)
    assert [b["key"] for b in k_buckets] == sorted(b["key"] for b in k_buckets)
    assert all(b["key"].startswith("hot") for b in k_buckets)
    # conjunctive crossing hits lang's own buckets too: 'de' counts 0
    # and zero-count buckets are absent in the huge-dim head (the
    # documented caveat); 'en' keeps its full count and selected flag
    lang = {b["key"]: b for b in aggs["lang"]["buckets"]}
    assert "de" not in lang
    assert lang["en"]["doc_count"] == N // 2 and lang["en"]["selected"]
    assert len(res["data"]["items"]) == 3


def test_huge_dim_facet_stats_distributed(spark):
    df = spark.range(210_000, numPartitions=16).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("k"), F.col("id").cast("string")).alias("k"),
        (F.col("id") % 5).cast("int").alias("stars"),
    )
    cfg = {
        "aggregations": {
            "k": {"size": 3},
            "stars": {"size": 10, "show_facet_stats": True},
        },
        "native_search_enabled": False,
    }
    eng = itemsjs_spark(spark, df, cfg, docid_col="doc_id")
    assert eng._facet_dim_cache() is None
    out = eng.get_buckets({})
    st = out["stars"]["facet_stats"]
    assert st["min"] == 0 and st["max"] == 4
    assert st["avg"] == pytest.approx(2.0)
    assert st["sum"] == pytest.approx(210_000 * 2.0)
