"""Disk-backed index path: write → read → query parity, and pushdown
proof — the persisted term-sorted postings scan must receive the query's
term predicate (PushedFilters), so prefix/term lookups prune row groups
instead of reading the whole postings table."""

from __future__ import annotations

import io
import contextlib

import pytest
from pyspark.sql import functions as F

from itemsjs_spark.data.transcripts import transcripts_df
from itemsjs_spark.engine import Index, SearchEngine, itemsjs_spark


@pytest.fixture(scope="module")
def engines(spark, tmp_path_factory):
    tdf = transcripts_df(spark, n_turns=2000, n_convs=200, seed=9)
    cfg = {
        "aggregations": {"role": {"size": 10}, "tool": {"size": 10}},
        "searchableFields": ["text"],
    }
    mem = itemsjs_spark(spark, tdf, cfg, order_by=["conv_id", "turn_idx"])
    path = str(tmp_path_factory.mktemp("idx") / "artifacts")
    mem.index.write(path)
    disk = SearchEngine(Index.read(spark, path))
    return mem, disk, path


SEARCHES = [
    {"query": "spark"},
    {"query": "shuffle partition", "per_page": 5},
    {"query": "s", "filters": {"role": ["assistant"]}},
    {"filters": {"tool": ["bash"]}},
    {"not_filters": {"role": ["system"]}, "per_page": 7, "page": 2},
]


@pytest.mark.parametrize("idx", range(len(SEARCHES)))
def test_disk_engine_matches_memory_engine(engines, idx):
    mem, disk, _path = engines
    a = mem.search(dict(SEARCHES[idx]))
    b = disk.search(dict(SEARCHES[idx]))
    assert a["pagination"] == b["pagination"]
    assert [i["_id"] for i in a["data"]["items"]] == [
        i["_id"] for i in b["data"]["items"]
    ]
    for fld, entry in a["data"]["aggregations"].items():
        assert entry["buckets"] == b["data"]["aggregations"][fld]["buckets"], fld


def test_term_predicate_reaches_parquet_scan(engines, spark, tmp_path):
    mem, _disk, _path = engines
    plan = io.StringIO()
    # a path of its own: Spark's CacheManager substitutes the persisted
    # InMemoryRelation for ANY scan of an already-cached path, which
    # would hide the parquet pushdown we're asserting
    path2 = str(tmp_path / "artifacts2")
    mem.index.write(path2)
    disk2 = SearchEngine(Index.read(spark, path2))
    disk2._ft_materialized = True  # keep postings as a parquet scan
    df = disk2.fulltext_hits("spark")
    with contextlib.redirect_stdout(plan):
        df.explain(mode="formatted")
    text = plan.getvalue()
    assert "PushedFilters" in text
    # the spark term (stemmed 'spark') must appear inside a pushed In/EqualTo
    pushed = [ln for ln in text.splitlines() if "PushedFilters" in ln and "term" in ln]
    assert any("spark" in ln for ln in pushed), pushed
