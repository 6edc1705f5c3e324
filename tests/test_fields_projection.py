"""search({fields: [...]}) — page items restricted to the requested
fields (extension; itemsjs returns whole items). The projection sits
before the page collect, so Catalyst prunes the corpus scan's
ReadSchema on a disk-backed corpus."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from itemsjs_spark.data.transcripts import transcripts_df
from itemsjs_spark.engine import Index, SearchEngine, itemsjs_spark

CFG = {
    "aggregations": {"role": {"size": 10}},
    "searchableFields": ["text"],
}


@pytest.fixture(scope="module")
def eng(spark):
    df = transcripts_df(spark, n_turns=600, n_convs=60, seed=21)
    return itemsjs_spark(spark, df, CFG, order_by=["conv_id", "turn_idx"])


def test_fields_projection_standard_path(eng):
    full = eng.search({"query": "spark", "per_page": 5})
    proj = eng.search({"query": "spark", "per_page": 5, "fields": ["conv_id", "role"]})
    assert proj["pagination"] == full["pagination"]
    assert [i["_id"] for i in proj["data"]["items"]] == [
        i["_id"] for i in full["data"]["items"]
    ]
    for it in proj["data"]["items"]:
        assert set(it) == {"_id", "conv_id", "role"}
    # buckets unaffected by the projection
    assert proj["data"]["aggregations"] == full["data"]["aggregations"]
    # unknown names are ignored, _id always present
    odd = eng.search({"per_page": 3, "fields": ["nope"]})
    for it in odd["data"]["items"]:
        assert set(it) == {"_id"}


def test_fields_projection_sort_and_result_df(eng):
    inp = {
        "sort": {"field": "turn_idx", "order": "desc"},
        "per_page": 4,
        "fields": ["turn_idx"],
    }
    res = eng.search(inp)
    for it in res["data"]["items"]:
        assert set(it) == {"_id", "turn_idx"}
    df = eng.result_df(inp)
    assert df.columns == ["_id", "turn_idx"]


def test_fields_projection_wand_route(spark, tmp_path):
    df = transcripts_df(spark, n_turns=400, n_convs=40, seed=22)
    mem = itemsjs_spark(
        spark, df, {"searchableFields": ["text"]}, order_by=["conv_id", "turn_idx"]
    )
    path = str(tmp_path / "idx")
    mem.index.write_blocks(path)
    deng = SearchEngine(Index.read(spark, path))
    inp = {"query": "spark", "per_page": 5, "fields": ["conv_id"]}
    assert deng._wand_search_applies(inp)
    res = deng.search(inp)
    want = mem.search(inp)
    assert [i["_id"] for i in res["data"]["items"]] == [
        i["_id"] for i in want["data"]["items"]
    ]
    for it in res["data"]["items"]:
        assert set(it) == {"_id", "conv_id"}
    # the disk-backed page scan reads only the projected columns
    hits = deng.fulltext_hits("spark")
    top = hits.orderBy(
        F.col("__score").desc(), F.col("_docid").cast("string").asc()
    ).limit(5)
    page_plan = (
        deng.index.docs.join(F.broadcast(top.select("_docid")), "_docid")
        .select("_docid", "conv_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "text" not in page_plan.split("ReadSchema")[1][:200]
