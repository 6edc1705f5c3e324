"""search({query, filters}) through filtered block-max WAND: the page,
total and buckets must be bit-identical to the standard scan path —
including the reference's missing-key quirks (helpers.ts:171-194,
facets.ts:141-150) and conjunctive-AND / disjunctive-OR value semantics
— while never materializing scores for the full candidate set."""

from __future__ import annotations

from unittest import mock

import pytest

from itemsjs_spark.data.transcripts import transcripts_df
from itemsjs_spark.engine import Index, SearchEngine, itemsjs_spark

CFG = {
    # role conjunctive (default), tool disjunctive: both group shapes
    "aggregations": {
        "role": {"size": 10},
        "tool": {"size": 10, "conjunction": False},
    },
    "searchableFields": ["text"],
}


@pytest.fixture(scope="module")
def engines(spark, tmp_path_factory):
    tdf = transcripts_df(spark, n_turns=2000, n_convs=200, seed=9)
    mem = itemsjs_spark(spark, tdf, CFG, order_by=["conv_id", "turn_idx"])
    path = str(tmp_path_factory.mktemp("wfidx") / "artifacts")
    mem.index.write_blocks(path, n_buckets=4, range_size=512, block_size=64)
    disk = SearchEngine(Index.read(spark, path))
    # force the router's selectivity gate open: this suite is about
    # CORRECTNESS of the filtered-WAND path on every input shape, so
    # every filter must route through it (the gate itself is covered by
    # test_router_refuses_unselective below)
    disk.ROUTER_FORCE = "blocks"  # tiny corpus: pin the route for parity testing
    return mem, disk


SEARCHES = [
    # single conjunctive value
    {"query": "spark", "filters": {"role": ["assistant"]}},
    # conjunctive + disjunctive multi-value (OR within tool)
    {
        "query": "shuffle partition",
        "filters": {"role": ["assistant"], "tool": ["bash", "grep"]},
    },
    # conjunctive multi-value = AND → empty (a doc has one role)
    {"query": "spark", "filters": {"role": ["assistant", "user"]}},
    # leading missing conjunctive value is IGNORED (reference quirk)
    {"query": "spark", "filters": {"role": ["nosuchrole", "assistant"]}},
    # missing AFTER a present conjunctive value empties the result
    {"query": "spark", "filters": {"role": ["assistant", "nosuchrole"]}},
    # no filter value exists at all → empty result, uncrossed buckets
    {"query": "spark", "filters": {"role": ["nosuchrole"]}},
    # disjunctive field with all values missing → empty result
    {"query": "spark", "filters": {"role": ["user"], "tool": ["nosuch"]}},
    # prefix query + paging past page 1
    {"query": "s", "filters": {"role": ["user"]}, "per_page": 7, "page": 2},
    # per_page 0 (the aggregation endpoint shape)
    {"query": "broadcast", "filters": {"role": ["user"]}, "per_page": 0},
]


@pytest.mark.parametrize("idx", range(len(SEARCHES)))
def test_filtered_wand_search_matches_scan_path(engines, idx):
    mem, disk = engines
    input = dict(SEARCHES[idx])
    assert disk._wand_filtered_search_applies(dict(input)), input
    with mock.patch.object(
        disk, "_search_wand_filtered", wraps=disk._search_wand_filtered
    ) as spy:
        b = disk.search(dict(input))
    assert spy.call_count == 1
    a = mem.search(dict(input))
    assert a["pagination"] == b["pagination"]
    assert [i["_id"] for i in a["data"]["items"]] == [
        i["_id"] for i in b["data"]["items"]
    ]
    for fld, entry in a["data"]["aggregations"].items():
        assert entry["buckets"] == b["data"]["aggregations"][fld]["buckets"], fld


def test_router_refuses_unselective_filters(engines):
    """Cost model v2: on a tiny corpus the per-job fixed cost dominates,
    so the router refuses the block path for EVERY filter (the scan's
    single cheap pass wins — the r2 ADVICE mis-route). Zeroing the job
    term isolates the asymptotic regime, where a rare value routes to
    blocks and a ~half-corpus value still refuses (row-rate ratio)."""
    _mem, disk = engines
    old = disk.ROUTER_FORCE
    disk.ROUTER_FORCE = None
    try:
        # small-corpus gate: fixed job cost > any row-work difference
        assert not disk._wand_filtered_search_applies(
            {"query": "spark", "filters": {"role": ["assistant"]}}
        )
        glob = disk._facet_global or {}
        rare = min(glob["tool"], key=glob["tool"].get)
        assert not disk._wand_filtered_search_applies(
            {"query": "spark", "filters": {"tool": [rare]}}
        )
        # asymptotic regime (job term zeroed): selectivity threshold is
        # the calibrated row-rate ratio R_BLOCK/R_SCAN
        disk.ROUTER_JOB_SECONDS = 0.0
        ratio = disk.ROUTER_BLOCK_ROWS_PER_SEC / disk.ROUTER_SCAN_ROWS_PER_SEC
        if glob["tool"][rare] < disk.index.n_docs * ratio:
            assert disk._wand_filtered_search_applies(
                {"query": "spark", "filters": {"tool": [rare]}}
            )
        assert not disk._wand_filtered_search_applies(
            {"query": "spark", "filters": {"role": ["assistant"]}}
        )
    finally:
        disk.ROUTER_FORCE = old
        disk.ROUTER_JOB_SECONDS = SearchEngine.ROUTER_JOB_SECONDS


def test_filtered_wand_declines_out_of_shape_inputs(engines):
    """not_filters / filters_query / sort / callback / ids inputs keep
    the standard path."""
    _mem, disk = engines
    base = {"query": "spark", "filters": {"role": ["assistant"]}}
    for extra in (
        {"not_filters": {"tool": ["bash"]}},
        {"filters_query": "role:assistant"},
        {"sort": {"field": "turn_idx"}},
        {"filter": lambda it: True},
        {"_ids": [1, 2]},
        {"is_all_filtered_items": True},
    ):
        inp = dict(base)
        inp.update(extra)
        assert not disk._wand_filtered_search_applies(inp), extra


def test_filtered_wand_with_tombstones_matches_scan_path(engines):
    """Driver-set tombstones keep the filtered-WAND route: page, total
    and buckets equal a standard-path engine with the same deletes."""
    mem, disk = engines
    inp = {"query": "spark", "filters": {"role": ["assistant"]}, "per_page": 5}
    base = disk.search(dict(inp))
    victims = [i["_id"] for i in base["data"]["items"]][:2]

    d2 = disk.reconfigured(disk.configuration)
    d2.ROUTER_FORCE = "blocks"
    d2.delete_docids(victims)
    assert d2._wand_filtered_search_applies(dict(inp))
    from unittest import mock as _mock

    with _mock.patch.object(
        d2, "_search_wand_filtered", wraps=d2._search_wand_filtered
    ) as spy:
        got = d2.search(dict(inp))
    assert spy.call_count == 1

    m2 = mem.reconfigured(mem.configuration)
    m2.delete_docids(victims)
    want = m2.search(dict(inp))
    assert got["pagination"] == want["pagination"]
    assert [i["_id"] for i in got["data"]["items"]] == [
        i["_id"] for i in want["data"]["items"]
    ]
    assert got["data"]["aggregations"] == want["data"]["aggregations"]
    assert not set(victims) & {i["_id"] for i in got["data"]["items"]}


def test_explain_search_reports_dispatch_route(spark, engines, tmp_path_factory):
    """explain_search mirrors _search_dispatch's route checks in order:
    the reported route flips exactly where the dispatcher's would, and
    a declined block route exposes the cost model's predicted seconds."""
    mem, disk = engines

    # disk engine has ROUTER_FORCE="blocks": filter-only → facet_blocks
    exp = disk.explain_search({"filters": {"role": ["assistant"]}})
    assert exp["route"] == "facet_blocks"
    assert any("ROUTER_FORCE" in t for t in exp["trace"])

    # query + filters → filtered WAND on the block-backed engine
    exp = disk.explain_search(
        {"query": "spark", "filters": {"role": ["assistant"]}}
    )
    assert exp["route"] == "wand_filtered"

    # quoted phrase declines both WAND routes (phrase constraints are
    # invisible to WAND) — standard path with the reasons in the trace
    exp = disk.explain_search(
        {"query": '"spark shuffle"', "filters": {"role": ["assistant"]}}
    )
    assert exp["route"] == "standard_scan"
    assert len(exp["trace"]) >= 2

    # in-memory engine (no block store): pure query stays standard
    exp = mem.explain_search({"query": "spark"})
    assert exp["route"] == "standard_scan"
    assert exp["has_facet_blocks"] is False

    # with the force released, the tiny corpus declines blocks on COST
    # and the trace carries the model's predicted seconds
    disk.ROUTER_FORCE = None
    try:
        exp = disk.explain_search({"filters": {"role": ["assistant"]}})
        assert exp["route"] == "standard_scan"
        assert any("predicted scan" in t for t in exp["trace"])
        assert any("cost model picked the scan" in t for t in exp["trace"])
    finally:
        disk.ROUTER_FORCE = "blocks"

    # pure relevance page on a no-facet block store → wand_topk
    from itemsjs_spark.data.transcripts import transcripts_df

    tdf = transcripts_df(spark, n_turns=400, n_convs=40, seed=3)
    nofacet = itemsjs_spark(
        spark, tdf, {"searchableFields": ["text"]},
        order_by=["conv_id", "turn_idx"],
    )
    path = str(tmp_path_factory.mktemp("wandq") / "artifacts")
    nofacet.index.write_blocks(path, n_buckets=2, range_size=256, block_size=64)
    qeng = SearchEngine(Index.read(spark, path))
    exp = qeng.explain_search({"query": "spark"})
    assert exp["route"] == "wand_topk"
