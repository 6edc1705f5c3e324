"""Differential battery: the distributed Spark engine vs the in-memory
oracle (which is itself pinned by the 89 ported reference assertions in
test_oracle_reference_parity.py).

Every case runs the SAME ``search`` / ``aggregation`` / ``similar`` input
through both implementations and compares the full response — item ids in
order, pagination, every facet bucket (key/doc_count/selected, in order),
facet_stats — so reference semantics transitively pin the engine.

Covers: conjunctive/disjunctive/negative filters, boolean filters_query,
fulltext (incl. prefix stepping + stopword toggles + multi-token AND),
query∩facet crossing, sort specs, pagination, hide_zero/chosen-on-top
bucket rules, facet_stats, custom_id_field, _ids/ids candidate paths,
similar endpoint, aggregation endpoint, plus randomized transcript-shaped
corpora (seeded) for skew/multi-conversation coverage.
"""

from __future__ import annotations

import json
import math

import pytest

import fixtures as fx
from itemsjs_spark.engine import itemsjs_spark
from itemsjs_spark.oracle.itemsjs_oracle import ItemsJSOracle

_ENGINES = {}


def get_engine(spark, items_key, items, config):
    key = (items_key, json.dumps(config, sort_keys=True, default=str))
    if key not in _ENGINES:
        # json round-trip (NO sort_keys) → fresh config, key order preserved
        # (aggregation order defines bucket `position` in the reference)
        _ENGINES[key] = itemsjs_spark(
            spark, fx.fresh(items), json.loads(json.dumps(config, default=str))
        )
    return _ENGINES[key]


def _norm_val(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if v == int(v):
            return int(v)
        return round(v, 9)
    if isinstance(v, (list, tuple)):
        return [_norm_val(x) for x in v]
    # mixed-type fields round-trip exactly (items_to_df __raw_ sidecars
    # restored by _row_to_item) — no numeric-string coercion needed
    return v


def _norm_item(it):
    return {k: _norm_val(v) for k, v in it.items() if v is not None}


def _norm_response(res):
    aggs = {}
    for f, entry in (res["data"].get("aggregations") or {}).items():
        aggs[f] = {
            "name": entry["name"],
            "title": entry["title"],
            "position": entry["position"],
            "buckets": [
                (b["key"], b["doc_count"], bool(b["selected"]))
                for b in entry["buckets"]
            ],
        }
        if "facet_stats" in entry:
            aggs[f]["facet_stats"] = {
                k: _norm_val(v) for k, v in entry["facet_stats"].items()
            }
    out = {
        "pagination": res["pagination"],
        "items": [_norm_item(i) for i in res["data"]["items"]],
        "aggregations": aggs,
    }
    afi = res["data"].get("allFilteredItems")
    out["allFilteredItems"] = (
        [_norm_item(i) for i in afi] if afi is not None else None
    )
    return out


def check(spark, items_key, items, config, input):
    oracle = ItemsJSOracle(fx.fresh(items), json.loads(json.dumps(config)))
    eng = get_engine(spark, items_key, items, config)
    # inputs can be reference-illegal (e.g. a not_filter naming a value
    # absent from the facet index dereferences a missing bitmap and
    # throws) — both implementations must agree on raising
    want_exc = got_exc = None
    want = got = None
    try:
        want = _norm_response(oracle.search(dict(input)))
    except Exception as e:  # noqa: BLE001 — parity on raising, not type
        want_exc = e
    try:
        got = _norm_response(eng.search(dict(input)))
    except Exception as e:  # noqa: BLE001
        got_exc = e
    assert (want_exc is None) == (got_exc is None), (
        f"raise-parity mismatch for {input!r}: oracle={want_exc!r} engine={got_exc!r}"
    )
    if want_exc is None:
        assert got == want, f"engine≠oracle for {input!r}"


ITEMS_CFG = {
    "aggregations": {
        "tags": {"size": 10},
        "actors": {"title": "Stars", "size": 10},
        "category": {"size": 10},
        "year": {"size": 10},
    },
    "searchableFields": ["name", "tags", "actors"],
}

ITEMS_CASES = [
    {},
    {"per_page": 2},
    {"per_page": 2, "page": 2},
    {"filters": {"tags": ["a"]}},
    {"filters": {"tags": ["a", "c"]}},
    {"filters": {"tags": ["c"], "actors": ["john"]}},
    {"filters": {"tags": ["z"], "category": ["drama"]}},
    {"not_filters": {"tags": ["c"]}},
    {"filters": {"tags": ["a"]}, "not_filters": {"actors": ["john"]}},
    {"filters_query": "tags:a AND tags:c"},
    {"filters_query": "(tags:b OR tags:z) AND category:drama"},
    {"query": "comedy"},
    {"query": "drama"},
    {"query": "john"},
    {"query": "a"},
    {"query": "comedy drama"},
    {"query": "comedy", "filters": {"tags": ["a"]}},
    {"query": "comedy", "not_filters": {"tags": ["c"]}},
    {"_ids": [3, 1]},
    {"ids": [4, 2]},
    {"is_all_filtered_items": True, "filters": {"tags": ["a"]}, "sort": "name_asc"},
]


@pytest.mark.parametrize("idx", range(len(ITEMS_CASES)))
def test_items_search(spark, idx):
    cfg = dict(ITEMS_CFG)
    cfg["sortings"] = {"name_asc": {"field": "name", "order": "asc"}}
    check(spark, "items", fx.ITEMS, cfg, ITEMS_CASES[idx])


DISJ_CFG = {
    "aggregations": {
        "tags": {"conjunction": False, "size": 10},
        "actors": {"size": 10},
        "category": {"conjunction": False, "size": 10},
    },
    "searchableFields": ["name"],
}

DISJ_CASES = [
    {"filters": {"tags": ["a", "e"]}},
    {"filters": {"tags": ["e"], "category": ["comedy"]}},
    {"filters": {"tags": ["b", "z"], "actors": ["john"]}},
    {"query": "movie", "filters": {"tags": ["a", "e"]}},
]


@pytest.mark.parametrize("idx", range(len(DISJ_CASES)))
def test_items_disjunctive(spark, idx):
    check(spark, "items", fx.ITEMS, DISJ_CFG, DISJ_CASES[idx])


MOVIES_CFG = {
    "aggregations": {
        "genres": {"size": 10, "conjunction": True},
        "tags": {"size": 10, "conjunction": True},
        "year": {"size": 10},
        "director": {"size": 10, "conjunction": False},
    },
    "searchableFields": ["name", "tags"],
}

MOVIES_CASES = [
    {},
    {"filters": {"genres": ["Biography"]}},
    {"filters": {"genres": ["Drama", "Crime"]}},
    {"filters": {"director": ["Quentin Tarantino", "Martin Scorsese"]}},
    {"not_filters": {"genres": ["Drama"]}},
    {"query": "lord"},
    {"query": "the"},
    {"query": "fight club"},
    {"query": "a"},
    {"filters_query": "(genres:Crime OR genres:Biography) AND tags:classic"},
    {"sort": "year_desc", "per_page": 7, "page": 2},
]


@pytest.mark.parametrize("idx", range(len(MOVIES_CASES)))
def test_movies_search(spark, idx):
    cfg = dict(MOVIES_CFG)
    cfg["sortings"] = {"year_desc": {"field": "year", "order": "desc"}}
    check(spark, "movies", fx.movies(), cfg, MOVIES_CASES[idx])


def test_bucket_rules(spark):
    cfg = {
        "aggregations": {
            "tags": {"size": 2, "chosen_filters_on_top": False},
            "actors": {"size": 10, "sort": "term", "order": "desc"},
            "category": {"size": 10, "hide_zero_doc_count": True},
        }
    }
    for input in [
        {"filters": {"tags": ["e"]}},
        {"filters": {"category": ["comedy"]}},
    ]:
        check(spark, "items", fx.ITEMS, cfg, input)


def test_facet_stats_and_exact_search(spark):
    cfg = {
        "aggregations": {"price": {"show_facet_stats": True, "size": 10}},
        "searchableFields": ["name"],
        "isExactSearch": True,
    }
    for input in [{}, {"query": "movie"}]:
        check(spark, "price", fx.PRICE_ITEMS, cfg, input)


def test_custom_id_field(spark):
    cfg = {
        "aggregations": {"tags": {"size": 10}},
        "custom_id_field": "uuid",
        "searchableFields": ["name"],
    }
    items = [
        {"uuid": "x7", "name": "alpha beta", "tags": ["a"]},
        {"uuid": "y9", "name": "beta gamma", "tags": ["a", "b"]},
        {"uuid": "z1", "name": "gamma delta", "tags": ["c"]},
    ]
    for input in [{"ids": ["y9", "z1"]}, {"query": "gamma"}]:
        check(spark, "uuid_items", items, cfg, input)


def test_aggregation_endpoint(spark):
    cfg = {"aggregations": {"genres": {"size": 10}}, "searchableFields": []}
    oracle = ItemsJSOracle(fx.fresh(fx.movies()), json.loads(json.dumps(cfg)))
    eng = get_engine(spark, "movies", fx.movies(), cfg)
    for input in [
        {"name": "genres", "per_page": 5},
        {"name": "genres", "per_page": 5, "page": 2},
    ]:
        got = eng.aggregation(dict(input))
        want = oracle.aggregation(dict(input))
        got_b = [(b["key"], b["doc_count"], bool(b["selected"])) for b in got["data"]["buckets"]]
        want_b = [(b["key"], b["doc_count"], bool(b["selected"])) for b in want["data"]["buckets"]]
        assert got["pagination"] == want["pagination"]
        assert got_b == want_b


SIMILAR_ID_ITEMS = [
    {"id": 1, "name": "movie1", "tags": ["a", "b", "c", "d"]},
    {"id": 2, "name": "movie2", "tags": ["a", "e", "f"]},
    {"id": 3, "name": "movie3", "tags": ["a", "c"]},
    {"id": 4, "name": "movie4", "tags": ["c", "a", "z"]},
    {"id": 5, "name": "movie5", "tags": ["x", "y"]},
]


def test_similar_endpoint(spark):
    cfg = {"aggregations": {}, "native_search_enabled": False}
    oracle = ItemsJSOracle(fx.fresh(SIMILAR_ID_ITEMS), dict(cfg))
    eng = get_engine(spark, "similar_id", SIMILAR_ID_ITEMS, cfg)
    for input in [
        {"field": "tags", "minimum": 1},
        {"field": "tags", "minimum": 2, "per_page": 2},
    ]:
        anchor = 1
        got = eng.similar(anchor, dict(input))
        want = oracle.similar(anchor, dict(input))
        assert got["pagination"] == want["pagination"]
        got_ids = [(i["_id"], i["intersection_length"]) for i in got["data"]["items"]]
        want_ids = [(i["_id"], i["intersection_length"]) for i in want["data"]["items"]]
        assert got_ids == want_ids


def test_callback_filter(spark):
    cfg = {"aggregations": {"tags": {"size": 10}}, "searchableFields": ["name"]}
    flt = lambda item: "c" in (item.get("tags") or [])  # noqa: E731
    check(spark, "items", fx.ITEMS, cfg, {"filter": flt})
    check(spark, "items", fx.ITEMS, cfg, {"query": "movie", "filter": flt})


# ---------------------------------------------------------------------------
# randomized transcript-shaped differential (seeded)
# ---------------------------------------------------------------------------

TX_CFG = {
    "aggregations": {
        "role": {"size": 10},
        "tool": {"size": 10, "conjunction": False},
    },
    "searchableFields": ["text"],
}


@pytest.fixture(scope="module")
def tx_rows(spark):
    from itemsjs_spark.data.transcripts import transcripts_df

    tdf = transcripts_df(spark, n_turns=150, n_convs=20, seed=11)
    rows = tdf.orderBy("conv_id", "turn_idx").collect()
    return [
        {k: v for k, v in r.asDict().items() if v is not None and k != "ts"}
        for r in rows
    ]


TX_CASES = [
    {"filters": {"role": ["assistant"]}},
    {"filters": {"role": ["assistant"], "tool": ["bash", "sql"]}},
    {"not_filters": {"role": ["system"]}},
    {"query": "shuffle"},
    {"query": "broadcast join"},
    {"query": "s"},
    {"query": "partition", "filters": {"role": ["user"]}},
    {"filters_query": "role:assistant AND role:user"},
    {"sort": "by_turn", "per_page": 10, "page": 3},
]


@pytest.mark.parametrize("idx", range(len(TX_CASES)))
def test_transcripts_differential(spark, tx_rows, idx):
    cfg = dict(TX_CFG)
    cfg["sortings"] = {
        "by_turn": {"field": ["turn_idx", "conv_id"], "order": ["desc", "asc"]}
    }
    check(spark, "tx150", tx_rows, cfg, TX_CASES[idx])


def test_reindex(spark):
    """O23: full rebuild replaces the corpus under the same config."""
    cfg = {"aggregations": {"tags": {"size": 10}}, "searchableFields": ["name"]}
    eng = get_engine(spark, "items", fx.ITEMS, cfg)
    new_items = [
        {"id": 1, "name": "solo movie", "tags": ["q"]},
        {"id": 2, "name": "other film", "tags": ["q", "r"]},
    ]
    eng2 = eng.reindex(fx.fresh(new_items))
    res = eng2.search({})
    assert res["pagination"]["total"] == 2
    assert [b["key"] for b in res["data"]["aggregations"]["tags"]["buckets"]] == ["q", "r"]
    assert [i["_id"] for i in eng2.search({"query": "film"})["data"]["items"]] == [2]
    # old engine must not leak into the rebuilt one
    assert eng2.search({"query": "movie4"})["pagination"]["total"] == 0


def test_error_parity(spark):
    """Reference-pinned error messages (SURVEY.md App. C.13) raised by
    the ENGINE, word for word."""
    from itemsjs_spark.engine import EngineError

    cfg = {"aggregations": {"tags": {"size": 10}}, "native_search_enabled": False}
    eng = get_engine(spark, "items", fx.ITEMS, cfg)
    with pytest.raises(EngineError, match=r'"query" and "filter" options are not working'):
        eng.search({"query": "x"})
    with pytest.raises(EngineError, match=r'"query" and "filter" options are not working'):
        eng.search({"filter": lambda it: True})

    cfg2 = {"aggregations": {"tags": {"size": 10}}}
    eng2 = get_engine(spark, "items", fx.ITEMS, cfg2)
    with pytest.raises(EngineError, match=r'Please define aggregation "nope" in config'):
        eng2.aggregation({"name": "nope"})
    with pytest.raises(EngineError, match=r"field name is required"):
        eng2.aggregation({})
    with pytest.raises(EngineError, match=r"The key does not exist in facets lists"):
        eng2.search({"filters_query": "made_up_key:v"})
    with pytest.raises(EngineError, match=r"Please define field in options"):
        eng2.similar(1, {})

    cfg3 = {"aggregations": {"category": {"show_facet_stats": True}}}
    eng3 = get_engine(spark, "items", fx.ITEMS, cfg3)
    with pytest.raises(EngineError, match=r"You cant use chars"):
        eng3.search({})


def test_transcripts_randomized_differential(spark, tx_rows):
    """Seeded random inputs (filters/not_filters/queries/paging combos)
    over the transcript corpus — differential fuzzing on top of the
    hand-picked cases."""
    import random

    rng = random.Random(20260817)
    roles = ["user", "assistant", "system", "tool"]
    tools = ["bash", "read", "write", "grep", "search", "browser", "sql"]
    words = ["spark", "shuffle", "partition", "broadcast", "salt", "index",
             "merge", "s", "pa", "the", "error", "agent"]
    cfg = dict(TX_CFG)
    cfg["sortings"] = {"by_turn": {"field": ["turn_idx"], "order": ["asc"]}}
    for _ in range(12):
        inp = {"per_page": rng.choice([5, 12])}
        kind = rng.randrange(5)
        if kind == 0:
            inp["filters"] = {"role": rng.sample(roles, rng.randint(1, 2))}
        elif kind == 1:
            inp["filters"] = {"tool": rng.sample(tools, rng.randint(1, 3))}
            if rng.random() < 0.5:
                inp["not_filters"] = {"role": [rng.choice(roles)]}
        elif kind == 2:
            inp["query"] = " ".join(rng.sample(words, rng.randint(1, 2)))
        elif kind == 3:
            inp["query"] = rng.choice(words)
            inp["filters"] = {"role": [rng.choice(roles)]}
        else:
            inp["not_filters"] = {"tool": rng.sample(tools, 2)}
            inp["sort"] = "by_turn"
            inp["page"] = rng.randint(1, 3)
        check(spark, "tx150", tx_rows, cfg, inp)


def test_aggregation_mutates_size_permanently(spark):
    """App C.6: aggregation() sets the named facet's size to 10000 in the
    shared config — subsequent search() calls see the mutated size."""
    cfg = {"aggregations": {"genres": {"size": 3}}, "searchableFields": []}
    oracle = ItemsJSOracle(fx.fresh(fx.movies()), json.loads(json.dumps(cfg)))
    eng = get_engine(spark, "movies", fx.movies(), {"aggregations": {"genres": {"size": 3}}, "searchableFields": [], "__tag": "mut"})
    before_e = len(eng.search({})["data"]["aggregations"]["genres"]["buckets"])
    before_o = len(oracle.search({})["data"]["aggregations"]["genres"]["buckets"])
    assert before_e == before_o == 3
    eng.aggregation({"name": "genres"})
    oracle.aggregation({"name": "genres"})
    after_e = len(eng.search({})["data"]["aggregations"]["genres"]["buckets"])
    after_o = len(oracle.search({})["data"]["aggregations"]["genres"]["buckets"])
    assert after_e == after_o > 3  # all genres now visible


def test_empty_ids_arrays_are_truthy(spark):
    """JS truthiness: `_ids: []` selects the ids branch (empty result),
    it does NOT fall through to all-documents."""
    cfg = dict(ITEMS_CFG)
    check(spark, "items", fx.ITEMS, cfg, {"_ids": []})
    check(spark, "items", fx.ITEMS, cfg, {"ids": []})
    check(spark, "items", fx.ITEMS, cfg, {"_ids": [2]})


def test_mixed_type_items_round_trip_exactly(spark):
    """JS allows `price: 1` and `price: '7'` in one field; the index
    collapses to JS string keys but returned items (and the callback
    filter's view) carry the ORIGINAL scalars — the former documented
    deviation is closed by the __raw_ sidecars."""
    items = [
        {"name": "a", "price": 1, "tags": ["x", 2]},
        {"name": "b", "price": "7", "tags": ["y"]},
        {"name": "c", "price": 2.5, "tags": []},
    ]
    eng = itemsjs_spark(
        spark, fx.fresh(items), {"aggregations": {"price": {"size": 10}}}
    )
    got = eng.search({"per_page": 10})["data"]["items"]
    by_name = {it["name"]: it for it in got}
    assert by_name["a"]["price"] == 1 and isinstance(by_name["a"]["price"], int)
    assert by_name["b"]["price"] == "7" and isinstance(by_name["b"]["price"], str)
    assert by_name["c"]["price"] == 2.5
    assert by_name["a"]["tags"] == ["x", 2]
    assert by_name["b"]["tags"] == ["y"]
    # facet keys still use the JS string coercion (index semantics)
    buckets = eng.search({"per_page": 1})["data"]["aggregations"]["price"]["buckets"]
    assert {b["key"] for b in buckets} == {"1", "7", "2.5"}
    # the callback filter sees original values too
    seen = eng.search({"filter": lambda it: isinstance(it["price"], int)})
    assert [it["name"] for it in seen["data"]["items"]] == ["a"]


def test_all_filtered_items_guard_refuses_corpus_collect(spark):
    # the reference-mandated allFilteredItems collect is opt-in; above
    # the cap it must refuse with a clear error, not ship the corpus to
    # the driver
    from itemsjs_spark.engine.query import EngineError

    items = [{"id": i, "name": f"n{i}", "tags": ["a"]} for i in range(30)]
    eng = get_engine(
        spark, "guard30", items, {"aggregations": {"tags": {}}}
    )
    r = eng.search({"is_all_filtered_items": True, "sort": None,
                    "per_page": 5, "filters": {"tags": ["a"]}})
    assert r["data"]["allFilteredItems"] is None or len(
        r["data"]["allFilteredItems"]) == 30
    old = eng.ALL_FILTERED_MAX_ITEMS
    try:
        eng.ALL_FILTERED_MAX_ITEMS = 10
        with pytest.raises(EngineError, match="collect"):
            eng.search({"is_all_filtered_items": True,
                        "sort": "name_asc", "per_page": 5,
                        "filters": {"tags": ["a"]}})
    finally:
        eng.ALL_FILTERED_MAX_ITEMS = old
