"""PageRank over transition graphs: exact-integer power iteration
(engine-portable by construction) checked against a pure-Python
re-implementation of the same micro-unit arithmetic."""

from __future__ import annotations

from itemsjs_spark.ops.graph import SCALE, pagerank


def _py_pagerank(edge_weights, iters=3, damping_pct=85):
    nodes = sorted({u for u, _ in edge_weights} | {v for _, v in edge_weights})
    n = len(nodes)
    out = {}
    for (u, v), w in edge_weights.items():
        out[u] = out.get(u, 0) + w
    teleport = ((100 - damping_pct) * SCALE // 100) // n
    pr = {v: SCALE // n for v in nodes}
    for _ in range(iters):
        s = {v: 0 for v in nodes}
        for (u, v), w in edge_weights.items():
            s[v] += pr[u] * w // out[u]
        pr = {v: teleport + damping_pct * s[v] // 100 for v in nodes}
    return pr


def _edges_df(spark, edge_weights):
    rows = [
        (u, v) for (u, v), w in edge_weights.items() for _ in range(w)
    ]
    return spark.createDataFrame(rows, "src string, dst string")


def test_pagerank_matches_python_micro_units(spark):
    ew = {
        ("a", "b"): 3,
        ("b", "c"): 2,
        ("c", "a"): 1,
        ("a", "c"): 1,
        ("b", "a"): 1,
    }
    got = {
        r["node"]: r["pr_micro"]
        for r in pagerank(_edges_df(spark, ew)).collect()
    }
    assert got == _py_pagerank(ew)


def test_pagerank_sink_leaks_mass_and_hub_ranks_high(spark):
    # star into 'hub': everyone points at hub, hub points nowhere
    ew = {("x", "hub"): 1, ("y", "hub"): 1, ("z", "hub"): 1}
    rows = {
        r["node"]: r for r in pagerank(_edges_df(spark, ew)).collect()
    }
    assert rows["hub"]["pr_micro"] == max(r["pr_micro"] for r in rows.values())
    assert rows["hub"]["pr_micro"] == _py_pagerank(ew)["hub"]
    # spokes hold teleport-only mass after the first step
    assert rows["x"]["pr_micro"] == rows["y"]["pr_micro"] == rows["z"]["pr_micro"]


def test_pagerank_weight_column_equals_repeated_edges(spark):
    ew = {("a", "b"): 4, ("b", "a"): 2}
    per_row = pagerank(_edges_df(spark, ew))
    weighted = pagerank(
        spark.createDataFrame(
            [(u, v, w) for (u, v), w in ew.items()],
            "src string, dst string, w long",
        ),
        weight_col="w",
    )
    assert {(r["node"], r["pr_micro"]) for r in per_row.collect()} == {
        (r["node"], r["pr_micro"]) for r in weighted.collect()
    }
