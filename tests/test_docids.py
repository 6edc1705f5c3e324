"""Distributed docid assignment: dense, unique, order-correct, and no
single-partition window/exchange anywhere in the plan (VERDICT r1
scale-killer #3 — the group-table prefix sum must itself be distributed).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from itemsjs_spark.engine.indexer import DOCID, assign_docids


def _corpus(spark, n_groups=100_000, rows_per_group=3):
    """n_groups × rows_per_group rows, group keys deliberately written in
    a hash-scrambled order so range partitioning has real work to do."""
    return (
        spark.range(n_groups * rows_per_group, numPartitions=16)
        .select(
            F.concat(
                F.lit("g"),
                F.lpad((F.col("id") % n_groups).cast("string"), 7, "0"),
            ).alias("conv_id"),
            # raw position inside the group; ties impossible
            (F.col("id") / n_groups).cast("int").alias("turn_idx"),
        )
    )


def test_docids_dense_unique_ordered_many_groups(spark):
    n_groups, rpg = 100_000, 3
    df = _corpus(spark, n_groups, rpg)
    out = assign_docids(df, ["conv_id", "turn_idx"]).persist()
    n = out.count()
    assert n == n_groups * rpg

    stats = out.agg(
        F.min(DOCID).alias("lo"),
        F.max(DOCID).alias("hi"),
        F.countDistinct(DOCID).alias("d"),
    ).collect()[0]
    assert (stats["lo"], stats["hi"], stats["d"]) == (1, n, n)

    # docid order == (conv_id, turn_idx) order: the sorted sequence of
    # keys by docid must be non-decreasing lexicographically
    rows = (
        out.orderBy(DOCID)
        .select("conv_id", "turn_idx")
        .collect()
    )
    keys = [(r["conv_id"], r["turn_idx"]) for r in rows]
    assert keys == sorted(keys)
    out.unpersist()


def test_docids_stable_across_actions(spark):
    """Two separate actions over the same assignment must agree — the
    pinned range boundaries make spark_partition_id safe here."""
    df = _corpus(spark, 5_000, 4)
    out = assign_docids(df, ["conv_id", "turn_idx"])
    a = sorted(map(tuple, out.select("conv_id", "turn_idx", DOCID).collect()))
    b = sorted(map(tuple, out.select("conv_id", "turn_idx", DOCID).collect()))
    assert a == b


def test_docids_plan_has_no_single_partition_exchange(spark):
    df = _corpus(spark, 10_000, 2)
    out = assign_docids(df, ["conv_id", "turn_idx"], distributed=True)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan, plan


def test_docids_small_and_distributed_plans_agree(spark):
    """The cost router is a physical choice only: both plans assign the
    IDENTICAL docid to every row."""
    df = _corpus(spark, 3_000, 4)
    a = sorted(
        map(
            tuple,
            assign_docids(df, ["conv_id", "turn_idx"], distributed=False)
            .select("conv_id", "turn_idx", DOCID)
            .collect(),
        )
    )
    b = sorted(
        map(
            tuple,
            assign_docids(df, ["conv_id", "turn_idx"], distributed=True)
            .select("conv_id", "turn_idx", DOCID)
            .collect(),
        )
    )
    assert a == b


def test_docids_size_router(spark, monkeypatch):
    """Auto-routing: inputs under the size gate take the lazy one-job
    plan (no interim caches); over it, the distributed prefix sum
    (which exposes its pinned group cache via _interim_caches)."""
    from itemsjs_spark.engine import indexer

    df = _corpus(spark, 1_000, 2)
    small = assign_docids(df, ["conv_id", "turn_idx"])  # range data: tiny
    assert getattr(small, "_interim_caches", []) == []

    monkeypatch.setattr(indexer, "DOCID_DISTRIBUTED_MIN_BYTES", 1)
    big = assign_docids(df, ["conv_id", "turn_idx"])
    assert getattr(big, "_interim_caches", [])
    for c in big._interim_caches:
        c.unpersist()


def test_docids_single_key_order(spark):
    """Degenerate case: one order key (group == key)."""
    df = spark.range(1000, numPartitions=8).select(
        F.concat(F.lit("k"), F.lpad(F.col("id").cast("string"), 5, "0")).alias("k")
    )
    out = assign_docids(df, ["k"])
    rows = out.orderBy(DOCID).select("k").collect()
    ks = [r["k"] for r in rows]
    assert ks == sorted(ks)
    assert out.agg(F.countDistinct(DOCID)).collect()[0][0] == 1000


def test_docids_property_random_key_multisets(spark):
    """Property (hypothesis): for arbitrary key multisets the assignment
    is always dense, unique, and ordered by (conv_id, turn_idx)."""
    from hypothesis import given, settings, strategies as st

    keys = st.text(alphabet="abc", min_size=0, max_size=3)

    @settings(max_examples=15, deadline=None)
    @given(st.lists(st.tuples(keys, st.integers(0, 9)), min_size=1, max_size=60))
    def check(rows):
        # turn_idx must be unique within a group for a total order
        seen = set()
        uniq = []
        for k, t in rows:
            if (k, t) not in seen:
                seen.add((k, t))
                uniq.append((k, t))
        df = spark.createDataFrame(uniq, "conv_id string, turn_idx int")
        out = assign_docids(df, ["conv_id", "turn_idx"]).collect()
        assert sorted(r[DOCID] for r in out) == list(range(1, len(uniq) + 1))
        by_docid = sorted(out, key=lambda r: r[DOCID])
        ks = [(r["conv_id"], r["turn_idx"]) for r in by_docid]
        assert ks == sorted(uniq)

    check()


def test_docids_dense_broadcast_route_matches_window_route(spark):
    """Dense unique per-group turn ranges take the map-only broadcast
    route (no corpus shuffle/window); the assignment is identical to
    the window route, and the executed plan proves the shape."""
    from itemsjs_spark.engine import indexer

    df = _corpus(spark, 3_000, 4)  # turn_idx 0..3 per group: dense
    dense = assign_docids(df, ["conv_id", "turn_idx"], distributed=True)
    plan = dense._jdf.queryExecution().executedPlan().toString()
    # the corpus joins the broadcast offsets; the only window left is
    # the group-table range prefix sum — no per-row row_number anywhere
    assert "BroadcastHashJoin" in plan, plan
    assert "row_number" not in plan, plan

    # gapped turns (0,2,4,...) must fall back to the window route
    gapped = df.withColumn("turn_idx", F.col("turn_idx") * 2)
    win = assign_docids(gapped, ["conv_id", "turn_idx"], distributed=True)
    wplan = win._jdf.queryExecution().executedPlan().toString()
    assert "row_number" in wplan, wplan

    a = sorted(
        map(tuple, dense.select("conv_id", "turn_idx", DOCID).collect())
    )
    # the gapped corpus maps turn t -> 2t; halving recovers comparability
    b = sorted(
        (r["conv_id"], r["turn_idx"] // 2, r[DOCID])
        for r in win.select("conv_id", "turn_idx", DOCID).collect()
    )
    assert a == b
    for d in (dense, win):
        for c in getattr(d, "_interim_caches", []):
            c.unpersist()


def test_docids_duplicate_last_key_never_takes_dense_route(spark):
    """Duplicated (group, turn) keys can satisfy gaplessness by count
    alone; the count_distinct guard must force the window route and
    keep docids unique."""
    base = _corpus(spark, 500, 3)
    dup = base.union(base.limit(200))  # 200 duplicated keys
    out = assign_docids(dup, ["conv_id", "turn_idx"], distributed=True)
    n = dup.count()
    got = out.agg(
        F.countDistinct(DOCID).alias("d"),
        F.min(DOCID).alias("lo"),
        F.max(DOCID).alias("hi"),
    ).collect()[0]
    assert (got["d"], got["lo"], got["hi"]) == (n, 1, n)
    for c in getattr(out, "_interim_caches", []):
        c.unpersist()


def test_docids_dense_route_respects_group_cap(spark, monkeypatch):
    """Above DOCID_BROADCAST_MAX_GROUPS the dense corpus still goes
    through the shuffle+window route (offsets too big to broadcast)."""
    from itemsjs_spark.engine import indexer

    monkeypatch.setattr(indexer, "DOCID_BROADCAST_MAX_GROUPS", 10)
    df = _corpus(spark, 1_000, 2)
    out = assign_docids(df, ["conv_id", "turn_idx"], distributed=True)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "row_number" in plan, plan
    assert out.agg(F.countDistinct(DOCID)).collect()[0][0] == 2_000
    for c in getattr(out, "_interim_caches", []):
        c.unpersist()
