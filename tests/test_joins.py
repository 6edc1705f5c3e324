"""As-of join (ops/joins.py): point-in-time attribution semantics —
inclusive backward match, per-key isolation, left-outer nulls,
tolerance window, deterministic tie-break — checked against a
hand-computed truth table and a pandas merge_asof cross-check."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest

from itemsjs_spark.ops.joins import asof_join


def _ts(s):
    return dt.datetime(2024, 1, 1, 0, 0, 0) + dt.timedelta(seconds=s)


@pytest.fixture(scope="module")
def sides(spark):
    left = spark.createDataFrame(
        [
            (1, "u1", _ts(10)),
            (2, "u1", _ts(25)),
            (3, "u1", _ts(5)),   # before any right row -> null
            (4, "u2", _ts(50)),  # equal-ts right row -> inclusive match
            (5, "u3", _ts(99)),  # key with no right rows at all
        ],
        "click_id int, user_id string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("u1", _ts(8), 100.0, 1),
            ("u1", _ts(20), 200.0, 2),
            ("u2", _ts(50), 300.0, 3),
            ("u2", _ts(50), 333.0, 4),  # same (key, ts): tiebreak winner
        ],
        "user_id string, ts timestamp, value double, rid int",
    )
    return left, right


def test_asof_backward_inclusive(sides):
    left, right = sides
    out = asof_join(
        left, right, "user_id", "ts",
        right_cols=["value"], right_tiebreak="rid",
    )
    got = {r["click_id"]: r for r in out.collect()}
    assert len(got) == 5  # left-outer: every left row survives exactly once
    assert got[1]["asof_value"] == 100.0   # ts=10 -> right@8
    assert got[2]["asof_value"] == 200.0   # ts=25 -> right@20
    assert got[3]["asof_value"] is None    # ts=5 precedes all right rows
    assert got[3]["asof_ts"] is None
    # equal-ts is inclusive, and the max-tiebreak duplicate wins
    assert got[4]["asof_value"] == 333.0
    assert got[4]["asof_ts"] == _ts(50)
    assert got[5]["asof_value"] is None    # key never seen on the right


def test_asof_tolerance(sides):
    left, right = sides
    out = asof_join(
        left, right, "user_id", "ts",
        right_cols=["value"], right_tiebreak="rid",
        tolerance_seconds=4,
    )
    got = {r["click_id"]: r["asof_value"] for r in out.collect()}
    # ts=10 matched right@8 (age 2 <= 4) but ts=25's match @20 (age 5) voids
    assert got[1] == 100.0
    assert got[2] is None
    assert got[4] == 333.0  # age 0


def test_asof_matches_pandas_merge_asof(spark):
    """Randomized cross-check vs pandas merge_asof (backward,
    inclusive) on collision-free timestamps."""
    import random

    rnd = random.Random(7)
    lts = sorted(rnd.sample(range(0, 5000, 2), 120))
    rts = sorted(rnd.sample(range(1, 5001, 2), 80))
    keys = ["a", "b", "c"]
    lrows = [(i, keys[i % 3], _ts(t)) for i, t in enumerate(lts)]
    rrows = [(keys[j % 3], _ts(t), float(j)) for j, t in enumerate(rts)]
    left = spark.createDataFrame(lrows, "lid int, k string, ts timestamp")
    right = spark.createDataFrame(rrows, "k string, ts timestamp, v double")

    got = {
        r["lid"]: r["asof_v"]
        for r in asof_join(left, right, "k", "ts", right_cols=["v"]).collect()
    }

    lp = pd.DataFrame(lrows, columns=["lid", "k", "ts"]).sort_values("ts")
    rp = pd.DataFrame(rrows, columns=["k", "ts", "v"]).sort_values("ts")
    exp = pd.merge_asof(lp, rp, on="ts", by="k", direction="backward")
    for _, row in exp.iterrows():
        want = None if pd.isna(row["v"]) else row["v"]
        assert got[row["lid"]] == want


def test_interval_join_buckets_bounds_and_guard(spark):
    """Intervals spanning multiple buckets still match exactly once per
    point; end is exclusive by default and inclusive on request;
    sub-second precision respected; the explosion guard raises instead
    of silently truncating."""
    from datetime import datetime, timezone

    import pytest as _pytest

    from itemsjs_spark.ops.joins import interval_join

    def t(s):
        return datetime.fromtimestamp(1704067200 + s, tz=timezone.utc)

    pts = spark.createDataFrame(
        [
            (1, "a", t(10)),
            (2, "a", t(7150)),      # same interval, different bucket
            (3, "a", t(7200)),      # exactly at the end boundary
            (4, "a", t(10.5)),      # sub-second inside
            (5, "b", t(10)),        # other key
        ],
        ["eid", "u", "ts"],
    )
    ivs = spark.createDataFrame(
        [("a", t(0), t(7200), "w1"), ("b", t(0), t(5), "w2")],
        ["u", "start", "end", "win"],
    )
    excl = sorted(
        r["eid"]
        for r in interval_join(
            pts, ivs, "ts", "start", "end", key="u", bucket_seconds=3600
        ).collect()
    )
    assert excl == [1, 2, 4]  # 3 excluded (end-exclusive), 5 outside w2
    incl = sorted(
        r["eid"]
        for r in interval_join(
            pts, ivs, "ts", "start", "end", key="u",
            bucket_seconds=3600, end_inclusive=True,
        ).collect()
    )
    assert incl == [1, 2, 3, 4]
    # each matched point appears exactly once despite the 3-bucket span
    rows = interval_join(
        pts, ivs, "ts", "start", "end", key="u", bucket_seconds=3600
    ).collect()
    assert len(rows) == len({r["eid"] for r in rows})
    with _pytest.raises(ValueError):
        interval_join(
            pts, ivs, "ts", "start", "end", key="u",
            bucket_seconds=1, max_buckets_per_interval=100,
        ).count()
