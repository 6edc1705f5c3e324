"""Distributed logistic regression (learned quality filter): GD math
pinned by hand, separable-data recovery, and Spark-vs-unrolled-SQL
equality through all iterations (the oracle contract)."""

from __future__ import annotations

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from itemsjs_spark.ops.classifier import logreg_fit, logreg_score, logreg_sql


def test_first_step_gradient_from_zero_init(spark):
    # zero init -> p = 0.5 for every row, so the first gradient is
    # avg((0.5 - y) * x): checkable by hand
    df = spark.createDataFrame(
        [(1.0, 1), (3.0, 1), (-2.0, 0), (-4.0, 0)], "x double, y int"
    )
    w, b = logreg_fit(df, ["x"], "y", iters=1, lr=1.0)
    # gb = avg(0.5 - y) = (−0.5 −0.5 +0.5 +0.5)/4 = 0
    assert b == 0.0
    # gx = avg((0.5−y)·x) = (−0.5·1 −0.5·3 +0.5·−2 +0.5·−4)/4 = −1.25
    assert w == [1.25]


def test_separable_data_learns_the_split(spark):
    rows = [(float(i), 1 if i > 0 else 0) for i in range(-20, 21) if i != 0]
    df = spark.createDataFrame(rows, "x double, y int")
    w, b = logreg_fit(df, ["x"], "y", iters=10, lr=0.5)
    assert w[0] > 0  # positive feature separates upward
    scored = logreg_score(df, ["x"], w, b)
    agree = scored.filter(F.col("lr_keep") == F.col("y")).count()
    assert agree == len(rows)


def test_spark_matches_unrolled_sql(spark):
    rows = [
        (i, 10 + (i * 7) % 60, 1 + (i * 3) % 9) for i in range(200)
    ]
    df = spark.createDataFrame(rows, "doc_id long, n long, d long")
    feats = df.select(
        "doc_id",
        F.round(F.col("n") / 50.0, 6).alias("x_len"),
        F.round(F.col("d") / 10.0, 6).alias("x_div"),
        (F.col("n") >= 40).cast("int").alias("y"),
    )
    cols = ["x_len", "x_div"]
    w, b = logreg_fit(feats, cols, "y", iters=3, lr=1.0)
    got = {
        r["doc_id"]: (r["lr_score"], r["lr_keep"])
        for r in logreg_score(feats, cols, w, b).collect()
    }

    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id BIGINT, n BIGINT, d BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    sql = logreg_sql(
        {
            "x_len": "round(n / 50.0, 6)",
            "x_div": "round(d / 10.0, 6)",
        },
        "CASE WHEN n >= 40 THEN 1 ELSE 0 END",
        "t",
        iters=3,
        lr=1.0,
    )
    want = {r[0]: (r[1], r[2]) for r in con.sql(sql).fetchall()}
    assert set(got) == set(want)
    for k in got:
        assert got[k][1] == want[k][1], k
        assert math.isclose(got[k][0], want[k][0], abs_tol=2e-6), (
            k, got[k], want[k]
        )
