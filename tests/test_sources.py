"""Transcript source contract (itemsjs_spark/sources): parquet reads,
schema validation, Iceberg gate messaging."""

from __future__ import annotations

import os

import pytest

from itemsjs_spark.data.transcripts import transcripts_df
from itemsjs_spark.sources import (
    SourceError,
    read_transcripts,
    validate_transcripts,
)


@pytest.fixture(scope="module")
def corpus_path(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("src") / "tx.parquet")
    transcripts_df(spark, n_turns=200, n_convs=20).write.parquet(p)
    return p


def test_read_parquet_transcripts(spark, corpus_path):
    df = read_transcripts(spark, corpus_path)
    assert df.columns == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    assert df.count() == 200


def test_strict_projection_and_extra_columns(spark, corpus_path):
    df = read_transcripts(spark, corpus_path, strict=False)
    extra = df.withColumn("extra", df.turn_idx * 2)
    kept = validate_transcripts(extra, strict=False)
    assert "extra" in kept.columns
    assert "extra" not in validate_transcripts(extra).columns


def test_missing_column_is_a_clear_error(spark, corpus_path):
    df = read_transcripts(spark, corpus_path).drop("role")
    with pytest.raises(SourceError, match="missing columns.*role"):
        validate_transcripts(df)


def test_wrong_type_is_a_clear_error(spark, corpus_path):
    base = read_transcripts(spark, corpus_path)
    df = base.withColumn("turn_idx", base.turn_idx.cast("string"))
    with pytest.raises(SourceError, match="turn_idx.*string"):
        validate_transcripts(df)


def test_iceberg_gate_message(spark, corpus_path):
    # no iceberg-spark runtime in this sandbox: the failure must say so
    # (on a cluster with the jar + catalog this same call just works)
    with pytest.raises(SourceError, match="iceberg-spark-runtime"):
        read_transcripts(spark, corpus_path, format="iceberg")


def test_bad_path_is_a_clear_error(spark):
    with pytest.raises(SourceError, match="cannot read transcript source"):
        read_transcripts(spark, os.path.join("/nonexistent", "x.parquet"))


def test_read_jsonl_transcripts_round_trip(spark, corpus_path, tmp_path):
    base = read_transcripts(spark, corpus_path)
    jdir = str(tmp_path / "jsonl")
    base.coalesce(1).write.json(jdir)
    got = read_transcripts(spark, jdir, format="json")
    assert dict(got.dtypes)["ts"] == "timestamp"
    a = sorted(map(tuple, base.collect()))
    b = sorted(map(tuple, got.collect()))
    assert a == b


def test_read_csv_transcripts_round_trip(spark, corpus_path, tmp_path):
    base = read_transcripts(spark, corpus_path)
    cdir = str(tmp_path / "csv")
    base.coalesce(1).write.option("header", "true").csv(cdir)
    got = read_transcripts(spark, cdir, format="csv")
    assert dict(got.dtypes)["turn_idx"] == "int"
    a = sorted(map(tuple, base.collect()))
    b = sorted(map(tuple, got.collect()))
    assert a == b


def test_json_source_feeds_the_engine(spark, corpus_path, tmp_path):
    from itemsjs_spark.engine import itemsjs_spark

    base = read_transcripts(spark, corpus_path)
    jdir = str(tmp_path / "jfeed")
    base.write.json(jdir)
    eng = itemsjs_spark(
        spark,
        read_transcripts(spark, jdir, format="json"),
        {"aggregations": {"role": {}}, "searchableFields": ["text"]},
        order_by=["conv_id", "turn_idx"],
    )
    assert eng.fulltext_hits("spark").count() > 0


def test_read_orc_transcripts_round_trip(spark, corpus_path, tmp_path):
    base = read_transcripts(spark, corpus_path)
    odir = str(tmp_path / "orc")
    base.coalesce(1).write.orc(odir)
    got = read_transcripts(spark, odir, format="orc")
    assert dict(got.dtypes)["ts"].startswith("timestamp")
    assert dict(got.dtypes)["turn_idx"] == "int"
    a = sorted(map(tuple, base.collect()))
    b = sorted(map(tuple, got.collect()))
    assert a == b
