"""Transcript-corpus sources (BASELINE.json input_hint).

The production corpus is an Iceberg table of multi-turn transcripts
``(conv_id string, turn_idx int, role string, text string, tool string,
ts timestamp)``. This module is the ONE place that turns "where the
corpus lives" into a DataFrame the engine accepts:

* ``read_transcripts(spark, "catalog.db.transcripts")`` — Iceberg (or
  any catalog) table via ``spark.read.table``; Catalyst gets the
  table's partitioning/statistics, so conv_id/ts filters prune files
  and snapshots behave as usual (time travel via
  ``option("snapshot-id", ...)`` forwarded through ``options``).
* ``read_transcripts(spark, "/path", format="iceberg")`` — path-based
  Iceberg; needs the iceberg-spark runtime on the classpath. This
  sandbox doesn't ship the jar, so the failure is re-raised with a
  clear gate message instead of a bare ClassNotFound.
* ``read_transcripts(spark, "/path")`` — parquet layout (the test and
  bench corpora): plain ``spark.read.parquet``.

Everything downstream (index build, dedup, analytics) is layout-
agnostic — it sees the validated DataFrame only.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# (column, type prefix accepted) — the authoritative transcript shape;
# int32/int64 are both fine for turn_idx, tool is nullable string
TRANSCRIPT_SCHEMA: Sequence[Tuple[str, Tuple[str, ...]]] = (
    ("conv_id", ("string",)),
    ("turn_idx", ("int", "bigint", "smallint")),
    ("role", ("string",)),
    ("text", ("string",)),
    ("tool", ("string",)),
    ("ts", ("timestamp",)),
)


class SourceError(ValueError):
    """A transcript source is missing, mis-shaped, or needs a jar/
    catalog this session doesn't have."""


def validate_transcripts(df: DataFrame, strict: bool = True) -> DataFrame:
    """Check the transcript contract and return the projected DataFrame
    (contract columns, contract order). ``strict=False`` lets extra
    columns through untouched (analytics pipelines often carry more)."""
    missing = [c for c, _ in TRANSCRIPT_SCHEMA if c not in df.columns]
    if missing:
        raise SourceError(
            f"transcript source is missing columns {missing}; expected "
            f"{[c for c, _ in TRANSCRIPT_SCHEMA]}"
        )
    types = dict(df.dtypes)
    for col, accept in TRANSCRIPT_SCHEMA:
        dt = types[col]
        if not any(dt.startswith(a) for a in accept):
            raise SourceError(
                f"transcript column {col!r} has type {dt}; expected one "
                f"of {list(accept)}"
            )
    if strict:
        return df.select(*[c for c, _ in TRANSCRIPT_SCHEMA])
    return df


def read_transcripts(
    spark: SparkSession,
    source: str,
    format: Optional[str] = None,
    options: Optional[Dict[str, Any]] = None,
    strict: bool = True,
) -> DataFrame:
    """Load + validate a transcript corpus.

    ``source`` is a catalog table name (contains no ``/``) or a path.
    ``format`` defaults to the catalog for table names and parquet for
    paths; pass ``"iceberg"`` for path-based Iceberg warehouses,
    ``"orc"`` for ORC layouts (self-describing columnar like parquet —
    native reader, predicate pushdown and column pruning apply as
    usual), or ``"json"`` / ``"csv"`` for text interchange dumps (the
    migration path from the reference's JSON item arrays): the text
    formats read with the EXPLICIT transcript schema — schema inference
    over a 10^12-turn dump would be a full extra pass AND would type ts
    as string — and CSV defaults to ``header=true``. ``options``
    forwards reader options (e.g. Iceberg's snapshot-id /
    as-of-timestamp time travel, CSV delimiters, JSON
    timestampFormat)."""
    reader = spark.read
    if format in ("json", "csv"):
        ddl = (
            "conv_id string, turn_idx int, role string, text string, "
            "tool string, ts timestamp"
        )
        reader = reader.schema(ddl)
        if format == "csv" and "header" not in (options or {}):
            reader = reader.option("header", "true")
    for k, v in (options or {}).items():
        reader = reader.option(k, str(v))
    try:
        if "/" not in source and format is None:
            df = reader.table(source)
        elif format is None or format == "parquet":
            df = reader.parquet(source)
        else:
            df = reader.format(format).load(source)
    except Exception as e:  # noqa: BLE001 — re-raise with the gate story
        msg = str(e)
        if "iceberg" in msg.lower() or (format == "iceberg"):
            raise SourceError(
                "Iceberg source needs the iceberg-spark-runtime jar and "
                "a configured catalog (spark.sql.catalog.*); neither "
                f"ships in this sandbox. Underlying error: {msg[:300]}"
            ) from e
        raise SourceError(
            f"cannot read transcript source {source!r}: {msg[:300]}"
        ) from e
    return validate_transcripts(df, strict=strict)


def order_key(df: DataFrame) -> DataFrame:
    """The corpus' stable total order (north_rule: per-turn text
    equality under stable (conv_id, turn_idx) ordering) as a sortable
    projection — what ``assign_docids(order_by=...)`` consumes."""
    return df.orderBy(F.col("conv_id").asc(), F.col("turn_idx").asc())
