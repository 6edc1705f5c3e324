"""Spark engine: index build + query execution."""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Union

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..jsutil import js_key
from .indexer import DOCID, FK_PREFIX, RAW_PREFIX, Index, assign_docids, build_index
from .query import EngineError, SearchEngine

__all__ = [
    "DOCID",
    "FK_PREFIX",
    "Index",
    "EngineError",
    "SearchEngine",
    "assign_docids",
    "build_index",
    "itemsjs_spark",
    "items_to_df",
]


def itemsjs_spark(
    spark: SparkSession,
    items_or_df: Union[DataFrame, List[Dict[str, Any]]],
    configuration: Optional[Dict[str, Any]] = None,
    docid_col: Optional[str] = None,
    order_by: Optional[Sequence[str]] = None,
) -> SearchEngine:
    """Public entry point mirroring ``itemsjs(items, configuration)``.

    Accepts either a DataFrame (provide ``docid_col`` or ``order_by`` for a
    stable document identity) or a small list of dicts (test/fixture path:
    input order becomes ``_docid``, like the reference's 1-based ``_id``).
    """
    configuration = configuration or {}
    if isinstance(items_or_df, DataFrame):
        df = items_or_df
        idx = build_index(
            spark, df, configuration, docid_col=docid_col, order_by=order_by
        )
    else:
        df = items_to_df(spark, items_or_df)
        idx = build_index(spark, df, configuration, docid_col="__input_order")
        idx.docs = idx.docs.drop("__input_order")
    return SearchEngine(idx)


def _infer_field_type(values: List[Any]):
    kinds = set()
    elem_str = False
    for v in values:
        if v is None:
            continue
        if isinstance(v, bool):
            kinds.add("bool")
        elif isinstance(v, int):
            kinds.add("int")
        elif isinstance(v, float):
            kinds.add("float")
        elif isinstance(v, str):
            kinds.add("str")
        elif isinstance(v, (list, tuple)):
            kinds.add("array")
            if any(isinstance(e, str) for e in v):
                elem_str = True
        else:
            kinds.add("str")
    if kinds == {"bool"}:
        return T.BooleanType(), lambda v: v
    if kinds == {"int"}:
        return T.LongType(), lambda v: v
    if kinds <= {"int", "float"}:
        return T.DoubleType(), lambda v: float(v) if v is not None else None
    if "array" in kinds and len(kinds) == 1:
        if elem_str:
            return (
                T.ArrayType(T.StringType()),
                lambda v: [js_key(e) for e in v] if v is not None else None,
            )
        return (
            T.ArrayType(T.LongType()),
            lambda v: list(v) if v is not None else None,
        )
    # mixed or string: JS object-key / toString coercion
    return T.StringType(), lambda v: js_key(v)


def items_to_df(spark: SparkSession, items: List[Dict[str, Any]]) -> DataFrame:
    """Small list-of-dicts -> DataFrame with ``__input_order`` (1-based).

    Mixed-typed fields collapse to strings via JS key coercion for the
    INDEX (facet/search semantics need the JS string keys anyway); a
    ``__raw_<field>`` JSON sidecar preserves each original value, so
    items come back exactly as passed in — no observable deviation."""
    import json

    field_order: List[str] = []
    for it in items:
        for k in it.keys():
            if k not in field_order and k != "_id":
                field_order.append(k)
    converters = {}
    struct_fields = [T.StructField("__input_order", T.LongType(), False)]
    lossy: List[str] = []
    for f in field_order:
        vals = [it.get(f) for it in items]
        dtype, conv = _infer_field_type(vals)
        converters[f] = conv
        struct_fields.append(T.StructField(f, dtype, True))
        # the collapse is lossy iff any conversion changed a value OR its
        # type (number→string, int→float promotion, mixed arrays
        # through js_key, ...)
        def _changed(v, conv=conv):
            if v is None:
                return False
            c = conv(v)
            ref = list(v) if isinstance(v, tuple) else v
            return c != ref or type(c) is not type(ref)

        if any(_changed(v) for v in vals):
            lossy.append(f)
            struct_fields.append(
                T.StructField(RAW_PREFIX + f, T.StringType(), True)
            )
    rows = []
    for i, it in enumerate(items):
        row = [i + 1]
        for f in field_order:
            v = it.get(f)
            row.append(converters[f](v) if v is not None else None)
            if f in lossy:
                row.append(None if v is None else json.dumps(v, default=str))
        rows.append(tuple(row))
    return spark.createDataFrame(rows, T.StructType(struct_fields))
