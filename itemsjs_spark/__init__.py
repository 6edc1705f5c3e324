"""itemsjs_spark — a PySpark-native faceted full-text analytics engine.

From-scratch reimplementation of the query semantics of
stereobooster/itemsjs 2.1.23 (reference at /root/reference, read-only),
architected for Spark: declarative DataFrame plans, Arrow-batched pandas
UDFs for text analysis, materialized inverted/facet index tables designed
for 10^12-row corpora.
"""

from .oracle.itemsjs_oracle import ItemsJSOracle

__all__ = ["ItemsJSOracle"]
