"""Facet-value posting blocks: index-side set algebra for facet filters.

The scan path (``__fk_*`` array predicates over the corpus) re-reads
every document per query; at 10^12 turns a selective filter should touch
only ITS OWN posting lists, the way the reference intersects per-value
bitmaps (src/helpers.ts bitset algebra). This module stores each facet
value's docid set in the SAME delta+varint block store as the fulltext
postings — the synthetic term is ``field ␟ key`` — so facet filters get
term-pruned compressed scans, per-range co-location, snapshot appends
and compaction without any new codec or storage code.

Operations provided (each a bounded relational plan, never a corpus
scan):

* ``docids_for_values``  — one facet field's filter as a docid set:
  conjunctive (docid matches ALL values: one groupBy counting distinct
  matched values) or disjunctive (distinct union).
* ``intersect_all``      — AND across fields via successive left-semi
  joins on docid (the bitmap-AND analog).
* ``crossed_bucket_counts`` — (key, doc_count) for one field against a
  docid filter-set: its OWN postings semi-joined with the filter, then
  one groupBy; zero-count keys restored from the facet dimension.
"""

from __future__ import annotations

from typing import Iterable, List, Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .blocks import build_posting_blocks, postings_from_blocks
from .indexer import DOCID, FK_PREFIX, Index

SEP = "\x1f"  # unit separator: cannot appear in JS-coerced facet keys


def facet_postings(index: Index) -> DataFrame:
    """(term=field␟key, _docid, tf=1.0) rows for every facet assignment —
    the row-level form the block encoder consumes."""
    parts: List[DataFrame] = []
    for fld in index.facet_fields:
        parts.append(
            index.docs.select(
                F.col(DOCID),
                F.explode(F.array_distinct(FK_PREFIX + fld)).alias("key"),
            ).select(
                F.concat(F.lit(fld + SEP), F.col("key")).alias("term"),
                F.col(DOCID),
                F.lit(1.0).alias("tf"),
            )
        )
    if not parts:
        return index.spark.createDataFrame(
            [], f"term string, {DOCID} long, tf double"
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def build_facet_blocks(
    index: Index, range_size: int = 1 << 20, block_size: int = 1 << 14
) -> DataFrame:
    """Compressed facet-posting blocks (blocks.py layout; same docid
    ranges as the fulltext blocks so future combined ops co-locate)."""
    return build_posting_blocks(
        facet_postings(index), range_size=range_size, block_size=block_size
    )


def _subset(fblocks: DataFrame, terms: Sequence[str]) -> DataFrame:
    """Decode only the requested values' blocks (term predicate lands on
    the compressed scan)."""
    return postings_from_blocks(fblocks.filter(F.col("term").isin(list(terms))))


def docids_for_values(
    fblocks: DataFrame,
    field: str,
    keys: Sequence[str],
    conjunctive: bool = True,
) -> DataFrame:
    """Docid set for ``field`` filtered to ``keys`` — AND across values
    (reference default) or OR (``conjunction: false``)."""
    terms = [field + SEP + k for k in keys]
    p = _subset(fblocks, terms)
    if not terms:
        return p.select(DOCID).limit(0)
    if conjunctive and len(terms) > 1:
        return (
            p.groupBy(DOCID)
            .agg(F.countDistinct("term").alias("__n"))
            .filter(F.col("__n") == len(set(terms)))
            .select(DOCID)
        )
    return p.select(DOCID).distinct()


def intersect_all(sets: Iterable[DataFrame]) -> Optional[DataFrame]:
    """AND across fields: successive left-semi joins on docid."""
    out: Optional[DataFrame] = None
    for s in sets:
        out = s if out is None else out.join(s, DOCID, "left_semi")
    return out


def crossed_bucket_counts(
    index: Index,
    fblocks: DataFrame,
    field: str,
    filter_docids: Optional[DataFrame],
) -> DataFrame:
    """(key, doc_count) for ``field`` crossed with a filter docid set —
    reads only this field's postings plus the (tiny) filter set; zero
    counts restored from the facet dimension."""
    own = postings_from_blocks(
        fblocks.filter(F.col("term").startswith(field + SEP))
    ).select(
        F.expr(f"substring(term, {len(field) + 2})").alias("key"), F.col(DOCID)
    )
    if filter_docids is not None:
        own = own.join(filter_docids, DOCID, "left_semi")
    counted = own.groupBy("key").agg(F.count("*").alias("doc_count"))
    dim = index.facet_values.filter(F.col("field") == field).select("key")
    return (
        dim.join(counted, "key", "left")
        .withColumn("doc_count", F.coalesce("doc_count", F.lit(0)))
        .select("key", "doc_count")
    )
