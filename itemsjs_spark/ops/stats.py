"""Per-bucket quantiles: the percentile extension of facet_stats.

itemsjs's `facet_stats` (min/max/avg/sum — reference
`/root/reference/src/helpers.ts` facet stats fields) covers first-moment
stats; real OLAP dashboards also want p50/p90/p99 per bucket. Two
physical paths, same API:

* ``exact=True`` — Catalyst's ``percentile`` aggregate (exact, linear
  interpolation at rank ``(n-1)*p`` — the same definition DuckDB's
  ``quantile_cont`` uses, so the oracle can match to 6 decimals).
  Exact percentile buffers each group's values inside the aggregate, so
  its memory is bounded by the largest bucket — fine for facet buckets
  (bounded by corpus/|values|), wrong for million-row groups.
* ``exact=False`` — ``approx_percentile`` (Greenwald-Khanna sketch,
  bounded memory ``O(accuracy)`` per group regardless of group size):
  the 100 TB path. Error is rank-bounded by ``1/accuracy``; the test
  pins approx-vs-exact agreement on real data.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _pname(p: float) -> str:
    # p25 / p50 / p99 / p99_9-style column names
    pct = p * 100
    if float(pct).is_integer():
        return f"p{int(pct)}"
    return "p" + f"{pct:g}".replace(".", "_")


def bucket_percentiles(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    ps: Sequence[float] = (0.5, 0.9, 0.99),
    exact: bool = True,
    accuracy: int = 10_000,
) -> DataFrame:
    """(group cols, n, p<pp>...) — one shuffle, map-side partial
    aggregation; percentile columns rounded to 6 decimals (the oracle
    contract used across the repo)."""
    aggs = [F.count("*").alias("n")]
    for p in ps:
        if exact:
            expr = f"percentile(CAST({value_col} AS DOUBLE), {p!r})"
        else:
            expr = (
                f"approx_percentile(CAST({value_col} AS DOUBLE), {p!r}, "
                f"{accuracy})"
            )
        aggs.append(F.round(F.expr(expr), 6).alias(_pname(p)))
    return df.groupBy(*group_cols).agg(*aggs)
