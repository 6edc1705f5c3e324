"""Time-ordered relational joins the DataFrame API lacks as built-ins.

`asof_join` is the point-in-time join: for every left row, attach the
most recent right row (per key) whose timestamp is <= the left row's —
the standard primitive for attributing an observation to the latest
preceding state change (last purchase before a click, latest config
before a run, preceding user prompt before an assistant turn).

Spark has no ASOF JOIN operator (SPARK-22947 stalled); a naive
range-join `l.ts >= r.ts` explodes to the full per-key cross product
before a window prunes it. The scalable expression used here is the
union-merge trick: union both sides into one (key, ts)-ordered stream
and carry the last-seen right payload forward with ONE running
`last(ignorenulls)` window — a single hash exchange on the key and a
per-key sort, no pair expansion, identical to how a merge-join engine
executes ASOF natively. The skew axis is a hot key (one user with
millions of events); the window's running frame is streaming
(rows-between unbounded-preceding/current evaluates incrementally and
spills), so a hot key costs one sorted scan, never a quadratic blowup.

Reference scope note: stereobooster/itemsjs has no temporal join; this
is part of the training-data-pipeline operator set layered on the same
engine (session/event attribution feeding example construction).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_M = "__asof_m"
_K = "__asof_k"
_TS = "__asof_ts"
_L = "__asof_l"
_R = "__asof_r"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: Optional[str] = None,
    right_cols: Optional[Sequence[str]] = None,
    right_prefix: str = "asof_",
    tolerance_seconds: Optional[float] = None,
    right_tiebreak: Optional[str] = None,
) -> DataFrame:
    """Backward as-of join: every left row gains the payload of the most
    recent right row with the same ``key`` and ``right.ts <= left.ts``
    (inclusive — matching DuckDB/pandas ``ASOF`` semantics); unmatched
    left rows keep NULL payloads (left-outer).

    ``right_cols`` selects the right payload (default: everything except
    the key); each lands as ``{right_prefix}{col}``. When several right
    rows share a (key, ts), the winner is the LAST under
    ``right_tiebreak`` ascending (i.e. the max tiebreak) — pass one to
    make the join deterministic under ts collisions; native ASOF
    engines leave that case unspecified. ``tolerance_seconds`` voids
    matches older than the window (pandas ``merge_asof(tolerance=)``),
    evaluated via unix timestamps so it works for timestamp columns.

    Physical plan: one exchange on ``key``, one per-key sort, one
    running window — see the module docstring for why this is the
    100 TB-safe expression.
    """
    if right_ts is None:
        right_ts = left_ts
    if right_cols is None:
        right_cols = [c for c in right.columns if c != key]
    payload = list(right_cols)

    r_struct = F.struct(
        F.col(right_ts).alias(_TS),
        *[F.col(c).alias(c) for c in payload],
    )
    r_type = right.select(r_struct.alias("x")).schema["x"].dataType
    l_struct = F.struct(*[F.col(c).alias(c) for c in left.columns])
    l_type = left.select(l_struct.alias("x")).schema["x"].dataType

    tie = (
        F.col(right_tiebreak)
        if right_tiebreak is not None
        else F.lit(0)
    ).cast("string")
    r2 = right.select(
        F.col(key).alias(_K),
        F.col(right_ts).alias(_TS),
        F.lit(0).alias(_M),
        tie.alias("__asof_tie"),
        F.lit(None).cast(l_type).alias(_L),
        r_struct.alias(_R),
    )
    l2 = left.select(
        F.col(key).alias(_K),
        F.col(left_ts).alias(_TS),
        F.lit(1).alias(_M),
        F.lit("").alias("__asof_tie"),
        l_struct.alias(_L),
        F.lit(None).cast(r_type).alias(_R),
    )

    # Order: ts, then marker (right rows at an equal ts sort BEFORE the
    # left row — that is exactly the <= inclusivity), then the tiebreak
    # so the max-tiebreak right row is the one `last` carries.
    w = (
        Window.partitionBy(_K)
        .orderBy(F.col(_TS).asc(), F.col(_M).asc(), F.col("__asof_tie").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        r2.unionByName(l2)
        .withColumn(_R, F.last(_R, ignorenulls=True).over(w))
        .filter(F.col(_M) == 1)
    )
    if tolerance_seconds is not None:
        age = F.unix_timestamp(F.col(_TS)) - F.unix_timestamp(
            F.col(_R)[_TS]
        )
        matched = matched.withColumn(
            _R, F.when(age <= F.lit(float(tolerance_seconds)), F.col(_R))
        )

    out_cols = [F.col(_L)[c].alias(c) for c in left.columns]
    out_cols.append(F.col(_R)[_TS].alias(f"{right_prefix}{right_ts}"))
    out_cols += [F.col(_R)[c].alias(f"{right_prefix}{c}") for c in payload]
    return matched.select(*out_cols)


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    key: Optional[str] = None,
    bucket_seconds: int = 3600,
    end_inclusive: bool = False,
    max_buckets_per_interval: int = 10_000,
) -> DataFrame:
    """Point-in-interval join without pair expansion: every ``points``
    row joins the ``intervals`` rows whose ``[start, end)`` window
    (``end_inclusive=True`` for closed ends) contains its timestamp,
    optionally also matching ``key`` — the event-to-session /
    event-to-maintenance-window attribution primitive.

    A naive ``l.ts BETWEEN r.start AND r.end`` join is a cross product
    with a post-filter at DataFrame level (Spark has no interval-index
    operator). The scalable expression: intervals EXPLODE to the time
    buckets they cover (``bucket_seconds`` wide), points compute their
    single bucket map-only, and the join is an EQUI-join on
    (key?, bucket) + the exact range predicate. A point lives in exactly
    one bucket, so no output dedup is needed; an interval costs
    ceil(len/bucket)+1 rows — pick ``bucket_seconds`` near the median
    interval length and the blowup is ~2x, independent of table sizes.
    The guard raises (never silently truncates) when an interval would
    explode past ``max_buckets_per_interval``.

    Output: the points columns plus the intervals columns (caller
    aliases beforehand on name collisions). Skew: hot buckets (rush
    hour) spread across the key dimension when ``key`` is set; a keyless
    join against few giant intervals is inherently broadcast-shaped and
    Spark's planner picks that up from the exploded side's size."""
    # cast-to-double epochs keep microsecond precision (unix_timestamp
    # truncates to seconds — a point 0.9s past a sub-second interval end
    # would leak in); bucketing floors the same doubles
    p_ep = F.col(point_ts).cast("timestamp").cast("double")
    s_ep = F.col(start_ts).cast("timestamp").cast("double")
    e_ep = F.col(end_ts).cast("timestamp").cast("double")
    b = int(bucket_seconds)

    n_buckets = (F.floor(e_ep / b) - F.floor(s_ep / b) + 1).cast("long")
    iv = intervals.withColumn("__nb", n_buckets)
    overflow = iv.filter(F.col("__nb") > int(max_buckets_per_interval))
    if overflow.limit(1).count() > 0:
        raise ValueError(
            f"an interval spans more than {max_buckets_per_interval} "
            f"buckets of {b}s; raise bucket_seconds (or the cap) — "
            "refusing a silent row explosion"
        )
    iv = iv.withColumn(
        "__bucket",
        F.explode(F.sequence(F.floor(s_ep / b), F.floor(e_ep / b))),
    ).drop("__nb")
    pt = points.withColumn("__bucket", F.floor(p_ep / b))
    on = ["__bucket"] + ([key] if key else [])
    rng = (p_ep >= s_ep) & (
        (p_ep <= e_ep) if end_inclusive else (p_ep < e_ep)
    )
    return pt.join(iv, on=on, how="inner").filter(rng).drop("__bucket")
