"""lodash-``orderBy``-equivalent stable multi-key ordering.

Bucket and item ordering in the reference is lodash ``orderBy``
(helpers.ts:474, lib.ts:184-188): stable, multi-key, 'asc'/'desc' per key,
JS comparison semantics. Shared by the oracle and the driver-side bucket
assembly in the Spark engine.
"""

from __future__ import annotations

from typing import Any, List


def sort_key(v: Any):
    # JS comparisons: booleans/numbers compare numerically, strings
    # lexicographically (UTF-16 code units == Python str for BMP text).
    if isinstance(v, bool):
        return (0, int(v))
    if isinstance(v, (int, float)):
        return (0, v)
    return (1, str(v))


def order_by(rows: List[dict], iteratees: List[str], orders: List[str]) -> List[dict]:
    out = list(rows)
    for i in range(len(iteratees) - 1, -1, -1):
        key = iteratees[i]
        order = orders[i] if i < len(orders) else "asc"
        out.sort(key=lambda r, k=key: sort_key(r.get(k)), reverse=(order == "desc"))
    return out


def bucket_sort_spec(agg: dict) -> tuple[List[str], List[str]]:
    """iteratees/orders for one facet's buckets (helpers.ts:450-472)."""
    sort = agg.get("sort")
    order = agg.get("order")
    if isinstance(sort, list):
        iteratees = list(sort) if sort else ["key"]
        if isinstance(order, list):
            sort_orders = list(order)
        elif order:
            sort_orders = [order]
        else:
            sort_orders = ["asc"]
    else:
        if sort in ("term", "key"):
            iteratees = ["key"]
            sort_orders = [order or "asc"]
        else:
            iteratees = ["doc_count", "key"]
            sort_orders = [order or "desc", "asc"]
        if agg.get("chosen_filters_on_top") is not False:
            iteratees = ["selected"] + iteratees
            sort_orders = ["desc"] + sort_orders
    return iteratees, sort_orders
