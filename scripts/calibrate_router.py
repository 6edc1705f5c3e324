"""Measure the inputs of the filter-search router's cost model.

The router (SearchEngine._route_block_cost) predicts, in seconds:

    t_scan  = 2 * j + n_docs / r_scan
    t_block = (n_filtered_fields + 5) * j + est / r_block

(the block path's measured fixed cost is ~6 actions for one filtered
field — docid-set derivation, final count, one count pass per filtered
field, page — hence the +5; keep this formula in sync with
_route_block_cost when recalibrating)

where ``est`` = sum of the filter values' global doc counts, ``j`` is
the fixed cost of one Spark action (driver + scheduler + stage launch),
and r_scan / r_block are the corpus-scan and block-path row rates. This
script measures j, r_scan and r_block on real search() requests at two
corpus sizes so the class constants in query.py carry measured values
(only their RATIOS matter for routing; absolute seconds drift with the
host).

Run:  python scripts/calibrate_router.py            (~3 min, local[16])
"""

from __future__ import annotations

import dataclasses
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (repo-root bench harness: spark/session + engine builders)


def timed(fn, reps=3):
    fn()  # warm
    return min(bench.timed(fn) for _ in range(reps))


def main():
    spark = bench.make_spark(16)
    from itemsjs_spark.engine import SearchEngine
    from itemsjs_spark.engine.facetblocks import build_facet_blocks

    out = {}

    # j: fixed per-action cost (empty-ish job, 32 tasks like real stages)
    rdd_df = spark.range(0, 32, 1, 32)
    out["job_seconds"] = statistics.median(
        bench.timed(lambda: rdd_df.count()) for _ in range(7)
    )

    sizes = (60_000, 600_000)
    per_size = {}
    for n_turns in sizes:
        eng, _, _ = bench.build_engine(spark, n_turns)
        fblocks = build_facet_blocks(eng.index).persist()
        fblocks.count()
        engb = SearchEngine(
            dataclasses.replace(eng.index, facet_posting_blocks=fblocks)
        )
        engb.ROUTER_FORCE = "blocks"
        eng._facet_dim_cache()
        engb._facet_dim_cache()

        glob = engb._facet_global or {}
        sel = {"filters": {"conv_id": ["c000042"]}, "per_page": 12}
        uns = {"filters": {"role": ["assistant"]}, "per_page": 12}
        est_sel = glob.get("conv_id", {}).get("c000042", 0)
        est_uns = glob.get("role", {}).get("assistant", 0)

        r = {
            "n_docs": eng.index.n_docs,
            "est_sel": est_sel,
            "est_uns": est_uns,
            "scan_sel": timed(lambda: eng.search(dict(sel))),
            "scan_uns": timed(lambda: eng.search(dict(uns))),
            "block_sel": timed(lambda: engb.search(dict(sel))),
            "block_uns": timed(lambda: engb.search(dict(uns))),
        }
        per_size[n_turns] = r
        eng.index.unpersist()
        fblocks.unpersist()

    lo, hi = per_size[sizes[0]], per_size[sizes[1]]
    # scan rate: corpus-size response of the scan path (unselective
    # input — the counts/page passes touch corpus-proportional rows;
    # the selective sample is fixed-cost dominated and barely scales)
    out["scan_rows_per_sec"] = (hi["n_docs"] - lo["n_docs"]) / max(
        hi["scan_uns"] - lo["scan_uns"], 1e-9
    )
    # block rate: est response of the block path at the big corpus
    out["block_rows_per_sec"] = (hi["est_uns"] - hi["est_sel"]) / max(
        hi["block_uns"] - hi["block_sel"], 1e-9
    )
    out["samples"] = per_size
    print(json.dumps(out, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()
