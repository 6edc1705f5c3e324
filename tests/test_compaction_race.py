"""Reader-vs-writer compaction races (r3 VERDICT item 8).

The crash-sequence tests in test_append.py prove recovery from every
DEAD writer state; these prove the CONCURRENT story: a reader running
promote-only recovery (`read_blocks`) in the middle of a LIVE
`compact_blocks` swap can neither lose a bucket nor adopt stale
staging, under

* deterministic interleavings — a hooked filesystem fires a full
  read-side probe immediately BEFORE every writer rename, i.e. inside
  both swap windows (live set aside / staging not yet promoted), and
* a real two-thread hammer — `compact_blocks` on one thread with
  widened swap windows, `read_blocks` probes looping on another.

The reader-promotes-first interleaving is the sharpest case: recovery
promotes staging while the writer is one instruction from doing the
same rename; the writer's rename must then fail benignly (Hadoop
rename-onto-existing returns false) and its cleanup must still leave
the compacted bucket live.
"""

from __future__ import annotations

import threading
import time

import pytest
from pyspark.sql import functions as F

from itemsjs_spark.data.transcripts import transcripts_df
from itemsjs_spark.engine import itemsjs_spark
from itemsjs_spark.engine import checkpoint as cp
from itemsjs_spark.engine.blocks import postings_from_blocks
from itemsjs_spark.engine.checkpoint import (
    append_blocks_checkpointed,
    build_blocks_checkpointed,
    compact_blocks,
    read_blocks,
)

CFG = {
    "aggregations": {"role": {"size": 10}},
    "searchableFields": ["text"],
}

RealFS = cp._HadoopFS  # the unpatched class, for probe-side instances


@pytest.fixture(scope="module")
def postings(spark):
    base = transcripts_df(spark, n_turns=900, n_convs=90, seed=11)
    eng = itemsjs_spark(spark, base, CFG, order_by=["conv_id", "turn_idx"])
    eng._ensure_fulltext_materialized()
    base_p = eng.index.postings.persist()

    delta = transcripts_df(spark, n_turns=300, n_convs=30, seed=12).withColumn(
        "conv_id", F.concat(F.lit("d"), F.substring("conv_id", 2, 10))
    )
    appended = eng.append(delta, order_by=["conv_id", "turn_idx"])
    delta_p = appended.index.postings.subtract(base_p).persist()
    base_p.count(), delta_p.count()
    return base_p, delta_p


def _make_store(spark, postings, path, n_buckets=4):
    base_p, delta_p = postings
    build_blocks_checkpointed(
        base_p, path, n_buckets=n_buckets, range_size=512, block_size=64
    )
    append_blocks_checkpointed(
        delta_p, path, snapshot="s2", n_buckets=n_buckets,
        range_size=512, block_size=64,
    )


class _RenameHookProxy:
    """Wraps the py4j Hadoop FileSystem: calls ``hook(src, dst)`` before
    every rename, delegates everything else untouched."""

    def __init__(self, real, hook):
        self._real = real
        self._hook = hook

    def rename(self, src, dst):
        self._hook(str(src), str(dst))
        return self._real.rename(src, dst)

    def __getattr__(self, name):
        return getattr(self._real, name)


def _hooked_fs_class(hook):
    class HookedFS(RealFS):
        def __init__(self, spark, base):
            super().__init__(spark, base)
            self._fs = _RenameHookProxy(self._fs, hook)

    return HookedFS


def test_reader_probe_inside_every_writer_rename_window(
    spark, postings, tmp_path, monkeypatch
):
    """A full read_blocks probe fires immediately before EVERY rename the
    compaction writer performs — including the two swap windows where
    the live dir is set aside / staging is about to be promoted. Every
    probe must see the complete posting multiset total."""
    out = str(tmp_path / "blocks")
    _make_store(spark, postings, out)
    total = read_blocks(spark, out).agg(F.sum("n")).collect()[0][0]
    assert total and total > 0

    state = {"in_probe": False, "probes": 0, "swap_windows": 0}

    def probe(src, dst):
        if state["in_probe"]:
            return
        state["in_probe"] = True
        try:
            if "/_compacting/" in src and "/_compacting/" not in dst:
                state["swap_windows"] += 1  # live dir currently missing
            got = read_blocks(spark, out).agg(F.sum("n")).collect()[0][0]
            assert got == total, f"torn read before rename {src} -> {dst}"
            state["probes"] += 1
        finally:
            state["in_probe"] = False

    monkeypatch.setattr(cp, "_HadoopFS", _hooked_fs_class(probe))
    rep = compact_blocks(spark, out, n_buckets=4, range_size=512, block_size=64)
    monkeypatch.undo()

    assert sorted(rep["compacted"]) == [0, 1, 2, 3]
    # at least one probe per bucket ran inside the promote window
    assert state["swap_windows"] == 4
    assert state["probes"] >= 8
    # final store intact and fully compacted
    fs = RealFS(spark, out)
    assert not fs.exists(f"{out}/_compacting")
    assert read_blocks(spark, out).agg(F.sum("n")).collect()[0][0] == total


def test_reader_promotes_first_writer_rename_fails_benignly(
    spark, postings, tmp_path, monkeypatch
):
    """Sharpest interleaving: read-side recovery promotes staging at the
    exact moment the writer is about to run the same rename. The
    writer's rename must lose benignly and its cleanup must leave the
    compacted bucket live with no staging leftovers and no stale
    adoption."""
    out = str(tmp_path / "blocks")
    _make_store(spark, postings, out)
    expect = sorted(
        map(tuple, postings_from_blocks(read_blocks(spark, out)).collect())
    )

    state = {"in_probe": False, "promoted": []}

    def steal_promote(src, dst):
        # match only the writer's promote rename: staging -> live bucket
        if state["in_probe"] or ".old" in src or "/_compacting/" in dst:
            return
        if "/_compacting/bucket=" not in src or "/bucket=" not in dst:
            return
        state["in_probe"] = True
        try:
            fs = RealFS(spark, out)
            restored = cp._recover_compaction_fs(fs, out, writer=False)
            state["promoted"].extend(restored)
        finally:
            state["in_probe"] = False

    monkeypatch.setattr(cp, "_HadoopFS", _hooked_fs_class(steal_promote))
    rep = compact_blocks(spark, out, n_buckets=4, range_size=512, block_size=64)
    monkeypatch.undo()

    # the reader recovery beat the writer to every promote
    assert sorted(state["promoted"]) == [0, 1, 2, 3]
    assert sorted(rep["compacted"]) == [0, 1, 2, 3]
    fs = RealFS(spark, out)
    assert not fs.exists(f"{out}/_compacting")
    # compacted (snap-free) content, bit-identical posting multiset
    for b in range(4):
        names = fs.list_parquet(f"{out}/bucket={b}")
        assert names and not any(n.startswith("snap-") for n in names)
    got = sorted(
        map(tuple, postings_from_blocks(read_blocks(spark, out)).collect())
    )
    assert got == expect


def test_concurrent_reader_hammer_during_live_compaction(
    spark, postings, tmp_path, monkeypatch
):
    """Real two-thread race: compact_blocks runs with every swap rename
    slowed (widened windows) while the main thread hammers read_blocks.

    The store's documented read contract under a LIVE compaction (see
    read_blocks): every read either returns the FULL total or fails
    LOUDLY (FAILED_READ_FILE when the writer swaps a bucket between the
    probe's bind and its scan — the pre-swap files move away). A short
    or partial count is the data-loss bug this test exists to catch and
    is never acceptable; loud bind-to-scan failures are counted and
    tolerated (closing them needs Iceberg/Delta-style generation GC)."""
    out = str(tmp_path / "blocks")
    _make_store(spark, postings, out)
    total = read_blocks(spark, out).agg(F.sum("n")).collect()[0][0]

    def widen(src, dst):
        if "/bucket=" in dst or "/bucket=" in src:
            time.sleep(0.02)

    monkeypatch.setattr(cp, "_HadoopFS", _hooked_fs_class(widen))

    errors: list = []

    def writer():
        try:
            compact_blocks(spark, out, n_buckets=4, range_size=512, block_size=64)
        except Exception as e:  # surfaced in the main thread
            errors.append(e)

    t = threading.Thread(target=writer)
    t.start()
    sums = []
    loud_failures = 0
    while t.is_alive():
        try:
            sums.append(read_blocks(spark, out).agg(F.sum("n")).collect()[0][0])
        except Exception as e:
            msg = str(e)
            assert "FAILED_READ_FILE" in msg or "FileNotFound" in msg, msg
            loud_failures += 1
    t.join()
    monkeypatch.undo()

    assert not errors, errors
    assert len(sums) >= 3  # the hammer genuinely overlapped the writer
    # the invariant: no probe EVER sees a partial store
    assert all(s == total for s in sums), (total, sums)
    assert read_blocks(spark, out).agg(F.sum("n")).collect()[0][0] == total
