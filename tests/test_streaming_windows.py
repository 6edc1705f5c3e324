"""Watermarked streaming aggregation + applyInPandasWithState stateful
operator over a live transcript stream (file source, deterministic
waves; windows close as the watermark advances past them)."""

from __future__ import annotations

import json
import os
import uuid

import pytest

from itemsjs_spark.streaming import windows as sw

SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)

T0 = "2024-01-01 00:00:"  # minutes appended below


def _write_wave(d, name, rows):
    path = os.path.join(d, name)
    with open(path + ".tmp", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    os.rename(path + ".tmp", path)


def _row(conv, idx, role, ts):
    return {
        "conv_id": conv, "turn_idx": idx, "role": role,
        "text": "spark shuffle", "tool": "bash", "ts": ts,
    }


@pytest.fixture()
def stream_dir(tmp_path):
    d = str(tmp_path / "in")
    os.makedirs(d)
    return d


def test_windowed_counts_close_with_watermark(spark, stream_dir, tmp_path):
    stream = spark.readStream.schema(SCHEMA).json(stream_dir)
    out = sw.windowed_turn_counts(
        stream, window="10 minutes", watermark="5 minutes"
    )
    qname = "win_" + uuid.uuid4().hex[:8]
    q = (
        out.writeStream.format("memory").queryName(qname)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        # wave 1: minutes 0-5 (window [00:00, 00:10))
        _write_wave(stream_dir, "w1.json", [
            _row("c1", 0, "user", "2024-01-01 00:00:00"),
            _row("c1", 1, "assistant", "2024-01-01 00:03:00"),
            _row("c2", 0, "user", "2024-01-01 00:05:00"),
        ])
        q.processAllAvailable()
        # wave 2: minute 40 — advances max event time
        _write_wave(stream_dir, "w2.json", [
            _row("c1", 2, "assistant", "2024-01-01 00:40:00"),
        ])
        q.processAllAvailable()
        # wave 3 + 4: far-future ticks flush earlier windows
        _write_wave(stream_dir, "w3.json", [
            _row("c9", 0, "system", "2024-01-01 02:00:00"),
        ])
        q.processAllAvailable()
        _write_wave(stream_dir, "w4.json", [
            _row("c9", 1, "system", "2024-01-01 03:00:00"),
        ])
        q.processAllAvailable()
        rows = {
            (str(r["window_start"])[11:16], r["role"]): r["n_turns"]
            for r in spark.sql(f"SELECT * FROM {qname}").collect()
        }
        assert rows[("00:00", "user")] == 2
        assert rows[("00:00", "assistant")] == 1
        assert rows[("00:40", "assistant")] == 1
    finally:
        q.stop()


def test_session_windows_merge_by_gap(spark, stream_dir, tmp_path):
    stream = spark.readStream.schema(SCHEMA).json(stream_dir)
    out = sw.session_turn_counts(
        stream, gap="30 minutes", watermark="5 minutes"
    )
    qname = "sess_" + uuid.uuid4().hex[:8]
    q = (
        out.writeStream.format("memory").queryName(qname)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        # two turns 10 min apart -> ONE session; a third 2 h later is new
        _write_wave(stream_dir, "w1.json", [
            _row("c1", 0, "user", "2024-01-01 00:00:00"),
            _row("c1", 1, "assistant", "2024-01-01 00:10:00"),
        ])
        q.processAllAvailable()
        _write_wave(stream_dir, "w2.json", [
            _row("c1", 2, "user", "2024-01-01 02:00:00"),
        ])
        q.processAllAvailable()
        _write_wave(stream_dir, "w3.json", [
            _row("c9", 0, "system", "2024-01-01 05:00:00"),
        ])
        q.processAllAvailable()
        _write_wave(stream_dir, "w4.json", [
            _row("c9", 1, "system", "2024-01-01 06:00:00"),
        ])
        q.processAllAvailable()
        rows = [
            (r["conv_id"], str(r["session_start"])[11:16], r["n_turns"])
            for r in spark.sql(
                f"SELECT * FROM {qname} WHERE conv_id = 'c1'"
            ).collect()
        ]
        assert sorted(rows) == [("c1", "00:00", 2), ("c1", "02:00", 1)]
    finally:
        q.stop()


def test_running_state_updates_across_batches(spark, stream_dir, tmp_path):
    stream = spark.readStream.schema(SCHEMA).json(stream_dir)
    out = sw.running_conversation_state(stream)
    seen = []

    def collect(batch_df, epoch_id):
        seen.append({
            r["conv_id"]: (r["total_turns"], r["last_role"])
            for r in batch_df.collect()
        })

    q = (
        out.writeStream.foreachBatch(collect)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        _write_wave(stream_dir, "w1.json", [
            _row("c1", 0, "user", "2024-01-01 00:00:00"),
            _row("c1", 1, "assistant", "2024-01-01 00:01:00"),
            _row("c2", 0, "user", "2024-01-01 00:02:00"),
        ])
        q.processAllAvailable()
        _write_wave(stream_dir, "w2.json", [
            _row("c1", 2, "tool", "2024-01-01 00:05:00"),
        ])
        q.processAllAvailable()
        batches = [b for b in seen if b]
        assert batches[0] == {"c1": (2, "assistant"), "c2": (1, "user")}
        # second batch touches only c1; state carried the earlier count
        assert batches[1] == {"c1": (3, "tool")}
    finally:
        q.stop()


def test_dedup_stream_drops_replayed_deliveries(spark, stream_dir, tmp_path):
    stream = spark.readStream.schema(SCHEMA).json(stream_dir)
    out = sw.dedup_turn_stream(stream, watermark="10 minutes")
    qname = "dd_" + uuid.uuid4().hex[:8]
    q = (
        out.writeStream.format("memory").queryName(qname)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        # wave 1: (c1, 0) delivered twice in one batch + a unique row
        _write_wave(stream_dir, "w1.json", [
            _row("c1", 0, "user", "2024-01-01 00:00:00"),
            _row("c1", 0, "user", "2024-01-01 00:00:30"),
            _row("c1", 1, "assistant", "2024-01-01 00:01:00"),
        ])
        q.processAllAvailable()
        # wave 2: (c1, 0) replayed again within the horizon → dropped
        _write_wave(stream_dir, "w2.json", [
            _row("c1", 0, "user", "2024-01-01 00:02:00"),
            _row("c2", 0, "user", "2024-01-01 00:03:00"),
        ])
        q.processAllAvailable()
        rows = [
            (r["conv_id"], r["turn_idx"])
            for r in spark.sql(f"SELECT conv_id, turn_idx FROM {qname}").collect()
        ]
        assert sorted(rows) == [("c1", 0), ("c1", 1), ("c2", 0)]
        # waves 3-4: advance the watermark far past the horizon (state
        # evicted), then redeliver the key with a fresh event time — the
        # horizon semantics admit it again
        _write_wave(stream_dir, "w3.json", [
            _row("c9", 0, "system", "2024-01-01 02:00:00"),
        ])
        q.processAllAvailable()
        _write_wave(stream_dir, "w4.json", [
            _row("c1", 0, "user", "2024-01-01 02:30:00"),
        ])
        q.processAllAvailable()
        n_c10 = spark.sql(
            f"SELECT count(*) AS n FROM {qname} "
            "WHERE conv_id = 'c1' AND turn_idx = 0"
        ).collect()[0]["n"]
        assert n_c10 == 2  # first sighting + post-eviction readmission
    finally:
        q.stop()


def test_stream_stream_correlation_join(spark, stream_dir, tmp_path):
    """Watermarked stream-stream join: user turns correlate with tool
    turns of the same conversation within 5 minutes; a response outside
    the horizon never matches, and state-evicted lefts stay silent."""
    d2 = str(tmp_path / "in2")
    os.makedirs(d2)
    left = spark.readStream.schema(SCHEMA).json(stream_dir)
    right = spark.readStream.schema(SCHEMA).json(d2)
    out = sw.correlate_streams(
        left, right, within="5 minutes", watermark="5 minutes"
    )
    qname = "ssj_" + uuid.uuid4().hex[:8]
    q = (
        out.writeStream.format("memory").queryName(qname)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .start()
    )
    try:
        _write_wave(stream_dir, "l1.json", [
            _row("c1", 0, "user", "2024-01-01 00:00:00"),
            _row("c2", 0, "user", "2024-01-01 00:01:00"),
        ])
        _write_wave(d2, "r1.json", [
            # in-horizon response for c1 (+3 min)
            _row("c1", 1, "tool", "2024-01-01 00:03:00"),
            # c2's response arrives 20 min later: outside the range
            _row("c2", 1, "tool", "2024-01-01 00:21:00"),
        ])
        q.processAllAvailable()
        # future ticks on both sides advance watermarks and flush
        _write_wave(stream_dir, "l2.json", [
            _row("c9", 0, "user", "2024-01-01 02:00:00"),
        ])
        _write_wave(d2, "r2.json", [
            _row("c9", 1, "tool", "2024-01-01 02:00:30"),
        ])
        q.processAllAvailable()
        rows = sorted(
            (r["conv_id"], r["lag_seconds"])
            for r in spark.sql(f"SELECT * FROM {qname}").collect()
        )
        assert rows == [("c1", 180), ("c9", 30)]
    finally:
        q.stop()
