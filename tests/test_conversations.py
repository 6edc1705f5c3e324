"""Conversation-level operators (ops/conversations.py): per-conv shape
signals and turn-ordered text concatenation."""

from __future__ import annotations

import datetime as dt

import pytest

from itemsjs_spark.ops import conversations as conv


def _ts(s):
    return dt.datetime(2024, 1, 1, 0, 0, s)


@pytest.fixture(scope="module")
def tdf(spark):
    rows = [
        # conv a: user/assistant alternation, one tool call, 4 turns
        ("a", 0, "user", "hello there", None, _ts(0)),
        ("a", 1, "assistant", "hi", None, _ts(10)),
        ("a", 2, "user", "run it", None, _ts(20)),
        ("a", 3, "tool", "ok done", "bash", _ts(30)),
        # conv b: monologue (no switches), 2 turns
        ("b", 0, "assistant", "one two three", None, _ts(5)),
        ("b", 1, "assistant", "four", None, _ts(6)),
        # conv c: single turn
        ("c", 0, "user", "solo", None, _ts(7)),
    ]
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp"
    )


def test_conversation_stats_values(tdf):
    got = {r["conv_id"]: r.asDict() for r in conv.conversation_stats(tdf).collect()}
    a = got["a"]
    assert a["n_turns"] == 4
    assert a["user_turns"] == 2
    assert a["assistant_turns"] == 1
    assert a["tool_calls"] == 1
    assert a["n_words"] == 2 + 1 + 2 + 2
    assert a["avg_turn_chars"] == pytest.approx(
        (len("hello there") + 2 + len("run it") + len("ok done")) / 4, abs=1e-6
    )
    assert a["duration_s"] == 30
    assert a["role_switches"] == 3  # u->a, a->u, u->tool
    b = got["b"]
    assert (b["role_switches"], b["n_turns"], b["duration_s"]) == (0, 2, 1)
    c = got["c"]
    assert (c["role_switches"], c["n_turns"], c["duration_s"]) == (0, 1, 0)


def test_conversation_stats_word_count_squeezes_whitespace(spark):
    df = spark.createDataFrame(
        [("x", 0, "user", "  a   b  ", None, _ts(0))],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    row = conv.conversation_stats(df).collect()[0]
    assert row["n_words"] == 2  # trim + \s+ split, not single-space split


def _toks(spark, rows):
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, n_tokens long")
    out = conv.pack_conversations(df, budget=10)
    return {
        (r["conv_id"], r["turn_idx"]): r["chunk"] for r in out.collect()
    }


def test_pack_conversations_greedy_cuts(spark):
    got = _toks(spark, [
        ("a", 0, 4), ("a", 1, 5),   # 9 <= 10 -> chunk 0
        ("a", 2, 3),                # would be 12 -> cut -> chunk 1
        ("a", 3, 7),                # 10 <= 10 -> chunk 1
        ("a", 4, 1),                # would be 11 -> chunk 2
    ])
    assert [got[("a", i)] for i in range(5)] == [0, 0, 1, 1, 2]


def test_pack_conversations_overlong_turn_gets_own_chunk(spark):
    got = _toks(spark, [
        ("a", 0, 25),               # > budget but first -> chunk 0 alone
        ("a", 1, 2),                # cut after the giant -> chunk 1
        ("a", 2, 30),               # giant mid-stream -> chunk 2 alone
        ("a", 3, 1),                # cut again -> chunk 3
    ])
    assert [got[("a", i)] for i in range(4)] == [0, 1, 2, 3]


def test_pack_conversations_never_spans_conversations(spark):
    got = _toks(spark, [
        ("a", 0, 1), ("b", 0, 1), ("b", 1, 2), ("c", 0, 11),
    ])
    # every conversation restarts at chunk 0 regardless of the others
    assert got[("a", 0)] == 0 and got[("b", 0)] == 0 and got[("c", 0)] == 0
    assert got[("b", 1)] == 0  # 3 <= 10 packs with its predecessor


def test_training_pairs_context_window(tdf):
    got = {
        (r["conv_id"], r["turn_idx"]): (r["context"], r["target"])
        for r in conv.training_pairs(tdf, max_context_turns=2).collect()
    }
    # conv a turn 1 is the only assistant turn with context
    assert got[("a", 1)] == ("user: hello there", "hi")
    # conv b turn 1: assistant preceded by assistant — still a pair
    assert got[("b", 1)] == ("assistant: one two three", "four")
    # conv b turn 0 has no context -> dropped; non-assistant turns never emit
    assert ("b", 0) not in got and ("a", 2) not in got
    assert len(got) == 2


def test_training_pairs_clips_context_budget(spark):
    rows = [
        ("x", i, "user" if i % 2 == 0 else "assistant", f"t{i}", None, _ts(i))
        for i in range(6)
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp"
    )
    got = {
        r["turn_idx"]: r["context"]
        for r in conv.training_pairs(df, max_context_turns=2).collect()
    }
    # turn 5 sees exactly turns 3,4 — not the whole history
    assert got[5] == "assistant: t3\nuser: t4"
    assert got[1] == "user: t0"


def test_conversation_text_orders_by_turn(tdf):
    got = {r["conv_id"]: r["text"] for r in conv.conversation_text(tdf).collect()}
    assert got["a"] == "hello there\nhi\nrun it\nok done"
    assert got["b"] == "one two three\nfour"
    assert got["c"] == "solo"
    # custom separator
    got2 = {
        r["conv_id"]: r["text"]
        for r in conv.conversation_text(tdf, sep=" | ").collect()
    }
    assert got2["b"] == "one two three | four"


def test_sessionize_gap_splits_and_ties(spark):
    """Sessions split exactly at gaps > threshold; a boundary gap equal
    to the threshold does NOT split; timestamp ties order by the
    tie-break column; users are independent."""
    from datetime import datetime, timezone

    from itemsjs_spark.ops.conversations import session_summary, sessionize

    def t(s):
        return datetime.fromtimestamp(1704067200 + s, tz=timezone.utc)

    rows = [
        # user 1: events at 0, 100, 100 (tie), 100+1800 (== gap: same
        # session), then 100+1800+1801 (> gap: new session)
        (1, 1, t(0)), (2, 1, t(100)), (3, 1, t(100)),
        (4, 1, t(1900)), (5, 1, t(3701)),
        # user 2: single event
        (6, 2, t(50)),
    ]
    df = spark.createDataFrame(rows, ["event_id", "user_id", "ts"])
    s = {
        r["event_id"]: r["session_idx"]
        for r in sessionize(
            df, "user_id", "ts", gap_seconds=1800, order_cols=("event_id",)
        ).collect()
    }
    assert s == {1: 1, 2: 1, 3: 1, 4: 1, 5: 2, 6: 1}
    summ = {
        (r["user_id"], r["session_idx"]): r["n_events"]
        for r in session_summary(
            df, "user_id", "ts", gap_seconds=1800, order_cols=("event_id",)
        ).collect()
    }
    assert summ == {(1, 1): 4, (1, 2): 1, (2, 1): 1}


def test_sliding_window_stats_replication_and_counts(spark):
    """window=2h slide=1h: every event lands in exactly two hour-aligned
    windows; per-window counts equal a brute-force recount."""
    rows = [
        (i, dt.datetime(2024, 1, 1, h, m, 30), u)
        for i, (h, m, u) in enumerate(
            [(0, 5, 1), (0, 55, 2), (1, 5, 1), (2, 59, 3), (3, 0, 3)]
        )
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long"
    )
    got = {
        r["window_start_epoch"]: (r["n_events"], r["n_users"])
        for r in conv.sliding_window_stats(df, "ts", "2 hours", "1 hour").collect()
    }
    assert sum(n for n, _ in got.values()) == 2 * len(rows)
    base = int(dt.datetime(2024, 1, 1).timestamp())
    for s in got:
        assert (s - base) % 3600 == 0
    # brute force one window: [00:00, 02:00) holds events 0,1,2 (users 1,2)
    assert got[base] == (3, 2)
    # [02:00, 04:00) holds events 3,4 (single user 3)
    assert got[base + 7200] == (2, 1)


def test_tool_chains_orders_counts_and_ranks(spark):
    from itemsjs_spark.ops.conversations import tool_chains

    rows = [
        ("c1", 0, "bash"), ("c1", 2, "python"), ("c1", 1, None),
        ("c2", 5, "bash"), ("c2", 9, "python"),
        ("c3", 1, "search"),
        ("c4", 0, None),                     # no tool calls: excluded
        ("c5", 3, "search"),
        ("c6", 7, "search"),
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, tool string")
    got = [
        (r["chain"], r["n_convs"], r["rank"])
        for r in tool_chains(df, k=2).orderBy("rank").collect()
    ]
    # "search" appears in 3 convs, "bash>python" in 2; k=2 cuts there
    assert got == [("search", 3, 1), ("bash>python", 2, 2)]


def test_tool_chains_respects_turn_order_not_input_order(spark):
    from itemsjs_spark.ops.conversations import tool_chains

    rows = [("c1", 9, "last"), ("c1", 0, "first"), ("c1", 4, "mid")]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, tool string")
    got = tool_chains(df, k=5).collect()
    assert [r["chain"] for r in got] == ["first>mid>last"]


def test_role_transitions_counts_and_normalization(spark):
    from itemsjs_spark.ops.conversations import role_transitions

    rows = [
        # conv a: u->a, a->u, u->a ; conv b: t->u (isolated from a)
        ("a", 0, "user"), ("a", 1, "assistant"), ("a", 2, "user"),
        ("a", 3, "assistant"),
        ("b", 0, "tool"), ("b", 1, "user"),
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, role string")
    got = {
        (r["role_from"], r["role_to"]): (r["n"], r["p"])
        for r in role_transitions(df).collect()
    }
    # no cross-conversation edge (a's last turn -> b's first never pairs)
    assert ("assistant", "tool") not in got
    assert got[("user", "assistant")] == (2, 1.0)   # user always -> assistant
    assert got[("assistant", "user")] == (1, 1.0)
    assert got[("tool", "user")] == (1, 1.0)
    assert len(got) == 3


def test_role_transitions_probability_splits(spark):
    from itemsjs_spark.ops.conversations import role_transitions

    rows = [
        ("c", 0, "user"), ("c", 1, "assistant"),
        ("c", 2, "user"), ("c", 3, "tool"),
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, role string")
    got = {
        (r["role_from"], r["role_to"]): r["p"]
        for r in role_transitions(df).collect()
    }
    assert got[("user", "assistant")] == 0.5
    assert got[("user", "tool")] == 0.5


def test_turn_latency_stats(spark):
    from itemsjs_spark.ops.conversations import turn_latency

    rows = [
        # conv a: user->assistant gaps 10 and 30, assistant->user gap 4
        ("a", 0, "user", _ts(0)), ("a", 1, "assistant", _ts(10)),
        ("a", 2, "user", _ts(14)), ("a", 3, "assistant", _ts(44)),
        # conv b: isolated; its first turn never pairs with conv a's last
        ("b", 0, "user", _ts(3)), ("b", 1, "assistant", _ts(8)),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, ts timestamp"
    )
    got = {
        (r["role_from"], r["role_to"]): r
        for r in turn_latency(df).collect()
    }
    ua = got[("user", "assistant")]
    assert ua["n"] == 3
    assert ua["mean_s"] == 15.0       # (10 + 30 + 5) / 3
    assert ua["p50_s"] == 10.0
    assert ua["max_s"] == 30.0
    assert got[("assistant", "user")]["n"] == 1
    assert got[("assistant", "user")]["p50_s"] == 4.0
    assert len(got) == 2


def test_retention_cohorts_triangle(spark):
    """Cohort = week of first event; each (cohort, offset) cell counts
    distinct users, multiple events in one week count once, users never
    leak across cohorts, offsets are exact whole weeks."""
    from datetime import datetime, timezone

    from itemsjs_spark.ops.conversations import retention_cohorts

    def t(day, sec=0):
        # 2024-01-01 is a Monday: day 0..6 = week 0, 7..13 = week 1, ...
        return datetime.fromtimestamp(
            1704067200 + day * 86400 + sec, tz=timezone.utc
        )

    rows = [
        # user 1: cohort week 0, active weeks 0 (twice) and 2
        (1, t(0)), (1, t(3, 30)), (1, t(15)),
        # user 2: cohort week 0, active week 0 only
        (2, t(6)),
        # user 3: cohort week 1, active weeks 1 and 2
        (3, t(7)), (3, t(14)),
        # user 4: cohort week 2 (late joiner), active week 2
        (4, t(20)),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts"])
    got = {
        (r["cohort_week"], r["week_offset"]): r["n_users"]
        for r in retention_cohorts(df).collect()
    }
    w0 = 1704067200  # epoch of Monday 2024-01-01 (UTC truncation)
    wk = 604800
    assert got == {
        (w0, 0): 2,          # users 1, 2 active in their cohort week
        (w0, 2): 1,          # user 1 returns two weeks later
        (w0 + wk, 0): 1,     # user 3
        (w0 + wk, 1): 1,     # user 3 returns next week
        (w0 + 2 * wk, 0): 1, # user 4
    }


def test_funnel_strict_order_and_horizon(spark):
    """Steps count only strictly after the user's earliest previous
    step; the within horizon anchors at step 1; step skipping doesn't
    count; empty steps raise."""
    from datetime import datetime, timezone

    import pytest as _pytest

    from itemsjs_spark.ops.conversations import funnel

    def t(s):
        return datetime.fromtimestamp(1704067200 + s, tz=timezone.utc)

    rows = [
        (1, "view", t(0)), (1, "click", t(10)), (1, "purchase", t(20)),
        (2, "view", t(0)), (2, "click", t(5)),
        (3, "click", t(0)), (3, "view", t(10)),       # click precedes view
        (4, "view", t(0)), (4, "purchase", t(5)),     # skips click
        (5, "view", t(0)), (5, "click", t(10)), (5, "purchase", t(5000)),
    ]
    df = spark.createDataFrame(rows, ["user_id", "event_type", "ts"])
    got = {
        r["step"]: r["n_users"]
        for r in funnel(
            df, "user_id", "ts", "event_type", ["view", "click", "purchase"]
        ).collect()
    }
    assert got == {"view": 5, "click": 3, "purchase": 2}
    bounded = {
        r["step"]: r["n_users"]
        for r in funnel(
            df, "user_id", "ts", "event_type",
            ["view", "click", "purchase"], within_seconds=100,
        ).collect()
    }
    assert bounded == {"view": 5, "click": 3, "purchase": 1}  # user 5 too slow
    with _pytest.raises(ValueError):
        funnel(df, "user_id", "ts", "event_type", [])
