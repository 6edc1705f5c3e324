"""Conversation-level operators over transcript corpora.

The engine's corpus shape (BASELINE.json input_hint) is an Iceberg table
of multi-turn transcripts ``(conv_id, turn_idx, role, text, tool, ts)``;
training-data pipelines need per-CONVERSATION signals next to the
per-turn ones (`ops/text.py`). Everything here is pure DataFrame
expressions — one map-side-combined groupBy per operator, or a window
partitioned by conversation where turn order matters (state bounded by
conversation length, the inherent unit of work; a 10^12-turn corpus has
~10^9 conversations, so per-conv aggregation parallelizes on conv_id —
power-law-hot conversations stay single-partition-bounded by their OWN
length only, never by corpus size).

Verified against independent DuckDB oracles through ``__spark_entry__``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def conversation_stats(
    df: DataFrame,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    tool_col: str = "tool",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-conversation shape/quality signals:

    (conv_id, n_turns, user_turns, assistant_turns, tool_calls,
    n_words, avg_turn_chars, duration_s, role_switches)

    - ``tool_calls``: turns with a non-null tool column.
    - ``n_words``: whitespace tokens across all turns.
    - ``duration_s``: last-minus-first timestamp, seconds.
    - ``role_switches``: adjacent turn pairs (by ``order_col``) whose
      role differs — the turn-taking signal that separates dialogues
      from monologue dumps.

    Physical plan: ONE window pass partitioned by conversation (lag for
    the switch flag — partition state bounded by conv length) feeding
    ONE groupBy with algebraic aggregates (map-side partials). No
    corpus-sized shuffle beyond the by-conversation exchange the window
    already needs; the groupBy reuses that clustering.
    """
    w = Window.partitionBy(conv_col).orderBy(order_col)
    prev_role = F.lag(F.col(role_col)).over(w)
    switch = F.when(
        prev_role.isNotNull() & (prev_role != F.col(role_col)), 1
    ).otherwise(0)
    words = F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
    return (
        df.withColumn("__switch", switch)
        .groupBy(F.col(conv_col).alias("conv_id"))
        .agg(
            F.count("*").cast("long").alias("n_turns"),
            F.sum((F.col(role_col) == "user").cast("long"))
            .cast("long")
            .alias("user_turns"),
            F.sum((F.col(role_col) == "assistant").cast("long"))
            .cast("long")
            .alias("assistant_turns"),
            F.count(tool_col).cast("long").alias("tool_calls"),
            F.sum(words).cast("long").alias("n_words"),
            F.round(F.avg(F.length(text_col)), 6).alias("avg_turn_chars"),
            (
                F.unix_timestamp(F.max(ts_col))
                - F.unix_timestamp(F.min(ts_col))
            )
            .cast("long")
            .alias("duration_s"),
            F.sum("__switch").cast("long").alias("role_switches"),
        )
    )


def pack_conversations(
    df: DataFrame,
    budget: int,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    token_col: str = "n_tokens",
) -> DataFrame:
    """Conversation-aware greedy packing: within each conversation, in
    turn order, cut the turns into training chunks whose token sum
    stays ≤ ``budget`` (a turn longer than the budget gets a chunk of
    its own). Adds ``chunk`` (0-based, per-conversation). Unlike
    ``ops.sampling.pack_sequences`` (which packs unrelated documents
    into shard-local bins), chunks here NEVER span conversations and
    never reorder turns — the context-window chunking a transcript
    training pipeline needs.

    Chunk id = number of cuts strictly before the turn; a cut falls
    whenever the running total since the last cut would exceed the
    budget. The fold carries (fill, chunk) state, so it runs as ONE
    per-conversation Arrow scan — state bounded by the conversation's
    own length (the inherent unit of work), never corpus size."""
    import pandas as pd

    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + ", chunk long"
    cap = int(budget)

    def assign(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col, kind="mergesort").reset_index(
            drop=True
        )
        chunks = []
        fill = 0
        c = 0
        first = True
        for t in pdf[token_col].astype("int64"):
            t = int(t)
            if not first and fill + t > cap:
                c += 1
                fill = 0
            first = False
            fill += t
            chunks.append(c)
        pdf["chunk"] = pd.Series(chunks, dtype="int64")
        return pdf

    return df.groupBy(conv_col).applyInPandas(assign, schema=schema)


def training_pairs(
    df: DataFrame,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    target_role: str = "assistant",
    max_context_turns: int = 4,
    sep: str = "\n",
) -> DataFrame:
    """SFT pair extraction: for every turn spoken by ``target_role``,
    emit (conv_id, turn_idx, context, target) where ``context`` is the
    up-to-``max_context_turns`` preceding turns rendered as
    ``role: text`` joined by ``sep``, and ``target`` is the turn's own
    text. Turns with NO preceding context are dropped (nothing to
    condition on).

    Physical plan: ONE window pass partitioned by conversation with a
    bounded ROWS frame (``max_context_turns`` PRECEDING .. 1 PRECEDING)
    — per-row state is the frame, so memory is bounded by the context
    budget regardless of conversation or corpus size; no self-join, no
    explode."""
    w = (
        Window.partitionBy(conv_col)
        .orderBy(order_col)
        .rowsBetween(-int(max_context_turns), -1)
    )
    rendered = F.concat_ws(": ", F.col(role_col), F.col(text_col))
    ctx = F.array_join(F.collect_list(rendered).over(w), sep)
    return (
        df.withColumn("context", ctx)
        .filter(
            (F.col(role_col) == target_role) & (F.length("context") > 0)
        )
        .select(
            F.col(conv_col).alias("conv_id"),
            F.col(order_col).alias("turn_idx"),
            "context",
            F.col(text_col).alias("target"),
        )
    )


def conversation_text(
    df: DataFrame,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    text_col: str = "text",
    sep: str = "\n",
) -> DataFrame:
    """(conv_id, text): each conversation's turns concatenated in turn
    order — the canonical unit for conversation-level dedup (feed the
    result to ``ops.dedup``'s exact/minhash/simhash operators).

    Deterministic ordering without a window: ``sort_array`` over
    (order_col, text) structs collected per conversation — an algebraic
    aggregate with map-side partials; per-group state is bounded by the
    conversation's own length."""
    return (
        df.groupBy(F.col(conv_col).alias("conv_id"))
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(
                        F.collect_list(
                            F.struct(
                                F.col(order_col).alias("o"),
                                F.col(text_col).alias("t"),
                            )
                        )
                    ),
                    lambda s: s["t"],
                ),
                sep,
            ).alias("text")
        )
    )


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    order_cols: tuple = (),
) -> DataFrame:
    """Gap-based sessionization of an event stream: every input column
    plus ``session_idx`` (1-based per user) and ``session_id``
    ("<user>-<idx>"). A new session starts at the first event and
    whenever the gap since the previous event exceeds ``gap_seconds``.

    This is the step that turns raw event logs into conversation-shaped
    units upstream of the transcript corpus. One window partitioned by
    user — per-user state only, so a 10^12-event log parallelizes on
    users and a hot user is bounded by their OWN event count, never by
    corpus size. ``order_cols`` breaks timestamp ties deterministically
    (pass the event id).
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, *order_cols)
    prev = F.lag(ts_col).over(w)
    is_new = (
        prev.isNull()
        | ((F.unix_timestamp(ts_col) - F.unix_timestamp(prev)) > gap_seconds)
    ).cast("long")
    run = Window.partitionBy(user_col).orderBy(ts_col, *order_cols).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    out = df.withColumn("session_idx", F.sum(is_new).over(run))
    return out.withColumn(
        "session_id",
        F.concat_ws("-", F.col(user_col).cast("string"), F.col("session_idx")),
    )


def session_summary(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    order_cols: tuple = (),
) -> DataFrame:
    """(user, session_idx, n_events, start_ts, end_ts) per session —
    the compact proof of the assignment (any misassigned event changes
    a count or a boundary)."""
    s = sessionize(df, user_col, ts_col, gap_seconds, order_cols)
    return s.groupBy(user_col, "session_idx").agg(
        F.count("*").alias("n_events"),
        F.min(ts_col).alias("start_ts"),
        F.max(ts_col).alias("end_ts"),
    )


def sliding_window_stats(
    events: DataFrame,
    ts_col: str = "ts",
    window: str = "2 hours",
    slide: str = "1 hour",
    user_col: str = "user_id",
) -> DataFrame:
    """Sliding-window event rollup: events per window + distinct users,
    the monitoring companion to gap-based `sessionize`. Built on
    ``F.window`` — each event replicates into window/slide overlapping
    windows map-side, then ONE groupBy(window_start) aggregates; the
    exact-distinct is a two-level aggregate keyed by (window, user), so
    memory per task is bounded by users-per-window, not events. The
    same plan runs unchanged under Structured Streaming (readStream +
    watermark) — F.window is the streaming-native construct, which is
    why this is not a self-join on a time predicate.

    Returns (window_start_epoch bigint, n_events, n_users), one row
    per non-empty window — epoch seconds, not a timestamp, per the
    repo-wide timezone-proof oracle convention."""
    w = F.window(F.col(ts_col), window, slide)
    grouped = (
        events.filter(F.col(ts_col).isNotNull())
        .groupBy(w.alias("win"))
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct(F.col(user_col)).alias("n_users"),
        )
    )
    # wall-clock seconds since epoch: NTZ-safe (a plain cast to long is
    # rejected for TIMESTAMP_NTZ, and unix_timestamp() is session-tz
    # dependent — timestampdiff against an NTZ epoch literal is neither)
    start_epoch = F.expr(
        "timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', "
        "CAST(win.start AS TIMESTAMP_NTZ))"
    )
    return grouped.select(
        start_epoch.cast("long").alias("window_start_epoch"),
        "n_events",
        "n_users",
    )


def tool_chains(
    df: DataFrame,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    tool_col: str = "tool",
    k: int = 20,
) -> DataFrame:
    """Most-common tool-invocation chains across conversations — the
    agent-transcript analytics question "what tool sequences do agents
    actually run?". Per conversation the ordered non-null tool calls
    collapse to one '>'-joined chain string via
    ``sort_array(collect_list(struct))`` (algebraic, map-side partials;
    per-conv state bounded by its own tool-call count), then ONE count
    aggregate and a top-k (sort+limit → TakeOrderedAndProject; the
    rank window runs over the already-limited k rows only). Ties break
    deterministically by chain text."""
    seq = F.transform(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col(order_col).alias("o"), F.col(tool_col).alias("t")
                )
            )
        ),
        lambda s: s["t"],
    )
    chains = (
        df.filter(F.col(tool_col).isNotNull())
        .groupBy(conv_col)
        .agg(F.concat_ws(">", seq).alias("chain"))
    )
    counts = chains.groupBy("chain").agg(
        F.count("*").cast("long").alias("n_convs")
    )
    top = counts.orderBy(
        F.col("n_convs").desc(), F.col("chain").asc()
    ).limit(int(k))
    w = Window.orderBy(F.col("n_convs").desc(), F.col("chain").asc())
    return top.withColumn("rank", F.row_number().over(w))


def role_transitions(
    df: DataFrame,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    role_col: str = "role",
) -> DataFrame:
    """Role-transition matrix over consecutive turns — the
    conversation-structure analytics question "who speaks after whom?"
    (user→assistant, assistant→tool, …). Returns
    ``(role_from, role_to, n, p)`` where ``p`` is the row-normalized
    transition probability ``n / Σ_to n`` rounded to 6 decimals.

    Physical plan: ONE lag window partitioned by conversation (state
    bounded by conversation length — hot conversations are the skew
    axis and they are bounded by design), then a groupBy over the
    |roles|² transition keys (map-side combined). The normalizing
    window runs over the already-aggregated |roles|²-row table, never
    the corpus."""
    w = Window.partitionBy(conv_col).orderBy(order_col)
    pairs = df.select(
        F.lag(role_col).over(w).alias("role_from"),
        F.col(role_col).alias("role_to"),
    ).filter(F.col("role_from").isNotNull())
    counts = pairs.groupBy("role_from", "role_to").agg(
        F.count("*").cast("long").alias("n")
    )
    tot = Window.partitionBy("role_from")
    return counts.withColumn(
        "p",
        F.round(
            F.col("n").cast("double")
            / F.sum("n").over(tot).cast("double"),
            6,
        ),
    )


def turn_latency(
    df: DataFrame,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    role_col: str = "role",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-transition response-latency stats: for every consecutive-turn
    role transition (user→assistant, assistant→tool, …) aggregate the
    gap in seconds between the two turns' timestamps — the "how long do
    responses take after which kind of turn" monitoring question over
    agent transcripts. Returns ``(role_from, role_to, n, mean_s, p50_s,
    max_s)``; seconds come from unix-timestamp differences (exact
    integers for whole-second data) and the float columns round to 6
    decimals.

    Plan shape mirrors :func:`role_transitions`: ONE lag window bounded
    by conversation length, then a groupBy over the |roles|² transition
    keys. ``p50`` uses Catalyst's exact ``percentile`` — safe because
    each group buffers only its own gap list during aggregation and the
    transition key space is tiny; swap to ``approx_percentile`` if a
    corpus ever concentrates 10^12 turns on a handful of transitions
    (`ops/stats.py` documents the same trade)."""
    w = Window.partitionBy(conv_col).orderBy(order_col)
    ep = F.unix_timestamp(F.col(ts_col)).cast("double")
    pairs = df.select(
        F.lag(role_col).over(w).alias("role_from"),
        F.col(role_col).alias("role_to"),
        (ep - F.lag(ep).over(w)).alias("gap_s"),
    ).filter(F.col("role_from").isNotNull())
    return pairs.groupBy("role_from", "role_to").agg(
        F.count("*").cast("long").alias("n"),
        F.round(F.avg("gap_s"), 6).alias("mean_s"),
        F.round(F.expr("percentile(gap_s, 0.5)"), 6).alias("p50_s"),
        F.round(F.max("gap_s"), 6).alias("max_s"),
    )


def retention_cohorts(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly retention-cohort analysis over an event stream: bucket
    every user into the week of their FIRST event (the cohort), then
    count how many distinct users of each cohort were active again
    ``offset`` weeks later — the standard triangle behind every
    retention dashboard, and (for a transcript platform) the "do users
    who started in week W keep generating conversations" question.

    Returns ``(cohort_week, week_offset, n_users)`` — the cohort key is
    the truncated Monday's epoch seconds (the repo's timezone-proof
    histogram convention: truncation runs in the session timezone, UTC
    in every deployment, and oracles restate ``epoch(date_trunc(...))``
    so no engine-side date rendering is compared), and the offset is
    exact integer arithmetic on those epochs (UTC has no DST, so Monday
    boundaries differ by whole 604800-second weeks).

    Plan: TWO shuffles, both map-side combined and both keyed to defuse
    skew. (1) ``groupBy(user, week)`` distincts the activity grid —
    a hot user's 10^6 events collapse to at most #weeks rows during the
    partial aggregate, so no single key carries corpus-scale data.
    (2) ``groupBy(user)`` folds that grid into (first_week, week_set)
    with state bounded by the calendar (#weeks), then a map-only
    explode derives offsets and the final count aggregates on the tiny
    (cohort, offset) key space. No window over the raw stream, no
    distinct-count sketch needed: exactness comes from the grid
    already being distinct per (user, week)."""
    wk = F.date_trunc("week", F.col(ts_col)).cast("long")
    grid = df.groupBy(F.col(user_col).alias("u"), wk.alias("wk")).agg(
        F.lit(1).alias("_one")
    )
    per_user = grid.groupBy("u").agg(
        F.min("wk").alias("cohort_week"),
        F.collect_set("wk").alias("weeks"),
    )
    active = per_user.select(
        "cohort_week",
        F.explode("weeks").alias("wk"),
    ).select(
        "cohort_week",
        ((F.col("wk") - F.col("cohort_week")) / 604800)
        .cast("long")
        .alias("week_offset"),
    )
    return active.groupBy("cohort_week", "week_offset").agg(
        F.count("*").cast("long").alias("n_users")
    )


def funnel(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: "list[str]",
    within_seconds: "float | None" = None,
) -> DataFrame:
    """Ordered funnel analysis: how many users completed step 1, then
    step 2 strictly after their earliest step 1, then step 3 strictly
    after that earliest step 2, … (the earliest-completion funnel every
    product-analytics stack ships); ``within_seconds`` additionally
    requires the whole chain to finish within that horizon of the
    user's step-1 time. Returns ``(step_idx, step, n_users)`` with
    step_idx 1-based.

    Distributed shape: one min-aggregate per step — step k's frame is
    events of that type joined (broadcast-friendly: per-user one row)
    to the step-(k-1) frame, filtered ``ts > t_{k-1}``, then ONE
    map-side-combined ``groupBy(user).min(ts)``. No window over the raw
    stream, no per-user event lists: state per stage is one timestamp
    per surviving user, and each stage only shrinks. The chain length
    is the number of steps — the algorithm, not a scale compromise."""
    if not steps:
        raise ValueError("funnel needs at least one step")
    # microsecond-precise epochs (unix_timestamp truncates to seconds,
    # which would collapse strict-after comparisons within one second)
    ep = F.col(ts_col).cast("timestamp").cast("double")
    ev = df.select(
        F.col(user_col).alias("__u"),
        F.col(type_col).alias("__t"),
        ep.alias("__ts"),
    )
    stage = (
        ev.filter(F.col("__t") == steps[0])
        .groupBy("__u")
        .agg(F.min("__ts").alias("__t1"))
    )
    counts = [stage.count()]
    prev_col = "__t1"
    for i, s in enumerate(steps[1:], start=2):
        nxt = (
            ev.filter(F.col("__t") == s)
            .join(stage, "__u")
            .filter(F.col("__ts") > F.col(prev_col))
        )
        if within_seconds is not None:
            nxt = nxt.filter(
                F.col("__ts") - F.col("__t1") <= float(within_seconds)
            )
        stage = nxt.groupBy("__u", "__t1").agg(
            F.min("__ts").alias(f"__t{i}")
        )
        prev_col = f"__t{i}"
        counts.append(stage.count())
    spark = df.sparkSession
    rows = [
        (i + 1, s, int(c)) for i, (s, c) in enumerate(zip(steps, counts))
    ]
    return spark.createDataFrame(
        rows, "step_idx int, step string, n_users long"
    )


def truncate_to_context(
    df: DataFrame,
    budget: int,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    text_col: str = "text",
) -> DataFrame:
    """SFT context-budget truncation: for every conversation keep the
    longest SUFFIX of turns (the most recent context) whose total
    whitespace-token count fits ``budget`` — the standard prep step
    before packing multi-turn transcripts into a fixed training context
    window (drop the oldest turns first, never the newest).

    Plan shape: one window partitioned by conversation ordered by
    ``order_col`` DESC accumulating a running suffix token sum, then a
    predicate. State is bounded by conversation length (the inherent
    unit), so hot conversations cost their OWN length only. A turn that
    alone exceeds the remaining budget is dropped along with everything
    older (pure suffix rule — no partial-turn splitting).

    Returns the kept rows: (conv, order, n_toks, suffix_toks).
    """
    n_toks = F.size(F.split(F.col(text_col), " ")).cast("long")
    w = (
        Window.partitionBy(conv_col)
        .orderBy(F.col(order_col).desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = df.select(
        conv_col, order_col, n_toks.alias("n_toks")
    ).withColumn("suffix_toks", F.sum("n_toks").over(w))
    return out.filter(F.col("suffix_toks") <= budget)


def sft_mask_stats(
    df: DataFrame,
    conv_col: str = "conv_id",
    role_col: str = "role",
    text_col: str = "text",
    trainable_roles: tuple = ("assistant",),
) -> DataFrame:
    """Loss-mask accounting for SFT: per conversation, how many tokens
    the training loss would actually see. Standard practice masks
    everything except the model's own turns (``trainable_roles``), so
    the trainable-token ratio is the honest 'how much signal per
    sequence' number a data pipeline reports before packing.

    One map-side-combined groupBy — conditional sums, no window.
    Returns (conv, n_turns, total_toks, trainable_toks,
    trainable_ratio) with the ratio rounded to the 6-decimal grid
    (NULL-safe: 0-token conversations report NULL ratio).
    """
    n_toks = F.size(F.split(F.col(text_col), " ")).cast("long")
    trainable = F.when(
        F.col(role_col).isin(*trainable_roles), n_toks
    ).otherwise(F.lit(0).cast("long"))
    out = df.groupBy(conv_col).agg(
        F.count("*").cast("long").alias("n_turns"),
        F.sum(n_toks).alias("total_toks"),
        F.sum(trainable).alias("trainable_toks"),
    )
    return out.withColumn(
        "trainable_ratio",
        F.when(
            F.col("total_toks") > 0,
            F.round(
                F.col("trainable_toks").cast("double")
                / F.col("total_toks").cast("double"),
                6,
            ),
        ),
    )


def preference_pairs(
    df: DataFrame,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    prompt_role: str = "user",
    response_role: str = "assistant",
    max_gap: int = 1,
) -> DataFrame:
    """RLHF preference-pair mining: wherever the SAME prompt text was
    answered differently across the corpus, emit (prompt, chosen,
    rejected) — the standard reward-model data-prep step. A response is
    the FIRST ``response_role`` turn within the ``max_gap`` turns after
    a ``prompt_role`` turn (agent transcripts interleave tool calls
    between the user and the assistant, so gap 2+ is the realistic
    shape). The gap search stops at the next ``prompt_role`` turn: in
    ``user1, user2, assistant`` the assistant answers user2 only, so
    user1 mines NO pair even with gap 2 — intervening tool/system
    turns are skipped, intervening prompts are not. Within a prompt
    group the deterministic
    preference proxy ranks responses by token count DESC (then text
    ASC, then conversation ASC) — chosen is rank 1 from the top,
    rejected rank 1 from the bottom, and pairs where both ends carry
    the same text are dropped (no signal).

    Plan shape: one per-conversation lead() window (state bounded by
    conversation length) extracts prompt→response rows; two windows
    partitioned by prompt text rank inside prompt groups — a hot prompt
    (the power-law worry) costs its own response count only. Returns
    (prompt, chosen, rejected, chosen_toks, rejected_toks, n_responses).
    """
    w = Window.partitionBy(conv_col).orderBy(order_col)
    resp = None
    blocked = None  # an earlier lead inside the gap is another prompt
    for g in range(1, int(max_gap) + 1):
        cond = F.lead(role_col, g).over(w) == response_role
        if blocked is not None:
            cond = cond & ~blocked
        val = F.lead(text_col, g).over(w)
        resp = F.when(cond, val) if resp is None else resp.when(cond, val)
        nxt = F.lead(role_col, g).over(w) == prompt_role
        blocked = nxt if blocked is None else (blocked | nxt)
    pr = (
        df.withColumn("__ntext", resp)
        .filter(
            (F.col(role_col) == prompt_role) & F.col("__ntext").isNotNull()
        )
        .select(
            F.col(text_col).alias("prompt"),
            F.col("__ntext").alias("response"),
            F.size(F.split("__ntext", " ")).cast("long").alias("resp_toks"),
            F.col(conv_col).cast("string").alias("__conv"),
        )
    )
    top = Window.partitionBy("prompt").orderBy(
        F.col("resp_toks").desc(), F.col("response").asc(), F.col("__conv").asc()
    )
    bot = Window.partitionBy("prompt").orderBy(
        F.col("resp_toks").asc(), F.col("response").desc(), F.col("__conv").desc()
    )
    ranked = pr.select(
        "prompt", "response", "resp_toks",
        F.row_number().over(top).alias("__rt"),
        F.row_number().over(bot).alias("__rb"),
        F.count("*").over(Window.partitionBy("prompt")).alias("n_responses"),
    )
    chosen = ranked.filter(F.col("__rt") == 1).select(
        "prompt",
        F.col("response").alias("chosen"),
        F.col("resp_toks").alias("chosen_toks"),
        "n_responses",
    )
    rejected = ranked.filter(F.col("__rb") == 1).select(
        "prompt",
        F.col("response").alias("rejected"),
        F.col("resp_toks").alias("rejected_toks"),
    )
    return (
        chosen.join(rejected, "prompt")
        .filter(F.col("chosen") != F.col("rejected"))
        .select(
            "prompt", "chosen", "rejected",
            "chosen_toks", "rejected_toks", "n_responses",
        )
    )
