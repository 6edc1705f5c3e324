"""Deterministic sampling / split / packing: portable-hash membership,
nested-sample property, split proportions, packing budget invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from itemsjs_spark.ops import sampling


def _ids(spark, n=2000):
    return spark.range(n).select(F.col("id").alias("doc_id"))


def test_hash_fraction_uniform_and_stable(spark):
    df = _ids(spark).withColumn(
        "f", sampling.hash_fraction(F.col("doc_id"))
    )
    rows = df.collect()
    assert all(0.0 <= r["f"] < 1.0 for r in rows)
    again = {r["doc_id"]: r["f"] for r in df.collect()}
    assert {r["doc_id"]: r["f"] for r in rows} == again
    mean = sum(r["f"] for r in rows) / len(rows)
    assert 0.45 < mean < 0.55


def test_sample_fraction_is_nested(spark):
    """Threshold sampling: the 30% sample is a SUBSET of the 60% sample
    (same seed) — the property rand()-based sampling cannot give you."""
    df = _ids(spark)
    small = {r["doc_id"] for r in sampling.sample_fraction(df, "doc_id", 0.3).collect()}
    big = {r["doc_id"] for r in sampling.sample_fraction(df, "doc_id", 0.6).collect()}
    assert small <= big
    assert 0.2 < len(small) / 2000 < 0.4
    assert 0.5 < len(big) / 2000 < 0.7
    # a different seed draws a different sample
    other = {
        r["doc_id"]
        for r in sampling.sample_fraction(df, "doc_id", 0.3, seed="s2").collect()
    }
    assert other != small


def test_deterministic_split_partitions_and_proportions(spark):
    df = _ids(spark)
    out = sampling.deterministic_split(
        df, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}
    )
    rows = out.collect()
    by = {}
    for r in rows:
        by.setdefault(r["split"], set()).add(r["doc_id"])
    assert set(by) == {"train", "val", "test"}
    assert sum(len(v) for v in by.values()) == 2000
    assert 0.74 < len(by["train"]) / 2000 < 0.86
    # membership is a pure function of the id: a disjoint recomputation
    # over half the table agrees row-for-row
    half = sampling.deterministic_split(
        df.filter(F.col("doc_id") < 1000), "doc_id",
        {"train": 0.8, "val": 0.1, "test": 0.1},
    )
    for r in half.collect():
        assert r["doc_id"] in by[r["split"]]


def test_pack_sequences_budget_and_order(spark):
    df = _ids(spark, 500).withColumn(
        "toks", (F.col("doc_id") % 90 + 10).cast("long")
    )
    packed = sampling.pack_sequences(
        df, "doc_id", "toks", budget=200, n_shards=4
    ).collect()
    assert len(packed) == 500
    per_bin = {}
    order = {}
    for r in packed:
        per_bin.setdefault((r["shard"], r["bin"]), 0)
        per_bin[(r["shard"], r["bin"])] += r["toks"]
        order.setdefault(r["shard"], []).append((r["doc_id"], r["bin"]))
    assert all(v <= 200 for v in per_bin.values())
    for seq in order.values():  # bin ids nondecreasing in id order
        seq.sort()
        bins = [b for _, b in seq]
        assert bins == sorted(bins)


def test_pack_sequences_oversized_doc_gets_own_bin(spark):
    rows = [(1, 50), (2, 500), (3, 60)]
    df = spark.createDataFrame(rows, "doc_id long, toks long")
    packed = sorted(
        (r["doc_id"], r["bin"])
        for r in sampling.pack_sequences(
            df, "doc_id", "toks", budget=100, n_shards=1
        ).collect()
    )
    assert packed == [(1, 0), (2, 1), (3, 2)]


def test_mixture_weights_and_sample(spark):
    """Downsample-only rates hit the target mix: the most over-demanded
    group keeps everything; realized proportions approach the target."""
    import pytest

    from itemsjs_spark.ops import sampling as s
    from pyspark.sql import functions as F

    # observed mix: a=70%, b=20%, c=10%; target: a=25%, b=25%, c=50%
    rows = (
        [(i, "a") for i in range(700)]
        + [(700 + i, "b") for i in range(200)]
        + [(900 + i, "c") for i in range(100)]
    )
    df = spark.createDataFrame(rows, "doc_id long, grp string")
    target = {"a": 0.25, "b": 0.25, "c": 0.5}
    rates = {
        r["grp"]: r["keep_rate"]
        for r in s.mixture_weights(df, "grp", target).collect()
    }
    # c is the most over-demanded (0.5 target vs 0.1 observed): keeps all
    assert rates["c"] == 1.0
    # relative rates follow target/observed ratios exactly
    assert rates["a"] == pytest.approx((0.25 / 0.7) / (0.5 / 0.1), abs=1e-6)
    assert rates["b"] == pytest.approx((0.25 / 0.2) / (0.5 / 0.1), abs=1e-6)

    kept = s.mixture_sample(df, "doc_id", "grp", target)
    mix = {r["grp"]: r["cnt"] for r in kept.groupBy("grp").agg(
        F.count("*").alias("cnt")).collect()}
    assert mix["c"] == 100  # rate-1 group fully kept
    # realized counts within sampling noise of the target ratios
    assert abs(mix["a"] - 50) <= 25 and abs(mix["b"] - 50) <= 25

    # group absent from the target is dropped entirely
    df2 = df.union(spark.createDataFrame([(2000, "z")], "doc_id long, grp string"))
    kept2 = s.mixture_sample(df2, "doc_id", "grp", target)
    assert kept2.filter(F.col("grp") == "z").count() == 0


def test_mixture_upsample_repeats_and_remainder(spark):
    """Upsampling mixture: over-demanded groups are repeated
    floor(rate) times plus a hash-chosen remainder copy; expected group
    sizes hit the target exactly; corpus size is preserved in
    expectation; membership/copy-count is a pure function of the id."""
    import pytest

    from itemsjs_spark.ops import sampling as s

    # observed: a=50%, b=30%, c=20%; target: a=10%, b=30%, c=60%
    rows = (
        [(i, "a") for i in range(500)]
        + [(500 + i, "b") for i in range(300)]
        + [(800 + i, "c") for i in range(200)]
    )
    df = spark.createDataFrame(rows, "doc_id long, grp string")
    target = {"a": 0.1, "b": 0.3, "c": 0.6}
    rates = {
        r["grp"]: r["rate"]
        for r in s.upsample_rates(df, "grp", target).collect()
    }
    assert rates["a"] == pytest.approx(0.1 / 0.5, abs=1e-6)   # 0.2
    assert rates["b"] == pytest.approx(0.3 / 0.3, abs=1e-6)   # 1.0
    assert rates["c"] == pytest.approx(0.6 / 0.2, abs=1e-6)   # 3.0

    out = s.mixture_upsample(df, "doc_id", "grp", target)
    per = {
        r["grp"]: r["cnt"]
        for r in out.groupBy("grp").agg(F.count("*").alias("cnt")).collect()
    }
    # integer rates are exact: every b row once, every c row 3 times
    assert per["b"] == 300 and per["c"] == 600
    # fractional rate 0.2: within sampling noise of 100
    assert abs(per["a"] - 100) <= 40
    # copy indices are dense 0..n-1 per row
    copies = out.filter(F.col("grp") == "c").groupBy("doc_id").agg(
        F.sort_array(F.collect_list("copy")).alias("cs")).collect()
    assert all(r["cs"] == [0, 1, 2] for r in copies)

    # fractional remainder: rate 2.5 gives every row 2 or 3 copies and
    # the 3-copy set is the SAME under recomputation over a subset
    t2 = {"a": 0.5, "b": 0.2, "c": 0.2}  # a: (0.5/0.9)/(0.5) = 1.111…
    out2 = s.mixture_upsample(df, "doc_id", "grp", t2)
    n_by_id = {
        r["doc_id"]: r["n"]
        for r in out2.filter(F.col("grp") == "a")
        .groupBy("doc_id").agg(F.count("*").alias("n")).collect()
    }
    assert set(n_by_id.values()) <= {1, 2}
    # deterministic: a rerun reproduces every per-id copy count
    again = {
        r["doc_id"]: r["n"]
        for r in s.mixture_upsample(df, "doc_id", "grp", t2)
        .filter(F.col("grp") == "a")
        .groupBy("doc_id").agg(F.count("*").alias("n")).collect()
    }
    assert again == n_by_id

    # group absent from target vanishes
    df2 = df.union(spark.createDataFrame([(2000, "z")], "doc_id long, grp string"))
    assert (
        s.mixture_upsample(df2, "doc_id", "grp", target)
        .filter(F.col("grp") == "z").count() == 0
    )


def test_stratified_sample_exact_n_and_salt_invariance(spark):
    from pyspark.sql import Window

    df = _ids(spark, 3000).withColumn(
        # skewed groups: g0 huge (hot), g1 medium, g2 tiny (< n)
        "grp",
        F.when(F.col("doc_id") < 2900, "g0")
        .when(F.col("doc_id") < 2997, "g1")
        .otherwise("g2"),
    )
    out = sampling.stratified_sample(df, "doc_id", "grp", n=10)
    by_grp = {
        r["grp"]: r["c"]
        for r in out.groupBy("grp").agg(F.count("*").alias("c")).collect()
    }
    assert by_grp == {"g0": 10, "g1": 10, "g2": 3}  # min(n, |group|)

    # equals the plain single-window definition (reference semantics)
    frac = sampling.hash_fraction(F.col("doc_id"))
    w = Window.partitionBy("grp").orderBy(
        frac.asc(), F.col("doc_id").cast("string").asc()
    )
    ref = (
        df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .select("doc_id", "grp")
    )
    got = {(r["doc_id"], r["grp"]) for r in out.select("doc_id", "grp").collect()}
    assert got == {(r["doc_id"], r["grp"]) for r in ref.collect()}

    # salt decomposition is invisible: any bucket count, same rows
    for sb in (1, 3, 64):
        alt = sampling.stratified_sample(df, "doc_id", "grp", n=10, salt_buckets=sb)
        assert {
            (r["doc_id"], r["grp"]) for r in alt.select("doc_id", "grp").collect()
        } == got

    # no single-task hot-group stage: the first-phase window partitions
    # by (grp, salt), so its shuffle key has salt_buckets x groups keys
    plan = sampling.stratified_sample(
        df, "doc_id", "grp", n=10
    )._jdf.queryExecution().executedPlan().toString()
    assert "pmod" in plan


def test_split_by_conversation_integrity(spark):
    """Splitting on conv_id keeps every turn of a conversation in ONE
    split (the leakage-safe unit for conversational data), and turn
    counts are preserved across the split."""
    from itemsjs_spark.ops.sampling import deterministic_split

    rows = [(f"c{i % 7}", t, f"text {i} {t}") for i, t in
            ((i, t) for i in range(7) for t in range(10))]
    df = spark.createDataFrame(rows, ["conv_id", "turn_idx", "text"])
    s = deterministic_split(df, "conv_id", {"train": 0.8, "val": 0.2})
    per_conv = (
        s.groupBy("conv_id")
        .agg(F.countDistinct("split").alias("k"), F.count("*").alias("n"))
        .collect()
    )
    assert all(r["k"] == 1 for r in per_conv)
    assert sum(r["n"] for r in per_conv) == 70
    # same conv -> same split under re-evaluation (pure function of key)
    again = {r["conv_id"]: r["split"] for r in s.select("conv_id", "split").distinct().collect()}
    assert len(again) == 7


def test_weighted_sample_proportional_and_deterministic(spark):
    """A-Res: heavy rows win proportionally more slots; membership is a
    pure function of (seed, id, weight); non-positive weights never
    appear."""
    df = _ids(spark, 4000).withColumn(
        "w",
        F.when(F.col("doc_id") % 4 == 0, 9.0)
        .when(F.col("doc_id") % 4 == 1, 0.0)
        .otherwise(1.0),
    )
    got = sampling.weighted_sample(df, "doc_id", "w", n=400).collect()
    assert len(got) == 400
    ids = [r["doc_id"] for r in got]
    assert all(i % 4 != 1 for i in ids)  # zero weight excluded
    heavy = sum(1 for i in ids if i % 4 == 0)
    # 1000 heavy rows (w=9) vs 2000 light (w=1): heavy hold ~9x the
    # per-row odds, so they should dominate the sample
    assert heavy > 250
    again = [r["doc_id"] for r in sampling.weighted_sample(
        df, "doc_id", "w", n=400).collect()]
    assert ids == again
    other = [r["doc_id"] for r in sampling.weighted_sample(
        df, "doc_id", "w", n=400, seed="s2").collect()]
    assert ids != other


def test_weighted_sample_keys_sorted_and_bounded(spark):
    df = _ids(spark, 500).withColumn("w", F.lit(1.0) + F.col("doc_id"))
    got = sampling.weighted_sample(df, "doc_id", "w", n=50).collect()
    keys = [r["sort_key"] for r in got]
    assert keys == sorted(keys)
    assert all(k >= 0 for k in keys)


def test_dsir_weights_prefer_target_like_docs(spark):
    """Raw pool mixes two disjoint vocabularies; the target corpus uses
    only vocabulary A. DSIR weights must rank every A-doc above every
    B-doc, weights must be deterministic across runs, and n_grams must
    count unigrams + bigrams exactly."""
    from itemsjs_spark.ops.sampling import dsir_select, dsir_weights

    a_docs = [(i, "alpha beta gamma alpha beta") for i in range(5)]
    b_docs = [(i, "zork quux blorp zork quux") for i in range(5, 10)]
    raw = spark.createDataFrame(a_docs + b_docs, ["doc_id", "text"])
    target = spark.createDataFrame(
        [(100, "alpha beta alpha gamma beta alpha")], ["doc_id", "text"]
    )
    w = {
        r["doc_id"]: (r["n_grams"], r["weight"])
        for r in dsir_weights(raw, target).collect()
    }
    # 5 unigrams + 4 bigrams per doc
    assert all(w[i][0] == 9 for i in range(10))
    a_w = {w[i][1] for i in range(5)}
    b_w = {w[i][1] for i in range(5, 10)}
    assert len(a_w) == 1 and len(b_w) == 1  # identical texts, same weight
    assert min(a_w) > max(b_w)
    sel = dsir_select(raw, target, top_n=5).collect()
    assert [r["doc_id"] for r in sel] == [0, 1, 2, 3, 4]
    assert [r["rank"] for r in sel] == [1, 2, 3, 4, 5]
    w2 = {
        r["doc_id"]: (r["n_grams"], r["weight"])
        for r in dsir_weights(raw, target).collect()
    }
    assert w == w2


def test_fim_split_reassembles_and_passes_through(spark):
    docs = spark.range(400).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("doc "), F.col("id").cast("string"),
                 F.lit(" body text tail")).alias("text"),
    )
    out = sampling.fim_split(docs, rate=0.5).collect()
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    n_fim = 0
    for r in out:
        t = texts[r["doc_id"]]
        if r["fim"]:
            n_fim += 1
            # character-exact reassembly: no byte invented or lost
            assert r["prefix"] + r["middle"] + r["suffix"] == t
            assert r["fim_text"] == (
                sampling.FIM_PRE + r["prefix"] + sampling.FIM_SUF
                + r["suffix"] + sampling.FIM_MID + r["middle"]
            )
        else:
            assert (r["prefix"], r["middle"], r["suffix"]) == (t, "", "")
            assert r["fim_text"] == t
    assert 120 < n_fim < 280  # ~rate of 400, deterministic


def test_fim_split_deterministic_and_seeded(spark):
    docs = spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.lit("alpha beta gamma delta").alias("text"),
    )
    a = sorted(map(tuple, sampling.fim_split(docs).collect()))
    b = sorted(map(tuple, sampling.fim_split(docs).collect()))
    assert a == b
    c = sorted(map(tuple, sampling.fim_split(docs, seed="7").collect()))
    assert a != c
