"""Tests for ops/pipeline.py — the chained curation composition.

The component operators are each oracle-proven in test_ops.py /
test_entry_driver_parity.py; here we pin the COMPOSITION semantics:
first-match drop-reason precedence, min-id canonical dedup, and
scrubbed text present iff kept.
"""

from pyspark.sql import functions as F

from itemsjs_spark.ops.pipeline import curate


def _rows(spark):
    # crafted so every stage fires at least once:
    #  1: good english, long + diverse -> kept
    #  2: byte-identical to 1 but higher id -> exact_dup
    #  3: no stopwords -> lang
    #  4: english but degenerate repetition -> quality
    good = (
        "the quick brown fox jumps over a lazy dog and then it runs to "
        "the river where many other animals are drinking water in peace "
        "while birds sing of summer evenings near old stone bridges there"
    )
    return spark.createDataFrame(
        [
            (1, good + " mail me x@example.com now"),
            (5, good + " mail me x@example.com now"),
            (3, "zxq qqq vvv kkk zzz mmm nnn ppp rrr sss ttt www yyy"),
            (4, "the the the the the the the the the the the the the"),
        ],
        "doc_id long, text string",
    )


def test_curate_reasons_and_precedence(spark):
    out = {r["doc_id"]: r for r in curate(_rows(spark)).collect()}
    assert len(out) == 4
    assert out[1]["drop_reason"] is None
    assert out[5]["drop_reason"] == "exact_dup"  # min-id canonical survives
    assert out[3]["drop_reason"] == "lang"
    assert out[4]["drop_reason"] == "quality"
    # exact_dup outranks later stages even though row 5 would also pass
    assert out[5]["lang_pred"] == "en"


def test_curate_scrub_only_on_kept(spark):
    out = {r["doc_id"]: r for r in curate(_rows(spark)).collect()}
    assert "<EMAIL>" in out[1]["scrubbed_text"]
    assert "x@example.com" not in out[1]["scrubbed_text"]
    for dropped in (5, 3, 4):
        assert out[dropped]["scrubbed_text"] is None


def test_curate_one_row_per_input_row(spark):
    df = _rows(spark)
    assert curate(df).count() == df.count()
    # loss accounting falls out of one groupBy
    acc = {
        r["drop_reason"]: r["n"]
        for r in curate(df)
        .groupBy("drop_reason")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert acc == {None: 1, "exact_dup": 1, "lang": 1, "quality": 1}
