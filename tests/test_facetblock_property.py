"""Property test: the facet-block set algebra and the scan-path Column
compiler are the SAME Boolean algebra. Random IR trees (and/or/not over
contains/hasvalue atoms, including degenerate TRUE/FALSE and repeated
conjuncts — the shapes the canonical freeze dedups) must produce
identical docid sets through both evaluators."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from itemsjs_spark.core import facetir
from itemsjs_spark.data.transcripts import transcripts_df
from itemsjs_spark.engine import Index, SearchEngine, itemsjs_spark
from itemsjs_spark.engine.facetblocks import BlockSetAlgebra
from itemsjs_spark.engine.query import DOCID, ir_to_column

KEYS = {
    "role": ["user", "assistant", "system", "nope-missing"],
    "tool": ["bash", "grep", "read", "edit"],
}

atoms = st.one_of(
    st.just(facetir.TRUE),
    st.just(facetir.FALSE),
    st.tuples(
        st.just("contains"),
        st.sampled_from(sorted(KEYS)),
        st.sampled_from(KEYS["role"] + KEYS["tool"]),
    ),
    st.tuples(st.just("hasvalue"), st.sampled_from(sorted(KEYS))),
)


def trees(depth):
    if depth == 0:
        return atoms
    sub = trees(depth - 1)
    return st.one_of(
        atoms,
        st.builds(lambda ps: ("and", ps), st.lists(sub, min_size=1, max_size=3)),
        st.builds(lambda ps: ("or", ps), st.lists(sub, min_size=1, max_size=3)),
        st.builds(lambda p: ("not", p), sub),
    )


@pytest.fixture(scope="module")
def prop_engine(spark, tmp_path_factory):
    tdf = transcripts_df(spark, n_turns=800, n_convs=80, seed=21)
    cfg = {
        "aggregations": {"role": {"size": 10}, "tool": {"size": 10}},
        "searchableFields": ["text"],
    }
    mem = itemsjs_spark(spark, tdf, cfg, order_by=["conv_id", "turn_idx"])
    path = str(tmp_path_factory.mktemp("propidx") / "artifacts")
    mem.index.write_blocks(path, n_buckets=2, range_size=256, block_size=64)
    eng = SearchEngine(Index.read(spark, path))
    eng.index.docs.persist().count()
    eng.index.facet_posting_blocks.persist().count()
    return eng


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(pred=trees(2))
def test_block_algebra_equals_scan_compiler(prop_engine, pred):
    eng = prop_engine
    alg = BlockSetAlgebra(eng.index, eng.index.facet_posting_blocks)
    res = alg.docids(pred)
    if res is True:
        got = {r[DOCID] for r in eng.index.docs.select(DOCID).collect()}
    elif res is False:
        got = set()
    else:
        got = {r[DOCID] for r in res.collect()}
    want = {
        r[DOCID]
        for r in eng.index.docs.filter(ir_to_column(pred, False))
        .select(DOCID)
        .collect()
    }
    assert got == want, pred
