"""term_vectors (operators/termvectors.py): re-analysis must agree
with the index's own postings, df with the index's metadata."""

import pytest

from ics_search_engine_spark.operators import index_build as ib
from ics_search_engine_spark.operators.packed_index import (
    PackedIndex,
    build_packed_index,
)
from ics_search_engine_spark.operators.termvectors import term_vectors


@pytest.fixture(scope="module")
def setup(spark, small_df, corpus_dir):
    out = f"{corpus_dir}/tv_idx"
    build_packed_index(spark, small_df, out, range_bits=9,
                       with_positions=True)
    return PackedIndex(spark, out), small_df


def _index_rows(spark, small_df, conv_id, turn_idx):
    """The build pipeline's own postings for one doc — the ground truth
    term_vectors must reproduce."""
    import pyspark.sql.functions as F

    one = small_df.filter(
        (F.col("conv_id") == conv_id) & (F.col("turn_idx") == turn_idx)
    )
    posts = ib.postings(ib.tokenized(one), with_positions=True)
    return {
        r["term"]: (r["tf"], list(r["positions"]))
        for r in posts.collect()
    }


@pytest.mark.parametrize("key_ix", [0, 7, 131])
def test_tf_and_positions_match_build(spark, setup, small_rows, key_ix):
    pidx, small_df = setup
    conv_id, turn_idx, _ = small_rows[key_ix]
    got = {
        r["term"]: (r["tf"], list(r["positions"]))
        for r in term_vectors(
            spark, pidx, small_df, conv_id, turn_idx
        ).collect()
    }
    want = _index_rows(spark, small_df, conv_id, turn_idx)
    assert got == want


def test_df_matches_index_metadata(spark, setup, small_rows):
    pidx, small_df = setup
    conv_id, turn_idx, _ = small_rows[0]
    rows = term_vectors(spark, pidx, small_df, conv_id, turn_idx).collect()
    assert rows, "doc 0 should have terms"
    terms = [r["term"] for r in rows]
    want_df = pidx.df_for_terms(terms)
    for r in rows:
        # every re-analyzed term must exist in the index with the
        # index's own df (doc store and index were built together)
        assert r["df"] == want_df[r["term"]] > 0


def test_output_is_term_sorted(spark, setup, small_rows):
    pidx, small_df = setup
    conv_id, turn_idx, _ = small_rows[7]
    terms = [
        r["term"]
        for r in term_vectors(
            spark, pidx, small_df, conv_id, turn_idx
        ).collect()
    ]
    assert terms == sorted(terms)


def test_unknown_key_is_empty(spark, setup):
    pidx, small_df = setup
    assert (
        term_vectors(spark, pidx, small_df, "convNOPE", 0).count() == 0
    )
