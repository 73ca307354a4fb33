"""script_score / script_fields: Catalyst-expression scoring parity
with a Python recompute, NULL semantics, and field decoration."""

import pyspark.sql.functions as F
import pytest

from ics_search_engine_spark.operators.packed_index import (
    PackedIndex,
    build_packed_index,
)
from ics_search_engine_spark.operators.query import bm25_topk_packed
from ics_search_engine_spark.operators.scripting import (
    bm25_topk_script,
    script_fields,
)

QUERY = "machine learning algorithm"


@pytest.fixture(scope="module")
def setup(spark, small_df, corpus_dir):
    out = f"{corpus_dir}/script_idx"
    build_packed_index(spark, small_df, out, range_bits=8)
    pidx = PackedIndex(spark, out)
    attrs = small_df.select(
        "conv_id",
        "turn_idx",
        (F.crc32("conv_id") % 7).cast("double").alias("weight"),
    )
    return pidx, attrs


def test_identity_script_equals_plain_bm25(spark, setup):
    pidx, attrs = setup
    plain = [
        tuple(r) for r in bm25_topk_packed(spark, pidx, QUERY, k=15).collect()
    ]
    scripted = [
        tuple(r)
        for r in bm25_topk_script(
            spark, pidx, QUERY, attrs, "_score", k=15
        ).collect()
    ]
    assert scripted == plain


def test_weighted_script_matches_python_recompute(spark, setup):
    pidx, attrs = setup
    # exhaustive base scores + driver-side recompute of the script
    base = bm25_topk_packed(spark, pidx, QUERY, k=10_000).collect()
    w = {(r["conv_id"], r["turn_idx"]): r["weight"] for r in attrs.collect()}
    expect = sorted(
        (
            (c, t, s * (1.0 + w[(c, t)]))
            for c, t, s in ((r[0], r[1], r[2]) for r in base)
        ),
        key=lambda r: (-r[2], r[0], r[1]),
    )[:12]
    got = [
        (r[0], r[1], r[2])
        for r in bm25_topk_script(
            spark,
            pidx,
            QUERY,
            attrs,
            "_score * (1.0 + coalesce(weight, 0.0))",
            k=12,
        ).collect()
    ]
    assert got == expect


def test_null_script_rows_dropped(spark, setup):
    pidx, attrs = setup
    got = bm25_topk_script(
        spark,
        pidx,
        QUERY,
        attrs,
        "CASE WHEN weight > 3.0 THEN _score END",
        k=50,
    ).collect()
    assert got, "expected some docs with weight > 3"
    w = {(r["conv_id"], r["turn_idx"]): r["weight"] for r in attrs.collect()}
    assert all(w[(r[0], r[1])] > 3.0 for r in got)


def test_no_attrs_script_over_score_only(spark, setup):
    pidx, _ = setup
    plain = [
        tuple(r) for r in bm25_topk_packed(spark, pidx, QUERY, k=8).collect()
    ]
    doubled = [
        tuple(r)
        for r in bm25_topk_script(
            spark, pidx, QUERY, None, "_score * 2.0", k=8
        ).collect()
    ]
    assert [(c, t) for c, t, _ in doubled] == [(c, t) for c, t, _ in plain]
    for (_, _, s2), (_, _, s1) in zip(doubled, plain):
        assert s2 == 2.0 * s1


def test_script_fields_decorates_hits(spark, setup):
    pidx, attrs = setup
    hits = bm25_topk_packed(spark, pidx, QUERY, k=5)
    out = script_fields(
        hits,
        attrs,
        {"w2": "weight * 2.0", "key_len": "length(conv_id)"},
    ).collect()
    assert [r["conv_id"] for r in out] == [
        r["conv_id"] for r in hits.collect()
    ]
    w = {(r["conv_id"], r["turn_idx"]): r["weight"] for r in attrs.collect()}
    for r in out:
        assert r["w2"] == 2.0 * w[(r["conv_id"], r["turn_idx"])]
        assert r["key_len"] == len(r["conv_id"])


def test_script_fields_without_attrs(spark, setup):
    pidx, _ = setup
    hits = bm25_topk_packed(spark, pidx, QUERY, k=4)
    out = script_fields(hits, None, {"s3": "score * 3.0"}).collect()
    assert all(abs(r["s3"] - 3.0 * r["score"]) < 1e-12 for r in out)
