"""Resume tests (SURVEY.md §5 item 4): kill after m of n buckets,
restart, assert identical index content and identical query results."""

import json

import pytest

from oracle import bm25 as oracle
from ics_search_engine_spark.operators.build import resumable_build
from ics_search_engine_spark.operators.packed_index import PackedIndex
from ics_search_engine_spark.operators.query import bm25_topk_packed


class _Boom(Exception):
    pass


def _index_content(spark, path):
    rows = spark.read.parquet(f"{path}/index").collect()
    return sorted(
        (r["term"], r["shard_id"], r["n_postings"], bytes(r["payload"]).hex())
        for r in rows
    )


@pytest.fixture(scope="module")
def dirs(corpus_dir):
    return f"{corpus_dir}/resume_a", f"{corpus_dir}/resume_b"


def test_interrupted_build_resumes_identically(spark, small_df, dirs, small_rows):
    dir_a, dir_b = dirs

    # uninterrupted reference build
    resumable_build(spark, small_df, dir_a, n_buckets=4, range_bits=9)

    # interrupted build: monkey-patch parquet write to blow up during
    # bucket 2's write, then restart
    from pyspark.sql.readwriter import DataFrameWriter

    orig = DataFrameWriter.parquet
    state = {"writes": 0}

    def failing(self, path, **kw):
        if "/postings/bucket=2" in path:
            # fail the FIRST attempt only
            if state["writes"] == 0:
                state["writes"] += 1
                raise _Boom("simulated crash mid-bucket")
        return orig(self, path, **kw)

    DataFrameWriter.parquet = failing
    try:
        with pytest.raises(_Boom):
            resumable_build(spark, small_df, dir_b, n_buckets=4, range_bits=9)
    finally:
        DataFrameWriter.parquet = orig

    # manifest shows partial progress: buckets 0,1 done; 2+, docmap,
    # pack not reached (buckets run first — they carry the tokenize)
    with open(f"{dir_b}/manifest.json") as f:
        m = json.load(f)
    assert m["stages"]["bucket_0"]["done"]
    assert m["stages"]["bucket_1"]["done"]
    assert "bucket_2" not in m["stages"]
    assert "docmap" not in m["stages"]
    assert "pack" not in m["stages"]

    # restart completes the remaining work only
    m2 = resumable_build(spark, small_df, dir_b, n_buckets=4, range_bits=9)
    assert m2["stages"]["pack"]["done"]

    # byte-identical index content
    assert _index_content(spark, dir_a) == _index_content(spark, dir_b)

    # identical query results, also vs oracle
    oidx = oracle.build_index(small_rows)
    pa, pb = PackedIndex(spark, dir_a), PackedIndex(spark, dir_b)
    for q in ["machine learning", "research", "spark index"]:
        ra = [tuple(r) for r in bm25_topk_packed(spark, pa, q, k=10).collect()]
        rb = [tuple(r) for r in bm25_topk_packed(spark, pb, q, k=10).collect()]
        assert ra == rb
        assert ra == [tuple(x) for x in oracle.search(oidx, q, k=10)]


def test_manifest_metrics_present(spark, dirs):
    dir_a, _ = dirs
    with open(f"{dir_a}/manifest.json") as f:
        m = json.load(f)
    assert m["stages"]["docmap"]["docs_per_sec"] is not None
    for b in range(4):
        st = m["stages"][f"bucket_{b}"]
        assert st["postings_per_sec"] is not None
        assert st["bytes"] > 0
    pack = m["stages"]["pack"]
    assert pack["payload_bytes"] > 0
    assert 0 < pack["bytes_per_posting"] < 64
    assert m["lineage"]["spark_version"]
