"""MaxSim late interaction (operators/multivector): python-reference
parity, the multi-facet property single-vector cosine cannot express,
and the rerank plan shape."""

import numpy as np
import pyspark.sql.functions as F
import pytest

from ics_search_engine_spark.operators.multivector import (
    maxsim_rerank,
    split_embedding,
)


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).cache()


def _py_maxsim(doc_tokens, qvecs):
    return sum(
        max(float(np.dot(q, d)) for d in doc_tokens) for q in qvecs
    )


def test_matches_python_reference(emb, spark):
    docs = split_embedding(emb, n_tokens=4)
    qrow = emb.filter("vec_id = 3").first()["embedding"]
    qvecs = [[float(x) for x in qrow[i * 16:(i + 1) * 16]] for i in range(4)]
    got = {
        r["vec_id"]: r["maxsim"]
        for r in maxsim_rerank(docs, qvecs, k=15).collect()
    }
    rows = docs.select("vec_id", "token_vecs").collect()
    want = sorted(
        (
            (_py_maxsim([np.array(t, dtype=np.float64) for t in r["token_vecs"]],
                        [np.array(q) for q in qvecs]), r["vec_id"])
            for r in rows
        ),
        key=lambda x: (-x[0], x[1]),
    )[:15]
    assert set(got) == {v for _, v in want}
    for s, v in want:
        assert got[v] == pytest.approx(s, rel=1e-9)


def test_multifacet_beats_single_vector(spark):
    # doc A matches facet 1 in token 1 and facet 2 in token 2; doc B
    # matches facet 1 twice and facet 2 not at all.  MaxSim ranks A
    # first; a single pooled vector cannot see the distinction.
    f1, f2 = [1.0, 0.0], [0.0, 1.0]
    rows = [
        (1, [[1.0, 0.0], [0.0, 1.0]]),      # A: one token per facet
        (2, [[1.0, 0.0], [1.0, 0.0]]),      # B: facet-1 only
    ]
    docs = spark.createDataFrame(
        rows, "vec_id: int, token_vecs: array<array<float>>"
    )
    out = [r["vec_id"] for r in maxsim_rerank(docs, [f1, f2], k=2).collect()]
    assert out == [1, 2]


def test_empty_query_scores_zero(spark):
    docs = spark.createDataFrame(
        [(1, [[1.0, 2.0]])], "vec_id: int, token_vecs: array<array<float>>"
    )
    rows = maxsim_rerank(docs, [], k=5).collect()
    assert rows[0]["maxsim"] == 0.0


def test_split_embedding_validates(emb):
    with pytest.raises(ValueError, match="divisible"):
        split_embedding(emb, n_tokens=7)


def test_rerank_is_take_ordered(emb):
    docs = split_embedding(emb, n_tokens=4)
    plan = maxsim_rerank(docs, [[0.1] * 16], k=5)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
