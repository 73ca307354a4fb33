"""Multi-vector (late-interaction) scoring: ColBERT-style MaxSim.

A document is a BAG of token vectors (``array<array<float>>``), a
query likewise; relevance = Σ over query tokens of the best-matching
document token: ``score(q, d) = Σᵢ maxⱼ qᵢ·dⱼ`` (Khattab & Zaharia,
ColBERT, SIGIR 2020 — public design; also ES ``rank_vectors`` /
``maxSimDotProduct``).  The shape that single-vector cosine cannot
express: a long document matches a multi-facet query on DIFFERENT
regions per facet.

Scale posture: MaxSim over the whole corpus is O(N·|d|·|q|·dim) — a
RERANK operator by design, run over a shortlist from a cheaper tier
(BM25, single-vector ANN, binary codes).  Everything here is pure
Catalyst (transform/aggregate/array_max over nested arrays, query
vectors inlined as literals — query token counts are small by
construction), so the rerank stays in whole-stage codegen over the
broadcast-joined shortlist, exactly like cosine_topk_int8_rerank.

No token-embedding model exists in this sandbox; ``split_embedding``
derives a deterministic multi-vector column by slicing the existing
embedding into equal sub-vectors — the plumbing (schema, scoring,
plan shape) is the real thing, the embeddings are the stand-in (same
discipline as sources/multimodal's fake decoder).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def split_embedding(
    emb: DataFrame,
    n_tokens: int,
    vec_col: str = "embedding",
    out_col: str = "token_vecs",
) -> DataFrame:
    """Reshape a d-dim vector into ``n_tokens`` contiguous slices of
    d/n_tokens (requires divisibility) — a deterministic stand-in for
    a real per-token embedding column."""
    first = emb.select(vec_col).first()
    if first is None:
        raise ValueError("empty table")
    dim = len(first[0])
    if dim % n_tokens != 0:
        raise ValueError(f"dim {dim} not divisible by n_tokens={n_tokens}")
    sub = dim // n_tokens
    slices = [
        F.slice(F.col(vec_col), i * sub + 1, sub) for i in range(n_tokens)
    ]
    return emb.withColumn(out_col, F.array(*slices))


def _dot_lit(vec: Column, q: list[float]) -> Column:
    qcol = F.array(*[F.lit(float(x)) for x in q])
    return F.aggregate(
        F.zip_with(vec, qcol, lambda a, b: a.cast("double") * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def maxsim_score(vecs_col: Column, qvecs: list[list[float]]) -> Column:
    """``Σᵢ maxⱼ qᵢ·dⱼ`` as one column expression (query vectors are
    literals; the per-token max is array_max over a transform)."""
    if not qvecs:
        return F.lit(0.0)
    terms = [
        F.array_max(F.transform(vecs_col, lambda d: _dot_lit(d, q)))
        for q in qvecs
    ]
    acc = terms[0]
    for t in terms[1:]:
        acc = acc + t
    return acc


def maxsim_rerank(
    candidates: DataFrame,
    qvecs: list[list[float]],
    k: int = 10,
    id_col: str = "vec_id",
    vecs_col: str = "token_vecs",
) -> DataFrame:
    """Late-interaction rerank of a candidate frame → (id, maxsim)
    desc, id asc — TakeOrderedAndProject over one scan of the
    candidates (which should BE a shortlist; see module docstring)."""
    return (
        candidates.select(
            F.col(id_col), maxsim_score(F.col(vecs_col), qvecs).alias("maxsim")
        )
        .orderBy(F.desc("maxsim"), F.asc(id_col))
        .limit(k)
    )
