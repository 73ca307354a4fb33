"""Hybrid retrieval: fuse ranked candidate lists from heterogeneous
retrievers (lexical BM25, vector cosine, ...) into one ranking.

The reference engine blends hand-picked score ingredients for a single
retriever family (search.py:73-112 — tf-idf + cosine + positions); a
modern hybrid stack instead runs SEPARATE retrievers and fuses their
bounded top-N lists.  Two industry-standard fusers:

* **Reciprocal-rank fusion** (Cormack, Clarke & Buettcher, SIGIR'09):
  ``rrf(d) = sum_legs 1 / (k + rank_leg(d))`` — rank-only, scale-free,
  no score calibration needed.  ``k`` dampens the head (60 is the
  published default).
* **Min-max linear fusion**: per-leg min-max normalisation to [0,1],
  then a weighted sum (the convex-combination fusion of
  Elasticsearch/Vespa hybrid queries).  Missing docs contribute 0.

Scale contract (the 100 TB argument): fusion inputs are **top-N
candidate lists**, bounded at N rows per (query, leg) by the upstream
retriever (BM25 top-k is TakeOrderedAndProject; ANN top-k likewise).
Everything here is therefore O(N_legs * N) per query — the windows and
outer joins below never see unbounded data.  For fused multi-query
batches every window/join is keyed by ``query_col`` so the shuffle is
by query id, not global.

Cross-engine determinism: ranks are assigned over (rounded score DESC,
id ASC) so rank boundaries agree with a DuckDB oracle; the RRF terms
``1/(k+rank)`` are exact IEEE divisions of small integers summed in a
fixed leg order.
"""

from __future__ import annotations

from functools import reduce

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def _rank_window(score_col: str, id_col: str, query_col: str | None):
    order = [F.desc(score_col), F.asc(id_col)]
    if query_col is not None:
        return Window.partitionBy(query_col).orderBy(*order)
    # Single-query candidate list: bounded at top-N rows by contract,
    # so the single-partition sort is over <= N rows, not the corpus.
    return Window.orderBy(*order)


def add_rank(
    df: DataFrame,
    score_col: str,
    id_col: str,
    query_col: str | None = None,
    rank_col: str = "rank",
) -> DataFrame:
    """Dense 1-based position by (score DESC, id ASC) [per query].

    Pass the ROUNDED score column so the rank boundary is deterministic
    cross-engine (see module docstring).
    """
    w = _rank_window(score_col, id_col, query_col)
    return df.withColumn(rank_col, F.row_number().over(w))


def _outer_merge(
    legs: list[DataFrame], id_col: str, query_col: str | None
) -> DataFrame:
    keys = [id_col] if query_col is None else [query_col, id_col]
    return reduce(lambda a, b: a.join(b, keys, "full_outer"), legs)


def rrf_fuse(
    legs: list[DataFrame],
    id_col: str,
    k: int = 60,
    query_col: str | None = None,
    rank_col: str = "rank",
    out_col: str = "rrf",
) -> DataFrame:
    """Reciprocal-rank fusion of ranked candidate lists.

    Each leg must carry ``id_col`` (+ ``query_col``) and ``rank_col``
    (from :func:`add_rank`).  Docs absent from a leg contribute 0.
    Returns one row per id with the fused ``out_col`` score; the caller
    orders/limits (keep ordering on a ROUNDED copy for gate parity).
    """
    if not legs:
        raise ValueError("rrf_fuse needs at least one leg")
    tagged = [
        leg.select(
            *( [query_col] if query_col else [] ),
            id_col,
            F.col(rank_col).alias(f"__r{i}"),
        )
        for i, leg in enumerate(legs)
    ]
    merged = _outer_merge(tagged, id_col, query_col)
    # Fixed leg order => fixed summation order => bit-stable doubles.
    terms = [
        F.coalesce(
            F.lit(1.0) / (F.lit(float(k)) + F.col(f"__r{i}").cast("double")),
            F.lit(0.0),
        )
        for i in range(len(tagged))
    ]
    rrf = reduce(lambda a, b: a + b, terms)
    keep = ([query_col] if query_col else []) + [id_col]
    return merged.select(*keep, rrf.alias(out_col))


def minmax_normalize(
    df: DataFrame,
    score_col: str,
    query_col: str | None = None,
    out_col: str = "norm",
) -> DataFrame:
    """Min-max normalise a bounded candidate list to [0, 1].

    Degenerate span (max == min, e.g. a single candidate) maps to 1.0 —
    the doc IS the best the leg found.  Window is per-query when
    ``query_col`` is given; otherwise a single partition over the
    bounded top-N list.
    """
    w = (
        Window.partitionBy(query_col)
        if query_col is not None
        else Window.partitionBy()
    )
    mn = F.min(score_col).over(w)
    mx = F.max(score_col).over(w)
    norm = F.when(mx == mn, F.lit(1.0)).otherwise(
        (F.col(score_col) - mn) / (mx - mn)
    )
    return df.withColumn(out_col, norm)


def linear_fuse(
    legs: list[DataFrame],
    weights: list[float],
    id_col: str,
    score_cols: list[str] | None = None,
    query_col: str | None = None,
    out_col: str = "fused",
) -> DataFrame:
    """Weighted sum of min-max-normalised leg scores (missing -> 0).

    ``score_cols[i]`` names leg i's (rounded) score column; defaults to
    ``"score"`` for every leg.  Weights are applied in leg order, so
    the floating-point sum order is fixed.
    """
    if len(weights) != len(legs):
        raise ValueError("one weight per leg")
    score_cols = score_cols or ["score"] * len(legs)
    tagged = []
    for i, (leg, sc) in enumerate(zip(legs, score_cols)):
        normed = minmax_normalize(leg, sc, query_col, out_col=f"__n{i}")
        tagged.append(
            normed.select(
                *( [query_col] if query_col else [] ), id_col, f"__n{i}"
            )
        )
    merged = _outer_merge(tagged, id_col, query_col)
    terms = [
        F.coalesce(F.col(f"__n{i}") * F.lit(float(wt)), F.lit(0.0))
        for i, wt in enumerate(weights)
    ]
    fused = reduce(lambda a, b: a + b, terms)
    keep = ([query_col] if query_col else []) + [id_col]
    return merged.select(*keep, fused.alias(out_col))


# ------------------------------------------------------- retriever trees
#
# The ES retriever API (8.14+): a search is a TREE of retrievers —
# leaves produce candidate lists (standard/BM25, knn, ...), inner nodes
# fuse their children (rrf, linear), each child bounded to its
# rank_window_size before fusion.  Here a leaf is ANY bounded
# (id, score) DataFrame — the engine's bm25_topk_* / cosine_topk_* /
# lmd_topk outputs all qualify — so the tree composes every retriever
# in the repo without this module knowing about indexes.
#
# Cross-engine determinism: fused scores are rounded (round_digits)
# BEFORE any rank is assigned over them, so nested rank boundaries
# agree with the DuckDB oracle (the module-wide rounded-rank-key
# convention).


class Retriever:
    """Marker base for retriever-tree nodes."""


class Leg(Retriever):
    """Leaf: a bounded (id, score) candidate frame from any retriever."""

    def __init__(self, df: DataFrame, score_col: str = "score"):
        self.df = df
        self.score_col = score_col


class RrfRetriever(Retriever):
    def __init__(self, retrievers: list[Retriever],
                 rank_constant: int = 60, rank_window_size: int = 100):
        self.retrievers = retrievers
        self.rank_constant = rank_constant
        self.rank_window_size = rank_window_size


class LinearRetriever(Retriever):
    def __init__(self, retrievers: list[Retriever], weights: list[float],
                 rank_window_size: int = 100):
        if len(weights) != len(retrievers):
            raise ValueError("one weight per child retriever")
        self.retrievers = retrievers
        self.weights = weights
        self.rank_window_size = rank_window_size


def _eval_node(
    node: Retriever, id_col: str, round_digits: int
) -> tuple[DataFrame, str]:
    if isinstance(node, Leg):
        return node.df, node.score_col
    if not isinstance(node, (RrfRetriever, LinearRetriever)):
        raise TypeError(f"not a Retriever node: {node!r}")
    bounded = []
    score_cols = []
    for child in node.retrievers:
        df, sc = _eval_node(child, id_col, round_digits)
        ranked = add_rank(df, sc, id_col)
        bounded.append(
            ranked.filter(F.col("rank") <= node.rank_window_size)
        )
        score_cols.append(sc)
    if isinstance(node, RrfRetriever):
        fused = rrf_fuse(bounded, id_col, k=node.rank_constant)
        out_col = "rrf"
    else:
        fused = linear_fuse(
            bounded, node.weights, id_col, score_cols=score_cols
        )
        out_col = "fused"
    rounded = fused.select(
        id_col, F.round(out_col, round_digits).alias("score")
    )
    return rounded, "score"


def retriever_topk(
    node: Retriever,
    k: int,
    id_col: str = "doc_id",
    round_digits: int = 9,
) -> DataFrame:
    """Evaluate a retriever tree → top-k (id, score), score = the root
    fusion value rounded to ``round_digits`` (ties break id ASC).
    Every fusion input is bounded by its node's rank_window_size, so
    the whole tree is O(Σ windows) rows after the leaves — the leaves
    themselves are top-N retriever outputs (TakeOrderedAndProject /
    ANN shortlists), never corpus-sized."""
    df, sc = _eval_node(node, id_col, round_digits)
    return (
        df.orderBy(F.desc(sc), F.asc(id_col))
        .limit(k)
        .withColumnRenamed(sc, "score")
    )
