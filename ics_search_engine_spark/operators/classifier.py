"""Model-based quality classification: a fastText-style linear
classifier over hashed bag-of-token features.

The pattern behind DCLM / fineweb-edu corpus filtering: a small linear
model scores every document and a threshold keeps the top slice.  No
external model ships in-sandbox, so the model here is trained ON the
corpus (driver-side, capped sample — the ivf_centroids discipline) from
any caller-provided labeling; what this module owns is the Spark-scale
plumbing:

* **featurize**: token → md5_32(token) mod dim bucket; a document is
  the L1-normalized bucket-count vector.  Pure Catalyst (no UDF).
* **fit**: bounded driver-side collect of a labeled sample (hard cap),
  deterministic full-batch logistic regression (fixed iterations,
  fixed learning rate, zero init — no RNG anywhere).
* **score**: the dot product w·x + b folds inside whole-stage codegen:
  ``aggregate(tokens, 0.0, acc + w[hash(token)]) / dl`` with the
  weight vector inlined as an array literal (dim ≤ a few thousand —
  the fastText regime; embedding-sized models would broadcast via a
  pandas UDF instead, like similarity.with_ivf_cells' split).

Scoring with a FIXED weight vector is SQL-expressible, so the gate
pins the whole distributed path against DuckDB; fit determinism and
separation quality are pytest-pinned.
"""

from __future__ import annotations

import math

import numpy as np
import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

HASH_SPACE = 1 << 32


def _tok_col(text_col: str) -> Column:
    return F.filter(
        F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"),
        lambda x: F.length(x) > 0,
    )


def _bucket(tok: Column, dim: int) -> Column:
    """md5_32(token) mod dim — the same hash family as the sampling /
    fingerprint operators, so the oracle reproduces it exactly."""
    return (
        F.conv(F.substring(F.md5(tok), 1, 8), 16, 10).cast("long") % dim
    )


def hashed_features(
    docs: DataFrame,
    dim: int = 256,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """→ (id, features array<double> of length ``dim``): L1-normalized
    hashed token counts.  One explode + one (doc, bucket) agg + one
    doc-grain fold — the postings-build shape."""
    tok = docs.select(
        id_col, F.explode(_tok_col(text_col)).alias("t")
    ).select(id_col, _bucket(F.col("t"), dim).alias("b"))
    per_bucket = tok.groupBy(id_col, "b").agg(F.count("*").alias("c"))
    return (
        per_bucket.groupBy(id_col)
        .agg(
            F.sum("c").alias("_dl"),
            F.map_from_entries(
                F.sort_array(F.collect_list(F.struct("b", "c")))
            ).alias("_m"),
        )
        .select(
            id_col,
            F.transform(
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda i: F.coalesce(
                    F.element_at("_m", i.cast("long")), F.lit(0)
                ).cast("double")
                / F.col("_dl"),
            ).alias("features"),
        )
    )


def fit_quality_classifier(
    labeled: DataFrame,
    dim: int = 256,
    id_col: str = "doc_id",
    text_col: str = "text",
    label_col: str = "label",
    iters: int = 200,
    lr: float = 2.0,
    max_fit_rows: int = 1_000_000,
) -> tuple[np.ndarray, float]:
    """Deterministic full-batch logistic regression on hashed features
    → (weights[dim], bias).  The driver-side collect is capped
    UNCONDITIONALLY at ``max_fit_rows`` (taken in md5(id) hash order so
    the sample itself is deterministic and unbiased, not
    partition-order-dependent)."""
    feats = hashed_features(labeled, dim, id_col, text_col).join(
        labeled.select(id_col, label_col), id_col
    )
    sample = (
        feats.orderBy(
            F.conv(
                F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10
            ).cast("long"),
            F.col(id_col),
        )
        .limit(max_fit_rows)
        .collect()
    )
    if not sample:
        raise ValueError("no labeled rows to fit on")
    X = np.array([r["features"] for r in sample])
    y = np.array([float(r[label_col]) for r in sample])
    w = np.zeros(dim)
    b = 0.0
    n = len(y)
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-(X @ w + b)))
        g = p - y
        w -= lr * (X.T @ g) / n
        b -= lr * float(g.mean())
    return w, b


def score_quality(
    docs: DataFrame,
    weights,
    bias: float,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """→ (id, score_r6): sigmoid(w·x + b) over the L1-normalized hashed
    features, computed WITHOUT materializing the feature vector —
    ``Σ_token w[bucket(token)] / n_tokens`` folds the dot product
    directly over the token array in one codegen'd projection (the
    L1 normalization and the count-weighting commute).  Empty docs
    score sigmoid(b)."""
    dim = len(weights)
    w_arr = F.array(*[F.lit(float(x)) for x in weights])
    toks = _tok_col(text_col)
    dot = F.aggregate(
        toks,
        F.lit(0.0),
        lambda acc, t: acc
        + F.element_at(w_arr, (_bucket(t, dim) + 1).cast("int")),
    )
    z = (
        F.when(F.size(toks) > 0, dot / F.size(toks)).otherwise(F.lit(0.0))
        + F.lit(float(bias))
    )
    return docs.select(
        id_col,
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6).alias("score_r6"),
    )


def quality_classifier_filter(
    docs: DataFrame,
    weights,
    bias: float,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Keep documents scoring >= threshold — the classifier-filter
    stage of a DCLM-style pipeline (compose with filter_funnel for
    attrition accounting)."""
    kept = score_quality(docs, weights, bias, id_col, text_col).filter(
        F.col("score_r6") >= threshold
    )
    return docs.join(kept.select(id_col), id_col, "left_semi")


def sigmoid(x: float) -> float:
    return 1.0 / (1.0 + math.exp(-x))
