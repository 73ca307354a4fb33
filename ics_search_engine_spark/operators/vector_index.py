"""Persisted vector-index artifact: the vector family's analog of the
packed text index — build once with Spark, serve anywhere.

Layout under ``out_dir``:
    vectors.parquet   (id, embedding[, ivf_cell][, pq_codes]) —
                      ivf_cell is also the physical partition column
                      when cells are enabled (directory pruning)
    cents.npy         coarse IVF centroids        (when n_cells > 0)
    codebooks.npy     PQ subspace codebooks       (when m > 0)
    meta.json         {dim, n_cells, m, k_cents, seed, n_vectors,
                       id_col, vec_col}

Everything derives from the existing fit/encode operators
(operators/similarity: capped Lloyd fit, broadcast pandas encoder), so
a 10^12-row build shapes exactly like the IVF/PQ paths already
audited; the artifact adds only deterministic persistence.  The
serving half is serving.LocalVectorServer — pyarrow + numpy, no Spark
at query time, the LocalIndexServer posture for vectors.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ics_search_engine_spark.operators.similarity import (
    ivf_centroids,
    pq_encode,
    pq_fit,
    quantize_binary,
    quantize_int8,
    with_ivf_cells,
)


def build_vector_index(
    spark: SparkSession,
    emb: DataFrame,
    out_dir: str,
    n_cells: int = 0,
    m: int = 0,
    k_cents: int = 256,
    iters: int = 3,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    int8: bool = False,
    binary: bool = False,
) -> dict:
    """Fit (optional) coarse cells and PQ codebooks, encode, persist.
    ``n_cells=0`` skips IVF (single partition, brute/ADC scans);
    ``m=0`` skips PQ (exact vectors only); ``int8=True`` additionally
    persists the scalar-quantized tier (q_scale + q_codes, 1 byte/dim
    — similarity.quantize_int8), the middle ground between raw floats
    and PQ codes; ``binary=True`` persists the 1-bit sign-packed tier
    (b_codes — similarity.quantize_binary, 32× compression).
    Returns the meta dict."""
    first = emb.select(vec_col).first()
    if first is None:
        raise ValueError("cannot build a vector index on an empty table")
    dim = len(first[0])
    os.makedirs(out_dir, exist_ok=True)
    out = emb
    if n_cells > 0:
        cents = ivf_centroids(
            emb, n_cells=n_cells, iters=iters, seed=seed, vec_col=vec_col
        )
        np.save(os.path.join(out_dir, "cents.npy"), cents)
        out = with_ivf_cells(out, cents, vec_col=vec_col)
    books = None
    if m > 0:
        books = pq_fit(
            emb, m=m, k_cents=k_cents, iters=iters, seed=seed,
            vec_col=vec_col,
        )
        np.save(os.path.join(out_dir, "codebooks.npy"), books)
        out = pq_encode(out, books, vec_col=vec_col)
    if int8:
        out = quantize_int8(out, vec_col=vec_col)
    if binary:
        out = quantize_binary(out, vec_col=vec_col)
    writer = out.write.mode("overwrite")
    if n_cells > 0:
        writer = writer.partitionBy("ivf_cell")
    writer.parquet(os.path.join(out_dir, "vectors.parquet"))
    meta = {
        "dim": dim,
        "n_cells": int(n_cells),
        "m": int(m),
        "k_cents": int(k_cents) if m > 0 else 0,
        "seed": int(seed),
        "n_vectors": emb.count(),
        "id_col": id_col,
        "vec_col": vec_col,
        "int8": bool(int8),
        "binary": bool(binary),
    }
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump(meta, f)
    return meta


class VectorIndex:
    """Spark-side handle on a persisted vector index: the vectors
    frame (with whatever cell/code columns the build enabled) plus the
    fitted models — feeds cosine_topk_*/pq_topk_*/ivfadc_topk
    directly."""

    def __init__(self, spark: SparkSession, path: str):
        with open(os.path.join(path, "meta.json")) as f:
            self.meta = json.load(f)
        self.vectors = spark.read.parquet(
            os.path.join(path, "vectors.parquet")
        )
        self.cents = None
        self.codebooks = None
        cents_p = os.path.join(path, "cents.npy")
        if os.path.exists(cents_p):
            self.cents = np.load(cents_p)
        books_p = os.path.join(path, "codebooks.npy")
        if os.path.exists(books_p):
            self.codebooks = np.load(books_p)

    def probe_cells(self, qvec: list[float], n_probe: int) -> list[int]:
        """The n_probe nearest coarse cells for a query (empty list ⇒
        no IVF in this index)."""
        if self.cents is None:
            return []
        q = np.asarray(qvec, dtype=np.float64)
        d2 = ((self.cents - q[None, :]) ** 2).sum(axis=1)
        return [int(c) for c in np.argsort(d2)[:n_probe]]

    def candidates(self, qvec: list[float], n_probe: int) -> DataFrame:
        """Partition-pruned candidate frame (everything when no IVF)."""
        if self.cents is None:
            return self.vectors
        probe = self.probe_cells(qvec, n_probe)
        return self.vectors.filter(F.col("ivf_cell").isin(probe))
