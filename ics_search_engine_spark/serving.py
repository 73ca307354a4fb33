"""In-process serving over a distributed-built packed index.

The reference's architecture is build-offline / serve-in-process: the
indexer writes pickle + seek map, and SearchEngine answers queries from
one process with an open file handle and an LRU cache
(/root/reference/search.py:26-81, main.py:34-45).  This module is that
serving tier for OUR index: Spark builds the packed index at cluster
scale (operators/build.py), then a query server — one process, no JVM
— memory-maps the SAME parquet artifacts and answers top-k BM25 with
the SAME codec and the SAME float semantics.  Results are bit-identical
to the Spark query paths and the oracle (tested).

Scale story: a 10^12-turn index does not fit one server, but one TERM
SHARD of it does — this class is the per-shard serving node; a
scatter-gather router over term-hash shards is the standard layer
above (each node loads `index` files whose term-hash range it owns).
In-sandbox it doubles as the low-latency path the bench reports
alongside the distributed-query numbers.

Scoring here is exhaustive over the matched terms' shards (decode is
numpy-vectorized; single-digit-ms at serving-shard sizes).  The
per-shard max_tfn metadata is loaded and available for a MaxScore-
style skip if a deployment needs it; it is left off by default so the
accumulation order — and therefore every float bit — matches the
oracle and the Spark paths unconditionally.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow.parquet as pq

from oracle.bm25 import K1, B
from ics_search_engine_spark.functions.codec import unpack_postings
from ics_search_engine_spark.operators.query import query_weights
from ics_search_engine_spark.textproc.tokenizer import tokenize


class LocalIndexServer:
    """Serve top-k BM25 from a packed index directory, no Spark."""

    def __init__(self, path: str):
        self.path = path
        with open(os.path.join(path, "stats.json")) as f:
            self.stats = json.load(f)
        idx = pq.read_table(
            f"{path}/index", columns=["term", "shard_id", "max_tfn", "payload"]
        )
        terms = idx.column("term").to_pylist()
        shards = idx.column("shard_id").to_numpy()
        maxes = idx.column("max_tfn").to_numpy()
        payloads = idx.column("payload").to_pylist()
        self.postings: dict[str, list[tuple[int, float, bytes]]] = {}
        for t, s, m, p in zip(terms, shards, maxes, payloads):
            self.postings.setdefault(t, []).append((int(s), float(m), p))
        ts = pq.read_table(f"{path}/term_stats")
        self.df = dict(
            zip(ts.column("term").to_pylist(), ts.column("df").to_numpy())
        )
        dm = pq.read_table(
            f"{path}/docmap", columns=["doc_ord", "conv_id", "turn_idx"]
        )
        order = np.argsort(dm.column("doc_ord").to_numpy(), kind="stable")
        self._conv = np.asarray(dm.column("conv_id").to_pylist(), dtype=object)[order]
        self._turn = dm.column("turn_idx").to_numpy()[order]

    @property
    def n_docs(self) -> int:
        return self.stats["n_docs"]

    def search(self, query: str, k: int = 10
               ) -> list[tuple[str, int, float]]:
        """Top-k → [(conv_id, turn_idx, score)], bit-identical to the
        Spark paths and oracle.search (same weights, same tfn order,
        same ascending-term accumulation, same tie-break)."""
        do_stem = self.stats.get("stem", True)
        q_terms = sorted(set(tokenize(query, for_query=True, do_stem=do_stem)))
        if not q_terms:
            return []
        term_df = {t: int(self.df[t]) for t in q_terms if t in self.df}
        weights = query_weights(query, term_df, self.n_docs, do_stem=do_stem)
        if not weights:
            return []
        avgdl = self.stats["avgdl"]

        scores = np.zeros(self.n_docs, dtype=np.float64)
        touched = np.zeros(self.n_docs, dtype=bool)
        # CRITICAL for bit-identity: accumulate in ascending term order
        # (the skip decision below never changes addition order, only
        # skips shards that cannot affect the top-k)
        for t in sorted(weights):
            w = weights[t]
            for _shard, _maxtfn, payload in self.postings.get(t, ()):
                d, tf, dl, _ = unpack_postings(
                    bytes(payload), with_positions=False
                )
                idx = d.astype(np.int64)
                tfd = tf.astype(np.float64)
                dld = dl.astype(np.float64)
                tfn = tfd * (K1 + 1.0) / (
                    tfd + K1 * ((1.0 - B) + (B * dld) / avgdl)
                )
                scores[idx] += w * tfn
                touched[idx] = True
        ti = np.flatnonzero(touched)
        if ti.size == 0:
            return []
        order = np.lexsort((ti, -scores[ti]))[:k]
        sel = ti[order]
        return [
            (str(self._conv[i]), int(self._turn[i]), float(scores[i]))
            for i in sel
        ]
