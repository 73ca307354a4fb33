"""Single-node reference engine (the correctness oracle, SURVEY.md §5.1).

The reference repo implements a TF-IDF blend, not BM25
(/root/reference/search.py:183-190; BM25 explicitly unimplemented per
/root/reference/todo.md:30-31), and cannot score transcripts.  Per
BASELINE.json, rank-identity is defined against THIS oracle: exhaustive
scoring, pure Python/numpy, sharing the exact tokenizer/stemmer module
with the Spark engine.

BM25 specification (frozen)
---------------------------
    k1 = 1.2, b = 0.75
    idf(t)  = ln( (N - df + 0.5) / (df + 0.5) + 1 )        # Lucene form,
                                                           # always > 0
    tfn(t,d)= tf * (k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
    score(q,d) = sum over unique stemmed query terms t, in ASCENDING
                 TERM ORDER, of  qtf(t) * idf(t) * tfn(t,d)

* tf counts stemmed index-mode tokens (stop words INDEXED, dropped only
  from the query — reference asymmetry, /root/reference/utils/
  tokenizer.py:28-31).
* dl = len(index-mode tokens) — the analog of Document.token_count
  (/root/reference/components/document_processor.py:69).
* qtf = multiplicity of the stemmed term in the tokenized query.
* The per-doc sum is accumulated in ascending unique-term order so the
  float result is bit-reproducible; the Spark engine folds a sorted
  term list the same way (SURVEY.md §7 "rank-identical floating-point
  scores").
* Tie-break: score DESC, then (conv_id, turn_idx) ASC.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

from ics_search_engine_spark.textproc.tokenizer import tokenize

K1 = 1.2
B = 0.75


@dataclass
class OracleIndex:
    # term -> {docid -> tf}; docid = (conv_id, turn_idx)
    postings: dict[str, dict[tuple[str, int], int]] = field(default_factory=dict)
    # term -> {docid -> sorted positions}
    positions: dict[str, dict[tuple[str, int], list[int]]] = field(default_factory=dict)
    dl: dict[tuple[str, int], int] = field(default_factory=dict)

    @property
    def n_docs(self) -> int:
        return len(self.dl)

    @property
    def avgdl(self) -> float:
        return sum(self.dl.values()) / len(self.dl) if self.dl else 0.0

    def df(self, term: str) -> int:
        return len(self.postings.get(term, ()))


def build_index(rows: list[tuple[str, int, str]]) -> OracleIndex:
    """rows: (conv_id, turn_idx, text).  Index-mode tokenization
    (stemmed, stop words kept, len-1 dropped)."""
    idx = OracleIndex()
    for conv_id, turn_idx, text in rows:
        docid = (conv_id, turn_idx)
        tokens = tokenize(text, for_query=False)
        idx.dl[docid] = len(tokens)
        for pos, t in enumerate(tokens):
            idx.postings.setdefault(t, {}).setdefault(docid, 0)
            idx.postings[t][docid] += 1
            idx.positions.setdefault(t, {}).setdefault(docid, []).append(pos)
    return idx


def idf(n_docs: int, df: int) -> float:
    return math.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)


def bm25_contribution(tf: int, dl: int, avgdl: float, n_docs: int, df: int,
                      qtf: int) -> float:
    tfn = tf * (K1 + 1.0) / (tf + K1 * (1.0 - B + B * dl / avgdl))
    return qtf * idf(n_docs, df) * tfn


def search(idx: OracleIndex, query: str, k: int = 10
           ) -> list[tuple[str, int, float]]:
    """Exhaustive BM25 top-k → [(conv_id, turn_idx, score)] with the
    frozen tie-break (score desc, docid asc)."""
    q_tokens = tokenize(query, for_query=True)
    if not q_tokens:
        return []
    qtf: dict[str, int] = {}
    for t in q_tokens:
        qtf[t] = qtf.get(t, 0) + 1

    n = idx.n_docs
    avgdl = idx.avgdl
    scores: dict[tuple[str, int], float] = {}
    # ascending unique-term order -> deterministic float accumulation
    for term in sorted(qtf):
        plist = idx.postings.get(term)
        if not plist:
            continue  # absent-term path, /root/reference/search.py:56-57
        d_f = len(plist)
        for docid, tf in plist.items():
            c = bm25_contribution(tf, idx.dl[docid], avgdl, n, d_f, qtf[term])
            scores[docid] = scores.get(docid, 0.0) + c

    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
    return [(cid, tidx, s) for (cid, tidx), s in ranked[:k]]


def search_all_queries(idx: OracleIndex, queries: dict[str, str], k: int = 10
                       ) -> dict[str, list[tuple[str, int, float]]]:
    return {qid: search(idx, qtext, k) for qid, qtext in queries.items()}
