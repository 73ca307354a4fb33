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

Scoring is exhaustive over the matched terms' shards by default
(decode is numpy-vectorized; single-digit-ms at serving-shard sizes).
``search(..., use_wand=True)`` switches on BLOCK-MAX WAND pruning over
the per-shard max_tfn metadata: shards are doc-range-aligned across
terms (operators/packed_index.py), so every document's full score
lives in one shard — the server scores shards in descending
upper-bound order and SKIPS (never decodes) any shard whose
ub = Σ_t w_t·max_tfn(t, shard) falls strictly below the running k-th
score.  Results are bit-identical to the exhaustive path (tested):
per-doc accumulation still folds terms in ascending order inside the
shard, and a skipped shard provably contains no top-k document
(score(d) ≤ ub < θ).  This is the same pruning geometry the
distributed path uses (operators/wand.py); serving is where it shows
as wall-clock, because no Spark job overhead hides the decode cost.
"""

from __future__ import annotations

import json
import os

import numpy as np

from ics_search_engine_spark.functions.codec import unpack_postings
from oracle.bm25 import idf
from ics_search_engine_spark.operators.packed_index import _tfn as _tfn_kernel
from ics_search_engine_spark.operators.query import query_weights
from ics_search_engine_spark.textproc.tokenizer import tokenize


class _TermDict:
    """Sorted term dictionary for prefix expansion: a binary-searched
    slice instead of a linear vocabulary scan (a fat-tailed corpus has
    millions of distinct terms; scanning them per query is the serving
    analog of the full-scan the parquet StartsWith pushdown avoids)."""

    def __init__(self, df_map: dict[str, int]):
        self.terms = np.array(sorted(df_map), dtype=object)
        self.dfs = np.array(
            [df_map[t] for t in self.terms], dtype=np.int64
        )

    def lengths(self) -> np.ndarray:
        lens = getattr(self, "_lens", None)
        if lens is None:
            lens = self._lens = np.fromiter(
                (len(t) for t in self.terms), dtype=np.int64,
                count=self.terms.size,
            )
        return lens

    def fuzzy(self, probe: str, max_dist: int
              ) -> list[tuple[str, int, int]]:
        """(term, df, dist) within ``max_dist`` of ``probe``.  A length
        band (|len−len(probe)| ≤ max_dist, vectorized) prefilters the
        vocabulary before the per-candidate DP — the in-memory stand-in
        for a Levenshtein automaton / SymSpell deletion index."""
        from ics_search_engine_spark.operators.fuzzy import edit_distance

        band = np.flatnonzero(
            np.abs(self.lengths() - len(probe)) <= max_dist
        )
        out = []
        for i in band:
            t = self.terms[i]
            d = edit_distance(t, probe)
            if d <= max_dist:
                out.append((str(t), int(self.dfs[i]), d))
        return out

    def expand(self, prefix: str, cap: int) -> list[tuple[str, int]]:
        """Terms starting with ``prefix`` as (term, df), capped at the
        (df desc, term asc) heaviest ``cap`` — identical selection to
        operators/wildcard.expand_prefixes."""
        lo = int(np.searchsorted(self.terms, prefix))
        hi = int(np.searchsorted(self.terms, prefix + "\U0010ffff"))
        ts, ds = self.terms[lo:hi], self.dfs[lo:hi]
        if ts.size > cap:
            order = np.lexsort((ts, -ds))[:cap]
            ts, ds = ts[order], ds[order]
        return [(str(t), int(d)) for t, d in zip(ts, ds)]

    def expand_regex(self, pattern: str, cap: int) -> list[tuple[str, int]]:
        """Terms fully matching the anchored regex, capped at the
        (df desc, term asc) heaviest ``cap`` — identical selection to
        operators/wildcard.expand_regexes.  The guaranteed literal
        prefix narrows to a binary-searched slice before the per-term
        fullmatch (the in-memory analog of the StartsWith pushdown)."""
        import re as _re

        from ics_search_engine_spark.operators.wildcard import (
            regex_literal_prefix,
        )

        lp = regex_literal_prefix(pattern)
        lo = int(np.searchsorted(self.terms, lp)) if lp else 0
        hi = (
            int(np.searchsorted(self.terms, lp + "\U0010ffff"))
            if lp else self.terms.size
        )
        rx = _re.compile(f"(?:{pattern})")
        keep = [
            i for i in range(lo, hi) if rx.fullmatch(self.terms[i])
        ]
        ts, ds = self.terms[keep], self.dfs[keep]
        if ts.size > cap:
            order = np.lexsort((ts, -ds))[:cap]
            ts, ds = ts[order], ds[order]
        return [(str(t), int(d)) for t, d in zip(ts, ds)]

    def _reversed(self) -> tuple[np.ndarray, np.ndarray]:
        """(sorted reversed terms, permutation into self.terms) — the
        in-memory analog of the reversed dictionary parquet
        (operators/wildcard.ensure_reversed_dict), built lazily once."""
        rev = getattr(self, "_rev", None)
        if rev is None:
            rts = np.array([t[::-1] for t in self.terms], dtype=object)
            order = np.argsort(rts, kind="stable")
            rev = self._rev = (rts[order], order)
        return rev

    def expand_suffix(self, suffix: str, cap: int) -> list[tuple[str, int]]:
        """Terms ending with ``suffix`` as (term, df) — a binary-
        searched slice of the reversed dictionary, same (df desc,
        term asc) cap as operators/wildcard.expand_suffixes."""
        rts, order = self._reversed()
        probe = suffix[::-1]
        lo = int(np.searchsorted(rts, probe))
        hi = int(np.searchsorted(rts, probe + "\U0010ffff"))
        idxs = order[lo:hi]
        ts, ds = self.terms[idxs], self.dfs[idxs]
        if ts.size > cap:
            keep = np.lexsort((ts, -ds))[:cap]
            ts, ds = ts[keep], ds[keep]
        return [(str(t), int(d)) for t, d in zip(ts, ds)]


class LocalIndexServer:
    """Serve top-k BM25 from a packed index directory, no Spark."""

    def __init__(self, path: str):
        # read_arrow_table is snapshot-aware: plain parquet dirs read
        # directly; Iceberg table dirs resolve the current snapshot's
        # live file list through the metadata layer first (so stale /
        # replaced data files are never misread)
        from ics_search_engine_spark.sources.catalog import read_arrow_table

        self.path = path
        with open(os.path.join(path, "stats.json")) as f:
            self.stats = json.load(f)
        idx = read_arrow_table(
            f"{path}/index", columns=["term", "shard_id", "max_tfn", "payload"]
        )
        terms = idx.column("term").to_pylist()
        shards = idx.column("shard_id").to_numpy()
        maxes = idx.column("max_tfn").to_numpy()
        payloads = idx.column("payload").to_pylist()
        self.postings: dict[str, list[tuple[int, float, bytes]]] = {}
        for t, s, m, p in zip(terms, shards, maxes, payloads):
            self.postings.setdefault(t, []).append((int(s), float(m), p))
        ts = read_arrow_table(f"{path}/term_stats")
        self.df = dict(
            zip(ts.column("term").to_pylist(), ts.column("df").to_numpy())
        )
        dm = read_arrow_table(
            f"{path}/docmap", columns=["doc_ord", "conv_id", "turn_idx"]
        )
        order = np.argsort(dm.column("doc_ord").to_numpy(), kind="stable")
        self._conv = np.asarray(dm.column("conv_id").to_pylist(), dtype=object)[order]
        self._turn = dm.column("turn_idx").to_numpy()[order]

    @property
    def n_docs(self) -> int:
        return self.stats["n_docs"]

    def search(
        self,
        query: str,
        k: int = 10,
        use_wand: bool = False,
        stats: dict | None = None,
        conjunctive: bool = False,
        allowed=None,
        min_match: int | None = None,
    ) -> list[tuple[str, int, float]]:
        """Top-k → [(conv_id, turn_idx, score)], bit-identical to the
        Spark paths and oracle.search (same weights, same tfn order,
        same ascending-term accumulation, same tie-break).

        ``use_wand=True`` enables block-max shard pruning (see module
        docstring) — identical results, fewer decoded payload bytes;
        ``stats`` (if a dict) receives pruning counters.
        ``conjunctive=True``: AND semantics (every query term must
        match; an absent term empties the result) — mirrors the
        distributed bm25_topk_conjunctive / bm25_topk_wand(conjunctive)
        paths (tested identical).
        ``allowed``: filter-query support (the serving form of
        operators/filtered.py — same semantics: stats stay global,
        surviving scores bit-identical): an iterable of (conv_id,
        turn_idx) keys, or a bool numpy mask aligned to doc_ord.
        ``min_match=m``: minimum-should-match — only docs matching
        >= m distinct query terms rank (absent terms cannot count
        toward m but do not empty the result); mirrors
        query.bm25_topk_msm / bm25_topk_wand(min_match) (tested
        identical).  Mutually exclusive with ``conjunctive``."""
        do_stem = self.stats.get("stem", True)
        q_terms = sorted(set(tokenize(query, for_query=True, do_stem=do_stem)))
        if not q_terms:
            return []
        term_df = {t: int(self.df[t]) for t in q_terms if t in self.df}
        weights = query_weights(query, term_df, self.n_docs, do_stem=do_stem)
        require_all = None
        if conjunctive:
            if min_match is not None:
                raise ValueError(
                    "conjunctive and min_match are mutually exclusive"
                )
            if len(weights) < len(q_terms):
                return []
            require_all = len(weights)
        if min_match is not None:
            if min_match <= 1:
                min_match = None  # plain OR
            elif len(weights) < min_match:
                return []
        return self.score_with(
            weights, k, use_wand=use_wand, stats=stats,
            require_all=require_all, min_match=min_match,
            allowed_mask=(
                None if allowed is None else self._allowed_mask(allowed)
            ),
        )

    def search_after(
        self,
        query: str,
        after: tuple[float, str, int],
        k: int = 10,
    ) -> list[tuple[str, int, float]]:
        """Deep pagination: the next k results strictly AFTER the
        cursor ``after = (score, conv_id, turn_idx)`` (the last row of
        the previous page) in (score desc, conv_id asc, turn_idx asc)
        order — the serving form of query.bm25_topk_after (tested
        identical).  Stateless (no scroll context); cursor scores are
        bit-identical across tiers, so a page started on Spark can
        continue here."""
        do_stem = self.stats.get("stem", True)
        q_terms = sorted(set(tokenize(query, for_query=True, do_stem=do_stem)))
        if not q_terms:
            return []
        term_df = {t: int(self.df[t]) for t in q_terms if t in self.df}
        weights = query_weights(query, term_df, self.n_docs, do_stem=do_stem)
        if not weights:
            return []
        return self.score_after_with(weights, after, k)

    def scroll(self, query: str, page_size: int = 10, max_pages=None):
        """ES scroll at the serving tier: generator of full-ranking
        pages, each a list of (conv_id, turn_idx, score) — stateless
        search_after chaining (operators/query.scroll_pages' in-process
        twin; pages are tested identical to the Spark generator)."""
        yield from _scroll_via(self.search, self.search_after,
                               query, page_size, max_pages)

    def score_after_with(
        self,
        weights: dict[str, float],
        after: tuple[float, str, int],
        k: int,
        avgdl: float | None = None,
    ) -> list[tuple[str, int, float]]:
        """search_after with EXTERNALLY supplied weights/avgdl (the
        segmented server passes global-corpus values).  The cursor
        predicate is purely per-doc — (score, conv_id, turn_idx) tuple
        comparison — so each segment can apply it independently and the
        cross-segment merge stays correct."""
        if not weights:
            return []
        if avgdl is None:
            avgdl = self.stats["avgdl"]
        s_after, conv_after, turn_after = after
        scores, touched = self._dense_scores(weights, avgdl)
        ti = np.flatnonzero(touched)
        if ti.size == 0:
            return []
        conv = np.asarray(self._conv)[ti]
        turn = np.asarray(self._turn)[ti]
        sc = scores[ti]
        qualify = (sc < s_after) | (
            (sc == s_after)
            & (
                (conv > conv_after)
                | ((conv == conv_after) & (turn > int(turn_after)))
            )
        )
        ti = ti[qualify]
        if ti.size == 0:
            return []
        order = np.lexsort((ti, -scores[ti]))[:k]
        sel = ti[order]
        return [
            (str(self._conv[i]), int(self._turn[i]), float(scores[i]))
            for i in sel
        ]

    def _allowed_mask(self, allowed) -> np.ndarray:
        """Normalize a filter to a bool mask over doc_ord: accepts a
        ready mask (length n_docs) or an iterable of (conv_id,
        turn_idx) keys (unknown keys are ignored — they cannot rank)."""
        if isinstance(allowed, np.ndarray):
            if allowed.dtype != bool or allowed.shape != (self.n_docs,):
                raise ValueError(
                    f"allowed mask must be bool[{self.n_docs}], got "
                    f"{allowed.dtype}[{allowed.shape}]"
                )
            return allowed
        if not hasattr(self, "_key_to_ord"):
            self._key_to_ord = {
                (str(c), int(t)): i
                for i, (c, t) in enumerate(zip(self._conv, self._turn))
            }
        mask = np.zeros(self.n_docs, dtype=bool)
        for key in allowed:
            i = self._key_to_ord.get((str(key[0]), int(key[1])))
            if i is not None:
                mask[i] = True
        return mask

    def count(
        self,
        query: str,
        conjunctive: bool = False,
        min_match: int | None = None,
        allowed=None,
    ) -> int:
        """ES _count at the serving tier: match-set size, no ranking —
        the in-process twin of operators/facets.count_matches (same
        semantics for conjunctive / min_match / filter; tested
        identical).  One decode pass over the query terms' postings,
        no score emission survives."""
        do_stem = self.stats.get("stem", True)
        q_terms = sorted(set(tokenize(query, for_query=True, do_stem=do_stem)))
        if not q_terms:
            return 0
        present = [t for t in q_terms if t in self.df]
        if conjunctive:
            if min_match is not None:
                raise ValueError(
                    "conjunctive and min_match are mutually exclusive"
                )
            if len(present) < len(q_terms):
                return 0
            require_all, min_match = len(present), None
        else:
            require_all = None
            if min_match is not None and min_match <= 1:
                min_match = None
            if min_match is not None and len(present) < min_match:
                return 0
        weights = {t: 1.0 for t in present}
        if not weights:
            return 0
        _, touched = self._dense_scores(
            weights, self.stats["avgdl"], require_all=require_all,
            min_match=min_match,
        )
        if allowed is not None:
            touched &= self._allowed_mask(allowed)
        return int(touched.sum())

    def score_with(
        self,
        weights: dict[str, float],
        k: int,
        avgdl: float | None = None,
        use_wand: bool = False,
        stats: dict | None = None,
        require_all: int | None = None,
        allowed_mask: np.ndarray | None = None,
        min_match: int | None = None,
    ) -> list[tuple[str, int, float]]:
        """Score with EXTERNALLY supplied weights/avgdl — the segmented
        server passes global-corpus values so per-segment scoring is
        bit-identical to the compacted index's.  ``require_all=n``
        keeps only docs matched by n distinct terms (AND);
        ``min_match=m`` keeps docs matched by >= m (minimum-should-
        match) — mutually exclusive.
        ``allowed_mask``: pre-normalized bool mask over doc_ord."""
        if not weights:
            return []
        if require_all is not None and min_match is not None:
            raise ValueError("require_all and min_match are mutually exclusive")
        if avgdl is None:
            avgdl = self.stats["avgdl"]
        if use_wand:
            return self._search_wand(
                weights, k, stats, avgdl, require_all=require_all,
                allowed_mask=allowed_mask, min_match=min_match,
            )

        scores, touched = self._dense_scores(
            weights, avgdl, require_all, min_match
        )
        if allowed_mask is not None:
            touched &= allowed_mask
        ti = np.flatnonzero(touched)
        if ti.size == 0:
            return []
        order = np.lexsort((ti, -scores[ti]))[:k]
        sel = ti[order]
        return [
            (str(self._conv[i]), int(self._turn[i]), float(scores[i]))
            for i in sel
        ]

    # position-key LRU size (terms): entries are occurrence-sized
    POSKEY_CACHE_TERMS = 256

    # decoded-postings LRU size (terms) — the serving analog of the
    # reference's @lru_cache(1000) on get_postings
    # (/root/reference/search.py:53, utils/constants.py:30); repeat and
    # multi-expansion queries skip the varint re-decode of hot terms
    DECODE_CACHE_TERMS = 1024

    def _decoded(self, term: str) -> list[tuple[np.ndarray, np.ndarray,
                                                np.ndarray]]:
        """Per-payload decoded (doc_ords int64, tf, dl) for one term,
        LRU-cached."""
        import collections

        cache = getattr(self, "_decode_cache", None)
        if cache is None:
            cache = self._decode_cache = collections.OrderedDict()
        hit = cache.get(term)
        if hit is not None:
            cache.move_to_end(term)
            return hit
        out = []
        for _shard, _maxtfn, payload in self.postings.get(term, ()):
            d, tf, dl, _ = unpack_postings(
                bytes(payload), with_positions=False
            )
            out.append((d.astype(np.int64), tf, dl))
        cache[term] = out
        if len(cache) > self.DECODE_CACHE_TERMS:
            cache.popitem(last=False)
        return out

    def _dense_scores(
        self,
        weights: dict[str, float],
        avgdl: float,
        require_all: int | None = None,
        min_match: int | None = None,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Exhaustive dense accumulation → (scores, touched) over
        doc_ord.  CRITICAL for bit-identity: ascending term order."""
        scores = np.zeros(self.n_docs, dtype=np.float64)
        touched = np.zeros(self.n_docs, dtype=bool)
        counts = (
            np.zeros(self.n_docs, dtype=np.int32)
            if (require_all is not None or min_match is not None) else None
        )
        for t in sorted(weights):
            w = weights[t]
            for idx, tf, dl in self._decoded(t):
                scores[idx] += w * self._tfn(tf, dl, avgdl)
                touched[idx] = True
                if counts is not None:
                    counts[idx] += 1
        if counts is not None:
            touched &= (
                counts == require_all
                if require_all is not None
                else counts >= min_match
            )
        return scores, touched

    def _synonym_group_tf(
        self, members: dict[str, list[str]]
    ) -> tuple[dict[str, np.ndarray], dict[str, np.ndarray]]:
        """Per-group dense (summed tf, dl) over this index's doc_ord —
        the SynonymQuery pseudo-term statistics (exact integer sums)."""
        g_tf: dict[str, np.ndarray] = {}
        g_dl: dict[str, np.ndarray] = {}
        for g, ms in members.items():
            tf_sum = np.zeros(self.n_docs, dtype=np.float64)
            dl_arr = np.zeros(self.n_docs, dtype=np.float64)
            for m in ms:
                for idx, tf, dl in self._decoded(m):
                    tf_sum[idx] += tf
                    dl_arr[idx] = dl
            if tf_sum.any():
                g_tf[g], g_dl[g] = tf_sum, dl_arr
        return g_tf, g_dl

    def _score_synonym_groups(
        self,
        g_tf: dict[str, np.ndarray],
        g_dl: dict[str, np.ndarray],
        weights: dict[str, float],
        k: int,
        avgdl: float,
    ) -> list[tuple[str, int, float]]:
        """Score pre-computed group statistics with EXTERNALLY supplied
        weights/avgdl (the segmented server passes global values) —
        ascending group key, the Spark fold's accumulation order."""
        scores = np.zeros(self.n_docs, dtype=np.float64)
        touched = np.zeros(self.n_docs, dtype=bool)
        for g in sorted(weights):
            if g not in g_tf:
                continue
            ti = np.flatnonzero(g_tf[g])
            scores[ti] += weights[g] * self._tfn(
                g_tf[g][ti], g_dl[g][ti], avgdl
            )
            touched[ti] = True
        ti = np.flatnonzero(touched)
        if ti.size == 0:
            return []
        order = np.lexsort((ti, -scores[ti]))[:k]
        sel = ti[order]
        return [
            (str(self._conv[i]), int(self._turn[i]), float(scores[i]))
            for i in sel
        ]

    def search_synonyms(
        self, query: str, synonyms: dict[str, list[str]], k: int = 10
    ) -> list[tuple[str, int, float]]:
        """Synonym-group serving → [(conv_id, turn_idx, score)],
        bit-identical to operators/synonyms.bm25_topk_synonyms_packed:
        per group (ascending key — the Spark fold's order), sum member
        tfs per doc (exact integers), df_g from the union, one blended
        weight, same tfn kernel."""
        from ics_search_engine_spark.operators.synonyms import (
            expand_groups,
        )

        do_stem = self.stats.get("stem", True)
        qtf, members = expand_groups(query, synonyms, do_stem=do_stem)
        if not qtf:
            return []
        g_tf, g_dl = self._synonym_group_tf(members)
        weights = {
            g: qtf[g] * idf(self.n_docs, int(np.count_nonzero(g_tf[g])))
            for g in g_tf
        }
        if not weights:
            return []
        return self._score_synonym_groups(
            g_tf, g_dl, weights, k, self.stats["avgdl"]
        )

    def search_convs(
        self, query: str, k: int = 10, agg: str = "max"
    ) -> list[tuple[str, float, int]]:
        """Conversation-grain rollup, serving tier → [(conv_id, score,
        matched_turns)] — the in-process form of
        operators/convs.bm25_topk_convs_packed (same semantics, same
        tie-break).  agg='max' is bit-identical to the Spark paths;
        agg='sum' adds turns in ascending doc_ord (reduceat), the same
        order as the packed kernel's within-shard fold, so serving ≡
        packed to cross-shard-combine rounding (exact when no
        conversation straddles a shard boundary)."""
        if agg not in ("max", "sum"):
            raise ValueError(f"unknown conv agg {agg!r}")
        do_stem = self.stats.get("stem", True)
        q_terms = sorted(set(tokenize(query, for_query=True, do_stem=do_stem)))
        if not q_terms:
            return []
        term_df = {t: int(self.df[t]) for t in q_terms if t in self.df}
        weights = query_weights(query, term_df, self.n_docs, do_stem=do_stem)
        if not weights:
            return []
        scores, touched = self._dense_scores(weights, self.stats["avgdl"])
        ti = np.flatnonzero(touched)  # ascending doc_ord
        if ti.size == 0:
            return []
        # conv spans are contiguous ordinal runs (docmap.py: doc_ord is
        # the global rank of (conv_id, turn_idx)) — start ordinals are
        # the change points of the conv column, computed once
        if not hasattr(self, "_conv_starts"):
            change = np.r_[True, self._conv[1:] != self._conv[:-1]]
            self._conv_starts = np.flatnonzero(change).astype(np.int64)
        starts = self._conv_starts
        conv_ix = np.searchsorted(starts, ti, side="right") - 1
        cuts = np.concatenate([[0], np.flatnonzero(np.diff(conv_ix)) + 1])
        vals = scores[ti]
        rolled = (
            np.maximum.reduceat(vals, cuts)
            if agg == "max" else np.add.reduceat(vals, cuts)
        )
        matched = np.diff(np.concatenate([cuts, [ti.size]]))
        conv_start_ords = starts[conv_ix[cuts]]
        order = np.lexsort((conv_start_ords, -rolled))[:k]
        return [
            (
                str(self._conv[conv_start_ords[i]]),
                float(rolled[i]),
                int(matched[i]),
            )
            for i in order
        ]

    # ONE bit-sensitive scoring kernel for the whole engine: serving
    # reuses operators/packed_index._tfn so score parity can never
    # drift between the tiers
    _tfn = staticmethod(_tfn_kernel)

    def _search_wand(
        self,
        weights: dict[str, float],
        k: int,
        stats: dict | None,
        avgdl: float | None = None,
        require_all: int | None = None,
        allowed_mask: np.ndarray | None = None,
        min_match: int | None = None,
    ) -> list[tuple[str, int, float]]:
        """Block-max WAND over doc-range shards: score shards in
        descending ub order, skip every shard whose ub < current k-th
        score.  Pruning on strict < only — a shard with ub == θ could
        still tie the k-th score and win the doc_ord tie-break.  Per-doc
        sums fold terms ascending INSIDE the shard, so each document's
        float score is bit-identical to the exhaustive path.

        avgdl-mismatch safety: the stored max_tfn metadata was computed
        at pack time with THIS index's own avgdl, but a caller (the
        segmented server) may score with a LARGER global avgdl — and
        tfn is strictly increasing in avgdl, so the stored bound would
        understate and pruning could drop a true top-k doc.  Provable
        correction: tfn(a_g)/tfn(a_s) = D_s/D_g ≤ a_g/a_s for
        a_g ≥ a_s (D = tf + k1((1-b) + b·dl/a); the ratio is maximal
        as tf, (1-b) → 0), so scaling every ub by a_g/a_s (plus a
        1e-9 float-margin) restores a valid upper bound; a_g ≤ a_s
        needs no correction (true tfn only shrinks)."""
        import heapq

        own_avgdl = self.stats["avgdl"]
        if avgdl is None:
            avgdl = own_avgdl
        ub_scale = 1.0
        if avgdl > own_avgdl and own_avgdl > 0:
            ub_scale = (avgdl / own_avgdl) * (1.0 + 1e-9)
        range_bits = int(self.stats["range_bits"])
        # shard -> [(term, w, max_tfn, payload)] in ascending term order
        by_shard: dict[int, list] = {}
        for t in sorted(weights):
            w = weights[t]
            for shard, max_tfn, payload in self.postings.get(t, ()):
                by_shard.setdefault(int(shard), []).append(
                    (t, w, max_tfn, payload)
                )
        if require_all is not None:
            # conjunctive: a shard missing any required term can never
            # produce a match — metadata-level pruning, like the
            # distributed conjunctive WAND
            by_shard = {
                s_: rows for s_, rows in by_shard.items()
                if len(rows) == require_all
            }
            if not by_shard:
                if stats is not None:
                    stats.update(n_ranges=0, scored=0, pruned=0)
                return []
        if min_match is not None:
            # msm: a shard holding fewer than m of the query terms can
            # never produce a match — same metadata-level pruning
            by_shard = {
                s_: rows for s_, rows in by_shard.items()
                if len(rows) >= min_match
            }
            if not by_shard:
                if stats is not None:
                    stats.update(n_ranges=0, scored=0, pruned=0)
                return []
        ubs = {
            s: sum(w * m for _, w, m, _ in rows) * ub_scale
            for s, rows in by_shard.items()
        }
        order = sorted(ubs, key=lambda s: (-ubs[s], s))
        if len(order) <= 2 and require_all is None:
            # nothing meaningful to skip — the per-shard array resets
            # cost more than pruning can save; take the exhaustive
            # path's single pass (identical results by construction)
            if stats is not None:
                stats.update(n_ranges=len(order), scored=len(order), pruned=0)
            return self.score_with(
                dict(weights), k, avgdl=avgdl, allowed_mask=allowed_mask,
                min_match=min_match,
            )

        # min-heap of (score, -doc_ord): heap[0] is the CURRENT k-th
        # result (worst kept); θ = heap[0][0]
        heap: list[tuple[float, int]] = []
        size = 1 << range_bits
        local = np.zeros(size, dtype=np.float64)
        n_scored = n_pruned = 0
        for s in order:
            if len(heap) >= k and ubs[s] < heap[0][0]:
                n_pruned += 1
                continue  # no doc here can beat (or tie) the k-th
            base = s << range_bits
            shard_mask = None
            if allowed_mask is not None:
                shard_mask = allowed_mask[base:base + size]
                if shard_mask.size < size:
                    shard_mask = np.pad(
                        shard_mask, (0, size - shard_mask.size)
                    )
                if not shard_mask.any():
                    # the filter empties this shard: provably no
                    # candidate — skip without decoding a byte
                    n_pruned += 1
                    continue
            n_scored += 1
            local[:] = 0.0
            touched = np.zeros(size, dtype=bool)
            counts = (
                np.zeros(size, dtype=np.int32)
                if (require_all is not None or min_match is not None)
                else None
            )
            for _t, w, _m, payload in by_shard[s]:  # ascending term order
                d, tf, dl, _ = unpack_postings(
                    bytes(payload), with_positions=False
                )
                idx = d.astype(np.int64) - base
                local[idx] += w * self._tfn(tf, dl, avgdl)
                touched[idx] = True
                if counts is not None:
                    counts[idx] += 1
            if counts is not None:
                touched &= (
                    counts == require_all
                    if require_all is not None
                    else counts >= min_match
                )
            if shard_mask is not None:
                touched &= shard_mask
            ti = np.flatnonzero(touched)
            if len(heap) >= k:
                # vectorized pre-filter: a candidate below θ can never
                # enter; == θ stays (doc_ord tie-break)
                ti = ti[local[ti] >= heap[0][0]]
            for i in ti:
                cand = (float(local[i]), -(base + int(i)))
                if len(heap) < k:
                    heapq.heappush(heap, cand)
                elif cand > heap[0]:
                    heapq.heapreplace(heap, cand)
        if stats is not None:
            stats.update(
                n_ranges=len(order), scored=n_scored, pruned=n_pruned
            )
        winners = sorted(heap, key=lambda c: (-c[0], -c[1]))
        return [
            (str(self._conv[-nd]), int(self._turn[-nd]), sc)
            for sc, nd in winners
        ]

    # ------------------------------------------------ positional serving

    def _position_keys(self, term: str) -> np.ndarray:
        """Every occurrence of ``term`` as a SORTED int64 composite key
        ``doc_ord << 32 | position`` — the layout that turns phrase and
        proximity matching into whole-array searchsorted probes instead
        of a per-doc Python loop (positions are bounded by turn length,
        far below 2^32, so the key order is (doc, pos) lexicographic).
        LRU-memoized per term (position keys are occurrence-sized —
        bigger than the df-sized _decoded entries — so they get their
        own, smaller cap): serving is a long-lived process, the analog
        of the reference's postings lru_cache
        (/root/reference/search.py:53)."""
        import collections

        # stats.json records the build flag — a positionless payload
        # would otherwise surface as a cryptic codec error mid-decode
        if not self.stats.get("with_positions", True):
            raise ValueError(
                "index was built without positions "
                "(build_packed_index(with_positions=True))"
            )
        cache = getattr(self, "_poskey_cache", None)
        if cache is None:
            cache = self._poskey_cache = collections.OrderedDict()
        hit = cache.get(term)
        if hit is not None:
            cache.move_to_end(term)
            return hit
        parts: list[np.ndarray] = []
        for _shard, _maxtfn, payload in self.postings.get(term, ()):
            d, _tf, _dl, poss = unpack_postings(
                bytes(payload), with_positions=True
            )
            if not len(d):
                continue
            lens = np.fromiter(
                (p.size for p in poss), dtype=np.int64, count=len(poss)
            )
            flat = (
                np.concatenate(poss).astype(np.int64)
                if lens.sum() else np.empty(0, np.int64)
            )
            ords = np.repeat(d.astype(np.int64), lens)
            parts.append((ords << 32) | flat)
        keys = (
            np.concatenate(parts) if parts else np.empty(0, np.int64)
        )
        keys.sort(kind="stable")
        cache[term] = keys
        if len(cache) > self.POSKEY_CACHE_TERMS:
            cache.popitem(last=False)
        return keys

    def _rank_counts(
        self, docs: np.ndarray, counts: np.ndarray, k: int
    ) -> list[tuple[str, int, int]]:
        """Vectorized top-k over (doc, count): lexsort by (count desc,
        doc_ord asc) — doc_ord ascending IS (conv_id, turn_idx)
        ascending (docmap ordinal = rank of the key) — then materialize
        exactly k rows.  Only the k winners touch Python."""
        if docs.size == 0:
            return []
        order = np.lexsort((docs, -counts))[:k]
        return [
            (str(self._conv[o]), int(self._turn[o]), int(c))
            for o, c in zip(docs[order], counts[order])
        ]

    @staticmethod
    def _count_by_doc(anchor_keys: np.ndarray, mask: np.ndarray
                      ) -> tuple[np.ndarray, np.ndarray]:
        """Anchor keys surviving ``mask`` → (docs, counts) arrays for
        docs with ≥1 surviving match (zero-match docs can never rank or
        pass a phrase constraint, so they are not materialized)."""
        return np.unique(anchor_keys[mask] >> 32, return_counts=True)

    def _phrase_counts(self, phrase: str
                       ) -> tuple[np.ndarray, np.ndarray] | None:
        """(docs, match counts) arrays for docs with ≥1 exact-phrase
        match (None if the phrase has no searchable terms).  Whole-
        array probes: anchor occurrence keys + offset are binary-
        searched in each other term's sorted key array — no per-doc
        Python."""
        from ics_search_engine_spark.operators.phrase import phrase_offsets

        do_stem = self.stats.get("stem", True)
        offs = phrase_offsets(phrase, do_stem=do_stem)
        if not offs:
            return None
        base = offs[0][1]
        rel = [(t, o - base) for t, o in offs]
        anchor_keys = self._position_keys(rel[0][0])
        mask = np.ones(anchor_keys.size, dtype=bool)
        for t, off in rel[1:]:
            kt = self._position_keys(t)
            want = anchor_keys + off  # same doc: pos+off < 2^32
            if kt.size == 0:
                mask[:] = False
                break
            idx = np.searchsorted(kt, want)
            found = (idx < kt.size) & (
                kt[np.minimum(idx, kt.size - 1)] == want
            )
            mask &= found
        return self._count_by_doc(anchor_keys, mask)

    def search_phrase(self, phrase: str, k: int = 10
                      ) -> list[tuple[str, int, int]]:
        """Exact-phrase serving → [(conv_id, turn_idx, match_count)],
        identical to the Spark operators/phrase.phrase_topk (same
        offsets rule: stop words occupy positions, see phrase_offsets)."""
        hit = self._phrase_counts(phrase)
        if hit is None:
            return []
        return self._rank_counts(*hit, k)

    def search_near(self, query: str, window: int, k: int = 10
                    ) -> list[tuple[str, int, int]]:
        """Unordered-proximity serving → [(conv_id, turn_idx,
        match_count)], identical to operators/phrase.near_topk (same
        anchored semantics: T = sorted distinct query terms, anchor
        T[0], count anchor positions with every other term within
        ``window``)."""
        do_stem = self.stats.get("stem", True)
        terms = sorted(set(tokenize(query, for_query=True, do_stem=do_stem)))
        if not terms:
            return []
        anchor_keys = self._position_keys(terms[0])
        docs = anchor_keys >> 32
        pos = anchor_keys & 0xFFFFFFFF
        # window bounds as composite keys — clamping the low side at 0
        # keeps the probe inside the anchor's own doc
        lo_key = (docs << 32) | np.maximum(pos - window, 0)
        hi_key = (docs << 32) | (pos + window)
        mask = np.ones(anchor_keys.size, dtype=bool)
        for t in terms[1:]:
            kt = self._position_keys(t)
            if kt.size == 0:
                mask[:] = False
                break
            lo = np.searchsorted(kt, lo_key, side="left")
            hi = np.searchsorted(kt, hi_key, side="right")
            mask &= hi > lo
        return self._rank_counts(*self._count_by_doc(anchor_keys, mask), k)

    def search_intervals(self, node, k: int = 10
                         ) -> list[tuple[str, int, int]]:
        """Intervals-query serving → [(conv_id, turn_idx,
        match_count)], identical to operators/intervals.intervals_topk
        (same kernel: the tree algebra in count_intervals runs per
        candidate doc).  Candidates are docs holding ≥1 tree term —
        the kernel zero-counts docs missing a required term; a
        root-level AllOf of Term leaves narrows candidates to the
        intersection first (the common case costs |smallest df|
        evaluations, not the union)."""
        from ics_search_engine_spark.operators.intervals import (
            AllOf,
            Term,
            count_intervals,
            tree_terms,
        )

        if node is None:
            return []
        terms = sorted(tree_terms(node))
        if not terms:
            return []
        # per term: doc array + per-doc position lists (split on doc
        # boundaries of the sorted composite keys)
        per_term: dict[str, tuple[np.ndarray, list[np.ndarray]]] = {}
        for t in terms:
            keys = self._position_keys(t)
            docs = keys >> 32
            uniq, starts = np.unique(docs, return_index=True)
            per_term[t] = (
                uniq,
                np.split(keys & 0xFFFFFFFF, starts[1:]),
            )
        if isinstance(node, AllOf) and all(
            isinstance(s, Term) for s in node.sources
        ):
            cand = None
            for t in terms:
                cand = (
                    per_term[t][0]
                    if cand is None
                    else np.intersect1d(cand, per_term[t][0])
                )
        else:
            cand = np.unique(
                np.concatenate([per_term[t][0] for t in terms])
            )
        out_docs, out_counts = [], []
        # per-term doc→slot probes, vectorized over all candidates
        slot = {
            t: np.searchsorted(per_term[t][0], cand) for t in terms
        }
        for i, d in enumerate(cand):
            pos = {}
            for t in terms:
                uniq, plists = per_term[t]
                j = slot[t][i]
                if j < uniq.size and uniq[j] == d:
                    pos[t] = plists[j].tolist()
            c = count_intervals(node, pos)
            if c > 0:
                out_docs.append(int(d))
                out_counts.append(c)
        if not out_docs:
            return []
        return self._rank_counts(
            np.asarray(out_docs, dtype=np.int64),
            np.asarray(out_counts, dtype=np.int64),
            k,
        )

    def search_near_ordered(self, query: str, window: int, k: int = 10
                            ) -> list[tuple[str, int, int]]:
        """Ordered-proximity serving → [(conv_id, turn_idx,
        match_count)], identical to operators/phrase.near_ordered_topk.
        Exact backward reachability over the sorted composite-key
        arrays (the greedy shortcut is wrong — see the Spark operator's
        docstring): S_n = keys(t_n); S_i = keys(t_i) that range-probe a
        successor in S_{i+1} within (key, key+window]; match_count(d) =
        surviving anchor keys of t_1 in d.  Whole-array searchsorted
        per step, no per-doc Python."""
        import numpy as np

        do_stem = self.stats.get("stem", True)
        seq = tokenize(query, for_query=True, do_stem=do_stem)
        if not seq:
            return []
        ok = self._position_keys(seq[-1])
        for t in reversed(seq[:-1]):
            keys_t = self._position_keys(t)
            if ok.size == 0 or keys_t.size == 0:
                ok = np.empty(0, np.int64)
                break
            # q ∈ [r+1, r+window]; composite keys keep the probe inside
            # r's doc (pos + window < 2^32 for any real turn)
            lo = np.searchsorted(ok, keys_t + 1, side="left")
            hi = np.searchsorted(ok, keys_t + window, side="right")
            ok = keys_t[hi > lo]
        if ok.size == 0:
            return []
        docs, counts = np.unique(ok >> 32, return_counts=True)
        return self._rank_counts(docs, counts, k)

    def search_wildcard(
        self, query: str, k: int = 10, max_expansions: int = 1024
    ) -> list[tuple[str, int, float]]:
        """Prefix-pattern serving → [(conv_id, turn_idx, score)],
        identical to operators/wildcard.bm25_topk_wildcard (same
        expansion rule: per-pattern (df desc, term asc) cap, qtf adds
        across literal + covering patterns).  Expansion scans the
        driver-resident term dictionary — the serving analog of the
        pushed-down StartsWith metadata job."""
        from ics_search_engine_spark.operators.query import idf_weights
        from ics_search_engine_spark.operators.wildcard import (
            parse_wildcard_query,
        )

        do_stem = self.stats.get("stem", True)
        prefixes, suffixes, rest = parse_wildcard_query(query)
        qtf: dict[str, int] = {}
        for t in tokenize(rest, for_query=True, do_stem=do_stem):
            qtf[t] = qtf.get(t, 0) + 1
        term_df = {t: int(self.df[t]) for t in qtf if t in self.df}
        for p, inst in prefixes.items():
            for t, d in self._terms().expand(p, max_expansions):
                qtf[t] = qtf.get(t, 0) + inst
                term_df[t] = d
        for s, inst in suffixes.items():
            for t, d in self._terms().expand_suffix(s, max_expansions):
                qtf[t] = qtf.get(t, 0) + inst
                term_df[t] = d
        return self.score_with(idf_weights(qtf, term_df, self.n_docs), k)

    def search_regex(
        self, query: str, k: int = 10, max_expansions: int = 1024
    ) -> list[tuple[str, int, float]]:
        """Anchored-regex term patterns (``/pat/`` tokens) →
        [(conv_id, turn_idx, score)], identical to
        operators/wildcard.bm25_topk_regex (same expansion cap, same
        qtf-adds-across-instances weighting, same portable regex
        subset)."""
        from ics_search_engine_spark.operators.query import idf_weights
        from ics_search_engine_spark.operators.wildcard import (
            parse_regex_query,
        )

        do_stem = self.stats.get("stem", True)
        patterns, rest = parse_regex_query(query)
        qtf: dict[str, int] = {}
        for t in tokenize(rest, for_query=True, do_stem=do_stem):
            qtf[t] = qtf.get(t, 0) + 1
        term_df = {t: int(self.df[t]) for t in qtf if t in self.df}
        for pat, inst in patterns.items():
            for t, d in self._terms().expand_regex(pat, max_expansions):
                qtf[t] = qtf.get(t, 0) + inst
                term_df[t] = d
        return self.score_with(idf_weights(qtf, term_df, self.n_docs), k)

    def search_fuzzy(
        self, query: str, k: int = 10, max_dist: int = 2,
        max_matches: int = 8, use_wand: bool = False,
        stats: dict | None = None,
    ) -> list[tuple[str, int, float]]:
        """Fuzzy serving — identical semantics to
        operators/fuzzy.bm25_topk_fuzzy (same stem-first probe, same
        (dist asc, df desc, term asc) cap, flat qtf×idf weights).
        ``use_wand`` rides block-max pruning through score_with's
        weight override — identical results, like the Spark path."""
        from ics_search_engine_spark.operators.fuzzy import select_matches
        from ics_search_engine_spark.operators.query import idf_weights

        do_stem = self.stats.get("stem", True)
        probes: dict[str, int] = {}
        for t in tokenize(query, for_query=True, do_stem=do_stem):
            probes[t] = probes.get(t, 0) + 1
        qtf: dict[str, int] = {}
        term_df: dict[str, int] = {}
        td = self._terms()
        for p, inst in probes.items():
            for t, d in select_matches(td.fuzzy(p, max_dist), max_matches):
                qtf[t] = qtf.get(t, 0) + inst
                term_df[t] = d
        return self.score_with(
            idf_weights(qtf, term_df, self.n_docs), k,
            use_wand=use_wand, stats=stats,
        )

    def did_you_mean(self, query: str, max_dist: int = 2) -> str | None:
        """Serving-tier spell suggestion — identical selection to
        operators/spell.did_you_mean ((dist asc, df desc, term asc)
        best within max_dist; None when no token changed)."""
        do_stem = self.stats.get("stem", True)
        toks = tokenize(query, for_query=True, do_stem=do_stem)
        if not toks:
            return None
        td = self._terms()
        fix: dict[str, str] = {}
        for p in sorted(set(toks)):
            cands = sorted(
                td.fuzzy(p, max_dist), key=lambda x: (x[2], -x[1], x[0])
            )
            fix[p] = cands[0][0] if cands else p
        out = [fix[t] for t in toks]
        return " ".join(out) if out != toks else None

    def more_like_this(
        self,
        text: str,
        k: int = 10,
        max_query_terms: int = 10,
        exclude: tuple[str, int] | None = None,
    ) -> list[tuple[str, int, float]]:
        """Serve documents similar to ``text`` — identical term
        selection and weighting to operators/mlt.more_like_this (the
        Spark path fetches the source row first; a serving caller
        usually already holds the text).  ``exclude``: drop one
        (conv_id, turn_idx) — the source doc — from the results."""
        from ics_search_engine_spark.operators.mlt import mlt_terms

        do_stem = self.stats.get("stem", True)
        probe = sorted(set(tokenize(text, for_query=True, do_stem=do_stem)))
        term_df = {t: int(self.df[t]) for t in probe if t in self.df}
        weights = mlt_terms(
            text, term_df, self.n_docs, max_query_terms, do_stem=do_stem
        )
        if not weights:
            return []
        if exclude is None:
            return self.score_with(weights, k)
        # _allowed_mask returns a fresh array for key iterables, so the
        # in-place negation aliases nothing
        mask = ~self._allowed_mask([exclude])
        return self.score_with(weights, k, allowed_mask=mask)

    def _presence_mask(self, term: str) -> np.ndarray:
        """bool[n_docs]: does the doc contain ``term``."""
        mask = np.zeros(self.n_docs, dtype=bool)
        for idx, _tf, _dl in self._decoded(term):
            mask[idx] = True
        return mask

    def _terms(self) -> "_TermDict":
        td = getattr(self, "_term_dict", None)
        if td is None:
            td = self._term_dict = _TermDict(self.df)
        return td

    def search_qlang(
        self,
        q: str,
        k: int = 10,
        max_expansions: int = 1024,
        allowed=None,
    ) -> list[tuple[str, int, float]]:
        """Evaluate a query-language string (+required -excluded
        "exact phrase" wild* term, operators composing with phrases and
        patterns) — identical results to the Spark
        operators/qlang.bm25_topk_qlang (same parse, same resolve, same
        global-stats posture; constraints compose as doc masks here
        instead of semi/anti joins)."""
        from ics_search_engine_spark.operators.qlang import (
            parse_query,
            resolve_terms,
        )
        from ics_search_engine_spark.operators.query import idf_weights

        do_stem = self.stats.get("stem", True)
        spec = parse_query(q)
        qtf, required, excluded = resolve_terms(spec, do_stem)
        term_df = {
            t: int(self.df[t])
            for t in set(qtf) | set(required)
            if t in self.df
        }
        per_prefix: dict[str, list[str]] = {}
        for p, inst in spec.prefixes.items():
            terms = self._terms().expand(p, max_expansions)
            per_prefix[p] = [t for t, _ in terms]
            for t, d in terms:
                qtf[t] = qtf.get(t, 0) + inst
                term_df[t] = d
        if any(not per_prefix.get(p) for p in spec.required_prefixes):
            return []
        if any(term_df.get(t, 0) == 0 for t in required):
            return []
        weights = idf_weights(qtf, term_df, self.n_docs)
        if not weights:
            return []

        mask = (
            None if allowed is None else self._allowed_mask(allowed).copy()
        )

        def and_mask(m: np.ndarray):
            nonlocal mask
            mask = m if mask is None else (mask & m)

        def union_presence(terms: list[str]) -> np.ndarray:
            m = np.zeros(self.n_docs, dtype=bool)
            for t in terms:
                m |= self._presence_mask(t)
            return m

        for t in required:
            and_mask(self._presence_mask(t))
        for p in spec.required_prefixes:
            and_mask(union_presence(per_prefix[p]))
        for t in excluded:
            and_mask(~self._presence_mask(t))
        for p in spec.excluded_prefixes:
            # uncapped, like the Spark path: exclusion must not depend
            # on the expansion cap
            and_mask(~union_presence(
                [t for t, _ in self._terms().expand(p, 1 << 31)]
            ))
        for ph in spec.phrases:
            hit = self._phrase_counts(ph)
            if hit is None:
                continue
            m = np.zeros(self.n_docs, dtype=bool)
            m[hit[0]] = True
            and_mask(m)
        for ph in spec.neg_phrases:
            hit = self._phrase_counts(ph)
            if hit is None:
                continue
            m = np.ones(self.n_docs, dtype=bool)
            m[hit[0]] = False
            and_mask(m)
        return self.score_with(weights, k, allowed_mask=mask)


class LocalSegmentedServer:
    """In-process serving over N independently built segments — the
    LSM lifecycle (operators/segments.py) carried into the serving
    tier: Spark ingests deltas as new segments at cluster scale, a
    serving node reloads just the NEW segment's artifacts, and results
    stay bit-identical to serving a fully compacted index (tested),
    because every BM25 input recombines exactly (N and Σdl as integer
    sums → the same avgdl double, df as integer sums) and each
    document's whole score lives in its one segment.

    ``deletes`` gives query-time tombstones with the same exact
    over-fetch guarantee as the Spark path (k + |deletes| per segment).

    Upsert shadows (supersedes.json, operators/segments.py module
    docstring) apply to every surface with the same guarantee: a key's
    version from a segment older than its newest declaring segment
    never reaches the results; stats stay both-versions until a
    compaction applies the declarations physically — identical to the
    Spark segmented path (tested).
    """

    def __init__(self, paths: list[str]):
        from ics_search_engine_spark.operators.segments import (
            load_supersedes,
        )

        if not paths:
            raise ValueError("need at least one segment")
        self.servers = [LocalIndexServer(p) for p in paths]
        self.shadows: dict[tuple[str, int], int] = {}
        for i, p in enumerate(paths):
            if i == 0:
                continue
            for key in load_supersedes(p):
                self.shadows[key] = max(self.shadows.get(key, -1), i)
        s0 = self.servers[0].stats
        for s in self.servers[1:]:
            if s.stats.get("stem", True) != s0.get("stem", True):
                raise ValueError("segments disagree on stemming")
        self.n_docs = sum(s.n_docs for s in self.servers)
        # bit-parity contract (class docstring): avgdl recombines as an
        # exact integer sum — approximating a missing sum_dl would
        # silently break bit-identity, so it's a hard error
        for s in self.servers:
            if "sum_dl" not in s.stats:
                raise ValueError(
                    f"segment {s.path} stats.json lacks sum_dl; "
                    "rebuild it — avgdl reconstruction must be exact"
                )
        self.sum_dl = sum(int(s.stats["sum_dl"]) for s in self.servers)
        self.avgdl = self.sum_dl / self.n_docs if self.n_docs else 0.0
        self.stem = s0.get("stem", True)

    def search(
        self,
        query: str,
        k: int = 10,
        use_wand: bool = False,
        deletes: set[tuple[str, int]] | None = None,
        min_match: int | None = None,
    ) -> list[tuple[str, int, float]]:
        q_terms = sorted(set(tokenize(query, for_query=True, do_stem=self.stem)))
        if not q_terms:
            return []
        term_df: dict[str, int] = {}
        for s in self.servers:
            for t in q_terms:
                if t in s.df:
                    term_df[t] = term_df.get(t, 0) + int(s.df[t])
        weights = query_weights(query, term_df, self.n_docs,
                                do_stem=self.stem)
        if not weights:
            return []
        if min_match is not None:
            # a doc's postings live entirely in its segment, so the
            # per-segment matched-term counts are complete — min_match
            # forwards unchanged (global df/avgdl already recombined)
            if min_match <= 1:
                min_match = None
            elif len(weights) < min_match:
                return []
        fetch = k + (len(deletes) if deletes else 0) + len(self.shadows)
        per_seg = [
            s.score_with(weights, fetch, avgdl=self.avgdl,
                         use_wand=use_wand, min_match=min_match)
            for s in self.servers
        ]
        merged = self._merge_scored(per_seg, fetch)
        if deletes:
            merged = [r for r in merged if (r[0], r[1]) not in deletes]
        return merged[:k]

    def search_after(
        self,
        query: str,
        after: tuple[float, str, int],
        k: int = 10,
        deletes: set[tuple[str, int]] | None = None,
    ) -> list[tuple[str, int, float]]:
        """Deep pagination over the segment set: the cursor predicate
        is per-doc, so each segment pages independently with the
        GLOBAL weights/avgdl and the merge keeps the engine's total
        order — identical to paging a compacted index (tested)."""
        q_terms = sorted(set(tokenize(query, for_query=True, do_stem=self.stem)))
        if not q_terms:
            return []
        term_df: dict[str, int] = {}
        for s in self.servers:
            for t in q_terms:
                if t in s.df:
                    term_df[t] = term_df.get(t, 0) + int(s.df[t])
        weights = query_weights(query, term_df, self.n_docs,
                                do_stem=self.stem)
        if not weights:
            return []
        fetch = k + (len(deletes) if deletes else 0) + len(self.shadows)
        per_seg = [
            s.score_after_with(weights, after, fetch, avgdl=self.avgdl)
            for s in self.servers
        ]
        merged = self._merge_scored(per_seg, fetch)
        if deletes:
            merged = [r for r in merged if (r[0], r[1]) not in deletes]
        return merged[:k]

    def scroll(self, query: str, page_size: int = 10, max_pages=None):
        """Scroll over the segment set (see LocalIndexServer.scroll);
        the server's segment list is already a pinned snapshot — it
        was fixed at construction — so every scroll is PIT-consistent
        by construction."""
        yield from _scroll_via(self.search, self.search_after,
                               query, page_size, max_pages)

    def _shadow_ords(self, i: int) -> np.ndarray:
        """doc_ords in segment ``i`` whose keys are shadowed by a NEWER
        segment (their versions there are dead) — memoized per segment;
        one O(n_docs_i) membership pass over the (few) shadow keys."""
        cache = getattr(self, "_shadow_ord_cache", None)
        if cache is None:
            cache = self._shadow_ord_cache = {}
        if i not in cache:
            dead = [k for k, newest in self.shadows.items() if newest > i]
            if not dead:
                cache[i] = np.empty(0, dtype=np.int64)
            else:
                s = self.servers[i]
                conv = np.asarray(s._conv)
                cand = np.flatnonzero(
                    np.isin(conv, np.array([c for c, _ in dead], dtype=object))
                )
                dead_set = set(dead)
                cache[i] = np.array(
                    [
                        o for o in cand
                        if (str(conv[o]), int(s._turn[o])) in dead_set
                    ],
                    dtype=np.int64,
                )
        return cache[i]

    def count(
        self,
        query: str,
        conjunctive: bool = False,
        min_match: int | None = None,
    ) -> int:
        """ES _count over the LSM: live matched docs across all
        segments — per-segment membership pass with the SAME per-doc
        semantics as search (conjunctive / min_match count distinct
        query terms inside the doc's own segment, which holds its
        whole token stream), minus versions shadowed by a newer
        segment's declarations (the _merge_scored liveness rule).
        Identical to count_matches over an equivalent compacted index
        (tested)."""
        do_stem = self.stem
        q_terms = sorted(set(tokenize(query, for_query=True, do_stem=do_stem)))
        if not q_terms:
            return 0
        gdf = self._global_df()
        present = [t for t in q_terms if t in gdf]
        require_all = None
        if conjunctive:
            if min_match is not None:
                raise ValueError(
                    "conjunctive and min_match are mutually exclusive"
                )
            if len(present) < len(q_terms):
                return 0
            require_all = len(present)
        elif min_match is not None:
            if min_match <= 1:
                min_match = None
            elif len(present) < min_match:
                return 0
        if not present:
            return 0
        weights = {t: 1.0 for t in present}
        total = 0
        for i, s in enumerate(self.servers):
            _, touched = s._dense_scores(
                weights, self.avgdl, require_all=require_all,
                min_match=min_match,
            )
            dead = self._shadow_ords(i)
            if dead.size:
                touched = touched.copy()
                touched[dead] = False
            total += int(touched.sum())
        return total

    def _merge_scored(
        self, per_segment: list[list[tuple[str, int, float]]], k: int
    ) -> list[tuple[str, int, float]]:
        """Merge per-segment scored lists (index = segment age order):
        drop superseded versions, then sort on (score desc, docID asc)
        — exact-score ties across segments break on docID, like the
        oracle and the Spark segmented path."""
        sh = self.shadows
        merged = [
            r
            for i, seg in enumerate(per_segment)
            for r in seg
            if sh.get((r[0], r[1]), -1) <= i
        ]
        merged.sort(key=lambda r: (-r[2], r[0], r[1]))
        return merged[:k]

    # ------------------------------------------- round-3 query surfaces
    #
    # Positional counts need NO stat recombination (a doc's phrase /
    # proximity matches live entirely in its segment); per-segment
    # top-k lists merge on (count desc, docID asc).  Wildcard and the
    # query language recombine exactly like BM25: expansion and idf
    # come from the UNION dictionary (df summed), weights broadcast to
    # every segment with the global avgdl.

    def _merge_counts(
        self, per_segment: list[list[tuple[str, int, int]]], k: int
    ) -> list[tuple[str, int, int]]:
        sh = self.shadows
        merged = [
            r
            for i, seg in enumerate(per_segment)
            for r in seg
            if sh.get((r[0], r[1]), -1) <= i
        ]
        merged.sort(key=lambda r: (-r[2], r[0], r[1]))
        return merged[:k]

    def search_phrase(self, phrase: str, k: int = 10
                      ) -> list[tuple[str, int, int]]:
        f = k + len(self.shadows)
        return self._merge_counts(
            [s.search_phrase(phrase, f) for s in self.servers], k
        )

    def search_near(self, query: str, window: int, k: int = 10
                    ) -> list[tuple[str, int, int]]:
        f = k + len(self.shadows)
        return self._merge_counts(
            [s.search_near(query, window, f) for s in self.servers], k
        )

    def search_near_ordered(self, query: str, window: int, k: int = 10
                            ) -> list[tuple[str, int, int]]:
        f = k + len(self.shadows)
        return self._merge_counts(
            [s.search_near_ordered(query, window, f) for s in self.servers],
            k,
        )

    def search_intervals(self, node, k: int = 10
                         ) -> list[tuple[str, int, int]]:
        f = k + len(self.shadows)
        return self._merge_counts(
            [s.search_intervals(node, f) for s in self.servers], k
        )

    def _global_df(self) -> dict[str, int]:
        """UNION dictionary (df summed) — memoized: segments are
        immutable once opened, and rebuilding a fat-tailed vocabulary
        union per query would dominate small queries."""
        gdf = getattr(self, "_gdf", None)
        if gdf is None:
            gdf = {}
            for s in self.servers:
                for t, d in s.df.items():
                    gdf[t] = gdf.get(t, 0) + int(d)
            self._gdf = gdf
        return gdf

    def _terms(self) -> "_TermDict":
        td = getattr(self, "_term_dict", None)
        if td is None:
            td = self._term_dict = _TermDict(self._global_df())
        return td

    def search_wildcard(
        self, query: str, k: int = 10, max_expansions: int = 1024
    ) -> list[tuple[str, int, float]]:
        """Identical to serving a compacted index: expansion selects on
        the UNION dictionary's summed df (a per-segment cap could pick
        different terms than the compacted index would)."""
        from ics_search_engine_spark.operators.query import idf_weights
        from ics_search_engine_spark.operators.wildcard import (
            parse_wildcard_query,
        )

        prefixes, suffixes, rest = parse_wildcard_query(query)
        qtf: dict[str, int] = {}
        for t in tokenize(rest, for_query=True, do_stem=self.stem):
            qtf[t] = qtf.get(t, 0) + 1
        gdf = self._global_df()
        term_df = {t: gdf[t] for t in qtf if t in gdf}
        for p, inst in prefixes.items():
            for t, d in self._terms().expand(p, max_expansions):
                qtf[t] = qtf.get(t, 0) + inst
                term_df[t] = d
        for s, inst in suffixes.items():
            for t, d in self._terms().expand_suffix(s, max_expansions):
                qtf[t] = qtf.get(t, 0) + inst
                term_df[t] = d
        weights = idf_weights(qtf, term_df, self.n_docs)
        if not weights:
            return []
        f = k + len(self.shadows)
        return self._merge_scored(
            [s.score_with(weights, f, avgdl=self.avgdl)
             for s in self.servers],
            k,
        )

    def search_regex(
        self, query: str, k: int = 10, max_expansions: int = 1024
    ) -> list[tuple[str, int, float]]:
        """Anchored-regex patterns over the LSM — expansion against
        the UNION dictionary (summed df), identical to serving a
        compacted index."""
        from ics_search_engine_spark.operators.query import idf_weights
        from ics_search_engine_spark.operators.wildcard import (
            parse_regex_query,
        )

        patterns, rest = parse_regex_query(query)
        qtf: dict[str, int] = {}
        for t in tokenize(rest, for_query=True, do_stem=self.stem):
            qtf[t] = qtf.get(t, 0) + 1
        gdf = self._global_df()
        term_df = {t: gdf[t] for t in qtf if t in gdf}
        for pat, inst in patterns.items():
            for t, d in self._terms().expand_regex(pat, max_expansions):
                qtf[t] = qtf.get(t, 0) + inst
                term_df[t] = d
        weights = idf_weights(qtf, term_df, self.n_docs)
        if not weights:
            return []
        f = k + len(self.shadows)
        return self._merge_scored(
            [s.score_with(weights, f, avgdl=self.avgdl)
             for s in self.servers],
            k,
        )

    def search_fuzzy(
        self, query: str, k: int = 10, max_dist: int = 2,
        max_matches: int = 8, use_wand: bool = False,
    ) -> list[tuple[str, int, float]]:
        """Fuzzy matching over the LSM — expansion against the UNION
        dictionary (summed df), identical to serving a compacted
        index.  ``use_wand`` prunes per segment through the same
        score_with weight override as the single-index tier."""
        from ics_search_engine_spark.operators.fuzzy import select_matches
        from ics_search_engine_spark.operators.query import idf_weights

        probes: dict[str, int] = {}
        for t in tokenize(query, for_query=True, do_stem=self.stem):
            probes[t] = probes.get(t, 0) + 1
        qtf: dict[str, int] = {}
        term_df: dict[str, int] = {}
        td = self._terms()
        for p, inst in probes.items():
            for t, d in select_matches(td.fuzzy(p, max_dist), max_matches):
                qtf[t] = qtf.get(t, 0) + inst
                term_df[t] = d
        weights = idf_weights(qtf, term_df, self.n_docs)
        if not weights:
            return []
        f = k + len(self.shadows)
        return self._merge_scored(
            [s.score_with(weights, f, avgdl=self.avgdl,
                          use_wand=use_wand)
             for s in self.servers],
            k,
        )

    def search_synonyms(
        self, query: str, synonyms: dict[str, list[str]], k: int = 10
    ) -> list[tuple[str, int, float]]:
        """Synonym groups over the LSM, identical to serving a
        compacted index: a document lives in exactly one segment, so
        the group's union-df is the SUM of per-segment union-dfs and
        per-doc group tf is segment-local; weights broadcast globally
        (global n_docs/avgdl) like every blended LSM surface."""
        from ics_search_engine_spark.operators.synonyms import (
            expand_groups,
        )

        qtf, members = expand_groups(query, synonyms, do_stem=self.stem)
        if not qtf:
            return []
        per_seg = [s._synonym_group_tf(members) for s in self.servers]
        df_g: dict[str, int] = {}
        for g_tf, _ in per_seg:
            for g, arr in g_tf.items():
                df_g[g] = df_g.get(g, 0) + int(np.count_nonzero(arr))
        weights = {
            g: qtf[g] * idf(self.n_docs, d)
            for g, d in df_g.items()
            if d > 0
        }
        if not weights:
            return []
        f = k + len(self.shadows)
        return self._merge_scored(
            [
                s._score_synonym_groups(g_tf, g_dl, weights, f, self.avgdl)
                for s, (g_tf, g_dl) in zip(self.servers, per_seg)
            ],
            k,
        )

    def did_you_mean(self, query: str, max_dist: int = 2) -> str | None:
        """Spell suggestion over the LSM — selection against the UNION
        dictionary (summed df), identical to a compacted index."""
        toks = tokenize(query, for_query=True, do_stem=self.stem)
        if not toks:
            return None
        td = self._terms()
        fix: dict[str, str] = {}
        for p in sorted(set(toks)):
            cands = sorted(
                td.fuzzy(p, max_dist), key=lambda x: (x[2], -x[1], x[0])
            )
            fix[p] = cands[0][0] if cands else p
        out = [fix[t] for t in toks]
        return " ".join(out) if out != toks else None

    def search_qlang(self, q: str, k: int = 10, max_expansions: int = 1024
                     ) -> list[tuple[str, int, float]]:
        """Query language over the LSM: weights from global stats;
        +/-/phrase constraints evaluate per segment (a doc's terms and
        positions live entirely in its segment)."""
        from ics_search_engine_spark.operators.qlang import (
            parse_query,
            resolve_terms,
        )
        from ics_search_engine_spark.operators.query import idf_weights

        spec = parse_query(q)
        qtf, required, excluded = resolve_terms(spec, self.stem)
        gdf = self._global_df()
        term_df = {
            t: gdf[t] for t in set(qtf) | set(required) if t in gdf
        }
        per_prefix: dict[str, list[str]] = {}
        for p, inst in spec.prefixes.items():
            terms = self._terms().expand(p, max_expansions)
            per_prefix[p] = [t for t, _ in terms]
            for t, d in terms:
                qtf[t] = qtf.get(t, 0) + inst
                term_df[t] = d
        if any(not per_prefix.get(p) for p in spec.required_prefixes):
            return []
        if any(term_df.get(t, 0) == 0 for t in required):
            return []
        weights = idf_weights(qtf, term_df, self.n_docs)
        if not weights:
            return []
        excl_terms_by_prefix = {
            p: [t for t, _ in self._terms().expand(p, 1 << 31)]
            for p in spec.excluded_prefixes
        }
        merged: list[list[tuple[str, int, float]]] = []
        for s in self.servers:
            masks: list[np.ndarray] = []

            def union_presence(terms):
                m = np.zeros(s.n_docs, dtype=bool)
                for t in terms:
                    m |= s._presence_mask(t)
                return m

            for t in required:
                masks.append(s._presence_mask(t))
            for p in spec.required_prefixes:
                masks.append(union_presence(per_prefix[p]))
            for t in excluded:
                masks.append(~s._presence_mask(t))
            for p in spec.excluded_prefixes:
                masks.append(~union_presence(excl_terms_by_prefix[p]))
            for ph in spec.phrases:
                hit = s._phrase_counts(ph)
                if hit is not None:
                    m = np.zeros(s.n_docs, dtype=bool)
                    m[hit[0]] = True
                    masks.append(m)
            for ph in spec.neg_phrases:
                hit = s._phrase_counts(ph)
                if hit is not None:
                    m = np.ones(s.n_docs, dtype=bool)
                    m[hit[0]] = False
                    masks.append(m)
            mask = None
            for m in masks:
                mask = m if mask is None else (mask & m)
            merged.append(
                s.score_with(weights, k + len(self.shadows),
                             avgdl=self.avgdl, allowed_mask=mask)
            )
        return self._merge_scored(merged, k)


class LocalFieldedServer:
    """In-process multi_match over a fielded index directory
    (operators/fields.build_fielded_index layout): one LocalIndexServer
    per field, combined with the EXACT arithmetic of the Spark paths
    (operators/fields.multi_match_topk) so every result is
    bit-identical across tiers — the engine-wide parity contract.

    Accumulation-order parity notes (why results are bit-exact, not
    just close): per-field scores use _dense_scores' ascending-term
    accumulation (the Spark sorted fold); best_fields combines fields
    in sorted-field order (total += fs_f, best = max) exactly like the
    Spark sort_array'd struct fold; cross_fields accumulates
    w_t · max_f(boost_f · tfn) per ascending term."""

    def __init__(self, path: str):
        with open(os.path.join(path, "fields.json")) as f:
            self.manifest = json.load(f)
        self.sub = {
            field: LocalIndexServer(os.path.join(path, f"field={field}"))
            for field in self.manifest["fields"]
        }
        self.primary = self.sub[self.manifest["fields"][0]]

    @property
    def n_docs(self) -> int:
        return self.primary.n_docs

    def multi_match(
        self,
        query: str,
        boosts: dict[str, float],
        k: int = 10,
        mode: str = "best_fields",
        tie_breaker: float = 0.0,
    ) -> list[tuple[str, int, float]]:
        from ics_search_engine_spark.operators.query import (
            idf_weights,
            py_idf,
        )

        if mode not in ("best_fields", "cross_fields"):
            raise ValueError(f"unknown multi_match mode: {mode}")
        do_stem = self.manifest.get("stem", True)
        qtf: dict[str, int] = {}
        for t in tokenize(query, for_query=True, do_stem=do_stem):
            qtf[t] = qtf.get(t, 0) + 1
        if not qtf:
            return []
        terms = sorted(qtf)
        fields = sorted(boosts)
        n = self.n_docs

        if mode == "best_fields":
            total = np.zeros(n, dtype=np.float64)
            best = np.full(n, -np.inf, dtype=np.float64)
            any_t = np.zeros(n, dtype=bool)
            for f in fields:
                srv = self.sub[f]
                term_df = {
                    t: int(srv.df[t]) for t in terms if t in srv.df
                }
                weights = idf_weights(qtf, term_df, srv.n_docs)
                if not weights:
                    continue
                s, touched = srv._dense_scores(
                    weights, srv.stats["avgdl"]
                )
                fs = boosts[f] * s
                total[touched] += fs[touched]
                best[touched] = np.maximum(best[touched], fs[touched])
                any_t |= touched
            # combine only over touched docs: best is -inf elsewhere
            # and np.where would still evaluate (and warn on) the
            # dead branch over the full corpus width
            scores = np.zeros(n, dtype=np.float64)
            ati = np.flatnonzero(any_t)
            scores[ati] = best[ati] + tie_breaker * (total[ati] - best[ati])
        else:  # cross_fields
            dfb = {
                t: max(int(self.sub[f].df.get(t, 0)) for f in fields)
                for t in terms
            }
            weights = {
                t: qtf[t] * py_idf(n, dfb[t]) for t in terms if dfb[t] > 0
            }
            if not weights:
                return []
            scores = np.zeros(n, dtype=np.float64)
            any_t = np.zeros(n, dtype=bool)
            for t in sorted(weights):
                btfn = np.zeros(n, dtype=np.float64)
                t_touch = np.zeros(n, dtype=bool)
                for f in fields:
                    srv = self.sub[f]
                    avgdl = srv.stats["avgdl"]
                    for idx, tf, dl in srv._decoded(t):
                        cand = boosts[f] * srv._tfn(tf, dl, avgdl)
                        np.maximum.at(btfn, idx, cand)
                        t_touch[idx] = True
                scores[t_touch] += weights[t] * btfn[t_touch]
                any_t |= t_touch

        ti = np.flatnonzero(any_t)
        if ti.size == 0:
            return []
        order = np.lexsort((ti, -scores[ti]))[:k]
        sel = ti[order]
        p = self.primary
        return [
            (str(p._conv[i]), int(p._turn[i]), float(scores[i]))
            for i in sel
        ]


class LocalPercolator:
    """In-process percolation — the serving half of
    operators/percolate: queries registered once, each NEW document
    matched in microseconds with no Spark session (the single-doc
    alerting hot path; the Spark operators are the bulk/stream path).

    Same contract as the distributed forms: query-mode tokenization
    (stop-only queries can never match and are dropped at
    registration), doc terms are index-mode distinct, required =
    n_terms for ``min_match="all"`` else min(n_terms, m).  Parity with
    operators/percolate.percolate is pinned by tests on the same
    corpus.

    Structure: term → [query ordinal] postings over the registered
    queries (the same inversion build_query_index performs), so a doc
    costs O(distinct terms × avg postings) counter bumps, independent
    of the registry size."""

    def __init__(self, queries: list[tuple], do_stem: bool = True,
                 min_match="all"):
        from ics_search_engine_spark.textproc.tokenizer import tokenize

        if min_match != "all" and (
            not isinstance(min_match, int) or min_match < 1
        ):
            raise ValueError(
                f"min_match must be 'all' or a positive int, got "
                f"{min_match!r}"
            )
        seen = set()
        for qid, _ in queries:
            if qid in seen:
                raise ValueError(f"duplicate query_id: {qid}")
            seen.add(qid)
        self._tokenize = tokenize
        self._do_stem = do_stem
        self._min_match = min_match
        self._qids: list = []
        self._n_terms: list[int] = []
        self._required: list[int] = []
        self._postings: dict[str, list[int]] = {}
        for qid, text in queries:
            terms = sorted(set(
                tokenize(text or "", for_query=True, do_stem=do_stem)
            ))
            if not terms:
                continue  # stop-only: can never match
            ord_ = len(self._qids)
            self._qids.append(qid)
            n = len(terms)
            self._n_terms.append(n)
            self._required.append(
                n if min_match == "all" else min(n, int(min_match))
            )
            for t in terms:
                self._postings.setdefault(t, []).append(ord_)

    def percolate(self, text: str) -> list[tuple]:
        """→ [(query_id, matched, n_terms)] for every registered query
        the document satisfies, query-registration order."""
        doc_terms = set(self._tokenize(
            text or "", for_query=False, do_stem=self._do_stem
        ))
        counts: dict[int, int] = {}
        for t in doc_terms:
            for o in self._postings.get(t, ()):
                counts[o] = counts.get(o, 0) + 1
        return [
            (self._qids[o], counts[o], self._n_terms[o])
            for o in sorted(counts)
            if counts[o] >= self._required[o]
        ]


class LocalVectorServer:
    """In-process vector search over a build_vector_index artifact
    (operators/vector_index) — pyarrow + numpy, no Spark at query
    time: the LocalIndexServer posture for embeddings.

    ``search(qvec, k)`` modes, driven by what the build enabled:
    * exact=True — brute-force cosine over the loaded vectors
      (bit-comparable to cosine_topk_bruteforce's math: same double
      dot/norm, ties by id asc);
    * exact=False — IVF probe (n_probe nearest cells, when built with
      cells) → ADC ranking over PQ codes (when built with codes) →
      exact cosine rerank of the n_candidates shortlist.  Without PQ
      the probed cells rerank exactly (pure IVF); without IVF the ADC
      scans all codes (pure PQ).

    Memory note: vectors load once per process (float64 n×d); at
    code-table-only scale pass ``load_vectors=False`` and serve
    ADC-only (approx scores, no rerank) — the 32× footprint saving is
    the artifact's point."""

    def __init__(self, path: str, load_vectors: bool = True):
        import json as _json
        import os as _os

        import numpy as _np
        import pyarrow.parquet as _pq

        with open(_os.path.join(path, "meta.json")) as f:
            self.meta = _json.load(f)
        tbl = _pq.read_table(_os.path.join(path, "vectors.parquet"))
        cols = set(tbl.column_names)
        self._ids = _np.asarray(tbl.column(self.meta["id_col"]))
        self._vecs = None
        if load_vectors:
            if self.meta["vec_col"] not in cols:
                raise ValueError("artifact carries no vector column")
            self._vecs = _np.array(
                tbl.column(self.meta["vec_col"]).to_pylist(),
                dtype=_np.float64,
            )
        self._cells = (
            _np.asarray(tbl.column("ivf_cell"))
            if "ivf_cell" in cols else None
        )
        self._codes = (
            _np.array(tbl.column("pq_codes").to_pylist(), dtype=_np.int64)
            if "pq_codes" in cols else None
        )
        self._q8 = (
            _np.array(tbl.column("q_codes").to_pylist(), dtype=_np.float64)
            if "q_codes" in cols else None
        )
        self._bin = (
            _np.array(tbl.column("b_codes").to_pylist(), dtype=_np.uint32)
            if "b_codes" in cols else None
        )
        # 16-bit popcount table (numpy<2 has no bitwise_count)
        self._pop16 = _np.array(
            [bin(i).count("1") for i in range(1 << 16)], dtype=_np.uint8
        ) if self._bin is not None else None
        self._cents = None
        self._books = None
        cents_p = _os.path.join(path, "cents.npy")
        if _os.path.exists(cents_p):
            self._cents = _np.load(cents_p)
        books_p = _os.path.join(path, "codebooks.npy")
        if _os.path.exists(books_p):
            self._books = _np.load(books_p)
        if (self._vecs is None and self._codes is None
                and self._q8 is None and self._bin is None):
            raise ValueError(
                "load_vectors=False requires a PQ-, int8- or binary-"
                "coded artifact"
            )

    def _order(self, keys, ids):
        import numpy as _np

        return _np.lexsort((ids, keys))

    def _int8_shortlist(self, q, sel, n):
        """Approx cosine from the int8 tier (codes only; per-vector
        scales cancel in cosine) → indices into sel of the top-n by
        (approx desc, id asc) — the numpy twin of
        operators/similarity.cosine_topk_int8."""
        import numpy as _np

        mx = float(_np.max(_np.abs(q))) if len(q) else 0.0
        qc = _np.round(q / (mx / 127.0)) if mx > 0 else _np.zeros_like(q)
        C = self._q8[sel]
        dn = _np.sqrt((C * C).sum(axis=1))
        qn = float(_np.sqrt(qc @ qc)) or 1.0
        with _np.errstate(divide="ignore", invalid="ignore"):
            cos = _np.where(dn > 0, (C @ qc) / (dn * qn), 0.0)
        return self._order(-cos, self._ids[sel])[:n], cos

    def _binary_shortlist(self, q, sel, n):
        """Hamming distance from the 1-bit tier (popcount of xor via
        the 16-bit table) → top-n indices into sel by (hamming asc,
        id asc) — the numpy twin of operators/similarity.
        hamming_topk_binary."""
        import numpy as _np

        # sign-pack the query (same layout as similarity._query_bin_words;
        # repeated locally so serving keeps zero operator imports)
        words = []
        for w in range((len(q) + 31) // 32):
            word = 0
            for j in range(min(32, len(q) - 32 * w)):
                if q[32 * w + j] > 0:
                    word |= 1 << j
            words.append(word)
        qw = _np.array(words, dtype=_np.uint32)
        x = self._bin[sel] ^ qw[None, :]
        ham = (
            self._pop16[x & 0xFFFF].astype(_np.int64)
            + self._pop16[x >> 16].astype(_np.int64)
        ).sum(axis=1)
        return self._order(ham, self._ids[sel])[:n], ham

    def search(
        self,
        qvec,
        k: int = 10,
        exact: bool = True,
        n_probe: int = 4,
        n_candidates: int = 100,
        tier: str | None = None,
    ) -> list[tuple]:
        """→ [(id, cosine)] score desc, id asc — except the
        no-vectors ADC-only mode, which returns [(id, approx_d2)]
        distance ASC (documented: approx, smaller is better), and the
        no-vectors int8 mode, which returns [(id, approx_cosine)]
        desc.

        ``tier`` picks the approximate scorer when the artifact
        carries more than one: "pq", "int8" or "binary" (default:
        first of pq / int8 / binary the artifact carries); the
        no-vectors binary mode returns [(id, hamming)] distance ASC."""
        import numpy as _np

        q = _np.asarray(qvec, dtype=_np.float64)
        sel = _np.arange(len(self._ids))
        if tier not in (None, "pq", "int8", "binary"):
            raise ValueError(f"unknown tier: {tier}")
        if tier == "pq" and self._codes is None:
            raise ValueError("artifact carries no PQ codes")
        if tier == "int8" and self._q8 is None:
            raise ValueError("artifact carries no int8 tier")
        if tier == "binary" and self._bin is None:
            raise ValueError("artifact carries no binary tier")
        if tier is None:
            tier = (
                "pq" if self._codes is not None
                else "int8" if self._q8 is not None
                else "binary"
            )
        if not exact and self._cents is not None:
            d2 = ((self._cents - q[None, :]) ** 2).sum(axis=1)
            probe = set(
                int(c) for c in _np.argsort(d2)[:n_probe]
            )
            mask = _np.isin(self._cells, list(probe))
            sel = sel[mask]
        if not exact and tier == "int8" and self._q8 is not None:
            order, cos = self._int8_shortlist(q, sel, n_candidates)
            if self._vecs is None:
                top = order[:k]
                return [
                    (self._ids[sel][i].item(), float(cos[i])) for i in top
                ]
            sel = sel[order]
        elif not exact and tier == "binary" and self._bin is not None:
            order, ham = self._binary_shortlist(q, sel, n_candidates)
            if self._vecs is None:
                top = order[:k]
                return [
                    (self._ids[sel][i].item(), int(ham[i])) for i in top
                ]
            sel = sel[order]
        elif not exact and self._codes is not None:
            m, kc, dsub = self._books.shape
            lut = _np.stack([
                ((self._books[i] - q[i * dsub:(i + 1) * dsub][None, :]) ** 2)
                .sum(axis=1)
                for i in range(m)
            ])
            d = _np.take_along_axis(
                lut, self._codes[sel].T, axis=1
            ).sum(axis=0)
            if self._vecs is None:
                order = self._order(d, self._ids[sel])[:k]
                return [
                    (self._ids[sel][i].item(), float(d[i]))
                    for i in order
                ]
            short = self._order(d, self._ids[sel])[:n_candidates]
            sel = sel[short]
        if self._vecs is None:
            raise ValueError("exact search requires load_vectors=True")
        v = self._vecs[sel]
        qn = float(_np.sqrt(q @ q))
        cos = (v @ q) / (_np.sqrt((v * v).sum(axis=1)) * qn)
        order = self._order(-cos, self._ids[sel])[:k]
        return [
            (self._ids[sel][i].item(), float(cos[i])) for i in order
        ]


def _scroll_via(search_fn, after_fn, query, page_size, max_pages):
    """Shared scroll driver: page 1 via search, then stateless
    search_after chaining until a short page."""
    pages = 0
    cursor = None
    while max_pages is None or pages < max_pages:
        if cursor is None:
            page = search_fn(query, k=page_size)
        else:
            page = after_fn(query, cursor, k=page_size)
        if not page:
            return
        yield page
        pages += 1
        if len(page) < page_size:
            return
        last = page[-1]
        cursor = (float(last[2]), last[0], int(last[1]))


class LocalSparseServer:
    """In-process learned-sparse retrieval over a
    sparsevec.write_sparse_artifact directory — pyarrow + numpy, no
    Spark at query time: the LocalIndexServer posture for impact
    postings (ES serves sparse_vector from the same inverted index as
    BM25; so does this engine).

    The artifact is term-sorted parquet, so the per-query read pushes
    ``term IN (query terms)`` down to row-group statistics — a query
    touches its own terms' row groups, never the corpus.  Scores are
    bit-identical to operators/sparsevec.sparse_topk (tested): the
    per-doc fold sums contributions in ascending-term order via
    ``np.add.reduceat`` over a (key..., term)-mergesorted frame — the
    same left-to-right order as the Spark sorted-term fold.

    ``search(qweights, k, weight_threshold, rescore_window)`` mirrors
    sparse_topk's prune contract: high-weight query tokens build the
    shortlist, ALL tokens rescore it (exact scores, window-bounded
    set)."""

    def __init__(self, path: str, key_cols: tuple = ("conv_id", "turn_idx")):
        self.path = path
        self.key_cols = list(key_cols)

    def _matched(self, terms: list[str]):
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        return pq.read_table(
            self.path,
            columns=["term", *self.key_cols, "weight"],
            filters=pc.field("term").isin(terms),
        )

    def _fold(self, tbl, qw: dict[str, float], k: int | None):
        """(key..., term)-sorted reduceat fold → top-k [(keys..., score)]."""
        pdf = tbl.to_pandas()
        if len(pdf) == 0:
            return []
        pdf["contrib"] = pdf["weight"].to_numpy() * pdf["term"].map(qw).to_numpy()
        pdf = pdf.sort_values(
            [*self.key_cols, "term"], kind="mergesort", ignore_index=True
        )
        keys = pdf[self.key_cols]
        # boundary where ANY key column changes vs previous row
        change = np.zeros(len(pdf), dtype=bool)
        change[0] = True
        for c in self.key_cols:
            vals = keys[c].to_numpy()
            change[1:] |= vals[1:] != vals[:-1]
        starts = np.flatnonzero(change)
        sums = np.add.reduceat(pdf["contrib"].to_numpy(), starts)
        rows = [
            (*(keys.iloc[s][c] for c in self.key_cols), float(v))
            for s, v in zip(starts, sums)
        ]
        rows.sort(key=lambda r: (-r[-1], r[:-1]))
        return rows if k is None else rows[:k]

    def search(
        self,
        qweights: dict[str, float],
        k: int = 10,
        weight_threshold: float | None = None,
        rescore_window: int | None = None,
    ) -> list[tuple]:
        if not qweights:
            return []
        if weight_threshold is None:
            return self._fold(self._matched(sorted(qweights)), qweights, k)
        if not 0.0 < weight_threshold <= 1.0:
            raise ValueError(
                f"weight_threshold={weight_threshold} not in (0, 1]"
            )
        cut = weight_threshold * max(qweights.values())
        head = {t: w for t, w in qweights.items() if w >= cut}
        window = max(k, rescore_window or k)
        short = self._fold(self._matched(sorted(head)), head, window)
        allowed = {r[:-1] for r in short}
        full = self._matched(sorted(qweights))
        pdf = full.to_pandas()
        mask = [
            tuple(row) in allowed
            for row in pdf[self.key_cols].itertuples(index=False)
        ]
        import pyarrow as pa

        return self._fold(
            pa.Table.from_pandas(pdf[mask], preserve_index=False),
            qweights, k,
        )


class LocalSparseMaxScore(LocalSparseServer):
    """TAAT MaxScore early termination over the sparse artifact — the
    impact-postings analog of the packed index's block-max WAND
    (serving module docstring): per-term upper bounds prune work, the
    RESULT stays exactly the exhaustive top-k.

    Term-at-a-time MaxScore (Turtle & Flood 1995): process query terms
    in DESCENDING max-contribution order (ub_t = qw_t · max weight of
    t's postings — read from parquet row-group statistics, no payload
    decode).  After the accumulator holds k candidates, a term whose
    remaining-UB sum ``Σ_{t' from t} ub_{t'}`` cannot lift a NEW doc
    past the current k-th partial score stops ADMITTING new docs —
    its postings only update docs already in the accumulator (the
    non-candidates provably cannot reach the top-k: their final score
    ≤ remaining-UB sum < θ ≤ their needed bar).  Final scores of
    surviving candidates are the full fold, so ranking and floats are
    IDENTICAL to the exhaustive path (tested), with fewer accumulator
    insertions — and, when a tail term's postings are only needed for
    an already-small candidate set, a semi-join-sized read instead of
    a full posting list.

    ``stats`` (optional dict) receives counters: terms_processed,
    postings_seen, postings_admitted, terms_update_only.
    """

    def search_maxscore(
        self,
        qweights: dict[str, float],
        k: int = 10,
        stats: dict | None = None,
    ) -> list[tuple]:
        if not qweights:
            return []
        # per-term ub from the artifact (term-pruned read of the
        # weight column only; max() per term)
        tbl = self._matched(sorted(qweights))
        pdf = tbl.to_pandas()
        if len(pdf) == 0:
            return []
        mx = pdf.groupby("term")["weight"].max()
        order = sorted(
            (t for t in qweights if t in mx.index),
            key=lambda t: (-qweights[t] * mx[t], t),
        )
        ubs = [qweights[t] * float(mx[t]) for t in order]
        suffix = [0.0] * (len(ubs) + 1)
        for i in range(len(ubs) - 1, -1, -1):
            suffix[i] = suffix[i + 1] + ubs[i]

        acc: dict[tuple, list] = {}  # key -> [partial, terms-seen]
        n_seen = n_admit = n_upd_only = 0
        by_term = dict(tuple(g) for g in pdf.groupby("term"))
        for i, t in enumerate(order):
            g = by_term[t]
            keys = list(
                zip(*(g[c].tolist() for c in self.key_cols))
            )
            ws = g["weight"].tolist()
            n_seen += len(keys)
            # admission closes when k candidates exist AND a brand-new
            # doc's best possible score (all remaining terms at max)
            # cannot beat the current k-th PARTIAL (partials only grow)
            if len(acc) >= k:
                theta = sorted((v[0] for v in acc.values()),
                               reverse=True)[k - 1]
                # strict <: a doc first seen here ends STRICTLY below
                # the k-th candidate's final score, so not even the
                # key-asc tie-break could admit it.  (>= keeps the
                # exact-tie case, where tie-break order matters.)
                admit = suffix[i] >= theta
            else:
                admit = True
            if not admit:
                n_upd_only += 1
            qw = qweights[t]
            for key, w in zip(keys, ws):
                if key in acc:
                    acc[key][0] += qw * w
                    acc[key][1].append((t, qw * w))
                elif admit:
                    acc[key] = [qw * w, [(t, qw * w)]]
                    n_admit += 1
        if stats is not None:
            stats.update(
                terms_processed=len(order),
                postings_seen=n_seen,
                postings_admitted=n_admit,
                terms_update_only=n_upd_only,
            )
        # exact final scores: refold each candidate ascending-term so
        # floats match the exhaustive/Spark fold bit-for-bit
        rows = []
        for key, (_, parts) in acc.items():
            s = 0.0
            for _, c in sorted(parts):
                s += c
            rows.append((*key, s))
        rows.sort(key=lambda r: (-r[-1], r[:-1]))
        return rows[:k]


class LocalSparsePackedServer:
    """Hot-path sparse serving: the artifact loads ONCE into per-term
    numpy posting arrays (doc-ordinal + weight), and a query is pure
    vectorized accumulation into a dense score array — the same
    packed/numpy posture as LocalIndexServer, for the sparse tier.

    Load time: one pyarrow read + a sorted key factorization (ordinal
    ascending == key ascending, so ordinal order IS the tie-break).
    Query: for each query term in ASCENDING term order,
    ``dense[ords] += qw·weights`` (postings are unique per (term, doc)
    — no scatter-add collision), then one lexsort top-k.  Per-doc
    accumulation order is therefore ascending-term — the SAME order as
    the Spark sorted-term fold and the reduceat server, so scores are
    bit-identical to both (tested).

    This is the serving posture the wave-24 bench notes call for: the
    pandas-dict servers above are the readable reference
    implementations the gates pin; this one is the ms-range hot path.
    Memory: O(total postings) int32+float64 — the per-shard serving
    budget, sharded exactly like LocalIndexServer at corpus scale."""

    def __init__(self, path: str, key_cols: tuple = ("conv_id", "turn_idx")):
        from ics_search_engine_spark.sources.catalog import read_arrow_table

        self.key_cols = list(key_cols)
        tbl = read_arrow_table(path, columns=["term", *self.key_cols,
                                              "weight"])
        pdf = tbl.to_pandas()
        keys = list(pdf[self.key_cols].itertuples(index=False, name=None))
        uniq = sorted(set(keys))
        ord_of = {kk: i for i, kk in enumerate(uniq)}
        self._keys = uniq
        ords = np.fromiter(
            (ord_of[kk] for kk in keys), dtype=np.int64, count=len(keys)
        )
        ws = pdf["weight"].to_numpy(dtype=np.float64)
        self.postings: dict[str, tuple[np.ndarray, np.ndarray]] = {}
        terms = pdf["term"].to_numpy()
        order = np.argsort(terms, kind="stable")
        terms_s, ords_s, ws_s = terms[order], ords[order], ws[order]
        bounds = np.flatnonzero(
            np.concatenate(([True], terms_s[1:] != terms_s[:-1]))
        )
        for s, e in zip(bounds, list(bounds[1:]) + [len(terms_s)]):
            self.postings[terms_s[s]] = (ords_s[s:e], ws_s[s:e])

    @property
    def n_docs(self) -> int:
        return len(self._keys)

    def search(self, qweights: dict[str, float], k: int = 10) -> list[tuple]:
        if not qweights:
            return []
        dense = np.zeros(len(self._keys), dtype=np.float64)
        seen = np.zeros(len(self._keys), dtype=bool)
        hit = False
        for t in sorted(qweights):
            p = self.postings.get(t)
            if p is None:
                continue
            hit = True
            ords, ws = p
            dense[ords] += qweights[t] * ws
            seen[ords] = True
        if not hit:
            return []
        cand = np.flatnonzero(seen)
        scores = dense[cand]
        top = np.lexsort((cand, -scores))[:k]
        return [(*self._keys[cand[i]], float(scores[i])) for i in top]
