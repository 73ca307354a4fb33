"""Segmented incremental indexing — grow the index without rebuilding.

The reference's only merge story is its partial-file union at build time
(/root/reference/components/index_manager.py:95-179); once built, new
documents mean a full re-index (and its mutable doc_id counter,
indexer.py:32,76, would renumber everything).  Here new data becomes a
NEW SEGMENT: an independent packed index built by the normal pipeline
(operators/build.py / build_packed_index) over just the delta.  Queries
run against the segment set and are **bit-identical to a full rebuild
over the union**, because every BM25 input recombines exactly:

    N      = Σ n_docs(segment)           (exact ints)
    avgdl  = Σ sum_dl(segment) / N       (exact int sum, one division —
                                          the same float the full build
                                          computes, hence bit-equal)
    df(t)  = Σ df(t, segment)            (exact ints)
    tf, dl  are per-document — segment-local by construction

Per-segment scoring reuses the shard-local scorer with the GLOBAL
weights/avgdl; each segment returns its top-k and the driver merges,
resolving docIDs per segment and breaking exact-score ties on
(conv_id, turn_idx) like the oracle.  ``compact_segments`` rewrites
many small segments into one at the POSTINGS level (decode → re-rank
ordinals → repack; no re-tokenize), byte-identical to a fresh full
build — queries do not require compaction, it just bounds per-query
segment fan-out.

Scale note: segments multiply per-query metadata lookups and payload
fetches by the segment count, the classic LSM/Lucene trade; the
compaction cadence bounds it.  Docs must not straddle segments
(segment = set of whole conversations — same invariant as the build's
conv-hash buckets).

**Document update (upsert).**  The reference's only update story is a
full re-index (its mutable doc_id counter renumbers everything,
/root/reference/indexer.py:32,76).  Here an update is Lucene's
``updateDocument``: the new version lands in a NEW segment built by
``build_upsert_segment``, which also writes ``supersedes.json`` — the
delta's doc keys, i.e. a declaration that any OLDER segment's version
of those keys is dead.  The segment list order is AGE order (older
first); a key's live version is the one in the newest declaring
segment.  Query semantics mirror the delete contract exactly:

* superseded versions vanish from RESULTS exactly (each shard
  over-fetches k + |shadows| candidates, so even if every dead version
  outranked the true top-k the survivors are correct);
* collection stats (N, Σdl, df) count BOTH versions until a compaction
  applies the declarations physically — the same pre-merge staleness
  Lucene accepts — after which the index is byte-identical to a fresh
  build over the latest-wins corpus (tested);
* a ``supersedes.json`` entry whose key the segment does NOT contain
  acts as a segment-carried tombstone (delete with no new version).

Shadow declarations are driver-resident (a dict, like Lucene's
liveDocs); their size is the number of updates since the last
compaction, which the compaction cadence bounds.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ics_search_engine_spark.operators.docmap import assign_doc_ordinals
from ics_search_engine_spark.sources import catalog
from ics_search_engine_spark.operators.index_build import DOC_KEY
from ics_search_engine_spark.operators.packed_index import (
    PackedIndex,
    decode_matched,
    pack_shards,
)
from ics_search_engine_spark.operators.query import query_weights
from ics_search_engine_spark.textproc.tokenizer import tokenize


SUPERSEDES_FILE = "supersedes.json"


def load_supersedes(seg_path: str) -> set[tuple[str, int]]:
    """The doc keys whose older-segment versions this segment declares
    dead (empty set when the segment was a plain add)."""
    import json as _json
    import os as _os

    p = _os.path.join(seg_path, SUPERSEDES_FILE)
    if not _os.path.exists(p):
        return set()
    with open(p) as f:
        return {(str(c), int(t)) for c, t in _json.load(f)}


def write_supersedes(seg_path: str, keys: set[tuple[str, int]]) -> None:
    import json as _json
    import os as _os

    with open(_os.path.join(seg_path, SUPERSEDES_FILE), "w") as f:
        _json.dump(sorted(keys), f)


def build_upsert_segment(
    spark: SparkSession,
    transcripts: DataFrame,
    out_dir: str,
    **build_kw,
) -> set[tuple[str, int]]:
    """Ingest a delta of UPDATED documents as a new segment: the normal
    packed build over just the delta, plus a ``supersedes.json``
    declaring every delta key — Lucene's updateDocument (delete-by-term
    + add), which never reads the older segments at ingest time.  Use
    the plain ``build_packed_index`` for pure adds (no declaration, no
    query-time shadow cost).  Returns the declared key set.

    The declaration is collected from the freshly written docmap —
    bounded by the DELTA's size (the thing that is small by LSM
    construction), never the corpus.
    """
    from ics_search_engine_spark.operators.packed_index import (
        build_packed_index,
    )

    build_packed_index(spark, transcripts, out_dir, **build_kw)
    dm = catalog.read_table(spark, f"{out_dir}/docmap")
    keys = {
        (r["conv_id"], int(r["turn_idx"]))
        for r in dm.select(*DOC_KEY).collect()
    }
    write_supersedes(out_dir, keys)
    return keys


def live_matched(
    spark: SparkSession,
    sidx: "SegmentedIndex",
    query: str,
    conjunctive: bool = False,
) -> DataFrame:
    """The LIVE match set of a segmented index → (conv_id, turn_idx):
    each segment's match set evaluated independently (a doc version
    lives wholly in one segment), then versions superseded by a newer
    segment dropped — the shadow-aware front half shared by
    ``delete_by_query`` and ``update_by_query``, so a key whose live
    version does not match never enters either verb just because a
    dead older version did."""
    from ics_search_engine_spark.operators.facets import matched_docs

    per_seg = []
    for i, seg in enumerate(sidx.segments):
        m = matched_docs(spark, seg, query, conjunctive=conjunctive)
        per_seg.append(
            seg.docmap.join(m, "doc_ord")
            .select(*DOC_KEY)
            .withColumn("seg", F.lit(i))
        )
    matched = per_seg[0]
    for m in per_seg[1:]:
        matched = matched.unionByName(m)
    return _apply_shadows(spark, matched, sidx.shadows)


def update_by_query(
    spark: SparkSession,
    sidx: "SegmentedIndex",
    query: str,
    transcripts: DataFrame,
    transform,
    out_dir: str,
    max_docs: int = 100_000,
    conjunctive: bool = False,
    **build_kw,
) -> set[tuple[str, int]]:
    """Mass update by MATCH SET (the Elasticsearch _update_by_query
    verb): every live document matching ``query`` is re-read from
    ``transcripts`` (the source-of-truth doc store — ES reads _source
    the same way), rewritten by ``transform``, and re-ingested as an
    upsert segment whose supersedes.json shadows the old versions —
    the script-per-matched-doc verb expressed as delete-by-term + add,
    never an in-place mutation.

    ``transform`` is a callable DataFrame → DataFrame over the matched
    slice of ``transcripts``; it must PRESERVE the (conv_id, turn_idx)
    keys (ES scripts cannot change _id either — enforced here by a
    count check, the cheap invariant) and keep a ``text`` column.

    Same contract as upsert: results reflect the new text from the
    next query on; collection stats (N, avgdl, df) count both versions
    until ``compact_segments``.  ``max_docs`` bounds the declaration
    exactly as in ``delete_by_query``.  Returns the declared key set.

    Scale shape: the only driver-resident piece is the declared key
    set (bounded by ``max_docs``); the rewrite itself is a distributed
    join (live keys × doc store) + the normal delta-sized packed
    build.
    """
    live = live_matched(spark, sidx, query, conjunctive=conjunctive)
    n = live.count()
    if n > max_docs:
        raise ValueError(
            f"update_by_query matched {n} docs > max_docs={max_docs}; "
            "rebuild with the transform applied instead"
        )
    if n == 0:
        return set()
    delta = transcripts.join(live.select(*DOC_KEY), DOC_KEY)
    updated = transform(delta)
    missing = [c for c in (*DOC_KEY, "text") if c not in updated.columns]
    if missing:
        raise ValueError(f"transform dropped required columns: {missing}")
    updated = updated.select(*DOC_KEY, "text")
    if updated.count() != n:
        raise ValueError(
            "transform changed the matched row count — update_by_query "
            "must preserve (conv_id, turn_idx) keys"
        )
    build_kw.setdefault("stem", sidx.segments[0].stats.get("stem", True))
    return build_upsert_segment(spark, updated, out_dir, **build_kw)


def delete_by_query(
    spark: SparkSession,
    sidx: "SegmentedIndex",
    query: str,
    out_dir: str,
    max_docs: int = 100_000,
    conjunctive: bool = False,
    **build_kw,
) -> set[tuple[str, int]]:
    """Mass deletion by MATCH SET (the Elasticsearch _delete_by_query
    verb): every live document matching ``query`` is declared dead via
    a tombstone-only segment — an EMPTY packed segment whose
    supersedes.json carries the matched keys (the segment-carried
    tombstone form, module docstring).  Results shrink exactly from the
    next query on; stats stay pre-delete until ``compact_segments``
    applies the declarations physically — the same contract as upsert.

    Matching is SHADOW-AWARE: each segment's match set is evaluated
    independently (a doc lives wholly in one segment), then versions
    already superseded by a newer segment are dropped — so a key whose
    LIVE version does not match is never deleted just because a dead
    older version did.

    ``max_docs`` bounds the declaration (shadow sets are
    driver-resident, like Lucene's liveDocs): the match set is COUNTED
    first and the call refuses above the cap.  A corpus-sized deletion
    is a retention rewrite, not an LSM verb — run
    ``compact_segments(deletes=...)`` with the predicate instead.

    Returns the declared key set.
    """
    from ics_search_engine_spark.operators.packed_index import (
        build_packed_index,
    )

    live = live_matched(spark, sidx, query, conjunctive=conjunctive)
    n = live.count()
    if n > max_docs:
        raise ValueError(
            f"delete_by_query matched {n} docs > max_docs={max_docs}; "
            "use compact_segments(deletes=...) for a retention rewrite"
        )
    keys = {
        (r["conv_id"], int(r["turn_idx"]))
        for r in live.select(*DOC_KEY).collect()
    }
    build_kw.setdefault("stem", sidx.segments[0].stats.get("stem", True))
    empty = spark.createDataFrame(
        [], "conv_id string, turn_idx int, text string"
    )
    build_packed_index(spark, empty, out_dir, **build_kw)
    write_supersedes(out_dir, keys)
    return keys


class SegmentedIndex:
    """A list of PackedIndex segments queried as one logical index.
    Path order is AGE order (older first) — upsert shadowing resolves
    a recurring doc key to its newest declaring segment."""

    def __init__(self, spark: SparkSession, paths: list[str]):
        if not paths:
            raise ValueError("need at least one segment")
        self.spark = spark
        self.segments = [PackedIndex(spark, p) for p in paths]
        # key -> newest segment ordinal declaring it (versions in older
        # segments are dead); segment 0 can declare nothing older
        self.shadows: dict[tuple[str, int], int] = {}
        for i, p in enumerate(paths):
            if i == 0:
                continue
            for key in load_supersedes(p):
                self.shadows[key] = max(self.shadows.get(key, -1), i)
        s0 = self.segments[0].stats
        for s in self.segments[1:]:
            if s.stats.get("stem", True) != s0.get("stem", True):
                raise ValueError("segments disagree on stemming")
        self.n_docs = sum(s.n_docs for s in self.segments)
        # bit-parity contract: the global avgdl is an exact integer sum
        # over segment sum_dl — an approximated segment would silently
        # poison every score, so a missing sum_dl is a hard error
        for s in self.segments:
            if "sum_dl" not in s.stats:
                raise ValueError(
                    f"segment {s.path} stats.json lacks sum_dl; "
                    "rebuild it — avgdl reconstruction must be exact"
                )
        self.sum_dl = sum(int(s.stats["sum_dl"]) for s in self.segments)
        self.avgdl = self.sum_dl / self.n_docs if self.n_docs else 0.0
        self.stem = s0.get("stem", True)

    def cache(self) -> "SegmentedIndex":
        for s in self.segments:
            s.cache()
        return self

    def df_for_terms(self, terms: list[str]) -> dict[str, int]:
        if not terms:
            return {}
        # cached segments answer from driver-resident maps — zero jobs
        if all(s._term_df_map is not None for s in self.segments):
            out: dict[str, int] = {}
            for s in self.segments:
                for t, df in s.df_for_terms(terms).items():
                    out[t] = out.get(t, 0) + df
            return out
        # otherwise ONE pushed-down job over the term_stats union —
        # never a collect per segment
        u = None
        for s in self.segments:
            t = s.term_stats.filter(F.col("term").isin(terms))
            u = t if u is None else u.unionByName(t)
        return {
            r["term"]: int(r["df"])
            for r in u.groupBy("term").agg(F.sum("df").alias("df")).collect()
        }


def _dm_union(sidx: SegmentedIndex) -> DataFrame:
    """Tagged union of every segment's docmap: (seg, doc_ord, conv_id,
    turn_idx) — the shared resolution side for segment-local winner
    ordinals."""
    out = None
    for i, seg in enumerate(sidx.segments):
        d = seg.docmap.select(
            F.lit(i).alias("seg"), "doc_ord", "conv_id", "turn_idx"
        )
        out = d if out is None else out.unionByName(d)
    return out


def _matched_union(sidx: SegmentedIndex, terms: list[str]) -> DataFrame:
    """Tagged union of every segment's matched index rows for the term
    set: (seg, term, shard_id, payload) — one term-IN pushdown per
    branch, one plan."""
    out = None
    for i, seg in enumerate(sidx.segments):
        m = seg.index.filter(F.col("term").isin(terms)).select(
            F.lit(i).alias("seg"), "term", "shard_id", "payload"
        )
        out = m if out is None else out.unionByName(m)
    return out


def _segment_shard_scorer(
    qw_items: list[tuple[str, list[tuple[str, float]]]],
    rbs: dict[int, int],
    avgdl: float,
    fetch: int,
    ceiling: float | None = None,
):
    """THE segment shard-scoring kernel, shared by the single- and
    multi-query paths: decode each (term, payload) once, accumulate
    every query's scores in ascending term order (oracle bit-parity)
    into a dense per-shard array, emit each query's local top-``fetch``
    as (query_id, seg, doc_ord, score).

    ``ceiling`` (search_after cursor support): when set, rows scoring
    ABOVE it are dropped before the top-``fetch`` cut — they rank
    before the cursor, so keeping them would let already-served rows
    consume candidate slots and silently starve a deep page.  Rows
    scoring EXACTLY the ceiling are ALL emitted (uncut): the cursor
    tie-break needs (conv_id, turn_idx), which only resolution knows,
    so the boundary tie class must survive to the resolver — the same
    exposure as _bounded_winners' boundary re-fetch."""
    import numpy as np
    import pandas as pd

    from ics_search_engine_spark.functions.codec import unpack_postings
    from ics_search_engine_spark.operators.packed_index import _tfn

    def score_group(pdf: pd.DataFrame) -> pd.DataFrame:
        seg = int(pdf["seg"].iloc[0])
        rb = rbs[seg]
        size = 1 << rb
        base = int(pdf["shard_id"].iloc[0]) << rb
        decoded: dict = {}
        for t, p in zip(pdf["term"], pdf["payload"]):
            d, tf, dl, _ = unpack_postings(bytes(p), with_positions=False)
            decoded[t] = (d.astype(np.int64) - base, _tfn(tf, dl, avgdl))
        out_q, out_seg, out_o, out_s = [], [], [], []
        scores = np.zeros(size, dtype=np.float64)
        for qid, wts in qw_items:
            scores[:] = 0.0
            touched = np.zeros(size, dtype=bool)
            for t, w in wts:  # ascending term order -> oracle bit-parity
                hit = decoded.get(t)
                if hit is None:
                    continue
                idx, tfn = hit
                scores[idx] += w * tfn
                touched[idx] = True
            ti = np.flatnonzero(touched)
            if ti.size == 0:
                continue
            if ceiling is not None:
                ti = ti[scores[ti] <= ceiling]
                if ti.size == 0:
                    continue
                eq = ti[scores[ti] == ceiling]
                lt = ti[scores[ti] < ceiling]
                order = np.lexsort((lt, -scores[lt]))[:fetch]
                sel = np.concatenate([eq, lt[order]])
            else:
                order = np.lexsort((ti, -scores[ti]))[:fetch]
                sel = ti[order]
            out_q.extend([qid] * len(sel))
            out_seg.extend([seg] * len(sel))
            out_o.extend((sel + base).tolist())
            out_s.extend(scores[sel].tolist())
        return pd.DataFrame(
            {"query_id": out_q, "seg": np.array(out_seg, dtype=np.int32),
             "doc_ord": np.array(out_o, dtype=np.int64),
             "score": np.array(out_s, dtype=np.float64)}
        )

    return score_group


_WINNER_SCHEMA = "query_id string, seg int, doc_ord long, score double"

# extra candidates fetched past the boundary so an exact-score tie on
# the k-th place is detected without a second pass in the common case
_TIE_OVERFETCH = 8


def _bounded_winners(
    winners: DataFrame, K: int, over: int = _TIE_OVERFETCH
) -> list:
    """Global top-(K+over) of a single query's winner rows, with the
    exact-tie completeness guarantee the (conv_id, turn_idx) tie-break
    needs: the job is TakeOrderedAndProject on (score desc, seg,
    doc_ord) shipping ≤ K+over rows; if the fetch window is full AND
    its last row ties the K-th score, every candidate at that score is
    re-fetched (sorted-desc prefix property: anything not collected
    scores ≤ the last collected row, so a strict drop below the K-th
    score proves completeness)."""
    cand = (
        winners.orderBy(F.desc("score"), F.asc("seg"), F.asc("doc_ord"))
        .limit(K + over)
        .collect()
    )
    if len(cand) == K + over and cand[-1]["score"] == cand[K - 1]["score"]:
        cand = winners.filter(
            F.col("score") >= cand[K - 1]["score"]
        ).collect()
    return cand


def _pushdown_lookup(
    sidx: SegmentedIndex, pairs: set[tuple[int, int]]
) -> dict[tuple[int, int], tuple[str, int]]:
    """Resolve (seg, doc_ord) pairs to (conv_id, turn_idx) via
    per-segment ``doc_ord IN (...)`` point lookups — the docmap is
    written SORTED by doc_ord, so parquet row-group min/max skip
    everything but the winners' groups; no segment's docmap is scanned
    in full.  ONE job over the union."""
    per_seg: dict[int, list[int]] = {}
    for s, o in pairs:
        per_seg.setdefault(s, []).append(o)
    parts = None
    for i, seg in enumerate(sidx.segments):
        ords = per_seg.get(i)
        if not ords:
            continue
        p = seg.docmap.filter(F.col("doc_ord").isin(ords)).select(
            F.lit(i).alias("seg"), "doc_ord", "conv_id", "turn_idx"
        )
        parts = p if parts is None else parts.unionByName(p)
    if parts is None:
        return {}
    return {
        (int(h["seg"]), int(h["doc_ord"])): (h["conv_id"], int(h["turn_idx"]))
        for h in parts.collect()
    }


def bm25_topk_segmented(
    spark: SparkSession,
    sidx: SegmentedIndex,
    query: str,
    k: int = 10,
    deletes: set[tuple[str, int]] | None = None,
    resolve: str = "join",
    after: tuple[float, str, int] | None = None,
) -> DataFrame:
    """Top-k BM25 across all segments → (conv_id, turn_idx, score),
    bit-identical to querying one index built over the union (tested).

    ``after``: search_after cursor ``(score, conv_id, turn_idx)`` — the
    last row of the previous page; returns the next ``k`` rows strictly
    after it in the engine's total order (score desc, conv_id, turn_idx),
    exactly like operators/query.bm25_topk_after on a single index.
    Cursor depth never inflates the plan: the shard kernel drops
    rows scoring above the cursor BEFORE its local top-``fetch`` cut
    (``ceiling``), so served rows cannot starve deep pages, and the
    boundary tie class (score == cursor score) is resolved in full so
    the (conv_id, turn_idx) tie-break is exact mid-tie.  Combined with
    a pinned segment list (operators/lifecycle.open_pit) this is the ES
    PIT + search_after scroll over the LSM index.

    ONE Spark job regardless of segment count (tested): matched index
    rows from every segment union into a single plan tagged with the
    segment ordinal; scoring is segment-local by construction (doc_ord
    spaces are per-segment), so ONE applyInPandas grouped by
    (seg, shard_id) produces every shard's local top candidates, docIDs
    resolve through a broadcast join against the tagged docmap union,
    and the global merge is Spark's TakeOrderedAndProject.  The driver
    never loops over segments at query time and never holds candidate
    rows — per-query latency does not grow a Spark-job per segment (the
    pre-compaction LSM tax is now just extra matched rows in one scan).

    ``deletes``: tombstoned docIDs, filtered out of the results
    EXACTLY — each shard over-fetches k + |deletes| candidates, so
    even if every tombstone outranked the true top-k the final k
    survivors are correct.  Like Lucene, BM25 stats (N, avgdl, df)
    stay pre-delete until a compaction applies tombstones physically
    (``compact_segments(deletes=...)``), after which the index is
    byte-identical to one never containing the deleted docs (tested).

    ``resolve``: "join" (default) resolves winners through ONE
    broadcast join against the tagged docmap union — one Spark job
    total, fastest while docmaps are scannable; "pushdown" bounds the
    winners to a global top-(K+ε) first (TakeOrderedAndProject, exact
    boundary-tie re-fetch) and point-looks-up only those doc_ords —
    two bounded jobs, NO full docmap scan, the 10^12-doc mode.
    Results are bit-identical between modes (tested).

    Upsert shadows (``sidx.shadows``, from supersedes.json) filter with
    the same exact over-fetch guarantee as ``deletes``: a version of a
    key from a segment older than its newest declaring segment never
    reaches the results; stats stay both-versions until compaction
    (module docstring).
    """
    empty = spark.createDataFrame(
        [], "conv_id string, turn_idx int, score double"
    )
    q_terms = sorted(set(tokenize(query, for_query=True, do_stem=sidx.stem)))
    if not q_terms:
        return empty
    term_df = sidx.df_for_terms(q_terms)
    weights = query_weights(query, term_df, sidx.n_docs, sidx.stem)
    if not weights:
        return empty

    shadows = sidx.shadows
    fetch = k + (len(deletes) if deletes else 0) + len(shadows)
    # range_bits may differ per segment (pre-compaction mixtures)
    rbs = {i: int(s.stats["range_bits"]) for i, s in enumerate(sidx.segments)}
    ceiling = float(after[0]) if after is not None else None
    scorer = _segment_shard_scorer(
        [("q", sorted(weights.items()))], rbs, sidx.avgdl, fetch,
        ceiling=ceiling,
    )
    winners = (
        _matched_union(sidx, q_terms)
        .groupBy("seg", "shard_id")
        .applyInPandas(scorer, _WINNER_SCHEMA)
        .drop("query_id")
    )

    if resolve == "pushdown":
        # Two bounded jobs instead of one docmap-union probe scan:
        # (1) global top-(K+ε) over the per-shard winners — a
        # TakeOrderedAndProject shipping ≤ K+ε rows, with an exact
        # boundary-tie re-fetch (ties break on (conv_id, turn_idx),
        # which only resolution provides, so every K-th-score tie must
        # be resolved); (2) per-segment doc_ord IN (...) point lookup.
        # The 10^12-doc mode: no docmap is ever scanned in full.
        K = k + (len(deletes) if deletes else 0) + len(shadows)
        if after is not None:
            # boundary tie class in full (tie-break needs keys), plus a
            # bounded fetch of the strictly-below class — two bounded
            # jobs, mirroring _bounded_winners' re-fetch guarantee
            cand = winners.filter(F.col("score") == ceiling).collect()
            cand += _bounded_winners(
                winners.filter(F.col("score") < ceiling), K
            )
        else:
            cand = _bounded_winners(winners, K)
        dmap = _pushdown_lookup(
            sidx, {(int(r["seg"]), int(r["doc_ord"])) for r in cand}
        )
        rows = [
            (
                int(r["seg"]),
                *dmap[(int(r["seg"]), int(r["doc_ord"]))],
                float(r["score"]),
            )
            for r in cand
        ]
        if shadows:
            rows = [
                r for r in rows
                if shadows.get((r[1], r[2]), -1) <= r[0]
            ]
        rows = [r[1:] for r in rows]
        if deletes:
            rows = [r for r in rows if (r[0], r[1]) not in deletes]
        if after is not None:
            _, c_a, t_a = after
            rows = [
                r for r in rows
                if r[2] < ceiling
                or (r[0], r[1]) > (c_a, int(t_a))
            ]
        rows.sort(key=lambda t: (-t[2], t[0], t[1]))
        rows = rows[:k]
        if not rows:
            return empty
        return spark.createDataFrame(
            rows, "conv_id string, turn_idx int, score double"
        )

    # Resolution is a broadcast join against the tagged docmap union
    # (column-pruned scan, one per query) — ONE job total; fastest at
    # sandbox scale.  resolve="pushdown" above is the point-lookup form
    # for docmap scales where a full scan hurts.
    resolved = _dm_union(sidx).join(
        F.broadcast(winners), ["seg", "doc_ord"]
    ).select("seg", "conv_id", "turn_idx", "score")
    resolved = _apply_shadows(spark, resolved, shadows)
    if deletes:
        del_df = spark.createDataFrame(
            sorted(deletes), "conv_id string, turn_idx int"
        )
        resolved = resolved.join(F.broadcast(del_df), DOC_KEY, "left_anti")
    if after is not None:
        _, c_a, t_a = after
        resolved = resolved.filter(
            (F.col("score") < ceiling)
            | (
                (F.col("score") == ceiling)
                & (
                    (F.col("conv_id") > c_a)
                    | (
                        (F.col("conv_id") == c_a)
                        & (F.col("turn_idx") > int(t_a))
                    )
                )
            )
        )
    # exact-score ties across segments break on docID, like the oracle
    return resolved.orderBy(
        F.desc("score"), "conv_id", "turn_idx"
    ).limit(k)


def _apply_shadows(
    spark: SparkSession,
    resolved: DataFrame,
    shadows: dict[tuple[str, int], int],
) -> DataFrame:
    """Drop superseded versions from resolved winner rows (seg,
    conv_id, turn_idx, ...): a row survives iff its segment is at least
    the key's newest declaring segment.  The declaration set is
    driver-resident (module docstring), so the filter is one broadcast
    left-join against a |shadows|-row frame — never a shuffle."""
    if not shadows:
        return resolved.drop("seg")
    shadow_df = spark.createDataFrame(
        [(c, t, s) for (c, t), s in sorted(shadows.items())],
        "conv_id string, turn_idx int, win_seg int",
    )
    return (
        resolved.join(F.broadcast(shadow_df), DOC_KEY, "left")
        .filter(
            F.col("win_seg").isNull() | (F.col("seg") >= F.col("win_seg"))
        )
        .drop("seg", "win_seg")
    )


def pick_compaction(
    seg_paths: list[str], ratio: float = 4.0, min_run: int = 2
) -> list[list[str]]:
    """Size-tiered compaction policy (the cadence knob the LSM trade
    needs): group segments into tiers of similar size (each tier spans
    at most ``ratio``× between smallest and largest member) and return
    the tiers with ≥ ``min_run`` members, smallest tier first — those
    are the cheapest merges that reduce per-query fan-out the most.
    Pure driver-side metadata (reads each segment's stats.json); the
    caller runs ``compact_segments`` per returned group."""
    import json as _json
    import os as _os

    sized = []
    for p in seg_paths:
        with open(_os.path.join(p, "stats.json")) as f:
            sized.append((int(_json.load(f)["n_docs"]), p))
    sized.sort()
    groups: list[list[str]] = []
    cur: list[str] = []
    cur_min = None
    for n, p in sized:
        if cur and cur_min is not None and n > cur_min * ratio:
            groups.append(cur)
            cur, cur_min = [], None
        if not cur:
            cur_min = max(n, 1)
        cur.append(p)
    if cur:
        groups.append(cur)
    return [g for g in groups if len(g) >= min_run]


def bm25_topk_multi_segmented(
    spark: SparkSession,
    sidx: SegmentedIndex,
    queries: dict[str, str],
    k: int = 10,
    resolve: str = "join",
) -> DataFrame:
    """Batched multi-query top-k over the segment set →
    (query_id, conv_id, turn_idx, score, rank) — ONE Spark job for the
    whole query batch regardless of segment count, per-query results
    identical to bm25_topk_segmented (tested).

    Plan shape: union of every segment's matched rows for the UNION of
    all queries' terms (one term-IN pushdown per segment branch, no
    job), one grouped-pandas scorer per (seg, shard) producing every
    query's shard-local top-k, a row_number window per query_id for the
    distributed global merge, and a broadcast join against the tagged
    docmap union to resolve docIDs.  Driver holds nothing but the
    final ≤ |queries| x k rows."""
    from pyspark.sql import Window

    empty = spark.createDataFrame(
        [],
        "query_id string, conv_id string, turn_idx int, score double, rank int",
    )
    q_tokens = {
        qid: sorted(set(tokenize(q, for_query=True, do_stem=sidx.stem)))
        for qid, q in queries.items()
    }
    union_terms = sorted({t for ts in q_tokens.values() for t in ts})
    if not union_terms:
        return empty
    term_df = sidx.df_for_terms(union_terms)  # one job (or zero, cached)
    q_weights: dict[str, list[tuple[str, float]]] = {}
    all_terms: set[str] = set()
    for qid, qtext in queries.items():
        if not q_tokens[qid]:
            continue
        w = query_weights(qtext, term_df, sidx.n_docs, sidx.stem)
        if w:
            q_weights[qid] = sorted(w.items())
            all_terms.update(w)
    if not q_weights:
        return empty

    qw_items = sorted(q_weights.items())
    shadows = sidx.shadows
    Kp = k + len(shadows)  # upsert over-fetch, same bound as single-query
    rbs = {i: int(s.stats["range_bits"]) for i, s in enumerate(sidx.segments)}
    scorer = _segment_shard_scorer(qw_items, rbs, sidx.avgdl, Kp)
    winners = (
        _matched_union(sidx, sorted(all_terms))
        .groupBy("seg", "shard_id")
        .applyInPandas(scorer, _WINNER_SCHEMA)
    )

    if resolve == "pushdown":
        # bounded per-query top-(k+ε) via a window over the winners
        # (ships ≤ |q|·(k+ε) rows), exact boundary-tie re-fetch per
        # flagged query, then ONE doc_ord IN (...) point-lookup job —
        # no docmap union scan (same guarantee as bm25_topk_segmented's
        # pushdown mode; final (conv_id, turn_idx) tie-break applied
        # after resolution on the bounded candidate set)
        pre_w = Window.partitionBy("query_id").orderBy(
            F.desc("score"), F.asc("seg"), F.asc("doc_ord")
        )
        cand = (
            winners.withColumn("r", F.row_number().over(pre_w))
            .filter(F.col("r") <= Kp + _TIE_OVERFETCH)
            .drop("r")
            .collect()
        )
        by_q: dict[str, list] = {}
        for r in cand:
            by_q.setdefault(r["query_id"], []).append(r)
        flagged: dict[str, float] = {}
        for qid, rows_ in by_q.items():
            rows_.sort(key=lambda r: (-r["score"], r["seg"], r["doc_ord"]))
            if (
                len(rows_) == Kp + _TIE_OVERFETCH
                and rows_[-1]["score"] == rows_[Kp - 1]["score"]
            ):
                flagged[qid] = float(rows_[Kp - 1]["score"])
        if flagged:
            cond = None
            for qid, s in sorted(flagged.items()):
                c = (F.col("query_id") == qid) & (F.col("score") >= s)
                cond = c if cond is None else (cond | c)
            extra = winners.filter(cond).collect()
            for qid in flagged:
                by_q[qid] = []
            for r in extra:
                by_q[r["query_id"]].append(r)
        pairs = {
            (int(r["seg"]), int(r["doc_ord"]))
            for rows_ in by_q.values()
            for r in rows_
        }
        dmap = _pushdown_lookup(sidx, pairs)
        out_rows = []
        for qid in sorted(by_q):
            resolved_q = [
                (*dmap[(int(r["seg"]), int(r["doc_ord"]))], float(r["score"]))
                for r in by_q[qid]
                if shadows.get(
                    dmap[(int(r["seg"]), int(r["doc_ord"]))], -1
                ) <= int(r["seg"])
            ]
            resolved_q.sort(key=lambda t: (-t[2], t[0], t[1]))
            for rank, (conv, turn, sc) in enumerate(resolved_q[:k], 1):
                out_rows.append((qid, conv, turn, sc, rank))
        if not out_rows:
            return empty
        return spark.createDataFrame(
            out_rows,
            "query_id string, conv_id string, turn_idx int, "
            "score double, rank int",
        )

    resolved = _dm_union(sidx).join(
        F.broadcast(winners), ["seg", "doc_ord"]
    ).select("query_id", "seg", "conv_id", "turn_idx", "score")
    resolved = _apply_shadows(spark, resolved, shadows)
    rank_w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("conv_id"), F.asc("turn_idx")
    )
    return (
        resolved.withColumn("rank", F.row_number().over(rank_w))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def compact_segments(
    spark: SparkSession,
    seg_paths: list[str],
    out_dir: str,
    index_partitions: int | None = None,
    deletes: DataFrame | None = None,
    range_bits: int | None = None,
    partial: bool = False,
) -> dict:
    """LSM-style compaction: merge many segments into ONE packed index
    WITHOUT re-tokenizing — decode each segment's payloads, re-rank doc
    ordinals over the union, repack.  The result is byte-identical to a
    fresh full build over the union's transcripts (tested), because
    every packed input recombines exactly: the new ordinal of a doc is
    its rank among all (conv_id, turn_idx) — independent of which
    segment held it — and tf/dl/positions are per-document payload
    facts that decode losslessly.

    Tokenize is the dominant build cost; compaction touches only the
    (much smaller) packed bytes, which is what makes a frequent
    small-segment ingest cadence affordable — the standard LSM trade.

    ``deletes`` (a DataFrame of docIDs): tombstones applied PHYSICALLY —
    the deleted docs vanish from the docmap (survivor ordinals re-rank),
    their postings are dropped, and stats (N, Σdl, df, max_tfn)
    recompute over survivors, so the output is byte-identical to a
    fresh build over a corpus that never contained them (tested).

    Upsert declarations (supersedes.json, module docstring) apply
    PHYSICALLY too: for each declared key, versions held by input
    segments OLDER than the newest declaring input are dropped from
    docmap and postings — the output is byte-identical to a fresh
    build over the latest-wins corpus (tested).  ``seg_paths`` order is
    age order.  By default the inputs are assumed to be the FULL
    segment set, so every declaration is fully applied and the output
    carries no supersedes.json; a subset compaction must pass
    ``partial=True``, which re-declares the union of the inputs'
    declarations on the output (a key's winning version may still need
    to shadow a segment outside the inputs).
    """
    import json as _json
    import os as _os

    from pyspark.sql import Observation

    segs = [PackedIndex(spark, p) for p in seg_paths]
    # upsert shadows within the input set: key -> newest declaring seg
    shadow: dict[tuple[str, int], int] = {}
    declared_union: set[tuple[str, int]] = set()
    for i, p in enumerate(seg_paths):
        decl = load_supersedes(p)
        declared_union |= decl
        if i == 0:
            continue
        for key in decl:
            shadow[key] = max(shadow.get(key, -1), i)

    def _live_docmap(s: PackedIndex, i: int) -> DataFrame:
        """Segment i's docmap minus versions a newer input supersedes
        (driver-sized anti-join side, broadcast — never a shuffle)."""
        dead = sorted(k for k, w in shadow.items() if w > i)
        if not dead:
            return s.docmap
        dead_df = spark.createDataFrame(
            dead, "conv_id string, turn_idx int"
        )
        return s.docmap.join(F.broadcast(dead_df), DOC_KEY, "left_anti")
    s0 = segs[0].stats
    # with_positions/stem must agree (they change payload CONTENT);
    # range_bits need not — decode yields absolute ordinals and the
    # repack re-shards at the output's range_bits, so mixed-geometry
    # segments (e.g. finer shards for fresh small deltas) compact fine
    for s in segs[1:]:
        for key in ("with_positions", "stem"):
            if s.stats.get(key) != s0.get(key):
                raise ValueError(f"segments disagree on {key}")
    wp = bool(s0.get("with_positions", True))
    if range_bits is None:
        range_bits = int(s0["range_bits"])

    _os.makedirs(out_dir, exist_ok=True)
    union_docs = _live_docmap(segs[0], 0).select(*DOC_KEY, "dl")
    for i, s in enumerate(segs[1:], start=1):
        union_docs = union_docs.unionByName(
            _live_docmap(s, i).select(*DOC_KEY, "dl")
        )
    if deletes is not None:
        union_docs = union_docs.join(
            deletes.select(*DOC_KEY), DOC_KEY, "left_anti"
        )
    obs = Observation("compact_docmap")
    new_dm = assign_doc_ordinals(union_docs)
    catalog.write_table(
        new_dm.observe(
            obs, F.count(F.lit(1)).alias("n"), F.sum("dl").alias("s")
        ),
        f"{out_dir}/docmap",
    )
    new_dm = catalog.read_table(spark, f"{out_dir}/docmap")

    n_docs = int(obs.get["n"])
    sum_dl = int(obs.get["s"] or 0)
    avgdl = sum_dl / n_docs if n_docs else 0.0
    stats = {"n_docs": n_docs, "avgdl": avgdl, "sum_dl": sum_dl,
             "range_bits": range_bits, "with_positions": wp,
             "stem": s0.get("stem", True)}
    with open(f"{out_dir}/stats.json", "w") as f:
        _json.dump(stats, f)

    n_parts = index_partitions or max(
        int(spark.conf.get("spark.sql.shuffle.partitions", "32")) // 2, 4
    )
    posts = None
    for i, s in enumerate(segs):
        # decode -> (term, doc_ord[old], tf, dl[, positions]); remap the
        # segment-local ordinal to the new global one via the segment's
        # LIVE docmap joined with the union docmap on the doc KEY —
        # live, because a superseded key's new ordinal exists in new_dm
        # under the SAME key, and the dead version's postings must not
        # attach to it
        remap = (
            _live_docmap(s, i)
            .select(*DOC_KEY, F.col("doc_ord").alias("old_ord"))
            .join(new_dm.select(*DOC_KEY, "doc_ord"), DOC_KEY)
            .select("old_ord", "doc_ord")
        )
        if s.n_docs < 4_000_000:
            remap = F.broadcast(remap)
        dec = decode_matched(s.index, with_positions=wp).withColumnRenamed(
            "doc_ord", "old_ord"
        )
        seg_posts = dec.join(remap, "old_ord").drop("old_ord")
        posts = seg_posts if posts is None else posts.unionByName(seg_posts)

    packed = pack_shards(posts, avgdl, range_bits, wp, n_parts)
    catalog.write_table(packed, f"{out_dir}/index")
    index_df = catalog.read_table(spark, f"{out_dir}/index")
    ts_parts = max(
        int(spark.conf.get("spark.sql.shuffle.partitions", "32")) // 8, 4
    )
    catalog.write_table(
        index_df.groupBy("term").agg(F.sum("n_postings").alias("df")),
        f"{out_dir}/term_stats",
        sort_cols=["term"],
        hash_col="term",
        n_partitions=ts_parts,
    )
    if partial and declared_union:
        # subset compaction: the winning versions now live here, but
        # segments outside the input set may still hold dead versions —
        # re-declare so the shadow survives until a full compaction
        write_supersedes(out_dir, declared_union)
    return stats
