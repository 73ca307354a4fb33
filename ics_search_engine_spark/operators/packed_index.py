"""Packed inverted-index build and the index-backed BM25 query path.

Replaces the reference's persisted index (pickle stream + byte-offset
seek map, /root/reference/utils/index_generator.py:18-53, read back one
term at a time at /root/reference/search.py:53-61) with a columnar
index table:

    index:     (term, shard_id, n_postings, max_tfn, payload binary)
    term_stats:(term, df)
    docmap:    (conv_id, turn_idx, dl, doc_ord)     sorted by doc_ord
    stats:     (n_docs, avgdl)                       single row

Skew / sharding design (north_rule "salted repartition-by-term with
explicit skew splitting for head terms"):
    shard_id = doc_ord >> range_bits
computed ROW-WISE — no window, no per-term sort on a single task.  A
head term (stop words are indexed!) appearing in every document still
produces groups of at most 2^range_bits postings, so the groupBy(term,
shard_id) aggregation is skew-bounded by construction; the hot term is
split across as many shards as there are doc ranges, and those shards
hash-scatter across the cluster.  Shards are doc-range-ALIGNED across
terms, which is exactly the geometry block-max WAND pruning needs
(operators/wand.py): max_tfn is the shard's score-upper-bound metadata.

The seek map dies: the index table is written hash-distributed by term
and sorted by (term, shard_id) within files, so parquet row-group
min/max statistics give point lookup for `term IN (...)` pushdown —
format-level skipping instead of a hand-rolled secondary index.
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from oracle.bm25 import B, K1
from ics_search_engine_spark.functions.codec import (
    pack_postings_batched,
    unpack_postings,
)
from ics_search_engine_spark.sources import catalog
from ics_search_engine_spark.operators import index_build as ib
from ics_search_engine_spark.operators.docmap import assign_doc_ordinals
from ics_search_engine_spark.operators.index_build import DOC_KEY

# 2^16 docs per shard range: right-sized for sandbox scales; at 10^12
# turns you'd raise this to ~2^22 so shard payloads stay a few MB.
DEFAULT_RANGE_BITS = 16

_PACKED_SCHEMA = (
    "term string, shard_id long, n_postings long, max_tfn double, payload binary"
)


def _tfn(tf: np.ndarray, dl: np.ndarray, avgdl: float) -> np.ndarray:
    tf = tf.astype(np.float64)
    dl = dl.astype(np.float64)
    return tf * (K1 + 1.0) / (tf + K1 * ((1.0 - B) + (B * dl) / avgdl))


def pack_shards(
    posts: DataFrame,
    avgdl: float,
    range_bits: int,
    with_positions: bool,
    n_parts: int,
) -> DataFrame:
    """(term, doc_ord, tf, dl[, positions]) → packed shard rows.

    Physical strategy: repartition by (term, shard_id) so each group
    lives in one partition, sortWithinPartitions so groups arrive as
    contiguous sorted runs, then ONE mapInPandas whose group boundaries
    are found with numpy change-point detection.  This avoids
    applyInPandas' per-group pandas-frame overhead (hundreds of
    thousands of tiny frames); groups spanning Arrow batch boundaries
    are carried across iterations (bounded by 2^range_bits postings).
    """
    posts = posts.withColumn(
        "shard_id", F.shiftright(F.col("doc_ord"), range_bits)
    )
    cols = ["term", "shard_id", "doc_ord", "tf", "dl"]
    if with_positions:
        cols.append("positions")
    posts = (
        posts.select(*cols)
        .repartition(n_parts, "term", "shard_id")
        .sortWithinPartitions("term", "shard_id", "doc_ord")
    )
    return _pack_sorted(posts, avgdl, with_positions)


def _pack_sorted(
    posts: DataFrame, avgdl: float, with_positions: bool
) -> DataFrame:
    """Pack an input that is ALREADY hash-partitioned by
    (term, shard_id) and locally sorted by (term, shard_id, doc_ord)."""
    wp = with_positions

    def stream_pack(batches) -> "Iterator[pd.DataFrame]":
        # Groups are contiguous (repartition on the group key + local
        # sort), so the whole batch encodes in one vectorized
        # pack_postings_batched pass — O(batch) numpy, not O(groups)
        # Python, which matters when a fat-tailed vocabulary makes
        # millions of tiny posting lists.  The LAST group of every
        # batch is carried: it may continue in the next batch (bounded
        # by 2^range_bits postings).
        carry: dict | None = None

        def encode(terms, shards, ords, tfs, dls, poss, starts, ends):
            payloads = pack_postings_batched(
                ords, tfs, dls, list(poss) if wp else None, starts, ends
            )
            # reduce over the EMITTED range only: the batch arrays still
            # contain the held-back carry rows past ends[-1], and
            # reduceat's last segment otherwise runs to the end of the
            # array, inflating the final group's max_tfn with the next
            # group's values
            lim = int(ends[-1])
            tfn = _tfn(tfs[:lim], dls[:lim], avgdl)
            gmax = np.maximum.reduceat(tfn, starts)
            return pd.DataFrame(
                {
                    "term": terms[starts],
                    "shard_id": shards[starts].astype(np.int64),
                    "n_postings": (ends - starts).astype(np.int64),
                    "max_tfn": gmax.astype(np.float64),
                    "payload": payloads,
                }
            )

        for pdf in batches:
            if len(pdf) == 0:
                continue
            terms = pdf["term"].to_numpy()
            shards = pdf["shard_id"].to_numpy()
            ords = pdf["doc_ord"].to_numpy().astype(np.uint64)
            tfs = pdf["tf"].to_numpy().astype(np.uint64)
            dls = pdf["dl"].to_numpy().astype(np.uint64)
            poss = pdf["positions"].to_numpy() if wp else None

            if carry is not None:
                terms = np.concatenate([carry["terms"], terms])
                shards = np.concatenate([carry["shards"], shards])
                ords = np.concatenate([carry["ords"], ords])
                tfs = np.concatenate([carry["tfs"], tfs])
                dls = np.concatenate([carry["dls"], dls])
                if wp:
                    poss = np.concatenate([carry["poss"], poss])
                carry = None

            n = len(terms)
            change = np.empty(n, dtype=bool)
            change[0] = True
            change[1:] = (terms[1:] != terms[:-1]) | (shards[1:] != shards[:-1])
            starts = np.flatnonzero(change)
            ends = np.append(starts[1:], n)

            # hold back the last group — it may continue next batch
            ls = int(starts[-1])
            carry = {
                "terms": terms[ls:], "shards": shards[ls:], "ords": ords[ls:],
                "tfs": tfs[ls:], "dls": dls[ls:],
                "poss": poss[ls:] if wp else None,
            }
            if len(starts) > 1:
                yield encode(
                    terms, shards, ords, tfs, dls, poss,
                    starts[:-1], ends[:-1],
                )
        if carry is not None and len(carry["terms"]):
            n = len(carry["terms"])
            yield encode(
                carry["terms"], carry["shards"], carry["ords"], carry["tfs"],
                carry["dls"], carry["poss"],
                np.array([0], dtype=np.int64), np.array([n], dtype=np.int64),
            )

    return posts.mapInPandas(stream_pack, schema=_PACKED_SCHEMA)


def _pack_sorted_rows(rows: DataFrame, avgdl: float) -> DataFrame:
    """FUSED positional pack: input is posting-GRAIN exploded rows
    (term, shard_id, doc_ord, dl, pos), hash-partitioned by
    (term, shard_id) and locally sorted by (term, shard_id, doc_ord,
    pos).  tf and the per-posting position runs are derived with numpy
    run-length detection INSIDE the packer — the plan contains NO
    collect_list.

    Why: ``collect_list(pos)`` plans as ObjectHashAggregate, which
    either sort-falls-back at 128 keys (default) or drowns in
    per-group ArrayBuffer objects when the threshold is raised —
    profiled at the 690k-turn corpus as ~85% of the entire positional
    build (tools/posbuild_profile.py; raising the fallback threshold
    measured 3.8x WORSE).  Here the same per-partition sort the old
    plan already paid (sortWithinPartitions) is the ONLY ordering
    work, and tf/positions fall out of one boolean-diff pass.
    Payloads are byte-identical to the collect_list path
    (property-tested in tests/test_packed_index.py)."""

    def stream_pack(batches) -> "Iterator[pd.DataFrame]":
        carry: dict | None = None

        def encode(terms, shards, ords, dls, poss):
            # posting boundaries: (term, shard, doc) change points
            n = len(terms)
            pchg = np.empty(n, dtype=bool)
            pchg[0] = True
            pchg[1:] = (
                (terms[1:] != terms[:-1])
                | (shards[1:] != shards[:-1])
                | (ords[1:] != ords[:-1])
            )
            pstarts = np.flatnonzero(pchg)
            pends = np.append(pstarts[1:], n)
            tfs = (pends - pstarts).astype(np.uint64)
            pterm = terms[pstarts]
            pshard = shards[pstarts]
            pords = ords[pstarts]
            pdls = dls[pstarts]
            # (term, shard) group boundaries at the POSTING level
            m = len(pstarts)
            gchg = np.empty(m, dtype=bool)
            gchg[0] = True
            gchg[1:] = (
                (pterm[1:] != pterm[:-1]) | (pshard[1:] != pshard[:-1])
            )
            gstarts = np.flatnonzero(gchg)
            gends = np.append(gstarts[1:], m)
            payloads = pack_postings_batched(
                pords, tfs, pdls, (poss, tfs), gstarts, gends
            )
            tfn = _tfn(tfs, pdls, avgdl)
            gmax = np.maximum.reduceat(tfn, gstarts)
            return pd.DataFrame(
                {
                    "term": pterm[gstarts],
                    "shard_id": pshard[gstarts].astype(np.int64),
                    "n_postings": (gends - gstarts).astype(np.int64),
                    "max_tfn": gmax.astype(np.float64),
                    "payload": payloads,
                }
            )

        for pdf in batches:
            if len(pdf) == 0:
                continue
            terms = pdf["term"].to_numpy()
            shards = pdf["shard_id"].to_numpy()
            ords = pdf["doc_ord"].to_numpy().astype(np.uint64)
            dls = pdf["dl"].to_numpy().astype(np.uint64)
            poss = pdf["pos"].to_numpy().astype(np.uint64)
            if carry is not None:
                terms = np.concatenate([carry["terms"], terms])
                shards = np.concatenate([carry["shards"], shards])
                ords = np.concatenate([carry["ords"], ords])
                dls = np.concatenate([carry["dls"], dls])
                poss = np.concatenate([carry["poss"], poss])
                carry = None
            # hold back the last (term, shard) group's ROWS — it may
            # continue in the next Arrow batch (bounded by one group's
            # rows: <= 2^range_bits postings x positions per doc)
            n = len(terms)
            schg = np.empty(n, dtype=bool)
            schg[0] = True
            schg[1:] = (
                (terms[1:] != terms[:-1]) | (shards[1:] != shards[:-1])
            )
            ls = int(np.flatnonzero(schg)[-1])
            carry = {
                "terms": terms[ls:], "shards": shards[ls:],
                "ords": ords[ls:], "dls": dls[ls:], "poss": poss[ls:],
            }
            if ls > 0:
                yield encode(
                    terms[:ls], shards[:ls], ords[:ls], dls[:ls],
                    poss[:ls],
                )
        if carry is not None and len(carry["terms"]):
            yield encode(
                carry["terms"], carry["shards"], carry["ords"],
                carry["dls"], carry["poss"],
            )

    return rows.mapInPandas(stream_pack, schema=_PACKED_SCHEMA)


def build_packed_index(
    spark: SparkSession,
    transcripts: DataFrame,
    out_dir: str,
    range_bits: int = DEFAULT_RANGE_BITS,
    with_positions: bool = True,
    index_partitions: int | None = None,
    stem: bool = True,
) -> dict:
    """Build the packed index tables under ``out_dir``.  Returns the
    stats dict.

    FUSED physical plan — ONE shuffle touches posting-grain data:
      1. range-shuffle of the (small) doc-key table for ordinals;
      2. broadcast the ordinal map back onto the tokenized rows, then
         posexplode → repartition(term, shard_id) [the only posting-
         grain exchange] → groupBy(term, shard_id, doc_ord) — Catalyst
         reuses the explicit hash partitioning because it covers a
         subset of the grouping keys, so the aggregation inserts NO
         second exchange (plan-audited) → local sort → pack → write.
    The resumable builder (operators/build.py) keeps its staged
    two-shuffle layout instead: the postings staging table IS its
    per-bucket checkpoint.

    ``stem=False`` builds a stem-free index (same tokenizer minus
    Porter) — used by the DuckDB-gated engine query, since DuckDB
    cannot stem; recorded in stats so the query path tokenizes to
    match.
    """
    from pyspark.sql import Observation

    toks = ib.tokenized(transcripts, stem=stem).persist()
    try:
        docmap = assign_doc_ordinals(toks.select(*DOC_KEY, "dl"))
        obs = Observation("docmap")
        catalog.write_table(
            docmap.observe(
                obs, F.count(F.lit(1)).alias("n"), F.sum("dl").alias("sum_dl")
            ),
            f"{out_dir}/docmap",
        )
        docmap = catalog.read_table(spark, f"{out_dir}/docmap")

        n_docs = obs.get["n"]
        sum_dl = int(obs.get["sum_dl"] or 0)
        avgdl = sum_dl / n_docs if n_docs else 0.0
        stats = {"n_docs": n_docs, "avgdl": avgdl, "sum_dl": sum_dl,
                 "range_bits": range_bits,
                 "with_positions": with_positions, "stem": stem}
        with open(f"{out_dir}/stats.json", "w") as f:
            json.dump(stats, f)

        # below ~4M docs the ordinal map broadcasts and the join adds
        # no shuffle (at 10^12 docs: bucket both sides instead —
        # implemented + plan-audited in sources/bucketed.py)
        dm_side = docmap.select(*DOC_KEY, "doc_ord")
        if n_docs < 4_000_000:
            dm_side = F.broadcast(dm_side)
        exploded = (
            toks.join(dm_side, DOC_KEY)
            .select(
                "doc_ord", "dl",
                F.posexplode("tokens").alias("pos", "term"),
            )
            .withColumn(
                "shard_id", F.shiftright(F.col("doc_ord"), range_bits)
            )
        )
        n_idx_parts = index_partitions or max(
            int(spark.conf.get("spark.sql.shuffle.partitions", "32")) // 2, 4
        )
        if with_positions:
            # FUSED positional pack: no collect_list aggregation at
            # all — the per-partition sort (which the old plan paid
            # anyway) is the only ordering work, and the packer
            # derives tf + position runs with numpy
            # (_pack_sorted_rows; profiled 690k-turn numbers in
            # BENCH/BASELINE.md "positional build profile").
            rows_sorted = (
                exploded.repartition(n_idx_parts, "term", "shard_id")
                .sortWithinPartitions("term", "shard_id", "doc_ord", "pos")
            )
            packed = _pack_sorted_rows(rows_sorted, avgdl)
        else:
            posts_sorted = (
                exploded.repartition(n_idx_parts, "term", "shard_id")
                .groupBy("term", "shard_id", "doc_ord")
                .agg(
                    F.count("*").cast("int").alias("tf"),
                    F.first("dl").alias("dl"),
                )
                .select("term", "shard_id", "doc_ord", "tf", "dl")
                .sortWithinPartitions("term", "shard_id", "doc_ord")
            )
            packed = _pack_sorted(posts_sorted, avgdl, False)
        # already partitioned by (term, shard) and sorted — write
        # directly; term-hash distribution + within-file term ordering
        # give format-level min/max point lookup on term (on Iceberg
        # the same layout comes from WRITE ORDERED BY, sources/catalog)
        catalog.write_table(packed, f"{out_dir}/index")
    finally:
        toks.unpersist()

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
    return stats


class PackedIndex:
    """Query-side handle on the index tables (the analog of the
    reference's SearchEngine + FileHandler state,
    /root/reference/search.py:26-81 — minus the seek map, which parquet
    min/max pushdown subsumes)."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        with open(os.path.join(path, "stats.json")) as f:
            self.stats = json.load(f)
        self.index = catalog.read_table(spark, f"{path}/index")
        self.term_stats = catalog.read_table(spark, f"{path}/term_stats")
        self.docmap = catalog.read_table(spark, f"{path}/docmap")

    @property
    def n_docs(self) -> int:
        return self.stats["n_docs"]

    @property
    def avgdl(self) -> float:
        return self.stats["avgdl"]

    def df_for_terms(self, terms: list[str]) -> dict[str, int]:
        if not terms:
            return {}
        if self._term_df_map is not None:
            return {t: self._term_df_map[t] for t in terms if t in self._term_df_map}
        return {
            r["term"]: r["df"]
            for r in self.term_stats.filter(F.col("term").isin(terms)).collect()
        }

    _term_df_map: dict[str, int] | None = None
    # term -> [(shard_id, max_tfn), ...] — block-max metadata, driver-side
    _shard_meta: dict[str, list[tuple[int, float]]] | None = None
    # serving mode: doc_ord -> (conv_id, turn_idx), driver-side
    _docmap_local: dict[int, tuple[str, int]] | None = None

    # above this many index shard rows the metadata stays distributed
    # and queries fetch their terms' metadata with one pushed-down job
    DRIVER_META_MAX_ROWS = 400_000
    # above this many docs the winners' docIDs resolve via a pushed-down
    # doc_ord IN (...) point lookup instead of a driver-side map — the
    # analog of a doc-store point read at 10^12 scale
    DRIVER_DOCMAP_MAX_ROWS = 2_000_000

    def cache(
        self,
        driver_meta: bool | None = None,
        driver_docmap: bool | None = None,
    ) -> "PackedIndex":
        """Pin the hot query-path state: index and docmap blocks on
        executors; when the vocabulary is small enough, term stats AND
        block-max shard metadata on the driver too (they scale with
        vocabulary × ranges, not postings — payload bytes never leave
        executors).  The serving-mode analog of the reference's
        lru_cache + persistently-open FileHandler
        (/root/reference/search.py:43-61, main.py:40-45).  With metadata
        driver-resident, WAND phase selection costs zero Spark jobs; a
        fat-tailed vocabulary (millions of rare terms) keeps metadata
        distributed and each query runs ONE pushed-down metadata job
        for just its terms (operators/wand.py)."""
        self.index = self.index.cache()
        self.docmap = self.docmap.cache()
        n_meta_rows = self.index.count()
        self.docmap.count()
        if driver_docmap is None:
            driver_docmap = self.n_docs <= self.DRIVER_DOCMAP_MAX_ROWS
        if driver_docmap:
            self._docmap_local = {
                r["doc_ord"]: (r["conv_id"], r["turn_idx"])
                for r in self.docmap.select(
                    "doc_ord", "conv_id", "turn_idx"
                ).collect()
            }
        if driver_meta is None:
            driver_meta = n_meta_rows <= self.DRIVER_META_MAX_ROWS
        if driver_meta:
            meta: dict[str, list[tuple[int, float]]] = {}
            dfs: dict[str, int] = {}
            for r in self.index.select(
                "term", "shard_id", "max_tfn", "n_postings"
            ).collect():
                meta.setdefault(r["term"], []).append(
                    (r["shard_id"], r["max_tfn"])
                )
                dfs[r["term"]] = dfs.get(r["term"], 0) + r["n_postings"]
            self._shard_meta = meta
            self._term_df_map = dfs
        return self

    def query_meta(self, terms: list[str]) -> list:
        """One pushed-down job: (term, shard_id, max_tfn, n_postings)
        rows for just the query terms — the distributed-metadata analog
        of the reference's seek-map lookup."""
        return (
            self.index.filter(F.col("term").isin(terms))
            .select("term", "shard_id", "max_tfn", "n_postings")
            .collect()
        )


# Dense-accumulator ceiling: the per-group score array is 2^range_bits
# doubles (32 MB at 22 bits).  Beyond it the sorted-merge accumulator
# takes over — memory proportional to MATCHED docs, not range width.
DENSE_RANGE_BITS_MAX = 22


def score_shards_topk(
    matched: DataFrame,
    weights: dict[str, float],
    avgdl: float,
    k: int,
    range_bits: int,
    require_all: int | None = None,
    accumulator: str | None = None,
    allowed: DataFrame | None = None,
    min_match: int | None = None,
) -> DataFrame:
    """Per-shard BM25 scoring with a local top-k — NO per-posting
    shuffle.

    The shard geometry makes this possible: shards are doc-range-
    aligned across terms (shard_id = doc_ord >> range_bits), so EVERY
    posting of a document — for every query term — lives in the same
    shard_id.  A document's full score is therefore computable inside
    its shard, and the global top-k is the top-k of the per-shard
    top-ks.  The only shuffle moves the matched (term, shard) payload
    rows to their shard group: ~|query terms| x |ranges| rows, never
    row-per-posting.  Contrast the reference's term-at-a-time
    accumulation over a global dict (/root/reference/search.py:148-162)
    and our own exhaustive path (operators/query.score_topk), which
    shuffles every decoded posting by doc.

    Determinism: contributions accumulate per doc in ASCENDING term
    order into a dense per-shard score array — the same addition order
    as the oracle — so scores are bit-identical to oracle/search.  Ties
    break (score desc, doc_ord asc) via lexsort.

    Scale note: the dense array is 2^range_bits doubles (0.5 MB at 16
    bits).  At 10^12 docs with range_bits ~22 it is 32 MB per in-flight
    group — still executor-friendly; beyond ``DENSE_RANGE_BITS_MAX``
    the accumulator AUTO-SWITCHES to a sorted-merge over the (already
    doc_ord-sorted) term posting arrays: memory proportional to the
    number of MATCHED docs in the shard, independent of range width.
    The merge performs the SAME per-doc additions in the SAME ascending
    term order (one binary add per term per doc, starting from the
    first term's contribution), so dense and merge are bit-identical —
    property-tested.  ``accumulator`` forces a path ('dense'|'merge');
    None = auto by range_bits.

    ``require_all=n``: posting-list INTERSECTION semantics — only docs
    matched by n distinct terms survive (a dense matched-term counter
    rides the same pass; no extra shuffle).  Scores of survivors are
    unchanged (same fold), so this is the shard-local, shuffle-free
    form of query.bm25_topk_conjunctive.

    ``min_match=m``: minimum-should-match semantics (the Lucene
    ``minimum_should_match`` knob, between pure OR and AND) — docs
    matched by AT LEAST m distinct terms survive; same counter, a
    ``>=`` keep instead of ``==``.  Mutually exclusive with
    ``require_all``.

    ``allowed``: optional DataFrame (shard_id, doc_ord) of docs that may
    appear (filter-query support, operators/filtered.py).  Applied via
    COGROUP on shard_id — both sides hash-partition on the shard key
    (one exchange each, the filter side carrying two longs per allowed
    doc), and the kernel masks survivors vectorized.  Scores of
    survivors stay bit-identical to the unfiltered fold; a shard with
    no allowed docs returns empty before decoding a payload byte.
    """
    if accumulator is None:
        accumulator = (
            "dense" if range_bits <= DENSE_RANGE_BITS_MAX else "merge"
        )
    if accumulator not in ("dense", "merge"):
        raise ValueError(f"unknown accumulator {accumulator!r}")
    if require_all is not None and min_match is not None:
        raise ValueError("require_all and min_match are mutually exclusive")
    count_terms = require_all is not None or min_match is not None
    wts = sorted(weights.items())
    size = 1 << range_bits
    out_schema = "doc_ord long, score double"

    def score_group(
        pdf: pd.DataFrame, allowed_ords: "np.ndarray | None" = None
    ) -> pd.DataFrame:
        base = int(pdf["shard_id"].iloc[0]) << range_bits
        scores = np.zeros(size, dtype=np.float64)
        touched = np.zeros(size, dtype=bool)
        counts = np.zeros(size, dtype=np.int32) if count_terms else None
        by_term: dict = {}
        for t, p in zip(pdf["term"], pdf["payload"]):
            by_term[t] = p
        for t, w in wts:
            pl = by_term.get(t)
            if pl is None:
                continue
            d, tf, dl, _ = unpack_postings(bytes(pl), with_positions=False)
            idx = (d.astype(np.int64)) - base
            tfn = _tfn(tf, dl, avgdl)
            scores[idx] += w * tfn
            touched[idx] = True
            if counts is not None:
                counts[idx] += 1
        if counts is not None:
            touched &= (
                counts == require_all
                if require_all is not None
                else counts >= min_match
            )
        if allowed_ords is not None:
            mask = np.zeros(size, dtype=bool)
            mask[allowed_ords - base] = True
            touched &= mask
        ti = np.flatnonzero(touched)
        if ti.size == 0:
            return pd.DataFrame({"doc_ord": [], "score": []}).astype(
                {"doc_ord": np.int64, "score": np.float64}
            )
        order = np.lexsort((ti, -scores[ti]))[:k]
        sel = ti[order]
        return pd.DataFrame(
            {"doc_ord": sel + base, "score": scores[sel]}
        )

    def score_group_merge(
        pdf: pd.DataFrame, allowed_ords: "np.ndarray | None" = None
    ) -> pd.DataFrame:
        # Sorted-merge accumulator: term posting arrays arrive doc_ord-
        # sorted (pack invariant), so each term folds into the running
        # (doc_ord-sorted) accumulator via searchsorted + insert.  Per
        # doc this performs exactly the additions the dense path does
        # (ascending term order, one add per term) — bit-identical.
        acc_docs = np.empty(0, dtype=np.int64)
        acc_scores = np.empty(0, dtype=np.float64)
        acc_counts = np.empty(0, dtype=np.int32) if count_terms else None
        by_term: dict = {}
        for t, p in zip(pdf["term"], pdf["payload"]):
            by_term[t] = p
        for t, w in wts:
            pl = by_term.get(t)
            if pl is None:
                continue
            d, tf, dl, _ = unpack_postings(bytes(pl), with_positions=False)
            d = d.astype(np.int64)
            contrib = w * _tfn(tf, dl, avgdl)
            pos = np.searchsorted(acc_docs, d)
            if len(acc_docs):
                safe = np.minimum(pos, len(acc_docs) - 1)
                is_old = (pos < len(acc_docs)) & (acc_docs[safe] == d)
            else:
                is_old = np.zeros(len(d), dtype=bool)
            acc_scores[pos[is_old]] += contrib[is_old]
            if acc_counts is not None:
                acc_counts[pos[is_old]] += 1
            new = ~is_old
            if new.any():
                ins = pos[new]
                acc_docs = np.insert(acc_docs, ins, d[new])
                acc_scores = np.insert(acc_scores, ins, contrib[new])
                if acc_counts is not None:
                    acc_counts = np.insert(
                        acc_counts, ins, np.ones(new.sum(), dtype=np.int32)
                    )
        if acc_counts is not None:
            keep = (
                acc_counts == require_all
                if require_all is not None
                else acc_counts >= min_match
            )
            acc_docs, acc_scores = acc_docs[keep], acc_scores[keep]
        if allowed_ords is not None and acc_docs.size:
            al = np.sort(allowed_ords)
            pos = np.searchsorted(al, acc_docs)
            safe = np.minimum(pos, al.size - 1)
            keep_a = (pos < al.size) & (al[safe] == acc_docs)
            acc_docs, acc_scores = acc_docs[keep_a], acc_scores[keep_a]
        if acc_docs.size == 0:
            return pd.DataFrame({"doc_ord": [], "score": []}).astype(
                {"doc_ord": np.int64, "score": np.float64}
            )
        order = np.lexsort((acc_docs, -acc_scores))[:k]
        return pd.DataFrame(
            {"doc_ord": acc_docs[order], "score": acc_scores[order]}
        )

    fn = score_group if accumulator == "dense" else score_group_merge
    if allowed is None:
        # NB: applyInPandas dispatches on function ARITY (2 params →
        # (key, pdf)); the kernels carry an allowed_ords kwarg, so wrap
        # them in an explicitly unary callable
        def fn_unary(pdf: pd.DataFrame) -> pd.DataFrame:
            return fn(pdf)

        return (
            matched.select("term", "shard_id", "payload")
            .groupBy("shard_id")
            .applyInPandas(fn_unary, out_schema)
        )

    def fn_cogroup(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if left.empty or right.empty:
            # no matched postings, or no allowed docs, in this shard:
            # nothing can rank — and no payload is ever decoded
            return pd.DataFrame({"doc_ord": [], "score": []}).astype(
                {"doc_ord": np.int64, "score": np.float64}
            )
        return fn(left, right["doc_ord"].to_numpy(np.int64))

    return (
        matched.select("term", "shard_id", "payload")
        .groupby("shard_id")
        .cogroup(allowed.select("shard_id", "doc_ord").groupby("shard_id"))
        .applyInPandas(fn_cogroup, out_schema)
    )


def decode_matched(matched: DataFrame, with_positions: bool = False
                   ) -> DataFrame:
    """(term, shard_id, payload, ...) → row-per-posting
    (term, doc_ord, tf, dl[, positions]) via an Arrow-batched decoder.
    Decoding skips the positions section unless requested (they trail
    the fixed sections in the payload — zero cost to ignore)."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            terms, ords, tfs, dls, poss = [], [], [], [], []
            for term, payload in zip(pdf["term"], pdf["payload"]):
                d, t, l, p = unpack_postings(
                    bytes(payload), with_positions=with_positions
                )
                terms.append(np.repeat(term, len(d)))
                ords.append(d.astype(np.int64))
                tfs.append(t.astype(np.int32))
                dls.append(l.astype(np.int32))
                if with_positions:
                    poss.extend([x.astype(np.int64).tolist() for x in p])
            if not terms:
                continue
            out = {
                "term": np.concatenate(terms),
                "doc_ord": np.concatenate(ords),
                "tf": np.concatenate(tfs),
                "dl": np.concatenate(dls),
            }
            if with_positions:
                out["positions"] = poss
            yield pd.DataFrame(out)

    schema = "term string, doc_ord long, tf int, dl int"
    if with_positions:
        schema += ", positions array<int>"
    return matched.select("term", "payload").mapInPandas(decode, schema=schema)
