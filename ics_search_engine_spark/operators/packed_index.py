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
from ics_search_engine_spark.functions.codec import pack_postings, unpack_postings
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
    wp = with_positions

    def stream_pack(batches) -> "Iterator[pd.DataFrame]":
        carry: dict | None = None

        def pack_run(term, shard_id, doc_ords, tfs, dls, positions):
            doc_ords = np.asarray(doc_ords, dtype=np.uint64)
            tfs = np.asarray(tfs, dtype=np.uint64)
            dls = np.asarray(dls, dtype=np.uint64)
            pos = (
                [np.asarray(p, dtype=np.uint64) for p in positions]
                if wp else None
            )
            payload = pack_postings(doc_ords, tfs, dls, pos)
            mt = float(_tfn(tfs, dls, avgdl).max()) if len(tfs) else 0.0
            return (term, int(shard_id), len(doc_ords), mt, payload)

        for pdf in batches:
            if len(pdf) == 0:
                continue
            terms = pdf["term"].to_numpy()
            shards = pdf["shard_id"].to_numpy()
            # change points: new group where term or shard differs
            change = np.empty(len(pdf), dtype=bool)
            change[0] = True
            change[1:] = (terms[1:] != terms[:-1]) | (shards[1:] != shards[:-1])
            starts = np.flatnonzero(change)
            ends = np.append(starts[1:], len(pdf))

            ords = pdf["doc_ord"].to_numpy()
            tfs = pdf["tf"].to_numpy()
            dls = pdf["dl"].to_numpy()
            poss = pdf["positions"].to_numpy() if wp else None

            out = []
            for gi in range(len(starts)):
                s, e = int(starts[gi]), int(ends[gi])
                g = {
                    "term": terms[s],
                    "shard_id": shards[s],
                    "doc_ords": ords[s:e],
                    "tfs": tfs[s:e],
                    "dls": dls[s:e],
                    "positions": list(poss[s:e]) if wp else None,
                }
                first = gi == 0
                last = gi == len(starts) - 1
                if first and carry is not None:
                    if (carry["term"] == g["term"]
                            and carry["shard_id"] == g["shard_id"]):
                        g["doc_ords"] = np.concatenate([carry["doc_ords"], g["doc_ords"]])
                        g["tfs"] = np.concatenate([carry["tfs"], g["tfs"]])
                        g["dls"] = np.concatenate([carry["dls"], g["dls"]])
                        if wp:
                            g["positions"] = carry["positions"] + g["positions"]
                        carry = None
                    else:
                        out.append(pack_run(
                            carry["term"], carry["shard_id"], carry["doc_ords"],
                            carry["tfs"], carry["dls"], carry["positions"],
                        ))
                        carry = None
                if last:
                    carry = g  # may continue in next batch
                else:
                    out.append(pack_run(
                        g["term"], g["shard_id"], g["doc_ords"],
                        g["tfs"], g["dls"], g["positions"],
                    ))
            if out:
                yield pd.DataFrame(
                    out,
                    columns=["term", "shard_id", "n_postings", "max_tfn", "payload"],
                )
        if carry is not None:
            yield pd.DataFrame(
                [pack_run(
                    carry["term"], carry["shard_id"], carry["doc_ords"],
                    carry["tfs"], carry["dls"], carry["positions"],
                )],
                columns=["term", "shard_id", "n_postings", "max_tfn", "payload"],
            )

    return posts.mapInPandas(stream_pack, schema=_PACKED_SCHEMA)


def build_packed_index(
    spark: SparkSession,
    transcripts: DataFrame,
    out_dir: str,
    range_bits: int = DEFAULT_RANGE_BITS,
    with_positions: bool = True,
    index_partitions: int | None = None,
) -> dict:
    """Build the packed index tables under ``out_dir``.  Returns the
    stats dict.  One lineage, three shuffles:
      range-shuffle for doc ordinals; hash-shuffle for (doc,term) agg;
      hash-shuffle for (term, shard) packing.
    """
    toks = ib.tokenized(transcripts)
    docmap = assign_doc_ordinals(toks.select(*DOC_KEY, "dl"))
    docmap.write.mode("overwrite").parquet(f"{out_dir}/docmap")
    docmap = spark.read.parquet(f"{out_dir}/docmap")

    row = docmap.agg(
        F.count("*").alias("n"), F.sum("dl").alias("sum_dl")
    ).collect()[0]
    n_docs = row["n"]
    avgdl = row["sum_dl"] / n_docs if n_docs else 0.0
    stats = {"n_docs": n_docs, "avgdl": avgdl, "range_bits": range_bits,
             "with_positions": with_positions}
    with open(f"{out_dir}/stats.json", "w") as f:
        json.dump(stats, f)

    posts = ib.postings(toks, with_positions=with_positions).join(
        docmap.select(*DOC_KEY, "doc_ord"), DOC_KEY
    )
    n_idx_parts = index_partitions or max(
        int(spark.conf.get("spark.sql.shuffle.partitions", "32")) // 2, 4
    )
    packed = pack_shards(
        posts, stats["avgdl"], range_bits, with_positions, n_idx_parts
    )
    # already partitioned by (term, shard) and sorted — write directly;
    # term-hash distribution + within-file term ordering give parquet
    # min/max point lookup on term
    packed.write.mode("overwrite").parquet(f"{out_dir}/index")

    index_df = spark.read.parquet(f"{out_dir}/index")
    (
        index_df.groupBy("term")
        .agg(F.sum("n_postings").alias("df"))
        .repartition(4, "term")
        .sortWithinPartitions("term")
        .write.mode("overwrite")
        .parquet(f"{out_dir}/term_stats")
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
        self.index = spark.read.parquet(f"{path}/index")
        self.term_stats = spark.read.parquet(f"{path}/term_stats")
        self.docmap = spark.read.parquet(f"{path}/docmap")

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

    def cache(self) -> "PackedIndex":
        """Pin the hot query-path state: term stats on the driver (the
        vocabulary is small — ~unique terms, not postings), index and
        docmap blocks on executors.  The serving-mode analog of the
        reference's lru_cache + persistently-open FileHandler
        (/root/reference/search.py:43-61, main.py:40-45)."""
        self._term_df_map = {
            r["term"]: r["df"] for r in self.term_stats.collect()
        }
        self.index = self.index.cache()
        self.docmap = self.docmap.cache()
        self.index.count()
        self.docmap.count()
        return self


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
