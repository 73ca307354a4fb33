"""Phase profile of the packed-index build: positional vs positionless.

Round-4 verdict item 1: positional build measured ~12x the
positionless build at the 690k-turn corpus with no per-phase
attribution.  This tool times each build stage separately for BOTH
modes over the same corpus:

  tokenize    ib.tokenized(...).persist + count (shared)
  docmap      assign_doc_ordinals + write          (shared)
  agg         explode -> repartition(term, shard) ->
              positionless: groupBy.agg(tf, dl) -> local sort
              positional LEGACY: + sort_array(collect_list(pos))
              positional FUSED: plain sortWithinPartitions(term,
              shard, doc_ord, pos) — no aggregation at all
              (pinned via eager localCheckpoint either way)
  pack        the pack stage over the pinned frame, forced by
              sum(length(payload)) — Arrow transfer + codec, no write
  write       pack -> catalog.write_table (includes a second pack
              pass; write-only cost = this minus pack)
  term_stats  df rollup over the written index

The positional build is profiled in BOTH forms — 'positional_legacy'
(the collect_list plan the round-4 verdict flagged as 12x) and
'positional' (the fused _pack_sorted_rows plan that replaced it) —
so the before/after attribution is in one JSON line.

Usage: python tools/posbuild_profile.py [n_convs] [range_bits]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 60_000
    range_bits = int(sys.argv[2]) if len(sys.argv) > 2 else 12

    import pyspark.sql.functions as F

    from ics_search_engine_spark.operators import index_build as ib
    from ics_search_engine_spark.operators.docmap import assign_doc_ordinals
    from ics_search_engine_spark.operators.index_build import DOC_KEY
    from ics_search_engine_spark.operators.packed_index import (
        _pack_sorted,
        _pack_sorted_rows,
    )
    from ics_search_engine_spark.session import get_spark
    from ics_search_engine_spark.sources import catalog
    from ics_search_engine_spark.sources.transcripts import write_parquet

    d = tempfile.mkdtemp(prefix="posprof_")
    out: dict = {"n_convs": n_convs, "range_bits": range_bits}
    corpus = f"{d}/corpus.parquet"
    out["n_turns"] = write_parquet(corpus, n_convs, seed=42)
    spark = get_spark(app_name="posbuild_profile")
    df = spark.read.parquet(corpus)
    n_parts = max(
        int(spark.conf.get("spark.sql.shuffle.partitions", "32")) // 2, 4
    )

    def run(mode: str, with_positions: bool, fused: bool = False) -> dict:
        ph: dict = {}
        t0 = time.time()
        toks = ib.tokenized(df).persist()
        toks.count()
        ph["tokenize"] = round(time.time() - t0, 3)

        t0 = time.time()
        dm_dir = f"{d}/docmap_{mode}"
        docmap = assign_doc_ordinals(toks.select(*DOC_KEY, "dl"))
        catalog.write_table(docmap, dm_dir)
        docmap = catalog.read_table(spark, dm_dir)
        row = toks.agg(
            F.count(F.lit(1)).alias("n"), F.avg("dl").alias("avgdl")
        ).first()
        avgdl = float(row["avgdl"] or 0.0)
        ph["docmap"] = round(time.time() - t0, 3)

        t0 = time.time()
        exploded = (
            toks.join(F.broadcast(docmap.select(*DOC_KEY, "doc_ord")), DOC_KEY)
            .select("doc_ord", "dl",
                    F.posexplode("tokens").alias("pos", "term"))
            .withColumn("shard_id",
                        F.shiftright(F.col("doc_ord"), range_bits))
        )
        if fused:
            pinned = (
                exploded.repartition(n_parts, "term", "shard_id")
                .sortWithinPartitions("term", "shard_id", "doc_ord", "pos")
            ).localCheckpoint(eager=True)

            def pack(frame):
                return _pack_sorted_rows(frame, avgdl)
        else:
            aggs = [F.count("*").cast("int").alias("tf"),
                    F.first("dl").alias("dl")]
            cols = ["term", "shard_id", "doc_ord", "tf", "dl"]
            if with_positions:
                aggs.append(
                    F.sort_array(F.collect_list("pos")).alias("positions")
                )
                cols.append("positions")
            pinned = (
                exploded.repartition(n_parts, "term", "shard_id")
                .groupBy("term", "shard_id", "doc_ord")
                .agg(*aggs)
                .select(*cols)
                .sortWithinPartitions("term", "shard_id", "doc_ord")
            ).localCheckpoint(eager=True)

            def pack(frame):
                return _pack_sorted(frame, avgdl, with_positions)
        ph["agg"] = round(time.time() - t0, 3)

        t0 = time.time()
        row = pack(pinned).agg(
            F.count(F.lit(1)).alias("groups"),
            F.sum(F.length("payload")).alias("bytes"),
        ).first()
        ph["pack"] = round(time.time() - t0, 3)
        ph["payload_bytes"] = int(row["bytes"] or 0)
        ph["groups"] = int(row["groups"])

        t0 = time.time()
        idx_dir = f"{d}/idx_{mode}"
        catalog.write_table(pack(pinned), idx_dir)
        ph["pack_plus_write"] = round(time.time() - t0, 3)

        t0 = time.time()
        idx = catalog.read_table(spark, idx_dir)
        catalog.write_table(
            idx.groupBy("term").agg(F.sum("n_postings").alias("df")),
            f"{d}/ts_{mode}", sort_cols=["term"], hash_col="term",
            n_partitions=4,
        )
        ph["term_stats"] = round(time.time() - t0, 3)

        ph["total"] = round(sum(
            v for k, v in ph.items()
            if k in ("tokenize", "docmap", "agg", "pack_plus_write",
                     "term_stats")
        ), 3)
        toks.unpersist()
        pinned.unpersist()
        return ph

    # positionless first so JIT warm-up penalizes the cheap build, not
    # the ones under investigation
    out["positionless"] = run("nopos", False)
    out["positional_legacy"] = run("pos_legacy", True, fused=False)
    out["positional"] = run("pos", True, fused=True)
    out["ratio_total"] = round(
        out["positional"]["total"] / max(out["positionless"]["total"], 1e-9), 2
    )
    out["fused_speedup"] = round(
        out["positional_legacy"]["total"]
        / max(out["positional"]["total"], 1e-9), 2
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
