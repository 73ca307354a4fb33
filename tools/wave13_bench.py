"""Round-3 wave-13 surfaces at a ~1M-row scale: EQL sequences,
categorize_text, change_point, and the ES|QL pipe.

These verbs run over the events/documents tables, so the scale corpus
is built by deterministic replication of /root/testdata/sf0.1 — each
copy shifts event_id/user_id/doc_id and the timestamp by a fixed
stride, which preserves the per-user event cadence (the thing EQL's
window pass actually sorts) while multiplying users 10x.  Prints one
JSON line; numbers land in BENCH/BASELINE.md.

Usage: python tools/wave13_bench.py [n_copies] [cpus]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _timed(fn, n=3):
    t0 = time.time()
    fn()
    cold = time.time() - t0
    warm = []
    for _ in range(n):
        t0 = time.time()
        fn()
        warm.append(time.time() - t0)
    return round(cold, 4), round(min(warm), 4)


def main() -> None:
    n_copies = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    import pyspark.sql.functions as F

    from ics_search_engine_spark.operators.aggs import (
        categorize_text,
        change_point,
    )
    from ics_search_engine_spark.operators.eql import sequence_matches
    from ics_search_engine_spark.operators.esql import esql_query
    from ics_search_engine_spark.session import get_spark

    spark = get_spark(
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={"spark.driver.memory": "48g"},
    )
    out: dict = {"n_copies": n_copies, "cpus": cpus}

    ev0 = spark.read.parquet(f"{SF_DIR}/events.parquet")
    copies = spark.range(n_copies).select(F.col("id").alias("copy"))
    ev = (
        ev0.crossJoin(copies)
        .select(
            (F.col("event_id") + F.col("copy") * 10_000_000).alias(
                "event_id"
            ),
            F.concat(
                F.lit("c"), F.col("copy"), F.lit("_"), F.col("user_id")
            ).alias("user_id"),
            "event_type",
            "value",
            (
                F.col("ts")
                + F.make_interval(secs=F.col("copy").cast("double"))
            ).alias("ts"),
        )
        .cache()
    )
    out["n_events"] = ev.count()

    docs0 = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    doc_copies = max(1, (n_copies * 100_000) // 5_000 // 10)
    docs = (
        docs0.crossJoin(
            spark.range(doc_copies).select(F.col("id").alias("copy"))
        )
        .select(
            (F.col("doc_id") + F.col("copy") * 10_000_000).alias("doc_id"),
            "text",
        )
        .cache()
    )
    out["n_docs"] = docs.count()

    et = F.col("event_type")

    def eql():
        return sequence_matches(
            ev,
            by="user_id",
            stages=[et == "view", et == "click", et == "purchase"],
            maxspan_s=6 * 3600,
        ).count()

    out["eql_matches"] = eql()
    out["eql_3stage_cold_s"], out["eql_3stage_warm_s"] = _timed(eql)
    spark.catalog.clearCache()
    ev.cache().count()
    docs.cache().count()

    def cat():
        return categorize_text(docs, "text", "doc_id", 8).count()

    out["categorize_buckets"] = cat()
    out["categorize_cold_s"], out["categorize_warm_s"] = _timed(cat)

    def chg():
        buckets = ev.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour")
        ).agg(F.count("*").alias("n"))
        return change_point(buckets, "hour", "n").collect()

    out["change_point_cold_s"], out["change_point_warm_s"] = _timed(chg)

    pipe = """FROM events
| WHERE event_type == "error" AND value > 50
| EVAL hour = DATE_TRUNC(1 hour, ts)
| STATS n = COUNT(*), users = COUNT_DISTINCT(user_id) BY hour
| SORT n DESC, hour ASC
| LIMIT 20"""

    def esql():
        return esql_query(spark, pipe, {"events": ev}).collect()

    out["esql_pipe_cold_s"], out["esql_pipe_warm_s"] = _timed(esql)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
