"""Structured Streaming operators.

The reference is batch-only (SURVEY.md §2.9) — its closest analog is
bounded-memory partial-index spill.  These are the engine's streaming
extensions:

* ``windowed_event_counts`` — tumbling event-time windows with a
  watermark for late data (the streaming form of the batch
  entry_queries.q_events_hourly);
* ``sessionize`` — session windows per user (gap-based), stateful;
* ``incremental_postings`` — micro-batch incremental index build: each
  micro-batch's turns are tokenized and appended as postings-bucket
  parquet via ``foreachBatch`` (idempotent per batchId — the streaming
  twin of operators/build.py's bucket stage; pack/compact runs as the
  batch job afterwards).

All sources/sinks here are format-agnostic: tests drive them with file
sources + availableNow triggers; production would swap in Kafka/Iceberg
without touching the transformation logic.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.streaming import DataStreamWriter


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling-window counts + integer-cents sums per event_type with
    late-data tolerance = ``watermark``.  Works on a streaming OR batch
    DataFrame (same plan — Catalyst picks the stateful version when
    streaming)."""
    # watermarks require TIMESTAMP (tz-aware); parquet NTZ columns cast
    # cleanly under the session's fixed UTC zone
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias(
                "sum_value_cents"
            ),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value_cents",
        )
    )


def sessionize(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Session windows per user: a session closes after ``gap`` of
    inactivity.  Uses the built-in session_window (stateful streaming
    aggregation; no custom state store code needed)."""
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("win"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("first_event"),
            F.max("ts").alias("last_event"),
        )
        .select(
            "user_id",
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "n_events",
        )
    )


def incremental_postings(
    transcripts_stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    with_positions: bool = False,
) -> DataStreamWriter:
    """Micro-batch incremental index build: per micro-batch, tokenize +
    aggregate postings and append under ``postings/stream_batch=<id>``.

    Idempotence: the sink path embeds the batchId, and an existing
    completed batch directory is overwritten atomically — re-delivered
    batches after a restart converge to the same files (exactly-once
    per batch, the same guarantee as operators/build.py's bucket
    manifest).  A periodic batch ``pack`` job compacts the accumulated
    buckets into the packed index.
    """
    from ics_search_engine_spark.operators import index_build as ib

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        toks = ib.tokenized(batch_df)
        posts = ib.postings(toks, with_positions=with_positions)
        posts.write.mode("overwrite").parquet(
            f"{out_dir}/postings/stream_batch={batch_id}"
        )
        toks.select(*ib.DOC_KEY, "dl").write.mode("overwrite").parquet(
            f"{out_dir}/doclens/stream_batch={batch_id}"
        )

    return (
        transcripts_stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
