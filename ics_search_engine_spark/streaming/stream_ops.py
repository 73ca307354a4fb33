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


def assemble_conversations(
    transcripts_stream: DataFrame,
    gap_seconds: int = 1800,
    watermark: str = "2 hours",
) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): assemble
    per-conversation summaries from a stream of turns, emitting a
    conversation when it has been quiet for ``gap_seconds`` of EVENT
    time (watermark-driven timeout) — the transcript-pipeline analog of
    "conversation is over, ship it downstream".

    State per conv_id: (n_turns, first/last event time, total chars,
    max turn_idx).  Each micro-batch folds its turns into the state and
    re-arms an event-time timeout at last_ts + gap; when the watermark
    passes that point the conversation emits exactly once and its state
    is dropped — bounded state, no growth with stream length.

    Scale note: state is partitioned by conv_id across the cluster by
    the streaming state store; a 10^12-turn stream holds state only for
    conversations inside the gap horizon, not history.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    out_type = StructType(
        [
            StructField("conv_id", StringType()),
            StructField("n_turns", IntegerType()),
            StructField("first_ts", LongType()),   # epoch micros
            StructField("last_ts", LongType()),
            StructField("total_chars", LongType()),
            StructField("max_turn_idx", IntegerType()),
        ]
    )
    state_type = StructType(
        [
            StructField("n_turns", IntegerType()),
            StructField("first_ts", LongType()),
            StructField("last_ts", LongType()),
            StructField("total_chars", LongType()),
            StructField("max_turn_idx", IntegerType()),
        ]
    )

    def assemble(key, pdfs, state: GroupState):
        import pandas as pd

        if state.hasTimedOut:
            n, first_ts, last_ts, chars, max_ti = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "conv_id": [key[0]],
                    "n_turns": [n],
                    "first_ts": [first_ts],
                    "last_ts": [last_ts],
                    "total_chars": [chars],
                    "max_turn_idx": [max_ti],
                }
            )
            return
        n, first_ts, last_ts, chars, max_ti = (
            state.get if state.exists else (0, None, None, 0, -1)
        )
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            # normalize to ns regardless of pandas' arrow unit, then micros
            ts = pdf["ts"].astype("datetime64[ns]").astype("int64") // 1000
            n += len(pdf)
            first_ts = int(ts.min()) if first_ts is None else min(
                first_ts, int(ts.min())
            )
            last_ts = int(ts.max()) if last_ts is None else max(
                last_ts, int(ts.max())
            )
            chars += int(pdf["text"].str.len().sum())
            max_ti = max(max_ti, int(pdf["turn_idx"].max()))
        if last_ts is not None:
            state.update((n, first_ts, last_ts, chars, max_ti))
            # re-arm: emit when event time passes last activity + gap
            # (setTimeoutTimestamp takes epoch millis)
            state.setTimeoutTimestamp(last_ts // 1000 + gap_seconds * 1000)
        return
        yield  # pragma: no cover — make this a generator

    stream = transcripts_stream.withColumn(
        "ts", F.col("ts").cast("timestamp")
    ).withWatermark("ts", watermark)
    return stream.groupBy("conv_id").applyInPandasWithState(
        assemble,
        outputStructType=out_type,
        stateStructType=state_type,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def dedup_stream(
    docs: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming exact deduplication: keep the first arrival of each
    distinct ``text_col`` payload (keyed by md5), drop re-arrivals —
    the ingest-side half of the batch exact-dedup pass
    (operators/dedup.exact_duplicates).

    State is BOUNDED by the watermark: on a stream this uses
    ``dropDuplicatesWithinWatermark``, so a hash's state entry is
    evicted once the watermark passes its event time + the watermark
    delay.  The honest trade (documented, tested): a duplicate
    re-arriving AFTER eviction passes through — streaming dedup
    guarantees uniqueness within the watermark horizon only; the
    periodic batch dedup pass over the accumulated segments remains
    the global guarantee, exactly like the LSM compaction relationship.
    On a batch frame the same call degrades to plain dropDuplicates
    (global, exact) so one function serves both plans.
    """
    d = docs.withColumn("_text_md5", F.md5(F.col(text_col))).withColumn(
        ts_col, F.col(ts_col).cast("timestamp")
    )
    if d.isStreaming:
        out = d.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            ["_text_md5"]
        )
    else:
        out = d.dropDuplicates(["_text_md5"])
    return out.drop("_text_md5")


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


def incremental_segments(
    transcripts_stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    range_bits: int = 12,
    with_positions: bool = False,
    stem: bool = True,
    upserts: bool = False,
) -> DataStreamWriter:
    """Streaming ingest → queryable LSM index: every non-empty
    micro-batch becomes a complete packed-index SEGMENT (the full
    build pipeline over just the batch), registered atomically via a
    ``_SEGMENT_READY`` marker written AFTER the build finishes.
    ``list_ready_segments`` + operators/segments.SegmentedIndex (or
    serving.LocalSegmentedServer) then query the stream's accumulated
    state bit-identically to a batch rebuild over everything ingested
    (tested) — compaction cadence is the reader's choice
    (pick_compaction + compact_segments).

    Idempotence: the segment path embeds the batchId; a re-delivered
    batch after a restart rebuilds the same directory (deterministic
    build) and re-marks it — exactly-once per batch, the same
    guarantee as operators/build.py's bucket manifest.

    Invariant inherited from segments.py: conversations must not
    straddle micro-batches if per-conv docIDs are to stay unique
    (one conversation = one arrival batch, the natural ingest shape).

    ``upserts=True``: every batch is a CDC-style stream of document
    VERSIONS — the segment is built by build_upsert_segment, whose
    supersedes.json (written BEFORE the ready marker, so registration
    stays atomic) shadows any older segment's version of the batch's
    keys.  list_ready_segments returns batch order, which IS the age
    order SegmentedIndex/LocalSegmentedServer need.  A key may recur
    across batches (latest wins) but must not recur WITHIN one batch
    (one segment holding two versions of a key is undefined —
    dedupe-to-latest upstream, e.g. a windowed last() per key).
    """
    import os

    from ics_search_engine_spark.operators.packed_index import (
        build_packed_index,
    )
    from ics_search_engine_spark.operators.segments import (
        build_upsert_segment,
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        seg_dir = f"{out_dir}/segment={batch_id}"
        if os.path.exists(f"{seg_dir}/_SEGMENT_READY"):
            # redelivered batch after a crash: the segment is complete
            # (the marker is written LAST) and the build is
            # deterministic — never rewrite a marked segment, or a
            # concurrent reader could see it half-rewritten
            return
        build = build_upsert_segment if upserts else build_packed_index
        build(
            batch_df.sparkSession, batch_df, seg_dir,
            range_bits=range_bits, with_positions=with_positions,
            stem=stem,
        )
        with open(f"{seg_dir}/_SEGMENT_READY", "w") as f:
            f.write(str(batch_id))

    return (
        transcripts_stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )


def list_ready_segments(out_dir: str) -> list[str]:
    """Completed segment directories (marker present), batch order."""
    import os
    import re

    out = []
    if not os.path.isdir(out_dir):
        return out
    for name in os.listdir(out_dir):
        m = re.fullmatch(r"segment=(\d+)", name)
        if m and os.path.exists(f"{out_dir}/{name}/_SEGMENT_READY"):
            out.append((int(m.group(1)), f"{out_dir}/{name}"))
    return [p for _, p in sorted(out)]


def transform_pivot_stream(
    events_stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    entity_cols: list[str],
    metric_cols: list[str],
    ts_col: str | None = None,
) -> DataStreamWriter:
    """ES CONTINUOUS transform (transform with ``sync``): the event
    stream's per-entity pivot state maintained incrementally — each
    micro-batch aggregates ONLY its own rows to decomposable state
    (operators/transforms.transform_pivot) and lands it under
    ``state/stream_batch=<id>``; :func:`read_pivot_state` collapses
    the accumulated states to the current entity table in one hash
    aggregation.

    This is the LSM design applied to aggregation state: per-batch
    work is O(batch), the unbounded event history is never rescanned,
    and the merge is exact because every piece of state is
    decomposable (the merge_pivot_states guarantee — streamed ≡
    one-shot, tested).  Idempotence matches incremental_postings: the
    sink path embeds the batchId and overwrites atomically, so a
    re-delivered batch after restart converges to the same files.

    vs ``applyInPandasWithState``: keeping state in executor memory
    would bound the entity cardinality by cluster RAM and lose it on
    restart; parquet-backed decomposable state scales with storage and
    doubles as the transform's checkpoint — the trade ES itself makes
    (transform checkpoints live in an index, not the heap)."""
    from ics_search_engine_spark.operators.transforms import transform_pivot

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        state = transform_pivot(batch_df, entity_cols, metric_cols, ts_col)
        state.write.mode("overwrite").parquet(
            f"{out_dir}/state/stream_batch={batch_id}"
        )

    return (
        events_stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )


def read_pivot_state(
    spark, out_dir: str, entity_cols: list[str]
) -> DataFrame:
    """Current entity state of a :func:`transform_pivot_stream` sink:
    every batch's state stacked (partition discovery over
    stream_batch=*) and collapsed by one union-aggregation.  A
    maintenance job can compact old batch directories into one by
    writing THIS frame back — same move as segment compaction."""
    from ics_search_engine_spark.operators.transforms import (
        merge_pivot_state_frame,
    )

    states = spark.read.parquet(f"{out_dir}/state").drop("stream_batch")
    return merge_pivot_state_frame(states, entity_cols)


def sequence_matches_stream(
    events_stream: DataFrame,
    by: str,
    stages: list,
    order_col: str = "ts",
    id_col: str = "event_id",
    maxspan_s: float = 3600.0,
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming EQL — the CEP twin of ``operators.eql.
    sequence_matches``, emitting EXACTLY the batch rows (same greedy
    earliest-completion semantics, same schema) whose decision horizon
    the watermark has passed.

    Why this is decidable with bounded state: an anchor at event time
    t is fully determined by events in (t, t + maxspan] — the greedy
    pointer for each stage is the EARLIEST following match, so if that
    pointer were outside the horizon the final span would exceed
    maxspan and the batch result drops the anchor anyway.  Hence:

    * an anchor is FINAL once watermark > t + maxspan (every event
      that could influence it has arrived or is droppably late);
    * an event is DEAD once watermark > ts + maxspan (every anchor it
      could serve is decided) — so per-key state is exactly the events
      inside one maxspan horizon, independent of stream length.

    maxspan is therefore REQUIRED here (unbounded sequences are not
    finitely decidable on a stream).  State per key: three parallel
    arrays (ts micros, id, stage-flag bitmask).  An event-time timeout
    re-arms at (last event + maxspan), so quiet keys flush without new
    data.  Stream ≡ batch is asserted in tests/test_streaming.py.

    Events matching NO stage are filtered out before the stateful op
    (they can be neither anchors nor chain members) — a big state/
    shuffle win when matches are sparse, with one visible consequence:
    the watermark advances only on stage-matching events.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        ArrayType,
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    n = len(stages)
    if n < 2:
        raise ValueError("a sequence needs at least two stages")
    if n > 62:
        raise ValueError("at most 62 stages (flag bitmask)")
    if maxspan_s is None or maxspan_s <= 0:
        raise ValueError("streaming sequences require a positive maxspan_s")
    maxspan_us = int(maxspan_s * 1_000_000)

    out_fields = [StructField(by, StringType())]
    for i in range(1, n + 1):
        out_fields.append(StructField(f"ts_{i}", TimestampType()))
        out_fields.append(StructField(f"id_{i}", LongType()))
    out_type = StructType(out_fields)
    state_type = StructType(
        [
            StructField("ev_ts", ArrayType(LongType())),
            StructField("ev_id", ArrayType(LongType())),
            StructField("ev_fl", ArrayType(LongType())),
        ]
    )

    def match(key, pdfs, state: GroupState):
        import numpy as np
        import pandas as pd

        if state.exists:
            s_ts, s_id, s_fl = state.get
            ts = list(s_ts)
            ids = list(s_id)
            fls = list(s_fl)
        else:
            ts, ids, fls = [], [], []
        if not state.hasTimedOut:
            for pdf in pdfs:
                if len(pdf) == 0:
                    continue
                t_us = (
                    pdf["ts"].astype("datetime64[ns]").astype("int64")
                    // 1000
                )
                ts.extend(int(v) for v in t_us)
                ids.extend(int(v) for v in pdf["id"])
                fls.extend(int(v) for v in pdf["fl"])
        if not ts:
            state.remove()
            return

        order = sorted(range(len(ts)), key=lambda j: (ts[j], ids[j]))
        ts = [ts[j] for j in order]
        ids = [ids[j] for j in order]
        fls = [fls[j] for j in order]
        m = len(ts)
        w_us = state.getCurrentWatermarkMs() * 1000

        # nxt[s][j] = first index >= j matching stage s (one backward
        # scan per stage over the bounded buffer)
        nxt = [[m] * (m + 1) for _ in range(n + 1)]
        for s in range(1, n + 1):
            bit = 1 << (s - 1)
            row = nxt[s]
            for j in range(m - 1, -1, -1):
                row[j] = j if (fls[j] & bit) else row[j + 1]

        out = {by: []}
        for i in range(1, n + 1):
            out[f"ts_{i}"] = []
            out[f"id_{i}"] = []
        keep_from = 0
        for j in range(m):
            if ts[j] + maxspan_us >= w_us:
                keep_from = j
                break
            keep_from = j + 1
        # decide anchors strictly below the horizon
        for j in range(keep_from):
            if not (fls[j] & 1):
                continue
            cur = j
            ok = True
            for s in range(2, n + 1):
                cur = nxt[s][cur + 1]
                if cur >= m or ts[cur] - ts[j] > maxspan_us:
                    ok = False
                    break
            if ok:
                out[by].append(key[0])
                chain = [j]
                cur = j
                for s in range(2, n + 1):
                    cur = nxt[s][cur + 1]
                    chain.append(cur)
                for i, cj in enumerate(chain, start=1):
                    out[f"ts_{i}"].append(np.datetime64(ts[cj], "us"))
                    out[f"id_{i}"].append(ids[cj])

        ts2, ids2, fls2 = ts[keep_from:], ids[keep_from:], fls[keep_from:]
        if ts2:
            state.update((ts2, ids2, fls2))
            # flush horizon: strictly after the newest undecided
            # anchor's decision point (timeout ts must exceed the
            # current watermark)
            arm_ms = max(
                (ts2[-1] + maxspan_us) // 1000 + 1,
                state.getCurrentWatermarkMs() + 1,
            )
            state.setTimeoutTimestamp(arm_ms)
        else:
            state.remove()
        if out[by]:
            yield pd.DataFrame(out)

    flag = None
    for i, stage in enumerate(stages):
        bit = F.when(stage, F.lit(1 << i)).otherwise(F.lit(0))
        flag = bit if flag is None else flag + bit
    prepared = (
        events_stream.select(
            F.col(by).alias("k"),
            F.col(order_col).cast("timestamp").alias("ts"),
            F.col(id_col).cast("long").alias("id"),
            flag.cast("long").alias("fl"),
        )
        .filter(F.col("fl") > 0)
        .withWatermark("ts", watermark)
    )
    return prepared.groupBy("k").applyInPandasWithState(
        match,
        outputStructType=out_type,
        stateStructType=state_type,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def incremental_sparse_segments(
    transcripts_stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    stem: bool = False,
    key_cols: tuple = ("conv_id", "turn_idx"),
    text_col: str = "text",
) -> DataStreamWriter:
    """Streaming ingest for the SPARSE tier: every non-empty
    micro-batch becomes a term-sorted impact-postings segment
    (sparsevec.write_sparse_artifact over just the batch), registered
    atomically via ``_SEGMENT_READY`` written after the parquet commit
    — the incremental_segments protocol applied to the learned-sparse
    artifact.

    Because sparse scoring is a pure per-(term, doc) sum with NO
    corpus-global statistics (contrast BM25's N/avgdl/df), the union
    of segment postings IS the batch-rebuild artifact's content —
    ``sparse_topk`` over ``spark.read.parquet(ready segment dirs)``
    and every Local*SparseServer over the same list are bit-identical
    to a full rebuild (tested).  Term-pruned reads still hold: each
    segment file is term-sorted, so row-group pruning applies per
    segment.

    Same idempotence and conversation-per-batch invariants as
    incremental_segments; compaction (rewriting many small segments
    into one term-sorted artifact) is ``write_sparse_artifact`` over
    the union — no special machinery, because there is no global
    state to recombine."""
    import os

    from ics_search_engine_spark.operators.sparsevec import (
        sparse_postings,
        write_sparse_artifact,
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        seg_dir = f"{out_dir}/segment={batch_id}"
        if os.path.exists(f"{seg_dir}/_SEGMENT_READY"):
            return
        posts = sparse_postings(
            batch_df, stem=stem, key_cols=list(key_cols),
            text_col=text_col,
        )
        write_sparse_artifact(posts, seg_dir)
        with open(f"{seg_dir}/_SEGMENT_READY", "w") as f:
            f.write(str(batch_id))

    return (
        transcripts_stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
