"""Structured Streaming tests: windowed aggregation with watermark,
session windows, and incremental index build — driven with file
sources + availableNow trigger, verified against the batch plan on the
same data."""

import os
import shutil

import pyspark.sql.functions as F
import pytest

from ics_search_engine_spark.streaming.stream_ops import (
    incremental_postings,
    sessionize,
    windowed_event_counts,
)


@pytest.fixture(scope="module")
def stream_dirs(corpus_dir):
    base = f"{corpus_dir}/streaming"
    os.makedirs(base, exist_ok=True)
    yield base
    shutil.rmtree(base, ignore_errors=True)


def _run_stream_to_memory(spark, sdf, name):
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"select * from {name}")


class TestWindowedCounts:
    def test_stream_equals_batch(self, spark, stream_dirs):
        # file stream source requires a directory
        src = f"{stream_dirs}/events_src"
        os.makedirs(src, exist_ok=True)
        shutil.copy(
            "/root/testdata/sf0.001/events.parquet", f"{src}/events.parquet"
        )
        events_batch = spark.read.parquet(src)
        schema = events_batch.schema
        stream = spark.readStream.schema(schema).parquet(src)
        got = _run_stream_to_memory(
            spark, windowed_event_counts(stream), "win_counts"
        ).collect()
        want = windowed_event_counts(events_batch).collect()
        key = lambda r: (r["window_start"], r["event_type"])  # noqa: E731
        got_m = {key(r): (r["n_events"], r["sum_value_cents"]) for r in got}
        want_m = {key(r): (r["n_events"], r["sum_value_cents"]) for r in want}
        assert got_m == want_m
        assert len(got_m) > 10


class TestSessionize:
    def test_sessions_close_after_gap(self, spark):
        rows = [
            (1, "2024-01-01 10:00:00"),
            (1, "2024-01-01 10:10:00"),
            (1, "2024-01-01 12:00:00"),  # > 30min gap -> new session
            (2, "2024-01-01 10:05:00"),
        ]
        df = (
            spark.createDataFrame(rows, "user_id int, ts_s string")
            .withColumn("ts", F.to_timestamp("ts_s"))
            .drop("ts_s")
        )
        out = sessionize(df).collect()
        per_user = {}
        for r in out:
            per_user.setdefault(r["user_id"], []).append(r["n_events"])
        assert sorted(per_user[1]) == [1, 2]
        assert per_user[2] == [1]


class TestIncrementalIndex:
    def test_incremental_postings_match_batch(self, spark, stream_dirs, small_table):
        import pyarrow.parquet as pq

        from ics_search_engine_spark.operators import index_build as ib

        src_dir = f"{stream_dirs}/turns_src"
        os.makedirs(src_dir, exist_ok=True)
        # two "arriving" files
        n = small_table.num_rows
        pq.write_table(small_table.slice(0, n // 2), f"{src_dir}/f0.parquet")
        pq.write_table(small_table.slice(n // 2), f"{src_dir}/f1.parquet")

        batch_df = spark.read.parquet(src_dir)
        schema = batch_df.schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir)
        )
        out_dir = f"{stream_dirs}/inc_index"
        q = (
            incremental_postings(
                stream, out_dir, f"{stream_dirs}/ckpt"
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

        got = {
            (r["term"], r["conv_id"], r["turn_idx"]): r["tf"]
            for r in spark.read.parquet(f"{out_dir}/postings").collect()
        }
        want = {
            (r["term"], r["conv_id"], r["turn_idx"]): r["tf"]
            for r in ib.postings(
                ib.tokenized(batch_df), with_positions=False
            ).collect()
        }
        assert got == want
        # micro-batches materialized as separate bucket dirs
        buckets = os.listdir(f"{out_dir}/postings")
        assert len([b for b in buckets if b.startswith("stream_batch=")]) >= 2


class TestAssembleConversations:
    def test_quiet_conversations_emit_once(self, spark, stream_dirs):
        """applyInPandasWithState custom stateful operator: an OLD
        conversation (quiet for > gap before the final watermark) emits
        exactly one assembled row; a conversation still inside the gap
        horizon stays in state and emits nothing."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from ics_search_engine_spark.streaming.stream_ops import (
            assemble_conversations,
        )

        base = 1_700_000_000_000_000  # epoch micros
        hour = 3_600_000_000
        rows = {
            "conv_id": ["old", "old", "old", "fresh", "fresh"],
            "turn_idx": [0, 1, 2, 0, 1],
            "role": ["user", "assistant", "user", "user", "assistant"],
            "text": ["aa", "bbbb", "c", "dd", "ee"],
            "tool": ["", "", "", "", ""],
            # old conv: ends 10h before the stream max; fresh: at max
            "ts": [base, base + hour, base + 2 * hour,
                   base + 11 * hour, base + 12 * hour],
        }
        tbl = pa.table(
            {
                **{k: rows[k] for k in ("conv_id", "role", "text", "tool")},
                "turn_idx": pa.array(rows["turn_idx"], pa.int32()),
                "ts": pa.array(rows["ts"], pa.timestamp("us")),
            }
        )
        import time as _time

        src = f"{stream_dirs}/asm_src"
        os.makedirs(src, exist_ok=True)
        # two files, mtime-ordered -> two micro-batches: batch 1 ingests
        # the old conv, batch 2 advances the watermark past its timeout
        # (event-time timeouts fire on a LATER batch than the data; the
        # file source orders by modification time, so the sleep makes
        # the batch order deterministic)
        pq.write_table(tbl.slice(0, 3), f"{src}/f0.parquet")
        _time.sleep(1.1)
        pq.write_table(tbl.slice(3), f"{src}/f1.parquet")

        ckpt = f"{stream_dirs}/asm_ckpt"
        schema = spark.read.parquet(src).schema

        def run_stream(name):
            stream = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(src)
            )
            out = assemble_conversations(
                stream, gap_seconds=1800, watermark="2 hours"
            )
            q = (
                out.writeStream.format("memory")
                .queryName(name)
                .outputMode("append")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)
            return spark.sql(f"select * from {name}").collect()

        got = run_stream("assembled_1")
        if not got:
            # whether availableNow runs a final no-data micro-batch to
            # fire eligible timeouts varies; feed one ticker file and
            # resume from the checkpoint — the extra data batch fires
            # them deterministically (ticker itself stays in state:
            # its own timeout is beyond the final watermark)
            _time.sleep(1.1)
            ticker = tbl.slice(3, 1).set_column(
                0, "conv_id", pa.array(["ticker"], pa.string())
            ).set_column(
                5, "ts", pa.array([base + 13 * hour], pa.timestamp("us"))
            )
            pq.write_table(ticker, f"{src}/f2.parquet")
            got = run_stream("assembled_2")
        # final watermark >= base+10h; old's timeout fires at
        # base+2h+30min < watermark; fresh's at base+12h30 does not
        assert [r["conv_id"] for r in got] == ["old"]
        r = got[0]
        assert r["n_turns"] == 3
        assert r["max_turn_idx"] == 2
        assert r["total_chars"] == len("aa") + len("bbbb") + len("c")
        assert r["first_ts"] == base and r["last_ts"] == base + 2 * hour


class TestIncrementalSegments:
    def test_streamed_segments_equal_batch_rebuild(
        self, spark, stream_dirs, small_df
    ):
        """Streaming ingest (one parquet file per micro-batch) →
        segments → SegmentedIndex / LocalSegmentedServer results are
        bit-identical to one batch build over everything ingested."""
        from ics_search_engine_spark.operators.packed_index import (
            build_packed_index,
        )
        from ics_search_engine_spark.operators.segments import (
            SegmentedIndex,
            bm25_topk_segmented,
        )
        from ics_search_engine_spark.operators.query import bm25_topk_packed
        from ics_search_engine_spark.operators.packed_index import PackedIndex
        from ics_search_engine_spark.serving import LocalSegmentedServer
        from ics_search_engine_spark.streaming.stream_ops import (
            incremental_segments,
            list_ready_segments,
        )

        src = f"{stream_dirs}/seg_src"
        os.makedirs(src, exist_ok=True)
        # whole conversations per arrival file (the segment invariant)
        for i in range(3):
            part = small_df.filter(F.pmod(F.hash("conv_id"), F.lit(3)) == i)
            part.coalesce(1).write.mode("overwrite").parquet(
                f"{src}/arrival_{i}"
            )
        schema = small_df.schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(f"{src}/arrival_*")
        )
        out = f"{stream_dirs}/seg_out"
        q = (
            incremental_segments(
                stream, out, f"{stream_dirs}/seg_ckpt", range_bits=9
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        segs = list_ready_segments(out)
        assert len(segs) >= 2  # micro-batched, not one mega-batch

        full_dir = f"{stream_dirs}/seg_full_rebuild"
        build_packed_index(spark, small_df, full_dir, range_bits=9)
        full = PackedIndex(spark, full_dir)
        sidx = SegmentedIndex(spark, segs)
        assert sidx.n_docs == full.n_docs
        assert sidx.avgdl == full.avgdl  # bit-equal

        for query in ["machine learning", "research", "xyzzyqux"]:
            seg_rows = [
                tuple(r)
                for r in bm25_topk_segmented(spark, sidx, query, k=10).collect()
            ]
            full_rows = [
                tuple(r)
                for r in bm25_topk_packed(spark, full, query, k=10).collect()
            ]
            assert seg_rows == full_rows, query
            assert LocalSegmentedServer(segs).search(query, k=10) == full_rows

    def test_marked_segment_never_rewritten(self, spark, stream_dirs, small_df):
        """Redelivered batches must not rewrite a READY segment (a
        concurrent reader could see it half-rewritten): with the marker
        present, the builder is a no-op."""
        import json

        from ics_search_engine_spark.streaming.stream_ops import (
            incremental_segments,
        )

        out = f"{stream_dirs}/seg_idem"
        seg = f"{out}/segment=0"
        os.makedirs(seg, exist_ok=True)
        with open(f"{seg}/_SEGMENT_READY", "w") as f:
            f.write("0")
        sentinel = f"{seg}/stats.json"
        with open(sentinel, "w") as f:
            json.dump({"sentinel": True}, f)

        # drive one batch through foreachBatch with the marker present
        src = f"{stream_dirs}/seg_idem_src"
        os.makedirs(src, exist_ok=True)
        small_df.limit(5).coalesce(1).write.mode("overwrite").parquet(src)
        stream = spark.readStream.schema(small_df.schema).parquet(src)
        q = (
            incremental_segments(
                stream, out, f"{stream_dirs}/seg_idem_ckpt", range_bits=9
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        with open(sentinel) as f:
            assert json.load(f) == {"sentinel": True}  # untouched


class TestStreamedPositionalServing:
    def test_streamed_segments_serve_phrase_near_qlang(
        self, spark, stream_dirs, small_df
    ):
        """Positional payloads survive the streaming LSM path: segments
        ingested with positions answer phrase/NEAR/qlang identically to
        a batch positional rebuild."""
        from ics_search_engine_spark.operators.packed_index import (
            build_packed_index,
        )
        from ics_search_engine_spark.serving import (
            LocalIndexServer,
            LocalSegmentedServer,
        )
        from ics_search_engine_spark.streaming.stream_ops import (
            incremental_segments,
            list_ready_segments,
        )

        src = f"{stream_dirs}/pos_src"
        os.makedirs(src, exist_ok=True)
        for i in range(2):
            part = small_df.filter(F.pmod(F.hash("conv_id"), F.lit(2)) == i)
            part.coalesce(1).write.mode("overwrite").parquet(
                f"{src}/arrival_{i}"
            )
        stream = (
            spark.readStream.schema(small_df.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(f"{src}/arrival_*")
        )
        out = f"{stream_dirs}/pos_out"
        q = (
            incremental_segments(
                stream, out, f"{stream_dirs}/pos_ckpt", range_bits=9,
                with_positions=True,
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        segs = list_ready_segments(out)
        assert len(segs) >= 2

        full_dir = f"{stream_dirs}/pos_full"
        build_packed_index(spark, small_df, full_dir, range_bits=9,
                           with_positions=True)
        full = LocalIndexServer(full_dir)
        seg = LocalSegmentedServer(segs)

        assert seg.search_phrase("machine learning", k=10) == (
            full.search_phrase("machine learning", k=10)
        )
        assert seg.search_near("machine learning", 4, k=10) == (
            full.search_near("machine learning", 4, k=10)
        )
        q = '+machine "machine learning" -slow quer*'
        assert seg.search_qlang(q, k=10) == full.search_qlang(q, k=10)
        # third-wave surfaces ride the same streamed segments: ordered
        # proximity (positional) and synonym groups (blended union-df)
        assert seg.search_near_ordered("machine learning", 4, k=10) == (
            full.search_near_ordered("machine learning", 4, k=10)
        )
        syns = {"machin": ["learn"]}
        assert seg.search_synonyms("machine society", syns, k=10) == (
            full.search_synonyms("machine society", syns, k=10)
        )

    def test_streamed_upserts_shadow_older_batches(
        self, spark, stream_dirs, small_df
    ):
        """CDC-style streaming: batch 0 is the base corpus, batch 1
        re-delivers updated versions of some conversations
        (incremental_segments(upserts=True)).  The streamed LSM must
        answer identically to the batch upsert path
        (build_upsert_segment over the same delta) — dead versions
        excluded, both-versions stats."""
        import time

        from ics_search_engine_spark.operators.packed_index import (
            build_packed_index,
        )
        from ics_search_engine_spark.operators.segments import (
            SegmentedIndex,
            bm25_topk_segmented,
            build_upsert_segment,
            load_supersedes,
        )
        from ics_search_engine_spark.serving import LocalSegmentedServer
        from ics_search_engine_spark.streaming.stream_ops import (
            incremental_segments,
            list_ready_segments,
        )

        delta = (
            small_df.filter(F.pmod(F.hash("conv_id"), F.lit(5)) == 2)
            .withColumn(
                "text",
                F.concat(F.col("text"), F.lit(" machine learning machine")),
            )
        )

        src = f"{stream_dirs}/ups_src"
        os.makedirs(src, exist_ok=True)
        small_df.coalesce(1).write.mode("overwrite").parquet(
            f"{src}/arrival_0"
        )
        time.sleep(1.1)  # file-source ordering is by mtime: base first
        delta.coalesce(1).write.mode("overwrite").parquet(
            f"{src}/arrival_1"
        )

        stream = (
            spark.readStream.schema(small_df.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(f"{src}/arrival_*")
        )
        out = f"{stream_dirs}/ups_out"
        q = (
            incremental_segments(
                stream, out, f"{stream_dirs}/ups_ckpt", range_bits=9,
                upserts=True,
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        segs = list_ready_segments(out)
        assert len(segs) == 2
        delta_keys = {
            (r["conv_id"], r["turn_idx"])
            for r in delta.select("conv_id", "turn_idx").collect()
        }
        assert load_supersedes(segs[1]) == delta_keys

        # batch reference: plain base build + batch upsert segment
        base_dir = f"{stream_dirs}/ups_batch_base"
        up_dir = f"{stream_dirs}/ups_batch_delta"
        build_packed_index(spark, small_df, base_dir, range_bits=9)
        build_upsert_segment(spark, delta, up_dir, range_bits=9)
        want_sidx = SegmentedIndex(spark, [base_dir, up_dir])

        got_sidx = SegmentedIndex(spark, segs)
        assert got_sidx.shadows == want_sidx.shadows
        srv = LocalSegmentedServer(segs)
        for query in ["machine learning", "research data", "xyzzyqux"]:
            want = [
                tuple(r)
                for r in bm25_topk_segmented(
                    spark, want_sidx, query, k=10
                ).collect()
            ]
            got = [
                tuple(r)
                for r in bm25_topk_segmented(
                    spark, got_sidx, query, k=10
                ).collect()
            ]
            assert got == want, query
            assert srv.search(query, k=10) == want, query


class TestSequenceMatchesStream:
    """Streaming EQL ≡ batch EQL on the watermark-closed region."""

    def _events_table(self):
        import pyarrow as pa
        import random

        rng = random.Random(5)
        base = 1_700_000_000_000_000  # epoch micros
        minute = 60_000_000
        rows = []
        for i in range(240):
            rows.append(
                (
                    i,
                    f"u{rng.randrange(6)}",
                    rng.choice(["view", "click", "buy", "noise"]),
                    base + i * minute,
                )
            )
        # ticker: far-future stage-matching event on its own key so the
        # final watermark passes every real anchor's decision horizon
        # (non-matching events are filtered before the watermark)
        rows.append((9999, "ticker", "view", base + 100_000 * minute))
        return pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "user_id": pa.array([r[1] for r in rows], pa.string()),
                "event_type": pa.array([r[2] for r in rows], pa.string()),
                "ts": pa.array([r[3] for r in rows], pa.timestamp("us")),
            }
        )

    def test_stream_equals_batch(self, spark, stream_dirs):
        import time as _time

        import pyarrow.parquet as pq

        from ics_search_engine_spark.operators.eql import sequence_matches
        from ics_search_engine_spark.streaming.stream_ops import (
            sequence_matches_stream,
        )

        tbl = self._events_table()
        src = f"{stream_dirs}/eql_src"
        os.makedirs(src, exist_ok=True)
        # three mtime-ordered files -> three micro-batches, watermark
        # advancing across them; the last holds the ticker
        pq.write_table(tbl.slice(0, 120), f"{src}/f0.parquet")
        _time.sleep(1.1)
        pq.write_table(tbl.slice(120, 120), f"{src}/f1.parquet")
        _time.sleep(1.1)
        pq.write_table(tbl.slice(240), f"{src}/f2.parquet")

        schema = spark.read.parquet(src).schema
        et = F.col("event_type")
        stages = [et == "view", et == "click", et == "buy"]
        maxspan = 30 * 60.0

        ckpt = f"{stream_dirs}/eql_ckpt"

        def run(name):
            stream = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(src)
            )
            out = sequence_matches_stream(
                stream,
                by="user_id",
                stages=stages,
                maxspan_s=maxspan,
                watermark="10 minutes",
            )
            q = (
                out.writeStream.format("memory")
                .queryName(name)
                .outputMode("append")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(180)
            return spark.sql(
                f"select * from {name} where user_id != 'ticker'"
            ).collect()

        got = run("eql_stream_1")
        if not got:
            # feed one more ticker if the final no-data batch didn't
            # fire timeouts (same pattern as TestAssembleConversations)
            import pyarrow as pa

            _time.sleep(1.1)
            extra = self._events_table().slice(240)
            extra = extra.set_column(
                0, "event_id", pa.array([10000], pa.int64())
            ).set_column(
                3,
                "ts",
                pa.array([1_700_000_000_000_000 + 200_000 * 60_000_000],
                         pa.timestamp("us")),
            )
            pq.write_table(extra, f"{src}/f3.parquet")
            got = run("eql_stream_2")

        batch = sequence_matches(
            spark.read.parquet(src).filter(F.col("user_id") != "ticker"),
            by="user_id",
            stages=stages,
            maxspan_s=maxspan,
        ).collect()
        assert len(batch) > 0, "test corpus produced no sequences"

        key = lambda r: (  # noqa: E731
            r["user_id"], r["ts_1"], r["id_1"], r["ts_2"], r["id_2"],
            r["ts_3"], r["id_3"],
        )
        assert sorted(map(key, got)) == sorted(map(key, batch))

    def test_requires_maxspan(self, spark):
        from ics_search_engine_spark.streaming.stream_ops import (
            sequence_matches_stream,
        )

        with pytest.raises(ValueError, match="maxspan"):
            sequence_matches_stream(
                spark.readStream.format("rate").load(),
                by="value",
                stages=[F.lit(True), F.lit(True)],
                maxspan_s=None,
            )


class TestDedupStream:
    def test_stream_equals_batch_on_hash_set(self, spark, stream_dirs):
        """Streamed dedup keeps exactly one row per distinct text (all
        duplicates here arrive within the watermark horizon), matching
        batch dropDuplicates on the kept-hash SET (the chosen
        representative row may differ)."""
        import datetime as dt

        from ics_search_engine_spark.streaming.stream_ops import dedup_stream

        t0 = dt.datetime(2024, 1, 1)
        rows = [
            (f"c{i}", 0, ["alpha text", "beta text", "gamma text"][i % 3],
             t0 + dt.timedelta(minutes=i))
            for i in range(30)
        ]
        src = f"{stream_dirs}/dedup_src"
        ckpt = f"{stream_dirs}/dedup_ckpt"
        spark.createDataFrame(
            rows, "conv_id string, turn_idx int, text string, ts timestamp"
        ).write.mode("overwrite").parquet(src)

        batch = spark.read.parquet(src)
        sdf = spark.readStream.schema(batch.schema).parquet(src)
        q = (
            dedup_stream(sdf)
            .writeStream.format("memory")
            .queryName("dedup_out")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        streamed = spark.sql("select * from dedup_out")
        got = {r["text"] for r in streamed.collect()}
        want = {
            r["text"] for r in dedup_stream(batch).collect()
        }
        assert got == want == {"alpha text", "beta text", "gamma text"}
        assert streamed.count() == 3

    def test_batch_form_is_global_exact(self, spark):
        from ics_search_engine_spark.streaming.stream_ops import dedup_stream

        import datetime as dt

        t0 = dt.datetime(2024, 1, 1)
        df = spark.createDataFrame(
            [("a", 0, "same", t0), ("b", 0, "same", t0 + dt.timedelta(days=400)),
             ("c", 0, "other", t0)],
            "conv_id string, turn_idx int, text string, ts timestamp",
        )
        out = dedup_stream(df)
        assert out.count() == 2  # batch path ignores the horizon
        assert "_text_md5" not in out.columns


class TestIncrementalSparseSegments:
    def test_streamed_sparse_equals_batch(
        self, spark, stream_dirs, small_df
    ):
        """Streaming sparse segments: union-of-segments scoring AND a
        compacted single artifact are both bit-identical to one batch
        build over everything ingested."""
        from ics_search_engine_spark.operators.sparsevec import (
            sparse_postings,
            sparse_topk,
            write_sparse_artifact,
        )
        from ics_search_engine_spark.serving import LocalSparsePackedServer
        from ics_search_engine_spark.streaming.stream_ops import (
            incremental_sparse_segments,
            list_ready_segments,
        )

        src = f"{stream_dirs}/sp_src"
        os.makedirs(src, exist_ok=True)
        for i in range(3):
            part = small_df.filter(F.pmod(F.hash("conv_id"), F.lit(3)) == i)
            part.coalesce(1).write.mode("overwrite").parquet(
                f"{src}/arrival_{i}"
            )
        stream = (
            spark.readStream.schema(small_df.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(f"{src}/arrival_*")
        )
        out = f"{stream_dirs}/sp_out"
        q = (
            incremental_sparse_segments(
                stream, out, f"{stream_dirs}/sp_ckpt"
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        segs = list_ready_segments(out)
        assert len(segs) == 3

        qw = {"machine": 1.5, "learning": 0.8, "the": 0.1}
        union = spark.read.parquet(*segs)
        got = sparse_topk(spark, union, qw, k=12).collect()
        batch_posts = sparse_postings(small_df, stem=False)
        want = sparse_topk(spark, batch_posts, qw, k=12).collect()
        assert [tuple(r) for r in got] == [tuple(r) for r in want]

        # compaction: one write_sparse_artifact over the union, then
        # the packed server answers identically
        compact = f"{stream_dirs}/sp_compact"
        write_sparse_artifact(union, compact)
        srv = LocalSparsePackedServer(compact)
        assert [(c, int(t), s) for c, t, s in srv.search(qw, k=12)] == [
            tuple(r) for r in want
        ]

    def test_redelivered_batch_never_rewrites(self, spark, stream_dirs):
        from ics_search_engine_spark.streaming.stream_ops import (
            incremental_sparse_segments,
        )

        out = f"{stream_dirs}/sp_idem"
        seg = f"{out}/segment=0"
        os.makedirs(seg, exist_ok=True)
        with open(f"{seg}/_SEGMENT_READY", "w") as f:
            f.write("0")
        with open(f"{seg}/sentinel", "w") as f:
            f.write("untouched")
        src = f"{stream_dirs}/sp_idem_src"
        os.makedirs(src, exist_ok=True)
        df = spark.createDataFrame(
            [("c0", 0, "hello world")],
            "conv_id string, turn_idx int, text string",
        )
        df.coalesce(1).write.mode("overwrite").parquet(f"{src}/a0")
        stream = (
            spark.readStream.schema(df.schema).parquet(f"{src}/a*")
        )
        q = (
            incremental_sparse_segments(
                stream, out, f"{stream_dirs}/sp_idem_ckpt"
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        with open(f"{seg}/sentinel") as f:
            assert f.read() == "untouched"  # marked segment untouched
