"""Transforms (ES pivot / latest): exactness + incremental merge.

The load-bearing property: transform_pivot's state is decomposable,
so merge_pivot_states(state(A), state(B)) == state(A ∪ B) — the
incremental-transform checkpoint model answers without rescanning
history.  Pinned exactly on integer metrics; latest is pinned against
a pure-python argmax with the explicit (sort desc, id asc) tie-break.
"""

from __future__ import annotations

import datetime as dt
import random

import pytest

import pyspark.sql.functions as F

from ics_search_engine_spark.operators.transforms import (
    merge_pivot_states,
    pivot_features,
    transform_latest,
    transform_pivot,
)

EPOCH = dt.datetime(2024, 5, 1)


@pytest.fixture(scope="module")
def ev(spark):
    rng = random.Random(777)
    rows = []
    for i in range(400):
        rows.append(
            (
                i,
                EPOCH + dt.timedelta(seconds=rng.randrange(0, 86400 * 3)),
                rng.randrange(0, 25),
                rng.choice(["click", "view", "error"]),
                rng.randrange(-50, 500),  # integer metric: exact merges
            )
        )
    # ties on ts for the latest tie-break + a NULL ts row
    rows.append((900, rows[0][1], rows[0][2], "view", 1))
    rows.append((901, None, rows[0][2], "view", 2))
    return spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, "
        "event_type string, points long",
    ).cache()


class TestLatest:
    def test_matches_python_argmax(self, ev):
        got = {
            r["user_id"]: (r["ts"], r["event_id"])
            for r in transform_latest(
                ev, ["user_id"], "ts", "event_id"
            ).collect()
        }
        best: dict[int, tuple] = {}
        for r in ev.collect():
            key = (
                -(r["ts"].timestamp()) if r["ts"] else float("inf"),
                r["event_id"],
            )
            if r["user_id"] not in best or key < best[r["user_id"]][0]:
                best[r["user_id"]] = (key, (r["ts"], r["event_id"]))
        assert got == {u: v for u, (_, v) in best.items()}

    def test_one_row_per_entity(self, ev):
        out = transform_latest(ev, ["user_id"], "ts", "event_id")
        n_entities = ev.select("user_id").distinct().count()
        assert out.count() == n_entities

    def test_null_sort_never_wins_when_any_nonnull(self, ev):
        row = (
            transform_latest(ev, ["user_id"], "ts", "event_id")
            .where(F.col("event_id") == 901)
            .collect()
        )
        assert row == []  # user has non-NULL ts rows; 901 can't be latest


class TestPivotIncremental:
    def test_merge_equals_oneshot(self, spark, ev):
        half_a = ev.where(F.col("event_id") % 2 == 0)
        half_b = ev.where(F.col("event_id") % 2 == 1)
        keys = ["user_id", "event_type"]
        merged = merge_pivot_states(
            transform_pivot(half_a, keys, ["points"], "ts"),
            transform_pivot(half_b, keys, ["points"], "ts"),
            keys,
        )
        oneshot = transform_pivot(ev, keys, ["points"], "ts")

        def norm(df):
            return sorted(
                (tuple(r) for r in df.collect()),
                key=lambda t: tuple(str(x) for x in t),
            )

        assert norm(merged) == norm(oneshot)

    def test_schema_mismatch_raises(self, ev):
        a = transform_pivot(ev, ["user_id"], ["points"])
        b = transform_pivot(ev, ["user_id"], [])
        with pytest.raises(ValueError, match="schemas differ"):
            merge_pivot_states(a, b, ["user_id"])

    def test_features_match_direct(self, ev):
        state = transform_pivot(ev, ["event_type"], ["points"])
        feats = {
            r["event_type"]: (r["points_avg"], r["points_var"])
            for r in pivot_features(state, ["points"]).collect()
        }
        direct = {
            r["event_type"]: (r["a"], r["v"])
            for r in ev.groupBy("event_type")
            .agg(
                F.avg("points").alias("a"),
                F.var_pop("points").alias("v"),
            )
            .collect()
        }
        assert set(feats) == set(direct)
        for k in feats:
            assert feats[k][0] == pytest.approx(direct[k][0], rel=1e-12)
            assert feats[k][1] == pytest.approx(direct[k][1], rel=1e-9)

    def test_pivot_single_exchange(self, ev):
        plan = (
            transform_pivot(ev, ["user_id"], ["points"])
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert plan.count("Exchange") == 1  # map-side partial + one shuffle
        assert "partial_" in plan.lower() or "partial" in plan


class TestContinuousTransform:
    """transform_pivot_stream: streamed per-batch state ≡ one-shot
    pivot on the same events — the ES continuous-transform guarantee."""

    def test_streamed_state_equals_one_shot(self, spark, tmp_path):
        import os

        import pyarrow.parquet as pq
        import pyspark.sql.functions as F

        from ics_search_engine_spark.operators.transforms import (
            pivot_features,
            transform_pivot,
        )
        from ics_search_engine_spark.streaming.stream_ops import (
            read_pivot_state,
            transform_pivot_stream,
        )

        src = str(tmp_path / "ev_src")
        os.makedirs(src)
        events = spark.read.parquet(
            "/root/testdata/sf0.001/events.parquet"
        ).withColumn(
            "cents", F.round(F.col("value") * 100, 0).cast("long")
        )
        tbl = events.toArrow() if hasattr(events, "toArrow") else None
        if tbl is None:  # older pyspark: go through pandas
            import pyarrow as pa

            tbl = pa.Table.from_pandas(events.toPandas())
        n = tbl.num_rows
        pq.write_table(tbl.slice(0, n // 3), f"{src}/f0.parquet")
        pq.write_table(tbl.slice(n // 3, n // 3), f"{src}/f1.parquet")
        pq.write_table(tbl.slice(2 * (n // 3)), f"{src}/f2.parquet")

        batch_df = spark.read.parquet(src)
        stream = (
            spark.readStream.schema(batch_df.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        out = str(tmp_path / "tx")
        q = (
            transform_pivot_stream(
                stream, out, str(tmp_path / "ckpt"),
                ["user_id"], ["cents"], ts_col="ts",
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

        # at least two batch state dirs materialized
        dirs = os.listdir(f"{out}/state")
        assert len([d for d in dirs if d.startswith("stream_batch=")]) >= 2

        got = {
            r["user_id"]: (
                r["n_events"], r["cents__sum"], r["cents__min"],
                r["cents__max"], r["first_ts"], r["last_ts"],
            )
            for r in read_pivot_state(spark, out, ["user_id"]).collect()
        }
        want = {
            r["user_id"]: (
                r["n_events"], r["cents__sum"], r["cents__min"],
                r["cents__max"], r["first_ts"], r["last_ts"],
            )
            for r in transform_pivot(
                batch_df, ["user_id"], ["cents"], ts_col="ts"
            ).collect()
        }
        assert got == want

        # derived features agree too (integer state -> exact)
        gf = {
            r["user_id"]: (r["cents_avg"], r["cents_var"])
            for r in pivot_features(
                read_pivot_state(spark, out, ["user_id"]), ["cents"]
            ).collect()
        }
        wf = {
            r["user_id"]: (r["cents_avg"], r["cents_var"])
            for r in pivot_features(
                transform_pivot(batch_df, ["user_id"], ["cents"], "ts"),
                ["cents"],
            ).collect()
        }
        assert gf == wf
