"""Rollup job + rollup_search: exactness, config validation, pruning.

The contract under test (operators/rollup): a rollup-served
date_histogram + metrics answer at any whole multiple of the job
grain is EXACT vs aggregating the raw events directly — because the
artifact stores only decomposable state (sum/count/min/max) and avg
is derived at search time.
"""

from __future__ import annotations

import datetime as dt
import os
import random

import pytest

import pyspark.sql.functions as F

from ics_search_engine_spark.operators.rollup import (
    RollupMismatch,
    build_rollup,
    read_meta,
    rollup_search,
)

EPOCH = dt.datetime(2024, 3, 1, 0, 0, 0)


@pytest.fixture(scope="module")
def events_df(spark):
    rng = random.Random(4242)
    rows = []
    for i in range(600):
        ts = EPOCH + dt.timedelta(seconds=rng.randrange(0, 5 * 86400))
        rows.append(
            (
                i,
                ts,
                rng.randrange(0, 12),
                rng.choice(["click", "view", "error"]),
                round(rng.uniform(-5.0, 50.0), 2),
            )
        )
    # a NULL-ts row must never enter the rollup
    rows.append((9999, None, 1, "click", 123.0))
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double"
    )


@pytest.fixture(scope="module")
def rollup_dir(spark, events_df, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("rollup"))
    build_rollup(
        events_df, d, "ts", 3600, ["event_type"], ["value"]
    )
    return d


def _direct(events_df, interval_s, keys):
    bucket = (
        F.floor(F.unix_timestamp("ts") / F.lit(interval_s))
        * F.lit(interval_s)
    ).cast("long")
    return (
        events_df.where(F.col("ts").isNotNull())
        .groupBy(bucket.alias("bucket_start"), *keys)
        .agg(
            F.sum("value").alias("value_sum"),
            F.count("value").alias("value_count"),
            F.min("value").alias("value_min"),
            F.max("value").alias("value_max"),
            F.avg("value").alias("value_avg"),
        )
        .orderBy("bucket_start", *keys)
    )


def _cmp(served_rows, direct_rows):
    assert len(served_rows) == len(direct_rows)
    for s, d in zip(served_rows, direct_rows):
        assert s["bucket_start"] == d["bucket_start"]
        for f in ("value_count", "value_min", "value_max"):
            assert s[f] == d[f], f
        assert s["value_sum"] == pytest.approx(d["value_sum"], abs=1e-9)
        assert s["value_avg"] == pytest.approx(d["value_avg"], abs=1e-12)


class TestExactness:
    def test_coarser_grain_exact(self, spark, events_df, rollup_dir):
        served = rollup_search(
            spark, rollup_dir, 86400, ["event_type"],
            [("value", f) for f in ("sum", "count", "min", "max", "avg")],
        ).collect()
        direct = _direct(events_df, 86400, ["event_type"]).collect()
        _cmp(served, direct)

    def test_same_grain_exact(self, spark, events_df, rollup_dir):
        served = rollup_search(
            spark, rollup_dir, 3600, ["event_type"],
            [("value", "sum"), ("value", "count"), ("value", "avg")],
        ).collect()
        direct = _direct(events_df, 3600, ["event_type"]).collect()
        assert len(served) == len(direct)
        for s, d in zip(served, direct):
            assert (s["bucket_start"], s["event_type"]) == (
                d["bucket_start"], d["event_type"])
            assert s["value_count"] == d["value_count"]

    def test_group_subset_drops_key(self, spark, events_df, rollup_dir):
        """Searching with NO group keys re-aggregates across the
        stored event_type dimension — the ES group-subset rule."""
        served = rollup_search(
            spark, rollup_dir, 86400, [], [("value", "count")]
        ).collect()
        direct = _direct(events_df, 86400, []).collect()
        assert [r["value_count"] for r in served] == [
            r["value_count"] for r in direct
        ]

    def test_null_ts_never_rolled(self, events_df, rollup_dir, spark):
        meta = read_meta(rollup_dir)
        assert meta["raw_rows"] == 600  # the NULL-ts row is excluded
        total = rollup_search(
            spark, rollup_dir, 10 * 86400, [], [("value", "count")]
        ).collect()
        assert sum(r["value_count"] for r in total) == 600


class TestValidation:
    def test_non_multiple_interval(self, spark, rollup_dir):
        with pytest.raises(RollupMismatch, match="not a multiple"):
            rollup_search(spark, rollup_dir, 5400, [], [("value", "sum")])

    def test_unknown_group_key(self, spark, rollup_dir):
        with pytest.raises(RollupMismatch, match="group keys"):
            rollup_search(
                spark, rollup_dir, 86400, ["user_id"], [("value", "sum")]
            )

    def test_unknown_metric_col(self, spark, rollup_dir):
        with pytest.raises(RollupMismatch, match="not stored"):
            rollup_search(
                spark, rollup_dir, 86400, [], [("event_id", "sum")]
            )

    def test_bad_fn(self, spark, rollup_dir):
        with pytest.raises(RollupMismatch, match="unsupported"):
            rollup_search(
                spark, rollup_dir, 86400, [], [("value", "median")]
            )

    def test_bad_interval_build(self, events_df, tmp_path):
        with pytest.raises(ValueError):
            build_rollup(
                events_df, str(tmp_path), "ts", 0, [], ["value"]
            )


class TestArtifact:
    def test_day_partition_layout(self, rollup_dir):
        days = [
            d for d in os.listdir(os.path.join(rollup_dir, "buckets"))
            if d.startswith("roll_day=")
        ]
        assert sorted(days) == [
            f"roll_day=2024-03-0{i}" for i in range(1, 6)
        ]

    def test_time_bounds_prune_rows(self, spark, events_df, rollup_dir):
        served = rollup_search(
            spark, rollup_dir, 86400, [], [("value", "count")],
            ts_min="2024-03-02 00:00:00", ts_max="2024-03-04 00:00:00",
        ).collect()
        assert [r["bucket_start"] for r in served] == [
            int((EPOCH + dt.timedelta(days=d)).timestamp()) for d in (1, 2)
        ]
        direct = {
            r["bucket_start"]: r["value_count"]
            for r in _direct(events_df, 86400, []).collect()
        }
        for r in served:
            assert r["value_count"] == direct[r["bucket_start"]]

    def test_partition_filter_in_plan(self, spark, rollup_dir):
        df = rollup_search(
            spark, rollup_dir, 86400, [], [("value", "count")],
            ts_min="2024-03-02 00:00:00",
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "roll_day" in plan  # partition predicate reached the scan

    def test_meta_lineage(self, rollup_dir):
        meta = read_meta(rollup_dir)
        assert meta["interval_s"] == 3600
        assert meta["group_cols"] == ["event_type"]
        assert meta["rollup_rows"] > 0
        assert meta["rollup_rows"] < meta["raw_rows"]
