"""EQL sequence matching + categorize_text + change_point semantics.

The gate (`eql_sequence` etc. in CORRECTNESS) proves Spark/DuckDB
parity at sf0.01; these tests pin the SEMANTICS on hand-built event
sets where the right answer is computed by eye, plus a brute-force
reference for the greedy chain on random data.
"""

import datetime as dt
import random

import pyspark.sql.functions as F
import pytest

from ics_search_engine_spark.operators.aggs import categorize_text, change_point
from ics_search_engine_spark.operators.eql import sequence_matches

T0 = dt.datetime(2024, 1, 1)


def _ev(spark, rows):
    """rows: (event_id, user, type, seconds-offset)."""
    return spark.createDataFrame(
        [
            (i, u, t, T0 + dt.timedelta(seconds=s))
            for (i, u, t, s) in rows
        ],
        "event_id long, user_id string, event_type string, ts timestamp",
    )


def _seq(spark, rows, types, maxspan_s=None):
    ev = _ev(spark, rows)
    stages = [F.col("event_type") == t for t in types]
    return sequence_matches(
        ev, by="user_id", stages=stages, maxspan_s=maxspan_s
    ).collect()


class TestSequenceMatches:
    def test_basic_funnel(self, spark):
        rows = [
            (1, "u1", "view", 0),
            (2, "u1", "click", 10),
            (3, "u1", "buy", 20),
            (4, "u2", "view", 0),
            (5, "u2", "buy", 10),  # no click -> no match
        ]
        out = _seq(spark, rows, ["view", "click", "buy"])
        assert len(out) == 1
        r = out[0]
        assert (r["user_id"], r["id_1"], r["id_2"], r["id_3"]) == (
            "u1", 1, 2, 3,
        )

    def test_greedy_earliest_completion(self, spark):
        # two clicks after the view: the EARLIEST click wins, even
        # though the later one also completes
        rows = [
            (1, "u", "view", 0),
            (2, "u", "click", 5),
            (3, "u", "click", 8),
            (4, "u", "buy", 9),
        ]
        out = _seq(spark, rows, ["view", "click", "buy"])
        assert len(out) == 1
        assert out[0]["id_2"] == 2

    def test_no_backtracking_on_dead_end(self, spark):
        # greedy stage-2 pointer (earliest click) has no following
        # buy INSIDE maxspan; a later click would have completed, but
        # the chain does not backtrack — documented semantics
        rows = [
            (1, "u", "view", 0),
            (2, "u", "click", 5),
            (3, "u", "buy", 100),
            (4, "u", "click", 99),
        ]
        out = _seq(spark, rows, ["view", "click", "buy"], maxspan_s=50)
        assert out == []

    def test_every_anchor_matches(self, spark):
        # two views share the same click+buy completion: one row per
        # anchor (EQL emits per-head-event sequences the same way)
        rows = [
            (1, "u", "view", 0),
            (2, "u", "view", 1),
            (3, "u", "click", 2),
            (4, "u", "buy", 3),
        ]
        out = _seq(spark, rows, ["view", "click", "buy"])
        assert [r["id_1"] for r in out] == [1, 2]
        assert {(r["id_2"], r["id_3"]) for r in out} == {(3, 4)}

    def test_maxspan_boundary_inclusive(self, spark):
        rows = [
            (1, "u", "a", 0),
            (2, "u", "b", 60),
        ]
        assert len(_seq(spark, rows, ["a", "b"], maxspan_s=60)) == 1
        assert len(_seq(spark, rows, ["a", "b"], maxspan_s=59)) == 0

    def test_timestamp_tie_breaks_on_id(self, spark):
        # same ts for both candidate stage-2 events: lower event_id is
        # "earlier" by the documented total order
        rows = [
            (1, "u", "a", 0),
            (9, "u", "b", 5),
            (3, "u", "b", 5),
        ]
        out = _seq(spark, rows, ["a", "b"])
        assert len(out) == 1
        assert out[0]["id_2"] == 3

    def test_strictly_after(self, spark):
        # an event can't match two stages of the same chain, and a
        # stage-2 event at the SAME (ts, id) as stage 1 is not "after"
        rows = [(1, "u", "ab", 0)]
        ev = _ev(spark, rows)
        both = F.col("event_type") == "ab"
        out = sequence_matches(ev, by="user_id", stages=[both, both])
        assert out.count() == 0

    def test_matches_bruteforce_reference(self, spark):
        """Randomized: greedy chain vs a per-key python reference."""
        rng = random.Random(7)
        rows = []
        for i in range(300):
            rows.append(
                (i, f"u{rng.randrange(8)}", rng.choice("abc"), i)
            )

        def brute():
            per_key = {}
            for (i, u, t, s) in rows:
                per_key.setdefault(u, []).append((s, i, t))
            matches = []
            for u, evs in per_key.items():
                evs.sort()
                for j, (s, i, t) in enumerate(evs):
                    if t != "a":
                        continue
                    chain = [(s, i)]
                    pos = j
                    ok = True
                    for want in ("b", "c"):
                        nxt = next(
                            (
                                (s2, i2)
                                for (s2, i2, t2) in evs[pos + 1 :]
                                if t2 == want
                            ),
                            None,
                        )
                        if nxt is None:
                            ok = False
                            break
                        chain.append(nxt)
                        pos = next(
                            k
                            for k, e in enumerate(evs)
                            if (e[0], e[1]) == nxt
                        )
                    if ok:
                        matches.append(
                            (u, chain[0][1], chain[1][1], chain[2][1])
                        )
            return sorted(matches)

        out = _seq(spark, rows, ["a", "b", "c"])
        got = sorted(
            (r["user_id"], r["id_1"], r["id_2"], r["id_3"]) for r in out
        )
        assert got == brute()

    def test_until_kills_pending_sequence(self, spark):
        rows = [
            (1, "u", "view", 0),
            (2, "u", "err", 5),   # expires the pending sequence
            (3, "u", "click", 10),
            (4, "u", "buy", 20),
            (5, "v", "view", 0),  # clean key still matches
            (6, "v", "click", 10),
            (7, "v", "buy", 20),
        ]
        ev = _ev(spark, rows)
        et = F.col("event_type")
        out = sequence_matches(
            ev,
            by="user_id",
            stages=[et == "view", et == "click", et == "buy"],
            until=et == "err",
        ).collect()
        assert [r["user_id"] for r in out] == ["v"]

    def test_until_after_completion_is_harmless(self, spark):
        rows = [
            (1, "u", "view", 0),
            (2, "u", "click", 5),
            (3, "u", "buy", 10),
            (4, "u", "err", 15),  # after the completing event
        ]
        ev = _ev(spark, rows)
        et = F.col("event_type")
        out = sequence_matches(
            ev,
            by="user_id",
            stages=[et == "view", et == "click", et == "buy"],
            until=et == "err",
        ).collect()
        assert len(out) == 1

    def test_until_on_completing_event_still_completes(self, spark):
        # documented tie rule: an event matching the final stage AND
        # until completes the sequence (finish before expiry)
        rows = [
            (1, "u", "view", 0),
            (2, "u", "buy_err", 5),
        ]
        ev = _ev(spark, rows)
        et = F.col("event_type")
        out = sequence_matches(
            ev,
            by="user_id",
            stages=[et == "view", et.contains("buy")],
            until=et.contains("err"),
        ).collect()
        assert len(out) == 1

    def test_forbid_kills_match_with_event_in_gap(self, spark):
        rows = [
            (1, "u", "view", 0),
            (2, "u", "err", 5),
            (3, "u", "buy", 10),
            (4, "v", "view", 0),
            (5, "v", "buy", 10),
            (6, "v", "err", 20),  # after completion: harmless
        ]
        ev = _ev(spark, rows)
        et = F.col("event_type")
        out = sequence_matches(
            ev,
            by="user_id",
            stages=[et == "view", et == "buy"],
            forbid={1: et == "err"},
        ).collect()
        assert [r["user_id"] for r in out] == ["v"]

    def test_forbid_is_per_gap_not_global(self, spark):
        # err between stages 2 and 3 only; forbidding gap 1 leaves
        # the match alive, forbidding gap 2 kills it
        rows = [
            (1, "u", "a", 0),
            (2, "u", "b", 5),
            (3, "u", "err", 7),
            (4, "u", "c", 10),
        ]
        ev = _ev(spark, rows)
        et = F.col("event_type")
        stages = [et == "a", et == "b", et == "c"]
        alive = sequence_matches(
            ev, by="user_id", stages=stages, forbid={1: et == "err"}
        ).count()
        dead = sequence_matches(
            ev, by="user_id", stages=stages, forbid={2: et == "err"}
        ).count()
        assert (alive, dead) == (1, 0)

    def test_forbid_strictly_between(self, spark):
        # the stage event itself matching the forbid predicate does
        # not kill the match ("between" is strict)
        rows = [
            (1, "u", "a", 0),
            (2, "u", "b_err", 5),
        ]
        ev = _ev(spark, rows)
        et = F.col("event_type")
        out = sequence_matches(
            ev,
            by="user_id",
            stages=[et == "a", et.contains("b")],
            forbid={1: et.contains("err")},
        ).count()
        assert out == 1

    def test_forbid_bad_gap_raises(self, spark):
        ev = _ev(spark, [(1, "u", "a", 0)])
        et = F.col("event_type")
        with pytest.raises(ValueError, match="gap indexes"):
            sequence_matches(
                ev,
                by="user_id",
                stages=[et == "a", et == "b"],
                forbid={2: et == "x"},
            )

    def test_requires_two_stages(self, spark):
        with pytest.raises(ValueError):
            sequence_matches(
                _ev(spark, [(1, "u", "a", 0)]),
                by="user_id",
                stages=[F.col("event_type") == "a"],
            )


class TestCategorizeText:
    def _run(self, spark, texts, **kw):
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)],
            "doc_id long, text string",
        )
        return {
            r["category"]: (r["n_docs"], r["example_id"])
            for r in categorize_text(df, **kw).collect()
        }

    def test_digit_masking_buckets_log_lines(self, spark):
        cats = self._run(
            spark,
            [
                "error 42 on node17 retrying",
                "error 77 on node99 retrying",
                "startup complete",
            ],
        )
        assert cats == {
            "error # on # retrying": (2, 0),
            "startup complete": (1, 2),
        }

    def test_len1_tokens_drop_before_masking(self, spark):
        # reference tokenization drops len<2 tokens FIRST, so a
        # single-digit value vanishes rather than masking to '#'
        cats = self._run(spark, ["error 7 retrying"])
        assert cats == {"error retrying": (1, 0)}

    def test_token_limit_and_short_token_drop(self, spark):
        # 'a' dropped (len<2); only first 2 tokens kept
        cats = self._run(
            spark, ["a bb cc dd", "bb cc zz"], max_tokens=2
        )
        assert cats == {"bb cc": (2, 0)}

    def test_case_and_punct_folding(self, spark):
        cats = self._run(spark, ["GET /api/users", "get api users"])
        assert cats == {"get api users": (2, 0)}


class TestChangePoint:
    def _series(self, spark, values):
        rows = [
            (T0 + dt.timedelta(hours=i), float(v))
            for i, v in enumerate(values)
        ]
        return spark.createDataFrame(rows, "hour timestamp, v double")

    def test_step_up_found_at_boundary(self, spark):
        df = self._series(spark, [10, 10, 10, 10, 50, 50, 50, 50])
        r = change_point(df, "hour", "v").collect()[0]
        # split after index 4 (1-based i=4): last low bucket
        assert r["hour"] == T0 + dt.timedelta(hours=3)
        assert r["direction"] == "spike_up"
        assert r["mean_before_r6"] == 10.0
        assert r["mean_after_r6"] == 50.0
        # stat = 40 * sqrt(4*4/8)
        assert r["stat_r6"] == pytest.approx(40 * (16 / 8) ** 0.5)

    def test_step_down_direction(self, spark):
        df = self._series(spark, [9, 9, 9, 1, 1, 1])
        r = change_point(df, "hour", "v").collect()[0]
        assert r["direction"] == "spike_down"
        assert r["hour"] == T0 + dt.timedelta(hours=2)

    def test_tie_breaks_on_earliest_bucket(self, spark):
        # symmetric series: both splits score identically after
        # rounding; earliest hour must win deterministically
        df = self._series(spark, [0, 5, 0])
        r = change_point(df, "hour", "v").collect()
        assert len(r) == 1
        assert r[0]["hour"] == T0


class TestEqlTextFrontend:
    @pytest.fixture(scope="class")
    def ev(self, spark):
        rows = [
            (i, f"u{i % 5}",
             ["view", "click", "purchase", "error"][i % 4],
             float(10 * i % 70),
             T0 + dt.timedelta(minutes=11 * i))
            for i in range(80)
        ]
        return spark.createDataFrame(
            rows,
            "event_id long, user_id string, event_type string,"
            " value double, ts timestamp",
        )

    def test_text_equals_programmatic(self, spark, ev):
        import pyspark.sql.functions as F

        from ics_search_engine_spark.operators.eql import (
            eql_text_query,
            sequence_matches,
        )

        et = F.col("event_type")
        want = sequence_matches(
            ev, by="user_id",
            stages=[et == "view", et == "click", et == "purchase"],
            maxspan_s=6 * 3600,
        ).collect()
        got = eql_text_query(
            ev,
            "sequence by user_id with maxspan=6h"
            " [view] [click] [purchase]",
        ).collect()
        assert got == want and len(got) > 0

    def test_where_condition_and_until(self, spark, ev):
        import pyspark.sql.functions as F

        from ics_search_engine_spark.operators.eql import (
            eql_text_query,
            sequence_matches,
        )

        et = F.col("event_type")
        want = sequence_matches(
            ev, by="user_id",
            stages=[(et == "view") & F.expr("value > 10"), et == "purchase"],
            maxspan_s=2 * 3600,
            until=et == "error",
        ).collect()
        got = eql_text_query(
            ev,
            'sequence by user_id with maxspan=2h'
            ' [view where value > 10] [purchase] until [error]',
        ).collect()
        assert got == want

    def test_missing_event_negation(self, spark, ev):
        import pyspark.sql.functions as F

        from ics_search_engine_spark.operators.eql import (
            eql_text_query,
            sequence_matches,
        )

        et = F.col("event_type")
        want = sequence_matches(
            ev, by="user_id",
            stages=[et == "view", et == "purchase"],
            maxspan_s=2 * 3600,
            forbid={1: et == "error"},
        ).collect()
        got = eql_text_query(
            ev,
            "sequence by user_id with maxspan=2h"
            " [view] ![error] [purchase]",
        ).collect()
        assert got == want

    def test_single_event_form(self, spark, ev):
        from ics_search_engine_spark.operators.eql import eql_text_query

        got = eql_text_query(ev, 'view where value > 50')
        assert got.count() == ev.filter(
            "event_type = 'view' AND value > 50"
        ).count()

    def test_multi_by_synthesizes_key(self, spark, ev):
        from ics_search_engine_spark.operators.eql import eql_text_query

        got = eql_text_query(
            ev,
            "sequence by user_id, event_type with maxspan=6h [any] [any]",
        )
        assert got.count() >= 0  # parses and plans

    def test_parse_errors(self, spark, ev):
        from ics_search_engine_spark.operators.eql import (
            EqlParseError,
            eql_text_query,
        )

        for bad in [
            "sequence [view] [click]",               # no by
            "sequence by u with maxspan=6h [view]",  # one stage
            "sequence by u [view] ![e]",             # trailing negation
            "sequence by u ![e] [view] [click]",     # leading negation
            "sequence by u [view] [click] until [a] until [b]",
        ]:
            with pytest.raises(EqlParseError):
                eql_text_query(ev, bad.replace(" u ", " user_id "))
