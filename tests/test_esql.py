"""ES|QL-lite compiler: lexer, expression shim, every command, and
composed pipes.  The gate (`esql_stats`) proves Spark/DuckDB parity on
the full pipe at sf0.01; these tests pin each command's semantics."""

import datetime as dt

import pytest

from ics_search_engine_spark.operators.esql import (
    EsqlError,
    dissect_to_regex,
    esql_query,
    split_commas,
    split_pipes,
)

T0 = dt.datetime(2024, 1, 1)


@pytest.fixture(scope="module")
def ev(spark):
    rows = [
        (i, f"u{i % 4}", ["view", "click", "error"][i % 3],
         float(10 * i % 70), T0 + dt.timedelta(minutes=17 * i))
        for i in range(60)
    ]
    return spark.createDataFrame(
        rows,
        "event_id long, user_id string, event_type string,"
        " value double, ts timestamp",
    )


def run(spark, ev, pipe):
    return esql_query(spark, pipe, {"events": ev})


class TestLexer:
    def test_pipe_inside_string_is_literal(self):
        parts = split_pipes('FROM t | WHERE a == "x|y" | LIMIT 1')
        assert len(parts) == 3
        assert parts[1] == 'WHERE a == "x|y"'

    def test_pipe_inside_parens_is_literal(self):
        # no function actually uses |, but the lexer must not split
        parts = split_pipes("FROM t | EVAL x = f(a | b)")
        assert len(parts) == 2

    def test_unterminated_string_raises(self):
        with pytest.raises(EsqlError):
            split_pipes('FROM t | WHERE a == "x')

    def test_commas_inside_calls(self):
        assert split_commas("a = f(x, y), b = 2") == ["a = f(x, y)", "b = 2"]


class TestCommands:
    def test_where_and_keep(self, spark, ev):
        out = run(
            spark, ev,
            'FROM events | WHERE event_type == "error" | KEEP event_id',
        )
        assert out.columns == ["event_id"]
        assert out.count() == 20

    def test_eval_sequential_reference(self, spark, ev):
        out = run(
            spark, ev,
            "FROM events | EVAL a = value * 2, b = a + 1"
            " | WHERE event_id == 3 | KEEP a, b",
        ).collect()[0]
        assert (out["a"], out["b"]) == (60.0, 61.0)

    def test_eval_replaces_existing_column(self, spark, ev):
        out = run(
            spark, ev,
            "FROM events | EVAL value = 0 | STATS s = SUM(value)",
        ).collect()[0]
        assert out["s"] == 0

    def test_stats_global_and_by(self, spark, ev):
        tot = run(spark, ev, "FROM events | STATS n = COUNT(*)").collect()
        assert tot[0]["n"] == 60
        by = run(
            spark, ev,
            "FROM events | STATS n = COUNT(*) BY event_type | SORT event_type",
        ).collect()
        assert [(r["event_type"], r["n"]) for r in by] == [
            ("click", 20), ("error", 20), ("view", 20),
        ]

    def test_stats_by_computed_key(self, spark, ev):
        out = run(
            spark, ev,
            "FROM events | STATS n = COUNT(*) BY day = DATE_TRUNC(1 day, ts)"
            " | SORT day | LIMIT 1",
        ).collect()[0]
        assert out["day"] == T0
        # 17-minute cadence: all 60 events land inside day one
        assert out["n"] == 60

    def test_percentile_is_0_to_100(self, spark, ev):
        out = run(
            spark, ev,
            "FROM events | STATS m = PERCENTILE(value, 50), md = MEDIAN(value)",
        ).collect()[0]
        assert out["m"] == out["md"]

    def test_values_is_sorted_set(self, spark, ev):
        out = run(
            spark, ev, "FROM events | STATS t = VALUES(event_type)"
        ).collect()[0]
        assert out["t"] == ["click", "error", "view"]

    def test_sort_desc_and_limit(self, spark, ev):
        out = run(
            spark, ev,
            "FROM events | SORT value DESC, event_id ASC | LIMIT 3"
            " | KEEP event_id",
        ).collect()
        # value = 10*i % 70 -> max 60 at i=6,13,20,...; id asc ties
        assert [r["event_id"] for r in out] == [6, 13, 20]

    def test_rename_and_drop(self, spark, ev):
        out = run(
            spark, ev,
            "FROM events | RENAME value AS v | DROP ts, user_id"
            " | LIMIT 1",
        )
        assert "v" in out.columns and "value" not in out.columns
        assert "ts" not in out.columns

    def test_mv_expand(self, spark):
        df = esql_query(
            spark,
            'ROW id = 1 | EVAL tags = SPLIT("a,b,c", ",") | MV_EXPAND tags',
        )
        assert [r["tags"] for r in df.collect()] == ["a", "b", "c"]

    def test_row_literal(self, spark):
        r = esql_query(spark, 'ROW a = 1 + 1, b = "x"').collect()[0]
        assert (r["a"], r["b"]) == (2, "x")

    def test_from_union_two_tables(self, spark, ev):
        out = esql_query(
            spark,
            "FROM a, b | STATS n = COUNT(*)",
            {"a": ev, "b": ev},
        ).collect()[0]
        assert out["n"] == 120


class TestDissect:
    def test_pattern_to_regex(self):
        rx, keys = dissect_to_regex("%{a} - %{?skip} %{b}")
        assert keys == ["a", "b"]
        import re

        m = re.match(rx, "x - y z")
        assert m.groups() == ("x", "z")

    def test_dissect_command(self, spark):
        out = esql_query(
            spark,
            'ROW msg = "GET /u 200" | DISSECT msg "%{verb} %{path} %{code}"'
            " | KEEP verb, path, code",
        ).collect()[0]
        assert tuple(out) == ("GET", "/u", "200")

    def test_dissect_nonmatch_is_null(self, spark):
        out = esql_query(
            spark,
            'ROW msg = "nospace" | DISSECT msg "%{a} %{b}" | KEEP a, b',
        ).collect()[0]
        assert out["a"] is None and out["b"] is None


class TestShim:
    def test_double_eq_and_string_literal(self, spark, ev):
        n = run(
            spark, ev, 'FROM events | WHERE event_type == "view"'
        ).count()
        assert n == 20

    def test_eq_inside_string_untouched(self, spark):
        r = esql_query(spark, 'ROW s = "a == b"').collect()[0]
        assert r["s"] == "a == b"

    def test_like_wildcards(self, spark, ev):
        n = run(
            spark, ev, 'FROM events | WHERE event_type LIKE "cl*"'
        ).count()
        assert n == 20
        n1 = run(
            spark, ev, 'FROM events | WHERE event_type LIKE "vie?"'
        ).count()
        assert n1 == 20

    def test_like_escapes_percent_literal(self, spark):
        out = esql_query(
            spark,
            'ROW s = "100%" | WHERE s LIKE "100%"',
        ).collect()
        # the % is LITERAL in ES|QL (only * and ? are wildcards)
        assert len(out) == 1
        out2 = esql_query(
            spark, 'ROW s = "100x" | WHERE s LIKE "100%"'
        ).collect()
        assert out2 == []


class TestErrors:
    def test_unknown_command(self, spark, ev):
        with pytest.raises(EsqlError, match="unsupported command"):
            run(spark, ev, "FROM events | FROBNICATE x")

    def test_keep_unknown_column(self, spark, ev):
        with pytest.raises(EsqlError, match="unknown columns"):
            run(spark, ev, "FROM events | KEEP nope")

    def test_unsupported_agg(self, spark, ev):
        with pytest.raises(EsqlError, match="unsupported STATS function"):
            run(spark, ev, "FROM events | STATS x = MODE(value)")

    def test_must_start_with_from(self, spark, ev):
        with pytest.raises(EsqlError, match="must start with"):
            run(spark, ev, "WHERE x == 1")

    def test_bad_limit(self, spark, ev):
        with pytest.raises(EsqlError, match="LIMIT"):
            run(spark, ev, "FROM events | LIMIT ten")


class TestGrok:
    def test_typed_captures(self, spark):
        out = esql_query(
            spark,
            'ROW line = "ERROR 42 took 1.5 ms"'
            ' | GROK line "%{LOGLEVEL:lvl} %{INT:code:int} took'
            ' %{NUMBER:ms:float} ms"'
            " | KEEP lvl, code, ms",
        ).collect()[0]
        assert (out["lvl"], out["code"], out["ms"]) == ("ERROR", 42, 1.5)
        assert isinstance(out["code"], int)

    def test_anonymous_pattern_and_nonmatch(self, spark):
        df = esql_query(
            spark,
            'ROW line = "no digits here"'
            ' | GROK line "%{WORD:w} %{INT:n:int}%{GREEDYDATA}"',
        ).collect()[0]
        assert df["w"] is None and df["n"] is None

    def test_unknown_pattern_raises(self, spark):
        with pytest.raises(EsqlError, match="unknown grok pattern"):
            esql_query(spark, 'ROW x = "a" | GROK x "%{NOPE:y}"')


class TestEnrich:
    def test_lookup_join_with_defaults(self, spark, ev):
        dim = spark.createDataFrame(
            [("view", "read", 1), ("click", "act", 2)],
            "etype string, kind string, weight int",
        )
        out = esql_query(
            spark,
            "FROM events | ENRICH types ON event_type"
            " | STATS n = COUNT(*) BY kind | SORT kind NULLS LAST",
            {"events": ev},
            enrich={"types": (dim, "etype")},
        ).collect()
        assert [(r["kind"], r["n"]) for r in out] == [
            ("act", 20), ("read", 20), (None, 20),
        ]

    def test_with_rename_subset(self, spark, ev):
        dim = spark.createDataFrame(
            [("view", "read", 1)], "etype string, kind string, w int"
        )
        out = esql_query(
            spark,
            "FROM events | ENRICH t ON event_type WITH k = kind | LIMIT 1",
            {"events": ev},
            enrich={"t": (dim, "etype")},
        )
        assert "k" in out.columns and "w" not in out.columns

    def test_unknown_policy(self, spark, ev):
        with pytest.raises(EsqlError, match="unknown enrich policy"):
            esql_query(
                spark, "FROM events | ENRICH nope ON event_type",
                {"events": ev},
            )

    def test_broadcast_in_plan(self, spark, ev):
        dim = spark.createDataFrame(
            [("view", "read")], "etype string, kind string"
        )
        df = esql_query(
            spark,
            "FROM events | ENRICH t ON event_type",
            {"events": ev},
            enrich={"t": (dim, "etype")},
        )
        import contextlib, io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain()
        assert "BroadcastHashJoin" in buf.getvalue()


class TestMatch:
    def test_match_uses_engine_analyzer(self, spark):
        docs = spark.createDataFrame(
            [
                (0, "machine learning models"),
                (1, "the learner machines well"),  # stems to machin/learn.. no
                (2, "nothing relevant"),
            ],
            "doc_id long, text string",
        )
        # 'machines' stems to 'machin' like the query term; match is
        # OR-semantics over analyzed terms
        out = esql_query(
            spark,
            'FROM docs | WHERE MATCH(text, "machine") | KEEP doc_id'
            " | SORT doc_id",
            {"docs": docs},
        ).collect()
        assert [r["doc_id"] for r in out] == [0, 1]

    def test_match_stopword_only_query_is_false(self, spark):
        docs = spark.createDataFrame(
            [(0, "the and of")], "doc_id long, text string"
        )
        out = esql_query(
            spark,
            'FROM docs | WHERE MATCH(text, "the and")',
            {"docs": docs},
        ).collect()
        assert out == []


class TestStatsWhere:
    def test_per_agg_filter(self, spark, ev):
        out = run(
            spark, ev,
            'FROM events | STATS total = COUNT(*),'
            ' errs = COUNT(*) WHERE event_type == "error",'
            ' err_val = SUM(value) WHERE event_type == "error"',
        ).collect()[0]
        assert out["total"] == 60
        assert out["errs"] == 20
        # value=10i%70 over i=2,5,8,...,59 (event_type error at i%3==2)
        expect = sum(10 * i % 70 for i in range(60) if i % 3 == 2)
        assert out["err_val"] == float(expect)

    def test_filter_with_by(self, spark, ev):
        out = run(
            spark, ev,
            "FROM events | STATS big = COUNT(*) WHERE value > 30"
            " BY event_type | SORT event_type",
        ).collect()
        assert [r["event_type"] for r in out] == ["click", "error", "view"]
        assert all(0 < r["big"] < 20 for r in out)


class TestInlinestats:
    def test_by_keys_joins_aggregate_back(self, spark, ev):
        out = run(
            spark, ev,
            "FROM events | INLINESTATS user_avg = AVG(value) BY user_id"
            " | WHERE value > user_avg | STATS n = COUNT(*)",
        ).collect()
        # manual: rows strictly above their user's mean
        import pyspark.sql.functions as F
        from pyspark.sql.window import Window

        manual = (
            ev.withColumn(
                "ua", F.avg("value").over(Window.partitionBy("user_id"))
            )
            .filter(F.col("value") > F.col("ua"))
            .count()
        )
        assert out[0]["n"] == manual > 0

    def test_global_form_broadcasts_not_single_partition(self, spark, ev):
        df = run(spark, ev, "FROM events | INLINESTATS m = MAX(value)")
        assert df.count() == 60
        assert df.filter("value = m").count() > 0
        plan = df._jdf.queryExecution().executedPlan().toString()
        # no global Window over all rows; the one-row aggregate is
        # broadcast (its own SinglePartition exchange sees only the
        # map-side partials — one row per partition)
        assert "Window" not in plan
        assert "BroadcastNestedLoopJoin" in plan
        assert "partial_max" in plan

    def test_rejects_per_agg_where(self, spark, ev):
        with pytest.raises(EsqlError, match="per-aggregate"):
            run(
                spark, ev,
                'FROM events | INLINESTATS n = COUNT(*)'
                ' WHERE event_type == "view" BY user_id',
            )

    def test_unknown_by_column(self, spark, ev):
        with pytest.raises(EsqlError, match="unknown columns"):
            run(spark, ev, "FROM events | INLINESTATS n = COUNT(*) BY nope")


class TestLookupJoin:
    def test_adds_and_overwrites(self, spark, ev):
        dim = spark.createDataFrame(
            [("u0", "gold", -1.0), ("u1", "silver", -2.0)],
            "user_id string, tier string, value double",
        )
        out = esql_query(
            spark,
            "FROM events | LOOKUP JOIN users ON user_id"
            " | STATS n = COUNT(*) BY tier",
            {"events": ev, "users": dim},
        ).collect()
        by_tier = {r["tier"]: r["n"] for r in out}
        assert by_tier["gold"] == 15 and by_tier["silver"] == 15
        assert by_tier[None] == 30  # u2/u3 unmatched -> left join
        # same-named non-key column is OVERWRITTEN by the lookup side
        vals = esql_query(
            spark,
            'FROM events | LOOKUP JOIN users ON user_id'
            ' | WHERE user_id == "u0" | KEEP value',
            {"events": ev, "users": dim},
        ).collect()
        assert {r["value"] for r in vals} == {-1.0}

    def test_is_broadcast(self, spark, ev):
        dim = spark.createDataFrame([("u0", "x")], "user_id string, t string")
        df = esql_query(
            spark, "FROM events | LOOKUP JOIN d ON user_id",
            {"events": ev, "d": dim},
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan

    def test_missing_field_raises(self, spark, ev):
        dim = spark.createDataFrame([("x",)], "other string")
        with pytest.raises(EsqlError, match="both sides"):
            esql_query(
                spark, "FROM events | LOOKUP JOIN d ON user_id",
                {"events": ev, "d": dim},
            )


class TestSample:
    def test_by_form_is_deterministic_and_nested(self, spark, ev):
        a = run(spark, ev, "FROM events | SAMPLE 0.3 BY event_id")
        b = run(spark, ev, "FROM events | SAMPLE 0.3 BY event_id")
        wide = run(spark, ev, "FROM events | SAMPLE 0.8 BY event_id")
        ids = {r["event_id"] for r in a.collect()}
        assert ids == {r["event_id"] for r in b.collect()}
        assert ids <= {r["event_id"] for r in wide.collect()}
        assert 0 < len(ids) < 60

    def test_bad_probability(self, spark, ev):
        with pytest.raises(EsqlError, match="probability"):
            run(spark, ev, "FROM events | SAMPLE 1.5")


class TestChangePointCmd:
    def test_matches_aggs_kernel(self, spark, ev):
        import pyspark.sql.functions as F

        from ics_search_engine_spark.operators.aggs import change_point

        buckets = ev.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour")
        ).agg(F.count("*").alias("n"))
        direct = change_point(buckets, "hour", "n").collect()
        piped = run(
            spark, ev,
            "FROM events | EVAL hour = DATE_TRUNC(1 hour, ts)"
            " | STATS n = COUNT(*) BY hour | CHANGE_POINT n ON hour",
        ).collect()
        assert [r.asDict() for r in piped] == [r.asDict() for r in direct]

    def test_unknown_columns(self, spark, ev):
        with pytest.raises(EsqlError, match="unknown columns"):
            run(spark, ev, "FROM events | CHANGE_POINT nope ON ts")


class TestForkFuse:
    def test_fork_unions_with_fork_tag(self, spark, ev):
        out = run(
            spark, ev,
            'FROM events'
            ' | FORK ( WHERE event_type == "view" | LIMIT 100 )'
            '        ( WHERE event_type == "click" | LIMIT 100 )',
        )
        rows = out.collect()
        tags = {r["_fork"] for r in rows}
        assert tags == {"fork1", "fork2"}
        assert all(
            (r["_fork"] == "fork1") == (r["event_type"] == "view")
            for r in rows
        )

    def test_fork_branches_may_diverge_in_columns(self, spark, ev):
        out = run(
            spark, ev,
            "FROM events"
            " | FORK ( EVAL a = value * 2 | LIMIT 5 )"
            "        ( EVAL b = value + 1 | LIMIT 5 )",
        ).collect()
        f1 = [r for r in out if r["_fork"] == "fork1"]
        f2 = [r for r in out if r["_fork"] == "fork2"]
        assert all(r["b"] is None for r in f1)
        assert all(r["a"] is None for r in f2)

    def test_fuse_matches_manual_rrf(self, spark, ev):
        piped = run(
            spark, ev,
            'FROM events'
            ' | FORK ( WHERE event_type == "view" | SORT value DESC,'
            ' event_id ASC | LIMIT 10 )'
            '        ( WHERE value > 30 | SORT value DESC, event_id ASC'
            ' | LIMIT 10 )'
            " | FUSE event_id BY value"
            " | SORT fused DESC, event_id ASC | LIMIT 5",
        ).collect()
        import pyspark.sql.functions as F

        from ics_search_engine_spark.operators.hybrid import (
            add_rank,
            rrf_fuse,
        )

        l1 = (ev.filter("event_type = 'view'")
              .orderBy(F.desc("value"), F.asc("event_id")).limit(10))
        l2 = (ev.filter("value > 30")
              .orderBy(F.desc("value"), F.asc("event_id")).limit(10))
        manual = rrf_fuse(
            [add_rank(l1, "value", "event_id"),
             add_rank(l2, "value", "event_id")],
            "event_id", k=60,
        )
        want = {r["event_id"]: r["rrf"] for r in manual.collect()}
        assert len(piped) == 5
        for r in piped:
            assert r["fused"] == pytest.approx(want[r["event_id"]], abs=1e-12)

    def test_fuse_requires_fork(self, spark, ev):
        with pytest.raises(EsqlError, match="requires a preceding FORK"):
            run(spark, ev, "FROM events | FUSE event_id BY value")

    def test_fork_needs_two_branches(self, spark, ev):
        with pytest.raises(EsqlError, match="at least two"):
            run(spark, ev, "FROM events | FORK ( LIMIT 3 )")

    def test_fork_rejects_bare_text(self, spark, ev):
        with pytest.raises(EsqlError, match="parenthesized"):
            run(spark, ev, "FROM events | FORK WHERE x ( LIMIT 3 )")
