"""Ingest pipelines (operators/ingest): per-processor semantics, the
chained pipeline, simulate, and the one-projection plan claim."""

import datetime

import pytest

from ics_search_engine_spark.operators.ingest import (
    apply_processor,
    run_pipeline,
    simulate,
)


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(
        [
            (1, "GET /index.html 200", "  Hello World  ", "2026-01-02"),
            (2, "POST /api/save 500", "spark streams", "01/03/2026"),
            (3, "garbage line", "x", "not-a-date"),
        ],
        "id long, log string, txt string, when string",
    )


class TestProcessors:
    def test_set_and_copy_from(self, spark, df):
        out = apply_processor(df, {"set": {"field": "env", "value": "prod"}})
        assert out.select("env").distinct().collect()[0][0] == "prod"
        out2 = apply_processor(
            df, {"set": {"field": "log2", "copy_from": "log"}}
        )
        assert out2.filter("log2 != log").count() == 0

    def test_rename_remove(self, spark, df):
        out = apply_processor(
            df, {"rename": {"field": "txt", "target_field": "text"}}
        )
        assert "text" in out.columns and "txt" not in out.columns
        out2 = apply_processor(df, {"remove": {"fields": ["txt", "when"]}})
        assert set(out2.columns) == {"id", "log"}
        with pytest.raises(ValueError):
            apply_processor(df, {"rename": {"field": "txt",
                                            "target_field": "log"}})
        with pytest.raises(ValueError):
            apply_processor(df, {"remove": {"field": "nope"}})

    def test_string_ops(self, spark, df):
        rows = {
            r.id: r
            for r in run_pipeline(
                df,
                [
                    {"trim": {"field": "txt"}},
                    {"uppercase": {"field": "txt", "target_field": "up"}},
                    {"gsub": {"field": "txt", "pattern": "[aeiou]",
                              "replacement": "_"}},
                    {"split": {"field": "log", "separator": " ",
                               "target_field": "parts"}},
                    {"join": {"field": "parts", "separator": "|",
                              "target_field": "joined"}},
                ],
            ).collect()
        }
        assert rows[1].up == "HELLO WORLD"
        assert rows[1].txt == "H_ll_ W_rld"
        assert rows[1].parts == ["GET", "/index.html", "200"]
        assert rows[1].joined == "GET|/index.html|200"

    def test_convert_null_on_bad_input(self, spark, df):
        out = run_pipeline(
            df,
            [
                {"split": {"field": "log", "separator": " ",
                           "target_field": "parts"}},
                {"set": {"field": "code", "copy_from": "parts"}},
            ],
        ).selectExpr("id", "element_at(parts, -1) AS last")
        conv = apply_processor(
            out, {"convert": {"field": "last", "type": "integer"}}
        ).collect()
        got = {r.id: r.last for r in conv}
        assert got[1] == 200 and got[2] == 500 and got[3] is None

    def test_date_multi_format(self, spark, df):
        out = apply_processor(
            df,
            {"date": {"field": "when",
                      "formats": ["yyyy-MM-dd", "MM/dd/yyyy"]}},
        ).collect()
        got = {r.id: r["@timestamp"] for r in out}
        assert got[1] == datetime.datetime(2026, 1, 2)
        assert got[2] == datetime.datetime(2026, 1, 3)
        assert got[3] is None

    def test_dissect_and_grok(self, spark, df):
        out = run_pipeline(
            df,
            [{"dissect": {"field": "log",
                          "pattern": "%{method} %{path} %{code}"}}],
        ).collect()
        rows = {r.id: r for r in out}
        assert rows[1].method == "GET" and rows[1].code == "200"
        assert rows[3].method is None  # non-matching -> NULL
        out2 = run_pipeline(
            df,
            [{"grok": {"field": "log",
                       "pattern": "%{WORD:method} %{NOTSPACE:path} "
                                  "%{INT:code:int}"}}],
        ).collect()
        rows2 = {r.id: r for r in out2}
        assert rows2[2].code == 500 and isinstance(rows2[2].code, int)

    def test_unknown_and_malformed(self, spark, df):
        with pytest.raises(ValueError):
            apply_processor(df, {"nope": {}})
        with pytest.raises(ValueError):
            apply_processor(df, {"set": {"field": "x"},
                                 "gsub": {"field": "y"}})
        with pytest.raises(ValueError):
            apply_processor(df, {"convert": {"field": "id",
                                             "type": "decimal"}})


def test_whole_pipeline_is_one_projection(spark, df):
    out = run_pipeline(
        df,
        [
            {"trim": {"field": "txt"}},
            {"lowercase": {"field": "txt"}},
            {"gsub": {"field": "txt", "pattern": " ", "replacement": "_"}},
            {"set": {"field": "env", "value": "prod"}},
        ],
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # map-only: no shuffle anywhere


def test_simulate(spark):
    got = simulate(
        spark,
        [
            {"dissect": {"field": "msg", "pattern": "%{lvl}: %{body}"}},
            {"uppercase": {"field": "lvl"}},
        ],
        [{"msg": "warn: disk low"}, {"msg": "info: ok"}],
    )
    assert [(d["lvl"], d["body"]) for d in got] == [
        ("WARN", "disk low"), ("INFO", "ok")
    ]
