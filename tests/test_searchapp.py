"""Search applications (operators/searchapp): the policy-chain order
(template → rules → organic/LTR → pin) and the registry."""

import pytest

from ics_search_engine_spark.operators.ltr import ltr_rescore
from ics_search_engine_spark.operators.packed_index import (
    PackedIndex,
    build_packed_index,
)
from ics_search_engine_spark.operators.qlang import bm25_topk_qlang
from ics_search_engine_spark.operators.queryrules import Criterion, Rule
from ics_search_engine_spark.operators.searchapp import (
    SearchApplication,
    SearchAppRegistry,
)

ROWS = [
    ("c0", 0, "machine learning models learn quickly"),
    ("c0", 1, "the machine merges batches"),
    ("c1", 0, "machine learning machine learning ahead"),
    ("c1", 1, "vector vectors vectorized victory"),
    ("c2", 0, "fresh machine learning news today"),
    ("c3", 0, "windows join streams while machines learn"),
]

TEMPLATE = '{"query": "+{{main}} {{extra}}", "k": 10}'


@pytest.fixture(scope="module")
def pidx(spark, corpus_dir):
    df = spark.createDataFrame(
        ROWS, "conv_id string, turn_idx int, text string"
    )
    out = f"{corpus_dir}/sapp_idx"
    build_packed_index(spark, df, out, range_bits=4, with_positions=True)
    return PackedIndex(spark, out)


def test_plain_app_equals_qlang(spark, pidx):
    app = SearchApplication("s", TEMPLATE)
    got = app.search(
        spark, pidx, {"main": "machine", "extra": "learning"}, k=4
    ).collect()
    want = bm25_topk_qlang(spark, pidx, "+machine learning", k=4).collect()
    assert [(r.conv_id, r.turn_idx, r.score) for r in got] == [
        (r.conv_id, r.turn_idx, r.score) for r in want
    ]
    assert all(not r.pinned for r in got)


def test_rules_see_rendered_query(spark, pidx):
    rules = [
        Rule("r", "pinned",
             [Criterion("contains", "user_query", ("learning",))],
             [("c3", 0)]),
    ]
    app = SearchApplication("s", TEMPLATE, rules=rules)
    hit = app.search(
        spark, pidx, {"main": "machine", "extra": "learning"}, k=3
    ).collect()
    assert (hit[0].conv_id, hit[0].pinned) == ("c3", True)
    miss = app.search(
        spark, pidx, {"main": "machine", "extra": "merges"}, k=3
    ).collect()
    assert all(not r.pinned for r in miss)


def test_exclusion_and_fill(spark, pidx):
    rules = [
        Rule("x", "exclude", [Criterion("always")], [("c1", 0)]),
    ]
    app = SearchApplication("s", TEMPLATE, rules=rules)
    got = app.search(
        spark, pidx, {"main": "machine", "extra": "learning"}, k=4
    ).collect()
    keys = {(r.conv_id, r.turn_idx) for r in got}
    assert ("c1", 0) not in keys
    assert len(got) == min(4, 5 - 1 + 0)  # c1:0 dropped, others fill


def test_ltr_rescore_leg(spark, pidx):
    from ics_search_engine_spark.operators.ltr import (
        ltr_rescore_candidates,
    )
    from ics_search_engine_spark.operators.qlang import (
        bm25_topk_qlang_ords,
    )

    model = {"bm25": 1.0, "matched": 0.4, "dl_ratio": -0.3, "bias": 0.1}
    app = SearchApplication("s", TEMPLATE, ltr_model=model, ltr_window=50)
    got = app.search(
        spark, pidx, {"main": "machine", "extra": "learning"}, k=3
    ).collect()
    # the app's LTR leg = model rescore over the FULL qlang candidate
    # window (operators preserved), not a re-tokenized term bag
    cand = bm25_topk_qlang_ords(spark, pidx, "+machine learning", k=50)
    want = ltr_rescore_candidates(
        spark, pidx, "+machine learning", model,
        cand.select("doc_ord"), k=3,
    ).collect()
    assert [(r.conv_id, r.turn_idx, r.score) for r in got] == [
        (r.conv_id, r.turn_idx, r.score) for r in want
    ]


def test_ltr_leg_honors_qlang_operators(spark, pidx):
    """A '+required' / '-excluded' operator must constrain the LTR
    leg's result set (the r3 advisor finding: the old path
    re-tokenized the query and silently dropped operators)."""
    from ics_search_engine_spark.operators.qlang import bm25_topk_qlang

    model = {"bm25": 1.0, "bias": 0.1}
    app = SearchApplication(
        "s", TEMPLATE, ltr_model=model, ltr_window=50
    )
    got = app.search(
        spark, pidx, {"main": "machine", "extra": "-learning"}, k=5
    ).collect()
    allowed = {
        (r.conv_id, r.turn_idx)
        for r in bm25_topk_qlang(
            spark, pidx, "+machine -learning", k=1000
        ).collect()
    }
    assert got, "query should match something"
    assert all((r.conv_id, r.turn_idx) in allowed for r in got)


def test_registry(spark, pidx):
    reg = SearchAppRegistry()
    reg.put(SearchApplication("app1", TEMPLATE))
    assert (
        reg.search(
            spark, pidx, "app1",
            {"main": "machine", "extra": "learning"}, k=2,
        ).count() == 2
    )
    with pytest.raises(KeyError):
        reg.get("nope")
    with pytest.raises(ValueError):
        reg.put(SearchApplication("bad", "{{#a}}unclosed"))
