"""Query rules (operators/queryrules): criteria matrix, precedence,
and the ranking contract vs pinned_topk."""

import pytest

from ics_search_engine_spark.operators.packed_index import (
    PackedIndex,
    build_packed_index,
)
from ics_search_engine_spark.operators.querydsl import pinned_topk
from ics_search_engine_spark.operators.queryrules import (
    Criterion,
    Rule,
    apply_rules,
    rules_topk,
)

ROWS = [
    ("c0", 0, "machine learning models learn quickly"),
    ("c0", 1, "the machine merges batches"),
    ("c1", 0, "machine learning machine learning ahead"),
    ("c1", 1, "vector vectors vectorized victory"),
    ("c2", 0, "fresh machine learning news today"),
    ("c3", 0, "windows join streams while machines learn"),
]


class TestCriteria:
    def test_matrix(self):
        m = {"user_query": "machine learning", "locale": "en", "age": 7}
        assert Criterion("always").matches(m)
        assert Criterion("exact", "locale", ("en",)).matches(m)
        assert not Criterion("exact", "locale", ("de",)).matches(m)
        assert Criterion("contains", "user_query", ("learn",)).matches(m)
        assert Criterion("prefix", "user_query", ("mach",)).matches(m)
        assert Criterion("suffix", "user_query", ("ing",)).matches(m)
        assert Criterion("gte", "age", (7,)).matches(m)
        assert not Criterion("gt", "age", (7,)).matches(m)
        assert Criterion("lt", "age", (8,)).matches(m)
        assert not Criterion("exact", "missing", ("x",)).matches(m)

    def test_validation(self):
        with pytest.raises(ValueError):
            Criterion("nope")
        with pytest.raises(ValueError):
            Criterion("exact")  # needs metadata key
        with pytest.raises(ValueError):
            Rule("r", "boost")


class TestApplyRules:
    RULES = [
        Rule("r1", "pinned",
             [Criterion("contains", "user_query", ("machine",))],
             [("c2", 0), ("c1", 0)]),
        Rule("r2", "exclude",
             [Criterion("exact", "locale", ("en",))],
             [("c0", 0), ("c2", 0)]),
        Rule("r3", "pinned",
             [Criterion("contains", "user_query", ("machine",))],
             [("c1", 0), ("c3", 0)]),  # c1 duplicate keeps r1 position
    ]

    def test_order_dedup_and_precedence(self):
        pins, excl = apply_rules(
            self.RULES, {"user_query": "machine learning", "locale": "en"}
        )
        # c2 pinned by r1 but excluded by r2 -> exclusion wins
        assert pins == [("c1", 0), ("c3", 0)]
        assert excl == {("c0", 0), ("c2", 0)}

    def test_unfired_rules(self):
        pins, excl = apply_rules(
            self.RULES, {"user_query": "vectors", "locale": "de"}
        )
        assert pins == [] and excl == set()


@pytest.fixture(scope="module")
def pidx(spark, corpus_dir):
    df = spark.createDataFrame(
        ROWS, "conv_id string, turn_idx int, text string"
    )
    out = f"{corpus_dir}/qrules_idx"
    build_packed_index(spark, df, out, range_bits=4, with_positions=False)
    return PackedIndex(spark, out)


def test_no_excludes_equals_pinned_topk(spark, pidx):
    rules = [
        Rule("r", "pinned", [Criterion("always")], [("c3", 0), ("c1", 1)])
    ]
    got = rules_topk(spark, pidx, "machine learning", rules, k=5).collect()
    want = pinned_topk(
        spark, pidx, "machine learning", [("c3", 0), ("c1", 1)], k=5
    ).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_exclusion_removes_organic_docs(spark, pidx):
    rules = [
        Rule("r", "exclude", [Criterion("always")], [("c1", 0), ("c0", 0)])
    ]
    got = rules_topk(spark, pidx, "machine learning", rules, k=5).collect()
    keys = {(r.conv_id, r.turn_idx) for r in got}
    assert ("c1", 0) not in keys and ("c0", 0) not in keys
    assert all(not r.pinned for r in got)


def test_metadata_drives_firing(spark, pidx):
    rules = [
        Rule("r", "pinned",
             [Criterion("exact", "segment", ("vip",))], [("c3", 0)])
    ]
    plain = rules_topk(spark, pidx, "machine", rules, k=3).collect()
    vip = rules_topk(
        spark, pidx, "machine", rules, k=3, metadata={"segment": "vip"}
    ).collect()
    assert not any(r.pinned for r in plain)
    assert (vip[0].conv_id, vip[0].turn_idx, vip[0].pinned) == ("c3", 0, True)


def test_numeric_criterion_type_mismatch_no_match():
    """ES rule criteria don't fire on type mismatch — a non-numeric
    metadata value against a gt rule is a non-match, not a request
    failure (r3 advisor finding)."""
    c = Criterion(type="gt", metadata="spend", values=(10,))
    assert c.matches({"spend": "premium-tier"}) is False
    assert c.matches({"spend": 11}) is True
    assert c.matches({"spend": None}) is False


def test_numeric_criterion_requires_bound():
    with pytest.raises(ValueError):
        Criterion(type="lte", metadata="spend", values=())
