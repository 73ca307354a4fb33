"""Search templates (operators/templates): renderer semantics + the
registry + end-to-end equivalence with a directly-issued qlang query.
"""

import pytest

from ics_search_engine_spark.operators.packed_index import (
    PackedIndex,
    build_packed_index,
)
from ics_search_engine_spark.operators.qlang import bm25_topk_qlang
from ics_search_engine_spark.operators.templates import (
    TemplateRegistry,
    render_body,
    render_template,
    search_template,
)

ROWS = [
    ("c0", 0, "machine learning models learn quickly"),
    ("c0", 1, "the machine merges batches"),
    ("c1", 0, "machine learning machine learning ahead"),
    ("c1", 1, "vector vectors vectorized victory"),
    ("c2", 0, "fresh machine learning news today"),
    ("c3", 0, "windows join streams while machines learn"),
]


class TestRenderer:
    def test_variable_and_missing(self):
        assert render_template("a {{x}} b {{y}}", {"x": 1}) == "a 1 b "

    def test_sections_truthy_falsy(self):
        src = "{{#f}}yes{{/f}}{{^f}}no{{/f}}"
        assert render_template(src, {"f": True}) == "yes"
        assert render_template(src, {"f": False}) == "no"
        assert render_template(src, {}) == "no"

    def test_default_idiom(self):
        src = "{{v}}{{^v}}dflt{{/v}}"
        assert render_template(src, {"v": "set"}) == "set"
        assert render_template(src, {}) == "dflt"

    def test_list_section_with_dot_and_dict_scope(self):
        assert (
            render_template("{{#xs}}<{{.}}>{{/xs}}", {"xs": [1, 2]})
            == "<1><2>"
        )
        assert (
            render_template(
                "{{#xs}}{{t}}^{{w}} {{/xs}}",
                {"xs": [{"t": "a", "w": 2}, {"t": "b", "w": 3}]},
            )
            == "a^2 b^3 "
        )

    def test_nested_sections(self):
        src = "{{#a}}A{{#b}}B{{/b}}{{^b}}nb{{/b}}{{/a}}"
        assert render_template(src, {"a": True, "b": True}) == "AB"
        assert render_template(src, {"a": True}) == "Anb"
        assert render_template(src, {}) == ""

    def test_tojson(self):
        assert (
            render_template("{{#toJson}}q{{/toJson}}", {"q": ["a", 1]})
            == '["a", 1]'
        )

    def test_bool_renders_as_json(self):
        assert render_template("{{b}}", {"b": True}) == "true"

    def test_malformed_sections_raise(self):
        with pytest.raises(ValueError):
            render_template("{{#a}}open", {})
        with pytest.raises(ValueError):
            render_template("{{/a}}", {})
        with pytest.raises(ValueError):
            render_template("{{#a}}x{{/b}}", {})

    def test_no_injection_via_params(self):
        # a rendered VALUE containing mustache syntax is not re-scanned
        assert (
            render_template("{{v}}", {"v": "{{other}}", "other": "X"})
            == "{{other}}"
        )

    def test_render_body_validation(self):
        with pytest.raises(ValueError):
            render_body('{"query": "{{q}"', {"q": "x"})  # bad JSON
        with pytest.raises(ValueError):
            render_body('{"k": 5}', {})  # no query key


@pytest.fixture(scope="module")
def pidx(spark, corpus_dir):
    df = spark.createDataFrame(
        ROWS, "conv_id string, turn_idx int, text string"
    )
    out = f"{corpus_dir}/tmpl_idx"
    build_packed_index(spark, df, out, range_bits=4, with_positions=True)
    return PackedIndex(spark, out)


def test_search_equals_direct_qlang(spark, pidx):
    src = '{"query": "+{{main}} {{extra}}", "k": {{k}}}'
    got = search_template(
        spark, pidx, src, {"main": "machine", "extra": "join", "k": 4}
    ).collect()
    want = bm25_topk_qlang(spark, pidx, "+machine join", k=4).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_k_override_precedence(spark, pidx):
    src = '{"query": "{{q}}", "k": 10}'
    assert (
        search_template(spark, pidx, src, {"q": "machine"}, k=2).count()
        == 2
    )


def test_registry_roundtrip(spark, pidx):
    reg = TemplateRegistry()
    reg.put("t1", '{"query": "{{q}}", "k": 3}')
    assert reg.search(spark, pidx, "t1", {"q": "machine"}).count() == 3
    reg.delete("t1")
    with pytest.raises(KeyError):
        reg.get("t1")
    with pytest.raises(ValueError):
        reg.put("bad", "{{#a}}unclosed")
