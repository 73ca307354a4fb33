"""Crawl-JSON source (S1-S6) + A3 weighted-importance semantics vs a
pure-Python transcription of the reference's token_processor/
index_manager logic."""

import json
import math
import os

import pytest

from ics_search_engine_spark.operators.index_build import (
    postings_weighted,
    reference_tfidf,
)
from ics_search_engine_spark.sources.crawl import (
    crawl_to_transcripts,
    process_crawl,
    read_crawl_json,
    _clean_text,
    _important_text,
    _links,
    _page_text,
)
from ics_search_engine_spark.textproc.tokenizer import tokenize

PAGES = [
    {
        "url": "https://ics.example.edu/a",
        "content": """<html><head><title>Machine Learning Lab</title>
<script>var x = 'ignore me';</script></head>
<body><h1>Research Projects</h1>
<p>We study machine learning and search engines.</p>
<p>Graduate students welcome — apply today!</p>
<b>Important deadline</b>
<a href="https://ics.example.edu/b">b</a>
<a href="https://other.org/x">x</a>
<a href="/relative">rel</a>
<a href="https://ics.example.edu/a">self</a>
</body></html>""",
        "encoding": "utf-8",
    },
    {
        "url": "https://ics.example.edu/b",
        "content": "<html><body><h2>No paragraphs here</h2> plain body text</body></html>",
        "encoding": "ascii",
    },
    {"url": "https://ics.example.edu/skip.TXT", "content": "raw", "encoding": "utf-8"},
]


@pytest.fixture(scope="module")
def crawl_dir(corpus_dir):
    d = f"{corpus_dir}/crawl/sub"
    os.makedirs(d, exist_ok=True)
    for i, page in enumerate(PAGES):
        with open(f"{d}/page{i}.json", "w") as f:
            json.dump(page, f)
    return f"{corpus_dir}/crawl"


class TestHtmlProcessing:
    def test_clean_text_reference_regexes(self):
        assert _clean_text("a-b   céd") == "a b cd"
        assert _clean_text("  x \t y \n z ") == "x y z"

    def test_page_text_utf8_joins_paragraphs(self):
        t = _page_text(PAGES[0]["content"], "utf-8")
        assert "machine learning and search engines" in t
        assert "ignore me" not in t  # script stripped
        assert "Machine Learning Lab" not in t  # title is not a <p>
        assert "apply today!" in t

    def test_page_text_non_utf8_full_body(self):
        t = _page_text(PAGES[1]["content"], "ascii")
        assert "No paragraphs here" in t and "plain body text" in t

    def test_important_text_weights(self):
        w = dict(_important_text(PAGES[0]["content"]))
        assert w["Machine Learning Lab"] == 2.0
        assert w["Research Projects"] == 1.5
        assert w["Important deadline"] == 0.5

    def test_links_absolute_no_self_sorted(self):
        links = _links(PAGES[0]["content"], PAGES[0]["url"])
        assert links == ["https://ics.example.edu/b", "https://other.org/x"]


class TestCrawlSource:
    def test_recursive_scan_and_txt_filter(self, spark, crawl_dir):
        df = read_crawl_json(spark, crawl_dir)
        urls = {r["url"] for r in df.select("url").collect()}
        assert urls == {"https://ics.example.edu/a", "https://ics.example.edu/b"}

    def test_processed_schema(self, spark, crawl_dir):
        pages = process_crawl(read_crawl_json(spark, crawl_dir))
        row = pages.filter("url = 'https://ics.example.edu/a'").collect()[0]
        assert "machine learning and search engines" in row["text"]
        imp = {x["text"]: x["weight"] for x in row["important"]}
        assert imp["Machine Learning Lab"] == 2.0
        assert row["outgoing_links"] == [
            "https://ics.example.edu/b", "https://other.org/x",
        ]


def _oracle_weighted(text: str, important: dict[str, float]):
    """Literal transcription of token_processor.process_tokens
    (/root/reference/components/token_processor.py:14-33)."""
    freq_map: dict[str, tuple[int, float, list[int]]] = {}
    for pos, tok in enumerate(tokenize(text)):
        f, i, p = freq_map.get(tok, (0, 0.0, []))
        freq_map[tok] = (f + 1, i, p + [pos])
    for itext, weight in important.items():
        for tok in tokenize(itext):
            f, i, p = freq_map.get(tok, (0, 0.0, []))
            freq_map[tok] = (f + 1, i + weight, p)
    return freq_map


class TestWeightedPostings:
    @pytest.fixture(scope="class")
    def docs(self, spark, crawl_dir):
        return crawl_to_transcripts(
            process_crawl(read_crawl_json(spark, crawl_dir))
        ).cache()

    def test_a3_semantics_match_reference_transcription(self, spark, docs):
        rows = docs.collect()
        got = {}
        for r in postings_weighted(docs).collect():
            got[(r["conv_id"], r["term"])] = (
                r["tf"], r["importance"], list(r["positions"]), r["dl"],
            )
        for doc in rows:
            imp = {x["text"]: x["weight"] for x in doc["important"]}
            oracle = _oracle_weighted(doc["text"], imp)
            body_dl = len(tokenize(doc["text"]))
            for term, (f, i, p) in oracle.items():
                g = got[(doc["conv_id"], term)]
                assert g == (f, i, p, body_dl), (doc["conv_id"], term, g, (f, i, p))
        # no extra terms
        oracle_keys = set()
        for doc in rows:
            imp = {x["text"]: x["weight"] for x in doc["important"]}
            for term in _oracle_weighted(doc["text"], imp):
                oracle_keys.add((doc["conv_id"], term))
        assert set(got) == oracle_keys

    def test_reference_tfidf_formula(self, spark, docs):
        n = docs.count()
        pw = postings_weighted(docs)
        scored = {
            (r["conv_id"], r["term"]): (r["tf_idf"], r["tf"], r["importance"], r["dl"], r["df"])
            for r in reference_tfidf(pw, n).collect()
        }
        # hand-check: 'machin' appears in title (w=2.0) and body of page a
        key = ("https://ics.example.edu/a", "machin")
        tf_idf, tf, imp, dl, df = scored[key]
        expected = (tf / dl) * (1 + imp) * math.log10(n / df)
        assert tf_idf == expected
        assert imp == 2.0


class TestMalformedHtmlTolerance:
    """The r1 regex processor diverged from the reference's tree-based
    extraction on malformed HTML (VERDICT r1 'What's missing' #3).
    The parser now drives the SAME stdlib tokenizer bs4's
    'html.parser' backend uses — pin the failure modes."""

    def test_attribute_containing_gt(self):
        html = '<p title="a > b">text after</p>'
        assert _page_text(html, "utf-8") == "text after"
        links = _links('<a title="x > y" href="https://e.org/z">l</a>', "u")
        assert links == ["https://e.org/z"]

    def test_unclosed_tags_at_eof(self):
        html = "<h1>Heading<p>para text"
        w = dict(_important_text(html))
        # bs4 tree: unclosed h1 contains everything after it
        assert "Heading" in list(w)[0]
        assert w[list(w)[0]] == 1.5
        assert "para text" in _page_text(html, "utf-8")

    def test_nested_p_implicitly_closes(self):
        html = "<p>first<p>second</p>"
        t = _page_text(html, "utf-8")
        assert t == "first second"  # not 'first second second'

    def test_cdata_included_comment_excluded(self):
        html = "<body>a <!-- gone --> b <![CDATA[kept]]> c</body>"
        t = _page_text(html, "ascii")
        assert "gone" not in t
        assert "kept" in t

    def test_script_with_lt_inside(self):
        html = "<script>if (a<b && c>d) {evil()}</script><p>real</p>"
        t = _page_text(html, "utf-8")
        assert "evil" not in t
        assert t == "real"

    def test_empty_paragraph_still_selects_p_path(self):
        # reference: `if paragraphs:` checks ELEMENT existence — a page
        # whose only <p> is empty yields '' (not the full-body text)
        html = "<body>body words<p></p></body>"
        assert _page_text(html, "utf-8") == ""
        # non-utf8 ignores paragraphs entirely
        assert "body words" in _page_text(html, "ascii")

    def test_nested_important_tags_both_counted(self):
        html = "<b>bold <strong>very</strong></b>"
        w = dict(_important_text(html))
        assert w["bold very"] == 0.5
        assert w["very"] == 0.5


def test_title_column_is_real_title_not_weight_heuristic(spark, corpus_dir):
    """The title surface must be the actual <title> text: a page where
    h1+b text accumulates weight 2.0 BEFORE the real title must still
    surface the <title>; a page with no <title> gets null (url fallback
    happens at presentation)."""
    import json
    import os

    d = f"{corpus_dir}/crawl_titles"
    os.makedirs(d, exist_ok=True)
    pages = [
        {"url": "https://t.example/a",
         "content": "<h1>Nav</h1><b>Nav</b><title>Real Title</title>",
         "encoding": "utf-8"},
        {"url": "https://t.example/b",
         "content": "<h1>Heading only</h1><b>Heading only</b>",
         "encoding": "utf-8"},
    ]
    for i, p in enumerate(pages):
        with open(f"{d}/p{i}.json", "w") as f:
            json.dump(p, f)
    got = {
        r["url"]: r["title"]
        for r in process_crawl(read_crawl_json(spark, d)).collect()
    }
    assert got["https://t.example/a"] == "Real Title"
    assert got["https://t.example/b"] is None

    from ics_search_engine_spark.operators.blend import page_titles

    titles = {
        r["url"]: r["title"]
        for r in page_titles(
            process_crawl(read_crawl_json(spark, d))
        ).collect()
    }
    assert titles["https://t.example/a"] == "Real Title"
    assert titles["https://t.example/b"] == "https://t.example/b"  # fallback
