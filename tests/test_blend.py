"""The assembled reference ranking blend (F9) vs a numpy transcription
of /root/reference/search.py:132-202 (tf-idf accumulation + degenerate
cosine + term-match boost + HITS/PageRank, weights 0.2/0.2/0.6/0.1/0.1/
0.2 summing to 1.4; the dead match_bonus at search.py:158 is not
reproduced)."""

import math
from collections import Counter
from urllib.parse import urldefrag

import pytest

from ics_search_engine_spark.operators.blend import (
    BlendIndex,
    build_blend_index,
    page_titles,
    present_results,
    search_blend,
)
from ics_search_engine_spark.textproc.tokenizer import tokenize
from tests.test_linkgraph import _np_hits, _np_pagerank

# (url, body text, important {text: weight}, outgoing_links)
PAGES = [
    (
        "https://ics.example.edu/a",
        "machine learning research on learning systems and machine vision",
        {"Machine Learning Lab": 2.0, "Research": 1.5},
        ["https://ics.example.edu/b", "https://ics.example.edu/c#top"],
    ),
    (
        "https://ics.example.edu/b",
        "graduate research in software engineering and programming",
        {"Software Research": 2.0},
        ["https://ics.example.edu/c#top", "https://external.org/x"],
    ),
    (
        "https://ics.example.edu/c#top",
        "machine vision systems research for learning about perception",
        {},
        ["https://ics.example.edu/a"],
    ),
    (
        "https://ics.example.edu/d",
        "an unrelated page about campus parking and dining halls",
        {"Campus Info": 2.0},
        ["https://ics.example.edu/a", "https://ics.example.edu/b"],
    ),
    (
        "https://ics.example.edu/e",
        "",
        {"Machine": 2.0},  # term ONLY in important text, empty body
        [],
    ),
]

QUERIES = [
    "machine learning",
    "machine learning machine",  # repeated term — q^2/len weighting
    "research",
    "the and of",                # all stop words
    "zzznothing",                # absent term
    "machine learning and its impact on society",
]


def _transcribe(pages, query, k=10):
    """Numpy/python transcription of the reference search. Determinism
    deltas mirrored from operators/blend.py: per-doc accumulation in
    ascending term order with the combined qtf^2/len weight; ties break
    (score desc, url asc)."""
    q_tokens = tokenize(query, for_query=True)
    total = len(q_tokens)
    if total == 0:
        return []
    qtf = Counter(q_tokens)

    n = len(pages)
    per_doc: dict[str, tuple[dict, int]] = {}
    for url, text, imp, _ in pages:
        fm: dict[str, tuple[int, float]] = {}
        for tok in tokenize(text):
            f, i = fm.get(tok, (0, 0.0))
            fm[tok] = (f + 1, i)
        for itext, weight in imp.items():
            for tok in tokenize(itext):
                f, i = fm.get(tok, (0, 0.0))
                fm[tok] = (f + 1, i + weight)
        per_doc[url] = (fm, len(tokenize(text)))
    df = Counter()
    for fm, _ in per_doc.values():
        for t in fm:
            df[t] += 1
    tfidf = {}
    for url, (fm, dl) in per_doc.items():
        for t, (f, i) in fm.items():
            tf = 0.0 if dl == 0 else f / dl
            tfidf[(t, url)] = tf * (1 + i) * math.log10(n / df[t])

    doc_scores: dict[str, tuple[float, set]] = {}
    for t in sorted(qtf):
        w = (qtf[t] * qtf[t]) / total
        for url in per_doc:
            v = tfidf.get((t, url))
            if v is None:
                continue
            s, ts = doc_scores.get(url, (0.0, set()))
            doc_scores[url] = (s + v * w, ts | {t})
    if not doc_scores:
        return []

    # sklearn normalize() over the reference's never-sum_duplicates'd
    # ones-CSR: ‖q‖ = sqrt(#query INSTANCES), not sqrt(Σqtf²)
    q_norm = math.sqrt(total)
    link_pages = [(u, links) for u, _, _, links in pages]
    auth, hub = _np_hits(link_pages)
    pr = _np_pagerank(link_pages)

    out = []
    for url, (s, ts) in doc_scores.items():
        m = len(ts)
        d_norm = s * math.sqrt(m)
        cos = (
            (s * sum(qtf[t] for t in ts)) / (q_norm * d_norm)
            if d_norm > 0 and q_norm > 0
            else 0.0
        )
        score = (
            0.2 * s
            + 0.2 * cos
            + 0.6 * (float(m) / float(total))
            + 0.1 * auth.get(url, 0.0)
            + 0.1 * hub.get(url, 0.0)
            + 0.2 * pr.get(url, 0.0)
        )
        out.append((url, score, sorted(ts)))
    out.sort(key=lambda r: (-r[1], r[0]))
    return [(urldefrag(u)[0], s, ts) for u, s, ts in out[:k]]


TITLES = {
    "https://ics.example.edu/a": "Machine Learning Lab",
    "https://ics.example.edu/b": "Software Research",
    "https://ics.example.edu/c#top": None,
    "https://ics.example.edu/d": "Campus Info",
    "https://ics.example.edu/e": "Machine",
}


@pytest.fixture(scope="module")
def pages_df(spark):
    rows = [
        (u, t, list(imp.items()), links, TITLES[u])
        for u, t, imp, links in PAGES
    ]
    return spark.createDataFrame(
        rows,
        "url string, text string, "
        "important array<struct<text:string,weight:double>>, "
        "outgoing_links array<string>, title string",
    ).cache()


@pytest.fixture(scope="module")
def bidx(spark, pages_df):
    return build_blend_index(spark, pages_df)


@pytest.mark.parametrize("query", QUERIES)
def test_blend_matches_reference_transcription(query, spark, bidx):
    want = _transcribe(PAGES, query, k=10)
    got = [
        (r["url"], r["score"], list(r["matched_terms"]))
        for r in search_blend(spark, bidx, query, max_results=10).collect()
    ]
    assert [g[0] for g in got] == [w[0] for w in want], query
    assert [g[2] for g in got] == [w[2] for w in want], query
    for (_, ws, _), (_, gs, _) in zip(want, got):
        # link-score ingredients come from distributed sums (1e-9 rel,
        # like test_linkgraph); the other four ingredients are
        # order-mirrored exactly
        assert gs == pytest.approx(ws, rel=1e-9), query


def test_blend_weights_sum_documented():
    """The 1.4 weight sum is intentional (search.py:183-190) — pin it
    so nobody 'fixes' the weights to normalize."""
    from ics_search_engine_spark.operators import blend

    assert (
        blend.W_TFIDF + blend.W_COSINE + blend.W_MATCH
        + blend.W_AUTH + blend.W_HUB + blend.W_PAGERANK
    ) == pytest.approx(1.4)


def test_query_norm_counts_instances_not_squared_tf(spark):
    """Pin ‖q‖ = √(#query instances), independently of _transcribe.

    The reference CSR (search.py:112-115) stores one 1.0 entry per
    query INSTANCE and never calls sum_duplicates(); sklearn
    normalize() squares each STORED entry, so for 'alpha beta alpha'
    ‖q‖ = √3 — NOT √(2²+1²) = √5.  Duplicates sum only in the matmul.
    Hand-computed two-doc corpus where the two conventions give
    visibly different final scores (cos = 3/√6 vs 3/√10)."""
    pages = spark.createDataFrame(
        [
            ("https://x.edu/1", "alpha beta", [], [], None),
            ("https://x.edu/2", "gamma delta", [], [], None),
        ],
        "url string, text string, "
        "important array<struct<text:string,weight:double>>, "
        "outgoing_links array<string>, title string",
    )
    bidx_nl = build_blend_index(spark, pages, with_links=False)
    got = {
        r["url"]: r["score"]
        for r in search_blend(spark, bidx_nl, "alpha beta alpha").collect()
    }
    a = 0.5 * math.log10(2.0)          # tf(1/2) · (1+0) · log10(2/1)
    s = a * (4.0 / 3.0) + a * (1.0 / 3.0)   # w = qtf²/len per term
    cos = (3.0 * s) / (math.sqrt(3.0) * (s * math.sqrt(2.0)))  # = 3/√6
    want = 0.2 * s + 0.2 * cos + 0.6 * (2.0 / 3.0)
    assert got["https://x.edu/1"] == pytest.approx(want, rel=1e-12)
    # the wrong convention is measurably different — the test bites
    wrong = 0.2 * s + 0.2 * (3.0 / math.sqrt(10.0)) + 0.6 * (2.0 / 3.0)
    assert abs(want - wrong) > 1e-2


def test_blend_without_links_matches_zero_scores(spark, pages_df):
    """with_links=False = the reference's missing-link_scores.json
    fallback (search.py:73-81): auth/hub/pagerank read as 0.0."""
    bidx_nl = build_blend_index(spark, pages_df, with_links=False)
    got = {
        r["url"]: r["score"]
        for r in search_blend(spark, bidx_nl, "machine learning").collect()
    }

    # transcription with zeroed link maps
    q_tokens = tokenize("machine learning", for_query=True)
    total = len(q_tokens)
    qtf = Counter(q_tokens)
    want_rows = _transcribe(PAGES, "machine learning", k=10)
    # recompute expected via full transcription minus link ingredients
    link_pages = [(u, links) for u, _, _, links in PAGES]
    auth, hub = _np_hits(link_pages)
    pr = _np_pagerank(link_pages)
    for url_defrag, s, _ in want_rows:
        raw = next(u for u, *_ in PAGES if urldefrag(u)[0] == url_defrag)
        expected = s - (
            0.1 * auth.get(raw, 0.0)
            + 0.1 * hub.get(raw, 0.0)
            + 0.2 * pr.get(raw, 0.0)
        )
        assert got[url_defrag] == pytest.approx(expected, rel=1e-9)


def test_result_urls_are_defragged(spark, bidx):
    got = [r["url"] for r in search_blend(spark, bidx, "machine vision").collect()]
    assert "https://ics.example.edu/c" in got
    assert not any("#" in u for u in got)


def test_titles_surface(spark, pages_df, bidx):
    """main.py:28-31,53 parity: display title from <title>-weighted
    important text, url fallback."""
    titles = {
        r["url"]: r["title"] for r in page_titles(pages_df).collect()
    }
    assert titles["https://ics.example.edu/a"] == "Machine Learning Lab"
    # page c has no important text -> falls back to its (defragged) url
    assert titles["https://ics.example.edu/c"] == "https://ics.example.edu/c"

    res = search_blend(spark, bidx, "machine learning")
    shown = present_results(res, page_titles(pages_df)).collect()
    by_url = {r["url"]: r["title"] for r in shown}
    assert by_url["https://ics.example.edu/a"] == "Machine Learning Lab"


def test_titles_unique_per_defragged_url(spark):
    """Pages whose urls defrag to the same key must collapse to one
    title row (the reference's doc_titles is a dict) — a real title
    wins over the url fallback, so the presentation join can't fan
    out."""
    rows = [
        ("https://e.edu/a", "x", [("Real Title", 2.0)], [], "Real Title"),
        ("https://e.edu/a#frag", "y", [], [], None),
    ]
    pages = spark.createDataFrame(
        rows,
        "url string, text string, "
        "important array<struct<text:string,weight:double>>, "
        "outgoing_links array<string>, title string",
    )
    got = page_titles(pages).collect()
    assert len(got) == 1
    assert got[0]["url"] == "https://e.edu/a"
    assert got[0]["title"] == "Real Title"


def test_title_equal_to_url_is_still_a_real_title(spark):
    """A page whose real <title> text literally equals its URL must not
    be demoted to fallback priority: priority keys on the title
    column's NULLness, not on string equality with the url.  Here both
    siblings carry real titles, so min(title) breaks the tie — the
    url-valued title sorts before 'zzz portal' ('h' < 'z') and wins;
    the old equality-keyed pri would have demoted it and picked the
    sibling."""
    url = "https://e.edu/p"
    rows = [
        (url, "x", [], [], url),                 # real title == url
        (url + "#frag", "y", [], [], "zzz portal"),
    ]
    pages = spark.createDataFrame(
        rows,
        "url string, text string, "
        "important array<struct<text:string,weight:double>>, "
        "outgoing_links array<string>, title string",
    )
    got = page_titles(pages).collect()
    assert len(got) == 1
    assert got[0]["title"] == url  # not 'zzz portal'
