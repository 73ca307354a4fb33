"""PageRank/HITS parity vs a numpy transcription of the reference
(/root/reference/utils/pagerank.py, /root/reference/utils/hits.py)."""

import numpy as np
import pytest

from ics_search_engine_spark.operators.linkgraph import (
    edges_from_pages,
    hits,
    pagerank,
)

PAGES = [
    ("u/a", ["u/b", "u/c", "http://external.example/x"]),
    ("u/b", ["u/c"]),
    ("u/c", ["u/a"]),
    ("u/d", ["u/a", "u/b"]),
    ("u/e", []),  # dangling page
]


def _np_pagerank(pages, damping=0.85, max_iter=100, thr=0.0001):
    """Transcription of /root/reference/utils/pagerank.py:15-44."""
    urls = [u for u, _ in pages]
    idx = {u: i for i, u in enumerate(urls)}
    n = len(urls)
    A = np.zeros((n, n))
    for u, links in pages:
        out = len(links)
        if out > 0:
            for l in links:
                if l in idx:
                    A[idx[l]][idx[u]] = 1.0 / out
    s = np.ones(n) / n
    for _ in range(max_iter):
        ns = (1 - damping) / n + damping * (A @ s)
        if np.sum(np.abs(ns - s)) < thr:
            break
        s = ns
    return {u: float(x) * 1000 for u, x in zip(urls, s)}


def _np_hits(pages, max_iter=20, thr=0.0001):
    """Transcription of /root/reference/utils/hits.py:16-69."""
    urls = [u for u, _ in pages]
    idx = {u: i for i, u in enumerate(urls)}
    n = len(urls)
    A = np.zeros((n, n))
    for u, links in pages:
        for l in links:
            if l in idx:
                A[idx[u]][idx[l]] = 1
    h = np.ones(n) / n
    a = np.ones(n) / n
    for _ in range(max_iter):
        na = A.T @ h
        na = na / np.linalg.norm(na, 1)
        nh = A @ na
        nh = nh / np.linalg.norm(nh, 1)
        if (np.abs(na - a) < thr).all() and (np.abs(nh - h) < thr).all():
            break
        a, h = na, nh
    return (
        {u: x * 10 for u, x in zip(urls, a)},
        {u: x * 10 for u, x in zip(urls, h)},
    )


@pytest.fixture(scope="module")
def pages_df(spark):
    return spark.createDataFrame(
        PAGES, "url string, outgoing_links array<string>"
    ).cache()


def test_edges_internal_only(spark, pages_df):
    edges = {(r["src"], r["dst"]) for r in edges_from_pages(pages_df).collect()}
    assert edges == {
        ("u/a", "u/b"), ("u/a", "u/c"), ("u/b", "u/c"),
        ("u/c", "u/a"), ("u/d", "u/a"), ("u/d", "u/b"),
    }


def test_pagerank_matches_reference(spark, pages_df):
    want = _np_pagerank(PAGES)
    got = {r["url"]: r["pagerank"] for r in pagerank(spark, pages_df).collect()}
    assert set(got) == set(want)
    for u in want:
        assert got[u] == pytest.approx(want[u], rel=1e-9), u
    # sanity: 'c' (two in-links incl. from hub 'a') outranks dangling 'e'
    assert got["u/c"] > got["u/e"]


def test_hits_matches_reference(spark, pages_df):
    want_auth, want_hub = _np_hits(PAGES)
    res = {r["url"]: (r["authority"], r["hub"]) for r in hits(spark, pages_df).collect()}
    for u in want_auth:
        assert res[u][0] == pytest.approx(want_auth[u], rel=1e-9), u
        assert res[u][1] == pytest.approx(want_hub[u], rel=1e-9), u


def test_empty_graph(spark):
    empty = spark.createDataFrame([], "url string, outgoing_links array<string>")
    assert pagerank(spark, empty).count() == 0
    assert hits(spark, empty).count() == 0
