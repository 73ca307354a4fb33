"""Crawl-JSON source: consume the reference engine's EXACT input format.

The reference reads per-page JSON files ``{url, content(html),
encoding}`` from a directory tree (/root/reference/indexer.py:45-57,
88-97) and derives: cleaned text (S3/S4), weighted important-tag text
(S5), outgoing links (S6), and the ``.txt``-URL skip (S2).  A user of
the reference can point THIS module at the same DEV directory and get
the same document table, distributed.

HTML handling: BeautifulSoup is not available here, so tag text
extraction is a regex HTML processor implementing the subset the
reference uses (strip script/style/comments, extract <p>/<title>/<h1-3>
/<b>/<strong> inner text, strip remaining tags, unescape entities).  It
runs inside ``mapInPandas`` — Arrow batches, vectorized per batch.
Cleaning regexes are verbatim from
/root/reference/components/document_processor.py:31-36.

Output schema (the transcript-model adapter keys a crawl page as
conv_id=url, turn_idx=0):
    (url, text, important array<struct<text,weight>>,
     outgoing_links array<string>)
"""

from __future__ import annotations

import html as _html
import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

# verbatim reference weights, /root/reference/utils/constants.py:46-53
TAG_WEIGHTS: dict[str, float] = {
    "title": 2.0,
    "h1": 1.5,
    "h2": 1.0,
    "h3": 0.75,
    "b": 0.5,
    "strong": 0.5,
}

_SCRIPT_RE = re.compile(r"<(script|style)\b[^>]*>.*?</\1\s*>", re.I | re.S)
_COMMENT_RE = re.compile(r"<!--.*?-->", re.S)
_TAG_RE = re.compile(r"<[^>]+>")
_P_RE = re.compile(r"<p\b[^>]*>(.*?)</p\s*>", re.I | re.S)
_A_HREF_RE = re.compile(r"""<a\b[^>]*?href\s*=\s*["']([^"'<>]+)["']""", re.I)


def _strip_tags(fragment: str) -> str:
    return _html.unescape(_TAG_RE.sub(" ", fragment))


def _clean_text(text: str) -> str:
    """Verbatim reference cleaning
    (/root/reference/components/document_processor.py:31-36)."""
    text = re.sub("[\\u0080-\\uffff]", "", text)
    text = re.sub(r"[\-]", " ", text)
    text = re.sub(r"\s+", " ", text)
    return text.strip()


def _page_text(content: str, encoding: str) -> str:
    """soupify() analog (/root/reference/components/
    document_processor.py:38-48): utf-8 pages join <p> texts when any
    exist; otherwise the whole document's text."""
    body = _COMMENT_RE.sub(" ", _SCRIPT_RE.sub(" ", content or ""))
    if (encoding or "").lower() == "utf-8":
        paras = [_strip_tags(m).strip() for m in _P_RE.findall(body)]
        paras = [p for p in paras if p]
        if paras:
            return _clean_text(" ".join(paras))
    return _clean_text(_strip_tags(body))


def _important_text(content: str) -> list[tuple[str, float]]:
    """extract_important_text analog (/root/reference/components/
    document_processor.py:50-59): per tag occurrence, the STRIPPED
    inner text accumulates the tag's weight (same text in two tags →
    weights add)."""
    body = _COMMENT_RE.sub(" ", _SCRIPT_RE.sub(" ", content or ""))
    weighted: dict[str, float] = {}
    for tag, weight in TAG_WEIGHTS.items():
        for m in re.finditer(
            rf"<{tag}\b[^>]*>(.*?)</{tag}\s*>", body, re.I | re.S
        ):
            text = _strip_tags(m.group(1)).strip()
            if text:
                weighted[text] = weighted.get(text, 0.0) + weight
    return list(weighted.items())


def _links(content: str, base_url: str) -> list[str]:
    """extract_links analog (/root/reference/components/
    document_processor.py:81-91): absolute http(s) hrefs, no self-links,
    deduped (sorted for determinism — the reference's set() order is
    arbitrary)."""
    out = set()
    for href in _A_HREF_RE.findall(content or ""):
        if href.startswith(("http://", "https://")) and href != base_url:
            out.add(href)
    return sorted(out)


def read_crawl_json(spark: SparkSession, data_dir: str) -> DataFrame:
    """S1: recursive JSON scan (/root/reference/indexer.py:88-97) —
    file listing, globbing and parallel read are Spark built-ins."""
    df = spark.read.option("recursiveFileLookup", "true").json(
        data_dir, schema="url string, content string, encoding string"
    )
    # S2: drop .txt URLs (/root/reference/indexer.py:52-54)
    return df.filter(~F.lower(F.col("url")).endswith(".txt"))


def process_crawl(crawl: DataFrame) -> DataFrame:
    """S3-S6 in one Arrow pass → (url, text, important, outgoing_links)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            texts, imps, links = [], [], []
            for url, content, encoding in zip(
                pdf["url"], pdf["content"], pdf["encoding"]
            ):
                texts.append(_page_text(content, encoding))
                imps.append(_important_text(content))
                links.append(_links(content, url))
            yield pd.DataFrame(
                {
                    "url": pdf["url"],
                    "text": texts,
                    "important": imps,
                    "outgoing_links": links,
                }
            )

    return crawl.mapInPandas(
        run,
        schema=(
            "url string, text string, "
            "important array<struct<text:string,weight:double>>, "
            "outgoing_links array<string>"
        ),
    )


def crawl_to_transcripts(pages: DataFrame) -> DataFrame:
    """Adapt processed pages to the engine's transcript docID model:
    one page = one turn (conv_id=url, turn_idx=0)."""
    return pages.select(
        F.col("url").alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        "text",
        "important",
        "outgoing_links",
    )
