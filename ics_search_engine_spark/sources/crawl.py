"""Crawl-JSON source: consume the reference engine's EXACT input format.

The reference reads per-page JSON files ``{url, content(html),
encoding}`` from a directory tree (/root/reference/indexer.py:45-57,
88-97) and derives: cleaned text (S3/S4), weighted important-tag text
(S5), outgoing links (S6), and the ``.txt``-URL skip (S2).  A user of
the reference can point THIS module at the same DEV directory and get
the same document table, distributed.

HTML handling: BeautifulSoup is not available in this sandbox, but the
reference parses with ``BeautifulSoup(content, 'html.parser')``
(/root/reference/components/document_processor.py:40) — and bs4's
'html.parser' backend IS the stdlib ``html.parser.HTMLParser``.  We
drive that same stdlib tokenizer directly with an event parser
(``_PageParser``), so tag tolerance on malformed input (attributes
containing '>', unclosed tags, stray end tags, CDATA, implicit <p>
closing) matches the reference's tree behavior without the tree.
get_text() semantics follow bs4 ≥ 4.9: script/style contents and
comments excluded, CDATA included, no separator.  Parsing runs inside
``mapInPandas`` — Arrow batches, one parse per page feeding all three
extractions.  Cleaning regexes are verbatim from
/root/reference/components/document_processor.py:31-36.

Output schema (the transcript-model adapter keys a crawl page as
conv_id=url, turn_idx=0):
    (url, text, important array<struct<text,weight>>,
     outgoing_links array<string>, title string)
"""

from __future__ import annotations

import re
from collections.abc import Iterator
from html.parser import HTMLParser

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

def _clean_text(text: str) -> str:
    """Verbatim reference cleaning
    (/root/reference/components/document_processor.py:31-36)."""
    text = re.sub("[\\u0080-\\uffff]", "", text)
    text = re.sub(r"[\-]", " ", text)
    text = re.sub(r"\s+", " ", text)
    return text.strip()


class _PageParser(HTMLParser):
    """One tolerant pass over the page collecting everything soupify/
    extract_important_text/extract_links read from the tree
    (/root/reference/components/document_processor.py:38-59,81-91):
    full get_text, per-<p> get_text, per-important-tag get_text, and
    every <a href>.  Stack-based capture buffers stand in for the tree;
    a new <p> implicitly closes an open one (the html.parser tree-
    builder rule), unclosed tags flush at EOF, script/style text is
    excluded and CDATA included (bs4 ≥ 4.9 get_text semantics)."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.text_parts: list[str] = []
        self.paragraphs: list[str] = []
        self.important: list[tuple[str, str]] = []
        self.hrefs: list[str] = []
        self._skip = 0
        self._p_bufs: list[list[str]] = []
        self._imp_bufs: list[tuple[str, list[str]]] = []

    def handle_starttag(self, tag, attrs):
        if tag in ("script", "style"):
            self._skip += 1
            return
        if tag == "a":
            for k, v in attrs:
                if k == "href" and v:
                    self.hrefs.append(v)
                    break
        if tag == "p":
            if self._p_bufs:  # implicit close: <p> cannot nest
                self.paragraphs.append("".join(self._p_bufs.pop()))
            self._p_bufs.append([])
        if tag in TAG_WEIGHTS:
            self._imp_bufs.append((tag, []))

    def handle_startendtag(self, tag, attrs):
        if tag == "a":
            for k, v in attrs:
                if k == "href" and v:
                    self.hrefs.append(v)
                    break

    def handle_endtag(self, tag):
        if tag in ("script", "style"):
            if self._skip:
                self._skip -= 1
            return
        if tag == "p" and self._p_bufs:
            self.paragraphs.append("".join(self._p_bufs.pop()))
        if tag in TAG_WEIGHTS:
            for i in range(len(self._imp_bufs) - 1, -1, -1):
                if self._imp_bufs[i][0] == tag:
                    t, buf = self._imp_bufs.pop(i)
                    self.important.append((t, "".join(buf)))
                    break

    def handle_data(self, data):
        if self._skip:
            return
        self.text_parts.append(data)
        for buf in self._p_bufs:
            buf.append(data)
        for _, buf in self._imp_bufs:
            buf.append(data)

    def unknown_decl(self, data):
        # bs4's html.parser builder turns <![CDATA[x]]> into a CData
        # string, which get_text() includes
        if data.startswith("CDATA["):
            self.handle_data(data[6:])

    def close(self):
        super().close()
        while self._p_bufs:  # unclosed at EOF — the tree still has them
            self.paragraphs.append("".join(self._p_bufs.pop()))
        while self._imp_bufs:
            t, buf = self._imp_bufs.pop()
            self.important.append((t, "".join(buf)))


def _parse_page(content: str) -> _PageParser:
    p = _PageParser()
    try:
        p.feed(content or "")
        p.close()
    except Exception:
        pass  # pathological input: keep whatever was extracted
    return p


def _page_text(
    content: str, encoding: str, parsed: _PageParser | None = None
) -> str:
    """soupify() analog (/root/reference/components/
    document_processor.py:38-48): utf-8 pages with any <p> ELEMENT
    (even an empty one — the reference tests element existence, not
    text) join the paragraphs' stripped texts; otherwise the whole
    document's text."""
    p = parsed if parsed is not None else _parse_page(content)
    if (encoding or "").lower() == "utf-8" and p.paragraphs:
        return _clean_text(" ".join(s.strip() for s in p.paragraphs))
    return _clean_text("".join(p.text_parts))


def _important_text(
    content: str, parsed: _PageParser | None = None
) -> list[tuple[str, float]]:
    """extract_important_text analog (/root/reference/components/
    document_processor.py:50-59): per tag occurrence, the element's
    stripped get_text accumulates the tag's weight (same text in two
    tags → weights add)."""
    p = parsed if parsed is not None else _parse_page(content)
    weighted: dict[str, float] = {}
    for tag, text in p.important:
        text = text.strip()
        if text:
            weighted[text] = weighted.get(text, 0.0) + TAG_WEIGHTS[tag]
    return list(weighted.items())


def _links(
    content: str, base_url: str, parsed: _PageParser | None = None
) -> list[str]:
    """extract_links analog (/root/reference/components/
    document_processor.py:81-91): absolute http(s) hrefs, no self-links,
    deduped (sorted for determinism — the reference's set() order is
    arbitrary)."""
    p = parsed if parsed is not None else _parse_page(content)
    out = set()
    for href in p.hrefs:
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


def _page_title(parsed: _PageParser) -> str | None:
    """The page's FIRST <title> element text (the surface doc_titles.json
    stores, /root/reference/main.py:28-31) — None when absent/empty."""
    for tag, text in parsed.important:
        if tag == "title":
            text = text.strip()
            return text or None
    return None


def process_crawl(crawl: DataFrame) -> DataFrame:
    """S3-S6 in one Arrow pass →
    (url, text, important, outgoing_links, title)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            texts, imps, links, titles = [], [], [], []
            for url, content, encoding in zip(
                pdf["url"], pdf["content"], pdf["encoding"]
            ):
                parsed = _parse_page(content)  # one parse feeds S3-S6
                texts.append(_page_text(content, encoding, parsed))
                imps.append(_important_text(content, parsed))
                links.append(_links(content, url, parsed))
                titles.append(_page_title(parsed))
            yield pd.DataFrame(
                {
                    "url": pdf["url"],
                    "text": texts,
                    "important": imps,
                    "outgoing_links": links,
                    "title": titles,
                }
            )

    return crawl.mapInPandas(
        run,
        schema=(
            "url string, text string, "
            "important array<struct<text:string,weight:double>>, "
            "outgoing_links array<string>, title string"
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
