"""Tokenizer with reference-parity semantics.

Replicates /root/reference/utils/tokenizer.py:9-34 exactly:

1. regex-tokenize on ``[a-zA-Z0-9]+`` over the lowercased text
2. for queries only: drop stop words BEFORE stemming
   (/root/reference/utils/tokenizer.py:28-29 — indexing keeps stop
   words, see /root/reference/todo.md:4)
3. Porter-stem every surviving token
4. drop single-character tokens AFTER stemming
   (/root/reference/utils/tokenizer.py:34)

The asymmetry matters: the stop-word test uses the RAW lowercased token
("this" is dropped at query time, but "thi" — its stem — would not be),
and the length-1 filter runs on the STEMMED token.

This pure-Python core is shared verbatim by the Spark pandas UDFs
(ics_search_engine_spark.functions.udfs) and the single-node oracle
(oracle.bm25) so tokenization parity is structural.
"""

from __future__ import annotations

import re

from .porter import stem

# Verbatim from /root/reference/utils/constants.py:2-19.
STOP_WORDS = frozenset({
    'a', 'about', 'above', 'after', 'again', 'against', 'all', 'am', 'an', 'and', 'any', 'are',
    "aren't", 'as', 'at', 'be', 'because', 'been', 'before', 'being', 'below', 'between', 'both',
    'but', 'by', 'can', "can't", 'cannot', 'com', 'could', "couldn't", 'did', "didn't", 'do',
    'does', "doesn't", 'doing', "don't", 'down', 'during', 'each', 'else', 'ever', 'few', 'for',
    'from', 'further', 'get', 'had', "hadn't", 'has', "hasn't", 'have', "haven't", 'having', 'he',
    'her', 'here', "here's", 'hers', 'herself', 'him', 'himself', 'his', 'how', "how's", 'i', "i'm",
    'if', 'in', 'into', 'is', "isn't", 'it', "it's", 'its', 'itself', "let's", 'me', 'more', 'most',
    "mustn't", 'my', 'myself', 'no', 'nor', 'not', 'of', 'off', 'on', 'once', 'only', 'or', 'other',
    'ought', 'our', 'ours', 'ourselves', 'out', 'over', 'own', 'same', "shan't", 'she', "she'd",
    "she'll", "she's", 'should', "shouldn't", 'so', 'some', 'such', 'than', 'that', "that's", 'the',
    'their', 'theirs', 'them', 'themselves', 'then', 'there', "there's", 'these', 'they',
    "they'd", "they'll", "they're", "they've", 'this', 'those', 'through', 'to', 'too', 'under',
    'until', 'up', 'very', 'was', "wasn't", 'we', "we'd", "we'll", "we're", "we've", 'were',
    "weren't", 'what', "what's", 'when', "when's", 'where', "where's", 'which', 'while',
    'who', "who's", 'whom', 'why', "why's", 'with', "won't", 'would', "wouldn't", 'you',
    "you'd", "you'll", "you're", "you've", 'your', 'yours', 'yourself', 'yourselves'
})

_TOKEN_RE = re.compile(r"[a-z0-9]+")


def tokenize(text: str, for_query: bool = False, do_stem: bool = True) -> list[str]:
    """Reference-parity tokenize (see module docstring).

    ``do_stem=False`` is an engine extension used for the stem-free
    operator variants whose DuckDB oracle SQL cannot stem; it still
    applies the stop-word and length-1 rules in the same order.
    """
    if not text:
        return []
    raw = _TOKEN_RE.findall(text.lower())
    if for_query:
        raw = [t for t in raw if t not in STOP_WORDS]
    if do_stem:
        tokens = [stem(t) for t in raw]
    else:
        tokens = raw
    return [t for t in tokens if len(t) != 1]


def tokenize_raw_aligned(text: str, do_stem: bool = True) -> list[str]:
    """RAW (lowercased, unstemmed) tokens that survive the INDEX-mode
    pipeline, in position order — element i is the surface form sitting
    at index position i.  Used to render snippets/highlights around
    stored positions: the length-1 drop must test the same form the
    index tested (the stem when ``do_stem``), or alignment drifts."""
    if not text:
        return []
    raw = _TOKEN_RE.findall(text.lower())
    if do_stem:
        return [r for r in raw if len(stem(r)) != 1]
    return [r for r in raw if len(r) != 1]
