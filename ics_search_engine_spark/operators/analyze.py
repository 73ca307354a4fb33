"""The ES ``_analyze`` API: run text through the engine's analysis
chain and return the surviving tokens WITH their index positions,
surface forms, and character offsets — the introspection endpoint that
answers "why does this query (not) match this doc".

The reference's tokenizer is a bare function returning a token list
(/root/reference/utils/tokenizer.py:9-34); nothing reports positions
or offsets, which is why its users debug matching by print().  Here
the chain is replayed ONCE with bookkeeping:

* ``token``: the final searchable form (stemmed unless ``do_stem``
  is off) — what the index stores;
* ``raw``: the surface form (lowercased match) the filter chain
  tested;
* ``position``: the token's INDEX position — identical by
  construction to the positions the packed positional payloads store
  (the filters drop tokens before positions are assigned, exactly as
  ``textproc.tokenize`` does), so an _analyze position can be
  compared 1:1 against term_vectors / intervals / phrase output;
* ``start_offset`` / ``end_offset``: character offsets of the raw
  token in the LOWERCASED text (``text.lower()`` is what the
  reference tokenizes; offsets equal original-text offsets whenever
  lowercasing preserves length — always for ASCII, the corpus
  alphabet, since the token regex is ``[a-z0-9]+``).

``mode="query"`` applies the query-side stop-word drop before
stemming (the reference's asymmetry, tokenizer.py:28-29), exactly
like ``tokenize(for_query=True)`` — so analyze output predicts query
tokenization too.

Scale: ``analyze_text`` is the driver-side single-text endpoint (ES's
actual _analyze is one request, one text).  ``analyze`` is the
distributed form — one Arrow-batched pandas UDF emitting an array of
token structs per row, exploded; map-only, no shuffle, the same
vectorized-UDF discipline as the index build itself.
"""

from __future__ import annotations

import re

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from ics_search_engine_spark.textproc.porter import stem
from ics_search_engine_spark.textproc.tokenizer import STOP_WORDS

_TOKEN_RE = re.compile(r"[a-z0-9]+")

TOKEN_STRUCT = StructType(
    [
        StructField("token", StringType()),
        StructField("raw", StringType()),
        StructField("position", IntegerType()),
        StructField("start_offset", IntegerType()),
        StructField("end_offset", IntegerType()),
    ]
)


def analyze_text(
    text: str, mode: str = "index", do_stem: bool = True
) -> list[dict]:
    """One text → surviving tokens as dicts (see module docstring).
    Pure python, shared verbatim by the distributed UDF so the two
    forms cannot drift."""
    if not text:
        return []
    out = []
    pos = 0
    for m in _TOKEN_RE.finditer(text.lower()):
        raw = m.group(0)
        if mode == "query" and raw in STOP_WORDS:
            continue
        token = stem(raw) if do_stem else raw
        if len(token) == 1:
            continue
        out.append(
            {
                "token": token,
                "raw": raw,
                "position": pos,
                "start_offset": m.start(),
                "end_offset": m.end(),
            }
        )
        pos += 1
    return out


def analyze(
    df: DataFrame,
    text_col: str = "text",
    mode: str = "index",
    do_stem: bool = True,
) -> DataFrame:
    """Distributed _analyze: every other column of ``df`` is kept and
    the token structs explode to one row per surviving token →
    (..., token, raw, position, start_offset, end_offset).  Rows whose
    text analyzes to nothing disappear (ES returns an empty token
    list; a row-per-token frame has no row to carry it)."""

    @F.pandas_udf(ArrayType(TOKEN_STRUCT))
    def _an(s: pd.Series) -> pd.Series:
        return s.map(lambda t: analyze_text(t or "", mode, do_stem))

    tok = F.explode(_an(F.col(text_col))).alias("t")
    keep = [c for c in df.columns if c != text_col]
    return df.select(*keep, tok).select(
        *keep,
        F.col("t.token").alias("token"),
        F.col("t.raw").alias("raw"),
        F.col("t.position").alias("position"),
        F.col("t.start_offset").alias("start_offset"),
        F.col("t.end_offset").alias("end_offset"),
    )
