"""Result snippets: a token window around each hit's first match.

The reference presents results as title + url only
(/root/reference/search.py:204-230, main.py:48-55) — it stores
positions but never uses them for display.  This operator turns the
positional payload into the standard search-result snippet: for each
top-k doc, the surface-form token window centered on the FIRST position
where any query term matches.

Semantics (mirrored by the DuckDB gate):
* ranking is the normal packed BM25 top-k;
* first_pos(d) = min over query terms of the term's first position in
  d (positions are index-mode body-token offsets);
* snippet = raw (lowercased, unstemmed) tokens
  [max(0, first_pos − context) … first_pos + context], joined by a
  space — ``tokenize_raw_aligned`` keeps surface forms aligned with
  index positions by applying the length-1 drop to the same form the
  index tested;
* match_positions = every matched position of every query term in d,
  ascending — the highlight offsets a UI would bold.

Plan: top-k first; then one narrow job re-filters the matched
positional postings to the ≤ k winner ordinals (broadcast) and
aggregates positions; snippet text renders through an Arrow-batched
pandas UDF over exactly k (text, first_pos) rows joined from the
transcripts table — corpus-scale data never re-shuffles.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ics_search_engine_spark.operators.packed_index import (
    PackedIndex,
    decode_matched,
)
from ics_search_engine_spark.operators.query import query_weights, score_topk
from ics_search_engine_spark.textproc.tokenizer import tokenize


def _snippet_udf(context: int, do_stem: bool):
    @F.pandas_udf("string")
    def render(text: pd.Series, first_pos: pd.Series) -> pd.Series:
        from ics_search_engine_spark.textproc.tokenizer import (
            tokenize_raw_aligned,
        )

        out = []
        for t, p in zip(text, first_pos):
            toks = tokenize_raw_aligned(t or "", do_stem=do_stem)
            p = int(p)
            out.append(" ".join(toks[max(0, p - context): p + context + 1]))
        return pd.Series(out)

    return render


def highlight_topk(
    spark: SparkSession,
    pidx: PackedIndex,
    transcripts: DataFrame,
    query: str,
    k: int = 10,
    context: int = 3,
) -> DataFrame:
    """Top-k BM25 with display payload → (conv_id, turn_idx, score,
    first_pos, match_positions, snippet).  Requires a positional index
    (``with_positions=True`` at build)."""
    empty = spark.createDataFrame(
        [],
        "conv_id string, turn_idx int, score double, first_pos int, "
        "match_positions array<int>, snippet string",
    )
    do_stem = pidx.stats.get("stem", True)
    q_terms = sorted(set(tokenize(query, for_query=True, do_stem=do_stem)))
    if not q_terms:
        return empty
    term_df = pidx.df_for_terms(q_terms)
    weights = query_weights(query, term_df, pidx.n_docs, do_stem=do_stem)
    if not weights:
        return empty

    matched = pidx.index.filter(F.col("term").isin(sorted(weights)))
    posts = decode_matched(matched, with_positions=True)
    topk = score_topk(
        spark,
        posts.select("term", "doc_ord", "tf", "dl"),
        weights,
        pidx.avgdl,
        ["doc_ord"],
        k,
    )

    hitpos = (
        posts.join(F.broadcast(topk), "doc_ord")
        .groupBy("doc_ord")
        .agg(
            F.first("score").alias("score"),
            F.sort_array(F.flatten(F.collect_list("positions"))).alias(
                "match_positions"
            ),
        )
        .withColumn("first_pos", F.element_at("match_positions", 1))
    )
    keyed = pidx.docmap.select("doc_ord", "conv_id", "turn_idx").join(
        F.broadcast(hitpos), "doc_ord"
    )
    with_text = transcripts.select("conv_id", "turn_idx", "text").join(
        F.broadcast(keyed), ["conv_id", "turn_idx"]
    )
    return (
        with_text.withColumn(
            "snippet", _snippet_udf(context, do_stem)("text", "first_pos")
        )
        .select(
            "conv_id", "turn_idx", "score", "first_pos",
            "match_positions", "snippet",
        )
        .orderBy(F.desc("score"), "conv_id", "turn_idx")
    )
