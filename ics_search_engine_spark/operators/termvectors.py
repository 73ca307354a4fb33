"""Per-document term vectors: (term, tf, positions, df) for ONE doc.

The Lucene/Elasticsearch ``termvectors`` API: given a stored document,
return every indexed term it contains with its in-doc statistics plus
the corpus-global df the index holds for that term.  The reference has
no per-doc introspection at all — its index is write-only below the
query loop (/root/reference/components/index_manager.py).

An inverted index cannot enumerate a document's terms (that is the
forward-index direction), so this follows the more-like-this pattern
(operators/mlt.py): fetch the ONE stored text by predicate-pushdown
point lookup, re-analyze it with the index's own tokenizer — tf and
positions are identical to what the build wrote by construction
(postings ARE ``posexplode(tokenize(text))``'s counts,
operators/index_build.py:62-85) — then one metadata-only
``term IN (...)`` scan for the df column.

Scale: everything is bounded by ONE document's length — the point
lookup prunes to a single row, the driver tokenizes one text, the df
lookup is a pushed-down metadata scan over |distinct terms of one doc|
keys.  Nothing grows with the corpus.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ics_search_engine_spark.operators.index_build import DOC_KEY
from ics_search_engine_spark.textproc.tokenizer import tokenize

_SCHEMA = (
    "term string, tf int, positions array<int>, df long"
)


def term_vectors(
    spark: SparkSession,
    pidx,
    transcripts: DataFrame,
    conv_id: str,
    turn_idx: int,
) -> DataFrame:
    """(term, tf, positions, df) for the given (conv_id, turn_idx),
    ordered by term asc.  ``transcripts`` is the doc store the index
    was built from.  Unknown keys return an empty frame.  ``df`` is 0
    for a term the index lacks (possible only if the doc store and
    index diverge — the caller can assert df > 0 as an integrity
    check)."""
    do_stem = pidx.stats.get("stem", True)
    rows = (
        transcripts.filter(
            (F.col(DOC_KEY[0]) == conv_id) & (F.col(DOC_KEY[1]) == turn_idx)
        )
        .select("text")
        .collect()
    )
    if not rows:
        return spark.createDataFrame([], _SCHEMA)
    toks = tokenize(rows[0]["text"], for_query=False, do_stem=do_stem)
    tf: dict[str, int] = {}
    positions: dict[str, list[int]] = {}
    for pos, t in enumerate(toks):
        tf[t] = tf.get(t, 0) + 1
        positions.setdefault(t, []).append(pos)
    if not tf:
        return spark.createDataFrame([], _SCHEMA)
    df_of = pidx.df_for_terms(sorted(tf))
    return spark.createDataFrame(
        [
            (t, tf[t], positions[t], int(df_of.get(t, 0)))
            for t in sorted(tf)
        ],
        _SCHEMA,
    )
