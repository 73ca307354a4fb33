"""Script-based scoring and fields: ES ``script_score`` and
``script_fields`` re-expressed as Catalyst column expressions.

Elasticsearch lets a query replace the relevance score with a Painless
script over ``_score`` plus doc values (``script_score``), and lets a
hit carry computed columns (``script_fields`` / runtime fields).  The
reference engine has no scripting surface at all — its score is the
fixed blend (/root/reference/search.py:183-190) — so this module is an
engine extension, and the "script language" is Spark SQL expression
syntax instead of Painless: the script compiles to a Catalyst
expression, stays inside whole-stage codegen, and is never a Python
UDF.  That is the Spark-first translation: a row-at-a-time script
interpreter is exactly the slow path the 100 TB design rules out.

Scale shapes:

* ``bm25_topk_script`` — same geometry as the decay/rank_feature
  family (operators/funcscore): exhaustive match-set scoring
  (score_all: one shuffle on doc_ord), docmap + attrs joins at
  doc-value grain, the script expression evaluated JVM-side per
  surviving row, TakeOrderedAndProject for the top-k.  Cost is the
  match set, not the corpus.
* ``script_fields`` — decorates an ALREADY-bounded result frame
  (≤ k rows), so the attrs join broadcasts the hits, never the attrs.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ics_search_engine_spark.operators.aggs import scored_matches
from ics_search_engine_spark.operators.packed_index import PackedIndex

_DOC_KEY = ["conv_id", "turn_idx"]


def bm25_topk_script(
    spark: SparkSession,
    pidx: PackedIndex,
    query: str,
    attrs: DataFrame | None,
    script: str,
    k: int = 10,
    min_match: int | None = None,
) -> DataFrame:
    """ES ``script_score``: top-k by a SQL expression over ``_score``
    (the doc's full BM25 score) and the doc-value columns of ``attrs``
    → (conv_id, turn_idx, score).

    ``script`` is a Spark SQL expression string, e.g.
    ``"_score * (1.0 + coalesce(weight, 0.0))"``.  It REPLACES the
    relevance score (ES semantics); compose additively or
    multiplicatively by referencing ``_score`` explicitly.  Docs
    missing from ``attrs`` are kept with NULL doc values (ES keeps the
    doc and lets the script decide) — scripts over optional attributes
    should ``coalesce``.  Rows whose script evaluates to NULL are
    dropped, mirroring ES's treatment of a script error per doc being
    a hard error: here the total order must stay well-defined, and a
    NULL score has no rank.

    Ties break on (conv_id, turn_idx) like every other ranked surface,
    so cursors from this verb compose with search_after/scroll.
    """
    scored = scored_matches(spark, pidx, query, min_match=min_match)
    keyed = (
        pidx.docmap.select("doc_ord", *_DOC_KEY)
        .join(scored, "doc_ord")
        .withColumnRenamed("score", "_score")
    )
    if attrs is not None:
        keyed = keyed.join(attrs, _DOC_KEY, "left")
    return (
        keyed.withColumn("score", F.expr(script).cast("double"))
        .filter(F.col("score").isNotNull())
        .select(*_DOC_KEY, "score")
        .orderBy(F.desc("score"), *_DOC_KEY)
        .limit(k)
    )


def script_fields(
    hits: DataFrame,
    attrs: DataFrame | None,
    fields: dict[str, str],
) -> DataFrame:
    """ES ``script_fields`` / runtime fields: decorate a ranked result
    frame with computed columns → hits' columns + one column per entry
    of ``fields`` (name → Spark SQL expression over the hit's columns
    and, if given, the joined ``attrs`` doc values).

    The hits frame is expected to be bounded (a top-k result), so the
    attrs join broadcasts the HITS side — the plan never shuffles or
    scans attrs beyond the join probe.  Field expressions are Catalyst
    expressions (codegen), not Python.  Presentation order is restated
    (score desc, conv_id, turn_idx) because a join does not preserve
    order.
    """
    base_cols = hits.columns
    joined = (
        attrs.join(F.broadcast(hits), _DOC_KEY)
        if attrs is not None
        else hits
    )
    out = joined.select(
        *base_cols,
        *[F.expr(expr).alias(name) for name, expr in fields.items()],
    )
    if "score" in base_cols:
        out = out.orderBy(F.desc("score"), *_DOC_KEY)
    return out
