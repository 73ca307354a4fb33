"""Pinned and boosting queries — the last two ES query-DSL composition
verbs this engine lacked.

Both are result-set transforms over the engine's standard scored match
set, not new scorers:

* ``pinned`` (ES pinned query / "promoted results"): the caller's
  pinned doc keys rank FIRST, in the caller's order, then the organic
  ranking with the pinned docs removed.  ES implements it as a
  dis-max over (constant huge score per pin, organic); the dataflow
  form here is exact and simpler: pins are a driver-sized list, the
  organic query excludes them, ranks are concatenated.
* ``boosting`` (ES boosting query): positive query scores normally; a
  doc that ALSO matches the negative query has its score multiplied by
  ``negative_boost`` ∈ [0, 1) — demotion without exclusion (the
  difference from -term / must_not).  The negative match set is
  doc-level (disjunctive ≥1 term, the engine's match semantics), so
  the demotion is one broadcast-joined flag on the scored frame; the
  multiply happens BEFORE the top-k cut (a demoted head doc really
  drops out).

Scale: pins are O(k) driver data; the negative match set reuses
facets.matched_docs (term-IN pushdown → one doc_ord rollup) and joins
the scored frame on doc_ord — no corpus scan, no extra shuffle beyond
the flag join.  Demotion factors ≤ 1 preserve block-max upper bounds,
so a WAND-pruned positive leg stays valid (same argument as
funcscore's multiply mode); the exhaustive form here is the reference
implementation the pruned one must match.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ics_search_engine_spark.operators.aggs import scored_matches
from ics_search_engine_spark.operators.facets import matched_docs
from ics_search_engine_spark.operators.packed_index import PackedIndex
from ics_search_engine_spark.operators.query import resolve_topk_keys


def boosting_topk(
    spark: SparkSession,
    pidx: PackedIndex,
    positive: str,
    negative: str,
    negative_boost: float = 0.5,
    k: int = 10,
) -> DataFrame:
    """ES boosting query → (conv_id, turn_idx, score) top-k; see
    module docstring.  ``negative_boost`` must be in [0, 1)."""
    if not (0.0 <= negative_boost < 1.0):
        raise ValueError("negative_boost must be in [0, 1)")
    scored = scored_matches(spark, pidx, positive)
    neg = matched_docs(spark, pidx, negative).withColumn(
        "_neg", F.lit(True)
    )
    demoted = (
        scored.join(neg, "doc_ord", "left")
        .select(
            "doc_ord",
            F.when(
                F.col("_neg").isNotNull(),
                F.col("score") * F.lit(negative_boost),
            )
            .otherwise(F.col("score"))
            .alias("score"),
        )
    )
    topk = demoted.orderBy(F.desc("score"), F.asc("doc_ord")).limit(k)
    return resolve_topk_keys(pidx, topk)


def pinned_topk(
    spark: SparkSession,
    pidx: PackedIndex,
    query: str,
    pinned: list[tuple[str, int]],
    k: int = 10,
) -> DataFrame:
    """ES pinned query → (conv_id, turn_idx, score, pinned) top-k:
    the ``pinned`` (conv_id, turn_idx) keys first IN THE GIVEN ORDER
    (score NULL — they did not earn one), then the organic ranking
    minus the pinned docs, until k rows total.  Unknown pinned keys
    are kept (ES pins ids whether or not they match the query)."""
    pins = pinned[:k]
    rows: list[tuple[str, int, float | None, bool]] = [
        (c, t, None, True) for c, t in pins
    ]
    need = k - len(rows)
    if need > 0:
        pin_set = set(pins)
        organic = (
            scored_matches(spark, pidx, query)
            .join(
                pidx.docmap.select("doc_ord", "conv_id", "turn_idx"),
                "doc_ord",
            )
            .orderBy(F.desc("score"), F.asc("conv_id"), F.asc("turn_idx"))
            # over-fetch by |pins|: every pin might sit inside the cut
            .limit(k + len(pins))
            .collect()
        )
        for r in organic:
            if (r["conv_id"], r["turn_idx"]) in pin_set:
                continue
            rows.append((r["conv_id"], r["turn_idx"], r["score"], False))
            if len(rows) == k:
                break
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, score double, pinned boolean"
    )


def terms_set_topk(
    spark: SparkSession,
    pidx: PackedIndex,
    query: str,
    attrs: DataFrame,
    required_col: str,
    k: int = 10,
) -> DataFrame:
    """ES terms_set query: minimum_should_match PER DOCUMENT — each doc
    demands its own number of matching query terms, read from
    ``attrs.<required_col>`` (ES's minimum_should_match_field) →
    (conv_id, turn_idx, n_matched, score) top-k.

    The static-msm machinery can't express this (the threshold is a
    doc value, not a constant), so the matched-term count rides the ONE
    scoring pass (postings are unique per (term, doc), so the fold
    list's size IS the count — the score_all/min_match pattern) and the
    filter is per-row against the joined doc value.  Surviving scores
    are the engine's standard BM25 (bit-identical to the unfiltered
    path — same sorted-term fold)."""
    from ics_search_engine_spark.operators.packed_index import (
        decode_matched,
    )
    from ics_search_engine_spark.operators.query import (
        query_weights,
        score_all,
    )
    from ics_search_engine_spark.textproc.tokenizer import tokenize

    do_stem = pidx.stats.get("stem", True)
    q_terms = sorted(set(tokenize(query, for_query=True, do_stem=do_stem)))
    empty = spark.createDataFrame(
        [], "conv_id string, turn_idx int, n_matched int, score double"
    )
    if not q_terms:
        return empty
    term_df = pidx.df_for_terms(q_terms)
    weights = query_weights(query, term_df, pidx.n_docs, do_stem=do_stem)
    if not weights:
        return empty
    posts = decode_matched(
        pidx.index.filter(F.col("term").isin(sorted(weights)))
    )
    # the engine's ONE scoring fold, with the matched-term count riding
    # the same pass (score_all with_count)
    scored = score_all(
        spark, posts, weights, pidx.avgdl, ["doc_ord"], with_count=True
    )
    return (
        pidx.docmap.select("doc_ord", "conv_id", "turn_idx")
        .join(scored, "doc_ord")
        .join(attrs, ["conv_id", "turn_idx"])
        .filter(F.col("n_matched") >= F.col(required_col))
        .select("conv_id", "turn_idx", "n_matched", "score")
        .orderBy(F.desc("score"), F.asc("conv_id"), F.asc("turn_idx"))
        .limit(k)
    )


def sort_by_field_topk(
    spark: SparkSession,
    pidx: PackedIndex,
    query: str,
    attrs: DataFrame,
    sort_col: str,
    ascending: bool = False,
    k: int = 10,
    conjunctive: bool = False,
    min_match: int | None = None,
    missing: str = "last",
) -> DataFrame:
    """ES field sort (``"sort": [{"ts": "desc"}]``): the query is pure
    FILTER context — relevance never computes — and the top-k cut runs
    on a doc-value column → (conv_id, turn_idx, <sort_col>).

    Semantics pinned to ES:
    * docs missing the sort value (NULL, or absent from ``attrs``) sort
      per ``missing`` — "last" (default, ES's ``_last``) or "first";
    * ties break on the engine's stable doc key (conv_id, turn_idx) so
      pagination over equal values is deterministic (ES needs an
      explicit ``_doc`` tie-breaker for the same reason);
    * scores are NOT returned — ES sets them null under a field sort
      unless track_scores is on; the scored form is one
      ``scored_matches`` join away.

    Scale: the scoring fold disappears entirely — match set (term-IN
    pushdown → per-doc rollup) → docmap join → LEFT join of the
    doc-value column → TakeOrderedAndProject.  The sort ships k rows
    per partition, never the match set."""
    docs = matched_docs(
        spark, pidx, query, conjunctive=conjunctive, min_match=min_match
    )
    keyed = (
        pidx.docmap.select("doc_ord", "conv_id", "turn_idx")
        .join(docs, "doc_ord")
        .join(attrs.select("conv_id", "turn_idx", sort_col),
              ["conv_id", "turn_idx"], "left")
    )
    v = F.col(sort_col)
    primary = F.asc_nulls_last(v) if ascending else F.desc_nulls_last(v)
    if missing == "first":
        primary = F.asc_nulls_first(v) if ascending else F.desc_nulls_first(v)
    return (
        keyed.select("conv_id", "turn_idx", sort_col)
        .orderBy(primary, F.asc("conv_id"), F.asc("turn_idx"))
        .limit(k)
    )


def dis_max_topk(
    spark: SparkSession,
    pidx: PackedIndex,
    queries: list[str],
    tie_breaker: float = 0.0,
    k: int = 10,
) -> DataFrame:
    """The Lucene/ES ``dis_max`` query over arbitrary sub-queries: a
    doc matching several clauses scores its BEST clause, plus
    ``tie_breaker`` × each other matching clause →
    (conv_id, turn_idx, score) top-k.  tie_breaker=0 is pure
    disjunction-max (the "don't double-count near-synonymous clauses"
    verb); tie_breaker=1 degenerates to a should-sum.

    multi_match best_fields is dis_max over FIELDS of one query
    (operators/fields.py); this is dis_max over QUERIES of one field —
    the other half of Lucene's DisjunctionMaxQuery usage.

    Determinism: each clause scores with the engine's standard fold
    (bit-identical to its own bm25_topk_packed); clauses combine as
    FULL OUTER joins in caller order, so the combine expression adds
    a FIXED sequence of ≤ |clauses| terms — no shuffle-order float
    drift.  Empty/stop-only clauses contribute nothing (dropped); all
    clauses empty → empty result.

    Plan: one scored frame per clause (each a term-IN pushdown +
    fold), |clauses|−1 outer joins on doc_ord (match-set-sized,
    co-keyed), one combine projection, TakeOrderedAndProject, winner
    resolution by docmap join.  Clause count is O(query), not
    O(corpus)."""
    legs = []
    for i, q in enumerate(queries):
        s = scored_matches(spark, pidx, q).select(
            "doc_ord", F.col("score").alias(f"_s{i}")
        )
        legs.append(s)
    if not legs:
        return spark.createDataFrame(
            [], "conv_id string, turn_idx int, score double"
        )
    from functools import reduce

    merged = reduce(lambda a, b: a.join(b, "doc_ord", "full_outer"), legs)
    cols = [F.coalesce(F.col(f"_s{i}"), F.lit(0.0)) for i in range(len(legs))]
    best = cols[0] if len(cols) == 1 else F.greatest(*cols)
    total = cols[0]
    for c in cols[1:]:  # fixed caller order — deterministic additions
        total = total + c
    combined = best + F.lit(float(tie_breaker)) * (total - best)
    scored = merged.select("doc_ord", combined.alias("score"))
    topk = scored.orderBy(F.desc("score"), F.asc("doc_ord")).limit(k)
    return (
        pidx.docmap.select("doc_ord", "conv_id", "turn_idx")
        .join(F.broadcast(topk), "doc_ord")
        .select("conv_id", "turn_idx", "score")
        .orderBy(F.desc("score"), F.asc("conv_id"), F.asc("turn_idx"))
    )
