"""Function scoring: decay functions over document attributes.

The Elasticsearch ``function_score`` decay pattern (gauss / exp /
linear over a date or numeric doc-value, multiplied into the relevance
score) — the standard "prefer recent documents" ranking for a
transcript corpus, where ``ts`` is exactly the doc-value it wants.
The reference has no doc attributes at all (its docID is a bare URL);
this is part of the fielded data model the transcript schema
(BASELINE.json input_hint) adds.

Semantics (the ES formulas, double-precision):
    dist   = max(0, |value - origin| - offset)          [seconds]
    gauss  : exp( ln(decay) / scale^2 * dist^2 )
    exp    : exp( ln(decay) / scale   * dist )
    linear : max(0, (s - dist) / s),  s = scale / (1 - decay)
so factor(origin ± (offset + scale)) = decay, factor(within offset) = 1.
``mode='multiply'`` (default): final = bm25 * factor — factor ∈ (0, 1]
keeps every block-max upper bound valid, so this composes with WAND
pruning unchanged (ub_range * 1 ≥ score * factor).  ``mode='sum'``:
final = bm25 + factor (additive recency nudge).

Determinism: the decay constant ln(decay)/scale^k is computed
driver-side in Python and embedded as ONE double literal; the per-doc
factor is a single JVM exp() over exact integer second distances.
Cross-engine comparison is by rounded score like every float gate.

Plan shape: score_all's fold (one shuffle on doc_ord, matched postings
only) → docmap join → ONE doc-values join against the attribute
relation (the facet_counts shape — at 10^12 docs this is the
doc-value-store lookup every fielded engine does) → scalar factor
column → TakeOrderedAndProject.  Nothing new shuffles; the attribute
join carries (key, ts) only (column pruning reaches the scan).
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ics_search_engine_spark.operators.packed_index import (
    PackedIndex,
    decode_matched,
)
from ics_search_engine_spark.operators.query import (
    query_weights,
    score_all,
)
from ics_search_engine_spark.textproc.tokenizer import tokenize

DECAY_FNS = ("gauss", "exp", "linear")
SCORE_MODES = ("multiply", "sum")


def decay_factor_col(
    value_sec: F.Column,
    origin_sec: float,
    scale_sec: float,
    offset_sec: float = 0.0,
    decay: float = 0.5,
    fn: str = "gauss",
) -> F.Column:
    """The ES decay factor as a pure Catalyst column over a seconds
    epoch value.  ``decay`` is the factor at distance offset+scale."""
    if fn not in DECAY_FNS:
        raise ValueError(f"unknown decay fn {fn!r}")
    if not (0.0 < decay < 1.0):
        raise ValueError("decay must be in (0, 1)")
    if scale_sec <= 0:
        raise ValueError("scale must be positive")
    dist = F.greatest(
        F.abs(value_sec - F.lit(float(origin_sec))) - F.lit(float(offset_sec)),
        F.lit(0.0),
    )
    if fn == "gauss":
        c = math.log(decay) / (scale_sec * scale_sec)
        return F.exp(F.lit(c) * dist * dist)
    if fn == "exp":
        c = math.log(decay) / scale_sec
        return F.exp(F.lit(c) * dist)
    s = scale_sec / (1.0 - decay)
    return F.greatest(
        (F.lit(s) - dist) / F.lit(s), F.lit(0.0)
    )


def bm25_topk_decay(
    spark: SparkSession,
    pidx: PackedIndex,
    query: str,
    attrs: DataFrame,
    ts_col: str,
    origin: str,
    scale_days: float,
    k: int = 10,
    offset_days: float = 0.0,
    decay: float = 0.5,
    fn: str = "gauss",
    mode: str = "multiply",
) -> DataFrame:
    """Top-k BM25 with a time-decay function score → (conv_id,
    turn_idx, score) where score = bm25 ∘ factor(ts).  ``attrs`` is the
    doc-value relation carrying (conv_id, turn_idx, ts_col); ``origin``
    an ISO date/timestamp string.  The decay RE-RANKS, so the factor
    applies to every matched doc BEFORE the top-k cut (a post-hoc
    multiply of a bm25 top-k would miss docs whose decayed score
    overtakes a stale higher-bm25 doc)."""
    if mode not in SCORE_MODES:
        raise ValueError(f"unknown score mode {mode!r}")
    empty = spark.createDataFrame(
        [], "conv_id string, turn_idx int, score double"
    )
    do_stem = pidx.stats.get("stem", True)
    q_terms = sorted(set(tokenize(query, for_query=True, do_stem=do_stem)))
    if not q_terms:
        return empty
    term_df = pidx.df_for_terms(q_terms)
    weights = query_weights(query, term_df, pidx.n_docs, do_stem=do_stem)
    if not weights:
        return empty

    matched = pidx.index.filter(F.col("term").isin(q_terms))
    posts = decode_matched(matched)
    scored = score_all(spark, posts, weights, pidx.avgdl, ["doc_ord"])
    keyed = pidx.docmap.join(scored, "doc_ord").select(
        "conv_id", "turn_idx", "score"
    )
    import datetime

    origin_sec = datetime.datetime.fromisoformat(origin).replace(
        tzinfo=datetime.timezone.utc
    ).timestamp()
    factor = decay_factor_col(
        F.col(ts_col).cast("double"),
        origin_sec,
        scale_days * 86400.0,
        offset_days * 86400.0,
        decay,
        fn,
    )
    final = (
        F.col("score") * factor if mode == "multiply"
        else F.col("score") + factor
    )
    return (
        keyed.join(
            attrs.select("conv_id", "turn_idx", ts_col),
            ["conv_id", "turn_idx"],
        )
        .select("conv_id", "turn_idx", final.alias("score"))
        .orderBy(F.desc("score"), "conv_id", "turn_idx")
        .limit(k)
    )


def bm25_topk_random(
    spark: SparkSession,
    pidx,
    query: str,
    seed: int = 42,
    k: int = 10,
    mode: str = "replace",
) -> DataFrame:
    """ES function_score random_score: a DETERMINISTIC per-doc uniform
    in [0, 1) keyed on (docID, seed) — md5's first 32 bits / 2^32, the
    engine's cross-engine-exact hash convention — either REPLACING the
    relevance score (ES's random_score alone; stable shuffling /
    sampling of the match set) or MULTIPLYING into BM25
    (boost_mode=multiply).  → (conv_id, turn_idx, score) top-k."""
    from ics_search_engine_spark.operators.aggs import scored_matches
    from ics_search_engine_spark.operators.facets import matched_docs

    if mode not in ("replace", "multiply"):
        raise ValueError(f"unknown random_score mode: {mode}")
    if mode == "replace":
        # membership only — no weight join, no score fold (the scores
        # would be discarded; ES random_score-alone semantics)
        base = matched_docs(spark, pidx, query)
    else:
        base = scored_matches(spark, pidx, query)
    keyed = pidx.docmap.select("doc_ord", "conv_id", "turn_idx").join(
        base, "doc_ord"
    )
    rnd = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":", F.col("conv_id"),
                        F.col("turn_idx").cast("string"),
                        F.lit(str(seed)),
                    )
                ),
                1, 8,
            ),
            16, 10,
        ).cast("double")
        / F.lit(4294967296.0)
    )
    out = keyed.select(
        "conv_id", "turn_idx",
        (rnd if mode == "replace" else F.col("score") * rnd).alias("score"),
    )
    return out.orderBy(
        F.desc("score"), F.asc("conv_id"), F.asc("turn_idx")
    ).limit(k)


RANK_FEATURE_FNS = ("saturation", "log", "sigmoid")


def rank_feature_col(
    feature: Column,
    fn: str = "saturation",
    pivot: float = 1.0,
    exponent: float = 1.0,
    scaling_factor: float = 1.0,
) -> Column:
    """ES rank_feature score functions over a non-negative per-doc
    static feature: ``saturation`` f/(f+pivot), ``log``
    ln(scaling_factor + f), ``sigmoid`` f^exp/(f^exp + pivot^exp) —
    all monotone in f, bounded (log excepted), zero at f = 0.
    NULL features score 0 (ES: a doc without the feature gets no
    contribution from the clause, it is NOT excluded)."""
    if fn not in RANK_FEATURE_FNS:
        raise ValueError(f"unknown rank_feature function {fn!r}")
    f = F.coalesce(feature.cast("double"), F.lit(0.0))
    if fn == "saturation":
        s = f / (f + F.lit(float(pivot)))
    elif fn == "log":
        s = F.log(F.lit(float(scaling_factor)) + f)
    else:
        fe = F.pow(f, F.lit(float(exponent)))
        s = fe / (fe + F.lit(float(pivot) ** float(exponent)))
    return s


def bm25_topk_rank_feature(
    spark: SparkSession,
    pidx: PackedIndex,
    query: str,
    features: DataFrame,
    feature_col: str,
    boost: float = 1.0,
    fn: str = "saturation",
    pivot: float = 1.0,
    exponent: float = 1.0,
    scaling_factor: float = 1.0,
    k: int = 10,
) -> DataFrame:
    """Top-k of bm25 + boost·S(feature) — the ES rank_feature clause
    as an additive should-leg over a STATIC per-doc signal (pagerank,
    url_length, freshness buckets...).  ``features`` carries
    (conv_id, turn_idx, feature_col); docs missing from it contribute
    0, exactly like a missing rank_feature field.

    Like the decay scorer this RE-RANKS (the feature applies to every
    matched doc BEFORE the cut — a post-hoc boost of a bm25 top-k
    would miss docs whose boosted score overtakes); the feature join
    is a left join on the scored match set, the feature leg never
    widens the match set (rank_feature contributes no recall, only
    ranking — ES's contract).

    Scale note (shared with the decay scorer's attrs join): joining a
    corpus-sized feature table at query time shuffles it on the doc
    key when the match set is too big to broadcast (AQE picks).  At
    10^12 docs the right design is the dl precedent — denormalize
    hot static features into the packed payload at build time
    (functions/codec) or bucket the feature table by the doc key so
    the join is co-partitioned; the query-time join here is the
    flexible path for features that change independently of the
    index."""
    from ics_search_engine_spark.operators.packed_index import (
        decode_matched,
    )
    from ics_search_engine_spark.operators.query import (
        query_weights,
        score_all,
    )

    empty = spark.createDataFrame(
        [], "conv_id string, turn_idx int, score double"
    )
    do_stem = pidx.stats.get("stem", True)
    q_terms = sorted(set(tokenize(query, for_query=True, do_stem=do_stem)))
    if not q_terms:
        return empty
    term_df = pidx.df_for_terms(q_terms)
    weights = query_weights(query, term_df, pidx.n_docs, do_stem=do_stem)
    if not weights:
        return empty
    matched = pidx.index.filter(F.col("term").isin(q_terms))
    posts = decode_matched(matched)
    scored = score_all(spark, posts, weights, pidx.avgdl, ["doc_ord"])
    keyed = pidx.docmap.join(scored, "doc_ord").select(
        "conv_id", "turn_idx", "score"
    )
    s = rank_feature_col(
        F.col(feature_col), fn, pivot, exponent, scaling_factor
    )
    return (
        keyed.join(
            features.select("conv_id", "turn_idx", feature_col),
            ["conv_id", "turn_idx"],
            "left",
        )
        .select(
            "conv_id",
            "turn_idx",
            (F.col("score") + F.lit(float(boost)) * s).alias("score"),
        )
        .orderBy(F.desc("score"), "conv_id", "turn_idx")
        .limit(k)
    )


def bm25_topk_distance_feature(
    spark: SparkSession,
    pidx: PackedIndex,
    query: str,
    attrs: DataFrame,
    ts_col: str,
    origin: str,
    pivot_days: float,
    boost: float = 1.0,
    k: int = 10,
) -> DataFrame:
    """ES distance_feature query over a date field: bm25 +
    boost·pivot/(pivot + |ts − origin|) — the reciprocal-distance
    additive clause ES recommends over decay function_score for
    recency ranking (cheaper, and top-k-prunable in Lucene because
    the contribution is bounded by ``boost``).  Docs missing the
    field contribute 0, never excluded — the rank_feature convention.

    Differs from bm25_topk_decay: decay MULTIPLIES (or adds) a
    gauss/exp/linear curve with an offset plateau; distance_feature
    is always additive with the single reciprocal shape.  Same
    re-rank-before-cut plan, same attrs-join scale note
    (bm25_topk_rank_feature docstring)."""
    import datetime

    from ics_search_engine_spark.operators.packed_index import (
        decode_matched,
    )
    from ics_search_engine_spark.operators.query import (
        query_weights,
        score_all,
    )

    if pivot_days <= 0:
        raise ValueError(f"pivot_days must be positive, got {pivot_days}")
    empty = spark.createDataFrame(
        [], "conv_id string, turn_idx int, score double"
    )
    do_stem = pidx.stats.get("stem", True)
    q_terms = sorted(set(tokenize(query, for_query=True, do_stem=do_stem)))
    if not q_terms:
        return empty
    term_df = pidx.df_for_terms(q_terms)
    weights = query_weights(query, term_df, pidx.n_docs, do_stem=do_stem)
    if not weights:
        return empty
    matched = pidx.index.filter(F.col("term").isin(q_terms))
    posts = decode_matched(matched)
    scored = score_all(spark, posts, weights, pidx.avgdl, ["doc_ord"])
    keyed = pidx.docmap.join(scored, "doc_ord").select(
        "conv_id", "turn_idx", "score"
    )
    origin_sec = datetime.datetime.fromisoformat(origin).replace(
        tzinfo=datetime.timezone.utc
    ).timestamp()
    pivot_sec = pivot_days * 86400.0
    dist = F.abs(F.col(ts_col).cast("double") - F.lit(origin_sec))
    contrib = F.coalesce(
        F.lit(float(boost)) * (F.lit(pivot_sec) / (F.lit(pivot_sec) + dist)),
        F.lit(0.0),
    )
    return (
        keyed.join(
            attrs.select("conv_id", "turn_idx", ts_col),
            ["conv_id", "turn_idx"],
            "left",
        )
        .select(
            "conv_id", "turn_idx",
            (F.col("score") + contrib).alias("score"),
        )
        .orderBy(F.desc("score"), "conv_id", "turn_idx")
        .limit(k)
    )
