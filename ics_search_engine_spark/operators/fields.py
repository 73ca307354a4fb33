"""Fielded data model: per-field sub-indexes and ES multi_match.

The reference's document is a single text blob (title/body/headers are
WEIGHTS folded into one tf stream, /root/reference/indexer.py:84-101 —
the fields disappear at index time).  Every Lucene-class engine instead
keeps per-field inverted indexes with per-field statistics (df, dl,
avgdl) and combines them at QUERY time (`multi_match`).  This module
adds that model on transcripts: role/tool/text (or any string columns)
become searchable fields.

Architecture: one standard packed sub-index per field, built over the
SAME transcript rows.  doc_ord is a pure function of the (conv_id,
turn_idx) key set (operators/docmap.assign_doc_ordinals: global rank
ascending), and every field indexes every row (an empty field is a
dl=0 doc), so ordinals align across sub-indexes BY CONSTRUCTION — no
cross-field join key translation, and every existing single-field
surface (WAND, phrase, serving) works unchanged on a sub-index.

Per-field statistics: each sub-index's n_docs is the total row count
and avgdl_f = Σ dl_f / n_docs — this engine's established convention
(empty docs count in avgdl; single-field builds behave the same).
Lucene divides by docs-CONTAINING-the-field instead; the difference is
a per-field constant in the length norm, documented here rather than
silently diverging from the engine's own single-field scores.

Query-time combination (both modes share one decode pass per field —
term-IN pushdown into each sub-index, no corpus scan):

* ``best_fields`` — Lucene DisjunctionMaxQuery over per-field BM25:
  per (doc, field) score s_f = boost_f × Σ_t contrib_{f,t} (the
  engine's exact sorted-term fold), then
  score = max_f s_f + tie_breaker × (Σ_f s_f − max_f s_f).
* ``cross_fields`` — term-centric blending (the BlendedTermQuery
  idea): per term, blended df = max_f df_f(term) → one idf from the
  shared n_docs; per (doc, term), tfn computed per field with THAT
  field's avgdl, then max_f tfn (a term match counts once, through its
  best field — boosts scale tfn before the max); score =
  Σ_t qtf_t · idf_t · max_f (boost_f · tfn_{f,t}).  Exact formula
  pinned by tests/gate; Lucene's rewrite additionally adjusts df per
  (term, field), which needs index-wide term surgery — out of scope
  and documented.

Determinism: per-field folds are the engine's sorted-term fold;
cross-field combination folds a sort_array'd (field, value) list, so
every float add happens in a frozen order — bit-reproducible like
every other surface.

Scale: K fields = K metadata point-lookups + K matched-posting decodes
(each the single-field plan that survives 10^12 docs), one shuffle on
doc_ord to combine, TakeOrderedAndProject for the cut.  Fields are
O(schema), not O(corpus).
"""

from __future__ import annotations

import json
import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ics_search_engine_spark.operators.packed_index import (
    DEFAULT_RANGE_BITS,
    PackedIndex,
    build_packed_index,
    decode_matched,
)
from ics_search_engine_spark.operators.query import bm25_tfn_col, py_idf
from ics_search_engine_spark.textproc.tokenizer import tokenize


def build_fielded_index(
    spark: SparkSession,
    transcripts: DataFrame,
    out_dir: str,
    fields: list[str],
    range_bits: int = DEFAULT_RANGE_BITS,
    with_positions: bool = False,
    stem: bool = True,
) -> dict:
    """Build one packed sub-index per field under
    ``out_dir/field=<name>/`` + a fields.json manifest.  Every
    sub-index sees EVERY transcript row (null field → empty text →
    dl=0 doc), which is what keeps doc_ord aligned across fields."""
    manifest = {"fields": fields, "stem": stem}
    for field in fields:
        one = transcripts.select(
            "conv_id", "turn_idx",
            F.coalesce(F.col(field).cast("string"), F.lit("")).alias("text"),
        )
        build_packed_index(
            spark, one, os.path.join(out_dir, f"field={field}"),
            range_bits=range_bits, with_positions=with_positions, stem=stem,
        )
    with open(os.path.join(out_dir, "fields.json"), "w") as f:
        json.dump(manifest, f)
    return manifest


class FieldedIndex:
    """Handle on a fielded index: {field: PackedIndex} with aligned
    doc ordinals.  ``primary`` (the first field) donates the docmap
    for key resolution."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        with open(os.path.join(path, "fields.json")) as f:
            self.manifest = json.load(f)
        self.sub = {
            field: PackedIndex(spark, os.path.join(path, f"field={field}"))
            for field in self.manifest["fields"]
        }
        self.primary = self.sub[self.manifest["fields"][0]]

    @property
    def n_docs(self) -> int:
        return self.primary.n_docs


def _query_qtf(fidx: FieldedIndex, query: str) -> dict[str, int]:
    do_stem = fidx.manifest.get("stem", True)
    qtf: dict[str, int] = {}
    for t in tokenize(query, for_query=True, do_stem=do_stem):
        qtf[t] = qtf.get(t, 0) + 1
    return qtf


def _field_matches(
    fidx: FieldedIndex, field: str, terms: list[str]
) -> DataFrame:
    """One sub-index's matched postings (term, doc_ord, tf, dl) via the
    standard term-IN pushdown."""
    pidx = fidx.sub[field]
    return decode_matched(pidx.index.filter(F.col("term").isin(terms)))


def multi_match_topk(
    spark: SparkSession,
    fidx: FieldedIndex,
    query: str,
    boosts: dict[str, float],
    k: int = 10,
    mode: str = "best_fields",
    tie_breaker: float = 0.0,
) -> DataFrame:
    """ES multi_match over the fielded index → (conv_id, turn_idx,
    score) top-k; see module docstring for both modes' exact formulas.
    ``boosts``: field -> multiplier (fields absent from it are not
    searched)."""
    if mode not in ("best_fields", "cross_fields"):
        raise ValueError(f"unknown multi_match mode: {mode}")
    qtf = _query_qtf(fidx, query)
    empty = spark.createDataFrame(
        [], "conv_id string, turn_idx int, score double"
    )
    if not qtf:
        return empty
    terms = sorted(qtf)
    fields = sorted(boosts)

    # per-field df for the query terms (metadata point lookups)
    df_by_field = {
        f: fidx.sub[f].df_for_terms(terms) for f in fields
    }

    if mode == "best_fields":
        per_field = None
        for f in fields:
            dfs = df_by_field[f]
            weights = {
                t: qtf[t] * py_idf(fidx.sub[f].n_docs, dfs[t])
                for t in terms
                if dfs.get(t, 0) > 0
            }
            if not weights:
                continue
            w_df = spark.createDataFrame(
                [(t, w) for t, w in weights.items()], "term string, w double"
            )
            scored = (
                _field_matches(fidx, f, sorted(weights))
                .join(F.broadcast(w_df), "term")
                .withColumn("contrib", F.col("w") * bm25_tfn_col(fidx.sub[f].avgdl))
                .groupBy("doc_ord")
                .agg(
                    F.sort_array(
                        F.collect_list(F.struct("term", "contrib"))
                    ).alias("tc")
                )
                .select(
                    "doc_ord",
                    F.lit(f).alias("field"),
                    (
                        F.aggregate(
                            "tc", F.lit(0.0), lambda a, x: a + x["contrib"]
                        )
                        * F.lit(boosts[f])
                    ).alias("fs"),
                )
            )
            per_field = scored if per_field is None else per_field.unionAll(
                scored
            )
        if per_field is None:
            return empty
        combined = (
            per_field.groupBy("doc_ord")
            .agg(
                F.sort_array(F.collect_list(F.struct("field", "fs"))).alias(
                    "ff"
                )
            )
            .select(
                "doc_ord",
                F.aggregate(
                    "ff", F.lit(0.0), lambda a, x: a + x["fs"]
                ).alias("total"),
                F.array_max(F.transform("ff", lambda x: x["fs"])).alias(
                    "best"
                ),
            )
            .select(
                "doc_ord",
                (
                    F.col("best")
                    + F.lit(tie_breaker) * (F.col("total") - F.col("best"))
                ).alias("score"),
            )
        )
    else:  # cross_fields
        blended = {
            t: max(df_by_field[f].get(t, 0) for f in fields) for t in terms
        }
        weights = {
            t: qtf[t] * py_idf(fidx.n_docs, blended[t])
            for t in terms
            if blended[t] > 0
        }
        if not weights:
            return empty
        w_df = spark.createDataFrame(
            [(t, w) for t, w in weights.items()], "term string, w double"
        )
        per_field = None
        for f in fields:
            part = (
                _field_matches(fidx, f, sorted(weights))
                .select(
                    "term",
                    "doc_ord",
                    (F.lit(boosts[f]) * bm25_tfn_col(fidx.sub[f].avgdl)).alias(
                        "btfn"
                    ),
                )
            )
            per_field = part if per_field is None else per_field.unionAll(part)
        combined = (
            per_field.groupBy("doc_ord", "term")
            .agg(F.max("btfn").alias("btfn"))  # term matches via best field
            .join(F.broadcast(w_df), "term")
            .withColumn("contrib", F.col("w") * F.col("btfn"))
            .groupBy("doc_ord")
            .agg(
                F.sort_array(F.collect_list(F.struct("term", "contrib"))).alias(
                    "tc"
                )
            )
            .select(
                "doc_ord",
                F.aggregate(
                    "tc", F.lit(0.0), lambda a, x: a + x["contrib"]
                ).alias("score"),
            )
        )

    topk = combined.orderBy(F.desc("score"), F.asc("doc_ord")).limit(k)
    dm = fidx.primary.docmap.select("doc_ord", "conv_id", "turn_idx")
    return (
        dm.join(F.broadcast(topk), "doc_ord")
        .select("conv_id", "turn_idx", "score")
        .orderBy(F.desc("score"), F.asc("conv_id"), F.asc("turn_idx"))
    )


def combined_fields_topk(
    spark: SparkSession,
    fidx: FieldedIndex,
    query: str,
    weights: dict[str, float],
    k: int = 10,
) -> DataFrame:
    """ES combined_fields (Lucene CombinedFieldQuery / BM25F): the
    fields merge into ONE pseudo-field BEFORE saturation —
    tf_c(t,d) = Σ_f w_f·tf_f(t,d), dl_c(d) = Σ_f w_f·dl_f(d),
    avgdl_c = Σ_f w_f·avgdl_f, and BM25 runs once on the combined
    quantities.  Differs from both multi_match modes: best_fields
    saturates per field then takes max, cross_fields saturates per
    field then blends idf — here a term occurring weakly in SEVERAL
    fields saturates like one strong occurrence, the BM25F idea.

    Contract notes (mirrored by the gate):
    * pseudo-df(t) = max_f df_f(t) — Lucene's CombinedFieldQuery
      choice (the union count is not available from per-field stats);
    * per-field dl comes from each sub-index's docmap (aligned
      ordinals BY CONSTRUCTION), so docs matching a term in one field
      still carry every field's length in dl_c;
    * weights must be ≥ 1 per ES validation (values < 1 would let a
      multi-field occurrence saturate SLOWER than a single-field one).

    Shape: |fields| matched-postings legs union → one (term, doc)
    combine → docmap dl joins (doc_ord-keyed, the established docmap
    join) → deterministic per-doc fold → TakeOrderedAndProject."""
    for f, w in weights.items():
        if w < 1.0:
            raise ValueError(
                f"combined_fields weight for {f!r} must be >= 1 (ES "
                f"validation), got {w}"
            )
    qtf = _query_qtf(fidx, query)
    empty = spark.createDataFrame(
        [], "conv_id string, turn_idx int, score double"
    )
    if not qtf:
        return empty
    terms = sorted(qtf)
    fields = sorted(weights)
    df_by_field = {f: fidx.sub[f].df_for_terms(terms) for f in fields}
    df_max = {
        t: max(df_by_field[f].get(t, 0) for f in fields) for t in terms
    }
    w_term = {
        t: qtf[t] * py_idf(fidx.n_docs, df_max[t])
        for t in terms
        if df_max[t] > 0
    }
    if not w_term:
        return empty
    avgdl_c = 0.0
    for f in fields:
        avgdl_c += weights[f] * fidx.sub[f].avgdl

    legs = None
    for f in fields:
        part = _field_matches(fidx, f, sorted(w_term)).select(
            "term",
            "doc_ord",
            (F.lit(float(weights[f])) * F.col("tf").cast("double"))
            .alias("wtf"),
        )
        legs = part if legs is None else legs.unionByName(part)
    tfc = legs.groupBy("term", "doc_ord").agg(F.sum("wtf").alias("tfc"))

    dlc = None
    for f in fields:
        d = fidx.sub[f].docmap.select(
            "doc_ord",
            (F.lit(float(weights[f])) * F.col("dl").cast("double"))
            .alias(f"_dl_{f}"),
        )
        dlc = d if dlc is None else dlc.join(d, "doc_ord")
    dl_sum = F.lit(0.0)
    for f in fields:
        dl_sum = dl_sum + F.col(f"_dl_{f}")
    dlc = dlc.select("doc_ord", dl_sum.alias("dlc"))

    w_df = spark.createDataFrame(
        [(t, w) for t, w in sorted(w_term.items())],
        "term string, w double",
    )
    combined = (
        tfc.join(dlc, "doc_ord")
        .join(F.broadcast(w_df), "term")
        .withColumn(
            "contrib",
            F.col("w")
            * bm25_tfn_col(avgdl_c, tf=F.col("tfc"), dl=F.col("dlc")),
        )
        .groupBy("doc_ord")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("term", "contrib"))
            ).alias("tc")
        )
        .select(
            "doc_ord",
            F.aggregate(
                "tc", F.lit(0.0), lambda a, x: a + x["contrib"]
            ).alias("score"),
        )
    )
    topk = combined.orderBy(F.desc("score"), F.asc("doc_ord")).limit(k)
    dm = fidx.primary.docmap.select("doc_ord", "conv_id", "turn_idx")
    return (
        dm.join(F.broadcast(topk), "doc_ord")
        .select("conv_id", "turn_idx", "score")
        .orderBy(F.desc("score"), F.asc("conv_id"), F.asc("turn_idx"))
    )


def field_caps(fidx: FieldedIndex) -> DataFrame:
    """The ES ``_field_caps`` API over a fielded index: per-field
    capability/statistics row →

        (field, searchable, n_docs, sum_dl, n_terms)

    ``searchable`` is always true here (every built sub-index is
    queryable); n_docs/sum_dl come from each sub-index's stats.json
    (zero jobs), n_terms is one metadata-only count over the field's
    term dictionary (the payload column is never read).  Fields are
    O(schema), so the result is a handful of rows regardless of corpus
    size — ES's _field_caps is the same shape (it reads per-field
    metadata from segment headers, not postings)."""
    rows = []
    for field in fidx.manifest["fields"]:
        sub = fidx.sub[field]
        n_terms = sub.term_stats.count()
        rows.append(
            (
                field,
                True,
                int(sub.stats["n_docs"]),
                int(sub.stats["sum_dl"]),
                int(n_terms),
            )
        )
    return fidx.spark.createDataFrame(
        rows,
        "field string, searchable boolean, n_docs long, sum_dl long, "
        "n_terms long",
    ).orderBy("field")
