"""Top-k BM25 query path over a postings DataFrame.

Replaces the reference's term-at-a-time scoring loop
(/root/reference/search.py:132-202) with one declarative plan:

    query terms (driver) -> broadcast join on term [J2]
        -> BM25 column expression [A3-analog]
        -> per-doc fold over a SORTED (term, contrib) list [A6]
        -> orderBy desc limit k  (TakeOrderedAndProject) [T1]

Determinism (SURVEY.md §7 "rank-identical floating-point scores"):
* per-(term,doc) contribution is a pure double expression whose
  operation order matches oracle.bm25.bm25_contribution token for
  token, so each contribution is bit-identical to the oracle;
* idf and qtf*idf weights are computed DRIVER-SIDE in Python (query
  term count is tiny) — JVM ln() never runs, sidestepping libm
  last-ulp differences;
* the per-doc sum folds a sort_array'd (term, contrib) list in
  ascending term order — the same order the oracle accumulates —
  so the final score is bit-identical, not just approximately equal;
* tie-break (score desc, conv_id asc, turn_idx asc) matches the
  oracle and replaces the reference's unstable plain sort
  (/root/reference/search.py:200-202).

Scale notes: the broadcast side is the (≤ tens of rows) query-term
weight table, never the postings; scoring shuffles only MATCHED
postings, grouped by doc; top-k runs as TakeOrderedAndProject (per-
partition heaps + driver merge), never a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from oracle.bm25 import K1, B, idf as py_idf
from ics_search_engine_spark.operators.index_build import DOC_KEY
from ics_search_engine_spark.textproc.tokenizer import tokenize

def query_weights(query: str, term_df: dict[str, int], n_docs: int,
                  do_stem: bool = True) -> dict[str, float]:
    """term -> qtf * idf, computed in Python (bit-matches oracle)."""
    q_tokens = tokenize(query, for_query=True, do_stem=do_stem)
    qtf: dict[str, int] = {}
    for t in q_tokens:
        qtf[t] = qtf.get(t, 0) + 1
    return {
        t: qtf[t] * py_idf(n_docs, term_df[t])
        for t in qtf
        if term_df.get(t, 0) > 0
    }


def idf_weights(
    qtf: dict[str, int], term_df: dict[str, int], n_docs: int
) -> dict[str, float]:
    """term -> qtf × idf for terms the corpus has seen — the one
    weight formula every query surface (packed/wildcard/fuzzy/MLT/
    qlang, Spark and serving tiers) shares, so the tested bit-parity
    contract has a single definition."""
    return {
        t: qtf[t] * py_idf(n_docs, term_df[t])
        for t in qtf
        if term_df.get(t, 0) > 0
    }


def resolve_topk_keys(pidx, topk: DataFrame) -> DataFrame:
    """(doc_ord, score) winners (≤ k rows, broadcast) → (conv_id,
    turn_idx, score) in presentation order — the shared resolve tail of
    every packed top-k surface."""
    return (
        pidx.docmap.join(F.broadcast(topk), "doc_ord")
        .select("conv_id", "turn_idx", "score")
        .orderBy(F.desc("score"), "conv_id", "turn_idx")
    )


def bm25_tfn_col(
    avgdl: float,
    tf: F.Column | None = None,
    dl: F.Column | None = None,
    k1: float | None = None,
    b: float | None = None,
) -> F.Column:
    """The BM25 saturation factor tf*(k1+1) / (tf + k1*((1-b) +
    (b*dl)/avgdl)) with the exact oracle operation order (oracle/bm25.py
    bm25_contribution) — the ONE definition every weight-times-tfn
    surface (single-field scoring, fielded multi_match, boolean-query
    leaves) multiplies, so bit-exactness has a single source of truth.
    ``tf``/``dl`` default to the standard posting columns; pass
    expressions (e.g. a phrase count) to saturate something else.
    ``k1``/``b`` default to the reference constants; passing either is
    the ES similarity-settings tuning knob (derived constants combined
    in Python so the literals carry exact double bits)."""
    k1v = K1 if k1 is None else float(k1)
    bv = B if b is None else float(b)
    tfd = (F.col("tf") if tf is None else tf).cast("double")
    dld = (F.col("dl") if dl is None else dl).cast("double")
    return (tfd * F.lit(k1v + 1.0)) / (
        tfd
        + F.lit(k1v) * (F.lit(1.0 - bv) + (F.lit(bv) * dld) / F.lit(avgdl))
    )


def bm25_contrib_col(
    avgdl: float, k1: float | None = None, b: float | None = None
) -> F.Column:
    """w * tfn — the full per-posting BM25 contribution."""
    return F.col("w") * bm25_tfn_col(avgdl, k1=k1, b=b)


def bm25_topk(
    spark: SparkSession,
    postings_df: DataFrame,
    query: str,
    n_docs: int,
    avgdl: float,
    k: int = 10,
    term_df: dict[str, int] | None = None,
) -> DataFrame:
    """Top-k BM25 → DataFrame(conv_id, turn_idx, score) ordered by
    (score desc, conv_id, turn_idx).

    ``term_df``: pre-looked-up document frequencies for the query terms
    (from the index's term_stats table).  If None, computed from
    ``postings_df`` (one narrow agg over the matched terms only —
    filter pushes to the scan).
    """
    q_terms = sorted(set(tokenize(query, for_query=True)))
    empty = spark.createDataFrame(
        [], "conv_id string, turn_idx int, score double"
    )
    if not q_terms:
        return empty

    matched = postings_df.filter(F.col("term").isin(q_terms))

    if term_df is None:
        term_df = {
            r["term"]: r["df"]
            for r in matched.groupBy("term").agg(F.count("*").alias("df")).collect()
        }

    weights = query_weights(query, term_df, n_docs)
    if not weights:
        return empty

    return score_topk(spark, matched, weights, avgdl, DOC_KEY, k)


def score_topk(
    spark: SparkSession,
    matched: DataFrame,
    weights: dict[str, float],
    avgdl: float,
    key_cols: list[str],
    k: int,
    require_all: int | None = None,
    min_match: int | None = None,
) -> DataFrame:
    """Shared scoring core: matched postings (term, *key_cols, tf, dl)
    → top-k (key_cols..., score).  Deterministic sorted-term fold; see
    module docstring.

    ``require_all=n``: posting-list INTERSECTION semantics — keep only
    docs matched by exactly n distinct terms (postings are unique per
    (term, doc), so the fold list's size IS the matched-term count).
    The reference instead unions postings and boosts by match fraction
    (SURVEY.md §2.3 note; /root/reference/search.py:148-162).

    ``min_match=m``: minimum-should-match — keep docs matched by AT
    LEAST m distinct terms (between OR and AND).  Mutually exclusive
    with ``require_all``."""
    scored = score_all(
        spark, matched, weights, avgdl, key_cols, require_all, min_match
    )
    return scored.orderBy(F.desc("score"), *[F.asc(c) for c in key_cols]).limit(k)


def score_all(
    spark: SparkSession,
    matched: DataFrame,
    weights: dict[str, float],
    avgdl: float,
    key_cols: list[str],
    require_all: int | None = None,
    min_match: int | None = None,
    with_count: bool = False,
    k1: float | None = None,
    b: float | None = None,
) -> DataFrame:
    """Every matched doc's full score (no top-k truncation) —
    (key_cols..., score[, n_matched]).  The deterministic sorted-term
    fold shared by score_topk and the conversation-grain rollup, which
    must aggregate over ALL matching turns before any limit can be
    applied.  ``with_count=True`` also emits the matched-term count
    (the fold list's size — postings are unique per (term, doc)), so
    callers needing both (terms_set) never run a second decode pass."""
    if require_all is not None and min_match is not None:
        raise ValueError("require_all and min_match are mutually exclusive")
    w_df = spark.createDataFrame(
        [(t, w) for t, w in weights.items()], "term string, w double"
    )
    scored = (
        matched.join(F.broadcast(w_df), "term")
        .withColumn("contrib", bm25_contrib_col(avgdl, k1=k1, b=b))
        .groupBy(*key_cols)
        .agg(
            F.sort_array(F.collect_list(F.struct("term", "contrib"))).alias("tc")
        )
    )
    if require_all is not None:
        scored = scored.filter(F.size("tc") == require_all)
    elif min_match is not None:
        scored = scored.filter(F.size("tc") >= min_match)
    scored = scored.withColumn(
        "score",
        F.aggregate("tc", F.lit(0.0), lambda acc, x: acc + x["contrib"]),
    )
    out_cols = [*key_cols, "score"]
    if with_count:
        scored = scored.withColumn(
            "n_matched", F.size("tc").cast("int")
        )
        out_cols.append("n_matched")
    return scored.select(*out_cols)


def bm25_topk_filtered(
    spark: SparkSession,
    postings_df: DataFrame,
    query: str,
    n_docs: int,
    avgdl: float,
    allowed_docs: DataFrame,
    k: int = 10,
    term_df: dict[str, int] | None = None,
) -> DataFrame:
    """Filtered top-k BM25 (the filter-query every fielded search engine
    needs; the reference has no doc-attribute filtering at all): rank
    only turns present in ``allowed_docs``, a DataFrame carrying the
    DOC_KEY columns — e.g. the transcripts table filtered by a
    role/tool/ts predicate:

        bm25_topk_filtered(spark, posts, q, n, avgdl,
                           transcripts.filter("role = 'assistant'"))

    Semantics (Lucene filter-query convention): idf / n_docs / avgdl
    stay CORPUS-GLOBAL — the predicate restricts which documents may
    appear, it does not re-derive collection statistics — so a
    surviving doc's score is bit-identical to its unfiltered score and
    scores are comparable across differently-filtered queries.

    Plan shape at scale: the caller's predicate lives in
    ``allowed_docs``'s own scan (predicate pushdown + key-column
    pruning); matched postings LEFT SEMI join the allowed keys — a
    selective filter broadcasts under AQE, otherwise one hash exchange
    keyed on the doc key.  Stats (term_df) come from the UNfiltered
    matched postings, same as bm25_topk.
    """
    q_terms = sorted(set(tokenize(query, for_query=True)))
    empty = spark.createDataFrame(
        [], "conv_id string, turn_idx int, score double"
    )
    if not q_terms:
        return empty
    matched = postings_df.filter(F.col("term").isin(q_terms))
    if term_df is None:
        term_df = {
            r["term"]: r["df"]
            for r in matched.groupBy("term")
            .agg(F.count("*").alias("df"))
            .collect()
        }
    weights = query_weights(query, term_df, n_docs)
    if not weights:
        return empty
    keys = allowed_docs.select(*DOC_KEY)
    matched_f = matched.join(keys, DOC_KEY, "left_semi")
    return score_topk(spark, matched_f, weights, avgdl, DOC_KEY, k)


def bm25_topk_collapse(
    spark: SparkSession,
    postings_df: DataFrame,
    query: str,
    n_docs: int,
    avgdl: float,
    k: int = 10,
    term_df: dict[str, int] | None = None,
) -> DataFrame:
    """Field-collapsed top-k BM25: at most ONE turn per conversation —
    each conversation represented by its best-scoring turn (exact-score
    ties inside a conversation break on turn_idx asc), conversations
    ranked by that representative's score (ties: conv_id asc).  Scores
    are bit-identical to the uncollapsed ranking; collapsing only
    filters which turns appear (the SERP-diversity operator the
    reference lacks — its result list can be one page's near-duplicates,
    /root/reference/todo.md:96-101 fights that with dedup instead).

    Plan shape: score_all's grouped fold (one shuffle on the doc key)
    → row_number window PARTITIONED BY conv_id (second hash exchange on
    conv_id, no global sort) → filter rn=1 → TakeOrderedAndProject k.
    At 10^12 turns both exchanges are plain hash partitions; the window
    state per key is one row.  The packed-engine form
    (operators/convs.bm25_topk_collapse_packed) avoids even those by
    folding inside doc-range shards."""
    from pyspark.sql import Window

    q_terms = sorted(set(tokenize(query, for_query=True)))
    empty = spark.createDataFrame(
        [], "conv_id string, turn_idx int, score double"
    )
    if not q_terms:
        return empty
    matched = postings_df.filter(F.col("term").isin(q_terms))
    if term_df is None:
        term_df = {
            r["term"]: r["df"]
            for r in matched.groupBy("term")
            .agg(F.count("*").alias("df"))
            .collect()
        }
    weights = query_weights(query, term_df, n_docs)
    if not weights:
        return empty
    scored = score_all(spark, matched, weights, avgdl, DOC_KEY)
    w = Window.partitionBy("conv_id").orderBy(
        F.desc("score"), F.asc("turn_idx")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
        .orderBy(F.desc("score"), "conv_id", "turn_idx")
        .limit(k)
    )


CONV_AGGS = {"max": F.max, "sum": F.sum}


def bm25_topk_convs(
    spark: SparkSession,
    postings_df: DataFrame,
    query: str,
    n_docs: int,
    avgdl: float,
    k: int = 10,
    agg: str = "max",
    term_df: dict[str, int] | None = None,
) -> DataFrame:
    """Conversation-grain ranking: top-k CONVERSATIONS by an aggregate
    of their turns' BM25 scores → (conv_id, score, matched_turns).

    The natural product query for a transcript corpus — "which
    conversation matches" rather than "which turn".  ``agg='max'``
    ranks by best turn (order-free, bit-exact across engines);
    ``agg='sum'`` by total matching mass (float addition order across
    turns is Spark's aggregation order — compare rounded, like every
    cross-engine float sum).  ``matched_turns`` rides the same agg as
    an exact integer.

    Scale shape: per-turn scores never truncate before the rollup
    (any turn contributes), but the conv aggregation is an ordinary
    hash agg with map-side partial aggregation — turns of a
    conversation are adjacent in the scan (doc ordinals sort by
    (conv_id, turn_idx)), so partials collapse before the shuffle and
    the exchange carries ~|matched convs| rows, then
    TakeOrderedAndProject.  No driver-side loops."""
    if agg not in CONV_AGGS:
        raise ValueError(f"unknown conv agg {agg!r}")
    q_terms = sorted(set(tokenize(query, for_query=True)))
    empty = spark.createDataFrame(
        [], "conv_id string, score double, matched_turns long"
    )
    if not q_terms:
        return empty
    matched = postings_df.filter(F.col("term").isin(q_terms))
    if term_df is None:
        term_df = {
            r["term"]: r["df"]
            for r in matched.groupBy("term")
            .agg(F.count("*").alias("df"))
            .collect()
        }
    weights = query_weights(query, term_df, n_docs)
    if not weights:
        return empty
    turns = score_all(spark, matched, weights, avgdl, DOC_KEY)
    return (
        turns.groupBy("conv_id")
        .agg(
            CONV_AGGS[agg]("score").alias("score"),
            F.count("*").alias("matched_turns"),
        )
        .orderBy(F.desc("score"), F.asc("conv_id"))
        .limit(k)
    )


def bm25_topk_conjunctive(
    spark: SparkSession, pidx, query: str, k: int = 10
) -> DataFrame:
    """Top-k BM25 with AND semantics: only documents containing EVERY
    query term rank (posting-list intersection as a groupBy-count
    filter — the n-way join the reference lacks, SURVEY.md §2.3).  A
    query term absent from the index empties the result (AND of an
    empty posting list).  Scores are bit-identical to the OR path for
    the surviving docs (same sorted-term fold over the same matched
    contributions)."""
    from ics_search_engine_spark.operators.packed_index import decode_matched
    from ics_search_engine_spark.textproc.tokenizer import tokenize as _tok

    do_stem = pidx.stats.get("stem", True)
    q_terms = sorted(set(_tok(query, for_query=True, do_stem=do_stem)))
    empty = spark.createDataFrame(
        [], "conv_id string, turn_idx int, score double"
    )
    if not q_terms:
        return empty
    term_df = pidx.df_for_terms(q_terms)
    weights = query_weights(query, term_df, pidx.n_docs, do_stem=do_stem)
    if len(weights) < len(q_terms):  # some term matches nothing → AND fails
        return empty

    matched = pidx.index.filter(F.col("term").isin(q_terms))
    posts = decode_matched(matched)
    topk = score_topk(
        spark, posts, weights, pidx.avgdl, ["doc_ord"], k,
        require_all=len(weights),
    )
    resolved = pidx.docmap.join(F.broadcast(topk), "doc_ord").select(
        "conv_id", "turn_idx", "score"
    )
    return resolved.orderBy(F.desc("score"), "conv_id", "turn_idx")


def bm25_topk_msm(
    spark: SparkSession, pidx, query: str, k: int = 10, min_match: int = 2
) -> DataFrame:
    """Top-k BM25 with minimum-should-match semantics (Lucene's
    ``minimum_should_match``, the knob between pure OR and AND the
    reference lacks): only documents containing AT LEAST ``min_match``
    distinct query terms rank.  A query term absent from the index
    simply cannot count toward the minimum (it does NOT empty the
    result the way conjunctive does); if fewer than ``min_match``
    query terms exist in the index at all, no doc can qualify.
    Survivors' scores are bit-identical to the OR path (same
    sorted-term fold over the same matched contributions).

    The θ-pruned form is ``wand.bm25_topk_wand(..., min_match=m)`` —
    tested identical."""
    from ics_search_engine_spark.operators.packed_index import decode_matched
    from ics_search_engine_spark.textproc.tokenizer import tokenize as _tok

    do_stem = pidx.stats.get("stem", True)
    q_terms = sorted(set(_tok(query, for_query=True, do_stem=do_stem)))
    empty = spark.createDataFrame(
        [], "conv_id string, turn_idx int, score double"
    )
    if not q_terms:
        return empty
    term_df = pidx.df_for_terms(q_terms)
    weights = query_weights(query, term_df, pidx.n_docs, do_stem=do_stem)
    if min_match > 1 and len(weights) < min_match:
        return empty

    matched = pidx.index.filter(F.col("term").isin(q_terms))
    posts = decode_matched(matched)
    topk = score_topk(
        spark, posts, weights, pidx.avgdl, ["doc_ord"], k,
        min_match=min_match if min_match > 1 else None,
    )
    resolved = pidx.docmap.join(F.broadcast(topk), "doc_ord").select(
        "conv_id", "turn_idx", "score"
    )
    return resolved.orderBy(F.desc("score"), "conv_id", "turn_idx")


def bm25_topk_after(
    spark: SparkSession,
    pidx,
    query: str,
    after: tuple[float, str, int],
    k: int = 10,
) -> DataFrame:
    """Deep pagination via a search-after cursor (the Elasticsearch
    ``search_after`` pattern; from+size re-fetch is O(page_depth)):
    return the next ``k`` results strictly AFTER ``after = (score,
    conv_id, turn_idx)`` — the last row of the previous page — in the
    engine's total order (score desc, conv_id asc, turn_idx asc).

    Cursor correctness depends on the engine's bit-identical scores:
    the cursor score from any tier (WAND, serving, exhaustive) is the
    same double here, so the tuple predicate
    ``score < s  OR  (score == s AND doc_ord > ord(key))`` resumes
    exactly where the page ended, with no skipped or repeated docs —
    even mid-tie.  Stateless: no server-side scroll context to hold,
    so any executor/page can serve any cursor.

    Plan shape: the cursor predicate is one comparison on the scored
    rows BEFORE the top-k, so the job stays TakeOrderedAndProject —
    page N costs the same as page 1 (score-all + filter + heap-k),
    never a LIMIT N*k + driver skip."""
    from ics_search_engine_spark.operators.packed_index import decode_matched
    from ics_search_engine_spark.textproc.tokenizer import tokenize as _tok

    do_stem = pidx.stats.get("stem", True)
    q_terms = sorted(set(_tok(query, for_query=True, do_stem=do_stem)))
    empty = spark.createDataFrame(
        [], "conv_id string, turn_idx int, score double"
    )
    if not q_terms:
        return empty
    term_df = pidx.df_for_terms(q_terms)
    weights = query_weights(query, term_df, pidx.n_docs, do_stem=do_stem)
    if not weights:
        return empty

    s_after, conv_after, turn_after = after
    ord_rows = pidx.docmap.filter(
        (F.col("conv_id") == conv_after)
        & (F.col("turn_idx") == int(turn_after))
    ).select("doc_ord").collect()
    if not ord_rows:
        raise ValueError(f"cursor doc {(conv_after, turn_after)} not in index")
    ord_after = ord_rows[0]["doc_ord"]

    matched = pidx.index.filter(F.col("term").isin(q_terms))
    posts = decode_matched(matched)
    scored = score_all(spark, posts, weights, pidx.avgdl, ["doc_ord"])
    nxt = (
        scored.filter(
            (F.col("score") < float(s_after))
            | (
                (F.col("score") == float(s_after))
                & (F.col("doc_ord") > int(ord_after))
            )
        )
        .orderBy(F.desc("score"), F.asc("doc_ord"))
        .limit(k)
    )
    return resolve_topk_keys(pidx, nxt)


def bm25_topk_multi(
    spark: SparkSession,
    pidx,
    queries: dict[str, str],
    k: int = 10,
    resolve: str = "join",
) -> DataFrame:
    """Batched multi-query top-k: ALL queries scored in one Spark job →
    (query_id, conv_id, turn_idx, score, rank).  Amortizes job overhead
    across a query set (the reference replays its REPL loop per query,
    /root/reference/search.py:205-227).

    Per-query results are identical to bm25_topk_packed (tested).

    Physical plan: the union of all queries' terms is fetched once
    (term IN pushdown), grouped by shard_id, and ONE applyInPandas
    scores every query against the shard's decoded postings — shards
    are doc-range-aligned, so each shard independently produces its
    per-query local top-k (see score_shards_topk for the geometry
    argument).  The per-(query, shard) winners — at most |queries| x k
    rows per shard — then merge DISTRIBUTED: row_number() partitioned
    by query_id over the winner union (one small shuffle of
    ≤ |queries| x k x touched-shards rows), and docIDs resolve via a
    broadcast join against the docmap.  The driver never holds more
    than the final |queries| x k rows — at 10^12 docs (~240k ranges) a
    driver-side merge of per-shard winners would be tens of millions of
    rows per 100-query batch; this path keeps that in the cluster.  No
    per-posting shuffle, no row_number over a query's whole match set.

    ``resolve``: how winner doc_ords become (conv_id, turn_idx).
    "join" (default) broadcast-joins against the docmap — fully
    distributed, but the probe side scans the docmap's 3 columns once
    per batch (amortized across the queries).  "pushdown" collects the
    ≤ |queries| x k winners (the caller was about to collect them
    anyway) and point-reads the docmap with a ``doc_ord IN (...)``
    predicate — parquet row-group min/max skip everything else, the
    right trade when the docmap itself is 10^12 rows.  Results are
    identical (tested).
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import Window

    from ics_search_engine_spark.functions.codec import unpack_postings
    from ics_search_engine_spark.operators.packed_index import _tfn
    from ics_search_engine_spark.textproc.tokenizer import tokenize as _tok

    do_stem = pidx.stats.get("stem", True)
    empty = spark.createDataFrame(
        [],
        "query_id string, conv_id string, turn_idx int, score double, rank int",
    )
    # ONE df lookup for the union of all queries' terms (zero jobs on
    # a cached index, one pushed-down job otherwise) — never a
    # per-query metadata job
    q_tokens = {
        qid: sorted(set(_tok(qtext, for_query=True, do_stem=do_stem)))
        for qid, qtext in queries.items()
    }
    union_terms = sorted({t for ts in q_tokens.values() for t in ts})
    if not union_terms:
        return empty
    term_df = pidx.df_for_terms(union_terms)

    q_weights: dict[str, list[tuple[str, float]]] = {}
    all_terms: set[str] = set()
    for qid, qtext in queries.items():
        if not q_tokens[qid]:
            continue
        w = query_weights(qtext, term_df, pidx.n_docs, do_stem=do_stem)
        if w:
            q_weights[qid] = sorted(w.items())
            all_terms.update(w)
    if not q_weights:
        return empty

    avgdl = pidx.avgdl
    range_bits = pidx.stats["range_bits"]
    size = 1 << range_bits
    qw_items = sorted(q_weights.items())

    def score_group(pdf: pd.DataFrame) -> pd.DataFrame:
        base = int(pdf["shard_id"].iloc[0]) << range_bits
        decoded: dict = {}
        for t, p in zip(pdf["term"], pdf["payload"]):
            d, tf, dl, _ = unpack_postings(bytes(p), with_positions=False)
            decoded[t] = (d.astype(np.int64) - base, _tfn(tf, dl, avgdl))
        out_q, out_o, out_s = [], [], []
        scores = np.zeros(size, dtype=np.float64)
        for qid, wts in qw_items:
            scores[:] = 0.0
            touched = np.zeros(size, dtype=bool)
            for t, w in wts:  # ascending term order -> oracle bit-parity
                hit = decoded.get(t)
                if hit is None:
                    continue
                idx, tfn = hit
                scores[idx] += w * tfn
                touched[idx] = True
            ti = np.flatnonzero(touched)
            if ti.size == 0:
                continue
            order = np.lexsort((ti, -scores[ti]))[:k]
            sel = ti[order]
            out_q.extend([qid] * len(sel))
            out_o.extend((sel + base).tolist())
            out_s.extend(scores[sel].tolist())
        return pd.DataFrame(
            {"query_id": out_q, "doc_ord": out_o, "score": out_s}
        )

    matched = pidx.index.filter(F.col("term").isin(sorted(all_terms)))
    winners = (
        matched.select("term", "shard_id", "payload")
        .groupBy("shard_id")
        .applyInPandas(score_group, "query_id string, doc_ord long, score double")
    )
    # distributed per-query merge: each shard contributed ≤ k rows per
    # query, so this window shuffles ≤ |queries| x k x shards rows —
    # never a query's whole match set
    rank_w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("doc_ord")
    )
    topk = winners.withColumn(
        "rank", F.row_number().over(rank_w)
    ).filter(F.col("rank") <= k)
    if resolve == "pushdown":
        rows = topk.collect()  # bounded: ≤ |queries| x k
        if not rows:
            return empty
        if pidx._docmap_local is not None:
            # serving mode: zero-job resolution from the driver map
            dm = pidx._docmap_local
        else:
            ords = sorted({int(r["doc_ord"]) for r in rows})
            dm = {
                r["doc_ord"]: (r["conv_id"], r["turn_idx"])
                for r in pidx.docmap.filter(F.col("doc_ord").isin(ords))
                .select("doc_ord", "conv_id", "turn_idx").collect()
            }
        final = sorted(
            (
                (r["query_id"], *dm[int(r["doc_ord"])],
                 float(r["score"]), int(r["rank"]))
                for r in rows
            ),
            key=lambda t: (t[0], t[4]),
        )
        return spark.createDataFrame(
            final,
            "query_id string, conv_id string, turn_idx int, "
            "score double, rank int",
        )
    # resolve the ≤ |queries| x k winners against the docmap with a
    # broadcast join (fully distributed; scans the docmap's 3 columns
    # once per batch)
    return (
        pidx.docmap.join(F.broadcast(topk), "doc_ord")
        .select("query_id", "conv_id", "turn_idx", "score", "rank")
        .orderBy("query_id", "rank")
    )


def bm25_topk_boosted(
    spark: SparkSession,
    postings_df: DataFrame,
    boosts: DataFrame,
    query: str,
    n_docs: int,
    avgdl: float,
    k: int = 10,
    term_df: dict[str, int] | None = None,
) -> DataFrame:
    """Top-k BM25 with per-document boosts — the transcript analog of
    the reference's tag-importance weighting (A3: weighted_tf =
    tf × (1 + importance), /root/reference/components/
    index_manager.py:48, token_processor.py:26-31): a turn's role
    (or any doc attribute) scales its term frequencies before
    saturation, so boosted turns rank higher WITHOUT touching global
    stats (df, N, avgdl stay unweighted, like the reference's).

    ``boosts``: DataFrame (conv_id, turn_idx, boost:double); missing
    docs boost 0.0 (plain tf).  The join is doc-keyed (doc-count-sized
    both sides, hash join); everything after is the unchanged
    deterministic scoring fold.
    """
    q_terms = sorted(set(tokenize(query, for_query=True)))
    empty = spark.createDataFrame(
        [], "conv_id string, turn_idx int, score double"
    )
    if not q_terms:
        return empty
    matched = postings_df.filter(F.col("term").isin(q_terms))
    if term_df is None:
        term_df = {
            r["term"]: r["df"]
            for r in matched.groupBy("term")
            .agg(F.count("*").alias("df"))
            .collect()
        }
    weights = query_weights(query, term_df, n_docs)
    if not weights:
        return empty
    boosted = (
        matched.join(boosts, DOC_KEY, "left")
        .withColumn(
            "tf",
            F.col("tf").cast("double")
            * (F.lit(1.0) + F.coalesce(F.col("boost"), F.lit(0.0))),
        )
        .drop("boost")
    )
    return score_topk(spark, boosted, weights, avgdl, DOC_KEY, k)


def bm25_explain(spark: SparkSession, pidx, query: str, k: int = 10
                 ) -> DataFrame:
    """Score EXPLANATION for the top-k docs: one row per (winner doc,
    matched term) with every BM25 ingredient → (conv_id, turn_idx,
    term, tf, dl, df, w, contrib, score).

    The analog of Lucene's Explanation API; the reference's only
    introspection is a debug print of the blend inputs
    (/root/reference/search.py:183-198, commented out).  Σ contrib over
    a doc's rows reproduces its score bit-exactly (same sorted-fold
    order as scoring).

    Plan: the normal packed top-k first; then ONE extra narrow job that
    re-filters the matched postings to the ≤ k winner ordinals
    (broadcast) and annotates each row from the driver-sized
    (term, w, df) table.  The corpus-scale matched set is never
    re-shuffled — the second job's output is ≤ k × |query terms| rows.
    """
    from ics_search_engine_spark.operators.packed_index import decode_matched
    from ics_search_engine_spark.textproc.tokenizer import tokenize as _tok

    do_stem = pidx.stats.get("stem", True)
    q_terms = sorted(set(_tok(query, for_query=True, do_stem=do_stem)))
    empty = spark.createDataFrame(
        [],
        "conv_id string, turn_idx int, term string, tf int, dl int, "
        "df long, w double, contrib double, score double",
    )
    if not q_terms:
        return empty
    term_df = pidx.df_for_terms(q_terms)
    weights = query_weights(query, term_df, pidx.n_docs, do_stem=do_stem)
    if not weights:
        return empty

    matched = pidx.index.filter(F.col("term").isin(sorted(weights)))
    posts = decode_matched(matched)
    topk = score_topk(spark, posts, weights, pidx.avgdl, ["doc_ord"], k)

    wdf = spark.createDataFrame(
        [(t, w, term_df[t]) for t, w in weights.items()],
        "term string, w double, df long",
    )
    breakdown = (
        posts.join(F.broadcast(topk), "doc_ord")
        .join(F.broadcast(wdf), "term")
        .withColumn("contrib", bm25_contrib_col(pidx.avgdl))
    )
    return (
        pidx.docmap.select("doc_ord", "conv_id", "turn_idx")
        .join(F.broadcast(breakdown), "doc_ord")
        .select(
            "conv_id", "turn_idx", "term", "tf", "dl", "df", "w",
            "contrib", "score",
        )
        .orderBy(F.desc("score"), "conv_id", "turn_idx", "term")
    )


def explain_doc(
    spark: SparkSession,
    pidx,
    query: str,
    conv_id: str,
    turn_idx: int,
) -> DataFrame:
    """The ES ``_explain`` API: why does THIS doc score what it scores
    for this query — one row per matched term with every BM25
    ingredient → (term, tf, dl, df, w, contrib, score), whether or not
    the doc would reach any top-k (the difference from bm25_explain,
    which explains winners).  A doc matching no query term returns 0
    rows (ES: "no matching term").

    Score parity: ``score`` folds the contribs in ascending-term order
    — the engine's one accumulation order — so it is bit-identical to
    what every ranked path would assign this doc.

    Plan: ONE docmap point lookup (conv/turn pushdown) resolves
    doc_ord; the posting decode then touches only the query terms'
    rows in the doc's OWN shard (term-IN AND shard_id pushdown — a
    single doc can never need another shard, the layout guarantee);
    the per-doc filter and the ≤ |terms|-row annotate follow.  Nothing
    scales with the corpus."""
    from ics_search_engine_spark.operators.packed_index import decode_matched
    from ics_search_engine_spark.textproc.tokenizer import tokenize as _tok

    do_stem = pidx.stats.get("stem", True)
    q_terms = sorted(set(_tok(query, for_query=True, do_stem=do_stem)))
    empty = spark.createDataFrame(
        [],
        "term string, tf int, dl int, df long, w double, contrib double, "
        "score double",
    )
    if not q_terms:
        return empty
    term_df = pidx.df_for_terms(q_terms)
    weights = query_weights(query, term_df, pidx.n_docs, do_stem=do_stem)
    if not weights:
        return empty
    target = (
        pidx.docmap.filter(
            (F.col("conv_id") == conv_id) & (F.col("turn_idx") == turn_idx)
        )
        .select("doc_ord")
        .collect()
    )
    if not target:
        raise KeyError(f"unknown doc: ({conv_id!r}, {turn_idx})")
    doc_ord = int(target[0]["doc_ord"])
    shard = doc_ord >> pidx.stats["range_bits"]
    matched = pidx.index.filter(
        F.col("term").isin(sorted(weights)) & (F.col("shard_id") == shard)
    )
    posts = decode_matched(matched).filter(F.col("doc_ord") == doc_ord)
    wdf = spark.createDataFrame(
        [(t, w, term_df[t]) for t, w in weights.items()],
        "term string, w double, df long",
    )
    rows = posts.join(F.broadcast(wdf), "term").withColumn(
        "contrib", bm25_contrib_col(pidx.avgdl)
    )
    # ascending-term fold for the bit-exact per-doc score
    folded = rows.groupBy("doc_ord").agg(
        F.aggregate(
            F.sort_array(
                F.collect_list(F.struct("term", "contrib"))
            ),
            F.lit(0.0),
            lambda acc, x: acc + x["contrib"],
        ).alias("score")
    )
    return (
        rows.join(F.broadcast(folded), "doc_ord")
        .select("term", "tf", "dl", "df", "w", "contrib", "score")
        .orderBy("term")
    )


def mget(
    spark: SparkSession,
    transcripts: DataFrame,
    keys: list[tuple[str, int]],
) -> DataFrame:
    """The ES ``_mget`` API: fetch many stored docs by key in ONE job →
    (req_order, conv_id, turn_idx, found, text) in the CALLER'S key
    order, with ``found=false`` rows (text NULL) for keys the store
    lacks — ES reports misses, it doesn't drop them.

    Plan: ``conv_id IN (...)`` reaches the parquet scan (row-group
    min/max skip — the point-lookup discipline every resolve path
    here uses), then a left join from the driver-sized key list pins
    exact (conv, turn) pairs and the request order.  The probe side is
    already IN-filtered to ≤ |keys| conversations, so both join inputs
    are O(|keys|) — Spark cannot broadcast the preserved side of an
    outer join, and with inputs this small it doesn't need to.  Cost
    is O(|keys|) rows shipped regardless of corpus size."""
    kdf = spark.createDataFrame(
        [(i, c, t) for i, (c, t) in enumerate(keys)],
        "req_order int, conv_id string, turn_idx int",
    )
    convs = sorted({c for c, _ in keys})
    hits = transcripts.filter(F.col("conv_id").isin(convs)).select(
        "conv_id", "turn_idx", "text"
    )
    return (
        kdf.join(F.broadcast(hits), ["conv_id", "turn_idx"], "left")
        .select(
            "req_order", "conv_id", "turn_idx",
            F.col("text").isNotNull().alias("found"), "text",
        )
        .orderBy("req_order")
    )


def bm25_topk_packed(spark: SparkSession, pidx, query: str, k: int = 10
                     ) -> DataFrame:
    """Top-k BM25 over a persisted PackedIndex → (conv_id, turn_idx,
    score), rank- and score-identical to the direct path and the oracle.

    Plan: term-IN filter (parquet min/max pushdown — the seek-map analog,
    /root/reference/search.py:53-61) → Arrow decode UDF → broadcast
    weight join → deterministic fold → TakeOrderedAndProject → recover
    (conv_id, turn_idx) for just the k winners from docmap.
    """
    from ics_search_engine_spark.operators.packed_index import decode_matched
    from ics_search_engine_spark.textproc.tokenizer import tokenize as _tok

    do_stem = pidx.stats.get("stem", True)
    q_terms = sorted(set(_tok(query, for_query=True, do_stem=do_stem)))
    empty = spark.createDataFrame(
        [], "conv_id string, turn_idx int, score double"
    )
    if not q_terms:
        return empty
    term_df = pidx.df_for_terms(q_terms)
    weights = query_weights(query, term_df, pidx.n_docs, do_stem=do_stem)
    if not weights:
        return empty

    matched = pidx.index.filter(F.col("term").isin(q_terms))
    posts = decode_matched(matched)
    # doc_ord is the global rank of (conv_id, turn_idx) ascending, so the
    # doc_ord tie-break is EXACTLY the oracle's docID tie-break.
    topk = score_topk(spark, posts, weights, pidx.avgdl, ["doc_ord"], k)
    return resolve_topk_keys(pidx, topk)


def bm25_topk_params(
    spark: SparkSession,
    pidx,
    query: str,
    k: int = 10,
    k1: float | None = None,
    b: float | None = None,
) -> DataFrame:
    """ES similarity settings: top-k BM25 with TUNED ``k1``/``b``
    (ES lets an index override the defaults per field — k1≈0.9/b≈0.4
    is the classic short-field tuning).  Same plan as
    ``bm25_topk_packed`` (term-IN pushdown → decode → fold →
    TakeOrderedAndProject), and bit-identical to it when the params
    are the defaults (tested).

    Scale note: the index's block-max metadata (max_tfn) was computed
    with the BUILD-TIME constants, so a tuned query scores its match
    set exhaustively rather than consuming stale WAND upper bounds —
    the same reopen-to-retune tradeoff ES makes (similarity is an
    index setting; changing it without reindexing invalidates
    impacts)."""
    from ics_search_engine_spark.operators.packed_index import decode_matched
    from ics_search_engine_spark.textproc.tokenizer import tokenize as _tok

    do_stem = pidx.stats.get("stem", True)
    q_terms = sorted(set(_tok(query, for_query=True, do_stem=do_stem)))
    empty = spark.createDataFrame(
        [], "conv_id string, turn_idx int, score double"
    )
    if not q_terms:
        return empty
    term_df = pidx.df_for_terms(q_terms)
    weights = query_weights(query, term_df, pidx.n_docs, do_stem=do_stem)
    if not weights:
        return empty
    matched = pidx.index.filter(F.col("term").isin(q_terms))
    posts = decode_matched(matched)
    scored = score_all(
        spark, posts, weights, pidx.avgdl, ["doc_ord"], k1=k1, b=b
    )
    topk = scored.orderBy(F.desc("score"), F.asc("doc_ord")).limit(k)
    return resolve_topk_keys(pidx, topk)


def profile_terms(spark: SparkSession, pidx, query: str) -> DataFrame:
    """Query profile from ONE metadata-only scan (the ES _profile
    idea's deterministic core): per searchable query term — df, the
    number of index shards its postings span, and the block-max upper
    bound over all its shards → (term, df, n_shards, max_tfn_r6).

    This is the planner's-eye view of a query (what WAND phase
    selection reads) surfaced to users; payload bytes never decode.
    The shard count is relationally checkable because shard_id =
    doc_ord >> range_bits is a pure function of the docID order —
    which makes this a gate on the physical shard LAYOUT itself."""
    from ics_search_engine_spark.textproc.tokenizer import tokenize as _tok

    do_stem = pidx.stats.get("stem", True)
    q_terms = sorted(set(_tok(query, for_query=True, do_stem=do_stem)))
    empty = spark.createDataFrame(
        [], "term string, df long, n_shards long, max_tfn_r6 double"
    )
    if not q_terms:
        return empty
    return (
        pidx.index.filter(F.col("term").isin(q_terms))
        .groupBy("term")
        .agg(
            F.sum("n_postings").alias("df"),
            F.count("*").alias("n_shards"),
            F.round(F.max("max_tfn"), 6).alias("max_tfn_r6"),
        )
        .orderBy("term")
    )


def terms_enum(
    spark: SparkSession,
    pidx,
    prefix: str,
    size: int = 10,
    with_df: bool = False,
) -> DataFrame:
    """ES ``_terms_enum``: the first ``size`` index terms starting
    with ``prefix``, term-ascending — the low-latency autocomplete
    verb that reads the TERM DICTIONARY, never any posting.  →
    (term) or, with ``with_df``, (term, df); ES's API returns bare
    terms, the df variant is the engine's term-dictionary bonus.

    The prefix is normalized through the index's own analyzer
    convention (lowercased; and stemming does NOT apply — ES matches
    the raw indexed terms, so a prefix is matched literally against
    the dictionary, which here holds post-analysis terms).

    Plan shape: metadata-only — a StringStartsWith filter on the
    term column (parquet min/max + dictionary pushdown), the payload
    column never read, distinct over the ≤ n_shards rows per matching
    term, TakeOrderedAndProject for the size cut.  At 10^12 docs this
    touches only the term-dictionary stripes of the matching prefix
    range."""
    _ = spark  # uniform verb signature; pidx carries the session
    p = prefix.lower()
    if not p:
        raise ValueError("terms_enum requires a non-empty prefix")
    matching = pidx.index.filter(F.col("term").startswith(p))
    if with_df:
        return (
            matching.groupBy("term")
            .agg(F.sum("n_postings").alias("df"))
            .orderBy("term")
            .limit(size)
        )
    return (
        matching.select("term").distinct().orderBy("term").limit(size)
    )


def scroll_pages(
    spark: SparkSession,
    idx,
    query: str,
    page_size: int = 10,
    max_pages: int | None = None,
):
    """ES scroll: iterate the FULL ranking of ``query`` in
    ``page_size`` chunks — a generator yielding one list of collected
    Rows (conv_id, turn_idx, score) per page, exhausting when a page
    comes back short.

    ``idx`` is a PackedIndex or a SegmentedIndex; for a consistent
    scroll over a live LSM index, pin the segment set first
    (``SegmentedIndex(spark, open_pit(live_sidx))`` —
    operators/lifecycle.open_pit), exactly the reason ES requires a
    point-in-time for scrolls: every page must rank against the same
    doc set and collection stats.

    Statelessness is the scale story: each page is an independent
    bounded job driven by the previous page's last row as a
    search_after cursor (bm25_topk_after / bm25_topk_segmented(after=)),
    so there is no server-side scroll context to pin on any executor,
    any page can be retried, and page N costs the same as page 1 —
    never a LIMIT N·k + skip."""
    from ics_search_engine_spark.operators.segments import (
        SegmentedIndex,
        bm25_topk_segmented,
    )

    pages = 0
    cursor: tuple[float, str, int] | None = None
    segmented = isinstance(idx, SegmentedIndex)
    while max_pages is None or pages < max_pages:
        if segmented:
            page = bm25_topk_segmented(
                spark, idx, query, k=page_size, after=cursor
            ).collect()
        elif cursor is None:
            page = bm25_topk_packed(spark, idx, query, k=page_size).collect()
        else:
            page = bm25_topk_after(
                spark, idx, query, cursor, k=page_size
            ).collect()
        if not page:
            return
        yield page
        pages += 1
        if len(page) < page_size:
            return
        last = page[-1]
        cursor = (float(last["score"]), last["conv_id"], int(last["turn_idx"]))
