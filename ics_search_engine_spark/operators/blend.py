"""The reference's ASSEMBLED ranking path (F9), end to end.

/root/reference/search.py:132-202 ranks with a six-ingredient blend:

    combined = 0.2 * tf_idf_score        (term-at-a-time accumulation)
             + 0.2 * cosine              (query vs doc score-vector)
             + 0.6 * term_match_boost    (|matched| / |query tokens|)
             + 0.1 * authority  (HITS)
             + 0.1 * hub        (HITS)
             + 0.2 * pagerank

Reference quirks preserved deliberately:
* the weights sum to 1.4 — intentional, un-normalized
  (/root/reference/search.py:183-190);
* ``match_bonus`` computed at /root/reference/search.py:158 is DEAD
  CODE (overwritten without ever being read) — not reproduced;
* query terms are NOT deduplicated (/root/reference/search.py:134,148):
  a term appearing q times in the query is processed q times, each
  pass adding ``tf_idf * (q/len)`` — so its total contribution is
  ``tf_idf * q^2 / len``;
* the cosine doc-vector assigns the SAME accumulated score to every
  matched term's coordinate (/root/reference/search.py:122-128), so
  cosine degenerates to  Σ_matched qtf / (‖q‖ · √m)  for score>0 —
  we keep the literal dot/norm formula so the degenerate algebra stays
  visible;
* sklearn's cosine leaves zero-norm vectors at similarity 0
  (sklearn normalize() substitutes 1 for zero norms) — replicated;
* HITS/PageRank are looked up by the RAW url; the RESULT url is
  urldefrag'd (/root/reference/search.py:178-180,194).

Determinism deltas (documented, asserted in tests):
* per-doc tf-idf accumulation folds matched terms in ASCENDING term
  order with the combined ``tf_idf * q^2/len`` weight — the reference
  adds per query-instance in posting order; same numbers up to float
  association (the golden transcription uses our order, and a literal
  instance-order replica agrees to 1e-12);
* ties break (score desc, url asc) — the reference's plain sort keeps
  dict insertion order on ties (/root/reference/search.py:200-202).

Scale shape: everything is one broadcast-join + one groupBy(doc) over
MATCHED postings only; link scores are precomputed build-side
(operators/linkgraph) and left-joined with coalesce(0) [J4]; ranking is
TakeOrderedAndProject.  No driver-side per-doc loops.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ics_search_engine_spark.operators.index_build import (
    postings_weighted,
    reference_tfidf,
)
from ics_search_engine_spark.operators.linkgraph import hits, pagerank
from ics_search_engine_spark.sources.crawl import crawl_to_transcripts
from ics_search_engine_spark.textproc.tokenizer import tokenize

# /root/reference/search.py:183-190 — sums to 1.4, on purpose
W_TFIDF = 0.2
W_COSINE = 0.2
W_MATCH = 0.6
W_AUTH = 0.1
W_HUB = 0.1
W_PAGERANK = 0.2


class BlendIndex:
    """Build-side artifacts for the blend: the tf-idf postings table
    and the link-analysis scores (the analog of the reference's
    index.json + link_scores.json, /root/reference/indexer.py:133-150).
    """

    def __init__(self, tfidf: DataFrame, link_scores: DataFrame | None,
                 n_docs: int, stem: bool = True):
        self.tfidf = tfidf          # (term, url, tf_idf)
        # None ⇒ the reference's no-link_scores.json path: every
        # lookup returns 0.0 (/root/reference/search.py:73-81,178-180)
        self.link_scores = link_scores  # (url, authority, hub, pagerank)
        self.n_docs = n_docs
        self.stem = stem


def build_blend_index(
    spark: SparkSession,
    pages: DataFrame,
    with_links: bool = True,
    stem: bool = True,
) -> BlendIndex:
    """pages (url, text, important, outgoing_links) → BlendIndex.

    Mirrors the reference build: weighted postings with the A3
    double-count semantics (postings_weighted), the exact tf-idf
    formula (reference_tfidf), and HITS + PageRank over the internal
    link graph (/root/reference/indexer.py:133-150).  ``with_links=
    False`` replicates the missing-link_scores.json fallback (all link
    ingredients 0); ``stem=False`` is the DuckDB-oracle-compatible
    tokenization variant."""
    n_docs = pages.count()
    pw = postings_weighted(crawl_to_transcripts(pages), stem=stem)
    tfidf = reference_tfidf(pw, n_docs).select(
        "term", F.col("conv_id").alias("url"), "tf_idf"
    )
    link = None
    if with_links:
        link = (
            hits(spark, pages)
            .join(pagerank(spark, pages), "url", "outer")
            .select(
                "url",
                F.coalesce("authority", F.lit(0.0)).alias("authority"),
                F.coalesce("hub", F.lit(0.0)).alias("hub"),
                F.coalesce("pagerank", F.lit(0.0)).alias("pagerank"),
            )
        )
    return BlendIndex(tfidf, link, n_docs, stem=stem)


def search_blend(
    spark: SparkSession,
    bidx: BlendIndex,
    query: str,
    max_results: int = 10,
) -> DataFrame:
    """→ (url, score, matched_terms) — the reference's full combined
    ranking (/root/reference/search.py:132-202), result URLs
    urldefrag'd (search.py:194)."""
    empty = spark.createDataFrame(
        [], "url string, score double, matched_terms array<string>"
    )
    q_tokens = tokenize(query, for_query=True, do_stem=bidx.stem)  # NOT deduped
    total = len(q_tokens)
    if total == 0:
        return empty
    qtf: dict[str, int] = {}
    for t in q_tokens:
        qtf[t] = qtf.get(t, 0) + 1
    # per-term accumulation weight: tf_idf added once per query
    # INSTANCE with query_vector[t] = qtf/len  →  qtf^2 / len total
    w_rows = [(t, (c * c) / total, float(c)) for t, c in sorted(qtf.items())]
    w_df = spark.createDataFrame(w_rows, "term string, w double, qtf double")
    # ‖q‖ of the reference's ones-vector (search.py:112-115): the CSR
    # stores one 1.0 entry PER QUERY INSTANCE with duplicate indices
    # never sum_duplicates'd, and sklearn normalize() squares each
    # STORED entry → ‖q‖ = √len(query_terms).  Duplicates DO sum in
    # the subsequent matmul, so the dot product below keeps qtf.
    q_norm = math.sqrt(total)

    matched = bidx.tfidf.join(F.broadcast(w_df), "term")
    per_doc = (
        matched.groupBy("url")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("term", (F.col("tf_idf") * F.col("w")).alias("contrib")))
            ).alias("tc"),
            F.sum("qtf").alias("sum_qtf_matched"),
            F.count("*").alias("m"),
            F.sort_array(F.collect_set("term")).alias("matched_terms"),
        )
        .withColumn(
            "tfidf_score",
            F.aggregate("tc", F.lit(0.0), lambda acc, x: acc + x["contrib"]),
        )
    )
    # literal cosine of search.py:101-130: dot = score·Σqtf_matched,
    # ‖d‖ = score·√m (every matched coordinate holds the SAME score);
    # zero-norm vectors → similarity 0, like sklearn normalize()
    dot = F.col("tfidf_score") * F.col("sum_qtf_matched")
    d_norm = F.col("tfidf_score") * F.sqrt(F.col("m").cast("double"))
    cosine = F.when(
        (d_norm > 0) & (F.lit(q_norm) > 0), dot / (F.lit(q_norm) * d_norm)
    ).otherwise(F.lit(0.0))
    boost = F.col("m").cast("double") / F.lit(float(total))

    if bidx.link_scores is not None:
        per_doc = per_doc.join(bidx.link_scores, "url", "left")
        auth = F.coalesce("authority", F.lit(0.0))
        hub_c = F.coalesce("hub", F.lit(0.0))
        pr = F.coalesce("pagerank", F.lit(0.0))
    else:
        auth = hub_c = pr = F.lit(0.0)
    scored = per_doc.select(
        "url",
        "matched_terms",
        (
            F.lit(W_TFIDF) * F.col("tfidf_score")
            + F.lit(W_COSINE) * cosine
            + F.lit(W_MATCH) * boost
            + F.lit(W_AUTH) * auth
            + F.lit(W_HUB) * hub_c
            + F.lit(W_PAGERANK) * pr
        ).alias("score"),
    )
    return (
        scored.orderBy(F.desc("score"), F.asc("url"))
        .limit(max_results)
        # presentation parity: strip #fragment from result URLs
        .select(
            F.regexp_replace("url", "#.*$", "").alias("url"),
            "score",
            "matched_terms",
        )
    )


def page_titles(pages: DataFrame) -> DataFrame:
    """(url, title) — the doc-title surface
    (/root/reference/main.py:28-31,53: doc_titles.json, looked up by
    the DEFRAGGED result url with the url itself as fallback).

    The title is the page's actual first-<title> text, which the crawl
    processor emits as a ``title`` column (sources/crawl.process_crawl)
    — NOT inferred from important-text weights, which cannot
    distinguish <title> from e.g. h1+b text that also sums to 2.0."""
    if "title" not in pages.columns:
        raise ValueError(
            "pages must carry the crawl processor's `title` column "
            "(sources/crawl.process_crawl) — weighted important text "
            "cannot identify the real <title>"
        )
    t = pages.select(
        F.regexp_replace("url", "#.*$", "").alias("url"),
        F.coalesce(F.col("title"), F.regexp_replace("url", "#.*$", ""))
        .alias("title"),
        # priority keys on the ORIGINAL column's nullness, not on
        # title == url string equality: a page whose real <title> text
        # literally equals its URL still counts as a real title
        F.when(F.col("title").isNull(), 1).otherwise(0).alias("pri"),
    )
    # doc_titles is a DICT in the reference (one title per url,
    # main.py:28-31): pages that defrag to the same url must collapse
    # to ONE row or the presentation join fans out.  Deterministic
    # winner: a real title beats the url fallback, then min(title).
    return (
        t.groupBy("url")
        .agg(F.min(F.struct("pri", "title")).alias("w"))
        .select("url", F.col("w.title").alias("title"))
    )


def present_results(results: DataFrame, titles: DataFrame) -> DataFrame:
    """results (url, score, ...) ⋈ titles → adds the display title,
    falling back to the url (/root/reference/main.py:53)."""
    return results.join(F.broadcast(titles), "url", "left").withColumn(
        "title", F.coalesce("title", "url")
    )
