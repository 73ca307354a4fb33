"""Inverted-index construction as a declarative DataFrame pipeline.

Replaces the reference's hand-rolled build loop
(/root/reference/indexer.py:85-116 + components/token_processor.py:14-33
+ components/index_manager.py:52-125):

    read -> tokenize UDF -> posexplode -> groupBy(doc, term) [A1]
         -> df per term [A2] -> salted repartition by term [T2]
         -> sortWithinPartitions -> pack codec UDF -> index table

The reference's spill/partial/range-file machinery (32 MB partials,
1-char-prefix range files, merge passes — index_manager.py:61-125)
disappears entirely: Spark's partial hash aggregation + shuffle IS the
external merge, and the term-range partitioning becomes an explicit
repartition + sortWithinPartitions with skew salting (SURVEY.md §4).

Scale notes (100 TB / 10^12 turns):
* one wide shuffle tokenize→(doc,term) agg with map-side partial
  aggregation (count/min are algebraic);
* dl is DENORMALIZED onto each posting row so query-time scoring never
  joins the (huge) doc table — the reference instead does a dict-lookup
  join J1 (/root/reference/components/index_manager.py:45);
* head terms (stop words are indexed!) produce posting lists ≫ executor
  memory if collected naively — the packed-index writer shards a term's
  postings into bounded sub-shards BEFORE collect_list (see
  ``build_packed_index`` and the shard geometry in
  operators/packed_index.py).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ics_search_engine_spark.functions.udfs import tokenize_index, tokenize_nostem

# docID is the composite (conv_id, turn_idx) — a pure function of the
# input row, never a mutable counter (the reference's doc_id counter,
# /root/reference/indexer.py:32,76, breaks determinism and resume).
DOC_KEY = ["conv_id", "turn_idx"]


def tokenized(transcripts: DataFrame, stem: bool = True) -> DataFrame:
    """(conv_id, turn_idx, tokens array<string>, dl int).

    dl = index-mode token count = reference Document.token_count
    (/root/reference/components/document_processor.py:69).
    """
    tok = tokenize_index if stem else tokenize_nostem
    return transcripts.select(
        *DOC_KEY,
        tok(F.col("text")).alias("tokens"),
    ).withColumn("dl", F.size("tokens"))


def doc_stats(tokens_df: DataFrame) -> DataFrame:
    """(conv_id, turn_idx, dl) — per-doc lengths."""
    return tokens_df.select(*DOC_KEY, "dl")


def postings(tokens_df: DataFrame, with_positions: bool = True) -> DataFrame:
    """Row-per-posting DataFrame:
    (term, conv_id, turn_idx, tf, dl[, positions sorted asc]).

    Replaces the per-doc freq/positions fold at
    /root/reference/components/token_processor.py:14-33 (A1) with
    posexplode + hash aggregation (partial agg map-side, final after
    one shuffle on (doc, term)).
    """
    exploded = tokens_df.select(
        *DOC_KEY,
        "dl",
        F.posexplode("tokens").alias("pos", "term"),
    )
    aggs = [
        F.count("*").cast("int").alias("tf"),
        F.first("dl").alias("dl"),
    ]
    if with_positions:
        aggs.append(F.sort_array(F.collect_list("pos")).alias("positions"))
    return exploded.groupBy("term", *DOC_KEY).agg(*aggs)


def postings_weighted(docs_with_important: DataFrame, stem: bool = True
                      ) -> DataFrame:
    """A3 weighting semantics, preserved exactly (SURVEY.md §2.1 note;
    /root/reference/components/token_processor.py:14-33):

    * body tokens contribute freq+1 AND a position;
    * important-text tokens are tokenized AGAIN and contribute freq+1
      and importance+=weight but NO position;
    * dl (token_count) counts BODY tokens only
      (/root/reference/components/document_processor.py:69).

    Input: (conv_id, turn_idx, text, important array<struct<text,weight>>).
    Output: (term, conv_id, turn_idx, tf, importance, dl, positions).
    """
    tok = tokenize_index if stem else tokenize_nostem
    body = docs_with_important.select(
        *DOC_KEY, tok(F.col("text")).alias("tokens")
    ).withColumn("dl", F.size("tokens"))
    body_posts = body.select(
        *DOC_KEY, "dl", F.posexplode("tokens").alias("pos", "term")
    ).withColumn("weight", F.lit(0.0))

    imp = docs_with_important.select(
        *DOC_KEY, F.explode("important").alias("iw")
    ).select(
        *DOC_KEY,
        tok(F.col("iw.text")).alias("itokens"),
        F.col("iw.weight").alias("weight"),
    )
    imp_posts = imp.select(
        *DOC_KEY, F.explode("itokens").alias("term"), "weight"
    ).withColumn("pos", F.lit(None).cast("int"))

    unioned = body_posts.select(*DOC_KEY, "pos", "term", "weight").unionByName(
        imp_posts.select(*DOC_KEY, "pos", "term", "weight")
    )
    agg = unioned.groupBy("term", *DOC_KEY).agg(
        F.count("*").cast("int").alias("tf"),
        F.sum("weight").alias("importance"),
        F.sort_array(
            F.collect_list("pos")  # nulls dropped by collect_list
        ).alias("positions"),
    )
    # dl is a DOC property (body token count), even for terms appearing
    # only in important text — join it per doc, don't aggregate it
    return agg.join(body.select(*DOC_KEY, "dl"), DOC_KEY)


def reference_tfidf(postings_w: DataFrame, n_docs: int) -> DataFrame:
    """The reference's exact scoring formula
    (/root/reference/components/index_manager.py:36-50):
        idf = log10(N / df);  tf = freq / token_count
        score = tf * (1 + importance) * idf
    ZeroDivisionError guard (token_count 0 → tf 0) included.  dl can be
    NULL for a doc whose term appears ONLY in important text and whose
    body is empty — treated as 0 like the reference's except-branch."""
    dfs = postings_w.groupBy("term").agg(F.count("*").alias("df"))
    tf = F.when(
        F.col("dl").isNull() | (F.col("dl") == 0), F.lit(0.0)
    ).otherwise(F.col("tf") / F.col("dl"))
    return (
        postings_w.join(dfs, "term")
        .withColumn(
            "tf_idf",
            tf * (1.0 + F.col("importance"))
            * F.log10(F.lit(float(n_docs)) / F.col("df")),
        )
    )


def term_stats(postings_df: DataFrame) -> DataFrame:
    """(term, df) — document frequency per term (A2,
    /root/reference/components/index_manager.py:39: df == posting-list
    length; postings are unique per (term, doc) so count(*) == df)."""
    return postings_df.groupBy("term").agg(F.count("*").alias("df"))


def corpus_stats(tokens_df: DataFrame) -> tuple[int, float]:
    """(N, avgdl).  Division happens in Python so the double is
    bit-identical to the oracle's ``sum(dl)/N``."""
    row = tokens_df.agg(
        F.count("*").alias("n"), F.sum("dl").alias("sum_dl")
    ).collect()[0]
    n = row["n"] or 0
    return n, (row["sum_dl"] / n if n else 0.0)
