"""Driver-facing query registry: each entry is a Spark implementation
plus an equivalent ANSI/DuckDB oracle SQL over the sf-dir parquet
tables (driver gate, see __spark_entry__.py).

These re-express the reference's operator inventory (SURVEY.md §2) and
the training-pipeline extensions over the driver's `documents` /
`embeddings` / `events` tables.  The full stemmed BM25 engine is
exercised separately against the single-node oracle in tests/ (DuckDB
cannot Porter-stem in this sandbox), so the gated variants here use the
stem-free tokenizer path — same regex, same length-1 rule, same scoring
math.

Cross-engine determinism rules used throughout:
* tokenization: split on '[^a-z0-9]+' + length>1 filter — identical in
  Spark `split`+`filter` and DuckDB `regexp_split_to_array`+`list_filter`;
* hashes: 32-bit ints from the first 8 hex chars of md5 — md5 hex is
  identical everywhere (Spark `conv(substr(md5(x),1,8),16,10)`,
  DuckDB `('0x'||substr(md5(x),1,8))::BIGINT`);
* no cross-row float sums without rounding: money-like sums go through
  integer cents; scores are rounded and ORDER BY uses the ROUNDED value
  so top-k selection boundaries agree.
"""

from __future__ import annotations

from collections.abc import Callable

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession

from ics_search_engine_spark.textproc.tokenizer import STOP_WORDS

# ---------------------------------------------------------------- helpers

_TOK_RE = "[^a-z0-9]+"


def toks_col(c: str = "text") -> Column:
    """Stem-free reference tokenization as a pure Catalyst expression
    (regex + lowercase + len>1; /root/reference/utils/tokenizer.py:24-34)."""
    return F.filter(
        F.split(F.lower(F.col(c)), _TOK_RE), lambda x: F.length(x) > 1
    )


_SQL_TOKS = (
    "list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), "
    "x -> length(x) > 1)"
)


def md5_32(col: Column) -> Column:
    """First 32 bits of md5 as a bigint — cross-engine-exact hash."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def _sql_md5_32(expr: str) -> str:
    return f"('0x' || substr(md5({expr}), 1, 8))::BIGINT"


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# The one relational BM25 transcription every scoring oracle shares:
# stats -> posts (gate query terms) -> dfs -> per-posting contrib.
# Single source of truth for the k1/b constants in SQL form — the
# Python side's single source is query.bm25_tfn_col.
_SQL_BM25_CTES = """stats AS (SELECT count(*)::DOUBLE AS n, avg(len(toks)) AS avgdl FROM t),
posts AS (
  SELECT term, doc_id, count(*) AS tf, any_value(dl) AS dl FROM (
    SELECT doc_id, len(toks) AS dl, unnest(toks) AS term FROM t
  ) WHERE term IN ('spark','stream','window','join')
  GROUP BY term, doc_id
),
dfs AS (SELECT term, count(*) AS df FROM posts GROUP BY term),
scored AS (
  SELECT p.doc_id,
         ln((s.n - d.df + 0.5) / (d.df + 0.5) + 1.0)
         * (p.tf * 2.2 / (p.tf + 1.2 * (0.25 + 0.75 * p.dl / s.avgdl)))
         AS contrib
  FROM posts p JOIN dfs d USING (term) CROSS JOIN stats s
),"""


# A fixed query in the documents-table vocabulary (TESTDATA corpus).
DOCS_QUERY_TERMS = ["spark", "stream", "window", "join"]

# ---------------------------------------------------------------- queries


def q_doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting (A4 / training-pipeline 'token counting'):
    per-doc length + distinct terms."""
    return (
        _docs(spark, sf_dir)
        .select("doc_id", toks_col().alias("toks"))
        .select(
            "doc_id",
            F.size("toks").alias("dl"),
            F.size(F.array_distinct("toks")).alias("n_terms"),
        )
    )


_SQL_DOC_TOKEN_STATS = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents)
SELECT doc_id,
       len(toks)::INT AS dl,
       len(list_distinct(toks))::INT AS n_terms
FROM t
"""


def q_postings_tf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: row-per-posting (term, doc_id, tf)."""
    return (
        _docs(spark, sf_dir)
        .select("doc_id", F.explode(toks_col()).alias("term"))
        .groupBy("term", "doc_id")
        .agg(F.count("*").alias("tf"))
    )


_SQL_POSTINGS_TF = f"""
WITH t AS (SELECT doc_id, unnest({_SQL_TOKS}) AS term FROM documents)
SELECT term, doc_id, count(*) AS tf FROM t GROUP BY term, doc_id
"""


def q_term_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: document frequency + collection frequency per term."""
    return (
        q_postings_tf(spark, sf_dir)
        .groupBy("term")
        .agg(F.count("*").alias("df"), F.sum("tf").alias("cf"))
    )


_SQL_TERM_DF = f"""
WITH t AS (SELECT doc_id, unnest({_SQL_TOKS}) AS term FROM documents),
tf AS (SELECT term, doc_id, count(*) AS c FROM t GROUP BY term, doc_id)
SELECT term, count(*) AS df, sum(c)::BIGINT AS cf FROM tf GROUP BY term
"""


def q_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: the reference's exact tf-idf formula
    (/root/reference/components/index_manager.py:36-50, importance=0):
    score = (tf / dl) * log10(N / df), for a fixed 4-term query."""
    docs = _docs(spark, sf_dir).select("doc_id", toks_col().alias("toks"))
    n = docs.count()
    posts = (
        docs.select("doc_id", F.size("toks").alias("dl"),
                    F.explode("toks").alias("term"))
        .filter(F.col("term").isin(DOCS_QUERY_TERMS))
        .groupBy("term", "doc_id")
        .agg(F.count("*").alias("tf"), F.first("dl").alias("dl"))
    )
    dfs = posts.groupBy("term").agg(F.count("*").alias("df"))
    return (
        posts.join(F.broadcast(dfs), "term")
        .select(
            "term",
            "doc_id",
            F.round(
                (F.col("tf") / F.col("dl"))
                * F.log10(F.lit(float(n)) / F.col("df")),
                9,
            ).alias("tfidf_r9"),
        )
    )


_SQL_TFIDF = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
n AS (SELECT count(*)::DOUBLE AS n FROM t),
posts AS (
  SELECT term, doc_id, count(*) AS tf, any_value(dl) AS dl FROM (
    SELECT doc_id, len(toks) AS dl, unnest(toks) AS term FROM t
  ) WHERE term IN ('spark','stream','window','join')
  GROUP BY term, doc_id
),
dfs AS (SELECT term, count(*) AS df FROM posts GROUP BY term)
SELECT p.term, p.doc_id,
       round((p.tf / p.dl) * log10(n.n / d.df), 9) AS tfidf_r9
FROM posts p JOIN dfs d USING (term) CROSS JOIN n
"""


def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1/J2/A6: stem-free BM25 top-20 for the fixed query, ordered by
    the ROUNDED score so the selection boundary is cross-engine-exact."""
    docs = _docs(spark, sf_dir).select("doc_id", toks_col().alias("toks"))
    stats = docs.agg(
        F.count("*").alias("n"), F.sum(F.size("toks")).alias("sdl")
    ).collect()[0]
    n, avgdl = stats["n"], stats["sdl"] / stats["n"]
    posts = (
        docs.select("doc_id", F.size("toks").alias("dl"),
                    F.explode("toks").alias("term"))
        .filter(F.col("term").isin(DOCS_QUERY_TERMS))
        .groupBy("term", "doc_id")
        .agg(F.count("*").alias("tf"), F.first("dl").alias("dl"))
    )
    dfs = posts.groupBy("term").agg(F.count("*").alias("df"))
    tf, dl = F.col("tf").cast("double"), F.col("dl").cast("double")
    idf = F.log((F.lit(float(n)) - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
    tfn = tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / F.lit(avgdl)))
    return (
        posts.join(F.broadcast(dfs), "term")
        .withColumn("contrib", idf * tfn)
        .groupBy("doc_id")
        .agg(F.round(F.sum("contrib"), 6).alias("bm25_r6"))
        .orderBy(F.desc("bm25_r6"), F.asc("doc_id"))
        .limit(20)
    )


_SQL_BM25_TOPK = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
stats AS (SELECT count(*)::DOUBLE AS n, avg(len(toks)) AS avgdl FROM t),
posts AS (
  SELECT term, doc_id, count(*) AS tf, any_value(dl) AS dl FROM (
    SELECT doc_id, len(toks) AS dl, unnest(toks) AS term FROM t
  ) WHERE term IN ('spark','stream','window','join')
  GROUP BY term, doc_id
),
dfs AS (SELECT term, count(*) AS df FROM posts GROUP BY term),
scored AS (
  SELECT p.doc_id,
         ln((s.n - d.df + 0.5) / (d.df + 0.5) + 1.0)
         * (p.tf * 2.2 / (p.tf + 1.2 * (0.25 + 0.75 * p.dl / s.avgdl)))
         AS contrib
  FROM posts p JOIN dfs d USING (term) CROSS JOIN stats s
)
SELECT doc_id, round(sum(contrib), 6) AS bm25_r6
FROM scored GROUP BY doc_id
ORDER BY bm25_r6 DESC, doc_id ASC LIMIT 20
"""


def q_simhash32(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5/A7/A8: 32-bit SimHash — md5 bit votes weighted by tf, exactly
    the reference's vote scheme (/root/reference/utils/simhash.py:32-47)
    at reduced width, as pure relational algebra (cross-engine-exact
    integers)."""
    tf = (
        _docs(spark, sf_dir)
        .select("doc_id", F.explode(toks_col()).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
        .withColumn("h", md5_32(F.col("term")))
    )
    bits = spark.range(32).select(F.col("id").cast("int").alias("b"))
    votes = (
        tf.crossJoin(F.broadcast(bits))
        .withColumn(
            "vote",
            # SQL-form shiftright accepts a column shift amount
            F.when(
                F.expr("(h >> b) & 1") == 1, F.col("tf")
            ).otherwise(-F.col("tf")),
        )
        .groupBy("doc_id", "b")
        .agg(F.sum("vote").alias("v"))
    )
    return (
        votes.groupBy("doc_id")
        .agg(
            F.sum(
                F.when(F.col("v") > 0, F.expr("CAST(1 AS BIGINT) << b"))
                .otherwise(F.lit(0).cast("long"))
            ).alias("simhash32")
        )
    )


_SQL_SIMHASH32 = f"""
WITH t AS (SELECT doc_id, unnest({_SQL_TOKS}) AS term FROM documents),
tf AS (SELECT doc_id, term, count(*) AS tf, {_sql_md5_32('term')} AS h
       FROM t GROUP BY doc_id, term),
votes AS (
  SELECT doc_id, b.b,
         sum(CASE WHEN (h >> b.b) & 1 = 1 THEN tf ELSE -tf END) AS v
  FROM tf CROSS JOIN (SELECT unnest(range(32)) AS b) b
  GROUP BY doc_id, b.b
)
SELECT doc_id,
       sum(CASE WHEN v > 0 THEN (1::BIGINT << b) ELSE 0 END)::BIGINT AS simhash32
FROM votes GROUP BY doc_id
"""


def q_exact_dup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-pipeline exact dedup: hash-groupBy on full text."""
    return (
        _docs(spark, sf_dir)
        .select("doc_id", F.md5(F.col("text")).alias("text_md5"))
        .groupBy("text_md5")
        .agg(F.count("*").alias("n_dups"), F.min("doc_id").alias("keeper"))
        .filter(F.col("n_dups") > 1)
    )


_SQL_EXACT_DUP = """
SELECT md5(text) AS text_md5, count(*) AS n_dups, min(doc_id) AS keeper
FROM documents GROUP BY md5(text) HAVING count(*) > 1
"""


def q_minhash_sig(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-pipeline MinHash: 8 hash functions h_i(t) =
    md5_32(i || ':' || t), signature = min per function over the doc's
    distinct terms."""
    base = _docs(spark, sf_dir).select(
        "doc_id", F.explode(F.array_distinct(toks_col())).alias("term")
    )
    aggs = [
        F.min(md5_32(F.concat(F.lit(f"{i}:"), F.col("term")))).alias(f"mh{i}")
        for i in range(8)
    ]
    return base.groupBy("doc_id").agg(*aggs)


_SQL_MINHASH_SIG = f"""
WITH t AS (
  SELECT doc_id, unnest(list_distinct({_SQL_TOKS})) AS term FROM documents
)
SELECT doc_id,
  {', '.join(f"min({_sql_md5_32(repr(str(i)+':') + ' || term')}) AS mh{i}" for i in range(8))}
FROM t GROUP BY doc_id
"""


def q_shingle_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-pipeline document fingerprint: min 32-bit hash over
    3-token shingles (n-gram rolling fingerprint)."""
    docs = _docs(spark, sf_dir).select("doc_id", toks_col().alias("toks"))
    fp = F.when(
        F.size("toks") >= 3,
        F.array_min(
            F.transform(
                F.sequence(F.lit(0), F.size("toks") - 3),
                lambda i: F.conv(
                    F.substring(
                        F.md5(
                            F.concat_ws(
                                " ",
                                F.element_at(F.col("toks"), i + 1),
                                F.element_at(F.col("toks"), i + 2),
                                F.element_at(F.col("toks"), i + 3),
                            )
                        ),
                        1,
                        8,
                    ),
                    16,
                    10,
                ).cast("long"),
            )
        ),
    ).otherwise(F.lit(None).cast("long"))
    return docs.select("doc_id", fp.alias("shingle_fp"))


_SQL_SHINGLE_FP = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents)
SELECT doc_id,
  CASE WHEN len(toks) >= 3 THEN
    list_min(list_transform(range(1, len(toks) - 1),
      i -> {_sql_md5_32("toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]")}))
  ELSE NULL END AS shingle_fp
FROM t
"""


_STOP_SQL_LIST = "[" + ", ".join(
    f"'{w}'" for w in sorted(STOP_WORDS) if "'" not in w
) + "]"
_STOP_PY_LIST = [w for w in sorted(STOP_WORDS) if "'" not in w]


def q_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-pipeline quality scoring: doc length, stop-word ratio,
    mean token length, non-alnum character ratio."""
    docs = _docs(spark, sf_dir).select(
        "doc_id", "text", toks_col().alias("toks")
    )
    dl = F.size("toks")
    stop_hits = F.size(
        F.filter("toks", lambda x: x.isin(_STOP_PY_LIST))
    )
    tok_chars = F.aggregate(
        "toks", F.lit(0), lambda acc, x: acc + F.length(x)
    )
    non_alnum = F.length("text") - F.length(
        F.regexp_replace(F.col("text"), "[^a-zA-Z0-9 ]", "")
    )
    return docs.select(
        "doc_id",
        dl.alias("dl"),
        F.round(
            F.when(dl > 0, stop_hits.cast("double") / dl).otherwise(0.0), 9
        ).alias("stop_ratio_r9"),
        F.round(
            F.when(dl > 0, tok_chars.cast("double") / dl).otherwise(0.0), 9
        ).alias("mean_tok_len_r9"),
        F.round(non_alnum.cast("double") / F.length("text"), 9).alias(
            "punct_ratio_r9"
        ),
    )


_SQL_QUALITY = f"""
WITH t AS (SELECT doc_id, text, {_SQL_TOKS} AS toks FROM documents)
SELECT doc_id,
  len(toks)::INT AS dl,
  round(CASE WHEN len(toks) > 0 THEN
    len(list_filter(toks, x -> list_contains({_STOP_SQL_LIST}, x)))::DOUBLE
      / len(toks) ELSE 0.0 END, 9) AS stop_ratio_r9,
  round(CASE WHEN len(toks) > 0 THEN
    list_sum(list_transform(toks, x -> length(x)))::DOUBLE / len(toks)
    ELSE 0.0 END, 9) AS mean_tok_len_r9,
  round((length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')))::DOUBLE
    / length(text), 9) AS punct_ratio_r9
FROM t
"""


def q_knn_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Similarity search baseline: brute-force cosine top-20 against the
    vec_id=0 embedding (double-precision fold, same op order both
    engines; ORDER BY rounded score)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    q = F.array(*[F.lit(float(x)) for x in qvec])
    e = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    dot = F.aggregate(
        F.zip_with(e, q, lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x
    )
    nrm = lambda v: F.sqrt(  # noqa: E731
        F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    cos = dot / (nrm(e) * nrm(q))
    return (
        emb.filter(F.col("vec_id") != 0)
        .select("vec_id", F.round(cos, 6).alias("cosine_r6"))
        .orderBy(F.desc("cosine_r6"), F.asc("vec_id"))
        .limit(20)
    )


_SQL_KNN_COSINE = """
WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)
SELECT vec_id,
  round(
    list_dot_product(embedding::DOUBLE[], q.qv)
    / (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
       * sqrt(list_dot_product(q.qv, q.qv))), 6) AS cosine_r6
FROM embeddings CROSS JOIN q
WHERE vec_id != 0
ORDER BY cosine_r6 DESC, vec_id ASC LIMIT 20
"""


def q_knn_cosine_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The IVF pipeline (Lloyd fit -> distributed cell assignment ->
    probe-filtered scan) under the DuckDB gate: with n_probe = n_cells
    every cell is probed, so IVF must return EXACTLY the brute-force
    answer — same oracle SQL as knn_cosine.  Gates the fit collect cap,
    the pandas/literal assignment dispatch, and the probe filter
    end-to-end; the recall-vs-n_probe tradeoff of partial probes is
    pytest-covered (approximate by design, not SQL-expressible)."""
    from ics_search_engine_spark.operators.similarity import (
        cosine_topk_ivf,
        ivf_centroids,
        with_ivf_cells,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    cents = ivf_centroids(emb, n_cells=8, iters=3, seed=42)
    celled = with_ivf_cells(emb.filter(F.col("vec_id") != 0), cents)
    top = cosine_topk_ivf(
        celled, cents, [float(x) for x in qvec], k=20, n_probe=len(cents)
    )
    return (
        top.select("vec_id", F.round("cosine", 6).alias("cosine_r6"))
        .orderBy(F.desc("cosine_r6"), F.asc("vec_id"))
        .limit(20)
    )


def q_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregation over the events stream table (batch
    form; streaming variant in streaming/).  Integer-cents sum keeps the
    float-order hazard out of the cross-engine compare."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (
        ev.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias(
                "sum_value_cents"
            ),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


_SQL_EVENTS_HOURLY = """
SELECT date_trunc('hour', ts) AS hour, event_type,
       count(*) AS n_events,
       sum(round(value * 100)::BIGINT)::BIGINT AS sum_value_cents,
       count(DISTINCT user_id) AS n_users
FROM events GROUP BY 1, 2
"""


def q_lang_source_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus profiling: per (lang, source) doc counts + total tokens."""
    return (
        _docs(spark, sf_dir)
        .select("lang", "source", F.size(toks_col()).alias("dl"))
        .groupBy("lang", "source")
        .agg(F.count("*").alias("n_docs"), F.sum("dl").alias("total_tokens"))
    )


_SQL_LANG_SOURCE = f"""
WITH t AS (SELECT lang, source, len({_SQL_TOKS}) AS dl FROM documents)
SELECT lang, source, count(*) AS n_docs, sum(dl)::BIGINT AS total_tokens
FROM t GROUP BY lang, source
"""

def q_phrase_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional phrase matching (batch form of operators/phrase.py):
    count adjacent occurrences of the 2-gram 'batch batch' per doc."""
    docs = _docs(spark, sf_dir).select("doc_id", toks_col().alias("toks"))
    count = F.size(
        F.filter(
            F.sequence(F.lit(1), F.size("toks") - 1),
            lambda i: (F.element_at(F.col("toks"), i) == "batch")
            & (F.element_at(F.col("toks"), i + 1) == "batch"),
        )
    )
    return (
        docs.filter(F.size("toks") >= 2)
        .select("doc_id", count.alias("match_count"))
        .filter(F.col("match_count") > 0)
    )


_SQL_PHRASE = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
m AS (
  SELECT doc_id,
         len(list_filter(range(1, len(toks)),
             i -> toks[i] = 'batch' AND toks[i+1] = 'batch'))::INT AS match_count
  FROM t WHERE len(toks) >= 2
)
SELECT doc_id, match_count FROM m WHERE match_count > 0
"""


def q_user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization as gaps-and-islands window functions (batch form
    of streaming/stream_ops.sessionize): sessions split on >30min gaps;
    per user: session count, max session length."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    ev.createOrReplaceTempView("ev_sessions_src")
    return spark.sql("""
        WITH flagged AS (
          SELECT user_id, ts,
                 CASE WHEN ts - LAG(ts) OVER w > INTERVAL 30 MINUTES
                      OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_s
          FROM ev_sessions_src
          WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ),
        sessions AS (
          SELECT user_id, ts,
                 SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts) AS sid
          FROM flagged
        ),
        per_session AS (
          SELECT user_id, sid, COUNT(*) AS n_events
          FROM sessions GROUP BY user_id, sid
        )
        SELECT user_id, COUNT(*) AS n_sessions,
               MAX(n_events) AS max_session_events,
               SUM(n_events) AS total_events
        FROM per_session GROUP BY user_id
    """)


_SQL_SESSIONS = """
WITH flagged AS (
  SELECT user_id, ts,
         CASE WHEN ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
              OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
sessions AS (
  SELECT user_id, ts,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts) AS sid
  FROM flagged
),
per_session AS (
  SELECT user_id, sid, COUNT(*) AS n_events
  FROM sessions GROUP BY user_id, sid
)
SELECT user_id, COUNT(*) AS n_sessions,
       MAX(n_events) AS max_session_events,
       SUM(n_events)::BIGINT AS total_events
FROM per_session GROUP BY user_id
"""


def q_minhash_band_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-pipeline MinHash+LSH near-dup pairs (gated form of
    operators/dedup.minhash_lsh_pairs): 8 md5-derived min-hashes, 4
    bands x 2 rows, candidate pairs from band-equality self-join, kept
    when >= 4 of 8 signature slots agree (est. Jaccard >= 0.5).
    Integer n_match keeps the compare float-free."""
    n_hashes, n_bands, rpb = 8, 4, 2
    base = _docs(spark, sf_dir).select(
        "doc_id", F.explode(F.array_distinct(toks_col())).alias("term")
    )
    sigs = base.groupBy("doc_id").agg(
        *[
            F.min(md5_32(F.concat(F.lit(f"{i}:"), F.col("term")))).alias(f"mh{i}")
            for i in range(n_hashes)
        ]
    )
    band_cols = [
        F.md5(
            F.concat_ws(
                "_",
                *[F.col(f"mh{b * rpb + r}").cast("string") for r in range(rpb)],
            )
        ).alias(f"band{b}")
        for b in range(n_bands)
    ]
    banded = sigs.select(
        "doc_id",
        F.array(*[F.col(f"mh{i}") for i in range(n_hashes)]).alias("sig"),
        F.posexplode(F.array(*band_cols)).alias("band_id", "band_val"),
    )
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            on=[
                F.col("a.band_id") == F.col("b.band_id"),
                F.col("a.band_val") == F.col("b.band_val"),
                F.col("a.doc_id") < F.col("b.doc_id"),
            ],
        )
        .select(
            F.col("a.doc_id").alias("a_doc_id"),
            F.col("b.doc_id").alias("b_doc_id"),
            F.aggregate(
                F.zip_with("a.sig", "b.sig", lambda x, y: (x == y).cast("int")),
                F.lit(0),
                lambda acc, x: acc + x,
            ).alias("n_match"),
        )
        .distinct()
    )
    return cand.filter(F.col("n_match") >= 4)


def _sql_minhash_bands() -> str:
    mh = ", ".join(
        f"min({_sql_md5_32(repr(str(i) + ':') + ' || term')}) AS mh{i}"
        for i in range(8)
    )
    band_selects = []
    for band in range(4):
        lo, hi = band * 2, band * 2 + 1
        band_selects.append(
            f"SELECT doc_id, [mh0,mh1,mh2,mh3,mh4,mh5,mh6,mh7] AS sig, "
            f"{band} AS band_id, "
            f"md5(mh{lo}::VARCHAR || '_' || mh{hi}::VARCHAR) AS band_val FROM sigs"
        )
    nm = " + ".join(f"(a.sig[{i+1}] = b.sig[{i+1}])::INT" for i in range(8))
    return f"""
WITH t AS (
  SELECT doc_id, unnest(list_distinct({_SQL_TOKS})) AS term FROM documents
),
sigs AS (SELECT doc_id, {mh} FROM t GROUP BY doc_id),
banded AS ({' UNION ALL '.join(band_selects)}),
cand AS (
  SELECT DISTINCT a.doc_id AS a_doc_id, b.doc_id AS b_doc_id,
         {nm} AS n_match
  FROM banded a JOIN banded b
    ON a.band_id = b.band_id AND a.band_val = b.band_val
   AND a.doc_id < b.doc_id
)
SELECT a_doc_id, b_doc_id, n_match FROM cand WHERE n_match >= 4
"""


_SQL_MINHASH_BAND_PAIRS = _sql_minhash_bands()


def q_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-pipeline n-gram Jaccard near-dup (gated form of
    operators/dedup.ngram_jaccard_pairs): distinct 3-token shingles,
    MinHash-banded candidates (4 one-hash bands), EXACT shingle-set
    intersection on candidates, kept when jaccard >= 0.5 via the
    all-integer predicate 3*n_inter >= a_n + b_n."""
    n_bands = 4
    docs = _docs(spark, sf_dir).select("doc_id", toks_col().alias("toks"))
    sh_arr = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.size("toks") - 3),
            lambda i: F.concat_ws(
                " ",
                F.element_at(F.col("toks"), i + 1),
                F.element_at(F.col("toks"), i + 2),
                F.element_at(F.col("toks"), i + 3),
            ),
        )
    )
    shingled = (
        docs.filter(F.size("toks") >= 3)
        .select("doc_id", sh_arr.alias("shingles"))
    )
    ex = shingled.select(
        "doc_id", F.size("shingles").alias("n_sh"),
        F.explode("shingles").alias("sh"),
    )
    sigs = ex.groupBy("doc_id", "n_sh").agg(
        *[
            F.min(md5_32(F.concat(F.lit(f"g{i}:"), F.col("sh")))).alias(f"g{i}")
            for i in range(n_bands)
        ]
    )
    stacked = sigs.select(
        "doc_id", "n_sh",
        F.posexplode(F.array(*[F.col(f"g{i}") for i in range(n_bands)])).alias(
            "band_id", "band_val"
        ),
    )
    a, b = stacked.alias("a"), stacked.alias("b")
    cand = (
        a.join(
            b,
            on=[
                F.col("a.band_id") == F.col("b.band_id"),
                F.col("a.band_val") == F.col("b.band_val"),
                F.col("a.doc_id") < F.col("b.doc_id"),
            ],
        )
        .select(
            F.col("a.doc_id").alias("a_doc_id"),
            F.col("b.doc_id").alias("b_doc_id"),
            F.col("a.n_sh").alias("a_n"),
            F.col("b.n_sh").alias("b_n"),
        )
        .distinct()
    )
    sh_a = ex.select(F.col("doc_id").alias("a_doc_id"), "sh")
    sh_b = ex.select(F.col("doc_id").alias("b_doc_id"), "sh")
    inter = (
        cand.join(sh_a, "a_doc_id")
        .join(sh_b, ["b_doc_id", "sh"])
        .groupBy("a_doc_id", "b_doc_id", "a_n", "b_n")
        .agg(F.count("*").cast("long").alias("n_inter"))
    )
    return inter.filter(3 * F.col("n_inter") >= F.col("a_n") + F.col("b_n")).select(
        "a_doc_id", "b_doc_id", "a_n", "b_n", "n_inter"
    )


def _sql_ngram_pairs() -> str:
    g = ", ".join(
        f"min({_sql_md5_32(repr(f'g{i}:') + ' || sh')}) AS g{i}" for i in range(4)
    )
    band_selects = " UNION ALL ".join(
        f"SELECT doc_id, n_sh, {i} AS band_id, g{i} AS band_val FROM sigs"
        for i in range(4)
    )
    return f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
shingled AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(toks) - 1),
           i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS shingles
  FROM t WHERE len(toks) >= 3
),
ex AS (
  SELECT doc_id, len(shingles) AS n_sh, unnest(shingles) AS sh FROM shingled
),
sigs AS (SELECT doc_id, any_value(n_sh) AS n_sh, {g} FROM ex GROUP BY doc_id),
banded AS ({band_selects}),
cand AS (
  SELECT DISTINCT a.doc_id AS a_doc_id, b.doc_id AS b_doc_id,
         a.n_sh AS a_n, b.n_sh AS b_n
  FROM banded a JOIN banded b
    ON a.band_id = b.band_id AND a.band_val = b.band_val
   AND a.doc_id < b.doc_id
),
inter AS (
  SELECT c.a_doc_id, c.b_doc_id, c.a_n, c.b_n, count(*)::BIGINT AS n_inter
  FROM cand c
  JOIN ex ea ON ea.doc_id = c.a_doc_id
  JOIN ex eb ON eb.doc_id = c.b_doc_id AND eb.sh = ea.sh
  GROUP BY c.a_doc_id, c.b_doc_id, c.a_n, c.b_n
)
SELECT a_doc_id, b_doc_id, a_n, b_n, n_inter
FROM inter WHERE 3 * n_inter >= a_n + b_n
"""


_SQL_NGRAM_JACCARD_PAIRS = _sql_ngram_pairs()


def q_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-family, embedding modality: all pairs with cosine >= 0.4
    (brute-force exact — the oracle-able form; the LSH-blocked scale
    path is operators/similarity.embedding_near_dup_pairs, pytest-gated
    against this).  Threshold compares on the ROUNDED value so both
    engines make the same boundary call."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("e")
    )
    a, b = emb.alias("a"), emb.alias("b")
    dot = F.aggregate(
        F.zip_with("a.e", "b.e", lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    nrm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(c, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    cos_r6 = F.round(dot / (nrm(F.col("a.e")) * nrm(F.col("b.e"))), 6)
    return (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("a_vec_id"),
            F.col("b.vec_id").alias("b_vec_id"),
            cos_r6.alias("cosine_r6"),
        )
        .filter(F.col("cosine_r6") >= 0.4)
    )


_SQL_EMB_NEAR_DUP = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
SELECT a.vec_id AS a_vec_id, b.vec_id AS b_vec_id,
       round(list_dot_product(a.v, b.v)
             / (sqrt(list_dot_product(a.v, a.v))
                * sqrt(list_dot_product(b.v, b.v))), 6) AS cosine_r6
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE round(list_dot_product(a.v, b.v)
            / (sqrt(list_dot_product(a.v, a.v))
               * sqrt(list_dot_product(b.v, b.v))), 6) >= 0.4
"""


def _engine_packed_top20(
    spark: SparkSession, sf_dir: str, accumulator: str | None = None,
    min_match: int | None = None,
) -> DataFrame:
    """Shared body of the engine-under-gate queries: build a stem-free
    packed index from the documents table (tokenize → postings → doc
    ordinals → doc-range shards → delta+varint pack), then answer the
    fixed query through block-max WAND — the same build+query code path
    the stemmed engine runs (operators/build + packed_index + wand),
    minus Porter because DuckDB cannot stem.  The oracle recomputes
    BM25 relationally.  Scores compare rounded to 6 decimals; ordering
    is by the ROUNDED score in both engines so the top-20 boundary
    agrees.  ``accumulator`` forces the shard scorer's accumulation
    strategy (None = auto)."""
    import shutil
    import tempfile

    from ics_search_engine_spark.operators.packed_index import (
        PackedIndex,
        build_packed_index,
    )
    from ics_search_engine_spark.operators.wand import bm25_topk_wand

    docs = _docs(spark, sf_dir)
    transcripts = docs.select(
        F.format_string("doc%08d", F.col("doc_id")).alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.col("text"),
    )
    out = tempfile.mkdtemp(prefix="gate_engine_idx_")
    try:
        build_packed_index(
            spark, transcripts, out, range_bits=8, with_positions=False,
            stem=False,
        )
        pidx = PackedIndex(spark, out)
        # 60 exact-score winners >> the 20 reported: the rounded-order
        # cutoff at rank 20 cannot reach past rank 60 unless >40 docs
        # share one rounded score (no exact-duplicate docs in the sf
        # tables)
        top = bm25_topk_wand(
            spark, pidx, " ".join(DOCS_QUERY_TERMS), k=60,
            accumulator=accumulator, min_match=min_match,
        )
    finally:
        # safe to remove before the caller materializes: bm25_topk_wand
        # collects during the call and returns a driver-local DataFrame
        shutil.rmtree(out, ignore_errors=True)
    return (
        top.select(
            F.substring("conv_id", 4, 8).cast("long").alias("doc_id"),
            F.round(F.col("score"), 6).alias("bm25_r6"),
        )
        .orderBy(F.desc("bm25_r6"), F.asc("doc_id"))
        .limit(20)
    )


def q_bm25_engine_packed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE ENGINE ITSELF under the DuckDB gate (see
    _engine_packed_top20) — default accumulation (dense at the gate's
    range_bits)."""
    return _engine_packed_top20(spark, sf_dir)


def q_bm25_msm_engine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """minimum_should_match under the DuckDB gate: the packed engine's
    θ-pruned WAND path with min_match=2 (docs matching >= 2 of the 4
    query terms) vs a HAVING count >= 2 relational oracle — surviving
    scores must stay bit-identical to the OR path's."""
    return _engine_packed_top20(spark, sf_dir, min_match=2)


def q_bm25_page2_engine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """search_after deep pagination under the DuckDB gate: page 1 =
    WAND top-20 (exact-score order), cursor = its last row, page 2 =
    bm25_topk_after(cursor, k=20) — must equal the oracle's exact-rank
    rows 21..40.  Gates that the cursor tuple predicate resumes with no
    skipped/repeated docs, and that engine scores are bit-identical to
    the relational computation (the oracle ranks on the EXACT unrounded
    score, like the deletes gate)."""
    import shutil
    import tempfile

    from ics_search_engine_spark.operators.packed_index import (
        PackedIndex,
        build_packed_index,
    )
    from ics_search_engine_spark.operators.query import bm25_topk_after
    from ics_search_engine_spark.operators.wand import bm25_topk_wand

    docs = _docs(spark, sf_dir)
    transcripts = docs.select(
        F.format_string("doc%08d", F.col("doc_id")).alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.col("text"),
    )
    out = tempfile.mkdtemp(prefix="gate_page2_idx_")
    try:
        build_packed_index(
            spark, transcripts, out, range_bits=8, with_positions=False,
            stem=False,
        )
        pidx = PackedIndex(spark, out)
        query = " ".join(DOCS_QUERY_TERMS)
        page1 = bm25_topk_wand(spark, pidx, query, k=20).collect()
        last = page1[-1]
        page2 = bm25_topk_after(
            spark, pidx, query,
            (last["score"], last["conv_id"], last["turn_idx"]), k=20,
        ).collect()
    finally:
        shutil.rmtree(out, ignore_errors=True)
    out_df = spark.createDataFrame(
        page2, "conv_id string, turn_idx int, score double"
    )
    return (
        out_df.select(
            F.substring("conv_id", 4, 8).cast("long").alias("doc_id"),
            F.round(F.col("score"), 6).alias("bm25_r6"),
        )
        .orderBy(F.desc("bm25_r6"), F.asc("doc_id"))
    )


_SQL_BM25_PAGE2 = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
{_SQL_BM25_CTES}
ranked AS (
  SELECT doc_id, sum(contrib) AS s,
         row_number() OVER (ORDER BY sum(contrib) DESC, doc_id ASC) AS rn
  FROM scored GROUP BY doc_id
)
SELECT doc_id, round(s, 6) AS bm25_r6
FROM ranked WHERE rn BETWEEN 21 AND 40
ORDER BY bm25_r6 DESC, doc_id ASC
"""


def q_bm25_engine_merge_acc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sorted-merge score accumulator under the DuckDB gate: the
    same packed build + WAND query as bm25_engine_packed, but scoring
    accumulates via the searchsorted-merge path that serves
    range_bits > 22 (memory tracks matched docs, not range width) —
    forced on here so the gate covers it at the test corpus's
    range_bits.  Must reproduce the identical relational BM25."""
    return _engine_packed_top20(spark, sf_dir, accumulator="merge")


# identical semantics to _SQL_BM25_TOPK — the engine must reproduce the
# relational computation through its packed artifacts
_SQL_BM25_ENGINE = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
stats AS (SELECT count(*)::DOUBLE AS n, avg(len(toks)) AS avgdl FROM t),
posts AS (
  SELECT term, doc_id, count(*) AS tf, any_value(dl) AS dl FROM (
    SELECT doc_id, len(toks) AS dl, unnest(toks) AS term FROM t
  ) WHERE term IN ('spark','stream','window','join')
  GROUP BY term, doc_id
),
dfs AS (SELECT term, count(*) AS df FROM posts GROUP BY term),
scored AS (
  SELECT p.doc_id,
         ln((s.n - d.df + 0.5) / (d.df + 0.5) + 1.0)
         * (p.tf * 2.2 / (p.tf + 1.2 * (0.25 + 0.75 * p.dl / s.avgdl)))
         AS contrib
  FROM posts p JOIN dfs d USING (term) CROSS JOIN stats s
)
SELECT doc_id, round(sum(contrib), 6) AS bm25_r6
FROM scored GROUP BY doc_id
ORDER BY bm25_r6 DESC, doc_id ASC LIMIT 20
"""

# minimum_should_match=2: posts are unique per (term, doc), so
# count(*) in the per-doc group IS the distinct matched-term count
_SQL_BM25_MSM = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
stats AS (SELECT count(*)::DOUBLE AS n, avg(len(toks)) AS avgdl FROM t),
posts AS (
  SELECT term, doc_id, count(*) AS tf, any_value(dl) AS dl FROM (
    SELECT doc_id, len(toks) AS dl, unnest(toks) AS term FROM t
  ) WHERE term IN ('spark','stream','window','join')
  GROUP BY term, doc_id
),
dfs AS (SELECT term, count(*) AS df FROM posts GROUP BY term),
scored AS (
  SELECT p.doc_id,
         ln((s.n - d.df + 0.5) / (d.df + 0.5) + 1.0)
         * (p.tf * 2.2 / (p.tf + 1.2 * (0.25 + 0.75 * p.dl / s.avgdl)))
         AS contrib
  FROM posts p JOIN dfs d USING (term) CROSS JOIN stats s
)
SELECT doc_id, round(sum(contrib), 6) AS bm25_r6
FROM scored GROUP BY doc_id
HAVING count(*) >= 2
ORDER BY bm25_r6 DESC, doc_id ASC LIMIT 20
"""

# tombstone semantics: drop the top-3 RANK rows (rank on the exact
# unrounded score, ties by doc_id — the engine's ordering), keep every
# surviving score computed against pre-delete N/avgdl/df
_SQL_BM25_ENGINE_DELETES = """
WITH t AS (SELECT doc_id, {toks} AS toks FROM documents),
{_SQL_BM25_CTES}
ranked AS (
  SELECT doc_id, sum(contrib) AS s,
         row_number() OVER (ORDER BY sum(contrib) DESC, doc_id ASC) AS rn
  FROM scored GROUP BY doc_id
)
SELECT doc_id, round(s, 6) AS bm25_r6
FROM ranked WHERE rn > 3
ORDER BY bm25_r6 DESC, doc_id ASC LIMIT 20
""".replace("{_SQL_BM25_CTES}", _SQL_BM25_CTES).replace("{toks}", _SQL_TOKS)

# upsert semantics: the corpus holds BOTH versions of every updated
# doc (stats count both — pre-compaction staleness, Lucene-style); the
# dead (v1) rows of updated docs are dropped from the RANKING only
_SQL_BM25_ENGINE_UPSERT = """
WITH src AS (
  SELECT doc_id, FALSE AS dead, text FROM documents WHERE doc_id % 7 <> 3
  UNION ALL
  SELECT doc_id, TRUE AS dead, text FROM documents WHERE doc_id % 7 = 3
  UNION ALL
  SELECT doc_id, FALSE AS dead, text || ' spark stream spark'
  FROM documents WHERE doc_id % 7 = 3
),
t AS (SELECT doc_id, dead, {toks} AS toks FROM src),
stats AS (SELECT count(*)::DOUBLE AS n, avg(len(toks)) AS avgdl FROM t),
posts AS (
  SELECT term, doc_id, dead, count(*) AS tf, any_value(dl) AS dl FROM (
    SELECT doc_id, dead, len(toks) AS dl, unnest(toks) AS term FROM t
  ) WHERE term IN ('spark','stream','window','join')
  GROUP BY term, doc_id, dead
),
dfs AS (SELECT term, count(*) AS df FROM posts GROUP BY term),
scored AS (
  SELECT p.doc_id, p.dead,
         ln((s.n - d.df + 0.5) / (d.df + 0.5) + 1.0)
         * (p.tf * 2.2 / (p.tf + 1.2 * (0.25 + 0.75 * p.dl / s.avgdl)))
         AS contrib
  FROM posts p JOIN dfs d USING (term) CROSS JOIN stats s
)
SELECT doc_id, round(sum(contrib), 6) AS bm25_r6
FROM scored WHERE NOT dead
GROUP BY doc_id, dead
ORDER BY bm25_r6 DESC, doc_id ASC LIMIT 20
""".replace("{toks}", _SQL_TOKS)


def q_bm25_synonyms_engine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synonym-group expansion THROUGH the packed engine
    (operators/synonyms.bm25_topk_synonyms_packed): 'join'≡'merge' and
    'fast'≡'quick' score as single pseudo-terms — summed tf, BLENDED df
    over the union of member postings (a doc holding both members
    counts once — the discriminating case vs naive OR-expansion).
    The oracle regroups relationally with the same CASE mapping."""
    import shutil
    import tempfile

    from ics_search_engine_spark.operators.packed_index import (
        PackedIndex,
        build_packed_index,
    )
    from ics_search_engine_spark.operators.synonyms import (
        bm25_topk_synonyms_packed,
    )

    docs = _docs(spark, sf_dir)
    transcripts = docs.select(
        F.format_string("doc%08d", F.col("doc_id")).alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.col("text"),
    )
    out = tempfile.mkdtemp(prefix="gate_syn_idx_")
    try:
        build_packed_index(
            spark, transcripts, out, range_bits=8, with_positions=False,
            stem=False,
        )
        pidx = PackedIndex(spark, out)
        top = bm25_topk_synonyms_packed(
            spark, pidx, "join fast table",
            {"join": ["merge"], "fast": ["quick"]}, k=60,
        ).collect()
    finally:
        shutil.rmtree(out, ignore_errors=True)
    rows = [(int(c[3:]), round(float(s), 6)) for c, _, s in top]
    rows.sort(key=lambda r: (-r[1], r[0]))
    return spark.createDataFrame(rows[:20], "doc_id long, bm25_r6 double")


_SQL_BM25_SYNONYMS = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
stats AS (SELECT count(*)::DOUBLE AS n, avg(len(toks)) AS avgdl FROM t),
posts AS (
  SELECT term, doc_id, count(*) AS tf, any_value(dl) AS dl FROM (
    SELECT doc_id, len(toks) AS dl, unnest(toks) AS term FROM t
  ) WHERE term IN ('join','merge','fast','quick','table')
  GROUP BY term, doc_id
),
grouped AS (
  SELECT CASE WHEN term IN ('join','merge') THEN 'join'
              WHEN term IN ('fast','quick') THEN 'fast'
              ELSE term END AS grp,
         doc_id, sum(tf) AS tf, any_value(dl) AS dl
  FROM posts GROUP BY 1, doc_id
),
dfs AS (SELECT grp, count(*) AS df FROM grouped GROUP BY grp),
scored AS (
  SELECT g.doc_id,
         ln((s.n - d.df + 0.5) / (d.df + 0.5) + 1.0)
         * (g.tf * 2.2 / (g.tf + 1.2 * (0.25 + 0.75 * g.dl / s.avgdl)))
         AS contrib
  FROM grouped g JOIN dfs d USING (grp) CROSS JOIN stats s
)
SELECT doc_id, round(sum(contrib), 6) AS bm25_r6
FROM scored GROUP BY doc_id
ORDER BY bm25_r6 DESC, doc_id ASC LIMIT 20
"""


def q_bm25_prf_engine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rocchio pseudo-relevance feedback THROUGH the packed engine
    (operators/prf.bm25_topk_prf_packed): top-5 feedback docs from the
    plain BM25 ranking, top-5 expansion terms by Σtf·idf (originals and
    stop words excluded), re-score with α=1 original + β=0.75·e/|F|
    expansion weights.  The oracle replays all three stages in SQL —
    the full candidate mining, the (e desc, term asc) selection, and
    the blended re-score."""
    import shutil
    import tempfile

    from ics_search_engine_spark.operators.packed_index import (
        PackedIndex,
        build_packed_index,
    )
    from ics_search_engine_spark.operators.prf import bm25_topk_prf_packed

    docs = _docs(spark, sf_dir)
    transcripts = docs.select(
        F.format_string("doc%08d", F.col("doc_id")).alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.col("text"),
    )
    out = tempfile.mkdtemp(prefix="gate_prf_idx_")
    try:
        build_packed_index(
            spark, transcripts, out, range_bits=8, with_positions=False,
            stem=False,
        )
        pidx = PackedIndex(spark, out)
        top = bm25_topk_prf_packed(
            spark, pidx, transcripts, " ".join(DOCS_QUERY_TERMS),
            k=60, fb_docs=5, fb_terms=5,
        ).collect()
    finally:
        shutil.rmtree(out, ignore_errors=True)
    rows = [(int(c[3:]), round(float(s), 6)) for c, _, s in top]
    rows.sort(key=lambda r: (-r[1], r[0]))
    return spark.createDataFrame(rows[:20], "doc_id long, bm25_r6 double")


def _sql_prf() -> str:
    from ics_search_engine_spark.textproc.tokenizer import STOP_WORDS

    # SQL-escape: the canonical list has apostrophe forms ("aren't") —
    # they can never match a [a-z0-9]+ token, but the literal must parse
    stoplist = ", ".join(
        "'{}'".format(w.replace("'", "''")) for w in sorted(STOP_WORDS)
    )
    origs = ", ".join(f"'{t}'" for t in DOCS_QUERY_TERMS)
    return f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
stats AS (SELECT count(*)::DOUBLE AS n, avg(len(toks)) AS avgdl FROM t),
posts AS (
  SELECT term, doc_id, count(*) AS tf, any_value(dl) AS dl FROM (
    SELECT doc_id, len(toks) AS dl, unnest(toks) AS term FROM t
  ) GROUP BY term, doc_id
),
dfs AS (SELECT term, count(*) AS df FROM posts GROUP BY term),
w0 AS (
  SELECT term, ln((s.n - d.df + 0.5) / (d.df + 0.5) + 1.0) AS w
  FROM dfs d CROSS JOIN stats s WHERE term IN ({origs})
),
base AS (
  SELECT p.doc_id,
         sum(w0.w * (p.tf * 2.2 /
             (p.tf + 1.2 * (0.25 + 0.75 * p.dl / s.avgdl)))) AS s
  FROM posts p JOIN w0 USING (term) CROSS JOIN stats s
  GROUP BY p.doc_id
),
fb AS (SELECT doc_id FROM base ORDER BY s DESC, doc_id ASC LIMIT 5),
nfb AS (SELECT count(*)::DOUBLE AS nf FROM fb),
cand AS (
  SELECT p.term, sum(p.tf) AS tfsum
  FROM posts p JOIN fb USING (doc_id)
  WHERE p.term NOT IN ({origs}) AND p.term NOT IN ({stoplist})
  GROUP BY p.term
),
expn AS (
  SELECT c.term,
         c.tfsum * ln((s.n - d.df + 0.5) / (d.df + 0.5) + 1.0) AS e
  FROM cand c JOIN dfs d USING (term) CROSS JOIN stats s
  ORDER BY e DESC, c.term ASC LIMIT 5
),
weights AS (
  SELECT term, w FROM w0
  UNION ALL
  SELECT e.term, 0.75 * e.e / nfb.nf AS w FROM expn e CROSS JOIN nfb
),
final AS (
  SELECT p.doc_id,
         sum(wt.w * (p.tf * 2.2 /
             (p.tf + 1.2 * (0.25 + 0.75 * p.dl / s.avgdl)))) AS s
  FROM posts p JOIN weights wt USING (term) CROSS JOIN stats s
  GROUP BY p.doc_id
)
SELECT doc_id, round(s, 6) AS bm25_r6 FROM final
ORDER BY bm25_r6 DESC, doc_id ASC LIMIT 20
"""


_SQL_BM25_PRF = _sql_prf()


def q_bm25_wildcard_engine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix-expansion BM25 THROUGH the packed index
    (operators/wildcard.bm25_topk_wildcard): 's* join' expands the
    's' pattern against the term dictionary via a pushed-down
    StringStartsWith scan, each expanded term joining the query with
    qtf 1; the literal 'join' rides along unchanged.  The oracle
    recomputes the same weighting relationally with LIKE 's%'.  The
    term dictionary the reference would have to linear-scan for this
    (seek map keyed on exact terms, utils/index_generator.py:35-53) is
    a sorted parquet table here, so expansion is file-skip cheap."""
    import shutil
    import tempfile

    from ics_search_engine_spark.operators.packed_index import (
        PackedIndex,
        build_packed_index,
    )
    from ics_search_engine_spark.operators.wildcard import bm25_topk_wildcard

    docs = _docs(spark, sf_dir)
    transcripts = docs.select(
        F.format_string("doc%08d", F.col("doc_id")).alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.col("text"),
    )
    out = tempfile.mkdtemp(prefix="gate_wildcard_idx_")
    try:
        build_packed_index(
            spark, transcripts, out, range_bits=8, with_positions=False,
            stem=False,
        )
        pidx = PackedIndex(spark, out)
        # 60 exact-score winners >> the 20 reported (rounded-boundary
        # over-fetch, same rationale as _engine_packed_top20)
        top = bm25_topk_wildcard(spark, pidx, "s* join", k=60).collect()
    finally:
        shutil.rmtree(out, ignore_errors=True)
    resolved = [(int(c[3:]), round(s, 6)) for c, _, s in top]
    resolved.sort(key=lambda r: (-r[1], r[0]))
    return spark.createDataFrame(
        resolved[:20], "doc_id long, bm25_r6 double"
    )


def q_lmd_engine_packed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-model (Dirichlet) ranking THROUGH the packed index
    (operators/lmd.py — Zhai & Lafferty 2001, mu=2000): score =
    Σ qtf·ln(1 + tf/(mu·ctf/total_tokens)) + Q·ln(mu/(dl+mu)) over
    docs matching ≥1 term.  The second similarity the engine serves
    from the SAME artifacts as BM25 — collection term frequency is an
    extra narrow agg over the already-matched postings, total tokens
    is stats sum_dl.  The oracle replays the formula relationally."""
    import shutil
    import tempfile

    from ics_search_engine_spark.operators.lmd import lmd_topk_packed
    from ics_search_engine_spark.operators.packed_index import (
        PackedIndex,
        build_packed_index,
    )

    docs = _docs(spark, sf_dir)
    transcripts = docs.select(
        F.format_string("doc%08d", F.col("doc_id")).alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.col("text"),
    )
    out = tempfile.mkdtemp(prefix="gate_lmd_idx_")
    try:
        build_packed_index(
            spark, transcripts, out, range_bits=8, with_positions=False,
            stem=False,
        )
        pidx = PackedIndex(spark, out)
        top = lmd_topk_packed(
            spark, pidx, " ".join(DOCS_QUERY_TERMS), k=60
        ).collect()
    finally:
        shutil.rmtree(out, ignore_errors=True)
    resolved = [(int(c[3:]), round(s, 6)) for c, _, s in top]
    resolved.sort(key=lambda r: (-r[1], r[0]))
    return spark.createDataFrame(
        resolved[:20], "doc_id long, lmd_r6 double"
    )


_SQL_LMD_ENGINE = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
tot AS (SELECT sum(len(toks))::DOUBLE AS total FROM t),
posts AS (
  SELECT term, doc_id, count(*) AS tf, any_value(dl) AS dl FROM (
    SELECT doc_id, len(toks) AS dl, unnest(toks) AS term FROM t
  ) WHERE term IN ('spark','stream','window','join')
  GROUP BY term, doc_id
),
ctfs AS (SELECT term, sum(tf)::DOUBLE AS ctf FROM posts GROUP BY term),
consts AS (
  SELECT c.term, 1.0 AS qtf, 2000.0 * (c.ctf / tot.total) AS mp
  FROM ctfs c CROSS JOIN tot
),
qsum AS (SELECT sum(qtf) AS q FROM consts),
scored AS (
  SELECT p.doc_id, c.qtf * ln(1.0 + p.tf / c.mp) AS contrib, p.dl
  FROM posts p JOIN consts c USING (term)
)
SELECT s.doc_id,
       round(sum(s.contrib)
             + any_value(qsum.q) * ln(2000.0 / (any_value(s.dl) + 2000.0)),
             6) AS lmd_r6
FROM scored s CROSS JOIN qsum
GROUP BY s.doc_id
ORDER BY lmd_r6 DESC, doc_id ASC LIMIT 20
"""


def q_spell_suggest_engine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spell suggestion ("did you mean") under the DuckDB gate
    (operators/spell.suggest_terms): each probe maps to its best
    dictionary term within Levenshtein 2, best = (dist asc, df desc,
    term asc) — 'sparkk'→'spark', 'strem'→'stream', an exact token is
    its own best match at distance 0, and a hopeless probe keeps
    itself (sentinel -1 stats, both sides).  The oracle recomputes the
    selection with DuckDB's levenshtein over the relational
    vocabulary."""
    import shutil
    import tempfile

    from ics_search_engine_spark.operators.packed_index import (
        PackedIndex,
        build_packed_index,
    )
    from ics_search_engine_spark.operators.spell import suggest_terms

    docs = _docs(spark, sf_dir)
    transcripts = docs.select(
        F.format_string("doc%08d", F.col("doc_id")).alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.col("text"),
    )
    out = tempfile.mkdtemp(prefix="gate_spell_idx_")
    try:
        build_packed_index(
            spark, transcripts, out, range_bits=8, with_positions=False,
            stem=False,
        )
        pidx = PackedIndex(spark, out)
        probes = ["join", "sparkk", "strem", "zzzzzzqq"]
        rows = suggest_terms(spark, pidx, probes).collect()
    finally:
        shutil.rmtree(out, ignore_errors=True)
    fixed = [
        (
            r["token"],
            r["suggestion"],
            int(r["dist"]) if r["dist"] is not None else -1,
            int(r["df"]) if r["df"] is not None else -1,
        )
        for r in rows
    ]
    fixed.sort()
    return spark.createDataFrame(
        fixed, "token string, suggestion string, dist int, df long"
    )


def q_spell_suggest_symspell(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spell suggestion through the SymSpell deletion-index expander
    (operators/spell.suggest_terms(expander='symspell'), sharing
    operators/fuzzy.ensure_deletes_dict): candidates come from a
    pushed-down ``dkey IN`` over the deletion dictionary + exact
    Levenshtein verification — selection identical to the scan, so the
    gate reuses spell_suggest_engine's oracle verbatim."""
    import shutil
    import tempfile

    from ics_search_engine_spark.operators.packed_index import (
        PackedIndex,
        build_packed_index,
    )
    from ics_search_engine_spark.operators.spell import suggest_terms

    docs = _docs(spark, sf_dir)
    transcripts = docs.select(
        F.format_string("doc%08d", F.col("doc_id")).alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.col("text"),
    )
    out = tempfile.mkdtemp(prefix="gate_spellsym_idx_")
    try:
        build_packed_index(
            spark, transcripts, out, range_bits=8, with_positions=False,
            stem=False,
        )
        pidx = PackedIndex(spark, out)
        probes = ["join", "sparkk", "strem", "zzzzzzqq"]
        rows = suggest_terms(
            spark, pidx, probes, expander="symspell"
        ).collect()
    finally:
        shutil.rmtree(out, ignore_errors=True)
    fixed = [
        (
            r["token"],
            r["suggestion"],
            int(r["dist"]) if r["dist"] is not None else -1,
            int(r["df"]) if r["df"] is not None else -1,
        )
        for r in rows
    ]
    fixed.sort()
    return spark.createDataFrame(
        fixed, "token string, suggestion string, dist int, df long"
    )


_SQL_SPELL_SUGGEST = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
vocab AS (
  SELECT term, count(*) AS df FROM (
    SELECT DISTINCT doc_id, term FROM (
      SELECT doc_id, unnest(toks) AS term FROM t
    )
  ) GROUP BY term
),
probes(token) AS (VALUES ('join'), ('sparkk'), ('strem'), ('zzzzzzqq')),
cand AS (
  SELECT p.token, v.term AS suggestion,
         levenshtein(p.token, v.term) AS dist, v.df,
         row_number() OVER (
           PARTITION BY p.token
           ORDER BY levenshtein(p.token, v.term) ASC, v.df DESC, v.term ASC
         ) AS rn
  FROM probes p JOIN vocab v ON levenshtein(p.token, v.term) <= 2
)
SELECT p.token,
       coalesce(c.suggestion, p.token) AS suggestion,
       coalesce(c.dist, -1)::INT AS dist,
       coalesce(c.df, -1)::BIGINT AS df
FROM probes p LEFT JOIN (SELECT * FROM cand WHERE rn = 1) c USING (token)
ORDER BY token
"""


def q_bm25_suffix_engine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suffix (leading-wildcard) expansion THROUGH the packed index
    (operators/wildcard.expand_suffixes): '*ing join' expands the
    'ing' suffix against the REVERSED term dictionary — Lucene's
    ReverseStringFilter trick realized as a parquet table sorted by
    reverse(term), so the scan is a pushed-down StringStartsWith on
    'gni', never a full-vocabulary endswith.  Each expanded term joins
    the query with qtf 1; the literal 'join' rides along unchanged
    (and is itself covered by the pattern — qtf adds).  The oracle
    recomputes the same weighting relationally with LIKE '%ing'."""
    import shutil
    import tempfile

    from ics_search_engine_spark.operators.packed_index import (
        PackedIndex,
        build_packed_index,
    )
    from ics_search_engine_spark.operators.wildcard import bm25_topk_wildcard

    docs = _docs(spark, sf_dir)
    transcripts = docs.select(
        F.format_string("doc%08d", F.col("doc_id")).alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.col("text"),
    )
    out = tempfile.mkdtemp(prefix="gate_suffix_idx_")
    try:
        build_packed_index(
            spark, transcripts, out, range_bits=8, with_positions=False,
            stem=False,
        )
        pidx = PackedIndex(spark, out)
        top = bm25_topk_wildcard(spark, pidx, "*ing join", k=60).collect()
    finally:
        shutil.rmtree(out, ignore_errors=True)
    resolved = [(int(c[3:]), round(s, 6)) for c, _, s in top]
    resolved.sort(key=lambda r: (-r[1], r[0]))
    return spark.createDataFrame(
        resolved[:20], "doc_id long, bm25_r6 double"
    )


_SQL_BM25_SUFFIX = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
stats AS (SELECT count(*)::DOUBLE AS n, avg(len(toks)) AS avgdl FROM t),
posts AS (
  SELECT term, doc_id, count(*) AS tf, any_value(dl) AS dl FROM (
    SELECT doc_id, len(toks) AS dl, unnest(toks) AS term FROM t
  ) WHERE term LIKE '%ing' OR term = 'join'
  GROUP BY term, doc_id
),
dfs AS (SELECT term, count(*) AS df FROM posts GROUP BY term),
w AS (
  SELECT d.term, d.df,
         ((CASE WHEN d.term = 'join' THEN 1 ELSE 0 END)
          + (CASE WHEN d.term LIKE '%ing' THEN 1 ELSE 0 END))::DOUBLE
         * ln((s.n - d.df + 0.5) / (d.df + 0.5) + 1.0) AS w
  FROM dfs d CROSS JOIN stats s
),
scored AS (
  SELECT p.doc_id,
         w.w * (p.tf * 2.2 / (p.tf + 1.2 * (0.25 + 0.75 * p.dl / s.avgdl)))
         AS contrib
  FROM posts p JOIN w USING (term) CROSS JOIN stats s
)
SELECT doc_id, round(sum(contrib), 6) AS bm25_r6
FROM scored GROUP BY doc_id
ORDER BY bm25_r6 DESC, doc_id ASC LIMIT 20
"""


_SQL_BM25_WILDCARD = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
stats AS (SELECT count(*)::DOUBLE AS n, avg(len(toks)) AS avgdl FROM t),
posts AS (
  SELECT term, doc_id, count(*) AS tf, any_value(dl) AS dl FROM (
    SELECT doc_id, len(toks) AS dl, unnest(toks) AS term FROM t
  ) WHERE term LIKE 's%' OR term = 'join'
  GROUP BY term, doc_id
),
dfs AS (SELECT term, count(*) AS df FROM posts GROUP BY term),
w AS (
  SELECT d.term, d.df,
         ((CASE WHEN d.term = 'join' THEN 1 ELSE 0 END)
          + (CASE WHEN d.term LIKE 's%' THEN 1 ELSE 0 END))::DOUBLE
         * ln((s.n - d.df + 0.5) / (d.df + 0.5) + 1.0) AS w
  FROM dfs d CROSS JOIN stats s
),
scored AS (
  SELECT p.doc_id,
         w.w * (p.tf * 2.2 / (p.tf + 1.2 * (0.25 + 0.75 * p.dl / s.avgdl)))
         AS contrib
  FROM posts p JOIN w USING (term) CROSS JOIN stats s
)
SELECT doc_id, round(sum(contrib), 6) AS bm25_r6
FROM scored GROUP BY doc_id
ORDER BY bm25_r6 DESC, doc_id ASC LIMIT 20
"""


def q_bm25_regex_engine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anchored-regex expansion BM25 THROUGH the packed index
    (operators/wildcard.bm25_topk_regex): '/s[a-z]+/ join' expands the
    regex against the term dictionary (guaranteed-literal-prefix
    StartsWith pushdown + RLIKE refine), each matched term joining the
    query with qtf 1; the literal 'join' rides along.  The oracle
    recomputes the same weighting with regexp_full_match — the gate
    crosses THREE regex engines (Java/RLIKE, RE2/DuckDB, and the
    serving tier's Python re in tests), pinning the portable-subset
    contract."""
    import shutil
    import tempfile

    from ics_search_engine_spark.operators.packed_index import (
        PackedIndex,
        build_packed_index,
    )
    from ics_search_engine_spark.operators.wildcard import bm25_topk_regex

    docs = _docs(spark, sf_dir)
    transcripts = docs.select(
        F.format_string("doc%08d", F.col("doc_id")).alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.col("text"),
    )
    out = tempfile.mkdtemp(prefix="gate_regex_idx_")
    try:
        build_packed_index(
            spark, transcripts, out, range_bits=8, with_positions=False,
            stem=False,
        )
        pidx = PackedIndex(spark, out)
        top = bm25_topk_regex(spark, pidx, "/s[a-z]+/ join", k=60).collect()
    finally:
        shutil.rmtree(out, ignore_errors=True)
    out_df = spark.createDataFrame(
        top, "conv_id string, turn_idx int, score double"
    )
    return (
        out_df.select(
            F.substring("conv_id", 4, 8).cast("long").alias("doc_id"),
            F.round(F.col("score"), 6).alias("bm25_r6"),
        )
        .orderBy(F.desc("bm25_r6"), F.asc("doc_id"))
        .limit(20)
    )


_SQL_BM25_REGEX = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
stats AS (SELECT count(*)::DOUBLE AS n, avg(len(toks)) AS avgdl FROM t),
posts AS (
  SELECT term, doc_id, count(*) AS tf, any_value(dl) AS dl FROM (
    SELECT doc_id, len(toks) AS dl, unnest(toks) AS term FROM t
  ) WHERE regexp_full_match(term, 's[a-z]+') OR term = 'join'
  GROUP BY term, doc_id
),
dfs AS (SELECT term, count(*) AS df FROM posts GROUP BY term),
w AS (
  SELECT d.term, d.df,
         ((CASE WHEN d.term = 'join' THEN 1 ELSE 0 END)
          + (CASE WHEN regexp_full_match(d.term, 's[a-z]+')
             THEN 1 ELSE 0 END))::DOUBLE
         * ln((s.n - d.df + 0.5) / (d.df + 0.5) + 1.0) AS w
  FROM dfs d CROSS JOIN stats s
),
scored AS (
  SELECT p.doc_id,
         w.w * (p.tf * 2.2 / (p.tf + 1.2 * (0.25 + 0.75 * p.dl / s.avgdl)))
         AS contrib
  FROM posts p JOIN w USING (term) CROSS JOIN stats s
)
SELECT doc_id, round(sum(contrib), 6) AS bm25_r6
FROM scored GROUP BY doc_id
ORDER BY bm25_r6 DESC, doc_id ASC LIMIT 20
"""


# apostrophe stop words can never match a [a-z0-9]+ token, but escape
# them anyway so the literal list is valid SQL
_SQL_STOP_LIST = ", ".join(
    "'" + w.replace("'", "''") + "'" for w in sorted(STOP_WORDS)
)


def q_more_like_this_engine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """More-like-this THROUGH the packed index (operators/mlt): doc 7's
    text becomes the query — query-mode token counts, top-10 terms by
    rounded tf·idf, flat idf weights, source excluded — and the engine
    BM25-ranks the rest of the corpus from its packed artifacts.  The
    oracle transcribes the same selection + scoring relationally."""
    import shutil
    import tempfile

    from ics_search_engine_spark.operators.mlt import more_like_this
    from ics_search_engine_spark.operators.packed_index import (
        PackedIndex,
        build_packed_index,
    )

    docs = _docs(spark, sf_dir)
    transcripts = docs.select(
        F.format_string("doc%08d", F.col("doc_id")).alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.col("text"),
    )
    out = tempfile.mkdtemp(prefix="gate_mlt_idx_")
    try:
        build_packed_index(
            spark, transcripts, out, range_bits=8, with_positions=False,
            stem=False,
        )
        pidx = PackedIndex(spark, out)
        # rounded-boundary over-fetch, same rationale as the other
        # engine gates
        top = more_like_this(
            spark, pidx, transcripts, "doc00000007", 0, k=60,
            max_query_terms=10,
        ).collect()
    finally:
        shutil.rmtree(out, ignore_errors=True)
    resolved = [(int(c[3:]), round(s, 6)) for c, _, s in top]
    resolved.sort(key=lambda r: (-r[1], r[0]))
    return spark.createDataFrame(
        resolved[:20], "doc_id long, mlt_r6 double"
    )


_SQL_MLT_ENGINE = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
stats AS (SELECT count(*)::DOUBLE AS n, avg(len(toks)) AS avgdl FROM t),
srctf AS (
  SELECT term, count(*) AS tf FROM (
    SELECT unnest(toks) AS term FROM t WHERE doc_id = 7
  ) WHERE term NOT IN ({_SQL_STOP_LIST}) GROUP BY term
),
dfs AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM (
    SELECT doc_id, unnest(toks) AS term FROM t
  ) GROUP BY term
),
sel AS (
  SELECT q.term,
         ln((s.n - d.df + 0.5) / (d.df + 0.5) + 1.0) AS w
  FROM srctf q JOIN dfs d USING (term) CROSS JOIN stats s
  ORDER BY round(q.tf * ln((s.n - d.df + 0.5) / (d.df + 0.5) + 1.0), 6)
             DESC,
           q.term ASC
  LIMIT 10
),
posts AS (
  SELECT term, doc_id, count(*) AS tf, any_value(dl) AS dl FROM (
    SELECT doc_id, len(toks) AS dl, unnest(toks) AS term FROM t
  ) WHERE term IN (SELECT term FROM sel) AND doc_id <> 7
  GROUP BY term, doc_id
),
scored AS (
  SELECT p.doc_id,
         sel.w * (p.tf * 2.2 / (p.tf + 1.2 * (0.25 + 0.75 * p.dl / s.avgdl)))
           AS contrib
  FROM posts p JOIN sel USING (term) CROSS JOIN stats s
)
SELECT doc_id, round(sum(contrib), 6) AS mlt_r6
FROM scored GROUP BY doc_id
ORDER BY mlt_r6 DESC, doc_id ASC LIMIT 20
"""


def q_facet_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Facet rollup over the query's FULL match set through the packed
    index (operators/facets.facet_counts): distinct matched docs per
    role — the doc-value faceting a search result page shows next to
    the ranked hits.  Disjunctive match semantics (≥1 query term), the
    reference's own (/root/reference/search.py:148-162)."""
    import shutil
    import tempfile

    from ics_search_engine_spark.operators.facets import facet_counts
    from ics_search_engine_spark.operators.packed_index import (
        PackedIndex,
        build_packed_index,
    )

    docs = _docs(spark, sf_dir)
    transcripts = docs.select(
        F.format_string("doc%08d", F.col("doc_id")).alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.when(F.col("doc_id") % 2 == 0, "user")
        .otherwise("assistant")
        .alias("role"),
        F.col("text"),
    )
    out = tempfile.mkdtemp(prefix="gate_facet_idx_")
    try:
        build_packed_index(
            spark, transcripts, out, range_bits=8, with_positions=False,
            stem=False,
        )
        pidx = PackedIndex(spark, out)
        rows = facet_counts(
            spark, pidx, " ".join(DOCS_QUERY_TERMS),
            transcripts.select("conv_id", "turn_idx", "role"), "role",
        ).collect()
    finally:
        shutil.rmtree(out, ignore_errors=True)
    return spark.createDataFrame(
        [(r["role"], r["n_docs"]) for r in rows], "role string, n_docs long"
    )


_SQL_FACETS = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
m AS (
  SELECT DISTINCT doc_id FROM (
    SELECT doc_id, unnest(toks) AS term FROM t
  ) WHERE term IN ('spark','stream','window','join')
)
SELECT CASE WHEN doc_id % 2 = 0 THEN 'user' ELSE 'assistant' END AS role,
       count(*)::BIGINT AS n_docs
FROM m GROUP BY role ORDER BY role
"""


def q_bm25_explain_engine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The explain surface (operators/query.bm25_explain) under the
    gate: one row per (winner doc, matched term) with tf, df, and the
    BM25 contribution — Σ contrib per doc is the doc's score.  Winners
    are the rounded top-20 (exact top-60 over-fetch, the standard
    rounded-boundary trick); the oracle reproduces the identical
    breakdown relationally."""
    import shutil
    import tempfile

    from ics_search_engine_spark.operators.packed_index import (
        PackedIndex,
        build_packed_index,
    )
    from ics_search_engine_spark.operators.query import bm25_explain

    docs = _docs(spark, sf_dir)
    transcripts = docs.select(
        F.format_string("doc%08d", F.col("doc_id")).alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.col("text"),
    )
    out = tempfile.mkdtemp(prefix="gate_explain_idx_")
    try:
        build_packed_index(
            spark, transcripts, out, range_bits=8, with_positions=False,
            stem=False,
        )
        pidx = PackedIndex(spark, out)
        rows = bm25_explain(
            spark, pidx, " ".join(DOCS_QUERY_TERMS), k=60
        ).collect()
    finally:
        shutil.rmtree(out, ignore_errors=True)
    per_doc: dict[int, float] = {}
    for r in rows:
        per_doc[int(r["conv_id"][3:])] = round(r["score"], 6)
    winners = set(
        sorted(per_doc, key=lambda d: (-per_doc[d], d))[:20]
    )
    out_rows = sorted(
        (
            (int(r["conv_id"][3:]), r["term"], int(r["tf"]),
             int(r["df"]), round(r["contrib"], 6))
            for r in rows
            if int(r["conv_id"][3:]) in winners
        ),
        key=lambda x: (x[0], x[1]),
    )
    return spark.createDataFrame(
        out_rows,
        "doc_id long, term string, tf int, df long, contrib_r6 double",
    )


_SQL_EXPLAIN = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
stats AS (SELECT count(*)::DOUBLE AS n, avg(len(toks)) AS avgdl FROM t),
posts AS (
  SELECT term, doc_id, count(*) AS tf, any_value(dl) AS dl FROM (
    SELECT doc_id, len(toks) AS dl, unnest(toks) AS term FROM t
  ) WHERE term IN ('spark','stream','window','join')
  GROUP BY term, doc_id
),
dfs AS (SELECT term, count(*) AS df FROM posts GROUP BY term),
scored AS (
  SELECT p.doc_id, p.term, p.tf::INT AS tf, d.df,
         ln((s.n - d.df + 0.5) / (d.df + 0.5) + 1.0)
         * (p.tf * 2.2 / (p.tf + 1.2 * (0.25 + 0.75 * p.dl / s.avgdl)))
         AS contrib
  FROM posts p JOIN dfs d USING (term) CROSS JOIN stats s
),
perdoc AS (
  SELECT doc_id, round(sum(contrib), 6) AS r6 FROM scored GROUP BY doc_id
),
winners AS (SELECT doc_id FROM perdoc ORDER BY r6 DESC, doc_id ASC LIMIT 20)
SELECT s.doc_id, s.term, s.tf, s.df, round(s.contrib, 6) AS contrib_r6
FROM scored s JOIN winners w USING (doc_id)
ORDER BY s.doc_id, s.term
"""


def q_snippets_engine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snippet/highlight rendering THROUGH the packed positional index
    (operators/snippets.highlight_topk): each rounded-top-20 winner
    returns its first match position, every matched position, and the
    ±3-token surface window — the display payload the reference never
    derives from the positions it stores.  The oracle recomputes
    positions and the window relationally (1-based shift cancelled).

    Positions are emitted as a comma-joined STRING, not array<int>:
    the driver's canonicalizer sorts the result with pandas and a
    list-typed column raises ``unhashable type: 'list'`` (the r3
    failure) — gate outputs must be atomic columns only."""
    import shutil
    import tempfile

    from ics_search_engine_spark.operators.packed_index import (
        PackedIndex,
        build_packed_index,
    )
    from ics_search_engine_spark.operators.snippets import highlight_topk

    docs = _docs(spark, sf_dir)
    transcripts = docs.select(
        F.format_string("doc%08d", F.col("doc_id")).alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.col("text"),
    )
    out = tempfile.mkdtemp(prefix="gate_snip_idx_")
    try:
        build_packed_index(
            spark, transcripts, out, range_bits=8, with_positions=True,
            stem=False,
        )
        pidx = PackedIndex(spark, out)
        rows = highlight_topk(
            spark, pidx, transcripts, " ".join(DOCS_QUERY_TERMS),
            k=60, context=3,
        ).collect()
    finally:
        shutil.rmtree(out, ignore_errors=True)
    ranked = sorted(
        rows, key=lambda r: (-round(r["score"], 6), int(r["conv_id"][3:]))
    )[:20]
    out_rows = sorted(
        (
            (int(r["conv_id"][3:]), round(r["score"], 6),
             int(r["first_pos"]),
             ",".join(str(int(p)) for p in r["match_positions"]),
             r["snippet"])
            for r in ranked
        ),
        key=lambda x: x[0],
    )
    return spark.createDataFrame(
        out_rows,
        "doc_id long, bm25_r6 double, first_pos int, "
        "match_positions_csv string, snippet string",
    )


_SQL_SNIPPETS = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
{_SQL_BM25_CTES}
perdoc AS (
  SELECT doc_id, round(sum(contrib), 6) AS bm25_r6 FROM scored
  GROUP BY doc_id
),
winners AS (
  SELECT doc_id, bm25_r6 FROM perdoc
  ORDER BY bm25_r6 DESC, doc_id ASC LIMIT 20
),
pos AS (
  SELECT doc_id,
         list_sort(list_filter(range(1, len(toks)+1),
             i -> toks[i] IN ('spark','stream','window','join'))) AS p1s
  FROM t
)
SELECT w.doc_id, w.bm25_r6,
       (p.p1s[1] - 1)::INT AS first_pos,
       coalesce(array_to_string(
         list_transform(p.p1s, x -> (x - 1)::INT), ','), '')
         AS match_positions_csv,
       array_to_string(
         list_slice(t2.toks, greatest(1, p.p1s[1] - 3), p.p1s[1] + 3), ' '
       ) AS snippet
FROM winners w
JOIN pos p USING (doc_id)
JOIN t t2 USING (doc_id)
ORDER BY w.doc_id
"""


def q_qlang_engine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The query language end-to-end (operators/qlang.bm25_topk_qlang):
    '+spark s* -window "batch batch" join' exercises every production —
    required term, wildcard expansion, exclusion (of a term OUTSIDE the
    scoring set), positional phrase constraint, and a plain optional
    term — through the packed positional index.  Scoring keeps global
    stats (filter-query posture); the oracle transcribes the same
    multiplier table and constraints relationally."""
    import shutil
    import tempfile

    from ics_search_engine_spark.operators.packed_index import (
        PackedIndex,
        build_packed_index,
    )
    from ics_search_engine_spark.operators.qlang import bm25_topk_qlang

    docs = _docs(spark, sf_dir)
    transcripts = docs.select(
        F.format_string("doc%08d", F.col("doc_id")).alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.col("text"),
    )
    out = tempfile.mkdtemp(prefix="gate_qlang_idx_")
    try:
        build_packed_index(
            spark, transcripts, out, range_bits=8, with_positions=True,
            stem=False,
        )
        pidx = PackedIndex(spark, out)
        top = bm25_topk_qlang(
            spark, pidx, '+spark s* -window "batch batch" join', k=60
        ).collect()
    finally:
        shutil.rmtree(out, ignore_errors=True)
    resolved = [(int(c[3:]), round(s, 6)) for c, _, s in top]
    resolved.sort(key=lambda r: (-r[1], r[0]))
    return spark.createDataFrame(
        resolved[:20], "doc_id long, bm25_r6 double"
    )


# multiplier table: join +1 (optional), spark +1 (required), batch +2
# (phrase terms score), LIKE 's%' +1 (wildcard) — spark lands at 2
_SQL_QLANG = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
stats AS (SELECT count(*)::DOUBLE AS n, avg(len(toks)) AS avgdl FROM t),
alldfs AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM (
    SELECT doc_id, unnest(toks) AS term FROM t
  ) GROUP BY term
),
qterms AS (
  SELECT term, df,
         (CASE WHEN term = 'join'  THEN 1 ELSE 0 END)
         + (CASE WHEN term = 'spark' THEN 1 ELSE 0 END)
         + (CASE WHEN term = 'batch' THEN 2 ELSE 0 END)
         + (CASE WHEN term LIKE 's%' THEN 1 ELSE 0 END) AS qtf
  FROM alldfs
),
posts AS (
  SELECT term, doc_id, count(*) AS tf, any_value(dl) AS dl FROM (
    SELECT doc_id, len(toks) AS dl, unnest(toks) AS term FROM t
  ) WHERE term IN (SELECT term FROM qterms WHERE qtf > 0)
  GROUP BY term, doc_id
),
scored AS (
  SELECT p.doc_id,
         q.qtf * ln((s.n - q.df + 0.5) / (q.df + 0.5) + 1.0)
         * (p.tf * 2.2 / (p.tf + 1.2 * (0.25 + 0.75 * p.dl / s.avgdl)))
         AS contrib
  FROM posts p JOIN qterms q USING (term) CROSS JOIN stats s
),
cand AS (
  SELECT doc_id FROM t
  WHERE list_contains(toks, 'spark')
    AND NOT list_contains(toks, 'window')
    AND len(list_filter(range(1, len(toks)),
            i -> toks[i] = 'batch' AND toks[i+1] = 'batch')) > 0
)
SELECT s.doc_id, round(sum(s.contrib), 6) AS bm25_r6
FROM scored s JOIN cand c USING (doc_id)
GROUP BY s.doc_id
ORDER BY bm25_r6 DESC, s.doc_id ASC LIMIT 20
"""


def q_bm25_fuzzy_engine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy matching THROUGH the packed index
    (operators/fuzzy.bm25_topk_fuzzy): the misspelled query
    'sprak jion' expands to dictionary terms within Levenshtein 2
    ('spark', 'join' — transposition costs 2 in classic Levenshtein,
    which Spark and DuckDB both implement) and BM25-ranks the union.
    The reference returns nothing for a misspelling
    (/root/reference/search.py:56-57)."""
    import shutil
    import tempfile

    from ics_search_engine_spark.operators.fuzzy import bm25_topk_fuzzy
    from ics_search_engine_spark.operators.packed_index import (
        PackedIndex,
        build_packed_index,
    )

    docs = _docs(spark, sf_dir)
    transcripts = docs.select(
        F.format_string("doc%08d", F.col("doc_id")).alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.col("text"),
    )
    out = tempfile.mkdtemp(prefix="gate_fuzzy_idx_")
    try:
        build_packed_index(
            spark, transcripts, out, range_bits=8, with_positions=False,
            stem=False,
        )
        pidx = PackedIndex(spark, out)
        top = bm25_topk_fuzzy(
            spark, pidx, "sprak jion", k=60, max_dist=2
        ).collect()
    finally:
        shutil.rmtree(out, ignore_errors=True)
    resolved = [(int(c[3:]), round(s, 6)) for c, _, s in top]
    resolved.sort(key=lambda r: (-r[1], r[0]))
    return spark.createDataFrame(
        resolved[:20], "doc_id long, bm25_r6 double"
    )


def q_bm25_fuzzy_symspell(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SymSpell deletion-index fuzzy path (operators/fuzzy,
    expander='symspell'): same query and same oracle as
    bm25_fuzzy_engine — the deletion dictionary's candidates, after
    exact Levenshtein verification, must reproduce the scan
    expansion BIT-IDENTICALLY, so the gate result is identical too.
    This is the 10^8-vocabulary scale path: per-query cost is a
    pushed-down ``dkey IN (...)`` over the sorted deletes table, not
    a vocabulary scan."""
    import shutil
    import tempfile

    from ics_search_engine_spark.operators.fuzzy import bm25_topk_fuzzy
    from ics_search_engine_spark.operators.packed_index import (
        PackedIndex,
        build_packed_index,
    )

    docs = _docs(spark, sf_dir)
    transcripts = docs.select(
        F.format_string("doc%08d", F.col("doc_id")).alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.col("text"),
    )
    out = tempfile.mkdtemp(prefix="gate_symspell_idx_")
    try:
        build_packed_index(
            spark, transcripts, out, range_bits=8, with_positions=False,
            stem=False,
        )
        pidx = PackedIndex(spark, out)
        top = bm25_topk_fuzzy(
            spark, pidx, "sprak jion", k=60, max_dist=2,
            expander="symspell",
        ).collect()
    finally:
        shutil.rmtree(out, ignore_errors=True)
    resolved = [(int(c[3:]), round(s, 6)) for c, _, s in top]
    resolved.sort(key=lambda r: (-r[1], r[0]))
    return spark.createDataFrame(
        resolved[:20], "doc_id long, bm25_r6 double"
    )


# at sf scale each probe matches exactly one dictionary term within
# distance 2 (verified), so the multiplier table is 1 per matched term
_SQL_FUZZY = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
stats AS (SELECT count(*)::DOUBLE AS n, avg(len(toks)) AS avgdl FROM t),
v AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM (
    SELECT doc_id, unnest(toks) AS term FROM t
  ) GROUP BY term
),
qterms AS (
  SELECT term, df,
         (CASE WHEN levenshtein(term, 'sprak') <= 2 THEN 1 ELSE 0 END)
         + (CASE WHEN levenshtein(term, 'jion') <= 2 THEN 1 ELSE 0 END)
           AS qtf
  FROM v
),
posts AS (
  SELECT term, doc_id, count(*) AS tf, any_value(dl) AS dl FROM (
    SELECT doc_id, len(toks) AS dl, unnest(toks) AS term FROM t
  ) WHERE term IN (SELECT term FROM qterms WHERE qtf > 0)
  GROUP BY term, doc_id
),
scored AS (
  SELECT p.doc_id,
         q.qtf * ln((s.n - q.df + 0.5) / (q.df + 0.5) + 1.0)
         * (p.tf * 2.2 / (p.tf + 1.2 * (0.25 + 0.75 * p.dl / s.avgdl)))
         AS contrib
  FROM posts p JOIN qterms q USING (term) CROSS JOIN stats s
)
SELECT doc_id, round(sum(contrib), 6) AS bm25_r6
FROM scored GROUP BY doc_id
ORDER BY bm25_r6 DESC, doc_id ASC LIMIT 20
"""


def q_term_pmi_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining (operators/textstats.term_cooccurrence): PMI
    of term pairs over document-level presence, vocabulary pruned to
    the df-heaviest terms before the pair join.  Top-20 by rounded PMI;
    ordering on the ROUNDED value in both engines."""
    from ics_search_engine_spark.operators.textstats import (
        term_cooccurrence,
    )

    toks = _docs(spark, sf_dir).select(
        "doc_id", toks_col().alias("toks")
    )
    pairs = term_cooccurrence(toks, top_v=100, min_pairs=5)
    return (
        pairs.select(
            "t1", "t2", "n_pair", F.round("pmi", 6).alias("pmi_r6")
        )
        .orderBy(F.desc("pmi_r6"), "t1", "t2")
        .limit(20)
    )


_SQL_PMI = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
n AS (SELECT count(*)::DOUBLE AS n FROM t),
pres AS (SELECT DISTINCT doc_id, unnest(toks) AS term FROM t),
dfs AS (SELECT term, count(*) AS df FROM pres GROUP BY term),
pairs AS (
  SELECT a.term AS t1, b.term AS t2, count(*) AS n_pair
  FROM pres a JOIN pres b USING (doc_id)
  WHERE a.term < b.term
  GROUP BY a.term, b.term
  HAVING count(*) >= 5
)
SELECT p.t1, p.t2, p.n_pair,
       round(ln(p.n_pair * n.n / (d1.df * d2.df)), 6) AS pmi_r6
FROM pairs p
JOIN dfs d1 ON d1.term = p.t1
JOIN dfs d2 ON d2.term = p.t2
CROSS JOIN n
ORDER BY pmi_r6 DESC, p.t1, p.t2 LIMIT 20
"""


def q_bm25_boosted_roles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Role-boosted BM25 (operators/query.bm25_topk_boosted) — the
    reference's importance weighting (weighted_tf = tf × (1 +
    importance), index_manager.py:48) re-expressed over transcript
    roles: user turns boost 1.0, assistant turns 0.0; global stats stay
    unweighted, exactly like the reference's."""
    from ics_search_engine_spark.operators import index_build as ib
    from ics_search_engine_spark.operators.query import bm25_topk_boosted

    docs = _docs(spark, sf_dir)
    tr = docs.select(
        F.format_string("doc%08d", F.col("doc_id")).alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.when(F.col("doc_id") % 2 == 0, "user")
        .otherwise("assistant")
        .alias("role"),
        F.col("text"),
    )
    toks = ib.tokenized(tr, stem=False)
    posts = ib.postings(toks, with_positions=False)
    n, avgdl = ib.corpus_stats(toks)
    boosts = tr.select(
        "conv_id", "turn_idx",
        F.when(F.col("role") == "user", 1.0).otherwise(0.0).alias("boost"),
    )
    top = bm25_topk_boosted(
        spark, posts, boosts, " ".join(DOCS_QUERY_TERMS), n, avgdl, k=60
    ).collect()
    resolved = [(int(c[3:]), round(s, 6)) for c, _, s in top]
    resolved.sort(key=lambda r: (-r[1], r[0]))
    return spark.createDataFrame(
        resolved[:20], "doc_id long, bm25_r6 double"
    )


_SQL_BM25_BOOSTED = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
stats AS (SELECT count(*)::DOUBLE AS n, avg(len(toks)) AS avgdl FROM t),
posts AS (
  SELECT term, doc_id, count(*) AS tf, any_value(dl) AS dl FROM (
    SELECT doc_id, len(toks) AS dl, unnest(toks) AS term FROM t
  ) WHERE term IN ('spark','stream','window','join')
  GROUP BY term, doc_id
),
dfs AS (SELECT term, count(*) AS df FROM posts GROUP BY term),
scored AS (
  SELECT p.doc_id,
         ln((s.n - d.df + 0.5) / (d.df + 0.5) + 1.0)
         * ((p.tf * (CASE WHEN p.doc_id % 2 = 0 THEN 2.0 ELSE 1.0 END))
            * 2.2
            / ((p.tf * (CASE WHEN p.doc_id % 2 = 0 THEN 2.0 ELSE 1.0 END))
               + 1.2 * (0.25 + 0.75 * p.dl / s.avgdl)))
         AS contrib
  FROM posts p JOIN dfs d USING (term) CROSS JOIN stats s
)
SELECT doc_id, round(sum(contrib), 6) AS bm25_r6
FROM scored GROUP BY doc_id
ORDER BY bm25_r6 DESC, doc_id ASC LIMIT 20
"""


def q_bm25_engine_segmented(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SEGMENTED engine with point-lookup resolution under the
    DuckDB gate: the documents table splits into two segments (whole
    docs by doc_id parity), each built as an independent packed index,
    queried as one logical index via bm25_topk_segmented with
    resolve='pushdown' — bounded global top-(K+ε) then per-segment
    doc_ord IN (...) point lookups, NO full docmap scan.  The oracle is
    the same relational BM25 as bm25_engine_packed: segment recombination
    (N, avgdl, df exact-sum across segments) must reproduce the single-
    corpus computation bit-for-bit before rounding."""
    import shutil
    import tempfile

    from ics_search_engine_spark.operators.packed_index import (
        build_packed_index,
    )
    from ics_search_engine_spark.operators.segments import (
        SegmentedIndex,
        bm25_topk_segmented,
    )

    docs = _docs(spark, sf_dir)
    transcripts = docs.select(
        F.format_string("doc%08d", F.col("doc_id")).alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.col("text"),
        (F.col("doc_id") % 2).alias("half"),
    )
    base = tempfile.mkdtemp(prefix="gate_engine_seg_")
    try:
        paths = []
        for half in (0, 1):
            p = f"{base}/seg{half}"
            build_packed_index(
                spark,
                transcripts.filter(F.col("half") == half).drop("half"),
                p, range_bits=8, with_positions=False, stem=False,
            )
            paths.append(p)
        sidx = SegmentedIndex(spark, paths)
        top = bm25_topk_segmented(
            spark, sidx, " ".join(DOCS_QUERY_TERMS), k=60,
            resolve="pushdown",
        )
    finally:
        # bm25_topk_segmented(resolve='pushdown') collects during the
        # call and returns a driver-local DataFrame — safe to remove
        shutil.rmtree(base, ignore_errors=True)
    return (
        top.select(
            F.substring("conv_id", 4, 8).cast("long").alias("doc_id"),
            F.round(F.col("score"), 6).alias("bm25_r6"),
        )
        .orderBy(F.desc("bm25_r6"), F.asc("doc_id"))
        .limit(20)
    )


def q_bm25_engine_deletes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query-time tombstones under the DuckDB gate (the LSM delete
    path, SURVEY §2.7): build the two-segment index, find the top-3
    winners, tombstone them, re-query.  The reference semantics the
    engine pins: tombstoned docs vanish from RESULTS exactly, while
    N/avgdl/df stay pre-delete until a compaction applies tombstones
    physically — so every surviving score is bit-identical to the
    undeleted computation, and the oracle is the same relational BM25
    minus its own top-3 rank rows (engine top-3 == oracle top-3 is
    itself gated by bm25_engine_segmented)."""
    import shutil
    import tempfile

    from ics_search_engine_spark.operators.packed_index import (
        build_packed_index,
    )
    from ics_search_engine_spark.operators.segments import (
        SegmentedIndex,
        bm25_topk_segmented,
    )

    docs = _docs(spark, sf_dir)
    transcripts = docs.select(
        F.format_string("doc%08d", F.col("doc_id")).alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.col("text"),
        (F.col("doc_id") % 2).alias("half"),
    )
    base = tempfile.mkdtemp(prefix="gate_engine_del_")
    try:
        paths = []
        for half in (0, 1):
            p = f"{base}/seg{half}"
            build_packed_index(
                spark,
                transcripts.filter(F.col("half") == half).drop("half"),
                p, range_bits=8, with_positions=False, stem=False,
            )
            paths.append(p)
        sidx = SegmentedIndex(spark, paths)
        q = " ".join(DOCS_QUERY_TERMS)
        tombstones = {
            (r["conv_id"], r["turn_idx"])
            for r in bm25_topk_segmented(spark, sidx, q, k=3).collect()
        }
        # pushdown resolution: collects during the call (safe to rmtree
        # below) and gates the tombstones+point-lookup combination
        top = bm25_topk_segmented(
            spark, sidx, q, k=60, deletes=tombstones, resolve="pushdown"
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return (
        top.select(
            F.substring("conv_id", 4, 8).cast("long").alias("doc_id"),
            F.round(F.col("score"), 6).alias("bm25_r6"),
        )
        .orderBy(F.desc("bm25_r6"), F.asc("doc_id"))
        .limit(20)
    )


def q_bm25_engine_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document update (upsert) under the DuckDB gate — the LSM
    lifecycle's third verb (operators/segments.py "Document update"):
    every 7th document is re-ingested with appended text via
    build_upsert_segment, whose supersedes.json shadows the base
    segment's versions.  Semantics pinned: dead versions vanish from
    RESULTS exactly, live (v2) documents score with their NEW tf/dl,
    and collection stats (N, avgdl, df) count BOTH versions until
    compaction — so the oracle scores the both-versions corpus and
    drops the dead rows from the ranking.  Resolution runs the
    pushdown (point-lookup) path, gating the shadows × pushdown
    combination."""
    import shutil
    import tempfile

    from ics_search_engine_spark.operators.packed_index import (
        build_packed_index,
    )
    from ics_search_engine_spark.operators.segments import (
        SegmentedIndex,
        bm25_topk_segmented,
        build_upsert_segment,
    )

    docs = _docs(spark, sf_dir)
    transcripts = docs.select(
        F.format_string("doc%08d", F.col("doc_id")).alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.col("text"),
        (F.col("doc_id") % 7 == 3).alias("upd"),
    )
    base = tempfile.mkdtemp(prefix="gate_engine_ups_")
    try:
        build_packed_index(
            spark, transcripts.drop("upd"), f"{base}/seg0",
            range_bits=8, with_positions=False, stem=False,
        )
        delta = transcripts.filter("upd").select(
            "conv_id", "turn_idx",
            F.concat(F.col("text"), F.lit(" spark stream spark")).alias(
                "text"
            ),
        )
        build_upsert_segment(
            spark, delta, f"{base}/seg1",
            range_bits=8, with_positions=False, stem=False,
        )
        sidx = SegmentedIndex(spark, [f"{base}/seg0", f"{base}/seg1"])
        top = bm25_topk_segmented(
            spark, sidx, " ".join(DOCS_QUERY_TERMS), k=60,
            resolve="pushdown",
        )
    finally:
        # pushdown resolution collects during the call — safe to remove
        shutil.rmtree(base, ignore_errors=True)
    return (
        top.select(
            F.substring("conv_id", 4, 8).cast("long").alias("doc_id"),
            F.round(F.col("score"), 6).alias("bm25_r6"),
        )
        .orderBy(F.desc("bm25_r6"), F.asc("doc_id"))
        .limit(20)
    )


def _convs_engine_topk(
    spark: SparkSession, sf_dir: str, agg: str
) -> DataFrame:
    """Conversation-grain rollup over the PACKED engine under the
    DuckDB gate (operators/convs.py): documents become 5-turn
    conversations (conv = doc_id // 5, turn = doc_id % 5), the packed
    index is built stem-free, and bm25_topk_convs_packed ranks whole
    conversations by the agg of their turns' BM25 scores.  The oracle
    rolls up the same relational per-doc BM25 by doc_id // 5.
    ``matched_turns`` rides through as an exact integer."""
    import shutil
    import tempfile

    from ics_search_engine_spark.operators.convs import (
        bm25_topk_convs_packed,
    )
    from ics_search_engine_spark.operators.packed_index import (
        PackedIndex,
        build_packed_index,
    )

    docs = _docs(spark, sf_dir)
    transcripts = docs.select(
        F.format_string(
            "conv%07d", (F.col("doc_id") / 5).cast("long")
        ).alias("conv_id"),
        (F.col("doc_id") % 5).cast("int").alias("turn_idx"),
        F.col("text"),
    )
    out = tempfile.mkdtemp(prefix="gate_convs_idx_")
    try:
        build_packed_index(
            spark, transcripts, out, range_bits=8, with_positions=False,
            stem=False,
        )
        pidx = PackedIndex(spark, out)
        # over-fetch exact-score winners, report 20 by rounded order
        # (same boundary discipline as the other engine gates)
        top = bm25_topk_convs_packed(
            spark, pidx, " ".join(DOCS_QUERY_TERMS), k=60, agg=agg
        )
    finally:
        # bm25_topk_convs_packed collects during the call
        shutil.rmtree(out, ignore_errors=True)
    return (
        top.select(
            F.substring("conv_id", 5, 7).cast("long").alias("conv_num"),
            F.round(F.col("score"), 6).alias("bm25_r6"),
            "matched_turns",
        )
        .orderBy(F.desc("bm25_r6"), F.asc("conv_num"))
        .limit(20)
    )


def q_bm25_convs_engine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """agg='max' (rank conversations by best turn) — order-free float
    math, bit-exact across engines before rounding."""
    return _convs_engine_topk(spark, sf_dir, "max")


def q_bm25_convs_engine_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """agg='sum' (rank by total matching mass) — cross-engine float
    sums compare rounded, like every sum-based gate here."""
    return _convs_engine_topk(spark, sf_dir, "sum")


_SQL_BM25_CONVS_TMPL = """
WITH t AS (SELECT doc_id, {toks} AS toks FROM documents),
{_SQL_BM25_CTES}
doc_scores AS (
  SELECT doc_id, sum(contrib) AS s FROM scored GROUP BY doc_id
),
convs AS (
  SELECT doc_id // 5 AS conv_num, {agg}(s) AS s,
         count(*) AS matched_turns
  FROM doc_scores GROUP BY doc_id // 5
)
SELECT conv_num, round(s, 6) AS bm25_r6, matched_turns
FROM convs ORDER BY bm25_r6 DESC, conv_num ASC LIMIT 20
""".replace("{_SQL_BM25_CTES}", _SQL_BM25_CTES)
_SQL_BM25_CONVS_TMPL = _SQL_BM25_CONVS_TMPL.replace("{toks}", _SQL_TOKS)
_SQL_BM25_CONVS = _SQL_BM25_CONVS_TMPL.replace("{agg}", "max")
_SQL_BM25_CONVS_SUM = _SQL_BM25_CONVS_TMPL.replace("{agg}", "sum")


def q_bm25_collapse_engine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Field collapsing (one best turn per conversation) through the
    PACKED engine (operators/convs.bm25_topk_collapse_packed): 5-turn
    conversations, stem-free index; the representative turn's argmax is
    an EXACT float comparison of complete turn scores (order-free max),
    so both engines pick the same turn; cross-engine per-turn sums
    compare rounded like every sum-based gate."""
    import shutil
    import tempfile

    from ics_search_engine_spark.operators.convs import (
        bm25_topk_collapse_packed,
    )
    from ics_search_engine_spark.operators.packed_index import (
        PackedIndex,
        build_packed_index,
    )

    docs = _docs(spark, sf_dir)
    transcripts = docs.select(
        F.format_string(
            "conv%07d", (F.col("doc_id") / 5).cast("long")
        ).alias("conv_id"),
        (F.col("doc_id") % 5).cast("int").alias("turn_idx"),
        F.col("text"),
    )
    out = tempfile.mkdtemp(prefix="gate_collapse_idx_")
    try:
        build_packed_index(
            spark, transcripts, out, range_bits=8, with_positions=False,
            stem=False,
        )
        pidx = PackedIndex(spark, out)
        top = bm25_topk_collapse_packed(
            spark, pidx, " ".join(DOCS_QUERY_TERMS), k=60
        ).collect()
    finally:
        shutil.rmtree(out, ignore_errors=True)
    rows = [
        (int(c[4:]), int(t), round(float(s), 6)) for c, t, s in top
    ]
    rows.sort(key=lambda r: (-r[2], r[0], r[1]))
    return spark.createDataFrame(
        rows[:20], "conv_num long, turn_idx int, bm25_r6 double"
    )


_SQL_BM25_COLLAPSE = """
WITH t AS (SELECT doc_id, {toks} AS toks FROM documents),
{_SQL_BM25_CTES}
doc_scores AS (
  SELECT doc_id, sum(contrib) AS s FROM scored GROUP BY doc_id
),
best AS (
  SELECT doc_id, s,
         row_number() OVER (
           PARTITION BY doc_id // 5 ORDER BY s DESC, doc_id ASC
         ) AS rn
  FROM doc_scores
)
SELECT doc_id // 5 AS conv_num, (doc_id % 5)::INT AS turn_idx,
       round(s, 6) AS bm25_r6
FROM best WHERE rn = 1
ORDER BY bm25_r6 DESC, conv_num ASC, turn_idx ASC LIMIT 20
""".replace("{_SQL_BM25_CTES}", _SQL_BM25_CTES).replace("{toks}", _SQL_TOKS)


def q_bm25_conjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Posting-list INTERSECTION (AND semantics, SURVEY.md §2.3): BM25
    top-20 over documents containing ALL four query terms — the n-way
    join the reference replaces with a union + match-fraction boost."""
    docs = _docs(spark, sf_dir).select("doc_id", toks_col().alias("toks"))
    stats = docs.agg(
        F.count("*").alias("n"), F.sum(F.size("toks")).alias("sdl")
    ).collect()[0]
    n, avgdl = stats["n"], stats["sdl"] / stats["n"]
    posts = (
        docs.select("doc_id", F.size("toks").alias("dl"),
                    F.explode("toks").alias("term"))
        .filter(F.col("term").isin(DOCS_QUERY_TERMS))
        .groupBy("term", "doc_id")
        .agg(F.count("*").alias("tf"), F.first("dl").alias("dl"))
    )
    dfs = posts.groupBy("term").agg(F.count("*").alias("df"))
    tf, dl = F.col("tf").cast("double"), F.col("dl").cast("double")
    idf = F.log((F.lit(float(n)) - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
    tfn = tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / F.lit(avgdl)))
    return (
        posts.join(F.broadcast(dfs), "term")
        .withColumn("contrib", idf * tfn)
        .groupBy("doc_id")
        .agg(
            F.round(F.sum("contrib"), 6).alias("bm25_r6"),
            F.count("*").alias("m"),
        )
        .filter(F.col("m") == len(DOCS_QUERY_TERMS))
        .select("doc_id", "bm25_r6")
        .orderBy(F.desc("bm25_r6"), F.asc("doc_id"))
        .limit(20)
    )


_SQL_BM25_CONJ = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
stats AS (SELECT count(*)::DOUBLE AS n, avg(len(toks)) AS avgdl FROM t),
posts AS (
  SELECT term, doc_id, count(*) AS tf, any_value(dl) AS dl FROM (
    SELECT doc_id, len(toks) AS dl, unnest(toks) AS term FROM t
  ) WHERE term IN ('spark','stream','window','join')
  GROUP BY term, doc_id
),
dfs AS (SELECT term, count(*) AS df FROM posts GROUP BY term),
scored AS (
  SELECT p.doc_id,
         ln((s.n - d.df + 0.5) / (d.df + 0.5) + 1.0)
         * (p.tf * 2.2 / (p.tf + 1.2 * (0.25 + 0.75 * p.dl / s.avgdl)))
         AS contrib
  FROM posts p JOIN dfs d USING (term) CROSS JOIN stats s
)
SELECT doc_id, round(sum(contrib), 6) AS bm25_r6
FROM scored GROUP BY doc_id
HAVING count(*) = 4
ORDER BY bm25_r6 DESC, doc_id ASC LIMIT 20
"""


# doc-attribute filter for the filtered-search gates: ~1/5 of the
# documents table by source — selective enough that the filtered top-20
# differs from the unfiltered one, wide enough that 20 results exist
FILTER_SOURCES = ["src1", "src3", "src5", "src7"]


def q_bm25_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter-query semantics (operators/query.bm25_topk_filtered):
    BM25 top-20 restricted to docs from FILTER_SOURCES, with idf /
    avgdl / n_docs CORPUS-GLOBAL (Lucene filter convention — the
    predicate restricts results, never re-derives stats)."""
    from ics_search_engine_spark.operators import index_build as ib
    from ics_search_engine_spark.operators.query import bm25_topk_filtered

    docs = _docs(spark, sf_dir)
    transcripts = docs.select(
        F.format_string("doc%08d", F.col("doc_id")).alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.col("text"),
    )
    toks = ib.tokenized(transcripts, stem=False)
    posts = ib.postings(toks, with_positions=False)
    n, avgdl = ib.corpus_stats(toks)
    allowed = docs.filter(F.col("source").isin(FILTER_SOURCES)).select(
        F.format_string("doc%08d", F.col("doc_id")).alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
    )
    top = bm25_topk_filtered(
        spark, posts, " ".join(DOCS_QUERY_TERMS), n, avgdl, allowed, k=60
    )
    return (
        top.select(
            F.substring("conv_id", 4, 8).cast("long").alias("doc_id"),
            F.round(F.col("score"), 6).alias("bm25_r6"),
        )
        .orderBy(F.desc("bm25_r6"), F.asc("doc_id"))
        .limit(20)
    )


def q_bm25_filtered_engine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PACKED engine's filter-query path under the gate
    (operators/filtered.bm25_topk_filtered_packed): same filter, same
    global-stats semantics, answered from packed shards via the
    shard-cogroup mask — must reproduce the relational oracle."""
    import shutil
    import tempfile

    from ics_search_engine_spark.operators.filtered import (
        bm25_topk_filtered_packed,
    )
    from ics_search_engine_spark.operators.packed_index import (
        PackedIndex,
        build_packed_index,
    )

    docs = _docs(spark, sf_dir)
    transcripts = docs.select(
        F.format_string("doc%08d", F.col("doc_id")).alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.col("text"),
    )
    allowed = docs.filter(F.col("source").isin(FILTER_SOURCES)).select(
        F.format_string("doc%08d", F.col("doc_id")).alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
    )
    out = tempfile.mkdtemp(prefix="gate_filtered_idx_")
    try:
        build_packed_index(
            spark, transcripts, out, range_bits=8, with_positions=False,
            stem=False,
        )
        pidx = PackedIndex(spark, out)
        top = bm25_topk_filtered_packed(
            spark, pidx, " ".join(DOCS_QUERY_TERMS), allowed, k=60
        )
    finally:
        shutil.rmtree(out, ignore_errors=True)
    return (
        top.select(
            F.substring("conv_id", 4, 8).cast("long").alias("doc_id"),
            F.round(F.col("score"), 6).alias("bm25_r6"),
        )
        .orderBy(F.desc("bm25_r6"), F.asc("doc_id"))
        .limit(20)
    )


# stats CTEs are computed over the FULL corpus; the source predicate
# applies only to which docs may rank — the filter-query convention
_SQL_BM25_FILTERED = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
stats AS (SELECT count(*)::DOUBLE AS n, avg(len(toks)) AS avgdl FROM t),
posts AS (
  SELECT term, doc_id, count(*) AS tf, any_value(dl) AS dl FROM (
    SELECT doc_id, len(toks) AS dl, unnest(toks) AS term FROM t
  ) WHERE term IN ('spark','stream','window','join')
  GROUP BY term, doc_id
),
dfs AS (SELECT term, count(*) AS df FROM posts GROUP BY term),
scored AS (
  SELECT p.doc_id,
         ln((s.n - d.df + 0.5) / (d.df + 0.5) + 1.0)
         * (p.tf * 2.2 / (p.tf + 1.2 * (0.25 + 0.75 * p.dl / s.avgdl)))
         AS contrib
  FROM posts p JOIN dfs d USING (term) CROSS JOIN stats s
)
SELECT sc.doc_id, round(sum(sc.contrib), 6) AS bm25_r6
FROM scored sc JOIN documents doc ON sc.doc_id = doc.doc_id
WHERE doc.source IN ('src1','src3','src5','src7')
GROUP BY sc.doc_id
ORDER BY bm25_r6 DESC, sc.doc_id ASC LIMIT 20
"""


def q_turn_context(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Turn-context expansion end-to-end (operators/context.py): the
    documents table regrouped as 5-turn conversations (conv = doc_id
    DIV 5, turn = doc_id % 5, role by parity), BM25 top-5 anchor turns
    for the fixed query (rounded-score selection boundary, same
    convention as the other gates), each expanded with its ±1
    neighboring turns via the broadcast range join."""
    from ics_search_engine_spark.operators import index_build as ib
    from ics_search_engine_spark.operators.context import with_turn_context
    from ics_search_engine_spark.operators.query import bm25_topk

    docs = _docs(spark, sf_dir)
    tr = docs.select(
        F.format_string("conv%07d", F.expr("doc_id DIV 5")).alias("conv_id"),
        (F.col("doc_id") % 5).cast("int").alias("turn_idx"),
        F.when(F.col("doc_id") % 2 == 0, "user")
        .otherwise("assistant")
        .alias("role"),
        F.col("text"),
    )
    toks = ib.tokenized(tr, stem=False)
    posts = ib.postings(toks, with_positions=False)
    n, avgdl = ib.corpus_stats(toks)
    exact = bm25_topk(
        spark, posts, " ".join(DOCS_QUERY_TERMS), n, avgdl, k=20
    )
    anchors = (
        exact.select(
            "conv_id", "turn_idx", F.round("score", 6).alias("r6")
        )
        .orderBy(F.desc("r6"), F.asc("conv_id"), F.asc("turn_idx"))
        .limit(5)
    )
    return with_turn_context(anchors, tr, before=1, after=1)


_SQL_TURN_CONTEXT = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
{_SQL_BM25_CTES}
perdoc AS (
  SELECT doc_id, round(sum(contrib), 6) AS r6 FROM scored GROUP BY doc_id
),
anchors AS (
  SELECT doc_id FROM perdoc ORDER BY r6 DESC, doc_id ASC LIMIT 5
)
SELECT printf('conv%07d', a.doc_id // 5) AS conv_id,
       (a.doc_id % 5)::INT AS turn_idx,
       (d.doc_id % 5)::INT AS ctx_turn_idx,
       CASE WHEN d.doc_id % 2 = 0 THEN 'user' ELSE 'assistant' END AS role,
       d.text AS text
FROM anchors a
JOIN documents d
  ON d.doc_id // 5 = a.doc_id // 5
 AND d.doc_id % 5 BETWEEN a.doc_id % 5 - 1 AND a.doc_id % 5 + 1
ORDER BY conv_id, turn_idx, ctx_turn_idx
"""


def q_phrase_engine_packed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional phrase search THROUGH the packed index: build a
    stem-free positional index (tokenize → positions → doc-range shards
    → delta+varint pack including the positions section), then run the
    packed phrase operator (operators/phrase.phrase_topk: decode
    positions for the phrase's terms only, pure-array intersection).
    The oracle recomputes adjacency relationally — the engine must
    reproduce it from its packed positional payloads."""
    import shutil
    import tempfile

    from ics_search_engine_spark.operators.packed_index import (
        PackedIndex,
        build_packed_index,
    )
    from ics_search_engine_spark.operators.phrase import phrase_topk

    docs = _docs(spark, sf_dir)
    transcripts = docs.select(
        F.format_string("doc%08d", F.col("doc_id")).alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.col("text"),
    )
    out = tempfile.mkdtemp(prefix="gate_phrase_idx_")
    try:
        build_packed_index(
            spark, transcripts, out, range_bits=8, with_positions=True,
            stem=False,
        )
        pidx = PackedIndex(spark, out)
        # match_count is an exact integer — no rounded-boundary overfetch
        # needed; ties at the k-th count break on doc_id in both engines
        rows = phrase_topk(spark, pidx, "batch batch", k=20).collect()
    finally:
        shutil.rmtree(out, ignore_errors=True)
    resolved = [(int(c[3:]), int(m)) for c, _, m in rows]
    resolved.sort(key=lambda r: (-r[1], r[0]))
    return spark.createDataFrame(
        resolved[:20], "doc_id long, match_count int"
    )


_SQL_PHRASE_ENGINE = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
m AS (
  SELECT doc_id,
         len(list_filter(range(1, len(toks)),
             i -> toks[i] = 'batch' AND toks[i+1] = 'batch'))::INT AS match_count
  FROM t WHERE len(toks) >= 2
)
SELECT doc_id, match_count FROM m WHERE match_count > 0
ORDER BY match_count DESC, doc_id ASC LIMIT 20
"""


def q_near_engine_packed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unordered-proximity (NEAR/5) search THROUGH the packed positional
    index (operators/phrase.near_topk): the adjacency-query capability
    the reference stored positions for but never built
    (/root/reference/todo.md:70-72).  Anchor = lexicographically first
    distinct term ('join'); match_count = anchor positions with every
    other term within 5 indexed-token slots.  The oracle recomputes the
    same count relationally from 1-based token positions (the shift
    cancels inside |q−p|)."""
    import shutil
    import tempfile

    from ics_search_engine_spark.operators.packed_index import (
        PackedIndex,
        build_packed_index,
    )
    from ics_search_engine_spark.operators.phrase import near_topk

    docs = _docs(spark, sf_dir)
    transcripts = docs.select(
        F.format_string("doc%08d", F.col("doc_id")).alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.col("text"),
    )
    out = tempfile.mkdtemp(prefix="gate_near_idx_")
    try:
        build_packed_index(
            spark, transcripts, out, range_bits=8, with_positions=True,
            stem=False,
        )
        pidx = PackedIndex(spark, out)
        rows = near_topk(spark, pidx, "spark join", window=5, k=20).collect()
    finally:
        shutil.rmtree(out, ignore_errors=True)
    resolved = [(int(c[3:]), int(m)) for c, _, m in rows]
    resolved.sort(key=lambda r: (-r[1], r[0]))
    return spark.createDataFrame(
        resolved[:20], "doc_id long, match_count int"
    )


_SQL_NEAR_ENGINE = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
p AS (
  SELECT doc_id,
         list_filter(range(1, len(toks)+1), i -> toks[i] = 'join')  AS p0,
         list_filter(range(1, len(toks)+1), i -> toks[i] = 'spark') AS p1
  FROM t
),
m AS (
  SELECT doc_id,
         len(list_filter(p0,
             a -> len(list_filter(p1, b -> abs(b - a) <= 5)) > 0))::INT
           AS match_count
  FROM p WHERE len(p0) > 0 AND len(p1) > 0
)
SELECT doc_id, match_count FROM m WHERE match_count > 0
ORDER BY match_count DESC, doc_id ASC LIMIT 20
"""


def q_near_ordered_engine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDERED proximity (span-near in order) THROUGH the packed
    positional index (operators/phrase.near_ordered_topk): 'spark' then
    'join' then 'batch', each gap ≤ 5 indexed tokens.  The existential
    chain is exact backward reachability (greedy witness selection is
    wrong — tested in test_phrase.py); the oracle recomputes the same
    chain with nested list_filter quantifiers over 1-based token
    positions (the shift cancels in the differences)."""
    import shutil
    import tempfile

    from ics_search_engine_spark.operators.packed_index import (
        PackedIndex,
        build_packed_index,
    )
    from ics_search_engine_spark.operators.phrase import near_ordered_topk

    docs = _docs(spark, sf_dir)
    transcripts = docs.select(
        F.format_string("doc%08d", F.col("doc_id")).alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.col("text"),
    )
    out = tempfile.mkdtemp(prefix="gate_nearord_idx_")
    try:
        build_packed_index(
            spark, transcripts, out, range_bits=8, with_positions=True,
            stem=False,
        )
        pidx = PackedIndex(spark, out)
        rows = near_ordered_topk(
            spark, pidx, "spark join batch", window=5, k=20
        ).collect()
    finally:
        shutil.rmtree(out, ignore_errors=True)
    resolved = [(int(c[3:]), int(m)) for c, _, m in rows]
    resolved.sort(key=lambda r: (-r[1], r[0]))
    return spark.createDataFrame(
        resolved[:20], "doc_id long, match_count int"
    )


_SQL_NEAR_ORDERED = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
p AS (
  SELECT doc_id,
         list_filter(range(1, len(toks)+1), i -> toks[i] = 'spark') AS p0,
         list_filter(range(1, len(toks)+1), i -> toks[i] = 'join')  AS p1,
         list_filter(range(1, len(toks)+1), i -> toks[i] = 'batch') AS p2
  FROM t
),
m AS (
  SELECT doc_id,
         len(list_filter(p0,
             a -> len(list_filter(p1,
                 b -> b > a AND b - a <= 5
                      AND len(list_filter(p2,
                          c -> c > b AND c - b <= 5)) > 0)) > 0))::INT
           AS match_count
  FROM p WHERE len(p0) > 0 AND len(p1) > 0 AND len(p2) > 0
)
SELECT doc_id, match_count FROM m WHERE match_count > 0
ORDER BY match_count DESC, doc_id ASC LIMIT 20
"""


def q_index_stats_engine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build-accounting audit: the packed index's OWN artifacts
    (stats.json n_docs/sum_dl from the write-time Observation;
    term_stats vocabulary size and Σdf = total postings) must equal the
    relational truth DuckDB computes from raw tokenization.  One row —
    if any build stage dropped or duplicated a posting, a doc, or a
    term, some number here moves."""
    import shutil
    import tempfile

    from ics_search_engine_spark.operators.packed_index import (
        PackedIndex,
        build_packed_index,
    )

    docs = _docs(spark, sf_dir)
    transcripts = docs.select(
        F.format_string("doc%08d", F.col("doc_id")).alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.col("text"),
    )
    out = tempfile.mkdtemp(prefix="gate_stats_idx_")
    try:
        stats = build_packed_index(
            spark, transcripts, out, range_bits=8, with_positions=False,
            stem=False,
        )
        pidx = PackedIndex(spark, out)
        agg = pidx.term_stats.agg(
            F.count("*").alias("vocab"), F.sum("df").alias("postings")
        ).collect()[0]
        row = (
            int(stats["n_docs"]),
            int(stats["sum_dl"]),
            int(agg["vocab"]),
            int(agg["postings"]),
        )
    finally:
        shutil.rmtree(out, ignore_errors=True)
    return spark.createDataFrame(
        [row], "n_docs long, sum_dl long, vocab long, postings long"
    )


_SQL_INDEX_STATS = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
posts AS (
  SELECT DISTINCT term, doc_id
  FROM (SELECT doc_id, unnest(toks) AS term FROM t)
)
SELECT (SELECT count(*) FROM t)::BIGINT AS n_docs,
       (SELECT sum(len(toks)) FROM t)::BIGINT AS sum_dl,
       count(DISTINCT term)::BIGINT AS vocab,
       count(*)::BIGINT AS postings
FROM posts
"""


def q_iceberg_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pure-Python Iceberg v2 layer (sources/iceberg_meta.py) under
    the DuckDB gate: two append commits split the documents table at
    half the doc_id range; reading the FIRST snapshot back through the
    Avro manifest-list → manifest → data-file chain must reproduce
    exactly the lower half (row content hashed by the driver).  A
    current-snapshot row-count mismatch raises rather than returning
    partial data."""
    import os
    import shutil
    import tempfile

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from ics_search_engine_spark.sources import iceberg_meta as im

    tbl = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    cut = (pc.max(tbl["doc_id"]).as_py() + 1) // 2
    lower = tbl.filter(pc.less(tbl["doc_id"], cut))
    upper = tbl.filter(pc.greater_equal(tbl["doc_id"], cut))
    d = tempfile.mkdtemp(prefix="gate_iceberg_")
    table = os.path.join(d, "docs_ice")
    try:
        for name, part in (("c1", lower), ("c2", upper)):
            os.makedirs(f"{table}/data/{name}")
            fp = f"{table}/data/{name}/part-0.parquet"
            pq.write_table(part, fp)
            im.commit(table, [fp], part.schema, operation="append")
        # the metadata's snapshot list is append-ordered by the writer
        snaps = im.IcebergMetaTable(table).snapshots
        first_id = snaps[0]["snapshot-id"]
        at1 = im.IcebergMetaTable(table, snapshot_id=first_id).to_arrow(
            ["doc_id", "text"]
        )
        n_cur = im.IcebergMetaTable(table).record_count()
        if n_cur != tbl.num_rows:
            raise AssertionError(
                f"current snapshot sees {n_cur} rows, expected {tbl.num_rows}"
            )
        rows = [
            (int(i), len(t))
            for i, t in zip(
                at1.column("doc_id").to_pylist(),
                at1.column("text").to_pylist(),
            )
        ]
    finally:
        shutil.rmtree(d, ignore_errors=True)
    rows.sort()
    return spark.createDataFrame(rows, "doc_id long, text_len int")


_SQL_ICEBERG_TT = """
SELECT doc_id, length(text)::INT AS text_len FROM documents
WHERE doc_id < (SELECT (max(doc_id) + 1) // 2 FROM documents)
ORDER BY doc_id
"""


def q_blend_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's ASSEMBLED ranking blend (F9,
    /root/reference/search.py:183-190) under the DuckDB gate: stem-free
    tf-idf accumulation + the degenerate cosine + term-match boost,
    with the missing-link_scores fallback (auth/hub/pagerank = 0,
    search.py:73-81) since the documents table has no link graph.
    Scores compare rounded to 6 decimals; ordering is by the ROUNDED
    score in both engines so the top-20 boundary agrees."""
    from ics_search_engine_spark.operators.blend import (
        build_blend_index,
        search_blend,
    )

    docs = _docs(spark, sf_dir)
    pages = docs.select(
        F.format_string("doc%08d", F.col("doc_id")).alias("url"),
        "text",
        F.expr(
            "cast(array() as array<struct<text:string,weight:double>>)"
        ).alias("important"),
        F.expr("cast(array() as array<string>)").alias("outgoing_links"),
    )
    bidx = build_blend_index(spark, pages, with_links=False, stem=False)
    top = search_blend(
        spark, bidx, " ".join(DOCS_QUERY_TERMS), max_results=60
    )
    return (
        top.select(
            F.substring("url", 4, 8).cast("long").alias("doc_id"),
            F.round(F.col("score"), 6).alias("blend_r6"),
        )
        .orderBy(F.desc("blend_r6"), F.asc("doc_id"))
        .limit(20)
    )


# the blend transcribed relationally: per-term weight qtf^2/len = 1/4
# (each of the 4 query terms appears once), sum_qtf_matched = m,
# ||q|| = 2; cosine collapses to (s*m)/(2*s*sqrt(m)) for s>0
_SQL_BLEND = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
n AS (SELECT count(*)::DOUBLE AS n FROM t),
posts AS (
  SELECT term, doc_id, count(*) AS tf, any_value(dl) AS dl FROM (
    SELECT doc_id, len(toks) AS dl, unnest(toks) AS term FROM t
  ) WHERE term IN ('spark','stream','window','join')
  GROUP BY term, doc_id
),
dfs AS (SELECT term, count(*) AS df FROM posts GROUP BY term),
perdoc AS (
  SELECT p.doc_id,
         sum((CASE WHEN p.dl = 0 THEN 0.0 ELSE p.tf / p.dl::DOUBLE END)
             * log10(n.n / d.df) * 0.25) AS s,
         count(*) AS m
  FROM posts p JOIN dfs d USING (term) CROSS JOIN n
  GROUP BY p.doc_id
),
scored AS (
  SELECT doc_id,
         0.2 * s
         + 0.2 * (CASE WHEN s > 0
                       THEN (s * m) / (2.0 * (s * sqrt(m::DOUBLE)))
                       ELSE 0.0 END)
         + 0.6 * (m / 4.0) AS blend
  FROM perdoc
)
SELECT doc_id, round(blend, 6) AS blend_r6
FROM scored ORDER BY blend_r6 DESC, doc_id ASC LIMIT 20
"""


def q_blend_rank_repeated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blend with a REPEATED-term query ('spark stream spark') — gates
    the un-deduplicated query-instance semantics: per-term weight
    qtf²/len (4/3 and 1/3), dot = s·Σqtf_matched, and crucially
    ‖q‖ = √(#instances) = √3 (sklearn normalize() over the reference's
    ones-CSR with duplicate indices, search.py:112-115)."""
    from ics_search_engine_spark.operators.blend import (
        build_blend_index,
        search_blend,
    )

    docs = _docs(spark, sf_dir)
    pages = docs.select(
        F.format_string("doc%08d", F.col("doc_id")).alias("url"),
        "text",
        F.expr(
            "cast(array() as array<struct<text:string,weight:double>>)"
        ).alias("important"),
        F.expr("cast(array() as array<string>)").alias("outgoing_links"),
    )
    bidx = build_blend_index(spark, pages, with_links=False, stem=False)
    top = search_blend(spark, bidx, "spark stream spark", max_results=60)
    return (
        top.select(
            F.substring("url", 4, 8).cast("long").alias("doc_id"),
            F.round(F.col("score"), 6).alias("blend_r6"),
        )
        .orderBy(F.desc("blend_r6"), F.asc("doc_id"))
        .limit(20)
    )


# repeated-term blend: qterms carries (w = qtf²/len, qtf); ‖q‖ = √3
_SQL_BLEND_REPEATED = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
n AS (SELECT count(*)::DOUBLE AS n FROM t),
qterms AS (
  SELECT * FROM (VALUES ('spark', 4.0/3.0, 2.0), ('stream', 1.0/3.0, 1.0))
  AS q(term, w, qtf)
),
posts AS (
  SELECT term, doc_id, count(*) AS tf, any_value(dl) AS dl FROM (
    SELECT doc_id, len(toks) AS dl, unnest(toks) AS term FROM t
  ) WHERE term IN (SELECT term FROM qterms)
  GROUP BY term, doc_id
),
dfs AS (SELECT term, count(*) AS df FROM posts GROUP BY term),
perdoc AS (
  SELECT p.doc_id,
         sum((CASE WHEN p.dl = 0 THEN 0.0 ELSE p.tf / p.dl::DOUBLE END)
             * log10(n.n / d.df) * q.w) AS s,
         sum(q.qtf) AS sq,
         count(*) AS m
  FROM posts p JOIN dfs d USING (term) JOIN qterms q USING (term)
  CROSS JOIN n
  GROUP BY p.doc_id
),
scored AS (
  SELECT doc_id,
         0.2 * s
         + 0.2 * (CASE WHEN s > 0
                       THEN (s * sq) / (sqrt(3.0) * (s * sqrt(m::DOUBLE)))
                       ELSE 0.0 END)
         + 0.6 * (m / 3.0) AS blend
  FROM perdoc
)
SELECT doc_id, round(blend, 6) AS blend_r6
FROM scored ORDER BY blend_r6 DESC, doc_id ASC LIMIT 20
"""


def _bm25_leg(spark: SparkSession, sf_dir: str, n: int) -> DataFrame:
    """BM25 top-n candidate leg over documents (same math as
    q_bm25_topk; rounded score so the selection boundary is exact)."""
    docs = _docs(spark, sf_dir).select("doc_id", toks_col().alias("toks"))
    stats = docs.agg(
        F.count("*").alias("n"), F.sum(F.size("toks")).alias("sdl")
    ).collect()[0]
    nn, avgdl = stats["n"], stats["sdl"] / stats["n"]
    posts = (
        docs.select("doc_id", F.size("toks").alias("dl"),
                    F.explode("toks").alias("term"))
        .filter(F.col("term").isin(DOCS_QUERY_TERMS))
        .groupBy("term", "doc_id")
        .agg(F.count("*").alias("tf"), F.first("dl").alias("dl"))
    )
    dfs = posts.groupBy("term").agg(F.count("*").alias("df"))
    tf, dl = F.col("tf").cast("double"), F.col("dl").cast("double")
    idf = F.log((F.lit(float(nn)) - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
    tfn = tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / F.lit(avgdl)))
    return (
        posts.join(F.broadcast(dfs), "term")
        .withColumn("contrib", idf * tfn)
        .groupBy("doc_id")
        .agg(F.round(F.sum("contrib"), 6).alias("bm25_r6"))
        .orderBy(F.desc("bm25_r6"), F.asc("doc_id"))
        .limit(n)
    )


def _cosine_leg(spark: SparkSession, sf_dir: str, n: int) -> DataFrame:
    """Cosine top-n candidate leg over embeddings vs the vec_id=0 query
    vector; vec_id aliases to doc_id (the testdata tables are aligned
    1:1 by construction — TESTDATA.md)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    q = F.array(*[F.lit(float(x)) for x in qvec])
    e = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    dot = F.aggregate(
        F.zip_with(e, q, lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x
    )
    nrm = lambda v: F.sqrt(  # noqa: E731
        F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    cos = dot / (nrm(e) * nrm(q))
    return (
        emb.filter(F.col("vec_id") != 0)
        .select(
            F.col("vec_id").alias("doc_id"), F.round(cos, 6).alias("cosine_r6")
        )
        .orderBy(F.desc("cosine_r6"), F.asc("doc_id"))
        .limit(n)
    )


_SQL_HYBRID_LEGS = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
stats AS (SELECT count(*)::DOUBLE AS n, avg(len(toks)) AS avgdl FROM t),
posts AS (
  SELECT term, doc_id, count(*) AS tf, any_value(dl) AS dl FROM (
    SELECT doc_id, len(toks) AS dl, unnest(toks) AS term FROM t
  ) WHERE term IN ('spark','stream','window','join')
  GROUP BY term, doc_id
),
dfs AS (SELECT term, count(*) AS df FROM posts GROUP BY term),
bmtop AS (
  SELECT doc_id, round(sum(
           ln((s.n - d.df + 0.5) / (d.df + 0.5) + 1.0)
           * (p.tf * 2.2 / (p.tf + 1.2 * (0.25 + 0.75 * p.dl / s.avgdl)))
         ), 6) AS bm25_r6
  FROM posts p JOIN dfs d USING (term) CROSS JOIN stats s
  GROUP BY doc_id ORDER BY bm25_r6 DESC, doc_id ASC LIMIT 50
),
qv AS (SELECT embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id = 0),
cstop AS (
  SELECT vec_id AS doc_id,
    round(
      list_dot_product(embedding::DOUBLE[], qv.v)
      / (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
         * sqrt(list_dot_product(qv.v, qv.v))), 6) AS cosine_r6
  FROM embeddings CROSS JOIN qv WHERE vec_id != 0
  ORDER BY cosine_r6 DESC, doc_id ASC LIMIT 50
),
bm AS (SELECT doc_id, bm25_r6, row_number()
         OVER (ORDER BY bm25_r6 DESC, doc_id ASC) AS r FROM bmtop),
cs AS (SELECT doc_id, cosine_r6, row_number()
         OVER (ORDER BY cosine_r6 DESC, doc_id ASC) AS r FROM cstop)
"""


def q_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval, reciprocal-rank fusion: BM25 top-50 (lexical
    leg over documents) x cosine top-50 (vector leg over embeddings)
    fused as sum 1/(60+rank) — operators/hybrid.py rrf_fuse."""
    from ics_search_engine_spark.operators.hybrid import add_rank, rrf_fuse

    bm = add_rank(_bm25_leg(spark, sf_dir, 50), "bm25_r6", "doc_id")
    cs = add_rank(_cosine_leg(spark, sf_dir, 50), "cosine_r6", "doc_id")
    fused = rrf_fuse([bm, cs], id_col="doc_id", k=60)
    return (
        fused.select("doc_id", F.round("rrf", 9).alias("rrf_r9"))
        .orderBy(F.desc("rrf_r9"), F.asc("doc_id"))
        .limit(20)
    )


_SQL_HYBRID_RRF = _SQL_HYBRID_LEGS + """
SELECT coalesce(bm.doc_id, cs.doc_id) AS doc_id,
       round(coalesce(1.0 / (60.0 + bm.r), 0.0)
             + coalesce(1.0 / (60.0 + cs.r), 0.0), 9) AS rrf_r9
FROM bm FULL OUTER JOIN cs ON bm.doc_id = cs.doc_id
ORDER BY rrf_r9 DESC, doc_id ASC LIMIT 20
"""


def q_hybrid_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval, min-max linear fusion: per-leg min-max
    normalisation to [0,1] then 0.7*bm25 + 0.3*cosine (missing leg
    contributes 0) — operators/hybrid.py linear_fuse."""
    from ics_search_engine_spark.operators.hybrid import linear_fuse

    bm = _bm25_leg(spark, sf_dir, 50)
    cs = _cosine_leg(spark, sf_dir, 50)
    fused = linear_fuse(
        [bm, cs], weights=[0.7, 0.3], id_col="doc_id",
        score_cols=["bm25_r6", "cosine_r6"],
    )
    return (
        fused.select("doc_id", F.round("fused", 9).alias("fused_r9"))
        .orderBy(F.desc("fused_r9"), F.asc("doc_id"))
        .limit(20)
    )


_SQL_HYBRID_MINMAX = _SQL_HYBRID_LEGS + """
, bmn AS (
  SELECT doc_id, CASE WHEN max(bm25_r6) OVER () = min(bm25_r6) OVER ()
    THEN 1.0 ELSE (bm25_r6 - min(bm25_r6) OVER ())
                  / (max(bm25_r6) OVER () - min(bm25_r6) OVER ()) END AS nb
  FROM bm
),
csn AS (
  SELECT doc_id, CASE WHEN max(cosine_r6) OVER () = min(cosine_r6) OVER ()
    THEN 1.0 ELSE (cosine_r6 - min(cosine_r6) OVER ())
                  / (max(cosine_r6) OVER () - min(cosine_r6) OVER ()) END AS nc
  FROM cs
)
SELECT coalesce(bmn.doc_id, csn.doc_id) AS doc_id,
       round(coalesce(bmn.nb * 0.7, 0.0) + coalesce(csn.nc * 0.3, 0.0), 9)
         AS fused_r9
FROM bmn FULL OUTER JOIN csn ON bmn.doc_id = csn.doc_id
ORDER BY fused_r9 DESC, doc_id ASC LIMIT 20
"""


def q_facet_date_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """date_histogram over the query's full match set
    (operators/facets.date_histogram): matched-doc count per month —
    the time-axis rollup every search dashboard draws.  The gate
    synthesizes a deterministic ts per doc (epoch + doc_id % 97 days)
    so DuckDB can reproduce the bucketing."""
    import shutil
    import tempfile

    from ics_search_engine_spark.operators.facets import date_histogram
    from ics_search_engine_spark.operators.packed_index import (
        PackedIndex,
        build_packed_index,
    )

    docs = _docs(spark, sf_dir)
    transcripts = docs.select(
        F.format_string("doc%08d", F.col("doc_id")).alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.col("text"),
        F.date_add(
            F.to_date(F.lit("2026-01-01")),
            (F.col("doc_id") % 97).cast("int"),
        ).cast("timestamp").alias("ts"),
    )
    out = tempfile.mkdtemp(prefix="gate_dhisto_idx_")
    try:
        build_packed_index(
            spark, transcripts.drop("ts"), out, range_bits=8,
            with_positions=False, stem=False,
        )
        pidx = PackedIndex(spark, out)
        rows = date_histogram(
            spark, pidx, " ".join(DOCS_QUERY_TERMS),
            transcripts.select("conv_id", "turn_idx", "ts"), "ts",
            granularity="month",
        ).collect()
    finally:
        shutil.rmtree(out, ignore_errors=True)
    return spark.createDataFrame(
        [(r["bucket"].strftime("%Y-%m-%d"), r["n_docs"]) for r in rows],
        "bucket string, n_docs long",
    )


_SQL_DATE_HISTO = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
m AS (
  SELECT DISTINCT doc_id FROM (
    SELECT doc_id, unnest(toks) AS term FROM t
  ) WHERE term IN ('spark','stream','window','join')
)
SELECT strftime(date_trunc('month',
                DATE '2026-01-01' + (doc_id % 97)::INT), '%Y-%m-%d')
         AS bucket,
       count(*)::BIGINT AS n_docs
FROM m GROUP BY bucket ORDER BY bucket
"""


def q_term_vectors_engine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The termvectors API (operators/termvectors.term_vectors): one
    stored doc's full per-term stats — tf and positions from
    re-analysis with the index's own tokenizer (identical to the build
    by construction), df from one metadata-only term-IN scan.  The
    oracle recomputes tf from the doc and df from the corpus
    (positions are pytest-gated — DuckDB's list_filter drops
    ordinals)."""
    import shutil
    import tempfile

    from ics_search_engine_spark.operators.packed_index import (
        PackedIndex,
        build_packed_index,
    )
    from ics_search_engine_spark.operators.termvectors import term_vectors

    docs = _docs(spark, sf_dir)
    transcripts = docs.select(
        F.format_string("doc%08d", F.col("doc_id")).alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.col("text"),
    )
    out = tempfile.mkdtemp(prefix="gate_tv_idx_")
    try:
        build_packed_index(
            spark, transcripts, out, range_bits=8, with_positions=False,
            stem=False,
        )
        pidx = PackedIndex(spark, out)
        rows = term_vectors(
            spark, pidx, transcripts, "doc00000007", 0
        ).collect()
    finally:
        shutil.rmtree(out, ignore_errors=True)
    return spark.createDataFrame(
        [(r["term"], r["tf"], r["df"]) for r in rows],
        "term string, tf int, df long",
    ).orderBy("term")


_SQL_TERM_VECTORS = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
doc AS (SELECT unnest(toks) AS term FROM t WHERE doc_id = 7),
tfs AS (SELECT term, count(*)::INT AS tf FROM doc GROUP BY term),
dfs AS (
  SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM (
    SELECT doc_id, unnest(toks) AS term FROM t
  ) GROUP BY term
)
SELECT term, tf, df FROM tfs JOIN dfs USING (term) ORDER BY term
"""


def q_bm25_rescore_engine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase ranking under the DuckDB gate
    (operators/rescore.rescore_topk): exact BM25 top-60 window, LM
    Dirichlet evaluated on the window only, final =
    1.0·bm25 + 0.5·lmd re-sorted — the Elasticsearch rescore pattern.
    The oracle replays both similarities relationally and combines with
    the same weights."""
    import shutil
    import tempfile

    from ics_search_engine_spark.operators.packed_index import (
        PackedIndex,
        build_packed_index,
    )
    from ics_search_engine_spark.operators.rescore import rescore_topk

    docs = _docs(spark, sf_dir)
    transcripts = docs.select(
        F.format_string("doc%08d", F.col("doc_id")).alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.col("text"),
    )
    out = tempfile.mkdtemp(prefix="gate_rescore_idx_")
    try:
        build_packed_index(
            spark, transcripts, out, range_bits=8, with_positions=False,
            stem=False,
        )
        pidx = PackedIndex(spark, out)
        top = rescore_topk(
            spark, pidx, " ".join(DOCS_QUERY_TERMS),
            k=60, window=60, query_weight=1.0, rescore_weight=0.5,
        ).collect()
    finally:
        shutil.rmtree(out, ignore_errors=True)
    resolved = [(int(c[3:]), round(s, 6)) for c, _, s in top]
    resolved.sort(key=lambda r: (-r[1], r[0]))
    return spark.createDataFrame(
        resolved[:20], "doc_id long, rescored_r6 double"
    )


_SQL_RESCORE = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
stats AS (SELECT count(*)::DOUBLE AS n, avg(len(toks)) AS avgdl FROM t),
posts AS (
  SELECT term, doc_id, count(*) AS tf, any_value(dl) AS dl FROM (
    SELECT doc_id, len(toks) AS dl, unnest(toks) AS term FROM t
  ) WHERE term IN ('spark','stream','window','join')
  GROUP BY term, doc_id
),
dfs AS (SELECT term, count(*) AS df FROM posts GROUP BY term),
bm AS (
  SELECT p.doc_id,
         sum(ln((s.n - d.df + 0.5) / (d.df + 0.5) + 1.0)
             * (p.tf * 2.2 /
                (p.tf + 1.2 * (0.25 + 0.75 * p.dl / s.avgdl)))) AS bs
  FROM posts p JOIN dfs d USING (term) CROSS JOIN stats s
  GROUP BY p.doc_id
),
win AS (
  SELECT doc_id, bs FROM (
    SELECT doc_id, bs,
           row_number() OVER (ORDER BY bs DESC, doc_id ASC) AS rn
    FROM bm
  ) WHERE rn <= 60
),
tot AS (SELECT sum(len(toks))::DOUBLE AS total FROM t),
ctfs AS (SELECT term, sum(tf)::DOUBLE AS ctf FROM posts GROUP BY term),
consts AS (
  SELECT c.term, 1.0 AS qtf, 2000.0 * (c.ctf / tot.total) AS mp
  FROM ctfs c CROSS JOIN tot
),
qsum AS (SELECT sum(qtf) AS q FROM consts),
lmd AS (
  SELECT p.doc_id,
         sum(c.qtf * ln(1.0 + p.tf / c.mp))
         + any_value(qs.q) * ln(2000.0 / (any_value(p.dl) + 2000.0)) AS ls
  FROM posts p JOIN consts c USING (term) CROSS JOIN qsum qs
  JOIN win w ON p.doc_id = w.doc_id
  GROUP BY p.doc_id
)
SELECT w.doc_id, round(1.0 * w.bs + 0.5 * l.ls, 6) AS rescored_r6
FROM win w JOIN lmd l USING (doc_id)
ORDER BY rescored_r6 DESC, doc_id ASC LIMIT 20
"""


def q_significant_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """significant_terms (JLH) under the DuckDB gate
    (operators/sigterms.significant_terms): foreground = exact BM25
    top-30 sample, candidates = terms present in ≥2 foreground docs
    minus query terms and stop forms, JLH = (fg%−bg%)·(fg%/bg%), top
    10 by (score desc, term asc).  The oracle replays the sample
    selection, the presence counts, and the formula."""
    import shutil
    import tempfile

    from ics_search_engine_spark.operators.packed_index import (
        PackedIndex,
        build_packed_index,
    )
    from ics_search_engine_spark.operators.sigterms import (
        significant_terms,
    )

    docs = _docs(spark, sf_dir)
    transcripts = docs.select(
        F.format_string("doc%08d", F.col("doc_id")).alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.col("text"),
    )
    out = tempfile.mkdtemp(prefix="gate_sig_idx_")
    try:
        build_packed_index(
            spark, transcripts, out, range_bits=8, with_positions=False,
            stem=False,
        )
        pidx = PackedIndex(spark, out)
        # over-fetch 30 then report 10 after rounding-sort, the
        # standard rounded-boundary convention of this file
        rows = significant_terms(
            spark, pidx, transcripts, " ".join(DOCS_QUERY_TERMS),
            k=30, sample_docs=30, min_fg_df=2,
        ).collect()
    finally:
        shutil.rmtree(out, ignore_errors=True)
    scored = [
        (r["term"], r["fg_df"], r["df"], round(r["score"], 9))
        for r in rows
    ]
    scored.sort(key=lambda s: (-s[3], s[0]))
    return spark.createDataFrame(
        scored[:10], "term string, fg_df int, df long, score_r9 double"
    )


def _sql_sigterms() -> str:
    from ics_search_engine_spark.textproc.tokenizer import STOP_WORDS

    stoplist = ", ".join(
        "'{}'".format(w.replace("'", "''")) for w in sorted(STOP_WORDS)
    )
    origs = ", ".join(f"'{t}'" for t in DOCS_QUERY_TERMS)
    return f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
stats AS (SELECT count(*)::DOUBLE AS n, avg(len(toks)) AS avgdl FROM t),
posts AS (
  SELECT term, doc_id, count(*) AS tf, any_value(dl) AS dl FROM (
    SELECT doc_id, len(toks) AS dl, unnest(toks) AS term FROM t
  ) GROUP BY term, doc_id
),
dfs AS (SELECT term, count(*)::BIGINT AS df FROM posts GROUP BY term),
base AS (
  SELECT p.doc_id,
         sum(ln((s.n - d.df + 0.5) / (d.df + 0.5) + 1.0)
             * (p.tf * 2.2 /
                (p.tf + 1.2 * (0.25 + 0.75 * p.dl / s.avgdl)))) AS s
  FROM posts p JOIN dfs d USING (term) CROSS JOIN stats s
  WHERE p.term IN ({origs})
  GROUP BY p.doc_id
),
fg AS (SELECT doc_id FROM base ORDER BY s DESC, doc_id ASC LIMIT 30),
nfg AS (SELECT count(*)::DOUBLE AS nf FROM fg),
fgdf AS (
  SELECT term, count(*)::INT AS fg_df FROM (
    SELECT DISTINCT p.term, p.doc_id FROM posts p JOIN fg USING (doc_id)
  ) GROUP BY term
),
scored AS (
  SELECT f.term, f.fg_df, d.df,
         ((f.fg_df / nfg.nf) - (d.df / s.n))
         * ((f.fg_df / nfg.nf) / (d.df / s.n)) AS score
  FROM fgdf f JOIN dfs d USING (term)
  CROSS JOIN nfg CROSS JOIN stats s
  WHERE f.fg_df >= 2
    AND f.term NOT IN ({origs}) AND f.term NOT IN ({stoplist})
    AND (f.fg_df / nfg.nf) > (d.df / s.n)
)
SELECT term, fg_df, df, round(score, 9) AS score_r9 FROM scored
ORDER BY score_r9 DESC, term ASC LIMIT 10
"""


_SQL_SIGTERMS = _sql_sigterms()


def q_qlang_boost_engine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-clause ^boost through the query language
    (operators/qlang — Lucene clause boosts):
    '+spark^2 "batch batch"^2 join stream^0.5 s*^3' — a boosted
    required term, a boosted phrase (each token instance adds the
    boost), a fractional boost, and a boosted wildcard whose
    expansions each gain the boost.  Boost sums generalize qtf, so the
    oracle's multiplier table is: spark 2+3(s*)=5, batch 2·2=4,
    join 1, stream 0.5+3=3.5, other s-terms 3."""
    import shutil
    import tempfile

    from ics_search_engine_spark.operators.packed_index import (
        PackedIndex,
        build_packed_index,
    )
    from ics_search_engine_spark.operators.qlang import bm25_topk_qlang

    docs = _docs(spark, sf_dir)
    transcripts = docs.select(
        F.format_string("doc%08d", F.col("doc_id")).alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.col("text"),
    )
    out = tempfile.mkdtemp(prefix="gate_qboost_idx_")
    try:
        build_packed_index(
            spark, transcripts, out, range_bits=8, with_positions=True,
            stem=False,
        )
        pidx = PackedIndex(spark, out)
        top = bm25_topk_qlang(
            spark, pidx,
            '+spark^2 "batch batch"^2 join stream^0.5 s*^3', k=60,
        ).collect()
    finally:
        shutil.rmtree(out, ignore_errors=True)
    resolved = [(int(c[3:]), round(s, 6)) for c, _, s in top]
    resolved.sort(key=lambda r: (-r[1], r[0]))
    return spark.createDataFrame(
        resolved[:20], "doc_id long, bm25_r6 double"
    )


_SQL_QLANG_BOOST = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
stats AS (SELECT count(*)::DOUBLE AS n, avg(len(toks)) AS avgdl FROM t),
alldfs AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM (
    SELECT doc_id, unnest(toks) AS term FROM t
  ) GROUP BY term
),
qterms AS (
  SELECT term, df,
         (CASE WHEN term = 'spark'  THEN 2.0 ELSE 0 END)
         + (CASE WHEN term = 'batch' THEN 4.0 ELSE 0 END)
         + (CASE WHEN term = 'join'  THEN 1.0 ELSE 0 END)
         + (CASE WHEN term = 'stream' THEN 0.5 ELSE 0 END)
         + (CASE WHEN term LIKE 's%' THEN 3.0 ELSE 0 END) AS qtf
  FROM alldfs
),
posts AS (
  SELECT term, doc_id, count(*) AS tf, any_value(dl) AS dl FROM (
    SELECT doc_id, len(toks) AS dl, unnest(toks) AS term FROM t
  ) WHERE term IN (SELECT term FROM qterms WHERE qtf > 0)
  GROUP BY term, doc_id
),
scored AS (
  SELECT p.doc_id,
         q.qtf * ln((s.n - q.df + 0.5) / (q.df + 0.5) + 1.0)
         * (p.tf * 2.2 / (p.tf + 1.2 * (0.25 + 0.75 * p.dl / s.avgdl)))
         AS contrib
  FROM posts p JOIN qterms q USING (term) CROSS JOIN stats s
),
cand AS (
  SELECT doc_id FROM t
  WHERE list_contains(toks, 'spark')
    AND len(list_filter(range(1, len(toks)),
            i -> toks[i] = 'batch' AND toks[i+1] = 'batch')) > 0
)
SELECT s.doc_id, round(sum(s.contrib), 6) AS bm25_r6
FROM scored s JOIN cand c USING (doc_id)
GROUP BY s.doc_id
ORDER BY bm25_r6 DESC, s.doc_id ASC LIMIT 20
"""


def q_bm25_delete_by_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """_delete_by_query under the DuckDB gate
    (operators/segments.delete_by_query): two-segment index, delete
    every doc matching 'window', query through the resulting
    three-segment set (the third is the tombstone-only empty segment).
    Oracle = the same relational BM25 with matching docs excluded and
    collection stats PRE-delete — the LSM's stats-stay-until-compaction
    contract."""
    import shutil
    import tempfile

    from ics_search_engine_spark.operators.packed_index import (
        build_packed_index,
    )
    from ics_search_engine_spark.operators.segments import (
        SegmentedIndex,
        bm25_topk_segmented,
        delete_by_query,
    )

    docs = _docs(spark, sf_dir)
    transcripts = docs.select(
        F.format_string("doc%08d", F.col("doc_id")).alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.col("text"),
        (F.col("doc_id") % 2).alias("half"),
    )
    base = tempfile.mkdtemp(prefix="gate_delq_idx_")
    try:
        paths = []
        for half in (0, 1):
            p = f"{base}/seg{half}"
            build_packed_index(
                spark,
                transcripts.filter(F.col("half") == half).drop("half"),
                p, range_bits=8, with_positions=False, stem=False,
            )
            paths.append(p)
        sidx = SegmentedIndex(spark, paths)
        tomb = f"{base}/tomb"
        delete_by_query(
            spark, sidx, "window", tomb, range_bits=8,
            with_positions=False,
        )
        sidx2 = SegmentedIndex(spark, paths + [tomb])
        top = bm25_topk_segmented(
            spark, sidx2, " ".join(DOCS_QUERY_TERMS), k=60,
            resolve="pushdown",
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return (
        top.select(
            F.substring("conv_id", 4, 8).cast("long").alias("doc_id"),
            F.round(F.col("score"), 6).alias("bm25_r6"),
        )
        .orderBy(F.desc("bm25_r6"), F.asc("doc_id"))
        .limit(20)
    )


_SQL_DELETE_BY_QUERY = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
stats AS (SELECT count(*)::DOUBLE AS n, avg(len(toks)) AS avgdl FROM t),
posts AS (
  SELECT term, doc_id, count(*) AS tf, any_value(dl) AS dl FROM (
    SELECT doc_id, len(toks) AS dl, unnest(toks) AS term FROM t
  ) WHERE term IN ('spark','stream','window','join')
  GROUP BY term, doc_id
),
dfs AS (SELECT term, count(*) AS df FROM posts GROUP BY term),
alive AS (SELECT doc_id FROM t WHERE NOT list_contains(toks, 'window')),
scored AS (
  SELECT p.doc_id,
         ln((s.n - d.df + 0.5) / (d.df + 0.5) + 1.0)
         * (p.tf * 2.2 / (p.tf + 1.2 * (0.25 + 0.75 * p.dl / s.avgdl)))
         AS contrib
  FROM posts p JOIN dfs d USING (term) CROSS JOIN stats s
  JOIN alive a ON p.doc_id = a.doc_id
)
SELECT doc_id, round(sum(contrib), 6) AS bm25_r6
FROM scored GROUP BY doc_id
ORDER BY bm25_r6 DESC, doc_id ASC LIMIT 20
"""


# ---------------------------------------------------------------- registry

def q_bool_query_engine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested boolean query tree THROUGH the packed positional index
    (operators/boolquery.bool_topk — Lucene BooleanQuery semantics):

        Bool(must=[Term(spark)],
             should=[Term(stream), Phrase("window join"),
                     Bool(must=[Term(batch), Term(merge)]),
                     Prefix(vect)],
             must_not=[Term(sort)],
             minimum_should_match=1)

    exercising every clause kind, a nested sub-Bool, the positional
    phrase leaf (ExactPhraseScorer shape: Σidf × tfn(phrase count)),
    the constant-score prefix leaf, and msm counting.  The oracle
    replays the whole tree relationally: CASE-gated BM25 contributions
    summed in clause order, the same sat predicate, round-6 compare."""
    import shutil
    import tempfile

    from ics_search_engine_spark.operators.boolquery import (
        Bool,
        Phrase,
        Prefix,
        Term,
        bool_topk,
    )
    from ics_search_engine_spark.operators.packed_index import (
        PackedIndex,
        build_packed_index,
    )

    docs = _docs(spark, sf_dir)
    transcripts = docs.select(
        F.format_string("doc%08d", F.col("doc_id")).alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.col("text"),
    )
    tree = Bool(
        must=[Term("spark")],
        should=[
            Term("stream"),
            Phrase("window join"),
            Bool(must=[Term("batch"), Term("merge")]),
            Prefix("vect"),
        ],
        must_not=[Term("sort")],
        minimum_should_match=1,
    )
    out = tempfile.mkdtemp(prefix="gate_bool_idx_")
    try:
        build_packed_index(
            spark, transcripts, out, range_bits=8, with_positions=True,
            stem=False,
        )
        pidx = PackedIndex(spark, out)
        # over-fetch 60 exact-score winners for a stable rounded top-20
        # boundary (same convention as _engine_packed_top20)
        rows = bool_topk(spark, pidx, tree, k=60).collect()
    finally:
        shutil.rmtree(out, ignore_errors=True)
    resolved = [(int(c[3:]), round(float(s), 6)) for c, _, s in rows]
    resolved.sort(key=lambda r: (-r[1], r[0]))
    return spark.createDataFrame(resolved[:20], "doc_id long, bm25_r6 double")


_SQL_BOOL_TFN = "({tf} * 2.2 / ({tf} + 1.2 * (0.25 + 0.75 * v.dl / s.avgdl)))"
_SQL_BOOL_IDF = "ln((s.n - d.df_{t} + 0.5) / (d.df_{t} + 0.5) + 1.0)"

_SQL_BOOL_QUERY = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
base AS (SELECT doc_id, toks, len(toks) AS dl FROM t),
stats AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM base),
tfv AS (
  SELECT doc_id, dl,
    len(list_filter(toks, x -> x = 'spark'))  AS tf_spark,
    len(list_filter(toks, x -> x = 'stream')) AS tf_stream,
    len(list_filter(toks, x -> x = 'window')) AS tf_window,
    len(list_filter(toks, x -> x = 'join'))   AS tf_join,
    len(list_filter(toks, x -> x = 'batch'))  AS tf_batch,
    len(list_filter(toks, x -> x = 'merge'))  AS tf_merge,
    len(list_filter(toks, x -> x = 'sort'))   AS tf_sort,
    len(list_filter(toks, x -> x LIKE 'vect%')) AS tf_vect,
    len(list_filter(range(1, len(toks)),
        i -> toks[i] = 'window' AND toks[i+1] = 'join')) AS pc
  FROM base
),
dfs AS (
  SELECT
    count(*) FILTER (WHERE tf_spark > 0)  AS df_spark,
    count(*) FILTER (WHERE tf_stream > 0) AS df_stream,
    count(*) FILTER (WHERE tf_window > 0) AS df_window,
    count(*) FILTER (WHERE tf_join > 0)   AS df_join,
    count(*) FILTER (WHERE tf_batch > 0)  AS df_batch,
    count(*) FILTER (WHERE tf_merge > 0)  AS df_merge
  FROM tfv
),
scored AS (
  SELECT v.doc_id,
    {_SQL_BOOL_IDF.format(t='spark')} * {_SQL_BOOL_TFN.format(tf='v.tf_spark')}
    + CASE WHEN v.tf_stream > 0 THEN
        {_SQL_BOOL_IDF.format(t='stream')} * {_SQL_BOOL_TFN.format(tf='v.tf_stream')}
      ELSE 0.0 END
    + CASE WHEN v.pc > 0 THEN
        ({_SQL_BOOL_IDF.format(t='window')} + {_SQL_BOOL_IDF.format(t='join')})
        * {_SQL_BOOL_TFN.format(tf='v.pc')}
      ELSE 0.0 END
    + CASE WHEN v.tf_batch > 0 AND v.tf_merge > 0 THEN
        {_SQL_BOOL_IDF.format(t='batch')} * {_SQL_BOOL_TFN.format(tf='v.tf_batch')}
        + {_SQL_BOOL_IDF.format(t='merge')} * {_SQL_BOOL_TFN.format(tf='v.tf_merge')}
      ELSE 0.0 END
    + CASE WHEN v.tf_vect > 0 THEN 1.0 ELSE 0.0 END
    AS score
  FROM tfv v CROSS JOIN stats s CROSS JOIN dfs d
  WHERE v.tf_spark > 0 AND v.tf_sort = 0
    AND ((v.tf_stream > 0)::INT + (v.pc > 0)::INT
         + (v.tf_batch > 0 AND v.tf_merge > 0)::INT
         + (v.tf_vect > 0)::INT) >= 1
)
SELECT doc_id, round(score, 6) AS bm25_r6
FROM scored ORDER BY bm25_r6 DESC, doc_id ASC LIMIT 20
"""


def q_phrase_prefix_engine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """match_phrase_prefix (autocomplete) THROUGH the packed positional
    index (operators/phrase.phrase_prefix_topk): fixed term 'window'
    followed by any index term starting 'jo' — the oracle replays the
    positional adjacency with a LIKE on the following token."""
    import shutil
    import tempfile

    from ics_search_engine_spark.operators.packed_index import (
        PackedIndex,
        build_packed_index,
    )
    from ics_search_engine_spark.operators.phrase import phrase_prefix_topk

    docs = _docs(spark, sf_dir)
    transcripts = docs.select(
        F.format_string("doc%08d", F.col("doc_id")).alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.col("text"),
    )
    out = tempfile.mkdtemp(prefix="gate_ppre_idx_")
    try:
        build_packed_index(
            spark, transcripts, out, range_bits=8, with_positions=True,
            stem=False,
        )
        pidx = PackedIndex(spark, out)
        rows = phrase_prefix_topk(spark, pidx, "window jo", k=20).collect()
    finally:
        shutil.rmtree(out, ignore_errors=True)
    resolved = [(int(c[3:]), int(m)) for c, _, m in rows]
    resolved.sort(key=lambda r: (-r[1], r[0]))
    return spark.createDataFrame(
        resolved[:20], "doc_id long, match_count int"
    )


_SQL_PHRASE_PREFIX = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
m AS (
  SELECT doc_id,
         len(list_filter(range(1, len(toks)),
             i -> toks[i] = 'window' AND toks[i+1] LIKE 'jo%'))::INT
           AS match_count
  FROM t WHERE len(toks) >= 2
)
SELECT doc_id, match_count FROM m WHERE match_count > 0
ORDER BY match_count DESC, doc_id ASC LIMIT 20
"""


# gauss decay constant ln(decay)/scale^2 at decay=0.5, scale=30 days —
# computed ONCE here so the engine literal and the oracle SQL embed the
# same double
import math as _math  # noqa: E402

_DECAY_C = _math.log(0.5) / float(30 * 86400) ** 2


def q_bm25_decay_engine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-decay function scoring (ES function_score gauss decay,
    operators/funcscore.bm25_topk_decay): BM25 × exp(c·dist²) over a
    deterministic synthetic ts (epoch 2026-01-01 + doc_id%97 days, the
    date-histogram gate's convention), origin at the corpus max date,
    scale 30 days, decay 0.5, multiply mode.  The decay re-ranks (the
    factor applies before the top-k cut), so the gate catches any
    post-hoc-multiply shortcut."""
    import shutil
    import tempfile

    from ics_search_engine_spark.operators.funcscore import bm25_topk_decay
    from ics_search_engine_spark.operators.packed_index import (
        PackedIndex,
        build_packed_index,
    )

    docs = _docs(spark, sf_dir)
    transcripts = docs.select(
        F.format_string("doc%08d", F.col("doc_id")).alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.col("text"),
        F.date_add(
            F.to_date(F.lit("2026-01-01")),
            (F.col("doc_id") % 97).cast("int"),
        ).cast("timestamp").alias("ts"),
    )
    out = tempfile.mkdtemp(prefix="gate_decay_idx_")
    try:
        build_packed_index(
            spark, transcripts.drop("ts"), out, range_bits=8,
            with_positions=False, stem=False,
        )
        pidx = PackedIndex(spark, out)
        rows = bm25_topk_decay(
            spark, pidx, " ".join(DOCS_QUERY_TERMS),
            transcripts.select("conv_id", "turn_idx", "ts"), "ts",
            origin="2026-04-07", scale_days=30.0, k=60,
        ).collect()
    finally:
        shutil.rmtree(out, ignore_errors=True)
    resolved = [(int(c[3:]), round(float(s), 6)) for c, _, s in rows]
    resolved.sort(key=lambda r: (-r[1], r[0]))
    return spark.createDataFrame(resolved[:20], "doc_id long, score_r6 double")


_SQL_BM25_DECAY = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
{_SQL_BM25_CTES}
bm25 AS (SELECT doc_id, sum(contrib) AS s FROM scored GROUP BY doc_id),
decayed AS (
  SELECT doc_id,
         s * exp({_DECAY_C!r}
                 * (abs((doc_id % 97) - 96)::DOUBLE * 86400.0)
                 * (abs((doc_id % 97) - 96)::DOUBLE * 86400.0)) AS score
  FROM bm25
)
SELECT doc_id, round(score, 6) AS score_r6
FROM decayed ORDER BY score_r6 DESC, doc_id ASC LIMIT 20
"""


def _transcripts_with_role(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared fixture for the aggregation gates: documents as one-turn
    transcripts with a deterministic role (doc_id parity — the facet
    gate's convention) and a 7-way source attribute."""
    return _docs(spark, sf_dir).select(
        F.format_string("doc%08d", F.col("doc_id")).alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.when(F.col("doc_id") % 2 == 0, "user")
        .otherwise("assistant")
        .alias("role"),
        F.format_string("src%d", (F.col("doc_id") % 7)).alias("source"),
        F.col("text"),
    )


def q_top_hits_engine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """top_hits aggregation (operators/aggs.top_hits): the 3 best hits
    inside EACH role bucket of the match set — the per-bucket ranked
    sub-list ES nests under a terms aggregation.  The engine ranks on
    exact scores two-phase (hot-bucket presplit, then per-bucket cut);
    the gate over-fetches 10 per bucket and reports the rounded-order
    top 3 so the cross-engine boundary agrees (the explain/decay gates'
    convention)."""
    import shutil

    from ics_search_engine_spark.operators.aggs import top_hits

    transcripts = _transcripts_with_role(spark, sf_dir)
    out, pidx = _agg_gate_index(spark, transcripts, "gate_tophits_idx_")
    try:
        rows = top_hits(
            spark, pidx, " ".join(DOCS_QUERY_TERMS),
            transcripts.select("conv_id", "turn_idx", "role"), "role", k=10,
        ).collect()
    finally:
        shutil.rmtree(out, ignore_errors=True)
    by_role: dict[str, list[tuple[float, int]]] = {}
    for r in rows:
        by_role.setdefault(r["role"], []).append(
            (round(r["score"], 6), int(r["conv_id"][3:]))
        )
    out_rows = []
    for role in sorted(by_role):
        ranked = sorted(by_role[role], key=lambda x: (-x[0], x[1]))[:3]
        out_rows += [
            (role, i + 1, d, s) for i, (s, d) in enumerate(ranked)
        ]
    return spark.createDataFrame(
        out_rows, "role string, rank int, doc_id long, bm25_r6 double"
    )


_SQL_TOP_HITS = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
{_SQL_BM25_CTES}
perdoc AS (
  SELECT doc_id,
         CASE WHEN doc_id % 2 = 0 THEN 'user' ELSE 'assistant' END AS role,
         round(sum(contrib), 6) AS r6
  FROM scored GROUP BY doc_id
),
ranked AS (
  SELECT role, doc_id, r6,
         row_number() OVER (PARTITION BY role ORDER BY r6 DESC, doc_id ASC)
           AS rank
  FROM perdoc
)
SELECT role, rank::INT AS rank, doc_id, r6 AS bm25_r6
FROM ranked WHERE rank <= 3 ORDER BY role, rank
"""


def q_match_stats_engine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """stats aggregation (operators/aggs.match_stats): count / min /
    max / sum of the doc-length doc-value per role bucket over the
    match set.  All-integer outputs so the hash compares exactly; the
    mean is the caller's division (module contract)."""
    import shutil

    from ics_search_engine_spark.operators.aggs import match_stats

    transcripts = _transcripts_with_role(spark, sf_dir)
    attrs = transcripts.select(
        "conv_id", "turn_idx", "role", F.size(toks_col()).alias("dl")
    )
    out, pidx = _agg_gate_index(spark, transcripts, "gate_matchstats_idx_")
    try:
        rows = match_stats(
            spark, pidx, " ".join(DOCS_QUERY_TERMS), attrs, "dl",
            bucket_col="role",
        ).collect()
    finally:
        shutil.rmtree(out, ignore_errors=True)
    return spark.createDataFrame(
        [
            (r["role"], r["n_docs"], r["min_v"], r["max_v"], r["sum_v"])
            for r in rows
        ],
        "role string, n_docs long, min_dl int, max_dl int, sum_dl long",
    )


_SQL_MATCH_STATS = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
m AS (
  SELECT doc_id, any_value(dl) AS dl FROM (
    SELECT doc_id, len(toks) AS dl, unnest(toks) AS term FROM t
  ) WHERE term IN ('spark','stream','window','join')
  GROUP BY doc_id
)
SELECT CASE WHEN doc_id % 2 = 0 THEN 'user' ELSE 'assistant' END AS role,
       count(*)::BIGINT AS n_docs,
       min(dl)::INT AS min_dl,
       max(dl)::INT AS max_dl,
       sum(dl)::BIGINT AS sum_dl
FROM m GROUP BY role ORDER BY role
"""


def q_cardinality_engine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cardinality aggregation (operators/aggs.cardinality): exact
    distinct sources per role bucket across the match set.  The gate
    runs the exact path (DuckDB-reproducible); the HLL++ approx path is
    bounds-tested in tests/test_aggs.py."""
    import shutil

    from ics_search_engine_spark.operators.aggs import cardinality

    transcripts = _transcripts_with_role(spark, sf_dir)
    out, pidx = _agg_gate_index(spark, transcripts, "gate_cardinality_idx_")
    try:
        rows = cardinality(
            spark, pidx, " ".join(DOCS_QUERY_TERMS),
            transcripts.select("conv_id", "turn_idx", "role", "source"),
            "source", bucket_col="role",
        ).collect()
    finally:
        shutil.rmtree(out, ignore_errors=True)
    return spark.createDataFrame(
        [(r["role"], r["n_distinct"]) for r in rows],
        "role string, n_sources long",
    )


_SQL_CARDINALITY = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
m AS (
  SELECT DISTINCT doc_id FROM (
    SELECT doc_id, unnest(toks) AS term FROM t
  ) WHERE term IN ('spark','stream','window','join')
)
SELECT CASE WHEN doc_id % 2 = 0 THEN 'user' ELSE 'assistant' END AS role,
       count(DISTINCT 'src' || (doc_id % 7)::VARCHAR)::BIGINT AS n_sources
FROM m GROUP BY role ORDER BY role
"""


def _agg_gate_index(spark, transcripts, prefix: str):
    """Build the stem-free gate index for an aggregation gate; caller
    owns cleanup."""
    import tempfile

    from ics_search_engine_spark.operators.packed_index import (
        PackedIndex,
        build_packed_index,
    )

    out = tempfile.mkdtemp(prefix=prefix)
    build_packed_index(
        spark, transcripts.select("conv_id", "turn_idx", "text"), out,
        range_bits=8, with_positions=False, stem=False,
    )
    return out, PackedIndex(spark, out)


def q_histogram_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES histogram aggregation (operators/aggs.histogram): matched-doc
    count per fixed-width doc-length bucket (interval 20)."""
    import shutil

    from ics_search_engine_spark.operators.aggs import histogram

    transcripts = _transcripts_with_role(spark, sf_dir)
    attrs = transcripts.select(
        "conv_id", "turn_idx", F.size(toks_col()).alias("dl")
    )
    out, pidx = _agg_gate_index(spark, transcripts, "gate_histo_idx_")
    try:
        rows = histogram(
            spark, pidx, " ".join(DOCS_QUERY_TERMS), attrs, "dl", 20
        ).collect()
    finally:
        shutil.rmtree(out, ignore_errors=True)
    return spark.createDataFrame(
        [(r["bucket_lo"], r["n_docs"]) for r in rows],
        "bucket_lo long, n_docs long",
    )


_SQL_HISTOGRAM = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
m AS (
  SELECT doc_id, any_value(dl) AS dl FROM (
    SELECT doc_id, len(toks) AS dl, unnest(toks) AS term FROM t
  ) WHERE term IN ('spark','stream','window','join')
  GROUP BY doc_id
)
SELECT (dl // 20 * 20)::BIGINT AS bucket_lo, count(*)::BIGINT AS n_docs
FROM m GROUP BY bucket_lo ORDER BY bucket_lo
"""


def q_range_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES range aggregation (operators/aggs.range_agg): matched-doc
    count per explicit [lo, hi) doc-length bucket — the ranges OVERLAP
    (80-* contains most of 100-150) to pin the a-doc-counts-in-every-
    containing-range semantics."""
    import shutil

    from ics_search_engine_spark.operators.aggs import range_agg

    transcripts = _transcripts_with_role(spark, sf_dir)
    attrs = transcripts.select(
        "conv_id", "turn_idx", F.size(toks_col()).alias("dl")
    )
    out, pidx = _agg_gate_index(spark, transcripts, "gate_range_idx_")
    try:
        rows = range_agg(
            spark, pidx, " ".join(DOCS_QUERY_TERMS), attrs, "dl",
            [(None, 100.0), (100.0, 150.0), (80.0, None)],
        ).collect()
    finally:
        shutil.rmtree(out, ignore_errors=True)
    return spark.createDataFrame(
        [(r["range_ord"], r["range_key"], r["n_docs"]) for r in rows],
        "range_ord int, range_key string, n_docs long",
    )


_SQL_RANGE_AGG = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
m AS (
  SELECT doc_id, any_value(dl) AS dl FROM (
    SELECT doc_id, len(toks) AS dl, unnest(toks) AS term FROM t
  ) WHERE term IN ('spark','stream','window','join')
  GROUP BY doc_id
)
SELECT 0 AS range_ord, '*-100' AS range_key,
       count(*) FILTER (dl < 100)::BIGINT AS n_docs FROM m
UNION ALL
SELECT 1, '100-150', count(*) FILTER (dl >= 100 AND dl < 150)::BIGINT FROM m
UNION ALL
SELECT 2, '80-*', count(*) FILTER (dl >= 80)::BIGINT FROM m
ORDER BY range_ord
"""


def q_filters_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES filters aggregation (operators/aggs.filters_agg): matched-doc
    count per NAMED predicate over the doc-values, one pass — the
    predicates overlap (role vs source) to pin bucket independence."""
    import shutil

    from ics_search_engine_spark.operators.aggs import filters_agg

    transcripts = _transcripts_with_role(spark, sf_dir)
    out, pidx = _agg_gate_index(spark, transcripts, "gate_filters_idx_")
    try:
        rows = filters_agg(
            spark, pidx, " ".join(DOCS_QUERY_TERMS),
            transcripts.select("conv_id", "turn_idx", "role", "source"),
            {
                "assistant": F.col("role") == "assistant",
                "even_src": F.col("source").isin("src0", "src2", "src4"),
                "user_src0": (F.col("role") == "user")
                & (F.col("source") == "src0"),
            },
        ).collect()
    finally:
        shutil.rmtree(out, ignore_errors=True)
    return spark.createDataFrame(
        [(r["filter_key"], r["n_docs"]) for r in rows],
        "filter_key string, n_docs long",
    )


_SQL_FILTERS_AGG = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
m AS (
  SELECT DISTINCT doc_id FROM (
    SELECT doc_id, unnest(toks) AS term FROM t
  ) WHERE term IN ('spark','stream','window','join')
),
a AS (
  SELECT doc_id,
         CASE WHEN doc_id % 2 = 0 THEN 'user' ELSE 'assistant' END AS role,
         'src' || (doc_id % 7)::VARCHAR AS source
  FROM m
)
SELECT 'assistant' AS filter_key,
       count(*) FILTER (role = 'assistant')::BIGINT AS n_docs FROM a
UNION ALL
SELECT 'even_src',
       count(*) FILTER (source IN ('src0','src2','src4'))::BIGINT FROM a
UNION ALL
SELECT 'user_src0',
       count(*) FILTER (role = 'user' AND source = 'src0')::BIGINT FROM a
ORDER BY filter_key
"""


def q_date_histo_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline aggregations (operators/aggs.cumulative_sum +
    derivative) over the month date_histogram: running total and first
    difference per bucket, ES emitting NULL for the first bucket's
    derivative.  Bucket-count-sized input by construction."""
    import shutil

    from ics_search_engine_spark.operators.aggs import (
        cumulative_sum,
        derivative,
    )
    from ics_search_engine_spark.operators.facets import date_histogram

    docs = _docs(spark, sf_dir)
    transcripts = docs.select(
        F.format_string("doc%08d", F.col("doc_id")).alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.col("text"),
        F.date_add(
            F.to_date(F.lit("2026-01-01")),
            (F.col("doc_id") % 97).cast("int"),
        ).cast("timestamp").alias("ts"),
    )
    out, pidx = _agg_gate_index(spark, transcripts, "gate_pipeline_idx_")
    try:
        histo = date_histogram(
            spark, pidx, " ".join(DOCS_QUERY_TERMS),
            transcripts.select("conv_id", "turn_idx", "ts"), "ts",
            granularity="month",
        )
        rows = derivative(
            cumulative_sum(histo, "bucket", "n_docs"), "bucket", "n_docs"
        ).collect()
    finally:
        shutil.rmtree(out, ignore_errors=True)
    return spark.createDataFrame(
        [
            (r["bucket"].strftime("%Y-%m-%d"), r["n_docs"], r["cum"],
             r["deriv"])
            for r in rows
        ],
        "bucket string, n_docs long, cum long, deriv long",
    )


_SQL_DATE_HISTO_PIPELINE = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
m AS (
  SELECT DISTINCT doc_id FROM (
    SELECT doc_id, unnest(toks) AS term FROM t
  ) WHERE term IN ('spark','stream','window','join')
),
h AS (
  SELECT strftime(date_trunc('month',
                  DATE '2026-01-01' + (doc_id % 97)::INT), '%Y-%m-%d')
           AS bucket,
         count(*)::BIGINT AS n_docs
  FROM m GROUP BY bucket
)
SELECT bucket, n_docs,
       sum(n_docs) OVER (ORDER BY bucket)::BIGINT AS cum,
       (n_docs - lag(n_docs) OVER (ORDER BY bucket))::BIGINT AS deriv
FROM h ORDER BY bucket
"""


def q_composite_page2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES composite aggregation with after-key paging
    (operators/aggs.composite_buckets): (role, source) buckets over the
    match set in key order, page 1 of 5 taken, page 2 resumed from its
    last key — must equal the oracle's exact bucket rows 6..10 (no
    skip, no repeat across the cursor)."""
    import shutil

    from ics_search_engine_spark.operators.aggs import composite_buckets

    transcripts = _transcripts_with_role(spark, sf_dir)
    attrs = transcripts.select("conv_id", "turn_idx", "role", "source")
    out, pidx = _agg_gate_index(spark, transcripts, "gate_composite_idx_")
    try:
        q = " ".join(DOCS_QUERY_TERMS)
        page1 = composite_buckets(
            spark, pidx, q, attrs, ["role", "source"], 5
        ).collect()
        last = (page1[-1]["role"], page1[-1]["source"])
        rows = composite_buckets(
            spark, pidx, q, attrs, ["role", "source"], 5, after=last
        ).collect()
    finally:
        shutil.rmtree(out, ignore_errors=True)
    return spark.createDataFrame(
        [(r["role"], r["source"], r["n_docs"]) for r in rows],
        "role string, source string, n_docs long",
    )


_SQL_COMPOSITE_PAGE2 = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
m AS (
  SELECT DISTINCT doc_id FROM (
    SELECT doc_id, unnest(toks) AS term FROM t
  ) WHERE term IN ('spark','stream','window','join')
),
b AS (
  SELECT CASE WHEN doc_id % 2 = 0 THEN 'user' ELSE 'assistant' END AS role,
         'src' || (doc_id % 7)::VARCHAR AS source,
         count(*)::BIGINT AS n_docs
  FROM m GROUP BY role, source
),
r AS (
  SELECT role, source, n_docs,
         row_number() OVER (ORDER BY role, source) AS rn
  FROM b
)
SELECT role, source, n_docs FROM r
WHERE rn BETWEEN 6 AND 10 ORDER BY role, source
"""


def q_percentiles_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES percentiles aggregation (operators/aggs.percentiles): exact
    linear-interpolation quantiles of the doc-length doc-value over the
    match set — the same percentile_cont definition DuckDB's
    quantile_cont implements, compared rounded.  The approx
    (t-digest-class) variant is bounds-tested in tests/test_aggs.py."""
    import shutil

    from ics_search_engine_spark.operators.aggs import percentiles

    transcripts = _transcripts_with_role(spark, sf_dir)
    attrs = transcripts.select(
        "conv_id", "turn_idx", F.size(toks_col()).alias("dl")
    )
    out, pidx = _agg_gate_index(spark, transcripts, "gate_pct_idx_")
    try:
        rows = percentiles(
            spark, pidx, " ".join(DOCS_QUERY_TERMS), attrs, "dl",
            [0.25, 0.5, 0.75, 0.95],
        ).collect()
    finally:
        shutil.rmtree(out, ignore_errors=True)
    return spark.createDataFrame(
        [(r["p"], round(r["value"], 6)) for r in rows],
        "p double, value_r6 double",
    )


_SQL_PERCENTILES = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
m AS (
  SELECT doc_id, any_value(dl) AS dl FROM (
    SELECT doc_id, len(toks) AS dl, unnest(toks) AS term FROM t
  ) WHERE term IN ('spark','stream','window','join')
  GROUP BY doc_id
)
SELECT unnest([0.25, 0.5, 0.75, 0.95])::DOUBLE AS p,
       round(unnest(quantile_cont(dl, [0.25, 0.5, 0.75, 0.95])), 6)
         AS value_r6
FROM m
"""


def q_completion_suggest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES completion suggester (operators/spell.suggest_completions):
    top-10 dictionary completions of the prefix 's' by (df desc, term
    asc) — one TakeOrderedAndProject over the term dictionary."""
    import shutil

    from ics_search_engine_spark.operators.spell import suggest_completions

    transcripts = _transcripts_with_role(spark, sf_dir)
    out, pidx = _agg_gate_index(spark, transcripts, "gate_complete_idx_")
    try:
        rows = suggest_completions(pidx, "s", size=10).collect()
    finally:
        shutil.rmtree(out, ignore_errors=True)
    return spark.createDataFrame(
        [(r["term"], r["df"]) for r in rows], "term string, df long"
    )


_SQL_COMPLETION = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
d AS (
  SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM (
    SELECT doc_id, unnest(toks) AS term FROM t
  ) GROUP BY term
)
SELECT term, df FROM d WHERE term LIKE 's%'
ORDER BY df DESC, term ASC LIMIT 10
"""


def q_knn_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES knn-with-filter (operators/similarity.cosine_topk_filtered):
    brute-force cosine top-20 restricted to a PRE-filtered candidate
    set (vec_id % 3 == 1) — every returned hit satisfies the filter and
    k is selected among survivors only (never post-filtered)."""
    from ics_search_engine_spark.operators.similarity import (
        cosine_topk_filtered,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    e = emb.select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias(
            "embedding"
        ),
    )
    # exact-score over-fetch, rounded-order cut (the knn_cosine gate's
    # boundary discipline)
    top = cosine_topk_filtered(
        e, [float(x) for x in qvec],
        (F.col("vec_id") != 0) & (F.col("vec_id") % 3 == 1), k=60,
    )
    return (
        top.select(
            "vec_id", F.round(F.col("cosine"), 6).alias("cosine_r6")
        )
        .orderBy(F.desc("cosine_r6"), F.asc("vec_id"))
        .limit(20)
    )


_SQL_KNN_FILTERED = """
WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)
SELECT vec_id,
  round(
    list_dot_product(embedding::DOUBLE[], q.qv)
    / (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
       * sqrt(list_dot_product(q.qv, q.qv))), 6) AS cosine_r6
FROM embeddings CROSS JOIN q
WHERE vec_id != 0 AND vec_id % 3 = 1
ORDER BY cosine_r6 DESC, vec_id ASC LIMIT 20
"""


def _ts_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents as one-turn transcripts with the deterministic ts of
    the date-histogram gates (epoch 2026-01-01 + doc_id % 97 days)."""
    return _docs(spark, sf_dir).select(
        F.format_string("doc%08d", F.col("doc_id")).alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.col("text"),
        F.date_add(
            F.to_date(F.lit("2026-01-01")),
            (F.col("doc_id") % 97).cast("int"),
        ).cast("timestamp").alias("ts"),
    )


def q_auto_date_histo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES auto_date_histogram (operators/aggs.auto_date_histogram):
    the finest ladder interval keeping the matched ts span within 10
    buckets (a ~96-day span → 'month'), then the rollup at that
    granularity; the oracle replays the ladder choice from the same
    min/max span."""
    import shutil

    from ics_search_engine_spark.operators.aggs import auto_date_histogram

    transcripts = _ts_transcripts(spark, sf_dir)
    out, pidx = _agg_gate_index(spark, transcripts, "gate_autodh_idx_")
    try:
        histo, gran = auto_date_histogram(
            spark, pidx, " ".join(DOCS_QUERY_TERMS),
            transcripts.select("conv_id", "turn_idx", "ts"), "ts",
            target_buckets=10,
        )
        rows = histo.collect()
    finally:
        shutil.rmtree(out, ignore_errors=True)
    return spark.createDataFrame(
        [
            (gran, r["bucket"].strftime("%Y-%m-%d"), r["n_docs"])
            for r in rows
        ],
        "interval string, bucket string, n_docs long",
    )


_SQL_AUTO_DATE_HISTO = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
m AS (
  SELECT DISTINCT doc_id FROM (
    SELECT doc_id, unnest(toks) AS term FROM t
  ) WHERE term IN ('spark','stream','window','join')
),
tsv AS (
  SELECT doc_id,
         (DATE '2026-01-01' + (doc_id % 97)::INT)::TIMESTAMP AS ts
  FROM m
),
span AS (
  SELECT date_diff('second', min(ts), max(ts))::DOUBLE AS s FROM tsv
),
gran AS (
  SELECT CASE
    WHEN s / 3600 <= 10 THEN 'hour'
    WHEN s / 86400 <= 10 THEN 'day'
    WHEN s / (7 * 86400) <= 10 THEN 'week'
    WHEN s / (30 * 86400) <= 10 THEN 'month'
    WHEN s / (91 * 86400) <= 10 THEN 'quarter'
    ELSE 'year' END AS g
  FROM span
)
SELECT g.g AS interval,
       strftime(date_trunc(g.g, v.ts), '%Y-%m-%d') AS bucket,
       count(*)::BIGINT AS n_docs
FROM tsv v CROSS JOIN gran g
GROUP BY interval, bucket ORDER BY bucket
"""


def q_serial_diff_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """serial_diff + rate pipelines (operators/aggs) over the week
    date_histogram: week-over-week lag-2 difference and a per-day rate
    (n_docs / 7) on each weekly bucket."""
    import shutil

    from ics_search_engine_spark.operators.aggs import rate, serial_diff
    from ics_search_engine_spark.operators.facets import date_histogram

    transcripts = _ts_transcripts(spark, sf_dir)
    out, pidx = _agg_gate_index(spark, transcripts, "gate_sdiff_idx_")
    try:
        histo = date_histogram(
            spark, pidx, " ".join(DOCS_QUERY_TERMS),
            transcripts.select("conv_id", "turn_idx", "ts"), "ts",
            granularity="week",
        )
        rows = rate(
            serial_diff(histo, "bucket", "n_docs", lag=2),
            "bucket", "n_docs", bucket_seconds=7 * 86400.0,
            unit_seconds=86400.0,
        ).collect()
    finally:
        shutil.rmtree(out, ignore_errors=True)
    return spark.createDataFrame(
        [
            (r["bucket"].strftime("%Y-%m-%d"), r["n_docs"], r["sdiff"],
             round(r["rate"], 6))
            for r in rows
        ],
        "bucket string, n_docs long, sdiff long, rate_r6 double",
    )


_SQL_SERIAL_DIFF_RATE = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
m AS (
  SELECT DISTINCT doc_id FROM (
    SELECT doc_id, unnest(toks) AS term FROM t
  ) WHERE term IN ('spark','stream','window','join')
),
h AS (
  SELECT strftime(date_trunc('week',
                  (DATE '2026-01-01' + (doc_id % 97)::INT)::TIMESTAMP),
                  '%Y-%m-%d') AS bucket,
         count(*)::BIGINT AS n_docs
  FROM m GROUP BY bucket
)
SELECT bucket, n_docs,
       (n_docs - lag(n_docs, 2) OVER (ORDER BY bucket))::BIGINT AS sdiff,
       round(n_docs / 7.0, 6) AS rate_r6
FROM h ORDER BY bucket
"""


def q_index_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query profile (operators/query.profile_terms): per query term —
    df, shard span, and block-max upper bound from ONE metadata-only
    scan.  The oracle recomputes the shard span from the layout
    DEFINITION (shard = doc_ord >> range_bits; doc_ord ≡ doc_id on the
    contiguous gate corpus), so this gates the physical sharding
    itself."""
    import shutil

    from ics_search_engine_spark.operators.query import profile_terms

    transcripts = _transcripts_with_role(spark, sf_dir)
    out, pidx = _agg_gate_index(spark, transcripts, "gate_profile_idx_")
    try:
        rows = profile_terms(
            spark, pidx, " ".join(DOCS_QUERY_TERMS)
        ).collect()
    finally:
        shutil.rmtree(out, ignore_errors=True)
    return spark.createDataFrame(
        [
            (r["term"], r["df"], r["n_shards"], r["max_tfn_r6"])
            for r in rows
        ],
        "term string, df long, n_shards long, max_tfn_r6 double",
    )


_SQL_INDEX_PROFILE = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
stats AS (SELECT avg(len(toks)) AS avgdl FROM t),
posts AS (
  SELECT term, doc_id, count(*) AS tf, any_value(dl) AS dl FROM (
    SELECT doc_id, len(toks) AS dl, unnest(toks) AS term FROM t
  ) WHERE term IN ('spark','stream','window','join')
  GROUP BY term, doc_id
)
SELECT term, count(*)::BIGINT AS df,
       count(DISTINCT doc_id // 256)::BIGINT AS n_shards,
       round(max(tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / s.avgdl))), 6)
         AS max_tfn_r6
FROM posts CROSS JOIN stats s
GROUP BY term ORDER BY term
"""


def q_sql_surface_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL surface (functions/sqlreg.register_sql_functions): a
    query written ENTIRELY in SQL text against the registered
    vectorized tokenizer must reproduce doc_token_stats — one shared
    kernel behind both APIs."""
    from ics_search_engine_spark.functions.sqlreg import (
        register_sql_functions,
    )

    register_sql_functions(spark)
    _docs(spark, sf_dir).createOrReplaceTempView("gate_docs_sql")
    return spark.sql(
        """
        SELECT doc_id,
               size(ics_tokenize_nostem(text)) AS dl,
               size(array_distinct(ics_tokenize_nostem(text))) AS n_terms
        FROM gate_docs_sql
        """
    )


def q_snapshot_restore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot/restore lifecycle (operators/lifecycle): snapshot the
    base segment, mutate the live index with an upsert delta (verified
    to CHANGE the ranking), then restore the snapshot and query it —
    the restored ranking must equal the oracle over the ORIGINAL
    corpus, proving the pinned segment set is the pre-mutation state
    bit-for-bit.  Also swings an alias from live → restored (the
    blue/green swap)."""
    import shutil
    import tempfile

    from ics_search_engine_spark.operators.lifecycle import (
        create_snapshot,
        resolve_alias,
        restore_snapshot,
        set_alias,
    )
    from ics_search_engine_spark.operators.packed_index import (
        build_packed_index,
    )
    from ics_search_engine_spark.operators.segments import (
        SegmentedIndex,
        bm25_topk_segmented,
        build_upsert_segment,
    )

    docs = _docs(spark, sf_dir)
    transcripts = docs.select(
        F.format_string("doc%08d", F.col("doc_id")).alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.col("text"),
    )
    q = " ".join(DOCS_QUERY_TERMS)
    base = tempfile.mkdtemp(prefix="gate_snap_")
    try:
        build_packed_index(
            spark, transcripts, f"{base}/seg0", range_bits=8,
            with_positions=False, stem=False,
        )
        create_snapshot([f"{base}/seg0"], f"{base}/snap", label="pre")
        # mutate: boost every 7th doc so the live ranking diverges
        delta = (
            transcripts.filter(
                F.substring("conv_id", 4, 8).cast("long") % 7 == 3
            ).select(
                "conv_id", "turn_idx",
                F.concat(F.col("text"), F.lit(" spark stream spark"))
                .alias("text"),
            )
        )
        build_upsert_segment(
            spark, delta, f"{base}/seg1", range_bits=8,
            with_positions=False, stem=False,
        )
        alias_store = f"{base}/aliases.json"
        set_alias(alias_store, "live", [f"{base}/seg0", f"{base}/seg1"])
        live = SegmentedIndex(spark, resolve_alias(alias_store, "live"))
        mutated = bm25_topk_segmented(spark, live, q, k=20).collect()

        restored_paths = restore_snapshot(f"{base}/snap")
        set_alias(alias_store, "live", restored_paths)  # blue/green swap
        restored = SegmentedIndex(
            spark, resolve_alias(alias_store, "live")
        )
        rows = bm25_topk_segmented(spark, restored, q, k=60).collect()
        # the mutation must actually have changed the live ranking —
        # otherwise this gate proves nothing
        if [r["conv_id"] for r in mutated] == [
            r["conv_id"] for r in rows[:20]
        ]:
            raise AssertionError("upsert did not change the ranking")
    finally:
        shutil.rmtree(base, ignore_errors=True)
    resolved = [
        (int(r["conv_id"][3:]), round(float(r["score"]), 6)) for r in rows
    ]
    resolved.sort(key=lambda r: (-r[1], r[0]))
    return spark.createDataFrame(resolved[:20], "doc_id long, bm25_r6 double")


def q_span_first_engine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lucene span_first (operators/phrase.span_first_topk): docs whose
    first 'batch' occurrence sits before position 3, earliest-first —
    through the packed POSITIONAL index (exact integers, no rounding)."""
    import shutil
    import tempfile

    from ics_search_engine_spark.operators.packed_index import (
        PackedIndex,
        build_packed_index,
    )
    from ics_search_engine_spark.operators.phrase import span_first_topk

    transcripts = _transcripts_with_role(spark, sf_dir)
    out = tempfile.mkdtemp(prefix="gate_spanfirst_idx_")
    try:
        build_packed_index(
            spark, transcripts.select("conv_id", "turn_idx", "text"), out,
            range_bits=8, with_positions=True, stem=False,
        )
        pidx = PackedIndex(spark, out)
        rows = span_first_topk(spark, pidx, "batch", end=3, k=20).collect()
    finally:
        shutil.rmtree(out, ignore_errors=True)
    return spark.createDataFrame(
        [(int(r["conv_id"][3:]), r["first_pos"]) for r in rows],
        "doc_id long, first_pos int",
    )


_SQL_SPAN_FIRST = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
firsts AS (
  SELECT doc_id, (list_position(toks, 'batch') - 1)::INT AS first_pos
  FROM t WHERE list_position(toks, 'batch') > 0
)
SELECT doc_id, first_pos FROM firsts
WHERE first_pos < 3 ORDER BY first_pos, doc_id LIMIT 20
"""


def q_random_score_engine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES function_score random_score (operators/funcscore.
    bm25_topk_random, replace mode): a deterministic per-doc uniform
    keyed on (docID, seed) via the engine's md5 convention — stable
    sampling of the match set, cross-engine-exact."""
    import shutil

    from ics_search_engine_spark.operators.funcscore import (
        bm25_topk_random,
    )

    transcripts = _transcripts_with_role(spark, sf_dir)
    out, pidx = _agg_gate_index(spark, transcripts, "gate_random_idx_")
    try:
        rows = bm25_topk_random(
            spark, pidx, " ".join(DOCS_QUERY_TERMS), seed=7, k=20,
            mode="replace",
        ).collect()
    finally:
        shutil.rmtree(out, ignore_errors=True)
    return spark.createDataFrame(
        [
            (int(r["conv_id"][3:]), round(float(r["score"]), 6))
            for r in rows
        ],
        "doc_id long, rand_r6 double",
    )


_SQL_RANDOM_SCORE = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
m AS (
  SELECT DISTINCT doc_id FROM (
    SELECT doc_id, unnest(toks) AS term FROM t
  ) WHERE term IN ('spark','stream','window','join')
),
r AS (
  SELECT doc_id,
         {_sql_md5_32("'doc' || lpad(doc_id::VARCHAR, 8, '0') || ':0:7'")}
           / 4294967296.0 AS rand
  FROM m
)
SELECT doc_id, round(rand, 6) AS rand_r6
FROM r ORDER BY rand DESC, doc_id ASC LIMIT 20
"""


def q_terms_set_engine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES terms_set (operators/querydsl.terms_set_topk): per-doc
    minimum_should_match read from a doc value (1 + doc_id % 3 of the
    4 query terms); surviving scores are plain BM25.  Rounded top-20
    of an exact-score over-fetch."""
    import shutil

    from ics_search_engine_spark.operators.querydsl import terms_set_topk

    transcripts = _transcripts_with_role(spark, sf_dir)
    attrs = transcripts.select(
        "conv_id", "turn_idx",
        (F.substring("conv_id", 4, 8).cast("long") % 3 + 1)
        .cast("int").alias("required"),
    )
    out, pidx = _agg_gate_index(spark, transcripts, "gate_termsset_idx_")
    try:
        rows = terms_set_topk(
            spark, pidx, " ".join(DOCS_QUERY_TERMS), attrs, "required",
            k=60,
        ).collect()
    finally:
        shutil.rmtree(out, ignore_errors=True)
    resolved = sorted(
        (
            (round(float(r["score"]), 6), int(r["conv_id"][3:]),
             int(r["n_matched"]))
            for r in rows
        ),
        key=lambda x: (-x[0], x[1]),
    )[:20]
    return spark.createDataFrame(
        [(d, n, s) for s, d, n in resolved],
        "doc_id long, n_matched int, score_r6 double",
    )


_SQL_TERMS_SET = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
{_SQL_BM25_CTES}
perdoc AS (
  SELECT doc_id, count(*)::INT AS n_matched, sum(contrib) AS sc
  FROM scored GROUP BY doc_id
),
kept AS (
  SELECT doc_id, n_matched, round(sc, 6) AS r6
  FROM perdoc WHERE n_matched >= (doc_id % 3 + 1)
)
SELECT doc_id, n_matched, r6 AS score_r6
FROM kept ORDER BY r6 DESC, doc_id ASC LIMIT 20
"""


def q_diversified_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES diversified_sampler as a ranking surface
    (operators/aggs.diversified_topk): global top-10 with at most 2
    docs per source — the collapse generalization.  Rounded-order
    report of the exact-score selection (gate discipline)."""
    import shutil

    from ics_search_engine_spark.operators.aggs import diversified_topk

    transcripts = _transcripts_with_role(spark, sf_dir)
    out, pidx = _agg_gate_index(spark, transcripts, "gate_divtopk_idx_")
    try:
        # exact-score SUPERSET (double per-key cap, 6x global k): the
        # rounded-order cuts below cannot reach past it unless >2
        # same-key docs collide at 6 decimals (gate discipline)
        rows = diversified_topk(
            spark, pidx, " ".join(DOCS_QUERY_TERMS),
            transcripts.select("conv_id", "turn_idx", "source"),
            "source", max_per_key=4, k=60,
        ).collect()
    finally:
        shutil.rmtree(out, ignore_errors=True)
    pool = sorted(
        (
            (round(float(r["score"]), 6), int(r["conv_id"][3:]),
             r["source"])
            for r in rows
        ),
        key=lambda x: (-x[0], x[1]),
    )
    per_key: dict[str, int] = {}
    resolved = []
    for r6, d, src in pool:
        if per_key.get(src, 0) >= 2:
            continue
        per_key[src] = per_key.get(src, 0) + 1
        resolved.append((src, d, r6))
        if len(resolved) == 10:
            break
    return spark.createDataFrame(
        resolved, "source string, doc_id long, score_r6 double",
    )


_SQL_DIVERSIFIED = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
{_SQL_BM25_CTES}
perdoc AS (
  SELECT doc_id, 'src' || (doc_id % 7)::VARCHAR AS source,
         round(sum(contrib), 6) AS r6
  FROM scored GROUP BY doc_id
),
cut AS (
  SELECT source, doc_id, r6,
         row_number() OVER (PARTITION BY source
                            ORDER BY r6 DESC, doc_id ASC) AS rn
  FROM perdoc
)
SELECT source, doc_id, r6 AS score_r6 FROM cut
WHERE rn <= 2 ORDER BY score_r6 DESC, doc_id ASC LIMIT 10
"""


def q_rare_terms_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES rare_terms (operators/aggs.rare_terms): facet values matched
    by at most 2 docs over a ~100-value bucket attribute (doc_id // 5)
    — the long-tail complement of facet_counts."""
    import shutil

    from ics_search_engine_spark.operators.aggs import rare_terms

    transcripts = _docs(spark, sf_dir).select(
        F.format_string("doc%08d", F.col("doc_id")).alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.format_string("g%d", (F.col("doc_id") / 5).cast("long")).alias(
            "grp"
        ),
        F.col("text"),
    )
    out, pidx = _agg_gate_index(spark, transcripts, "gate_rare_idx_")
    try:
        # 'dup' is the corpus's planted rare term (df ~5% of docs), so
        # the per-group long tail is actually populated
        rows = rare_terms(
            spark, pidx, "dup",
            transcripts.select("conv_id", "turn_idx", "grp"), "grp",
            max_doc_count=2,
        ).collect()
    finally:
        shutil.rmtree(out, ignore_errors=True)
    return spark.createDataFrame(
        [(r["grp"], r["n_docs"]) for r in rows], "grp string, n_docs long"
    )


_SQL_RARE_TERMS = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
m AS (
  SELECT DISTINCT doc_id FROM (
    SELECT doc_id, unnest(toks) AS term FROM t
  ) WHERE term IN ('dup')
)
SELECT 'g' || (doc_id // 5)::VARCHAR AS grp, count(*)::BIGINT AS n_docs
FROM m GROUP BY grp HAVING count(*) <= 2
ORDER BY n_docs ASC, grp ASC
"""


def q_boosting_engine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES boosting query (operators/querydsl.boosting_topk): positive
    BM25 with docs matching the negative query ('merge sort') demoted
    ×0.5 BEFORE the top-k cut — demotion without exclusion.  Rounded
    top-20, exact-score over-fetch (gate discipline)."""
    import shutil

    from ics_search_engine_spark.operators.querydsl import boosting_topk

    transcripts = _transcripts_with_role(spark, sf_dir)
    out, pidx = _agg_gate_index(spark, transcripts, "gate_boosting_idx_")
    try:
        rows = boosting_topk(
            spark, pidx, " ".join(DOCS_QUERY_TERMS), "merge sort",
            negative_boost=0.5, k=60,
        ).collect()
    finally:
        shutil.rmtree(out, ignore_errors=True)
    resolved = [
        (int(c[3:]), round(float(s), 6)) for c, _, s in rows
    ]
    resolved.sort(key=lambda r: (-r[1], r[0]))
    return spark.createDataFrame(resolved[:20], "doc_id long, score_r6 double")


_SQL_BOOSTING = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
{_SQL_BM25_CTES}
perdoc AS (SELECT doc_id, sum(contrib) AS sc FROM scored GROUP BY doc_id),
neg AS (
  SELECT DISTINCT doc_id FROM (
    SELECT doc_id, unnest(toks) AS term FROM t
  ) WHERE term IN ('merge','sort')
),
demoted AS (
  SELECT p.doc_id,
         CASE WHEN n.doc_id IS NOT NULL THEN p.sc * 0.5 ELSE p.sc END
           AS score
  FROM perdoc p LEFT JOIN neg n USING (doc_id)
)
SELECT doc_id, round(score, 6) AS score_r6
FROM demoted ORDER BY score_r6 DESC, doc_id ASC LIMIT 20
"""


def q_pinned_engine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES pinned query (operators/querydsl.pinned_topk): docs 7, 3, 11
    promoted first in that order (score NULL — unearned), then the
    organic ranking minus the pins, 20 rows total."""
    import shutil

    from ics_search_engine_spark.operators.querydsl import pinned_topk

    transcripts = _transcripts_with_role(spark, sf_dir)
    pins = [("doc%08d" % d, 0) for d in (7, 3, 11)]
    out, pidx = _agg_gate_index(spark, transcripts, "gate_pinned_idx_")
    try:
        rows = pinned_topk(
            spark, pidx, " ".join(DOCS_QUERY_TERMS), pins, k=40
        ).collect()
    finally:
        shutil.rmtree(out, ignore_errors=True)
    head = [
        (i + 1, int(r["conv_id"][3:]), True, None)
        for i, r in enumerate(rows[: len(pins)])
    ]
    organic = sorted(
        (
            (round(float(r["score"]), 6), int(r["conv_id"][3:]))
            for r in rows[len(pins):]
        ),
        key=lambda x: (-x[0], x[1]),
    )[: 20 - len(pins)]
    tail = [
        (len(pins) + i + 1, d, False, s)
        for i, (s, d) in enumerate(organic)
    ]
    return spark.createDataFrame(
        head + tail,
        "rank int, doc_id long, pinned boolean, score_r6 double",
    )


_SQL_PINNED = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
{_SQL_BM25_CTES}
perdoc AS (SELECT doc_id, sum(contrib) AS sc FROM scored GROUP BY doc_id),
organic AS (
  SELECT doc_id, round(sc, 6) AS r6,
         row_number() OVER (ORDER BY round(sc, 6) DESC, doc_id ASC) AS rn
  FROM perdoc WHERE doc_id NOT IN (7, 3, 11)
),
pins(rank, doc_id) AS (VALUES (1, 7), (2, 3), (3, 11))
SELECT rank::INT AS rank, doc_id::BIGINT AS doc_id, TRUE AS pinned,
       NULL::DOUBLE AS score_r6
FROM pins
UNION ALL
SELECT (rn + 3)::INT, doc_id, FALSE, r6 FROM organic WHERE rn <= 17
ORDER BY rank
"""


def q_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES weighted_avg (operators/aggs.weighted_avg): per-role
    Σ(dl·weight)/Σ(weight) over the match set with weight = doc_id % 5
    + 1 — exact integer num/den plus the rounded ratio."""
    import shutil

    from ics_search_engine_spark.operators.aggs import weighted_avg

    transcripts = _transcripts_with_role(spark, sf_dir)
    attrs = transcripts.select(
        "conv_id", "turn_idx", "role",
        F.size(toks_col()).alias("dl"),
        (F.substring("conv_id", 4, 8).cast("long") % 5 + 1)
        .cast("int").alias("w"),
    )
    out, pidx = _agg_gate_index(spark, transcripts, "gate_wavg_idx_")
    try:
        rows = weighted_avg(
            spark, pidx, " ".join(DOCS_QUERY_TERMS), attrs, "dl", "w",
            bucket_col="role",
        ).collect()
    finally:
        shutil.rmtree(out, ignore_errors=True)
    return spark.createDataFrame(
        [
            (r["role"], r["num"], r["den"], round(r["wavg"], 6))
            for r in rows
        ],
        "role string, num long, den long, wavg_r6 double",
    )


_SQL_WEIGHTED_AVG = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
m AS (
  SELECT doc_id, any_value(dl) AS dl FROM (
    SELECT doc_id, len(toks) AS dl, unnest(toks) AS term FROM t
  ) WHERE term IN ('spark','stream','window','join')
  GROUP BY doc_id
)
SELECT CASE WHEN doc_id % 2 = 0 THEN 'user' ELSE 'assistant' END AS role,
       sum(dl * (doc_id % 5 + 1))::BIGINT AS num,
       sum(doc_id % 5 + 1)::BIGINT AS den,
       round(sum(dl * (doc_id % 5 + 1))::DOUBLE
             / sum(doc_id % 5 + 1), 6) AS wavg_r6
FROM m GROUP BY role ORDER BY role
"""


def q_top_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES top_metrics (operators/aggs.top_metrics): the doc-value
    metrics of the 5 longest matched docs (sort = dl desc, doc_id
    tie-break)."""
    import shutil

    from ics_search_engine_spark.operators.aggs import top_metrics

    transcripts = _transcripts_with_role(spark, sf_dir)
    attrs = transcripts.select(
        "conv_id", "turn_idx", "role", "source",
        F.size(toks_col()).alias("dl"),
    )
    out, pidx = _agg_gate_index(spark, transcripts, "gate_topm_idx_")
    try:
        rows = top_metrics(
            spark, pidx, " ".join(DOCS_QUERY_TERMS), attrs, "dl",
            ["role", "source"], k=5,
        ).collect()
    finally:
        shutil.rmtree(out, ignore_errors=True)
    return spark.createDataFrame(
        [
            (int(r["conv_id"][3:]), r["dl"], r["role"], r["source"])
            for r in rows
        ],
        "doc_id long, dl int, role string, source string",
    )


_SQL_TOP_METRICS = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
m AS (
  SELECT doc_id, any_value(dl) AS dl FROM (
    SELECT doc_id, len(toks) AS dl, unnest(toks) AS term FROM t
  ) WHERE term IN ('spark','stream','window','join')
  GROUP BY doc_id
)
SELECT doc_id, dl::INT AS dl,
       CASE WHEN doc_id % 2 = 0 THEN 'user' ELSE 'assistant' END AS role,
       'src' || (doc_id % 7)::VARCHAR AS source
FROM m ORDER BY dl DESC, doc_id ASC LIMIT 5
"""


def q_has_parent_engine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES has_parent over the conv→turn hierarchy
    (operators/convs.has_parent_turns): every turn of the rounded-order
    top-10 matching conversations, carrying the parent's conv-max BM25
    (score_mode=score).  5-turn conv convention of the convs gates;
    30-parent exact over-fetch, rounded re-rank (gate discipline)."""
    import shutil
    import tempfile

    from ics_search_engine_spark.operators.convs import has_parent_turns
    from ics_search_engine_spark.operators.packed_index import (
        PackedIndex,
        build_packed_index,
    )

    docs = _docs(spark, sf_dir)
    transcripts = docs.select(
        F.format_string(
            "conv%07d", (F.col("doc_id") / 5).cast("long")
        ).alias("conv_id"),
        (F.col("doc_id") % 5).cast("int").alias("turn_idx"),
        F.col("text"),
    )
    out = tempfile.mkdtemp(prefix="gate_hasparent_idx_")
    try:
        build_packed_index(
            spark, transcripts, out, range_bits=8, with_positions=False,
            stem=False,
        )
        pidx = PackedIndex(spark, out)
        rows = has_parent_turns(
            spark, pidx, " ".join(DOCS_QUERY_TERMS), k_parents=30
        ).collect()
    finally:
        shutil.rmtree(out, ignore_errors=True)
    by_conv: dict[int, tuple[float, list[int]]] = {}
    for r in rows:
        c = int(r["conv_id"][4:])
        s = round(r["parent_score"], 6)
        by_conv.setdefault(c, (s, []))[1].append(int(r["turn_idx"]))
    winners = sorted(by_conv.items(), key=lambda kv: (-kv[1][0], kv[0]))[:10]
    out_rows = [
        (c, t, s)
        for c, (s, turns) in winners
        for t in sorted(turns)
    ]
    return spark.createDataFrame(
        out_rows, "conv_num long, turn_idx int, parent_r6 double"
    )


_SQL_HAS_PARENT = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
{_SQL_BM25_CTES}
perdoc AS (SELECT doc_id, sum(contrib) AS sc FROM scored GROUP BY doc_id),
convs AS (
  SELECT doc_id // 5 AS conv_num, round(max(sc), 6) AS parent_r6
  FROM perdoc GROUP BY conv_num
),
winners AS (
  SELECT conv_num, parent_r6 FROM convs
  ORDER BY parent_r6 DESC, conv_num ASC LIMIT 10
)
SELECT w.conv_num, (d.doc_id % 5)::INT AS turn_idx, w.parent_r6
FROM winners w JOIN documents d ON d.doc_id // 5 = w.conv_num
ORDER BY w.parent_r6 DESC, w.conv_num, turn_idx
"""


def q_adjacency_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES adjacency_matrix aggregation (operators/aggs.adjacency_matrix):
    named predicates + every pairwise intersection counted in ONE pass;
    empty intersections dropped (ES semantics)."""
    import shutil

    from ics_search_engine_spark.operators.aggs import adjacency_matrix

    transcripts = _transcripts_with_role(spark, sf_dir)
    out, pidx = _agg_gate_index(spark, transcripts, "gate_adj_idx_")
    try:
        rows = adjacency_matrix(
            spark, pidx, " ".join(DOCS_QUERY_TERMS),
            transcripts.select("conv_id", "turn_idx", "role", "source"),
            {
                "assist": F.col("role") == "assistant",
                "evensrc": F.col("source").isin("src0", "src2", "src4"),
                "lowsrc": F.col("source").isin("src0", "src1"),
            },
        ).collect()
    finally:
        shutil.rmtree(out, ignore_errors=True)
    return spark.createDataFrame(
        [(r["key"], r["n_docs"]) for r in rows], "key string, n_docs long"
    )


_SQL_ADJACENCY = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
m AS (
  SELECT DISTINCT doc_id FROM (
    SELECT doc_id, unnest(toks) AS term FROM t
  ) WHERE term IN ('spark','stream','window','join')
),
a AS (
  SELECT (doc_id % 2 = 1) AS assist,
         ('src' || (doc_id % 7)::VARCHAR) IN ('src0','src2','src4')
           AS evensrc,
         ('src' || (doc_id % 7)::VARCHAR) IN ('src0','src1') AS lowsrc
  FROM m
),
cells AS (
  SELECT 'assist' AS key, count(*) FILTER (assist)::BIGINT AS n_docs FROM a
  UNION ALL
  SELECT 'assist&evensrc', count(*) FILTER (assist AND evensrc)::BIGINT FROM a
  UNION ALL
  SELECT 'assist&lowsrc', count(*) FILTER (assist AND lowsrc)::BIGINT FROM a
  UNION ALL
  SELECT 'evensrc', count(*) FILTER (evensrc)::BIGINT FROM a
  UNION ALL
  SELECT 'evensrc&lowsrc', count(*) FILTER (evensrc AND lowsrc)::BIGINT FROM a
  UNION ALL
  SELECT 'lowsrc', count(*) FILTER (lowsrc)::BIGINT FROM a
)
SELECT key, n_docs FROM cells WHERE n_docs > 0 ORDER BY key
"""


def q_bucket_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed bucket pipeline (operators/aggs): dl histogram →
    bucket_selector (n_docs >= 2) → moving_avg (window 3) →
    bucket_sort by (n_docs desc, bucket_lo asc) size 3 — the ES
    pipeline-aggregation chain, each stage over the already-reduced
    bucket frame."""
    import shutil

    from ics_search_engine_spark.operators.aggs import (
        bucket_selector,
        bucket_sort,
        histogram,
        moving_avg,
    )

    transcripts = _transcripts_with_role(spark, sf_dir)
    attrs = transcripts.select(
        "conv_id", "turn_idx", F.size(toks_col()).alias("dl")
    )
    out, pidx = _agg_gate_index(spark, transcripts, "gate_bpipe_idx_")
    try:
        histo = histogram(
            spark, pidx, " ".join(DOCS_QUERY_TERMS), attrs, "dl", 20
        )
        kept = bucket_selector(histo, F.col("n_docs") >= 2)
        rows = bucket_sort(
            moving_avg(kept, "bucket_lo", "n_docs", 3),
            [("n_docs", "desc"), ("bucket_lo", "asc")], size=3,
        ).collect()
    finally:
        shutil.rmtree(out, ignore_errors=True)
    return spark.createDataFrame(
        [
            (r["bucket_lo"], r["n_docs"], round(r["mavg"], 6))
            for r in rows
        ],
        "bucket_lo long, n_docs long, mavg_r6 double",
    )


_SQL_BUCKET_PIPELINE = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
m AS (
  SELECT doc_id, any_value(dl) AS dl FROM (
    SELECT doc_id, len(toks) AS dl, unnest(toks) AS term FROM t
  ) WHERE term IN ('spark','stream','window','join')
  GROUP BY doc_id
),
h AS (
  SELECT (dl // 20 * 20)::BIGINT AS bucket_lo, count(*)::BIGINT AS n_docs
  FROM m GROUP BY bucket_lo
),
kept AS (SELECT * FROM h WHERE n_docs >= 2),
mv AS (
  SELECT bucket_lo, n_docs,
         round(avg(n_docs) OVER (ORDER BY bucket_lo
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS mavg_r6
  FROM kept
)
SELECT bucket_lo, n_docs, mavg_r6 FROM mv
ORDER BY n_docs DESC, bucket_lo ASC LIMIT 3
"""


def _fielded_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents as one-turn transcripts with a synthesized TITLE field
    that shares vocabulary with the query (doc_id % 3 rotation), so
    multi-field scoring has real cross-field matches to combine."""
    return _docs(spark, sf_dir).select(
        F.format_string("doc%08d", F.col("doc_id")).alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.when(F.col("doc_id") % 3 == 0, "spark streaming guide")
        .when(F.col("doc_id") % 3 == 1, "window join notes")
        .otherwise("misc other notes")
        .alias("title"),
        F.col("text"),
    )


def _multi_match_gate(spark: SparkSession, sf_dir: str, mode: str,
                      tie_breaker: float = 0.0) -> DataFrame:
    """Shared body of the multi_match gates: fielded index over
    (text, title), query through operators/fields.multi_match_topk,
    rounded-order top-20 (the engine-gate convention)."""
    import shutil
    import tempfile

    from ics_search_engine_spark.operators.fields import (
        FieldedIndex,
        build_fielded_index,
        multi_match_topk,
    )

    transcripts = _fielded_transcripts(spark, sf_dir)
    out = tempfile.mkdtemp(prefix="gate_fielded_idx_")
    try:
        build_fielded_index(
            spark, transcripts, out, ["text", "title"], range_bits=8,
            stem=False,
        )
        fidx = FieldedIndex(spark, out)
        rows = multi_match_topk(
            spark, fidx, " ".join(DOCS_QUERY_TERMS),
            {"text": 1.0, "title": 2.0}, k=60, mode=mode,
            tie_breaker=tie_breaker,
        ).collect()
    finally:
        shutil.rmtree(out, ignore_errors=True)
    resolved = [(int(c[3:]), round(float(s), 6)) for c, _, s in rows]
    resolved.sort(key=lambda r: (-r[1], r[0]))
    return spark.createDataFrame(
        resolved[:20], "doc_id long, score_r6 double"
    )


def q_multi_match_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """multi_match best_fields (operators/fields.multi_match_topk):
    dis-max over per-field BM25 with boosts {text:1, title:2} and
    tie_breaker 0.3 — the Lucene DisjunctionMaxQuery combination over
    genuinely separate per-field statistics (df, avgdl)."""
    return _multi_match_gate(spark, sf_dir, "best_fields", 0.3)


def q_multi_match_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """multi_match cross_fields: term-centric blending — blended df =
    max over fields, one idf, per (doc, term) the best boosted
    saturation across fields (see operators/fields docstring for the
    exact formula the oracle replays)."""
    return _multi_match_gate(spark, sf_dir, "cross_fields")


_SQL_FIELDED_BASE = f"""
WITH t AS (
  SELECT doc_id, {_SQL_TOKS} AS toks,
         list_filter(regexp_split_to_array(lower(
           CASE WHEN doc_id % 3 = 0 THEN 'spark streaming guide'
                WHEN doc_id % 3 = 1 THEN 'window join notes'
                ELSE 'misc other notes' END), '[^a-z0-9]+'),
           x -> length(x) > 1) AS ttoks
  FROM documents
),
stats AS (
  SELECT count(*)::DOUBLE AS n,
         avg(len(toks)) AS avgdl_text, avg(len(ttoks)) AS avgdl_title
  FROM t
),
posts_text AS (
  SELECT term, doc_id, count(*) AS tf, any_value(dl) AS dl FROM (
    SELECT doc_id, len(toks) AS dl, unnest(toks) AS term FROM t
  ) WHERE term IN ('spark','stream','window','join')
  GROUP BY term, doc_id
),
posts_title AS (
  SELECT term, doc_id, count(*) AS tf, any_value(dl) AS dl FROM (
    SELECT doc_id, len(ttoks) AS dl, unnest(ttoks) AS term FROM t
  ) WHERE term IN ('spark','stream','window','join')
  GROUP BY term, doc_id
),
dfs_text AS (SELECT term, count(*) AS df FROM posts_text GROUP BY term),
dfs_title AS (SELECT term, count(*) AS df FROM posts_title GROUP BY term)
"""

_SQL_MULTI_MATCH_BEST = _SQL_FIELDED_BASE + """
, fs_text AS (
  SELECT p.doc_id,
         1.0 * sum(ln((s.n - d.df + 0.5) / (d.df + 0.5) + 1.0)
           * (p.tf * 2.2 / (p.tf + 1.2 * (0.25 + 0.75 * p.dl / s.avgdl_text)))
         ) AS fs
  FROM posts_text p JOIN dfs_text d USING (term) CROSS JOIN stats s
  GROUP BY p.doc_id
),
fs_title AS (
  SELECT p.doc_id,
         2.0 * sum(ln((s.n - d.df + 0.5) / (d.df + 0.5) + 1.0)
           * (p.tf * 2.2 / (p.tf + 1.2 * (0.25 + 0.75 * p.dl / s.avgdl_title)))
         ) AS fs
  FROM posts_title p JOIN dfs_title d USING (term) CROSS JOIN stats s
  GROUP BY p.doc_id
),
pf AS (
  SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id, a.fs AS ft, b.fs AS fl
  FROM fs_text a FULL OUTER JOIN fs_title b ON a.doc_id = b.doc_id
),
scored AS (
  SELECT doc_id,
         CASE
           WHEN ft IS NULL THEN fl
           WHEN fl IS NULL THEN ft
           ELSE greatest(ft, fl) + 0.3 * (ft + fl - greatest(ft, fl))
         END AS score
  FROM pf
)
SELECT doc_id, round(score, 6) AS score_r6
FROM scored ORDER BY score_r6 DESC, doc_id ASC LIMIT 20
"""

_SQL_MULTI_MATCH_CROSS = _SQL_FIELDED_BASE + """
, blended AS (
  SELECT term, greatest(COALESCE(a.df, 0), COALESCE(b.df, 0)) AS df
  FROM dfs_text a FULL OUTER JOIN dfs_title b USING (term)
),
tfn AS (
  SELECT term, doc_id, btfn FROM (
    SELECT p.term, p.doc_id,
           1.0 * (p.tf * 2.2
             / (p.tf + 1.2 * (0.25 + 0.75 * p.dl / s.avgdl_text))) AS btfn
    FROM posts_text p CROSS JOIN stats s
    UNION ALL
    SELECT p.term, p.doc_id,
           2.0 * (p.tf * 2.2
             / (p.tf + 1.2 * (0.25 + 0.75 * p.dl / s.avgdl_title))) AS btfn
    FROM posts_title p CROSS JOIN stats s
  )
),
best AS (
  SELECT term, doc_id, max(btfn) AS btfn FROM tfn GROUP BY term, doc_id
),
scored AS (
  SELECT t2.doc_id,
         sum(ln((s.n - d.df + 0.5) / (d.df + 0.5) + 1.0) * t2.btfn) AS score
  FROM best t2 JOIN blended d USING (term) CROSS JOIN stats s
  GROUP BY t2.doc_id
)
SELECT doc_id, round(score, 6) AS score_r6
FROM scored ORDER BY score_r6 DESC, doc_id ASC LIMIT 20
"""


def q_extended_stats_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES extended_stats (operators/aggs.extended_stats): the
    second-moment family over the match set's doc-length doc value —
    exact integer sums plus the derived population variance/std-dev and
    ±2σ bounds, rounded r6 at the gate boundary."""
    import shutil

    from ics_search_engine_spark.operators.aggs import extended_stats

    transcripts = _transcripts_with_role(spark, sf_dir)
    attrs = transcripts.select(
        "conv_id", "turn_idx", F.size(toks_col()).alias("dl")
    )
    out, pidx = _agg_gate_index(spark, transcripts, "gate_estats_idx_")
    try:
        r = extended_stats(
            spark, pidx, " ".join(DOCS_QUERY_TERMS), attrs, "dl"
        ).collect()[0]
    finally:
        shutil.rmtree(out, ignore_errors=True)
    return spark.createDataFrame(
        [(
            r["n_docs"], r["min_v"], r["max_v"], int(r["sum_v"]),
            int(r["sum_sq"]), round(r["avg_v"], 6), round(r["var_pop"], 6),
            round(r["std_dev"], 6), round(r["std_upper"], 6),
            round(r["std_lower"], 6),
        )],
        "n_docs long, min_v int, max_v int, sum_v long, sum_sq long, "
        "avg_r6 double, var_r6 double, std_r6 double, upper_r6 double, "
        "lower_r6 double",
    )


_SQL_EXTENDED_STATS = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
m AS (
  SELECT doc_id, any_value(dl) AS dl FROM (
    SELECT doc_id, len(toks) AS dl, unnest(toks) AS term FROM t
  ) WHERE term IN ('spark','stream','window','join')
  GROUP BY doc_id
),
s AS (
  SELECT count(*)::BIGINT AS n_docs, min(dl)::INT AS min_v,
         max(dl)::INT AS max_v, sum(dl)::BIGINT AS sum_v,
         sum(dl*dl)::BIGINT AS sum_sq
  FROM m
)
SELECT n_docs, min_v, max_v, sum_v, sum_sq,
  round(sum_v::DOUBLE / n_docs, 6) AS avg_r6,
  round(sum_sq::DOUBLE / n_docs
        - (sum_v::DOUBLE / n_docs) * (sum_v::DOUBLE / n_docs), 6)
    AS var_r6,
  round(sqrt(greatest(sum_sq::DOUBLE / n_docs
        - (sum_v::DOUBLE / n_docs) * (sum_v::DOUBLE / n_docs), 0.0)), 6)
    AS std_r6,
  round(sum_v::DOUBLE / n_docs
        + 2.0 * sqrt(greatest(sum_sq::DOUBLE / n_docs
          - (sum_v::DOUBLE / n_docs) * (sum_v::DOUBLE / n_docs), 0.0)), 6)
    AS upper_r6,
  round(sum_v::DOUBLE / n_docs
        - 2.0 * sqrt(greatest(sum_sq::DOUBLE / n_docs
          - (sum_v::DOUBLE / n_docs) * (sum_v::DOUBLE / n_docs), 0.0)), 6)
    AS lower_r6
FROM s
"""


def q_boxplot_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES boxplot (operators/aggs.boxplot): exact
    linear-interpolation five-number summary of the doc-length value
    over the match set (the percentiles gate's definition, r6)."""
    import shutil

    from ics_search_engine_spark.operators.aggs import boxplot

    transcripts = _transcripts_with_role(spark, sf_dir)
    attrs = transcripts.select(
        "conv_id", "turn_idx", F.size(toks_col()).alias("dl")
    )
    out, pidx = _agg_gate_index(spark, transcripts, "gate_boxplot_idx_")
    try:
        r = boxplot(
            spark, pidx, " ".join(DOCS_QUERY_TERMS), attrs, "dl"
        ).collect()[0]
    finally:
        shutil.rmtree(out, ignore_errors=True)
    return spark.createDataFrame(
        [(
            r["min_v"], round(r["q1"], 6), round(r["q2"], 6),
            round(r["q3"], 6), r["max_v"],
        )],
        "min_v int, q1_r6 double, q2_r6 double, q3_r6 double, max_v int",
    )


_SQL_BOXPLOT = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
m AS (
  SELECT doc_id, any_value(dl) AS dl FROM (
    SELECT doc_id, len(toks) AS dl, unnest(toks) AS term FROM t
  ) WHERE term IN ('spark','stream','window','join')
  GROUP BY doc_id
)
SELECT min(dl)::INT AS min_v,
       round(quantile_cont(dl, 0.25), 6) AS q1_r6,
       round(quantile_cont(dl, 0.5), 6) AS q2_r6,
       round(quantile_cont(dl, 0.75), 6) AS q3_r6,
       max(dl)::INT AS max_v
FROM m
"""


def q_percentile_ranks_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES percentile_ranks (operators/aggs.percentile_ranks): the exact
    empirical-CDF rank (100·|v≤x|/n) of four probe doc-lengths — the
    operator's documented exact contract vs ES's t-digest approx."""
    import shutil

    from ics_search_engine_spark.operators.aggs import percentile_ranks

    transcripts = _transcripts_with_role(spark, sf_dir)
    attrs = transcripts.select(
        "conv_id", "turn_idx", F.size(toks_col()).alias("dl")
    )
    out, pidx = _agg_gate_index(spark, transcripts, "gate_pranks_idx_")
    try:
        rows = percentile_ranks(
            spark, pidx, " ".join(DOCS_QUERY_TERMS), attrs, "dl",
            [20.0, 40.0, 80.0, 160.0],
        ).collect()
    finally:
        shutil.rmtree(out, ignore_errors=True)
    return spark.createDataFrame(
        [(r["value"], round(r["pct_rank"], 6)) for r in rows],
        "value double, pct_r6 double",
    )


_SQL_PERCENTILE_RANKS = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
m AS (
  SELECT doc_id, any_value(dl) AS dl FROM (
    SELECT doc_id, len(toks) AS dl, unnest(toks) AS term FROM t
  ) WHERE term IN ('spark','stream','window','join')
  GROUP BY doc_id
),
probes AS (SELECT unnest([20.0, 40.0, 80.0, 160.0]) AS value)
SELECT p.value,
       round(100.0 * (SELECT count(*) FROM m WHERE dl <= p.value)
             / (SELECT count(*) FROM m), 6) AS pct_r6
FROM probes p ORDER BY p.value
"""


def q_mad_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES median_absolute_deviation (operators/aggs.
    median_abs_deviation): median(|dl − median(dl)|), both medians
    percentile_cont-exact — the two-pass robust-dispersion pipeline."""
    import shutil

    from ics_search_engine_spark.operators.aggs import median_abs_deviation

    transcripts = _transcripts_with_role(spark, sf_dir)
    attrs = transcripts.select(
        "conv_id", "turn_idx", F.size(toks_col()).alias("dl")
    )
    out, pidx = _agg_gate_index(spark, transcripts, "gate_mad_idx_")
    try:
        r = median_abs_deviation(
            spark, pidx, " ".join(DOCS_QUERY_TERMS), attrs, "dl"
        ).collect()[0]
    finally:
        shutil.rmtree(out, ignore_errors=True)
    return spark.createDataFrame(
        [(round(r["median_v"], 6), round(r["mad"], 6))],
        "median_r6 double, mad_r6 double",
    )


_SQL_MAD = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
m AS (
  SELECT doc_id, any_value(dl) AS dl FROM (
    SELECT doc_id, len(toks) AS dl, unnest(toks) AS term FROM t
  ) WHERE term IN ('spark','stream','window','join')
  GROUP BY doc_id
),
med AS (SELECT quantile_cont(dl, 0.5) AS median_v FROM m)
SELECT round(any_value(med.median_v), 6) AS median_r6,
       round(quantile_cont(abs(m.dl::DOUBLE - med.median_v), 0.5), 6)
         AS mad_r6
FROM m CROSS JOIN med
"""


def q_string_stats_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES string_stats (operators/aggs.string_stats) over the matched
    docs' raw text: character-length extremes and exact sum plus the
    Shannon entropy (bits) of the pooled character distribution."""
    import shutil

    from ics_search_engine_spark.operators.aggs import string_stats

    transcripts = _transcripts_with_role(spark, sf_dir)
    attrs = transcripts.select("conv_id", "turn_idx", "text")
    out, pidx = _agg_gate_index(spark, transcripts, "gate_sstats_idx_")
    try:
        r = string_stats(
            spark, pidx, " ".join(DOCS_QUERY_TERMS), attrs, "text"
        ).collect()[0]
    finally:
        shutil.rmtree(out, ignore_errors=True)
    return spark.createDataFrame(
        [(
            r["n_docs"], r["min_len"], r["max_len"], int(r["sum_len"]),
            round(r["entropy"], 6),
        )],
        "n_docs long, min_len int, max_len int, sum_len long, "
        "entropy_r6 double",
    )


_SQL_STRING_STATS = f"""
WITH t AS (SELECT doc_id, text, {_SQL_TOKS} AS toks FROM documents),
m AS (
  SELECT doc_id, any_value(text) AS text FROM (
    SELECT doc_id, text, unnest(toks) AS term FROM t
  ) WHERE term IN ('spark','stream','window','join')
  GROUP BY doc_id
),
dist AS (
  SELECT ch, count(*)::DOUBLE AS c FROM (
    SELECT unnest(string_split(text, '')) AS ch FROM m
  ) WHERE len(ch) > 0 GROUP BY ch
),
tot AS (SELECT sum(c) AS tc FROM dist)
SELECT (SELECT count(*)::BIGINT FROM m) AS n_docs,
       (SELECT min(len(text))::INT FROM m) AS min_len,
       (SELECT max(len(text))::INT FROM m) AS max_len,
       (SELECT sum(len(text))::BIGINT FROM m) AS sum_len,
       round(-sum((c / tc) * log2(c / tc)), 6) AS entropy_r6
FROM dist CROSS JOIN tot
"""


def q_matrix_stats_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES matrix_stats (operators/aggs.matrix_stats) between the
    token-count and character-count doc values: population moments
    (mean/var/skew/Pearson-kurtosis per field) and the cross
    covariance/correlation, all derived from exact int64 power sums."""
    import shutil

    from ics_search_engine_spark.operators.aggs import matrix_stats

    transcripts = _transcripts_with_role(spark, sf_dir)
    attrs = transcripts.select(
        "conv_id", "turn_idx",
        F.size(toks_col()).alias("dl"),
        F.length("text").alias("n_chars"),
    )
    out, pidx = _agg_gate_index(spark, transcripts, "gate_mstats_idx_")
    try:
        r = matrix_stats(
            spark, pidx, " ".join(DOCS_QUERY_TERMS), attrs,
            "dl", "n_chars",
        ).collect()[0]
    finally:
        shutil.rmtree(out, ignore_errors=True)
    return spark.createDataFrame(
        [(
            r["n_docs"], round(r["mean_a"], 6), round(r["mean_b"], 6),
            round(r["var_a"], 6), round(r["var_b"], 6),
            round(r["skew_a"], 6), round(r["skew_b"], 6),
            round(r["kurt_a"], 6), round(r["kurt_b"], 6),
            round(r["covariance"], 6), round(r["correlation"], 6),
        )],
        "n_docs long, mean_a_r6 double, mean_b_r6 double, "
        "var_a_r6 double, var_b_r6 double, skew_a_r6 double, "
        "skew_b_r6 double, kurt_a_r6 double, kurt_b_r6 double, "
        "cov_r6 double, corr_r6 double",
    )


# the closed forms mirror the Spark expressions term for term (same
# op order) so the only divergence budget is the r6 rounding
_SQL_MATRIX_STATS = f"""
WITH t AS (SELECT doc_id, text, {_SQL_TOKS} AS toks FROM documents),
m AS (
  SELECT doc_id, any_value(dl)::BIGINT AS a,
         any_value(nc)::BIGINT AS b FROM (
    SELECT doc_id, len(toks) AS dl, len(text) AS nc,
           unnest(toks) AS term FROM t
  ) WHERE term IN ('spark','stream','window','join')
  GROUP BY doc_id
),
s AS (
  SELECT count(*)::BIGINT AS n_docs,
         sum(a)::BIGINT AS sa1, sum(a*a)::BIGINT AS sa2,
         sum(a*a*a)::BIGINT AS sa3, sum(a*a*a*a)::BIGINT AS sa4,
         sum(b)::BIGINT AS sb1, sum(b*b)::BIGINT AS sb2,
         sum(b*b*b)::BIGINT AS sb3, sum(b*b*b*b)::BIGINT AS sb4,
         sum(a*b)::BIGINT AS sab
  FROM m
),
d AS (
  SELECT n_docs, n_docs::DOUBLE AS n,
         sa1::DOUBLE AS a1, sa2::DOUBLE AS a2, sa3::DOUBLE AS a3,
         sa4::DOUBLE AS a4, sb1::DOUBLE AS b1, sb2::DOUBLE AS b2,
         sb3::DOUBLE AS b3, sb4::DOUBLE AS b4, sab::DOUBLE AS ab
  FROM s
),
mm AS (
  SELECT n_docs, n, a1/n AS ma, b1/n AS mb,
         a2/n - (a1/n)*(a1/n) AS va, b2/n - (b1/n)*(b1/n) AS vb,
         a3/n - 3.0*(a1/n)*(a2/n) + 2.0*(a1/n)*(a1/n)*(a1/n) AS m3a,
         b3/n - 3.0*(b1/n)*(b2/n) + 2.0*(b1/n)*(b1/n)*(b1/n) AS m3b,
         a4/n - 4.0*(a1/n)*(a3/n) + 6.0*(a1/n)*(a1/n)*(a2/n)
              - 3.0*(a1/n)*(a1/n)*(a1/n)*(a1/n) AS m4a,
         b4/n - 4.0*(b1/n)*(b3/n) + 6.0*(b1/n)*(b1/n)*(b2/n)
              - 3.0*(b1/n)*(b1/n)*(b1/n)*(b1/n) AS m4b,
         ab/n - (a1/n)*(b1/n) AS cov
  FROM d
)
SELECT n_docs,
  round(ma, 6) AS mean_a_r6, round(mb, 6) AS mean_b_r6,
  round(va, 6) AS var_a_r6, round(vb, 6) AS var_b_r6,
  round(CASE WHEN va > 0 THEN m3a / pow(va, 1.5) ELSE 0.0 END, 6)
    AS skew_a_r6,
  round(CASE WHEN vb > 0 THEN m3b / pow(vb, 1.5) ELSE 0.0 END, 6)
    AS skew_b_r6,
  round(CASE WHEN va > 0 THEN m4a / (va * va) ELSE 0.0 END, 6)
    AS kurt_a_r6,
  round(CASE WHEN vb > 0 THEN m4b / (vb * vb) ELSE 0.0 END, 6)
    AS kurt_b_r6,
  round(cov, 6) AS cov_r6,
  round(CASE WHEN va > 0 AND vb > 0 THEN cov / sqrt(va * vb)
        ELSE 0.0 END, 6) AS corr_r6
FROM mm
"""


def q_multi_terms_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES multi_terms (operators/aggs.multi_terms): doc counts per
    (role, source) composite key over the match set, top 10 by
    (count desc, keys asc) — popularity-ranked where composite pages
    key-ordered."""
    import shutil

    from ics_search_engine_spark.operators.aggs import multi_terms

    transcripts = _transcripts_with_role(spark, sf_dir)
    attrs = transcripts.select("conv_id", "turn_idx", "role", "source")
    out, pidx = _agg_gate_index(spark, transcripts, "gate_mterms_idx_")
    try:
        rows = multi_terms(
            spark, pidx, " ".join(DOCS_QUERY_TERMS), attrs,
            ["role", "source"], size=10,
        ).collect()
    finally:
        shutil.rmtree(out, ignore_errors=True)
    return spark.createDataFrame(
        [(r["role"], r["source"], r["n_docs"]) for r in rows],
        "role string, source string, n_docs long",
    )


_SQL_MULTI_TERMS = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
m AS (
  SELECT doc_id FROM (
    SELECT doc_id, unnest(toks) AS term FROM t
  ) WHERE term IN ('spark','stream','window','join')
  GROUP BY doc_id
),
k AS (
  SELECT CASE WHEN d.doc_id % 2 = 0 THEN 'user' ELSE 'assistant' END
           AS role,
         'src' || (d.doc_id % 7)::VARCHAR AS source
  FROM documents d JOIN m USING (doc_id)
)
SELECT role, source, count(*)::BIGINT AS n_docs
FROM k GROUP BY role, source
ORDER BY n_docs DESC, role ASC, source ASC LIMIT 10
"""


def q_t_test_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES t_test, Welch flavor (operators/aggs.t_test): the
    heteroscedastic t statistic between user- and assistant-role doc
    lengths over the match set, from exact conditional power sums."""
    import shutil

    from ics_search_engine_spark.operators.aggs import t_test

    transcripts = _transcripts_with_role(spark, sf_dir)
    attrs = transcripts.select(
        "conv_id", "turn_idx", "role", F.size(toks_col()).alias("dl")
    )
    out, pidx = _agg_gate_index(spark, transcripts, "gate_ttest_idx_")
    try:
        r = t_test(
            spark, pidx, " ".join(DOCS_QUERY_TERMS), attrs, "dl",
            "role", "user", "assistant",
        ).collect()[0]
    finally:
        shutil.rmtree(out, ignore_errors=True)
    return spark.createDataFrame(
        [(
            r["n_a"], r["n_b"], round(r["mean_a"], 6),
            round(r["mean_b"], 6),
            None if r["t_stat"] is None else round(r["t_stat"], 6),
        )],
        "n_a long, n_b long, mean_a_r6 double, mean_b_r6 double, "
        "t_r6 double",
    )


_SQL_T_TEST = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
m AS (
  SELECT doc_id, any_value(dl)::DOUBLE AS v FROM (
    SELECT doc_id, len(toks) AS dl, unnest(toks) AS term FROM t
  ) WHERE term IN ('spark','stream','window','join')
  GROUP BY doc_id
),
g AS (
  SELECT m.doc_id, m.v,
         CASE WHEN m.doc_id % 2 = 0 THEN 'user' ELSE 'assistant' END
           AS role
  FROM m
),
s AS (
  SELECT sum(CASE WHEN role = 'user' THEN 1 ELSE 0 END)::BIGINT AS n_a,
         sum(CASE WHEN role = 'assistant' THEN 1 ELSE 0 END)::BIGINT
           AS n_b,
         sum(CASE WHEN role = 'user' THEN v ELSE 0.0 END) AS s1a,
         sum(CASE WHEN role = 'assistant' THEN v ELSE 0.0 END) AS s1b,
         sum(CASE WHEN role = 'user' THEN v * v ELSE 0.0 END) AS s2a,
         sum(CASE WHEN role = 'assistant' THEN v * v ELSE 0.0 END) AS s2b
  FROM g
)
SELECT n_a, n_b,
  round(s1a / n_a, 6) AS mean_a_r6,
  round(s1b / n_b, 6) AS mean_b_r6,
  round(CASE WHEN n_a >= 2 AND n_b >= 2
             AND ((s2a - s1a * s1a / n_a) / (n_a - 1) / n_a
                  + (s2b - s1b * s1b / n_b) / (n_b - 1) / n_b) > 0
        THEN (s1a / n_a - s1b / n_b)
             / sqrt((s2a - s1a * s1a / n_a) / (n_a - 1) / n_a
                    + (s2b - s1b * s1b / n_b) / (n_b - 1) / n_b)
        END, 6) AS t_r6
FROM s
"""


def q_normalize_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES normalize pipeline aggregation (operators/aggs.
    normalize_buckets): the dl histogram's doc counts rescaled to
    [0,1] and to percent-of-sum across sibling buckets — two methods
    riding one bucket frame."""
    import shutil

    from ics_search_engine_spark.operators.aggs import (
        histogram,
        normalize_buckets,
    )

    transcripts = _transcripts_with_role(spark, sf_dir)
    attrs = transcripts.select(
        "conv_id", "turn_idx", F.size(toks_col()).alias("dl")
    )
    out, pidx = _agg_gate_index(spark, transcripts, "gate_norm_idx_")
    try:
        histo = histogram(
            spark, pidx, " ".join(DOCS_QUERY_TERMS), attrs, "dl", 20
        )
        rows = (
            normalize_buckets(
                normalize_buckets(histo, "n_docs", "rescale_0_1", "r01"),
                "n_docs", "percent_of_sum", "pct",
            )
            .orderBy("bucket_lo")
            .collect()
        )
    finally:
        shutil.rmtree(out, ignore_errors=True)
    return spark.createDataFrame(
        [
            (r["bucket_lo"], r["n_docs"], round(r["r01"], 6),
             round(r["pct"], 6))
            for r in rows
        ],
        "bucket_lo long, n_docs long, r01_r6 double, pct_r6 double",
    )


_SQL_NORMALIZE = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
m AS (
  SELECT doc_id, any_value(dl) AS dl FROM (
    SELECT doc_id, len(toks) AS dl, unnest(toks) AS term FROM t
  ) WHERE term IN ('spark','stream','window','join')
  GROUP BY doc_id
),
h AS (
  SELECT (dl // 20 * 20)::BIGINT AS bucket_lo, count(*)::BIGINT AS n_docs
  FROM m GROUP BY bucket_lo
)
SELECT bucket_lo, n_docs,
  round(CASE WHEN max(n_docs) OVER () - min(n_docs) OVER () > 0
        THEN (n_docs - min(n_docs) OVER ())::DOUBLE
             / (max(n_docs) OVER () - min(n_docs) OVER ())
        ELSE 0.0 END, 6) AS r01_r6,
  round(n_docs::DOUBLE / sum(n_docs) OVER (), 6) AS pct_r6
FROM h ORDER BY bucket_lo
"""


def q_percolate_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES percolator (operators/percolate): four registered queries
    inverted into a query-term index, every document percolated
    through one broadcast join — (query_id, doc_id, matched, n_terms)
    pairs where the doc contains ALL the query's terms (operator-AND).
    Query 3 carries an absent term, so it must match nothing."""
    from ics_search_engine_spark.operators.percolate import (
        build_query_index,
        percolate,
    )

    queries = spark.createDataFrame(
        [
            (0, "spark stream"),
            (1, "window join"),
            (2, "spark window join"),
            (3, "qzzzabsent spark"),
        ],
        "query_id int, query string",
    )
    qidx = build_query_index(spark, queries, do_stem=False)
    docs = _docs(spark, sf_dir)
    return percolate(
        spark, qidx, docs, ["doc_id"], do_stem=False
    ).select(
        "query_id", "doc_id", "matched", "n_terms"
    )


_SQL_PERCOLATE = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
dt AS (SELECT DISTINCT doc_id, unnest(toks) AS term FROM t),
q AS (
  SELECT * FROM (VALUES
    (0, 'spark', 2), (0, 'stream', 2),
    (1, 'window', 2), (1, 'join', 2),
    (2, 'spark', 3), (2, 'window', 3), (2, 'join', 3),
    (3, 'qzzzabsent', 2), (3, 'spark', 2)
  ) v(query_id, term, n_terms)
),
c AS (
  SELECT q.query_id::INT AS query_id, dt.doc_id,
         count(*)::BIGINT AS matched,
         any_value(q.n_terms)::INT AS n_terms
  FROM dt JOIN q USING (term)
  GROUP BY q.query_id, dt.doc_id
)
SELECT query_id, doc_id, matched, n_terms
FROM c WHERE matched >= n_terms
"""


def q_phrase_suggest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES phrase suggester (operators/spell.phrase_suggest): the
    misspelled phrase 'spark strem' corrected by ranking candidate
    phrases with a stupid-backoff bigram LM computed from the packed
    POSITIONAL index — the oracle regenerates candidates (levenshtein
    over the vocabulary), recounts unigrams/bigram adjacencies
    relationally, and replays the identical backoff algebra."""
    import shutil
    import tempfile

    from ics_search_engine_spark.operators.packed_index import (
        PackedIndex,
        build_packed_index,
    )
    from ics_search_engine_spark.operators.spell import phrase_suggest

    docs = _docs(spark, sf_dir)
    transcripts = docs.select(
        F.format_string("doc%08d", F.col("doc_id")).alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.col("text"),
    )
    out = tempfile.mkdtemp(prefix="gate_psuggest_idx_")
    try:
        build_packed_index(
            spark, transcripts, out, range_bits=8, with_positions=True,
            stem=False,
        )
        pidx = PackedIndex(spark, out)
        rows = phrase_suggest(
            spark, pidx, "spark strem", max_dist=2, per_token=3, size=3
        ).collect()
    finally:
        shutil.rmtree(out, ignore_errors=True)
    return spark.createDataFrame(
        [(r["suggestion"], round(r["score"], 6)) for r in rows],
        "suggestion string, score_r6 double",
    )


_SQL_PHRASE_SUGGEST = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
u AS (SELECT doc_id, unnest(toks) AS term FROM t),
vocab AS (
  SELECT term, count(DISTINCT doc_id)::BIGINT AS df,
         count(*)::BIGINT AS cf
  FROM u GROUP BY term
),
tot AS (SELECT sum(len(toks))::DOUBLE AS T FROM t),
c0 AS (
  SELECT term FROM vocab WHERE levenshtein(term, 'spark') <= 2
  ORDER BY levenshtein(term, 'spark'), df DESC, term LIMIT 3
),
c1 AS (
  SELECT term FROM vocab WHERE levenshtein(term, 'strem') <= 2
  ORDER BY levenshtein(term, 'strem'), df DESC, term LIMIT 3
),
phrases AS (SELECT c0.term AS w0, c1.term AS w1 FROM c0 CROSS JOIN c1),
-- DuckDB lambdas can't capture correlated columns, so count every
-- adjacent pair once (tokens are [a-z0-9]+, space is a safe join key)
bi AS (
  SELECT unnest(list_transform(
           range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1]
         )) AS pair
  FROM t
),
bic AS (SELECT pair, count(*)::BIGINT AS c FROM bi GROUP BY pair),
adj AS (
  SELECT p.w0, p.w1, coalesce(bic.c, 0) AS c
  FROM phrases p LEFT JOIN bic ON bic.pair = p.w0 || ' ' || p.w1
),
scored AS (
  SELECT a.w0 || ' ' || a.w1 AS suggestion,
         log10(v0.cf / tot.T)
         + log10(CASE WHEN a.c > 0 THEN a.c / v0.cf::DOUBLE
                      ELSE 0.4 * v1.cf / tot.T END) AS score
  FROM adj a
  JOIN vocab v0 ON v0.term = a.w0
  JOIN vocab v1 ON v1.term = a.w1
  CROSS JOIN tot
)
SELECT suggestion, round(score, 6) AS score_r6
FROM scored ORDER BY score DESC, suggestion LIMIT 3
"""


def q_federated_boost(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Federated multi-index search (operators/federated.
    federated_topk): two independently-built halves of the corpus
    (doc_id parity), each scored with its OWN df/avgdl/n statistics —
    the ES cross-cluster contract — the odd half boosted ×2, merged
    top-20.  The oracle recomputes BOTH per-half BM25 rankings with
    per-half stats and replays the boost + merge; the rounded-order
    top-20 is the engine gates' boundary convention."""
    import shutil
    import tempfile

    from ics_search_engine_spark.operators.federated import federated_topk
    from ics_search_engine_spark.operators.packed_index import (
        PackedIndex,
        build_packed_index,
    )

    docs = _docs(spark, sf_dir)
    transcripts = docs.select(
        F.format_string("doc%08d", F.col("doc_id")).alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        (F.col("doc_id") % 2).alias("half"),
        F.col("text"),
    )
    dirs = [tempfile.mkdtemp(prefix=f"gate_fed{i}_idx_") for i in (0, 1)]
    try:
        idxs = []
        for i, out in enumerate(dirs):
            build_packed_index(
                spark,
                transcripts.filter(F.col("half") == i).drop("half"),
                out, range_bits=8, with_positions=False, stem=False,
            )
            idxs.append(PackedIndex(spark, out))
        rows = federated_topk(
            spark,
            [("even", idxs[0], 1.0), ("odd", idxs[1], 2.0)],
            " ".join(DOCS_QUERY_TERMS),
            k=120,
        ).collect()
    finally:
        for out in dirs:
            shutil.rmtree(out, ignore_errors=True)
    resolved = [
        (r["index_name"], int(r["conv_id"][3:]), round(r["score"], 6))
        for r in rows
    ]
    resolved.sort(key=lambda x: (-x[2], x[0], x[1]))
    return spark.createDataFrame(
        resolved[:20], "index_name string, doc_id long, score_r6 double"
    )


_SQL_FEDERATED = f"""
WITH t AS (
  SELECT doc_id, doc_id % 2 AS half, {_SQL_TOKS} AS toks FROM documents
),
stats AS (
  SELECT half, count(*)::DOUBLE AS n, avg(len(toks)) AS avgdl
  FROM t GROUP BY half
),
posts AS (
  SELECT half, term, doc_id, count(*) AS tf, any_value(dl) AS dl FROM (
    SELECT doc_id, half, len(toks) AS dl, unnest(toks) AS term FROM t
  ) WHERE term IN ('spark','stream','window','join')
  GROUP BY half, term, doc_id
),
dfs AS (SELECT half, term, count(*) AS df FROM posts GROUP BY half, term),
scored AS (
  SELECT p.half, p.doc_id,
         ln((s.n - d.df + 0.5) / (d.df + 0.5) + 1.0)
         * (p.tf * 2.2 / (p.tf + 1.2 * (0.25 + 0.75 * p.dl / s.avgdl)))
         AS contrib
  FROM posts p
  JOIN dfs d ON d.half = p.half AND d.term = p.term
  JOIN stats s ON s.half = p.half
),
ranked AS (
  SELECT CASE WHEN half = 0 THEN 'even' ELSE 'odd' END AS index_name,
         doc_id,
         round(sum(contrib) * (CASE WHEN half = 0 THEN 1.0 ELSE 2.0 END),
               6) AS score_r6
  FROM scored GROUP BY half, doc_id
)
SELECT index_name, doc_id, score_r6
FROM ranked ORDER BY score_r6 DESC, index_name ASC, doc_id ASC LIMIT 20
"""


def q_knn_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The product-quantization pipeline (operators/similarity.pq_fit
    → pq_encode → ADC shortlist → exact rerank) under the DuckDB gate:
    with n_candidates = |table| the ADC shortlist is everything and
    the rerank must return EXACTLY the brute-force answer — the IVF
    n_probe=all convention.  Gates the subspace fit, the broadcast
    pandas encoder, the LUT distance, and the rerank join end-to-end;
    the recall-vs-shortlist tradeoff is pytest-covered (approximate
    by design, not SQL-expressible)."""
    from ics_search_engine_spark.operators.similarity import (
        pq_encode,
        pq_fit,
        pq_topk_rerank,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    books = pq_fit(emb, m=4, k_cents=8, iters=3, seed=42)
    coded = pq_encode(emb.filter(F.col("vec_id") != 0), books)
    n = coded.count()
    top = pq_topk_rerank(
        coded, books, [float(x) for x in qvec], k=20, n_candidates=n
    )
    return (
        top.select("vec_id", F.round("cosine", 6).alias("cosine_r6"))
        .orderBy(F.desc("cosine_r6"), F.asc("vec_id"))
        .limit(20)
    )


def q_rank_feature_engine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES rank_feature clause (operators/funcscore.
    bm25_topk_rank_feature): bm25 + 2·saturation(feature, pivot=10)
    where the feature is a deterministic per-doc static signal
    (doc_id % 97) present only for doc_id % 3 != 0 — docs without the
    feature score bm25 + 0, never excluded.  Rounded-order top-20, the
    engine gates' boundary convention."""
    import shutil
    import tempfile

    from ics_search_engine_spark.operators.funcscore import (
        bm25_topk_rank_feature,
    )
    from ics_search_engine_spark.operators.packed_index import (
        PackedIndex,
        build_packed_index,
    )

    docs = _docs(spark, sf_dir)
    transcripts = docs.select(
        F.format_string("doc%08d", F.col("doc_id")).alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.col("text"),
    )
    features = docs.filter(F.col("doc_id") % 3 != 0).select(
        F.format_string("doc%08d", F.col("doc_id")).alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        (F.col("doc_id") % 97).cast("double").alias("pagerank"),
    )
    out = tempfile.mkdtemp(prefix="gate_rankfeat_idx_")
    try:
        build_packed_index(
            spark, transcripts, out, range_bits=8, with_positions=False,
            stem=False,
        )
        pidx = PackedIndex(spark, out)
        rows = bm25_topk_rank_feature(
            spark, pidx, " ".join(DOCS_QUERY_TERMS), features,
            "pagerank", boost=2.0, fn="saturation", pivot=10.0, k=60,
        ).collect()
    finally:
        shutil.rmtree(out, ignore_errors=True)
    resolved = [
        (int(c[3:]), round(float(s), 6)) for c, _, s in rows
    ]
    resolved.sort(key=lambda r: (-r[1], r[0]))
    return spark.createDataFrame(
        resolved[:20], "doc_id long, score_r6 double"
    )


_SQL_RANK_FEATURE = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
stats AS (SELECT count(*)::DOUBLE AS n, avg(len(toks)) AS avgdl FROM t),
posts AS (
  SELECT term, doc_id, count(*) AS tf, any_value(dl) AS dl FROM (
    SELECT doc_id, len(toks) AS dl, unnest(toks) AS term FROM t
  ) WHERE term IN ('spark','stream','window','join')
  GROUP BY term, doc_id
),
dfs AS (SELECT term, count(*) AS df FROM posts GROUP BY term),
bm25 AS (
  SELECT p.doc_id,
         sum(ln((s.n - d.df + 0.5) / (d.df + 0.5) + 1.0)
             * (p.tf * 2.2
                / (p.tf + 1.2 * (0.25 + 0.75 * p.dl / s.avgdl))))
           AS score
  FROM posts p JOIN dfs d USING (term) CROSS JOIN stats s
  GROUP BY p.doc_id
),
feat AS (
  SELECT doc_id, (doc_id % 97)::DOUBLE AS f FROM documents
  WHERE doc_id % 3 != 0
)
SELECT b.doc_id,
       round(b.score + 2.0 * coalesce(f.f / (f.f + 10.0), 0.0), 6)
         AS score_r6
FROM bm25 b LEFT JOIN feat f USING (doc_id)
ORDER BY score_r6 DESC, doc_id ASC LIMIT 20
"""


def q_combined_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES combined_fields / BM25F (operators/fields.
    combined_fields_topk): fields merge into one pseudo-field BEFORE
    saturation (weighted tf and dl sums, pseudo-df = max over fields —
    the Lucene CombinedFieldQuery contract) — distinct from both
    multi_match modes, which saturate per field.  Rounded-order
    top-20, the fielded gates' convention."""
    import shutil
    import tempfile

    from ics_search_engine_spark.operators.fields import (
        FieldedIndex,
        build_fielded_index,
        combined_fields_topk,
    )

    transcripts = _fielded_transcripts(spark, sf_dir)
    out = tempfile.mkdtemp(prefix="gate_combined_idx_")
    try:
        build_fielded_index(
            spark, transcripts, out, ["text", "title"], range_bits=8,
            stem=False,
        )
        fidx = FieldedIndex(spark, out)
        rows = combined_fields_topk(
            spark, fidx, " ".join(DOCS_QUERY_TERMS),
            {"text": 1.0, "title": 2.0}, k=60,
        ).collect()
    finally:
        shutil.rmtree(out, ignore_errors=True)
    resolved = [(int(c[3:]), round(float(s), 6)) for c, _, s in rows]
    resolved.sort(key=lambda r: (-r[1], r[0]))
    return spark.createDataFrame(
        resolved[:20], "doc_id long, score_r6 double"
    )


_SQL_COMBINED_FIELDS = _SQL_FIELDED_BASE + """
, dfm AS (
  SELECT term, max(df) AS df FROM (
    SELECT * FROM dfs_text UNION ALL SELECT * FROM dfs_title
  ) GROUP BY term
),
tfc AS (
  SELECT term, doc_id, sum(wtf) AS tfc FROM (
    SELECT term, doc_id, 1.0 * tf AS wtf FROM posts_text
    UNION ALL
    SELECT term, doc_id, 2.0 * tf AS wtf FROM posts_title
  ) GROUP BY term, doc_id
),
dls AS (
  SELECT doc_id, 1.0 * len(toks) + 2.0 * len(ttoks) AS dlc FROM t
),
scored AS (
  SELECT c.doc_id,
         sum(ln((s.n - d.df + 0.5) / (d.df + 0.5) + 1.0)
             * (c.tfc * 2.2
                / (c.tfc + 1.2 * (0.25 + 0.75 * l.dlc
                   / (1.0 * s.avgdl_text + 2.0 * s.avgdl_title)))))
           AS score
  FROM tfc c
  JOIN dfm d USING (term)
  JOIN dls l USING (doc_id)
  CROSS JOIN stats s
  GROUP BY c.doc_id
)
SELECT doc_id, round(score, 6) AS score_r6
FROM scored ORDER BY score_r6 DESC, doc_id ASC LIMIT 20
"""


def q_distance_feature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES distance_feature (operators/funcscore.
    bm25_topk_distance_feature): bm25 + 1.5·pivot/(pivot + |ts −
    origin|) over the decay gate's synthetic ts (epoch 2026-01-01 +
    doc_id%97 days), origin at the corpus max date, pivot 14 days —
    the additive reciprocal-distance recency clause, re-ranked before
    the cut.  Docs keep their bm25 when ts is missing (not exercised
    here — every doc has a ts; the null path is pytest-covered)."""
    import shutil
    import tempfile

    from ics_search_engine_spark.operators.funcscore import (
        bm25_topk_distance_feature,
    )
    from ics_search_engine_spark.operators.packed_index import (
        PackedIndex,
        build_packed_index,
    )

    docs = _docs(spark, sf_dir)
    transcripts = docs.select(
        F.format_string("doc%08d", F.col("doc_id")).alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.col("text"),
        F.date_add(
            F.to_date(F.lit("2026-01-01")),
            (F.col("doc_id") % 97).cast("int"),
        ).cast("timestamp").alias("ts"),
    )
    out = tempfile.mkdtemp(prefix="gate_distfeat_idx_")
    try:
        build_packed_index(
            spark, transcripts.drop("ts"), out, range_bits=8,
            with_positions=False, stem=False,
        )
        pidx = PackedIndex(spark, out)
        rows = bm25_topk_distance_feature(
            spark, pidx, " ".join(DOCS_QUERY_TERMS),
            transcripts.select("conv_id", "turn_idx", "ts"), "ts",
            origin="2026-04-07", pivot_days=14.0, boost=1.5, k=60,
        ).collect()
    finally:
        shutil.rmtree(out, ignore_errors=True)
    resolved = [(int(c[3:]), round(float(s), 6)) for c, _, s in rows]
    resolved.sort(key=lambda r: (-r[1], r[0]))
    return spark.createDataFrame(
        resolved[:20], "doc_id long, score_r6 double"
    )


_SQL_DISTANCE_FEATURE = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
{_SQL_BM25_CTES}
bm25 AS (SELECT doc_id, sum(contrib) AS s FROM scored GROUP BY doc_id),
boosted AS (
  SELECT doc_id,
         s + 1.5 * ((14.0 * 86400.0)
             / (14.0 * 86400.0
                + abs((doc_id % 97) - 96)::DOUBLE * 86400.0)) AS score
  FROM bm25
)
SELECT doc_id, round(score, 6) AS score_r6
FROM boosted ORDER BY score_r6 DESC, doc_id ASC LIMIT 20
"""


def q_match_bool_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES match_bool_prefix (operators/boolquery.
    match_bool_prefix_topk): 'spark stream wind' → scored Term
    shoulds for spark/stream plus a constant-score wind* Prefix
    should, msm 1 — the unordered autocomplete query.  Rounded-order
    top-20, the engine gates' convention."""
    import shutil
    import tempfile

    from ics_search_engine_spark.operators.boolquery import (
        match_bool_prefix_topk,
    )
    from ics_search_engine_spark.operators.packed_index import (
        PackedIndex,
        build_packed_index,
    )

    docs = _docs(spark, sf_dir)
    transcripts = docs.select(
        F.format_string("doc%08d", F.col("doc_id")).alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.col("text"),
    )
    out = tempfile.mkdtemp(prefix="gate_mbp_idx_")
    try:
        build_packed_index(
            spark, transcripts, out, range_bits=8, with_positions=False,
            stem=False,
        )
        pidx = PackedIndex(spark, out)
        rows = match_bool_prefix_topk(
            spark, pidx, "spark stream wind", k=60, max_expansions=256,
        ).collect()
    finally:
        shutil.rmtree(out, ignore_errors=True)
    resolved = [(int(c[3:]), round(float(s), 6)) for c, _, s in rows]
    resolved.sort(key=lambda r: (-r[1], r[0]))
    return spark.createDataFrame(
        resolved[:20], "doc_id long, score_r6 double"
    )


_SQL_MATCH_BOOL_PREFIX = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
base AS (SELECT doc_id, toks, len(toks) AS dl FROM t),
stats AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM base),
tfv AS (
  SELECT doc_id, dl,
    len(list_filter(toks, x -> x = 'spark'))  AS tf_spark,
    len(list_filter(toks, x -> x = 'stream')) AS tf_stream,
    len(list_filter(toks, x -> x LIKE 'wind%')) AS tf_wind
  FROM base
),
dfs AS (
  SELECT
    count(*) FILTER (WHERE tf_spark > 0)  AS df_spark,
    count(*) FILTER (WHERE tf_stream > 0) AS df_stream
  FROM tfv
),
scored AS (
  SELECT v.doc_id,
    CASE WHEN v.tf_spark > 0 THEN
      {_SQL_BOOL_IDF.format(t='spark')} * {_SQL_BOOL_TFN.format(tf='v.tf_spark')}
    ELSE 0.0 END
    + CASE WHEN v.tf_stream > 0 THEN
      {_SQL_BOOL_IDF.format(t='stream')} * {_SQL_BOOL_TFN.format(tf='v.tf_stream')}
    ELSE 0.0 END
    + CASE WHEN v.tf_wind > 0 THEN 1.0 ELSE 0.0 END
    AS score
  FROM tfv v CROSS JOIN stats s CROSS JOIN dfs d
  WHERE ((v.tf_spark > 0)::INT + (v.tf_stream > 0)::INT
         + (v.tf_wind > 0)::INT) >= 1
)
SELECT doc_id, round(score, 6) AS score_r6
FROM scored ORDER BY score_r6 DESC, doc_id ASC LIMIT 20
"""


def q_knn_ivfadc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVFADC (operators/similarity.ivfadc_topk): coarse cells + PQ
    codes + exact rerank composed end-to-end; with n_probe = n_cells
    and shortlist = |table| it must return EXACTLY the brute-force
    answer — the family's probe-all convention, same oracle."""
    from ics_search_engine_spark.operators.similarity import (
        ivf_centroids,
        ivfadc_topk,
        pq_encode,
        pq_fit,
        with_ivf_cells,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    cents = ivf_centroids(emb, n_cells=8, iters=3, seed=42)
    books = pq_fit(emb, m=4, k_cents=8, iters=3, seed=42)
    coded = pq_encode(
        with_ivf_cells(emb.filter(F.col("vec_id") != 0), cents), books
    )
    n = coded.count()
    top = ivfadc_topk(
        coded, cents, books, [float(x) for x in qvec], k=20,
        n_probe=len(cents), n_candidates=n,
    )
    return (
        top.select("vec_id", F.round("cosine", 6).alias("cosine_r6"))
        .orderBy(F.desc("cosine_r6"), F.asc("vec_id"))
        .limit(20)
    )


def q_mlt_unlike(spark: SparkSession, sf_dir: str) -> DataFrame:
    """more_like_this with negative examples (operators/mlt, ES
    ``unlike``): doc 13's term counts subtract from doc 7's before
    characteristic-term selection, so shared vocabulary loses its
    pull; the unlike doc stays rankable.  Same scoring tail as the
    base MLT gate."""
    import shutil
    import tempfile

    from ics_search_engine_spark.operators.mlt import more_like_this
    from ics_search_engine_spark.operators.packed_index import (
        PackedIndex,
        build_packed_index,
    )

    docs = _docs(spark, sf_dir)
    transcripts = docs.select(
        F.format_string("doc%08d", F.col("doc_id")).alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.col("text"),
    )
    out = tempfile.mkdtemp(prefix="gate_mltun_idx_")
    try:
        build_packed_index(
            spark, transcripts, out, range_bits=8, with_positions=False,
            stem=False,
        )
        pidx = PackedIndex(spark, out)
        rows = more_like_this(
            spark, pidx, transcripts, "doc00000007", 0, k=20,
            max_query_terms=10, unlike=[("doc00000013", 0)],
        ).collect()
    finally:
        shutil.rmtree(out, ignore_errors=True)
    return spark.createDataFrame(
        [(int(c[3:]), round(float(s), 6)) for c, _, s in rows],
        "doc_id long, mlt_r6 double",
    )


_SQL_MLT_UNLIKE = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
stats AS (SELECT count(*)::DOUBLE AS n, avg(len(toks)) AS avgdl FROM t),
liketf AS (
  SELECT term, count(*) AS tf FROM (
    SELECT unnest(toks) AS term FROM t WHERE doc_id = 7
  ) WHERE term NOT IN ({_SQL_STOP_LIST}) GROUP BY term
),
untf AS (
  SELECT term, count(*) AS tf FROM (
    SELECT unnest(toks) AS term FROM t WHERE doc_id = 13
  ) GROUP BY term
),
srctf AS (
  SELECT l.term, l.tf - coalesce(u.tf, 0) AS tf
  FROM liketf l LEFT JOIN untf u USING (term)
  WHERE l.tf - coalesce(u.tf, 0) > 0
),
dfs AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM (
    SELECT doc_id, unnest(toks) AS term FROM t
  ) GROUP BY term
),
sel AS (
  SELECT q.term,
         ln((s.n - d.df + 0.5) / (d.df + 0.5) + 1.0) AS w
  FROM srctf q JOIN dfs d USING (term) CROSS JOIN stats s
  ORDER BY round(q.tf * ln((s.n - d.df + 0.5) / (d.df + 0.5) + 1.0), 6)
             DESC,
           q.term ASC
  LIMIT 10
),
posts AS (
  SELECT term, doc_id, count(*) AS tf, any_value(dl) AS dl FROM (
    SELECT doc_id, len(toks) AS dl, unnest(toks) AS term FROM t
  ) WHERE term IN (SELECT term FROM sel) AND doc_id <> 7
  GROUP BY term, doc_id
),
scored AS (
  SELECT p.doc_id,
         sel.w * (p.tf * 2.2 / (p.tf + 1.2 * (0.25 + 0.75 * p.dl / s.avgdl)))
           AS contrib
  FROM posts p JOIN sel USING (term) CROSS JOIN stats s
)
SELECT doc_id, round(sum(contrib), 6) AS mlt_r6
FROM scored GROUP BY doc_id
ORDER BY mlt_r6 DESC, doc_id ASC LIMIT 20
"""


def q_vector_index_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The persisted vector-index artifact end-to-end (operators/
    vector_index.build_vector_index → serving.LocalVectorServer):
    IVF-partitioned, PQ-coded artifact built with Spark, then EXACT
    in-process search (pyarrow + numpy, no Spark at query time) must
    reproduce the brute-force oracle — the serving-tier convention."""
    import shutil
    import tempfile

    from ics_search_engine_spark.operators.vector_index import (
        build_vector_index,
    )
    from ics_search_engine_spark.serving import LocalVectorServer

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    out = tempfile.mkdtemp(prefix="gate_vecidx_")
    try:
        build_vector_index(
            spark, emb.filter(F.col("vec_id") != 0), out,
            n_cells=8, m=4, k_cents=8, iters=3, seed=42,
        )
        srv = LocalVectorServer(out)
        hits = srv.search([float(x) for x in qvec], k=20, exact=True)
    finally:
        shutil.rmtree(out, ignore_errors=True)
    return spark.createDataFrame(
        [(int(i), round(c, 6)) for i, c in hits],
        "vec_id long, cosine_r6 double",
    )


def q_bm25_custom_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES similarity settings (operators/query.bm25_topk_params):
    BM25 with tuned k1=0.9 / b=0.4 (the classic short-field tuning)
    instead of the reference constants — scores differ from the plain
    gate by construction; the tuned constants appear verbatim in the
    oracle SQL.  Rounded-order top-20, the engine gates' convention."""
    import shutil
    import tempfile

    from ics_search_engine_spark.operators.packed_index import (
        PackedIndex,
        build_packed_index,
    )
    from ics_search_engine_spark.operators.query import bm25_topk_params

    docs = _docs(spark, sf_dir)
    transcripts = docs.select(
        F.format_string("doc%08d", F.col("doc_id")).alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.col("text"),
    )
    out = tempfile.mkdtemp(prefix="gate_customsim_idx_")
    try:
        build_packed_index(
            spark, transcripts, out, range_bits=8, with_positions=False,
            stem=False,
        )
        pidx = PackedIndex(spark, out)
        rows = bm25_topk_params(
            spark, pidx, " ".join(DOCS_QUERY_TERMS), k=60, k1=0.9, b=0.4,
        ).collect()
    finally:
        shutil.rmtree(out, ignore_errors=True)
    resolved = [(int(c[3:]), round(float(s), 6)) for c, _, s in rows]
    resolved.sort(key=lambda r: (-r[1], r[0]))
    return spark.createDataFrame(
        resolved[:20], "doc_id long, score_r6 double"
    )


_SQL_CUSTOM_SIM = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
stats AS (SELECT count(*)::DOUBLE AS n, avg(len(toks)) AS avgdl FROM t),
posts AS (
  SELECT term, doc_id, count(*) AS tf, any_value(dl) AS dl FROM (
    SELECT doc_id, len(toks) AS dl, unnest(toks) AS term FROM t
  ) WHERE term IN ('spark','stream','window','join')
  GROUP BY term, doc_id
),
dfs AS (SELECT term, count(*) AS df FROM posts GROUP BY term),
scored AS (
  SELECT p.doc_id,
         sum(ln((s.n - d.df + 0.5) / (d.df + 0.5) + 1.0)
             * (p.tf * 1.9
                / (p.tf + 0.9 * (0.6 + (0.4 * p.dl) / s.avgdl))))
           AS score
  FROM posts p JOIN dfs d USING (term) CROSS JOIN stats s
  GROUP BY p.doc_id
)
SELECT doc_id, round(score, 6) AS score_r6
FROM scored ORDER BY score_r6 DESC, doc_id ASC LIMIT 20
"""


def q_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LLM-pipeline token budgeting (operators/textstats.token_counts):
    per-doc whitespace token count (\\S+ runs) + BPE-ish pre-tokenizer
    match count (GPT-2-style pattern, RE2-compatible subset) — the
    numbers a training-data pipeline sizes corpora with."""
    from ics_search_engine_spark.operators.textstats import token_counts

    docs = _docs(spark, sf_dir).select(
        F.format_string("doc%08d", F.col("doc_id")).alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.col("text"),
    )
    return token_counts(docs).select(
        F.substring("conv_id", 4, 8).cast("long").alias("doc_id"),
        F.col("ws_tokens").cast("long").alias("ws_tokens"),
        F.col("bpe_tokens").cast("long").alias("bpe_tokens"),
    )


_SQL_TOKEN_COUNTS = r"""
SELECT doc_id,
       len(regexp_extract_all(text, '\S+')) AS ws_tokens,
       len(regexp_extract_all(
         text, '''(?:[sdmt]|ll|ve|re)| ?[a-zA-Z]+| ?[0-9]+| ?[^\sa-zA-Z0-9]+'
       )) AS bpe_tokens
FROM documents
"""


# Synthetic geo_point doc values shared by every geo gate: a 0.1°
# grid spread derived from doc_id with integer arithmetic, so Spark
# and DuckDB compute BIT-IDENTICAL doubles (int mod → /10.0 → shift).
_GEO_ORIGIN = (37.77, -122.42)


def _geo_attrs(docs: DataFrame) -> DataFrame:
    return docs.select(
        F.format_string("doc%08d", F.col("doc_id")).alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        ((F.col("doc_id") * 7 % 1600).cast("double") / 10.0 - 80.0)
        .alias("lat"),
        ((F.col("doc_id") * 13 % 3600).cast("double") / 10.0 - 180.0)
        .alias("lon"),
    )


# The same point derivation + haversine in DuckDB form.  The column
# math mirrors operators/geo.haversine_km op-for-op (radians(Δ)/2,
# sin·sin + cosφ₁·cosφ₂·sin·sin, 12742·asin(√a)) so the two engines
# agree to the last ulp before the r6 rounding.
_SQL_GEO_PTS = """pts AS (
  SELECT doc_id,
         ((doc_id * 7 % 1600)::DOUBLE / 10.0 - 80.0) AS lat,
         ((doc_id * 13 % 3600)::DOUBLE / 10.0 - 180.0) AS lon
  FROM documents
),
dist AS (
  SELECT doc_id,
         12742.0 * asin(sqrt(
           sin(radians(37.77 - lat) / 2.0)
             * sin(radians(37.77 - lat) / 2.0)
           + cos(radians(lat)) * cos(radians(37.77))
             * sin(radians(-122.42 - lon) / 2.0)
             * sin(radians(-122.42 - lon) / 2.0)
         )) AS d_km
  FROM pts
)"""


def q_geo_distance_engine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES geo_distance query in filter context (operators/geo.
    geo_distance_topk): BM25 top-k over matched docs within 7000 km of
    the origin — surviving scores are EXACTLY the unfiltered BM25
    scores (filter clauses contribute no score).  Rounded-order
    top-20, the engine gates' boundary convention."""
    import shutil
    import tempfile

    from ics_search_engine_spark.operators.geo import geo_distance_topk
    from ics_search_engine_spark.operators.packed_index import (
        PackedIndex,
        build_packed_index,
    )

    docs = _docs(spark, sf_dir)
    transcripts = docs.select(
        F.format_string("doc%08d", F.col("doc_id")).alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.col("text"),
    )
    out = tempfile.mkdtemp(prefix="gate_geodist_idx_")
    try:
        build_packed_index(
            spark, transcripts, out, range_bits=8, with_positions=False,
            stem=False,
        )
        pidx = PackedIndex(spark, out)
        rows = geo_distance_topk(
            spark, pidx, " ".join(DOCS_QUERY_TERMS), _geo_attrs(docs),
            "lat", "lon", _GEO_ORIGIN, radius_km=7000.0, k=60,
        ).collect()
    finally:
        shutil.rmtree(out, ignore_errors=True)
    resolved = [(int(c[3:]), round(float(s), 6)) for c, _, s in rows]
    resolved.sort(key=lambda r: (-r[1], r[0]))
    return spark.createDataFrame(
        resolved[:20], "doc_id long, score_r6 double"
    )


_SQL_GEO_DISTANCE = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
{_SQL_BM25_CTES}
bm25 AS (SELECT doc_id, sum(contrib) AS s FROM scored GROUP BY doc_id),
{_SQL_GEO_PTS}
SELECT b.doc_id, round(b.s, 6) AS score_r6
FROM bm25 b JOIN dist USING (doc_id)
WHERE dist.d_km <= 7000.0
ORDER BY score_r6 DESC, doc_id ASC LIMIT 20
"""


def q_geo_sort_engine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES _geo_distance sort (operators/geo.geo_sort_topk): the 20
    matched docs nearest the origin, distance ascending — the
    find-hits-near-me ordering.  Distances rounded to 6 dp; rounded
    order (dist asc, doc_id asc) is the cut convention."""
    import shutil
    import tempfile

    from ics_search_engine_spark.operators.geo import geo_sort_topk
    from ics_search_engine_spark.operators.packed_index import (
        PackedIndex,
        build_packed_index,
    )

    docs = _docs(spark, sf_dir)
    transcripts = docs.select(
        F.format_string("doc%08d", F.col("doc_id")).alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.col("text"),
    )
    out = tempfile.mkdtemp(prefix="gate_geosort_idx_")
    try:
        build_packed_index(
            spark, transcripts, out, range_bits=8, with_positions=False,
            stem=False,
        )
        pidx = PackedIndex(spark, out)
        rows = geo_sort_topk(
            spark, pidx, " ".join(DOCS_QUERY_TERMS), _geo_attrs(docs),
            "lat", "lon", _GEO_ORIGIN, k=60,
        ).collect()
    finally:
        shutil.rmtree(out, ignore_errors=True)
    resolved = [
        (int(r["conv_id"][3:]), round(float(r["distance_km"]), 6))
        for r in rows
    ]
    resolved.sort(key=lambda r: (r[1], r[0]))
    return spark.createDataFrame(
        resolved[:20], "doc_id long, dist_r6 double"
    )


_SQL_GEO_SORT = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
matched AS (
  SELECT DISTINCT doc_id FROM (
    SELECT doc_id, unnest(toks) AS term FROM t
  ) WHERE term IN ('spark','stream','window','join')
),
{_SQL_GEO_PTS}
SELECT m.doc_id, round(d.d_km, 6) AS dist_r6
FROM matched m JOIN dist d USING (doc_id)
ORDER BY dist_r6 ASC, doc_id ASC LIMIT 20
"""


def q_geotile_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES geotile_grid aggregation (operators/geo.geotile_grid):
    matched-doc count per zoom-4 web-mercator map tile — the map
    heat-grid over the hit set.  Pure column math (ln/tan/cos/floor),
    one hash-agg of |occupied tiles| rows."""
    import shutil
    import tempfile

    from ics_search_engine_spark.operators.geo import geotile_grid
    from ics_search_engine_spark.operators.packed_index import (
        PackedIndex,
        build_packed_index,
    )

    docs = _docs(spark, sf_dir)
    transcripts = docs.select(
        F.format_string("doc%08d", F.col("doc_id")).alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.col("text"),
    )
    out = tempfile.mkdtemp(prefix="gate_geotile_idx_")
    try:
        build_packed_index(
            spark, transcripts, out, range_bits=8, with_positions=False,
            stem=False,
        )
        pidx = PackedIndex(spark, out)
        return spark.createDataFrame(
            geotile_grid(
                spark, pidx, " ".join(DOCS_QUERY_TERMS),
                _geo_attrs(docs), "lat", "lon", zoom=4,
            ).collect(),
            "tile string, n_docs long",
        )
    finally:
        shutil.rmtree(out, ignore_errors=True)


_SQL_GEOTILE = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
matched AS (
  SELECT DISTINCT doc_id FROM (
    SELECT doc_id, unnest(toks) AS term FROM t
  ) WHERE term IN ('spark','stream','window','join')
),
{_SQL_GEO_PTS},
tiles AS (
  SELECT '4/'
    || greatest(0, least(floor((lon + 180.0) / 360.0 * 16)::BIGINT, 15))
    || '/'
    || greatest(0, least(floor(
         (1.0 - ln(tan(radians(lat)) + 1.0 / cos(radians(lat))) / pi())
         / 2.0 * 16)::BIGINT, 15))
    AS tile
  FROM pts JOIN matched USING (doc_id)
)
SELECT tile, count(*) AS n_docs FROM tiles
GROUP BY tile ORDER BY tile ASC
"""


def q_geo_distance_rings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES geo_distance aggregation (operators/geo.geo_distance_agg):
    matched-doc count per [from, to) km ring around the origin,
    overlapping rings double-count (range-agg semantics), empty rings
    report 0."""
    import shutil
    import tempfile

    from ics_search_engine_spark.operators.geo import geo_distance_agg
    from ics_search_engine_spark.operators.packed_index import (
        PackedIndex,
        build_packed_index,
    )

    docs = _docs(spark, sf_dir)
    transcripts = docs.select(
        F.format_string("doc%08d", F.col("doc_id")).alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.col("text"),
    )
    out = tempfile.mkdtemp(prefix="gate_georing_idx_")
    try:
        build_packed_index(
            spark, transcripts, out, range_bits=8, with_positions=False,
            stem=False,
        )
        pidx = PackedIndex(spark, out)
        return spark.createDataFrame(
            geo_distance_agg(
                spark, pidx, " ".join(DOCS_QUERY_TERMS),
                _geo_attrs(docs), "lat", "lon", _GEO_ORIGIN,
                [(None, 3000.0), (3000.0, 9000.0), (6000.0, None)],
            ).collect(),
            "range_ord int, range_key string, n_docs long",
        )
    finally:
        shutil.rmtree(out, ignore_errors=True)


_SQL_GEO_RINGS = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
matched AS (
  SELECT DISTINCT doc_id FROM (
    SELECT doc_id, unnest(toks) AS term FROM t
  ) WHERE term IN ('spark','stream','window','join')
),
{_SQL_GEO_PTS},
md AS (SELECT d_km FROM dist JOIN matched USING (doc_id)),
counts AS (
  SELECT
    coalesce(sum(CASE WHEN d_km < 3000.0 THEN 1 ELSE 0 END), 0) AS r0,
    coalesce(sum(CASE WHEN d_km >= 3000.0 AND d_km < 9000.0
                 THEN 1 ELSE 0 END), 0) AS r1,
    coalesce(sum(CASE WHEN d_km >= 6000.0 THEN 1 ELSE 0 END), 0) AS r2
  FROM md
)
SELECT 0 AS range_ord, '*-3000' AS range_key, r0 AS n_docs FROM counts
UNION ALL
SELECT 1, '3000-9000', r1 FROM counts
UNION ALL
SELECT 2, '6000-*', r2 FROM counts
ORDER BY range_ord
"""


def q_geo_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES geo_centroid aggregation (operators/geo.geo_centroid): mean
    coordinate of the matched docs' points, rounded to 6 dp (sum order
    across partitions differs from the oracle only below that)."""
    import shutil
    import tempfile

    from ics_search_engine_spark.operators.geo import geo_centroid
    from ics_search_engine_spark.operators.packed_index import (
        PackedIndex,
        build_packed_index,
    )

    docs = _docs(spark, sf_dir)
    transcripts = docs.select(
        F.format_string("doc%08d", F.col("doc_id")).alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.col("text"),
    )
    out = tempfile.mkdtemp(prefix="gate_geocent_idx_")
    try:
        build_packed_index(
            spark, transcripts, out, range_bits=8, with_positions=False,
            stem=False,
        )
        pidx = PackedIndex(spark, out)
        row = geo_centroid(
            spark, pidx, " ".join(DOCS_QUERY_TERMS), _geo_attrs(docs),
            "lat", "lon",
        ).collect()[0]
    finally:
        shutil.rmtree(out, ignore_errors=True)
    return spark.createDataFrame(
        [(round(row["lat"], 6), round(row["lon"], 6), row["n_docs"])],
        "lat_r6 double, lon_r6 double, n_docs long",
    )


_SQL_GEO_CENTROID = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
matched AS (
  SELECT DISTINCT doc_id FROM (
    SELECT doc_id, unnest(toks) AS term FROM t
  ) WHERE term IN ('spark','stream','window','join')
),
{_SQL_GEO_PTS}
SELECT round(avg(lat), 6) AS lat_r6, round(avg(lon), 6) AS lon_r6,
       count(*) AS n_docs
FROM pts JOIN matched USING (doc_id)
"""


def q_geo_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES geo_bounds aggregation (operators/geo.geo_bounds): the
    non-wrapping bounding box of the matched docs' points — min/max
    are exact doubles, no rounding needed."""
    import shutil
    import tempfile

    from ics_search_engine_spark.operators.geo import geo_bounds
    from ics_search_engine_spark.operators.packed_index import (
        PackedIndex,
        build_packed_index,
    )

    docs = _docs(spark, sf_dir)
    transcripts = docs.select(
        F.format_string("doc%08d", F.col("doc_id")).alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.col("text"),
    )
    out = tempfile.mkdtemp(prefix="gate_geobounds_idx_")
    try:
        build_packed_index(
            spark, transcripts, out, range_bits=8, with_positions=False,
            stem=False,
        )
        pidx = PackedIndex(spark, out)
        return spark.createDataFrame(
            geo_bounds(
                spark, pidx, " ".join(DOCS_QUERY_TERMS),
                _geo_attrs(docs), "lat", "lon",
            ).collect(),
            "top double, left double, bottom double, right double",
        )
    finally:
        shutil.rmtree(out, ignore_errors=True)


_SQL_GEO_BOUNDS = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
matched AS (
  SELECT DISTINCT doc_id FROM (
    SELECT doc_id, unnest(toks) AS term FROM t
  ) WHERE term IN ('spark','stream','window','join')
),
{_SQL_GEO_PTS}
SELECT max(lat) AS top, min(lon) AS "left",
       min(lat) AS bottom, max(lon) AS "right"
FROM pts JOIN matched USING (doc_id)
"""


def q_bm25_update_by_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES _update_by_query under the DuckDB gate (operators/segments.
    update_by_query): every live doc matching 'vector' is rewritten
    with appended text and re-ingested as an upsert segment whose
    supersedes.json shadows the old versions.  Same stats contract as
    the upsert gate: dead versions vanish from RESULTS exactly, live
    (v2) docs score with their new tf/dl, collection stats count both
    versions until compaction — the oracle scores the both-versions
    corpus and drops dead rows from the ranking."""
    import shutil
    import tempfile

    from ics_search_engine_spark.operators.packed_index import (
        build_packed_index,
    )
    from ics_search_engine_spark.operators.segments import (
        SegmentedIndex,
        bm25_topk_segmented,
        update_by_query,
    )

    docs = _docs(spark, sf_dir)
    transcripts = docs.select(
        F.format_string("doc%08d", F.col("doc_id")).alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.col("text"),
    )
    base = tempfile.mkdtemp(prefix="gate_engine_updq_")
    try:
        build_packed_index(
            spark, transcripts, f"{base}/seg0",
            range_bits=8, with_positions=False, stem=False,
        )
        sidx0 = SegmentedIndex(spark, [f"{base}/seg0"])
        update_by_query(
            spark, sidx0, "vector", transcripts,
            lambda df: df.withColumn(
                "text",
                F.concat(F.col("text"), F.lit(" spark stream spark")),
            ),
            f"{base}/seg1",
            range_bits=8, with_positions=False, stem=False,
        )
        sidx = SegmentedIndex(spark, [f"{base}/seg0", f"{base}/seg1"])
        top = bm25_topk_segmented(
            spark, sidx, " ".join(DOCS_QUERY_TERMS), k=60,
            resolve="pushdown",
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return (
        top.select(
            F.substring("conv_id", 4, 8).cast("long").alias("doc_id"),
            F.round(F.col("score"), 6).alias("bm25_r6"),
        )
        .orderBy(F.desc("bm25_r6"), F.asc("doc_id"))
        .limit(20)
    )


_SQL_UPDATE_BY_QUERY = """
WITH raw AS (
  SELECT doc_id, text, list_contains({toks}, 'vector') AS upd
  FROM documents
),
src AS (
  SELECT doc_id, upd AS dead, text FROM raw
  UNION ALL
  SELECT doc_id, FALSE AS dead, text || ' spark stream spark'
  FROM raw WHERE upd
),
t AS (SELECT doc_id, dead, {toks} AS toks FROM src),
stats AS (SELECT count(*)::DOUBLE AS n, avg(len(toks)) AS avgdl FROM t),
posts AS (
  SELECT term, doc_id, dead, count(*) AS tf, any_value(dl) AS dl FROM (
    SELECT doc_id, dead, len(toks) AS dl, unnest(toks) AS term FROM t
  ) WHERE term IN ('spark','stream','window','join')
  GROUP BY term, doc_id, dead
),
dfs AS (SELECT term, count(*) AS df FROM posts GROUP BY term),
scored AS (
  SELECT p.doc_id, p.dead,
         ln((s.n - d.df + 0.5) / (d.df + 0.5) + 1.0)
         * (p.tf * 2.2 / (p.tf + 1.2 * (0.25 + 0.75 * p.dl / s.avgdl)))
         AS contrib
  FROM posts p JOIN dfs d USING (term) CROSS JOIN stats s
)
SELECT doc_id, round(sum(contrib), 6) AS bm25_r6
FROM scored WHERE NOT dead
GROUP BY doc_id, dead
ORDER BY bm25_r6 DESC, doc_id ASC LIMIT 20
""".replace("{toks}", _SQL_TOKS)


def q_sampler_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES sampler agg wrapping terms (operators/aggs.sampler_terms):
    facet counts over the top-100 BEST-SCORING matched docs instead of
    the full match set — the cut runs in round_scores mode (cut on
    round(score, 6) with doc-order tie-break) so boundary membership
    is reproducible across engines; the oracle cuts identically."""
    import shutil
    import tempfile

    from ics_search_engine_spark.operators.aggs import sampler_terms
    from ics_search_engine_spark.operators.packed_index import (
        PackedIndex,
        build_packed_index,
    )

    docs = _docs(spark, sf_dir)
    transcripts = docs.select(
        F.format_string("doc%08d", F.col("doc_id")).alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.when(F.col("doc_id") % 2 == 0, "user")
        .otherwise("assistant")
        .alias("role"),
        F.col("text"),
    )
    out = tempfile.mkdtemp(prefix="gate_sampler_idx_")
    try:
        build_packed_index(
            spark, transcripts, out, range_bits=8, with_positions=False,
            stem=False,
        )
        pidx = PackedIndex(spark, out)
        rows = sampler_terms(
            spark, pidx, " ".join(DOCS_QUERY_TERMS),
            transcripts.select("conv_id", "turn_idx", "role"), "role",
            shard_size=100, round_scores=True,
        ).collect()
    finally:
        shutil.rmtree(out, ignore_errors=True)
    return spark.createDataFrame(
        [(r["role"], r["n_docs"]) for r in rows], "role string, n_docs long"
    )


_SQL_SAMPLER_TERMS = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
{_SQL_BM25_CTES}
bm25 AS (SELECT doc_id, sum(contrib) AS s FROM scored GROUP BY doc_id),
sample AS (
  SELECT doc_id FROM bm25
  ORDER BY round(s, 6) DESC, doc_id ASC LIMIT 100
)
SELECT CASE WHEN doc_id % 2 = 0 THEN 'user' ELSE 'assistant' END AS role,
       count(*) AS n_docs
FROM sample GROUP BY role ORDER BY role ASC
"""


def q_intervals_engine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES intervals query (operators/intervals.intervals_topk):
    AllOf([spark, join], ordered, max_gaps=3) under MINIMAL-interval
    semantics — an interval counts only if no other match is contained
    in it.  The oracle reproduces minimality relationally: for each
    left position a, b(a) = first 'join' after a; per distinct b keep
    the largest a (the only containment possible when b(a) is
    monotone); gaps = b − a − 1 filter after minimalization."""
    import shutil
    import tempfile

    from ics_search_engine_spark.operators.intervals import (
        AllOf,
        Term,
        intervals_topk,
    )
    from ics_search_engine_spark.operators.packed_index import (
        PackedIndex,
        build_packed_index,
    )

    docs = _docs(spark, sf_dir)
    transcripts = docs.select(
        F.format_string("doc%08d", F.col("doc_id")).alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.col("text"),
    )
    out = tempfile.mkdtemp(prefix="gate_intervals_idx_")
    try:
        build_packed_index(
            spark, transcripts, out, range_bits=8, with_positions=True,
            stem=False,
        )
        pidx = PackedIndex(spark, out)
        rows = intervals_topk(
            spark, pidx,
            AllOf([Term("spark"), Term("join")], ordered=True,
                  max_gaps=3),
            k=20,
        ).collect()
    finally:
        shutil.rmtree(out, ignore_errors=True)
    return spark.createDataFrame(
        [(int(c[3:]), int(m)) for c, _, m in rows],
        "doc_id long, match_count long",
    )


_SQL_INTERVALS = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
p AS (
  SELECT doc_id,
         list_filter(range(1, len(toks)+1), i -> toks[i] = 'spark') AS p0,
         list_filter(range(1, len(toks)+1), i -> toks[i] = 'join')  AS p1
  FROM t
),
pr AS (
  SELECT doc_id, unnest(p0) AS a, p1 FROM p
  WHERE len(p0) > 0 AND len(p1) > 0
),
cand AS (
  SELECT doc_id, a, list_min(list_filter(p1, b -> b > a)) AS b FROM pr
),
minimal AS (
  SELECT doc_id, max(a) AS a, b FROM cand
  WHERE b IS NOT NULL GROUP BY doc_id, b
),
m AS (
  SELECT doc_id, count(*)::BIGINT AS match_count FROM minimal
  WHERE b - a - 1 <= 3 GROUP BY doc_id
)
SELECT doc_id, match_count FROM m WHERE match_count > 0
ORDER BY match_count DESC, doc_id ASC LIMIT 20
"""


def q_script_score_engine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES script_score (operators/scripting.bm25_topk_script): the
    relevance score replaced by the SQL expression
    ``_score * (1.0 + weight)`` over a per-doc doc-value (doc_id % 7).
    The script compiles to a Catalyst expression over the exhaustive
    exact match-set scores, so the products must be bit-identical to
    the relational recompute; the gate over-fetches 60 and reports the
    rounded-order top 20 (the page2/top20 convention)."""
    import shutil

    from ics_search_engine_spark.operators.scripting import bm25_topk_script

    docs = _docs(spark, sf_dir)
    transcripts = docs.select(
        F.format_string("doc%08d", F.col("doc_id")).alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.col("text"),
    )
    attrs = docs.select(
        F.format_string("doc%08d", F.col("doc_id")).alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        (F.col("doc_id") % 7).cast("double").alias("weight"),
    )
    out, pidx = _agg_gate_index(spark, transcripts, "gate_script_idx_")
    try:
        top = bm25_topk_script(
            spark, pidx, " ".join(DOCS_QUERY_TERMS), attrs,
            "_score * (1.0 + weight)", k=60,
        ).collect()
    finally:
        shutil.rmtree(out, ignore_errors=True)
    out_df = spark.createDataFrame(
        top, "conv_id string, turn_idx int, score double"
    )
    return (
        out_df.select(
            F.substring("conv_id", 4, 8).cast("long").alias("doc_id"),
            F.round(F.col("score"), 6).alias("script_r6"),
        )
        .orderBy(F.desc("script_r6"), F.asc("doc_id"))
        .limit(20)
    )


_SQL_SCRIPT_SCORE = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
{_SQL_BM25_CTES}
perdoc AS (SELECT doc_id, sum(contrib) AS s FROM scored GROUP BY doc_id)
SELECT doc_id, round(s * (1.0 + (doc_id % 7)), 6) AS script_r6
FROM perdoc
ORDER BY script_r6 DESC, doc_id ASC LIMIT 20
"""


def q_bm25_reindex_engine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES _reindex (operators/lifecycle.reindex) under the gate: copy
    only the docs matching the fixed query from a source index into a
    FRESH destination index, then rank the same query against the
    destination — whose collection statistics (N, avgdl, df) are now
    those of the FILTERED sub-corpus, which is exactly what
    distinguishes this from querying the source.  The oracle recomputes
    BM25 relationally over the sub-corpus of docs containing >= 1 query
    term (live_matched's disjunctive match set on a single segment)."""
    import shutil
    import tempfile

    from ics_search_engine_spark.operators.lifecycle import reindex
    from ics_search_engine_spark.operators.packed_index import (
        PackedIndex,
        build_packed_index,
    )
    from ics_search_engine_spark.operators.segments import SegmentedIndex
    from ics_search_engine_spark.operators.wand import bm25_topk_wand

    docs = _docs(spark, sf_dir)
    transcripts = docs.select(
        F.format_string("doc%08d", F.col("doc_id")).alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.col("text"),
    )
    query = " ".join(DOCS_QUERY_TERMS)
    src = tempfile.mkdtemp(prefix="gate_reidx_src_")
    dst = tempfile.mkdtemp(prefix="gate_reidx_dst_")
    try:
        build_packed_index(
            spark, transcripts, src, range_bits=8, with_positions=False,
            stem=False,
        )
        sidx = SegmentedIndex(spark, [src])
        reindex(
            spark, transcripts, dst, query=query, sidx=sidx,
            range_bits=8, with_positions=False, stem=False,
        )
        top = bm25_topk_wand(
            spark, PackedIndex(spark, dst), query, k=60
        ).collect()
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(dst, ignore_errors=True)
    out_df = spark.createDataFrame(
        top, "conv_id string, turn_idx int, score double"
    )
    return (
        out_df.select(
            F.substring("conv_id", 4, 8).cast("long").alias("doc_id"),
            F.round(F.col("score"), 6).alias("bm25_r6"),
        )
        .orderBy(F.desc("bm25_r6"), F.asc("doc_id"))
        .limit(20)
    )


_SQL_BM25_REINDEX = f"""
WITH t0 AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
t AS (
  SELECT * FROM t0
  WHERE list_has_any(toks, ['spark', 'stream', 'window', 'join'])
),
{_SQL_BM25_CTES}
perdoc AS (SELECT doc_id, round(sum(contrib), 6) AS bm25_r6 FROM scored
           GROUP BY doc_id)
SELECT doc_id, bm25_r6 FROM perdoc
ORDER BY bm25_r6 DESC, doc_id ASC LIMIT 20
"""


def q_bm25_scroll_engine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES scroll (operators/query.scroll_pages): three chained
    page_size=10 pages over the packed index must reconstruct the
    oracle's exact-rank rows 1..30 with no skip or repeat across the
    two cursor handoffs — each page an independent bounded job, no
    scroll context."""
    import shutil

    from ics_search_engine_spark.operators.query import scroll_pages

    docs = _docs(spark, sf_dir)
    transcripts = docs.select(
        F.format_string("doc%08d", F.col("doc_id")).alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.col("text"),
    )
    out, pidx = _agg_gate_index(spark, transcripts, "gate_scroll_idx_")
    try:
        rows = [
            r
            for page in scroll_pages(
                spark, pidx, " ".join(DOCS_QUERY_TERMS), page_size=10,
                max_pages=3,
            )
            for r in page
        ]
    finally:
        shutil.rmtree(out, ignore_errors=True)
    out_df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, score double"
    )
    return (
        out_df.select(
            F.substring("conv_id", 4, 8).cast("long").alias("doc_id"),
            F.round(F.col("score"), 6).alias("bm25_r6"),
        )
        .orderBy(F.desc("bm25_r6"), F.asc("doc_id"))
    )


_SQL_BM25_SCROLL = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
{_SQL_BM25_CTES}
ranked AS (
  SELECT doc_id, sum(contrib) AS s,
         row_number() OVER (ORDER BY sum(contrib) DESC, doc_id ASC) AS rn
  FROM scored GROUP BY doc_id
)
SELECT doc_id, round(s, 6) AS bm25_r6
FROM ranked WHERE rn <= 30
ORDER BY bm25_r6 DESC, doc_id ASC
"""


def q_seg_after_engine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """search_after on the SEGMENTED path (operators/segments.
    bm25_topk_segmented(after=)): page 2 of a two-segment LSM index
    must equal the oracle's exact-rank rows 21..40 — gates the shard
    kernel's cursor ceiling (served rows dropped before the local
    top-fetch cut) and the full boundary-tie resolution.  Oracle shared
    with bm25_page2_engine: the segmented ranking is defined to be
    bit-identical to one index over the union."""
    import shutil
    import tempfile

    from ics_search_engine_spark.operators.packed_index import (
        build_packed_index,
    )
    from ics_search_engine_spark.operators.segments import (
        SegmentedIndex,
        bm25_topk_segmented,
    )

    docs = _docs(spark, sf_dir)
    query = " ".join(DOCS_QUERY_TERMS)
    base = tempfile.mkdtemp(prefix="gate_segafter_")
    try:
        for i in range(2):
            build_packed_index(
                spark,
                docs.filter(F.col("doc_id") % 2 == i).select(
                    F.format_string("doc%08d", F.col("doc_id")).alias(
                        "conv_id"
                    ),
                    F.lit(0).cast("int").alias("turn_idx"),
                    F.col("text"),
                ),
                f"{base}/seg{i}", range_bits=8, with_positions=False,
                stem=False,
            )
        sidx = SegmentedIndex(spark, [f"{base}/seg0", f"{base}/seg1"])
        page1 = bm25_topk_segmented(spark, sidx, query, k=20).collect()
        last = page1[-1]
        page2 = bm25_topk_segmented(
            spark, sidx, query, k=20,
            after=(last["score"], last["conv_id"], last["turn_idx"]),
        ).collect()
    finally:
        shutil.rmtree(base, ignore_errors=True)
    out_df = spark.createDataFrame(
        page2, "conv_id string, turn_idx int, score double"
    )
    return (
        out_df.select(
            F.substring("conv_id", 4, 8).cast("long").alias("doc_id"),
            F.round(F.col("score"), 6).alias("bm25_r6"),
        )
        .orderBy(F.desc("bm25_r6"), F.asc("doc_id"))
    )


def q_bm25_sliced_engine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES sliced scroll (operators/slices.bm25_topk_sliced): slice 1
    of 3 of the fixed query's ranking.  Slice membership is doc_ord %
    n_slices, and in the gate corpus doc_ord == doc_id (dense docIDs
    in key order), so the oracle is the shared BM25 CTE restricted to
    doc_id % 3 = 1 — gating the slicing predicate AND the docID-order
    docmap property it leans on."""
    import shutil

    from ics_search_engine_spark.operators.slices import bm25_topk_sliced

    docs = _docs(spark, sf_dir)
    transcripts = docs.select(
        F.format_string("doc%08d", F.col("doc_id")).alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.col("text"),
    )
    out, pidx = _agg_gate_index(spark, transcripts, "gate_sliced_idx_")
    try:
        rows = bm25_topk_sliced(
            spark, pidx, " ".join(DOCS_QUERY_TERMS), 1, 3, k=20
        ).collect()
    finally:
        shutil.rmtree(out, ignore_errors=True)
    out_df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, score double"
    )
    return (
        out_df.select(
            F.substring("conv_id", 4, 8).cast("long").alias("doc_id"),
            F.round(F.col("score"), 6).alias("bm25_r6"),
        )
        .orderBy(F.desc("bm25_r6"), F.asc("doc_id"))
    )


_SQL_BM25_SLICED = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
{_SQL_BM25_CTES}
ranked AS (
  SELECT doc_id, sum(contrib) AS s FROM scored
  WHERE doc_id % 3 = 1 GROUP BY doc_id
  ORDER BY s DESC, doc_id ASC LIMIT 20
)
SELECT doc_id, round(s, 6) AS bm25_r6 FROM ranked
ORDER BY bm25_r6 DESC, doc_id ASC
"""


def q_terms_enum_engine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES _terms_enum (operators/query.terms_enum): the first 15 index
    terms with prefix 's', with df — a TERM-DICTIONARY read whose
    oracle recomputes the dictionary (distinct analyzed terms) and the
    df counts relationally, gating the dictionary contents and the
    n_postings metadata the verb sums."""
    import shutil

    from ics_search_engine_spark.operators.query import terms_enum

    docs = _docs(spark, sf_dir)
    transcripts = docs.select(
        F.format_string("doc%08d", F.col("doc_id")).alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.col("text"),
    )
    out, pidx = _agg_gate_index(spark, transcripts, "gate_tenum_idx_")
    try:
        rows = terms_enum(spark, pidx, "s", size=15, with_df=True).collect()
    finally:
        shutil.rmtree(out, ignore_errors=True)
    return spark.createDataFrame(
        [(r["term"], int(r["df"])) for r in rows], "term string, df long"
    ).orderBy("term")


_SQL_TERMS_ENUM = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
posts AS (
  SELECT term, doc_id FROM (
    SELECT doc_id, unnest(toks) AS term FROM t
  ) WHERE term LIKE 's%' GROUP BY term, doc_id
)
SELECT term, count(*)::BIGINT AS df FROM posts
GROUP BY term ORDER BY term LIMIT 15
"""


def q_cumulative_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES cumulative_cardinality pipeline agg (operators/aggs.
    cumulative_cardinality), EXACT via the first-seen identity —
    distinct users ever seen per event-day, over the events table.
    The oracle recomputes first_seen = min(day) per user and the
    running count; ES's HLL-union approximation is the documented
    contrast (SURVEY round-3 deltas)."""
    from ics_search_engine_spark.operators.aggs import (
        cumulative_cardinality,
    )

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    rows = events.select(
        F.date_trunc("day", F.col("ts")).alias("day"), "user_id"
    )
    return cumulative_cardinality(rows, "day", ["user_id"]).select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.col("new_keys").cast("long").alias("new_users"),
        F.col("cum_cardinality").cast("long").alias("cum_users"),
    ).orderBy("day")


_SQL_CUM_CARDINALITY = """
WITH rows_ AS (
  SELECT date_trunc('day', ts) AS day, user_id FROM events
),
first_seen AS (
  SELECT user_id, min(day) AS day FROM rows_ GROUP BY user_id
),
per_bucket AS (
  SELECT day, count(*)::BIGINT AS new_users FROM first_seen GROUP BY day
),
buckets AS (SELECT DISTINCT day FROM rows_)
SELECT strftime(b.day, '%Y-%m-%d') AS day,
       coalesce(p.new_users, 0)::BIGINT AS new_users,
       sum(coalesce(p.new_users, 0)) OVER (
         ORDER BY b.day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       )::BIGINT AS cum_users
FROM buckets b LEFT JOIN per_bucket p USING (day)
ORDER BY day
"""


def q_bucket_script_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES bucket_script pipeline agg (operators/aggs.bucket_script):
    per doc-length-histogram bucket, the share of the running total —
    a script over TWO sibling metrics (n_docs, the cumulative_sum) in
    the engine's SQL-expression script convention; gap_policy defaults
    to skip (no NULLs here, the division guard is the nullif)."""
    import shutil

    from ics_search_engine_spark.operators.aggs import (
        bucket_script,
        cumulative_sum,
        histogram,
    )

    docs = _docs(spark, sf_dir)
    transcripts = docs.select(
        F.format_string("doc%08d", F.col("doc_id")).alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.col("text"),
    )
    attrs = transcripts.select(
        "conv_id", "turn_idx", F.length("text").alias("nchars")
    )
    out, pidx = _agg_gate_index(spark, transcripts, "gate_bscript_idx_")
    try:
        histo = histogram(
            spark, pidx, " ".join(DOCS_QUERY_TERMS), attrs, "nchars", 200
        )
        res = bucket_script(
            cumulative_sum(histo, "bucket_lo", "n_docs"),
            "n_docs / nullif(cum, 0) * 100.0",
            "pct_of_running",
        ).select(
            F.col("bucket_lo").cast("long").alias("bucket_lo"),
            F.col("n_docs").cast("long").alias("n_docs"),
            F.round("pct_of_running", 6).alias("pct_r6"),
        ).orderBy("bucket_lo").collect()
    finally:
        shutil.rmtree(out, ignore_errors=True)
    return spark.createDataFrame(
        res, "bucket_lo long, n_docs long, pct_r6 double"
    ).orderBy("bucket_lo")


_SQL_BUCKET_SCRIPT = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
{_SQL_BM25_CTES}
matched AS (SELECT DISTINCT doc_id FROM posts),
histo AS (
  SELECT (length(d.text) // 200) * 200 AS bucket_lo,
         count(*)::BIGINT AS n_docs
  FROM matched m JOIN documents d USING (doc_id)
  GROUP BY 1
),
cum AS (
  SELECT bucket_lo, n_docs,
         sum(n_docs) OVER (
           ORDER BY bucket_lo
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS cum
  FROM histo
)
SELECT bucket_lo, n_docs,
       round(n_docs / nullif(cum, 0) * 100.0, 6) AS pct_r6
FROM cum ORDER BY bucket_lo
"""


def q_intervals_filter_engine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES intervals filter rules (operators/intervals.Filtered):
    ordered spark..join minimal intervals NOT CONTAINING any 'stream'
    position.  The oracle extends the intervals_engine construction
    with a NOT EXISTS over the excluded term's positions inside each
    minimal [a, b] — filtering after minimalization, the Lucene wrap
    order the kernel pins."""
    import shutil
    import tempfile

    from ics_search_engine_spark.operators.intervals import (
        AllOf,
        Filtered,
        Term,
        intervals_topk,
    )
    from ics_search_engine_spark.operators.packed_index import (
        PackedIndex,
        build_packed_index,
    )

    docs = _docs(spark, sf_dir)
    transcripts = docs.select(
        F.format_string("doc%08d", F.col("doc_id")).alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.col("text"),
    )
    out = tempfile.mkdtemp(prefix="gate_ivfilter_idx_")
    try:
        build_packed_index(
            spark, transcripts, out, range_bits=8, with_positions=True,
            stem=False,
        )
        pidx = PackedIndex(spark, out)
        node = Filtered(
            AllOf([Term("spark"), Term("join")], ordered=True),
            "not_containing",
            Term("stream"),
        )
        rows = intervals_topk(spark, pidx, node, k=20).collect()
    finally:
        shutil.rmtree(out, ignore_errors=True)
    return spark.createDataFrame(
        [(int(c[3:]), int(m)) for c, _, m in rows],
        "doc_id long, match_count long",
    )


_SQL_INTERVALS_FILTER = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
p AS (
  SELECT doc_id,
         list_filter(range(1, len(toks)+1), i -> toks[i] = 'spark') AS p0,
         list_filter(range(1, len(toks)+1), i -> toks[i] = 'join')  AS p1,
         list_filter(range(1, len(toks)+1), i -> toks[i] = 'stream') AS px
  FROM t
),
pr AS (
  SELECT doc_id, unnest(p0) AS a, p1, px FROM p
  WHERE len(p0) > 0 AND len(p1) > 0
),
cand AS (
  SELECT doc_id, a, list_min(list_filter(p1, b -> b > a)) AS b, px FROM pr
),
minimal AS (
  SELECT doc_id, max(a) AS a, b, any_value(px) AS px FROM cand
  WHERE b IS NOT NULL GROUP BY doc_id, b
),
kept AS (
  SELECT doc_id FROM minimal
  WHERE len(list_filter(px, x -> x >= a AND x <= b)) = 0
),
m AS (
  SELECT doc_id, count(*)::BIGINT AS match_count FROM kept GROUP BY doc_id
)
SELECT doc_id, match_count FROM m
ORDER BY match_count DESC, doc_id ASC LIMIT 20
"""


def q_rollup_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES rollup job + rollup_search (operators/rollup): events rolled
    up ONCE at 1 h grain, then a DAILY histogram of value by
    event_type answered exclusively from the rollup artifact.  The
    oracle aggregates the RAW events directly — the gate pins the
    exactness guarantee that justifies pre-aggregation at 100 TB
    (decomposable state re-aggregates losslessly; avg derives from
    sum/count at search time)."""
    import shutil
    import tempfile

    from ics_search_engine_spark.operators.rollup import (
        build_rollup,
        rollup_search,
    )

    events = spark.read.parquet(f"{sf_dir}/events.parquet").withColumn(
        # integer cents so every piece of decomposable state is exact —
        # the float summation-order boundary (x.xxxxx5) cannot bite
        "cents", F.round(F.col("value") * 100, 0).cast("long")
    )
    d = tempfile.mkdtemp(prefix="gate_rollup_")
    try:
        build_rollup(events, d, "ts", 3600, ["event_type"], ["cents"])
        res = rollup_search(
            spark, d, 86400, ["event_type"],
            [("cents", f) for f in ("sum", "count", "min", "max", "avg")],
        ).select(
            F.col("bucket_start").cast("long").alias("bucket_start"),
            "event_type",
            F.col("cents_sum").cast("long").alias("cents_sum"),
            F.col("cents_count").cast("long").alias("n_events"),
            F.col("cents_min").cast("long").alias("cents_min"),
            F.col("cents_max").cast("long").alias("cents_max"),
            F.round(F.col("cents_avg") / 100.0, 6).alias("value_avg_r6"),
        ).orderBy("bucket_start", "event_type").collect()
    finally:
        shutil.rmtree(d, ignore_errors=True)
    return spark.createDataFrame(
        res,
        "bucket_start long, event_type string, cents_sum long, "
        "n_events long, cents_min long, cents_max long, "
        "value_avg_r6 double",
    ).orderBy("bucket_start", "event_type")


_SQL_ROLLUP_SEARCH = """
WITH ev AS (
  SELECT *, round(value * 100, 0)::BIGINT AS cents FROM events
)
SELECT (floor(epoch(ts) / 86400) * 86400)::BIGINT AS bucket_start,
       event_type,
       sum(cents)::BIGINT AS cents_sum,
       count(cents)::BIGINT AS n_events,
       min(cents)::BIGINT AS cents_min,
       max(cents)::BIGINT AS cents_max,
       round((sum(cents)::DOUBLE / count(cents)) / 100.0, 6)
         AS value_avg_r6
FROM ev
WHERE ts IS NOT NULL
GROUP BY 1, 2
ORDER BY bucket_start, event_type
"""


def q_transform_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES latest transform (operators/transforms.transform_latest):
    each user's most recent event — row_number over (ts desc, event_id
    asc), the explicit deterministic tie-break.  The entity-centric
    distillation a 100 TB event log feeds into feature stores."""
    from ics_search_engine_spark.operators.transforms import (
        transform_latest,
    )

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    return transform_latest(
        events, ["user_id"], "ts", "event_id"
    ).select(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("event_id").cast("long").alias("event_id"),
        F.unix_timestamp("ts").cast("long").alias("ts_epoch"),
        "event_type",
    ).orderBy("user_id")


_SQL_TRANSFORM_LATEST = """
SELECT user_id::BIGINT AS user_id, event_id::BIGINT AS event_id,
       floor(epoch(ts))::BIGINT AS ts_epoch, event_type
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY user_id ORDER BY ts DESC, event_id ASC
  ) AS rn
  FROM events
) WHERE rn = 1
ORDER BY user_id
"""


def q_transform_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES pivot transform (operators/transforms.transform_pivot +
    pivot_features): per-user decomposable state built INCREMENTALLY —
    the event log split in half, each half pivoted separately, states
    merged (merge_pivot_states), features derived at read time.  The
    oracle aggregates the raw log directly, so the gate pins the
    incremental == one-shot exactness claim end-to-end.  Metrics ride
    integer cents so every merge is order-free."""
    from ics_search_engine_spark.operators.transforms import (
        merge_pivot_states,
        pivot_features,
        transform_pivot,
    )

    events = spark.read.parquet(f"{sf_dir}/events.parquet").withColumn(
        "cents", F.round(F.col("value") * 100, 0).cast("long")
    )
    half_a = events.where(F.col("event_id") % 2 == 0)
    half_b = events.where(F.col("event_id") % 2 == 1)
    keys = ["user_id"]
    state = merge_pivot_states(
        transform_pivot(half_a, keys, ["cents"], "ts"),
        transform_pivot(half_b, keys, ["cents"], "ts"),
        keys,
    )
    return pivot_features(state, ["cents"]).select(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("n_events").cast("long").alias("n_events"),
        F.col("cents__sum").cast("long").alias("cents_sum"),
        F.col("cents__min").cast("long").alias("cents_min"),
        F.col("cents__max").cast("long").alias("cents_max"),
        F.unix_timestamp("first_ts").cast("long").alias("first_epoch"),
        F.unix_timestamp("last_ts").cast("long").alias("last_epoch"),
        F.round("cents_avg", 6).alias("cents_avg_r6"),
        F.round("cents_var", 4).alias("cents_var_r4"),
    ).orderBy("user_id")


_SQL_TRANSFORM_PIVOT = """
WITH ev AS (
  SELECT *, round(value * 100, 0)::BIGINT AS cents FROM events
)
SELECT user_id::BIGINT AS user_id,
       count(*)::BIGINT AS n_events,
       sum(cents)::BIGINT AS cents_sum,
       min(cents)::BIGINT AS cents_min,
       max(cents)::BIGINT AS cents_max,
       floor(epoch(min(ts)))::BIGINT AS first_epoch,
       floor(epoch(max(ts)))::BIGINT AS last_epoch,
       round(sum(cents)::DOUBLE / count(cents), 6) AS cents_avg_r6,
       round(
         greatest(
           sum(cents * cents)::DOUBLE / count(cents)
             - (sum(cents)::DOUBLE / count(cents))
               * (sum(cents)::DOUBLE / count(cents)),
           0.0
         ), 4
       ) AS cents_var_r4
FROM ev
GROUP BY user_id
ORDER BY user_id
"""


def q_rank_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES _rank_eval (operators/rankeval): three rated requests ranked
    by the packed engine in ONE bm25_topk_multi job, scored with
    precision/recall/MRR/DCG/NDCG @10 under graded judgments the
    oracle can recompute — rating = number of distinct request terms a
    doc contains, judged only for doc_id % 3 != 0 so the
    unlabeled-as-irrelevant path (n_unrated) is load-bearing."""
    import shutil
    import tempfile

    from ics_search_engine_spark.operators.packed_index import (
        PackedIndex,
        build_packed_index,
    )
    from ics_search_engine_spark.operators.rankeval import rank_eval

    docs = _docs(spark, sf_dir)
    transcripts = docs.select(
        F.format_string("doc%08d", F.col("doc_id")).alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.col("text"),
    )
    requests = {
        "q1": "spark stream",
        "q2": "window join",
        "q3": "stream window join",
    }
    # graded judgments: rating = |request terms present in the doc|,
    # restricted to doc_id % 3 != 0 (retrieved-but-unjudged docs must
    # exist for the unlabeled path)
    toks = docs.select(
        "doc_id", F.array_distinct(toks_col()).alias("terms")
    ).filter(F.col("doc_id") % 3 != 0)
    req_rows = [(qid, t) for qid, q in requests.items()
                for t in sorted(set(q.split()))]
    req_df = spark.createDataFrame(req_rows, "query_id string, term string")
    ratings = (
        toks.select("doc_id", F.explode("terms").alias("term"))
        .join(F.broadcast(req_df), "term")
        .groupBy("query_id", "doc_id")
        .agg(F.count("*").cast("int").alias("rating"))
        .select(
            "query_id",
            F.format_string("doc%08d", F.col("doc_id")).alias("conv_id"),
            F.lit(0).cast("int").alias("turn_idx"),
            "rating",
        )
    )
    out = tempfile.mkdtemp(prefix="gate_rankeval_idx_")
    try:
        build_packed_index(
            spark, transcripts, out, range_bits=8, with_positions=False,
            stem=False,
        )
        pidx = PackedIndex(spark, out)
        rows = rank_eval(
            spark, pidx, requests, ratings, k=10, relevant_threshold=1
        ).collect()
    finally:
        shutil.rmtree(out, ignore_errors=True)
    res = spark.createDataFrame(
        rows,
        "query_id string, precision double, recall double, mrr double, "
        "dcg double, ndcg double, err double, n_unrated int",
    )
    return res.select(
        "query_id",
        F.round("precision", 9).alias("precision_r9"),
        F.round("recall", 9).alias("recall_r9"),
        F.round("mrr", 9).alias("mrr_r9"),
        F.round("dcg", 9).alias("dcg_r9"),
        F.round("ndcg", 9).alias("ndcg_r9"),
        "n_unrated",
    ).orderBy("query_id")


_SQL_RANK_EVAL = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
reqs(qid, term) AS (VALUES
  ('q1','spark'),('q1','stream'),
  ('q2','join'),('q2','window'),
  ('q3','join'),('q3','stream'),('q3','window')),
stats AS (SELECT count(*)::DOUBLE AS n, avg(len(toks)) AS avgdl FROM t),
posts AS (
  SELECT term, doc_id, count(*) AS tf, any_value(dl) AS dl FROM (
    SELECT doc_id, len(toks) AS dl, unnest(toks) AS term FROM t
  ) WHERE term IN (SELECT DISTINCT term FROM reqs)
  GROUP BY term, doc_id
),
dfs AS (SELECT term, count(*) AS df FROM posts GROUP BY term),
scored AS (
  SELECT r.qid, p.doc_id,
         ln((s.n - d.df + 0.5) / (d.df + 0.5) + 1.0)
         * (p.tf * 2.2 / (p.tf + 1.2 * (0.25 + 0.75 * p.dl / s.avgdl)))
         AS contrib
  FROM posts p JOIN dfs d USING (term) JOIN reqs r USING (term)
  CROSS JOIN stats s
),
ranked AS (
  SELECT qid, doc_id,
         row_number() OVER (
           PARTITION BY qid ORDER BY sum(contrib) DESC, doc_id ASC
         ) AS rn
  FROM scored GROUP BY qid, doc_id
),
topk AS (SELECT * FROM ranked WHERE rn <= 10),
presence AS (
  SELECT DISTINCT doc_id, term FROM (
    SELECT doc_id, unnest(list_distinct(toks)) AS term FROM t
  ) WHERE term IN (SELECT DISTINCT term FROM reqs)
),
ratings AS (
  SELECT r.qid, p.doc_id, count(*)::INT AS rating
  FROM reqs r JOIN presence p USING (term)
  WHERE p.doc_id % 3 <> 0
  GROUP BY r.qid, p.doc_id
),
hit AS (
  SELECT k.qid, k.rn, coalesce(g.rating, 0) AS rating,
         g.rating IS NULL AS unrated
  FROM topk k LEFT JOIN ratings g
    ON k.qid = g.qid AND k.doc_id = g.doc_id
),
per AS (
  SELECT qid,
         count(*) AS retrieved,
         count(*) FILTER (WHERE rating >= 1) AS rel_ret,
         min(rn) FILTER (WHERE rating >= 1) AS first_rel,
         sum((pow(2, rating) - 1) / log2(rn + 1)) AS dcg,
         count(*) FILTER (WHERE unrated) AS n_unrated
  FROM hit GROUP BY qid
),
tot AS (
  SELECT qid, count(*) FILTER (WHERE rating >= 1) AS n_rel
  FROM ratings GROUP BY qid
),
ideal AS (
  SELECT qid, sum((pow(2, rating) - 1) / log2(irn + 1)) AS idcg FROM (
    SELECT qid, rating, row_number() OVER (
      PARTITION BY qid ORDER BY rating DESC
    ) AS irn
    FROM ratings
  ) WHERE irn <= 10 GROUP BY qid
)
SELECT p.qid AS query_id,
       round(p.rel_ret::DOUBLE / p.retrieved, 9) AS precision_r9,
       round(p.rel_ret::DOUBLE / t2.n_rel, 9) AS recall_r9,
       round(coalesce(1.0 / p.first_rel, 0.0), 9) AS mrr_r9,
       round(p.dcg, 9) AS dcg_r9,
       round(p.dcg / i.idcg, 9) AS ndcg_r9,
       p.n_unrated::INT AS n_unrated
FROM per p JOIN tot t2 USING (qid) JOIN ideal i ON i.qid = p.qid
ORDER BY query_id
"""


def q_msearch_engine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES _msearch (operators/query.bm25_topk_multi, resolve=
    'pushdown'): three requests ranked in ONE Spark job — union-term
    IN pushdown, one applyInPandas scoring every request per shard,
    distributed row_number merge — with winner docIDs resolved via the
    doc_ord IN (...) point lookup (the 10^12-row-docmap mode).  The r2
    verdict asked for exactly this path under the DuckDB gate; the
    oracle re-ranks each request relationally."""
    import shutil
    import tempfile

    from ics_search_engine_spark.operators.packed_index import (
        PackedIndex,
        build_packed_index,
    )
    from ics_search_engine_spark.operators.query import bm25_topk_multi

    docs = _docs(spark, sf_dir)
    transcripts = docs.select(
        F.format_string("doc%08d", F.col("doc_id")).alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.col("text"),
    )
    requests = {
        "q1": "spark stream",
        "q2": "window join",
        "q3": "stream window join",
    }
    out = tempfile.mkdtemp(prefix="gate_msearch_idx_")
    try:
        build_packed_index(
            spark, transcripts, out, range_bits=8, with_positions=False,
            stem=False,
        )
        pidx = PackedIndex(spark, out)
        rows = bm25_topk_multi(
            spark, pidx, requests, k=15, resolve="pushdown"
        ).collect()
    finally:
        shutil.rmtree(out, ignore_errors=True)
    res = spark.createDataFrame(
        rows,
        "query_id string, conv_id string, turn_idx int, score double, "
        "rank int",
    )
    return res.select(
        "query_id",
        F.substring("conv_id", 4, 8).cast("long").alias("doc_id"),
        "rank",
        F.round(F.col("score"), 6).alias("bm25_r6"),
    ).orderBy("query_id", "rank")


_SQL_MSEARCH = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
reqs(qid, term) AS (VALUES
  ('q1','spark'),('q1','stream'),
  ('q2','join'),('q2','window'),
  ('q3','join'),('q3','stream'),('q3','window')),
stats AS (SELECT count(*)::DOUBLE AS n, avg(len(toks)) AS avgdl FROM t),
posts AS (
  SELECT term, doc_id, count(*) AS tf, any_value(dl) AS dl FROM (
    SELECT doc_id, len(toks) AS dl, unnest(toks) AS term FROM t
  ) WHERE term IN (SELECT DISTINCT term FROM reqs)
  GROUP BY term, doc_id
),
dfs AS (SELECT term, count(*) AS df FROM posts GROUP BY term),
scored AS (
  SELECT r.qid, p.doc_id,
         ln((s.n - d.df + 0.5) / (d.df + 0.5) + 1.0)
         * (p.tf * 2.2 / (p.tf + 1.2 * (0.25 + 0.75 * p.dl / s.avgdl)))
         AS contrib
  FROM posts p JOIN dfs d USING (term) JOIN reqs r USING (term)
  CROSS JOIN stats s
),
ranked AS (
  SELECT qid AS query_id, doc_id, sum(contrib) AS s,
         row_number() OVER (
           PARTITION BY qid ORDER BY sum(contrib) DESC, doc_id ASC
         ) AS rank
  FROM scored GROUP BY qid, doc_id
)
SELECT query_id, doc_id, rank::INT AS rank, round(s, 6) AS bm25_r6
FROM ranked WHERE rank <= 15
ORDER BY query_id, rank
"""


def _gate_index(spark, docs, tmp_prefix):
    """Build the gates' standard stem-free packed index over the
    documents table → (tempdir, PackedIndex)."""
    import tempfile

    from ics_search_engine_spark.operators.packed_index import (
        PackedIndex,
        build_packed_index,
    )

    transcripts = docs.select(
        F.format_string("doc%08d", F.col("doc_id")).alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.col("text"),
    )
    out = tempfile.mkdtemp(prefix=tmp_prefix)
    build_packed_index(
        spark, transcripts, out, range_bits=8, with_positions=False,
        stem=False,
    )
    return out, PackedIndex(spark, out)


def q_count_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES _count (operators/facets.count_matches): match-set size with
    no ranking — disjunctive, conjunctive, and minimum_should_match=2
    forms in one gate (3 rows)."""
    import shutil

    from ics_search_engine_spark.operators.facets import count_matches

    docs = _docs(spark, sf_dir)
    out, pidx = _gate_index(spark, docs, "gate_count_idx_")
    q = " ".join(DOCS_QUERY_TERMS)
    try:
        rows = []
        for mode, kw in (
            ("any", {}),
            ("all", {"conjunctive": True}),
            ("msm2", {"min_match": 2}),
        ):
            n = count_matches(spark, pidx, q, **kw).collect()[0][
                "n_matches"
            ]
            rows.append((mode, int(n)))
    finally:
        shutil.rmtree(out, ignore_errors=True)
    return spark.createDataFrame(rows, "mode string, n_matches long").orderBy(
        "mode"
    )


_SQL_COUNT_MATCHES = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
m AS (
  SELECT doc_id, count(DISTINCT term) AS nt FROM (
    SELECT doc_id, unnest(toks) AS term FROM t
  ) WHERE term IN ('spark','stream','window','join')
  GROUP BY doc_id
)
SELECT 'all' AS mode, count(*)::BIGINT AS n_matches FROM m WHERE nt = 4
UNION ALL
SELECT 'any', count(*)::BIGINT FROM m
UNION ALL
SELECT 'msm2', count(*)::BIGINT FROM m WHERE nt >= 2
ORDER BY mode
"""


def q_sort_by_field(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES field sort (operators/querydsl.sort_by_field_topk): the
    query in pure filter context, top-20 by a synthesized ts date
    DESC with missing-last semantics (doc_id % 11 == 0 has no ts) and
    the doc-key tie-break; no scores computed."""
    import shutil

    from ics_search_engine_spark.operators.querydsl import (
        sort_by_field_topk,
    )

    docs = _docs(spark, sf_dir)
    out, pidx = _gate_index(spark, docs, "gate_sortf_idx_")
    attrs = docs.select(
        F.format_string("doc%08d", F.col("doc_id")).alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.when(
            F.col("doc_id") % 11 != 0,
            F.date_add(
                F.to_date(F.lit("2026-01-01")),
                (F.col("doc_id") % 97).cast("int"),
            ),
        ).alias("d"),
    )
    try:
        rows = sort_by_field_topk(
            spark, pidx, " ".join(DOCS_QUERY_TERMS), attrs, "d",
            ascending=False, k=20,
        ).collect()
    finally:
        shutil.rmtree(out, ignore_errors=True)
    return spark.createDataFrame(
        [
            (
                int(r["conv_id"][3:]),
                r["d"].strftime("%Y-%m-%d") if r["d"] else None,
            )
            for r in rows
        ],
        "doc_id long, d string",
    )


_SQL_SORT_BY_FIELD = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
m AS (
  SELECT DISTINCT doc_id FROM (
    SELECT doc_id, unnest(toks) AS term FROM t
  ) WHERE term IN ('spark','stream','window','join')
),
v AS (
  SELECT doc_id,
         CASE WHEN doc_id % 11 <> 0
              THEN strftime(DATE '2026-01-01' + (doc_id % 97)::INT,
                            '%Y-%m-%d')
         END AS d
  FROM m
)
SELECT doc_id, d FROM v
ORDER BY d DESC NULLS LAST, doc_id ASC LIMIT 20
"""


def q_missing_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES missing aggregation (operators/aggs.missing_agg): matched
    docs lacking the ts doc value — NULL (doc_id % 11 == 0) or absent
    from the attrs frame entirely (doc_id % 13 == 0 rows withheld)."""
    import shutil

    from ics_search_engine_spark.operators.aggs import missing_agg

    docs = _docs(spark, sf_dir)
    out, pidx = _gate_index(spark, docs, "gate_missing_idx_")
    attrs = docs.filter(F.col("doc_id") % 13 != 0).select(
        F.format_string("doc%08d", F.col("doc_id")).alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.when(
            F.col("doc_id") % 11 != 0,
            F.date_add(
                F.to_date(F.lit("2026-01-01")),
                (F.col("doc_id") % 97).cast("int"),
            ),
        ).alias("d"),
    )
    try:
        n = missing_agg(
            spark, pidx, " ".join(DOCS_QUERY_TERMS), attrs, "d"
        ).collect()[0]["n_missing"]
    finally:
        shutil.rmtree(out, ignore_errors=True)
    return spark.createDataFrame([(int(n),)], "n_missing long")


_SQL_MISSING_AGG = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
m AS (
  SELECT DISTINCT doc_id FROM (
    SELECT doc_id, unnest(toks) AS term FROM t
  ) WHERE term IN ('spark','stream','window','join')
)
SELECT count(*)::BIGINT AS n_missing FROM m
WHERE doc_id % 11 = 0 OR doc_id % 13 = 0
"""


def q_moving_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES moving_fn (operators/aggs.moving_fn): moving MAX of the
    doc-length histogram's bucket counts over the 3 PRECEDING buckets
    (shift=0 — ES's exclusive-of-current default; the head bucket's
    empty window yields NULL)."""
    from ics_search_engine_spark.operators.aggs import moving_fn

    buckets = (
        _docs(spark, sf_dir)
        .select((F.size(toks_col()) - F.size(toks_col()) % 10).alias("b"))
        .groupBy("b")
        .agg(F.count("*").alias("n"))
    )
    return (
        moving_fn(buckets, "b", "n", 3, "array_max(_window)", alias="mx")
        .select("b", "n", F.col("mx").cast("long").alias("mx"))
        .orderBy("b")
    )


_SQL_MOVING_FN = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
h AS (
  SELECT len(toks) - len(toks) % 10 AS b, count(*) AS n
  FROM t GROUP BY b
)
SELECT b::INT AS b, n::BIGINT AS n,
       max(n) OVER (ORDER BY b ASC
                    ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING)::BIGINT
         AS mx
FROM h ORDER BY b
"""


def q_terms_shard_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DISTRIBUTED terms aggregation (operators/aggs.terms_agg):
    per-shard top-shard_size reports merged with ES's
    doc_count_error_upper_bound algebra.  shard_size=2 over a 5-value
    category (doc_id % 5) forces every shard to under-report, so the
    oracle replays the whole protocol — shard = doc_id >> 8 (the
    docID-order docmap property the sliced gate also pins), per-shard
    rank cut, saturation rule, per-value bound."""
    import shutil

    from ics_search_engine_spark.operators.aggs import terms_agg

    docs = _docs(spark, sf_dir)
    out, pidx = _gate_index(spark, docs, "gate_terms_idx_")
    attrs = docs.select(
        F.format_string("doc%08d", F.col("doc_id")).alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.format_string("cat%d", F.col("doc_id") % 5).alias("cat"),
    )
    try:
        res = terms_agg(
            spark, pidx, " ".join(DOCS_QUERY_TERMS), attrs, "cat",
            size=5, shard_size=2,
        ).collect()
    finally:
        shutil.rmtree(out, ignore_errors=True)
    return spark.createDataFrame(
        res, "value string, doc_count long, doc_count_error_upper_bound long"
    ).orderBy(F.desc("doc_count"), F.asc("value"))


_SQL_TERMS_SHARD = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
m AS (
  SELECT DISTINCT doc_id FROM (
    SELECT doc_id, unnest(toks) AS term FROM t
  ) WHERE term IN ('spark','stream','window','join')
),
keyed AS (
  SELECT doc_id // 256 AS shard, 'cat' || (doc_id % 5)::VARCHAR AS cat
  FROM m
),
per_shard AS (
  SELECT shard, cat, count(*) AS cnt FROM keyed GROUP BY shard, cat
),
reported AS (
  SELECT * FROM (
    SELECT shard, cat, cnt, row_number() OVER (
      PARTITION BY shard ORDER BY cnt DESC, cat ASC
    ) AS rn FROM per_shard
  ) WHERE rn <= 2
),
shard_err AS (
  SELECT shard,
         CASE WHEN count(*) >= 2 THEN min(cnt) ELSE 0 END AS contrib
  FROM reported GROUP BY shard
),
total AS (SELECT sum(contrib) AS total_contrib FROM shard_err)
SELECT r.cat AS value,
       sum(r.cnt)::BIGINT AS doc_count,
       (any_value(total.total_contrib) - sum(e.contrib))::BIGINT
         AS doc_count_error_upper_bound
FROM reported r JOIN shard_err e USING (shard) CROSS JOIN total
GROUP BY r.cat
ORDER BY doc_count DESC, value ASC LIMIT 5
"""


def q_analyze_api(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES _analyze (operators/analyze): the analysis chain run
    distributed with positions — one row per surviving token of the
    first 40 docs (stem-free variant so the oracle can replay the
    chain; offsets are pytest-gated since SQL can't see them)."""
    from ics_search_engine_spark.operators.analyze import analyze

    docs = _docs(spark, sf_dir).filter(F.col("doc_id") < 40)
    return analyze(docs.select("doc_id", "text"), "text", do_stem=False) \
        .select("doc_id", "position", "token") \
        .orderBy("doc_id", "position")


_SQL_ANALYZE = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents
           WHERE doc_id < 40)
SELECT doc_id,
       (generate_subscripts(toks, 1) - 1)::INT AS position,
       unnest(toks) AS token
FROM t
ORDER BY doc_id, position
"""


def q_spell_missing_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Term-suggester suggest_mode='missing' (operators/spell.
    suggest_terms): an in-dictionary probe returns itself (its own df,
    dist 0) WITHOUT a correction scan; an OOV probe gets the standard
    (dist asc, df desc, term asc) best match."""
    import shutil

    from ics_search_engine_spark.operators.spell import suggest_terms

    docs = _docs(spark, sf_dir)
    out, pidx = _gate_index(spark, docs, "gate_spellmiss_idx_")
    try:
        rows = suggest_terms(
            spark, pidx, ["spark", "sparkk", "streem"], max_dist=2,
            mode="missing",
        ).collect()
    finally:
        shutil.rmtree(out, ignore_errors=True)
    return spark.createDataFrame(
        rows, "token string, suggestion string, dist int, df long"
    ).orderBy("token")


_SQL_SPELL_MISSING = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
dict AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM (
    SELECT doc_id, unnest(toks) AS term FROM t
  ) GROUP BY term
),
probes(token) AS (VALUES ('spark'),('sparkk'),('streem')),
oov AS (
  SELECT p.token, d.term AS suggestion,
         levenshtein(d.term, p.token)::INT AS dist, d.df::BIGINT AS df,
         row_number() OVER (
           PARTITION BY p.token
           ORDER BY levenshtein(d.term, p.token) ASC, d.df DESC,
                    d.term ASC
         ) AS rn
  FROM probes p CROSS JOIN dict d
  WHERE levenshtein(d.term, p.token) <= 2
    AND p.token NOT IN (SELECT term FROM dict)
)
SELECT p.token, coalesce(o.suggestion, d2.term, p.token) AS suggestion,
       CASE WHEN d2.term IS NOT NULL THEN 0 ELSE o.dist END AS dist,
       coalesce(d2.df, o.df)::BIGINT AS df
FROM probes p
LEFT JOIN dict d2 ON d2.term = p.token
LEFT JOIN (SELECT * FROM oov WHERE rn = 1) o ON o.token = p.token
ORDER BY p.token
"""


def q_scripted_metric(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES scripted_metric (operators/aggs.scripted_metric): map script
    'doc_id % 7 + length of the category string' per matched doc,
    reduce 'sum' per category bucket — both as Catalyst SQL
    expressions, integer-exact so the gate hashes cleanly."""
    import shutil

    from ics_search_engine_spark.operators.aggs import scripted_metric

    docs = _docs(spark, sf_dir)
    out, pidx = _gate_index(spark, docs, "gate_scripted_idx_")
    attrs = docs.select(
        F.format_string("doc%08d", F.col("doc_id")).alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.col("doc_id"),
        F.format_string("cat%d", F.col("doc_id") % 3).alias("cat"),
    )
    try:
        rows = scripted_metric(
            spark, pidx, " ".join(DOCS_QUERY_TERMS), attrs,
            map_script="doc_id % 7 + length(cat)",
            reduce_script="sum(_mapped)",
            bucket_col="cat",
        ).collect()
    finally:
        shutil.rmtree(out, ignore_errors=True)
    return spark.createDataFrame(
        [(r["cat"], int(r["value"])) for r in rows],
        "cat string, value long",
    ).orderBy("cat")


_SQL_SCRIPTED_METRIC = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
m AS (
  SELECT DISTINCT doc_id FROM (
    SELECT doc_id, unnest(toks) AS term FROM t
  ) WHERE term IN ('spark','stream','window','join')
),
k AS (
  SELECT doc_id, 'cat' || (doc_id % 3)::VARCHAR AS cat FROM m
)
SELECT cat, sum(doc_id % 7 + length(cat))::BIGINT AS value
FROM k GROUP BY cat ORDER BY cat
"""


def q_explain_doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES _explain (operators/query.explain_doc): the full BM25
    ingredient breakdown for ONE targeted doc — the smallest doc
    matching all four gate terms, chosen identically by both engines —
    with the doc's bit-parity folded score on every row."""
    import shutil

    from ics_search_engine_spark.operators.facets import matched_docs
    from ics_search_engine_spark.operators.query import explain_doc

    docs = _docs(spark, sf_dir)
    out, pidx = _gate_index(spark, docs, "gate_explaindoc_idx_")
    q = " ".join(DOCS_QUERY_TERMS)
    try:
        target = (
            matched_docs(spark, pidx, q, conjunctive=True)
            .agg(F.min("doc_ord").alias("o"))
            .collect()[0]["o"]
        )
        rows = explain_doc(
            spark, pidx, q, f"doc{int(target):08d}", 0
        ).collect()
    finally:
        shutil.rmtree(out, ignore_errors=True)
    return spark.createDataFrame(
        [
            (
                r["term"], r["tf"], r["dl"], r["df"],
                round(r["w"], 9), round(r["contrib"], 9),
                round(r["score"], 6),
            )
            for r in rows
        ],
        "term string, tf int, dl int, df long, w_r9 double, "
        "contrib_r9 double, score_r6 double",
    ).orderBy("term")


_SQL_EXPLAIN_DOC = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
{_SQL_BM25_CTES}
target AS (
  SELECT min(doc_id) AS doc_id FROM (
    SELECT doc_id FROM posts GROUP BY doc_id HAVING count(*) = 4
  )
),
rows_ AS (
  SELECT p.term, p.tf::INT AS tf, p.dl::INT AS dl, d.df::BIGINT AS df,
         ln((s.n - d.df + 0.5) / (d.df + 0.5) + 1.0) AS w,
         ln((s.n - d.df + 0.5) / (d.df + 0.5) + 1.0)
         * (p.tf * 2.2 / (p.tf + 1.2 * (0.25 + 0.75 * p.dl / s.avgdl)))
           AS contrib
  FROM posts p JOIN dfs d USING (term) CROSS JOIN stats s
  WHERE p.doc_id = (SELECT doc_id FROM target)
)
SELECT term, tf, dl, df, round(w, 9) AS w_r9,
       round(contrib, 9) AS contrib_r9,
       round((SELECT sum(contrib) FROM rows_), 6) AS score_r6
FROM rows_ ORDER BY term
"""


def q_field_caps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES _field_caps (operators/fields.field_caps): per-field stats
    of a two-field fielded index (text, source) — n_docs/sum_dl from
    each sub-index's stats.json, n_terms from one metadata-only
    dictionary count; the oracle recomputes all three from per-field
    tokenization."""
    import shutil
    import tempfile

    from ics_search_engine_spark.operators.fields import (
        FieldedIndex,
        build_fielded_index,
        field_caps,
    )

    docs = _docs(spark, sf_dir)
    transcripts = docs.select(
        F.format_string("doc%08d", F.col("doc_id")).alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        "text",
        "source",
    )
    out = tempfile.mkdtemp(prefix="gate_fieldcaps_idx_")
    try:
        build_fielded_index(
            spark, transcripts, out, ["text", "source"], range_bits=8,
            stem=False,
        )
        rows = field_caps(FieldedIndex(spark, out)).collect()
    finally:
        shutil.rmtree(out, ignore_errors=True)
    return spark.createDataFrame(
        [(r["field"], r["n_docs"], r["sum_dl"], r["n_terms"]) for r in rows],
        "field string, n_docs long, sum_dl long, n_terms long",
    ).orderBy("field")


_SQL_FIELD_CAPS = """
WITH tx AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(coalesce(text, '')),
                     '[^a-z0-9]+'), x -> length(x) > 1) AS toks
  FROM documents
),
sx AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(coalesce(source, '')),
                     '[^a-z0-9]+'), x -> length(x) > 1) AS toks
  FROM documents
)
SELECT 'source' AS field, count(*)::BIGINT AS n_docs,
       sum(len(toks))::BIGINT AS sum_dl,
       (SELECT count(DISTINCT term) FROM (
          SELECT unnest(toks) AS term FROM sx))::BIGINT AS n_terms
FROM sx
UNION ALL
SELECT 'text', count(*)::BIGINT, sum(len(toks))::BIGINT,
       (SELECT count(DISTINCT term) FROM (
          SELECT unnest(toks) AS term FROM tx))::BIGINT
FROM tx
ORDER BY field
"""


def q_dis_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES dis_max (operators/querydsl.dis_max_topk): two clauses,
    tie_breaker 0.3 — best clause + 0.3 x the other; the oracle pivots
    per-clause BM25 sums and replays max + tb*(sum-max).  Boundary
    discipline: over-fetch an exact-score superset (k=60), then cut
    the displayed 20 on ROUNDED order like the oracle does."""
    import shutil

    from ics_search_engine_spark.operators.querydsl import dis_max_topk

    docs = _docs(spark, sf_dir)
    out, pidx = _gate_index(spark, docs, "gate_dismax_idx_")
    try:
        rows = dis_max_topk(
            spark, pidx, ["spark stream", "window join"],
            tie_breaker=0.3, k=60,
        ).collect()
    finally:
        shutil.rmtree(out, ignore_errors=True)
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, score double"
    ).select(
        F.substring("conv_id", 4, 8).cast("long").alias("doc_id"),
        F.round(F.col("score"), 6).alias("dismax_r6"),
    ).orderBy(F.desc("dismax_r6"), F.asc("doc_id")).limit(20)


_SQL_DIS_MAX = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
reqs(qid, term) AS (VALUES
  ('q1','spark'),('q1','stream'),
  ('q2','join'),('q2','window')),
stats AS (SELECT count(*)::DOUBLE AS n, avg(len(toks)) AS avgdl FROM t),
posts AS (
  SELECT term, doc_id, count(*) AS tf, any_value(dl) AS dl FROM (
    SELECT doc_id, len(toks) AS dl, unnest(toks) AS term FROM t
  ) WHERE term IN (SELECT DISTINCT term FROM reqs)
  GROUP BY term, doc_id
),
dfs AS (SELECT term, count(*) AS df FROM posts GROUP BY term),
scored AS (
  SELECT r.qid, p.doc_id,
         ln((s.n - d.df + 0.5) / (d.df + 0.5) + 1.0)
         * (p.tf * 2.2 / (p.tf + 1.2 * (0.25 + 0.75 * p.dl / s.avgdl)))
         AS contrib
  FROM posts p JOIN dfs d USING (term) JOIN reqs r USING (term)
  CROSS JOIN stats s
),
per_clause AS (
  SELECT doc_id,
         coalesce(sum(contrib) FILTER (WHERE qid = 'q1'), 0.0) AS s1,
         coalesce(sum(contrib) FILTER (WHERE qid = 'q2'), 0.0) AS s2
  FROM scored GROUP BY doc_id
)
SELECT doc_id,
       round(greatest(s1, s2)
             + 0.3 * (s1 + s2 - greatest(s1, s2)), 6) AS dismax_r6
FROM per_clause
ORDER BY dismax_r6 DESC, doc_id ASC LIMIT 20
"""


def q_mget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES _mget (operators/query.mget): four keys fetched in one job,
    caller order preserved, one deliberately absent (found=false)."""
    from ics_search_engine_spark.operators.query import mget

    docs = _docs(spark, sf_dir)
    transcripts = docs.select(
        F.format_string("doc%08d", F.col("doc_id")).alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        "text",
    )
    keys = [("doc00000017", 0), ("doc00000005", 0),
            ("doc99999999", 0), ("doc00000042", 0)]
    return mget(spark, transcripts, keys).select(
        "req_order", "conv_id", "found", "text"
    )


_SQL_MGET = """
WITH reqs(req_order, conv_id, doc_id) AS (VALUES
  (0, 'doc00000017', 17), (1, 'doc00000005', 5),
  (2, 'doc99999999', 99999999), (3, 'doc00000042', 42))
SELECT r.req_order::INT AS req_order, r.conv_id,
       d.text IS NOT NULL AS found, d.text
FROM reqs r LEFT JOIN documents d ON d.doc_id = r.doc_id
ORDER BY req_order
"""


def q_eql_sequence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EQL ``sequence`` (operators/eql.sequence_matches): per user, the
    funnel view -> click -> purchase within 6 hours, greedy
    earliest-completion per anchor.  The oracle is the generated SQL
    mirror of the same window construction."""
    from ics_search_engine_spark.operators.eql import sequence_matches

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    et = F.col("event_type")
    return sequence_matches(
        ev,
        by="user_id",
        stages=[et == "view", et == "click", et == "purchase"],
        order_col="ts",
        id_col="event_id",
        maxspan_s=6 * 3600,
    )


from ics_search_engine_spark.operators.eql import (  # noqa: E402
    sequence_matches_sql as _seq_sql,
)

_SQL_EQL_SEQUENCE = _seq_sql(
    "events",
    by="user_id",
    stage_preds=[
        "event_type = 'view'",
        "event_type = 'click'",
        "event_type = 'purchase'",
    ],
    order_col="ts",
    id_col="event_id",
    maxspan_s=6 * 3600,
)


def q_eql_until(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EQL ``sequence ... until`` (operators/eql.sequence_matches with
    until): the same funnel, expired by an intervening error event."""
    from ics_search_engine_spark.operators.eql import sequence_matches

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    et = F.col("event_type")
    return sequence_matches(
        ev,
        by="user_id",
        stages=[et == "view", et == "click", et == "purchase"],
        order_col="ts",
        id_col="event_id",
        maxspan_s=6 * 3600,
        until=et == "error",
    )


def q_ngram_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (operators/dedup.ngram_contamination):
    trigram overlap between the corpus and a 1-in-25 'benchmark'
    slice of it, reported at min_shared=3."""
    from ics_search_engine_spark.operators.dedup import ngram_contamination

    docs = _docs(spark, sf_dir)
    bench = docs.filter(F.col("doc_id") % 25 == 0).select(
        F.col("doc_id").alias("bench_id"), "text"
    )
    return ngram_contamination(docs, bench, n=3, min_shared=3)


_SQL_NGRAM_CONTAMINATION = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
g AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(
           range(1, len(toks) - 1),
           i -> {_sql_md5_32("toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]")}
         ))) AS h
  FROM t WHERE len(toks) >= 3
)
SELECT d.doc_id AS doc_id, b.bench_id, count(*) AS n_shared
FROM g d
JOIN (SELECT doc_id AS bench_id, h FROM g WHERE doc_id % 25 = 0) b
  ON d.h = b.h
GROUP BY 1, 2 HAVING count(*) >= 3
ORDER BY n_shared DESC, doc_id, bench_id
"""


def q_eql_forbid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EQL per-gap negation (operators/eql.sequence_matches with
    forbid): view then purchase with NO error strictly between."""
    from ics_search_engine_spark.operators.eql import sequence_matches

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    et = F.col("event_type")
    return sequence_matches(
        ev,
        by="user_id",
        stages=[et == "view", et == "purchase"],
        order_col="ts",
        id_col="event_id",
        maxspan_s=2 * 3600,
        forbid={1: et == "error"},
    )


_SQL_EQL_FORBID = _seq_sql(
    "events",
    by="user_id",
    stage_preds=["event_type = 'view'", "event_type = 'purchase'"],
    order_col="ts",
    id_col="event_id",
    maxspan_s=2 * 3600,
    forbid_preds={1: "event_type = 'error'"},
)


_SQL_EQL_UNTIL = _seq_sql(
    "events",
    by="user_id",
    stage_preds=[
        "event_type = 'view'",
        "event_type = 'click'",
        "event_type = 'purchase'",
    ],
    order_col="ts",
    id_col="event_id",
    maxspan_s=6 * 3600,
    until_pred="event_type = 'error'",
)


def q_categorize_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES categorize_text (operators/aggs.categorize_text): masked
    8-token-prefix pattern buckets over the documents table."""
    from ics_search_engine_spark.operators.aggs import categorize_text

    return categorize_text(_docs(spark, sf_dir), "text", "doc_id", 8)


_SQL_CATEGORIZE_TEXT = """
SELECT category, count(*) AS n_docs, min(doc_id) AS example_id FROM (
  SELECT doc_id, array_to_string(
    list_transform(
      (list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                   t -> len(t) > 1))[1:8],
      t -> CASE WHEN regexp_matches(t, '[0-9]') THEN '#' ELSE t END),
    ' ') AS category
  FROM documents)
GROUP BY category ORDER BY n_docs DESC, category ASC
"""


def q_change_point(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES change_point (operators/aggs.change_point): strongest
    standardized mean shift over the hourly event-count series."""
    from ics_search_engine_spark.operators.aggs import change_point

    buckets = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .groupBy(F.date_trunc("hour", F.col("ts")).alias("hour"))
        .agg(F.count("*").alias("n_events"))
    )
    return change_point(buckets, "hour", "n_events")


_SQL_CHANGE_POINT = """
WITH b AS (
  SELECT date_trunc('hour', ts) AS hour, count(*)::DOUBLE AS v
  FROM events GROUP BY 1
),
c AS (
  SELECT hour, v,
         sum(v) OVER (ORDER BY hour) AS cum,
         row_number() OVER (ORDER BY hour) AS i,
         count(*) OVER () AS n,
         sum(v) OVER () AS tot
  FROM b
)
SELECT hour,
       round(abs(cum / i - (tot - cum) / (n - i))
             * sqrt(i::DOUBLE * (n - i) / n), 6) AS stat_r6,
       round(cum / i, 6) AS mean_before_r6,
       round((tot - cum) / (n - i), 6) AS mean_after_r6,
       CASE WHEN (tot - cum) / (n - i) > cum / i
            THEN 'spike_up' ELSE 'spike_down' END AS direction
FROM c WHERE i < n
ORDER BY stat_r6 DESC, hour ASC LIMIT 1
"""


def q_esql_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES|QL pipe (operators/esql.esql_query): WHERE -> EVAL -> STATS
    BY -> SORT -> LIMIT compiled to one Catalyst plan.  Integer-cents
    sum keeps float shuffle-order out of the compare."""
    from ics_search_engine_spark.operators.esql import esql_query

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    pipe = """FROM events
| WHERE event_type == "error" AND value > 50
| EVAL hour = DATE_TRUNC(1 hour, ts), cents = CAST(ROUND(value * 100) AS LONG)
| STATS n = COUNT(*), users = COUNT_DISTINCT(user_id), total_cents = SUM(cents) BY hour
| SORT n DESC, hour ASC
| LIMIT 20"""
    return esql_query(spark, pipe, {"events": ev})


_SQL_ESQL_STATS = """
SELECT date_trunc('hour', ts) AS hour,
       count(*) AS n,
       count(DISTINCT user_id) AS users,
       sum(round(value * 100)::BIGINT) AS total_cents
FROM events
WHERE event_type = 'error' AND value > 50
GROUP BY 1
ORDER BY n DESC, hour ASC LIMIT 20
"""


def q_frequent_item_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES frequent_item_sets (operators/aggs.frequent_item_sets):
    exact Apriori over per-document distinct-token baskets, support
    >= 5%, itemsets up to size 3.  Items emitted space-joined so the
    compare is string-typed."""
    from ics_search_engine_spark.operators.aggs import frequent_item_sets

    tx = _docs(spark, sf_dir).select(
        F.col("doc_id").alias("txn_id"),
        F.explode(F.array_distinct(toks_col())).alias("item"),
    )
    return frequent_item_sets(tx, min_support=0.05, max_size=3).select(
        F.array_join("items", " ").alias("items_str"),
        "n_txns",
        "support",
    )


_SQL_FREQUENT_ITEM_SETS = f"""
WITH t AS (
  SELECT doc_id, unnest(list_distinct({_SQL_TOKS})) AS i
  FROM documents
),
n AS (SELECT count(DISTINCT doc_id) AS n FROM t),
l1 AS (
  SELECT i, count(*) AS c FROM t GROUP BY i
  HAVING count(*) >= (SELECT 0.05 * n FROM n)
),
tf AS (SELECT t.doc_id, t.i FROM t JOIN l1 USING (i)),
pd AS (
  SELECT a.doc_id, a.i AS i1, b.i AS i2
  FROM tf a JOIN tf b ON a.doc_id = b.doc_id AND a.i < b.i
),
l2 AS (
  SELECT i1, i2, count(*) AS c FROM pd GROUP BY i1, i2
  HAVING count(*) >= (SELECT 0.05 * n FROM n)
),
pdf AS (SELECT pd.* FROM pd JOIN l2 USING (i1, i2)),
td AS (
  SELECT pdf.doc_id, i1, i2, c.i AS i3
  FROM pdf JOIN tf c ON c.doc_id = pdf.doc_id AND c.i > pdf.i2
),
l3 AS (
  SELECT i1, i2, i3, count(*) AS c FROM td GROUP BY i1, i2, i3
  HAVING count(*) >= (SELECT 0.05 * n FROM n)
),
u AS (
  SELECT 1 AS sz, i AS items_str, c FROM l1
  UNION ALL
  SELECT 2, i1 || ' ' || i2, c FROM l2
  UNION ALL
  SELECT 3, i1 || ' ' || i2 || ' ' || i3, c FROM l3
)
SELECT items_str, c AS n_txns,
       round(c / (SELECT n::DOUBLE FROM n), 6) AS support
FROM u ORDER BY sz, c DESC, items_str
"""


def q_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES bucket_count_ks_test (operators/aggs.bucket_count_ks_test):
    KS D between the hourly error-count and view-count series."""
    from ics_search_engine_spark.operators.aggs import bucket_count_ks_test

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    buckets = ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(
        F.count(F.when(F.col("event_type") == "error", 1)).alias("fg"),
        F.count(F.when(F.col("event_type") == "view", 1)).alias("bg"),
    )
    return bucket_count_ks_test(buckets, "hour", "fg", "bg")


_SQL_KS_TEST = """
WITH b AS (
  SELECT date_trunc('hour', ts) AS hour,
         count(*) FILTER (WHERE event_type = 'error')::DOUBLE AS fg,
         count(*) FILTER (WHERE event_type = 'view')::DOUBLE AS bg
  FROM events GROUP BY 1
),
c AS (
  SELECT hour,
         sum(fg) OVER (ORDER BY hour) AS cfg,
         sum(bg) OVER (ORDER BY hour) AS cbg,
         sum(fg) OVER () AS tfg,
         sum(bg) OVER () AS tbg
  FROM b
)
SELECT hour AS at, round(abs(cfg / tfg - cbg / tbg), 6) AS d_stat_r6
FROM c ORDER BY d_stat_r6 DESC, at ASC LIMIT 1
"""


def q_bucket_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES bucket_correlation (operators/aggs.bucket_correlation):
    Pearson r between hourly event count and hourly integer-cents sum."""
    from ics_search_engine_spark.operators.aggs import bucket_correlation

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    buckets = ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(
        F.count("*").alias("n"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"),
    )
    return bucket_correlation(buckets, "n", "cents")


_SQL_BUCKET_CORRELATION = """
WITH b AS (
  SELECT date_trunc('hour', ts) AS hour, count(*) AS n,
         sum(round(value * 100)::BIGINT) AS cents
  FROM events GROUP BY 1
)
SELECT round(corr(n::DOUBLE, cents::DOUBLE), 6) AS correlation_r6,
       count(*) AS n_buckets
FROM b
"""


def q_variable_width_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES variable_width_histogram (operators/aggs.
    variable_width_histogram): 8 equal-frequency buckets over value."""
    from ics_search_engine_spark.operators.aggs import (
        variable_width_histogram,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return variable_width_histogram(ev, "value", 8)


_SQL_VARIABLE_WIDTH_HISTOGRAM = """
WITH t AS (
  SELECT ntile(8) OVER (ORDER BY value) AS bucket, value
  FROM events
)
SELECT bucket, count(*) AS n_values,
       min(value) AS min_value, max(value) AS max_value
FROM t GROUP BY bucket ORDER BY bucket
"""


# the textstats ops tokenize with len > 0 (every token counts toward
# a likelihood / a gram), unlike the reference analyzer's len > 1
_SQL_TOKS0 = (
    "list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), "
    "x -> length(x) > 0)"
)


def q_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style within-doc repetition signals (operators/textstats.
    repetition_signals): line-dup fractions (pure per-row Catalyst)
    plus top-2-gram and duplicated-5-gram char fractions (doc-grain
    exchanges only)."""
    from ics_search_engine_spark.operators.textstats import (
        repetition_signals,
    )

    return repetition_signals(_docs(spark, sf_dir)).orderBy("doc_id")


_SQL_REPETITION_SIGNALS = f"""
WITH lines AS (
  SELECT doc_id,
         list_filter(string_split(text, chr(10)), x -> length(x) > 0) AS ls
  FROM documents
),
base AS (
  SELECT doc_id, len(ls) AS n_lines,
    round(CASE WHEN len(ls) > 0 THEN
      (len(ls) - len(list_distinct(ls)))::DOUBLE / len(ls) ELSE 0 END, 6)
      AS dup_line_frac_r6,
    round(CASE WHEN coalesce(list_sum(list_transform(ls, x -> length(x))), 0) > 0 THEN
      (list_sum(list_transform(ls, x -> length(x)))
       - list_sum(list_transform(list_distinct(ls), x -> length(x))))::DOUBLE
      / list_sum(list_transform(ls, x -> length(x))) ELSE 0 END, 6)
      AS dup_line_char_frac_r6,
    round(CASE WHEN len(ls) > 0 THEN
      len(list_filter(ls, x -> regexp_matches(x, '^\\s*[-*•]')))::DOUBLE
      / len(ls) ELSE 0 END, 6) AS bullet_line_frac_r6,
    round(CASE WHEN len(ls) > 0 THEN
      len(list_filter(ls, x -> regexp_matches(x, '(\\.\\.\\.|…)\\s*$')))::DOUBLE
      / len(ls) ELSE 0 END, 6) AS ellipsis_line_frac_r6
  FROM lines
),
t AS (SELECT doc_id, {_SQL_TOKS0} AS toks FROM documents),
g2 AS (
  SELECT doc_id, g, count(*) AS c, max(length(g)) AS gl FROM (
    SELECT doc_id, unnest(list_transform(range(1, len(toks)),
      i -> toks[i] || ' ' || toks[i+1])) AS g
    FROM t WHERE len(toks) >= 2)
  GROUP BY doc_id, g
),
top2 AS (
  SELECT doc_id, round(max(c * gl)::DOUBLE / sum(c * gl), 6) AS v
  FROM g2 GROUP BY doc_id
),
g5 AS (
  SELECT doc_id, g, count(*) AS c, max(length(g)) AS gl FROM (
    SELECT doc_id, unnest(list_transform(range(1, len(toks) - 3),
      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' '
           || toks[i+3] || ' ' || toks[i+4])) AS g
    FROM t WHERE len(toks) >= 5)
  GROUP BY doc_id, g
),
dup5 AS (
  SELECT doc_id,
    round(sum(CASE WHEN c >= 2 THEN c * gl ELSE 0 END)::DOUBLE
          / sum(c * gl), 6) AS v
  FROM g5 GROUP BY doc_id
)
SELECT b.doc_id AS doc_id, b.n_lines, b.dup_line_frac_r6,
       b.dup_line_char_frac_r6, b.bullet_line_frac_r6,
       b.ellipsis_line_frac_r6,
       coalesce(top2.v, 0.0) AS top_gram_char_frac_r6,
       coalesce(dup5.v, 0.0) AS dup_gram_char_frac_r6
FROM base b
LEFT JOIN top2 ON b.doc_id = top2.doc_id
LEFT JOIN dup5 ON b.doc_id = dup5.doc_id
ORDER BY doc_id
"""


def q_unigram_nll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM quality proxy (operators/textstats.
    unigram_logprob): per-doc mean negative log-likelihood under the
    corpus's own unigram model."""
    from ics_search_engine_spark.operators.textstats import unigram_logprob

    return unigram_logprob(_docs(spark, sf_dir)).orderBy("doc_id")


_SQL_UNIGRAM_NLL = f"""
WITH t AS (SELECT doc_id, unnest({_SQL_TOKS0}) AS term FROM documents),
m AS (SELECT term, count(*) AS tf FROM t GROUP BY term),
n AS (SELECT count(*)::DOUBLE AS total FROM t)
SELECT doc_id, count(*) AS n_tokens,
       round(avg(-ln(tf / total)), 6) AS mean_nll_r6
FROM t JOIN m USING (term) CROSS JOIN n
GROUP BY doc_id ORDER BY doc_id
"""


# ------------------------------------------------------------------
# chat/SFT extraction gates: transcripts synthesized deterministically
# from documents (5 turns per conversation, alternating roles, every
# 7th doc a tool call, one-minute turn cadence) — the same synthesis
# transcribed in each oracle.


def _synth_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    return docs.select(
        F.format_string("conv%06d", (F.col("doc_id") / 5).cast("long")
                        ).alias("conv_id"),
        (F.col("doc_id") % 5).cast("int").alias("turn_idx"),
        F.when((F.col("doc_id") % 5) % 2 == 0, "user")
        .otherwise("assistant").alias("role"),
        F.col("text"),
        F.when(F.col("doc_id") % 7 == 0, "search")
        .otherwise(F.lit(None).cast("string")).alias("tool"),
        F.timestamp_seconds(
            F.lit(1767225600) + F.col("doc_id") * 60
        ).alias("ts"),
    )


_SQL_SYNTH_TRANSCRIPTS = """
  SELECT printf('conv%06d', doc_id // 5) AS conv_id,
         (doc_id % 5)::INT AS turn_idx,
         CASE WHEN (doc_id % 5) % 2 = 0 THEN 'user'
              ELSE 'assistant' END AS role,
         text,
         CASE WHEN doc_id % 7 = 0 THEN 'search' END AS tool,
         TIMESTAMP '2026-01-01 00:00:00'
           + to_minutes(doc_id) AS ts
  FROM documents
"""


def q_sft_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SFT example extraction (operators/chatdata.sft_pairs): one
    (prompt, response) per assistant turn, prompt = the previous two
    turns as 'role: text' lines — the per-conversation window is
    bounded (5 turns), never global."""
    from ics_search_engine_spark.operators.chatdata import sft_pairs

    return sft_pairs(
        _synth_transcripts(spark, sf_dir), context_turns=2
    ).orderBy("conv_id", "turn_idx")


_SQL_SFT_PAIRS = f"""
WITH t AS ({_SQL_SYNTH_TRANSCRIPTS}),
w AS (
  SELECT conv_id, turn_idx, role, coalesce(text, '') AS text,
         list(role || ': ' || coalesce(text, '')) OVER (
           PARTITION BY conv_id ORDER BY turn_idx
           ROWS BETWEEN 2 PRECEDING AND 1 PRECEDING
         ) AS ctx
  FROM t
)
SELECT conv_id, turn_idx,
       array_to_string(ctx, chr(10)) AS prompt,
       text AS response
FROM w
WHERE role = 'assistant' AND len(ctx) >= 1
ORDER BY conv_id, turn_idx
"""


def q_conversation_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversation curation profile (operators/chatdata.
    conversation_stats): per-conv role/tool/size counts + wall-clock
    span — one conv-keyed aggregation."""
    from ics_search_engine_spark.operators.chatdata import (
        conversation_stats,
    )

    return conversation_stats(
        _synth_transcripts(spark, sf_dir)
    ).orderBy("conv_id")


_SQL_CONVERSATION_STATS = f"""
WITH t AS ({_SQL_SYNTH_TRANSCRIPTS})
SELECT conv_id,
       count(*)::INT AS n_turns,
       sum(CASE WHEN role = 'user' THEN 1 ELSE 0 END) AS n_user,
       sum(CASE WHEN role = 'assistant' THEN 1 ELSE 0 END) AS n_assistant,
       sum(CASE WHEN tool IS NOT NULL THEN 1 ELSE 0 END) AS n_tool_calls,
       sum(length(coalesce(text, ''))) AS n_chars,
       date_diff('second', min(ts), max(ts)) AS span_seconds
FROM t GROUP BY conv_id ORDER BY conv_id
"""


def q_conv_exact_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversation-level exact dedup (operators/chatdata.
    conv_exact_dups): the first ten conversations are re-injected
    under dup ids, so each dup resolves to its original as keeper —
    fingerprint = md5 over the turn-ordered text fold, hash-groupBy
    shape."""
    from ics_search_engine_spark.operators.chatdata import (
        conv_exact_dups,
    )

    t = _synth_transcripts(spark, sf_dir)
    dups = (
        t.filter(F.substring("conv_id", 5, 6).cast("long") < 10)
        .withColumn(
            "conv_id", F.concat(F.lit("dup"), F.substring("conv_id", 5, 6))
        )
    )
    return conv_exact_dups(t.unionByName(dups)).orderBy("conv_id")


_SQL_CONV_EXACT_DUPS = f"""
WITH t0 AS ({_SQL_SYNTH_TRANSCRIPTS}),
t AS (
  SELECT * FROM t0
  UNION ALL
  SELECT 'dup' || substr(conv_id, 5, 6) AS conv_id, turn_idx, role,
         text, tool, ts
  FROM t0 WHERE substr(conv_id, 5, 6)::BIGINT < 10
),
fps AS (
  SELECT conv_id,
         md5(string_agg(coalesce(text, ''), chr(30)
                        ORDER BY turn_idx)) AS fp
  FROM t GROUP BY conv_id
),
keep AS (SELECT fp, min(conv_id) AS keeper FROM fps GROUP BY fp)
SELECT conv_id, keeper FROM fps JOIN keep USING (fp)
WHERE conv_id <> keeper ORDER BY conv_id
"""


def q_conv_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversation-level MinHash+LSH near-dup pairs (operators/
    chatdata.conv_near_dup_pairs = conv_rolled_text ∘ the gated
    doc-grain minhash_lsh_pairs): the first five conversations are
    re-injected verbatim under dup ids, so each must pair with its
    original at est_jaccard 1.0; any organic near-pairs match too —
    the oracle replicates roll + 16-hash/4-band LSH relationally."""
    from ics_search_engine_spark.operators.chatdata import (
        conv_near_dup_pairs,
    )

    t = _synth_transcripts(spark, sf_dir)
    dups = (
        t.filter(F.substring("conv_id", 5, 6).cast("long") < 5)
        .withColumn(
            "conv_id", F.concat(F.lit("dup"), F.substring("conv_id", 5, 6))
        )
    )
    return (
        conv_near_dup_pairs(
            t.unionByName(dups), n_hashes=16, n_bands=4,
            jaccard_threshold=0.7,
        )
        .select(
            "a_conv_id", "b_conv_id",
            F.round("est_jaccard", 6).alias("est_jaccard_r6"),
        )
        .orderBy("a_conv_id", "b_conv_id")
    )


def _sql_conv_near_dups() -> str:
    n_hashes, n_bands, rpb = 16, 4, 4
    mh = ",\n         ".join(
        f"min(('0x' || substr(md5('{i}:' || term), 1, 8))::BIGINT)"
        f" AS mh{i}"
        for i in range(n_hashes)
    )
    bands = ",\n         ".join(
        "md5(" + " || '_' || ".join(
            f"mh{b * rpb + r}::VARCHAR" for r in range(rpb)
        ) + f") AS band{b}"
        for b in range(n_bands)
    )
    band_rows = " UNION ALL ".join(
        f"SELECT conv_id, sig, {b} AS band_id, band{b} AS band_val"
        " FROM bands"
        for b in range(n_bands)
    )
    matches = " + ".join(
        f"CASE WHEN a.sig[{i + 1}] = b.sig[{i + 1}] THEN 1 ELSE 0 END"
        for i in range(n_hashes)
    )
    sig_arr = ", ".join(f"mh{i}" for i in range(n_hashes))
    return f"""
WITH t0 AS ({_SQL_SYNTH_TRANSCRIPTS}),
t AS (
  SELECT * FROM t0
  UNION ALL
  SELECT 'dup' || substr(conv_id, 5, 6) AS conv_id, turn_idx, role,
         text, tool, ts
  FROM t0 WHERE substr(conv_id, 5, 6)::BIGINT < 5
),
rolled AS (
  SELECT conv_id,
         string_agg(coalesce(text, ''), ' ' ORDER BY turn_idx) AS text
  FROM t GROUP BY conv_id
),
toks AS (
  SELECT conv_id, unnest(list_distinct(list_filter(
           regexp_split_to_array(lower(text), '[^a-z0-9]+'),
           x -> length(x) > 1))) AS term
  FROM rolled
),
sigs AS (
  SELECT conv_id,
         {mh}
  FROM toks GROUP BY conv_id
),
bands AS (
  SELECT conv_id, [{sig_arr}] AS sig,
         {bands}
  FROM sigs
),
stacked AS ({band_rows}),
cand AS (
  SELECT DISTINCT a.conv_id AS a_conv_id, b.conv_id AS b_conv_id,
         ({matches})::DOUBLE / {n_hashes} AS ej
  FROM stacked a JOIN stacked b
    ON a.band_id = b.band_id AND a.band_val = b.band_val
   AND a.conv_id < b.conv_id
)
SELECT a_conv_id, b_conv_id, round(ej, 6) AS est_jaccard_r6
FROM cand WHERE ej >= 0.7
ORDER BY a_conv_id, b_conv_id
"""


_SQL_CONV_NEAR_DUPS = _sql_conv_near_dups()


def q_chat_corpus_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The chat-curation composition's attrition accounting
    (operators/chatdata.prepare_chat_corpus): structural gates →
    conversation exact-dedup, with ten exact-dup conversations
    injected — the report must count input, structural survivors,
    and dedup survivors; the oracle recomputes each stage
    relationally."""
    from ics_search_engine_spark.operators.chatdata import (
        prepare_chat_corpus,
    )

    t = _synth_transcripts(spark, sf_dir)
    dups = (
        t.filter(F.substring("conv_id", 5, 6).cast("long") < 10)
        .withColumn(
            "conv_id", F.concat(F.lit("dup"), F.substring("conv_id", 5, 6))
        )
    )
    _, rep = prepare_chat_corpus(
        t.unionByName(dups), min_turns=2, require_assistant=True
    )
    return rep.orderBy("stage_idx")


_SQL_CHAT_CORPUS_REPORT = f"""
WITH t0 AS ({_SQL_SYNTH_TRANSCRIPTS}),
t AS (
  SELECT * FROM t0
  UNION ALL
  SELECT 'dup' || substr(conv_id, 5, 6) AS conv_id, turn_idx, role,
         text, tool, ts
  FROM t0 WHERE substr(conv_id, 5, 6)::BIGINT < 10
),
counts AS (
  SELECT conv_id, count(*) AS n_turns,
         sum(CASE WHEN role = 'assistant' THEN 1 ELSE 0 END)
           AS n_assistant
  FROM t GROUP BY conv_id
),
keep AS (
  SELECT conv_id FROM counts
  WHERE n_turns >= 2 AND n_assistant >= 1
),
cur AS (SELECT t.* FROM t SEMI JOIN keep USING (conv_id)),
fps AS (
  SELECT conv_id,
         md5(string_agg(coalesce(text, ''), chr(30)
                        ORDER BY turn_idx)) AS fp
  FROM cur GROUP BY conv_id
),
keepers AS (SELECT fp, min(conv_id) AS keeper FROM fps GROUP BY fp),
dedup AS (
  SELECT f.conv_id FROM fps f JOIN keepers k USING (fp)
  WHERE f.conv_id = k.keeper
)
SELECT 0 AS stage_idx, 'input' AS stage,
       (SELECT count(DISTINCT conv_id) FROM t) AS n_convs
UNION ALL
SELECT 1, 'structural', (SELECT count(*) FROM keep)
UNION ALL
SELECT 2, 'exact_dedup', (SELECT count(*) FROM dedup)
ORDER BY stage_idx
"""


def q_conv_token_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window trimming (operators/chatdata.
    trim_to_token_budget, keep='last'): each conversation keeps its
    most recent whole turns whose whitespace-token counts fit a
    120-token budget — the chat-serving truncation posture; the
    oracle replays the reverse running sum relationally."""
    from ics_search_engine_spark.operators.chatdata import (
        trim_to_token_budget,
    )

    return (
        trim_to_token_budget(_synth_transcripts(spark, sf_dir), 120)
        .select("conv_id", "turn_idx", "n_turn_tokens",
                "conv_tokens_kept")
        .orderBy("conv_id", "turn_idx")
    )


_SQL_CONV_TOKEN_TRIM = f"""
WITH t AS ({_SQL_SYNTH_TRANSCRIPTS}),
c AS (
  SELECT conv_id, turn_idx,
         len(list_filter(regexp_split_to_array(
               coalesce(text, ''), '\\s+'),
             x -> length(x) > 0)) AS n_turn_tokens
  FROM t
),
runs AS (
  SELECT conv_id, turn_idx, n_turn_tokens,
         sum(n_turn_tokens) OVER (
           PARTITION BY conv_id ORDER BY turn_idx DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS run
  FROM c
),
kept AS (SELECT * FROM runs WHERE run <= 120)
SELECT conv_id, turn_idx, n_turn_tokens,
       max(run) OVER (PARTITION BY conv_id) AS conv_tokens_kept
FROM kept ORDER BY conv_id, turn_idx
"""


def q_conv_validity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transcript structural validation (operators/chatdata.
    validate_turn_order): contiguity / role alternation / user-first /
    assistant-last per conversation.  The synthesis alternates roles
    and numbers turns 0..n-1, so contiguous+alternating+user-first
    always hold and validity reduces to whether the LAST turn is an
    assistant turn (even-length conversations) — the oracle replays
    each predicate relationally, not the shortcut."""
    from ics_search_engine_spark.operators.chatdata import (
        validate_turn_order,
    )

    return validate_turn_order(
        _synth_transcripts(spark, sf_dir)
    ).orderBy("conv_id")


_SQL_CONV_VALIDITY = f"""
WITH t AS ({_SQL_SYNTH_TRANSCRIPTS}),
r AS (
  SELECT conv_id,
         list_sort(list(ROW(turn_idx, role))) AS ts
  FROM t GROUP BY conv_id
),
x AS (
  SELECT conv_id,
         len(ts) AS n,
         list_transform(ts, s -> s[1]) AS idxs,
         list_transform(ts, s -> s[2]) AS roles
  FROM r
),
y AS (
  SELECT conv_id, n,
         idxs = range(0, n) AS contiguous,
         CASE WHEN n <= 1 THEN TRUE ELSE NOT list_has_any(
           list_transform(range(1, n),
                          i -> roles[i] = roles[i + 1]),
           [TRUE]) END AS alternating,
         roles[1] = 'user' AS starts_with_user,
         roles[n] = 'assistant' AS ends_with_assistant
  FROM x
)
SELECT conv_id, n::INT AS n_turns, contiguous, alternating,
       starts_with_user, ends_with_assistant,
       (contiguous AND alternating AND starts_with_user
        AND ends_with_assistant) AS valid
FROM y ORDER BY conv_id
"""


def q_conv_dedup_transitive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversation-grain TRANSITIVE near-dedup drops
    (operators/chatdata.conv_near_dup_drops: pair graph → connected
    components → drop every conversation that is not its component's
    minimum — round-5 fix: prepare_chat_corpus previously dropped the
    larger side of each pair directly, which keeps {A, B} on a chain
    A~C, B~C where the doc-grain semantics keep {A}).  The gate feeds
    a deterministic chain-heavy pair set over the synthetic convs
    (ordinal runs + every-11th bridges) so the oracle's recursive-CTE
    reachability has real multi-hop components."""
    from ics_search_engine_spark.operators.chatdata import (
        conv_near_dup_drops,
    )

    ids = (
        _synth_transcripts(spark, sf_dir)
        .select("conv_id").distinct()
        .select(
            "conv_id",
            F.substring("conv_id", 5, 6).cast("long").alias("c"),
        )
    )
    a, b = ids.alias("a"), ids.alias("b")
    runs = a.join(
        b,
        (F.col("b.c") == F.col("a.c") + 1) & (F.col("a.c") % 4 < 2),
    ).select(
        F.col("a.conv_id").alias("a_conv_id"),
        F.col("b.conv_id").alias("b_conv_id"),
    )
    bridges = a.join(
        b,
        (F.col("b.c") == F.col("a.c") + 9) & (F.col("a.c") % 11 == 0),
    ).select(
        F.col("a.conv_id").alias("a_conv_id"),
        F.col("b.conv_id").alias("b_conv_id"),
    )
    return conv_near_dup_drops(
        runs.unionByName(bridges)
    ).orderBy("conv_id")


_SQL_CONV_DEDUP_TRANSITIVE = """
WITH RECURSIVE
t AS (SELECT DISTINCT doc_id // 5 AS c FROM documents),
e0 AS (
  SELECT a.c AS u, b.c AS v
  FROM t a JOIN t b ON b.c = a.c + 1 WHERE a.c % 4 < 2
  UNION ALL
  SELECT a.c AS u, b.c AS v
  FROM t a JOIN t b ON b.c = a.c + 9 WHERE a.c % 11 = 0
),
nodes AS (SELECT u AS c FROM e0 UNION SELECT v AS c FROM e0),
e AS (SELECT u, v FROM e0 UNION SELECT v AS u, u AS v FROM e0),
cc AS (
  SELECT c AS node, c AS root FROM nodes
  UNION
  SELECT e.v AS node, cc.root FROM cc JOIN e ON e.u = cc.node
),
m AS (SELECT node, min(root) AS root FROM cc GROUP BY node)
SELECT printf('conv%06d', node) AS conv_id
FROM m WHERE root <> node ORDER BY conv_id
"""


def q_rank_eval_engine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking evaluation (operators/rankeval.rank_eval — the ES
    _rank_eval surface): two rated requests over the stem-free packed
    engine in ONE bm25_topk_multi job; precision / recall / MRR / DCG
    / NDCG / ERR @10 + the unlabeled-doc tally per request.  Ratings
    are deterministic doc_id residue classes, so the oracle recomputes
    the exact BM25 rankings relationally (the bm25_engine CTE pattern)
    and every metric from first principles — ERR via an ordered
    prefix-product window, matching the engine's sequential fold."""
    import shutil
    import tempfile

    from ics_search_engine_spark.operators.packed_index import (
        PackedIndex,
        build_packed_index,
    )
    from ics_search_engine_spark.operators.rankeval import rank_eval

    docs = _docs(spark, sf_dir)
    transcripts = docs.select(
        F.format_string("doc%08d", F.col("doc_id")).alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.col("text"),
    )
    key = F.format_string("doc%08d", F.col("doc_id")).alias("conv_id")
    rat1 = docs.filter(F.col("doc_id") % 5 == 0).select(
        F.lit("r1").alias("query_id"), key,
        F.lit(0).cast("int").alias("turn_idx"),
        (1 + F.col("doc_id") % 3).cast("int").alias("rating"),
    )
    rat2 = docs.filter(F.col("doc_id") % 4 == 0).select(
        F.lit("r2").alias("query_id"), key,
        F.lit(0).cast("int").alias("turn_idx"),
        (1 + F.col("doc_id") % 2).cast("int").alias("rating"),
    )
    out = tempfile.mkdtemp(prefix="gate_rankeval_idx_")
    try:
        build_packed_index(
            spark, transcripts, out, range_bits=8, with_positions=False,
            stem=False,
        )
        pidx = PackedIndex(spark, out)
        res = rank_eval(
            spark, pidx,
            {"r1": "spark stream", "r2": "window join"},
            rat1.unionByName(rat2), k=10, max_relevance=3,
        ).collect()
    finally:
        shutil.rmtree(out, ignore_errors=True)
    return (
        spark.createDataFrame(
            res,
            "query_id string, precision double, recall double,"
            " mrr double, dcg double, ndcg double, err double,"
            " n_unrated int",
        )
        .select(
            "query_id",
            F.round("precision", 6).alias("precision_r6"),
            F.round("recall", 6).alias("recall_r6"),
            F.round("mrr", 6).alias("mrr_r6"),
            F.round("dcg", 6).alias("dcg_r6"),
            F.round("ndcg", 6).alias("ndcg_r6"),
            F.round("err", 6).alias("err_r6"),
            "n_unrated",
        )
        .orderBy("query_id")
    )


def _sql_rank_eval_leg(qid: str, terms: str, rat_where: str,
                       rat_expr: str) -> str:
    """One request's ranking + metric legs of the rank_eval oracle.
    ERR uses a product() prefix window over ranks 1..r-1 — the same
    ascending sequential order as the engine's fold."""
    return f"""
posts_{qid} AS (
  SELECT term, doc_id, count(*) AS tf, any_value(dl) AS dl FROM u
  WHERE term IN ({terms}) GROUP BY term, doc_id
),
dfs_{qid} AS (SELECT term, count(*) AS df FROM posts_{qid} GROUP BY term),
scored_{qid} AS (
  SELECT p.doc_id,
         ln((s.n - d.df + 0.5) / (d.df + 0.5) + 1.0)
         * (p.tf * 2.2 / (p.tf + 1.2 * (0.25 + 0.75 * p.dl / s.avgdl)))
         AS contrib
  FROM posts_{qid} p JOIN dfs_{qid} d USING (term) CROSS JOIN stats s
),
rank_{qid} AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY sum(contrib) DESC, doc_id ASC)
           AS rnk
  FROM scored_{qid} GROUP BY doc_id QUALIFY rnk <= 10
),
rat_{qid} AS (
  SELECT doc_id, ({rat_expr})::DOUBLE AS rating FROM documents
  WHERE {rat_where}
),
j_{qid} AS (
  SELECT r.rnk, coalesce(t.rating, 0) AS rating,
         t.rating IS NULL AS unrated
  FROM rank_{qid} r LEFT JOIN rat_{qid} t USING (doc_id)
),
errt_{qid} AS (
  SELECT rnk, (pow(2.0, rating) - 1.0) / 8.0 AS rr,
         coalesce(product(1.0 - (pow(2.0, rating) - 1.0) / 8.0)
                  OVER (ORDER BY rnk
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING), 1.0) AS pprod
  FROM j_{qid}
),
ideal_{qid} AS (
  SELECT rating,
         row_number() OVER (ORDER BY rating DESC, doc_id ASC) AS irank
  FROM rat_{qid}
),
m_{qid} AS (
  SELECT
    (SELECT count(*) FROM j_{qid}) AS retrieved,
    (SELECT count(*) FROM j_{qid} WHERE rating >= 1) AS rel_ret,
    (SELECT min(rnk) FROM j_{qid} WHERE rating >= 1) AS first_rel,
    (SELECT coalesce(sum((pow(2.0, rating) - 1.0) / log2(rnk + 1)), 0)
     FROM j_{qid}) AS dcg,
    (SELECT count(*) FROM j_{qid} WHERE unrated) AS n_unrated,
    (SELECT coalesce(sum(rr / rnk * pprod), 0) FROM errt_{qid}) AS err,
    (SELECT count(*) FROM rat_{qid} WHERE rating >= 1) AS n_rel,
    (SELECT coalesce(sum((pow(2.0, rating) - 1.0) / log2(irank + 1)), 0)
     FROM ideal_{qid} WHERE irank <= 10) AS idcg
)"""


def _sql_rank_eval_row(qid: str) -> str:
    return f"""
SELECT '{qid}' AS query_id,
       round(CASE WHEN retrieved > 0
             THEN rel_ret::DOUBLE / retrieved ELSE 0 END, 6)
         AS precision_r6,
       round(CASE WHEN n_rel > 0
             THEN rel_ret::DOUBLE / n_rel ELSE 0 END, 6) AS recall_r6,
       round(coalesce(1.0 / first_rel, 0), 6) AS mrr_r6,
       round(dcg, 6) AS dcg_r6,
       round(CASE WHEN idcg > 0 THEN dcg / idcg ELSE 0 END, 6)
         AS ndcg_r6,
       round(err, 6) AS err_r6,
       n_unrated::INT AS n_unrated
FROM m_{qid}"""


_SQL_RANK_EVAL_ENGINE = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
stats AS (SELECT count(*)::DOUBLE AS n, avg(len(toks)) AS avgdl FROM t),
u AS (SELECT doc_id, len(toks) AS dl, unnest(toks) AS term FROM t),
{_sql_rank_eval_leg("r1", "'spark','stream'", "doc_id % 5 = 0",
                    "1 + doc_id % 3")},
{_sql_rank_eval_leg("r2", "'window','join'", "doc_id % 4 = 0",
                    "1 + doc_id % 2")}
{_sql_rank_eval_row("r1")}
UNION ALL
{_sql_rank_eval_row("r2")}
ORDER BY query_id
"""


def q_bigram_nll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram LM perplexity filter (operators/textstats.
    bigram_logprob): per-doc mean NLL under the corpus's own
    Laplace-smoothed bigram model — P(w2|w1) = (c12+1)/(c1+V), doc's
    first token under the unigram model.  The order-2 sibling of
    unigram_nll: rare TRANSITIONS score high even when the vocabulary
    is common (shuffled/boilerplate text)."""
    from ics_search_engine_spark.operators.textstats import bigram_logprob

    return bigram_logprob(_docs(spark, sf_dir)).orderBy("doc_id")


_SQL_BIGRAM_NLL = f"""
WITH d0 AS (SELECT doc_id, {_SQL_TOKS0} AS toks FROM documents),
d AS (SELECT * FROM d0 WHERE len(toks) > 0),
t AS (SELECT doc_id, unnest(toks) AS term FROM d),
m AS (SELECT term, count(*) AS tf FROM t GROUP BY term),
consts AS (SELECT sum(tf)::DOUBLE AS n, count(*)::DOUBLE AS v FROM m),
pairs AS (
  SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2 FROM (
    SELECT doc_id, toks, unnest(range(1, len(toks))) AS i FROM d
  )
),
bm AS (SELECT w1, w2, count(*) AS c12 FROM pairs GROUP BY w1, w2),
bi AS (
  SELECT p.doc_id, -ln((bm.c12 + 1.0) / (m.tf + 1.0 * c.v)) AS nll
  FROM pairs p JOIN bm USING (w1, w2) JOIN m ON m.term = p.w1
  CROSS JOIN consts c
),
fst AS (
  SELECT d.doc_id, -ln(m.tf / c.n) AS nll
  FROM d JOIN m ON m.term = toks[1] CROSS JOIN consts c
),
u AS (SELECT * FROM bi UNION ALL SELECT * FROM fst)
SELECT doc_id, count(*) AS n_tokens, round(avg(nll), 6) AS mean_nll_r6
FROM u GROUP BY doc_id ORDER BY doc_id
"""


def q_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights (operators/datapipe.dsir_log_weights,
    Xie et al. 2023 hashed-n-gram importance resampling): every raw
    doc scored by Σ [ln p_target(bucket) − ln p_raw(bucket)] over its
    hashed unigram+bigram features — target = the corpus's English
    slice, so en-looking docs weigh high.  512 buckets force real
    hash collisions through both engines' identical md5_32 % B."""
    from ics_search_engine_spark.operators.datapipe import (
        dsir_log_weights,
    )

    docs = _docs(spark, sf_dir)
    return dsir_log_weights(
        docs, docs.filter(F.col("lang") == "en"), n_buckets=512
    ).orderBy("doc_id")


_SQL_DSIR = f"""
WITH raw0 AS (SELECT doc_id, lang, {_SQL_TOKS0} AS toks FROM documents),
raw AS (SELECT * FROM raw0 WHERE len(toks) > 0),
tgt AS (SELECT * FROM raw WHERE lang = 'en'),
rfe AS (
  SELECT doc_id, ('0x' || substr(md5(f), 1, 8))::BIGINT % 512 AS bucket
  FROM (
    SELECT doc_id, unnest(toks) AS f FROM raw
    UNION ALL
    SELECT doc_id, toks[i] || ' ' || toks[i + 1] AS f FROM (
      SELECT doc_id, toks, unnest(range(1, len(toks))) AS i FROM raw)
  )
),
tfe AS (
  SELECT ('0x' || substr(md5(f), 1, 8))::BIGINT % 512 AS bucket
  FROM (
    SELECT unnest(toks) AS f FROM tgt
    UNION ALL
    SELECT toks[i] || ' ' || toks[i + 1] AS f FROM (
      SELECT toks, unnest(range(1, len(toks))) AS i FROM tgt)
  )
),
rm AS (SELECT bucket, count(*) AS c FROM rfe GROUP BY bucket),
rn AS (SELECT sum(c)::DOUBLE AS n FROM rm),
tm AS (SELECT bucket, count(*) AS c FROM tfe GROUP BY bucket),
tn AS (SELECT count(*)::DOUBLE AS n FROM tfe),
scored AS (
  SELECT r.doc_id,
         coalesce(ln((tm.c + 1.0) / (tn.n + 512.0)),
                  ln(1.0 / (tn.n + 512.0)))
         - ln((rm.c + 1.0) / (rn.n + 512.0)) AS llr
  FROM rfe r
  JOIN rm USING (bucket)
  LEFT JOIN tm USING (bucket)
  CROSS JOIN rn CROSS JOIN tn
)
SELECT doc_id, count(*) AS n_feats, round(sum(llr), 6) AS log_weight_r6
FROM scored GROUP BY doc_id ORDER BY doc_id
"""


def q_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR selection step (operators/datapipe.dsir_select): Gumbel
    top-k over the importance weights — sample-without-replacement
    with probability proportional to exp(log_weight), the Gumbel noise a
    deterministic md5 uniform so both engines draw the same sample.
    Cut on the ROUNDED key (rounded-order convention); plan is a
    TakeOrderedAndProject."""
    from ics_search_engine_spark.operators.datapipe import (
        dsir_log_weights,
        dsir_select,
    )

    docs = _docs(spark, sf_dir)
    w = dsir_log_weights(
        docs, docs.filter(F.col("lang") == "en"), n_buckets=512
    )
    return dsir_select(w, k=25).orderBy(
        F.desc("gumbel_key_r6"), F.asc("doc_id")
    )


_SQL_DSIR_SELECT = f"""
WITH w AS ({_SQL_DSIR})
SELECT doc_id, n_feats, log_weight_r6,
       round(log_weight_r6 - ln(-ln(
         (('0x' || substr(md5(doc_id::VARCHAR || '#dsir0'), 1, 8))::BIGINT
          + 0.5) / 4294967296.0)), 6) AS gumbel_key_r6
FROM w ORDER BY gumbel_key_r6 DESC, doc_id ASC LIMIT 25
"""


def q_mix_sources_epochs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Budgeted mixing with upsampling (operators/datapipe.
    mix_sources_budget): 2:1 de:zh at a 300-row budget — both sides
    upsample across epochs, the fractional epoch chosen by hash
    rank."""
    from ics_search_engine_spark.operators.datapipe import (
        mix_sources_budget,
    )

    return (
        mix_sources_budget(
            _docs(spark, sf_dir), "lang", {"de": 2, "zh": 1}, "doc_id", 300
        )
        .select("doc_id", "lang", "epoch")
        .orderBy("doc_id", "epoch")
    )


_SQL_MIX_SOURCES_EPOCHS = f"""
WITH c AS (
  SELECT lang, count(*) AS n FROM documents
  WHERE lang IN ('de', 'zh') GROUP BY lang
),
p AS (
  SELECT lang, n,
         (CASE lang WHEN 'de' THEN 2 WHEN 'zh' THEN 1 END) * 100 AS take
  FROM c
),
r AS (
  SELECT doc_id, lang,
         row_number() OVER (
           PARTITION BY lang
           ORDER BY {_sql_md5_32("doc_id::VARCHAR")}, doc_id) AS rk
  FROM documents WHERE lang IN ('de', 'zh')
),
j AS (
  SELECT r.doc_id, r.lang,
         p.take // p.n AS fe, p.take % p.n AS rem, r.rk
  FROM r JOIN p USING (lang)
)
SELECT doc_id, lang,
       unnest(range(0, fe + CASE WHEN rk <= rem THEN 1 ELSE 0 END)) AS epoch
FROM j ORDER BY doc_id, epoch
"""


def q_pack_bins_ffd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-fit-decreasing bin packing (operators/datapipe.pack_bins):
    whole-document training bins at capacity 256 over 8 hash buckets.
    FFD is not SQL-expressible, so no oracle — the driver's rows-only
    check plus the pytest invariants (capacity respected, determinism,
    fill >= sequential packing) carry correctness."""
    from ics_search_engine_spark.operators.datapipe import pack_bins

    docs = _docs(spark, sf_dir).select(
        "doc_id", F.size(toks_col()).alias("n_tokens")
    )
    return (
        pack_bins(docs, capacity=256, n_buckets=8)
        .groupBy("bucket", "bin_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.max(F.col("oversize").cast("int")).alias("has_oversize"),
        )
        .orderBy("bin_id")
    )


def q_dedup_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style global line dedup (operators/dedup.dedup_lines_corpus):
    docs recast as 3-line texts (source / lang / text prefix) so
    cross-document duplicate lines abound; first occurrence by
    (doc_id, line_idx) wins, documents reassemble from survivors."""
    from ics_search_engine_spark.operators.dedup import dedup_lines_corpus

    docs = _docs(spark, sf_dir).select(
        "doc_id",
        F.concat_ws(
            "\n", F.col("source"), F.col("lang"), F.substring("text", 1, 80)
        ).alias("text"),
    )
    return dedup_lines_corpus(docs).orderBy("doc_id")


_SQL_DEDUP_LINES = """
WITH d AS (
  SELECT doc_id,
         string_split(source || chr(10) || lang || chr(10)
                      || substr(text, 1, 80), chr(10)) AS ls
  FROM documents
),
l AS (
  SELECT doc_id, i, ls FROM (
    SELECT doc_id, ls, unnest(range(1, len(ls) + 1)) AS i FROM d)
),
x AS (
  SELECT doc_id, i - 1 AS line_idx, ls[i] AS line FROM l
  WHERE length(ls[i]) > 0
),
k AS (
  SELECT doc_id, line_idx, line,
         row_number() OVER (PARTITION BY md5(line)
                            ORDER BY doc_id, line_idx) = 1 AS keep
  FROM x
)
SELECT doc_id, count(*) AS n_lines,
       sum(CASE WHEN keep THEN 1 ELSE 0 END) AS n_lines_kept,
       coalesce(string_agg(CASE WHEN keep THEN line END, chr(10)
                           ORDER BY line_idx), '') AS text_clean
FROM k GROUP BY doc_id ORDER BY doc_id
"""


def q_scrub_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing (operators/textstats.scrub_pii): per-category
    counts + tagged replacement over docs salted with one email and
    one IPv4 each (the base corpus is PII-free, so the salt makes the
    parity non-trivial; zero counts for secret/phone are part of it).
    """
    from ics_search_engine_spark.operators.textstats import scrub_pii

    docs = _docs(spark, sf_dir).select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id"),
            F.lit("@example.com from 10.0."),
            F.col("doc_id") % 256,
            F.lit(".7"),
        ).alias("text"),
    )
    return scrub_pii(docs).select(
        "doc_id", "n_email", "n_ip", "n_secret", "n_phone", "text_clean"
    ).orderBy("doc_id")


_SQL_SCRUB_PII = r"""
WITH d AS (
  SELECT doc_id,
         text || ' contact user' || doc_id || '@example.com from 10.0.'
              || (doc_id % 256) || '.7' AS t
  FROM documents
)
SELECT doc_id,
  len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
    AS n_email,
  len(regexp_extract_all(t, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b'))
    AS n_ip,
  len(regexp_extract_all(t, '\b[0-9a-f]{32,}\b')) AS n_secret,
  len(regexp_extract_all(t, '\+\d{9,15}\b')) AS n_phone,
  regexp_replace(
    regexp_replace(
      regexp_replace(
        regexp_replace(t,
          '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
      '\b[0-9a-f]{32,}\b', '<SECRET>', 'g'),
    '\+\d{9,15}\b', '<PHONE>', 'g') AS text_clean
FROM d ORDER BY doc_id
"""


# fixed deterministic weights for the classifier-scoring gate — the
# SAME list renders into the Spark plan and the SQL literal
_CLF_DIM = 64
_CLF_W = [((i * 37) % 21 - 10) / 10.0 for i in range(_CLF_DIM)]
_CLF_B = -0.05


def q_classifier_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fastText-style hashed-feature quality scoring (operators/
    classifier.score_quality): sigmoid(w·x + b) folded over the token
    array in one codegen'd projection — gated with a FIXED weight
    vector so DuckDB replays the whole distributed scoring path
    (the fit is pytest-pinned: deterministic, capped collect)."""
    from ics_search_engine_spark.operators.classifier import score_quality

    return score_quality(_docs(spark, sf_dir), _CLF_W, _CLF_B).orderBy(
        "doc_id"
    )


_SQL_CLASSIFIER_SCORE = f"""
WITH w AS (SELECT [{", ".join(str(x) for x in _CLF_W)}]::DOUBLE[] AS wv),
t AS (SELECT doc_id, {_SQL_TOKS0} AS toks FROM documents)
SELECT doc_id,
  round(1.0 / (1.0 + exp(-(
    CASE WHEN len(toks) > 0 THEN
      list_sum(list_transform(toks,
        x -> wv[((('0x' || substr(md5(x), 1, 8))::BIGINT % {_CLF_DIM}) + 1)::INT]))
      / len(toks)
    ELSE 0.0 END + ({_CLF_B})))), 6) AS score_r6
FROM t, w ORDER BY doc_id
"""


def q_esql_fork_fuse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES|QL FORK/FUSE (operators/esql._cmd_fork/_cmd_fuse): two
    branch sub-pipes over events, rrf-combined by event_id — the
    9.x branch-and-fuse verbs as one Catalyst plan."""
    from ics_search_engine_spark.operators.esql import esql_query

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    pipe = """FROM events
| FORK ( WHERE event_type == "view" | SORT value DESC, event_id ASC | LIMIT 20 )
       ( WHERE value > 30 | SORT value DESC, event_id ASC | LIMIT 20 )
| FUSE event_id BY value"""
    fused = esql_query(spark, pipe, {"events": ev})
    return (
        fused.select(
            "event_id",
            F.round("fused", 9).alias("fused_r9"),
            "n_forks",
        )
        .orderBy(F.desc("fused_r9"), F.asc("event_id"))
        .limit(12)
    )


_SQL_ESQL_FORK_FUSE = """
WITH l1 AS (SELECT event_id, value FROM events WHERE event_type = 'view'
            ORDER BY value DESC, event_id ASC LIMIT 20),
l2 AS (SELECT event_id, value FROM events WHERE value > 30
       ORDER BY value DESC, event_id ASC LIMIT 20),
r1 AS (SELECT event_id, row_number()
         OVER (ORDER BY value DESC, event_id ASC) AS r FROM l1),
r2 AS (SELECT event_id, row_number()
         OVER (ORDER BY value DESC, event_id ASC) AS r FROM l2),
u AS (SELECT event_id, r FROM r1 UNION ALL SELECT event_id, r FROM r2)
SELECT event_id, round(sum(1.0 / (60.0 + r)), 9) AS fused_r9,
       count(*) AS n_forks
FROM u GROUP BY event_id
ORDER BY fused_r9 DESC, event_id ASC LIMIT 12
"""


_SPLIT_TEST_FRAC = 0.04


def q_decontaminated_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contamination-safe train/test split (operators/dedup.
    decontaminated_split): hash-rate test assignment, then every
    train doc sharing >= 3 distinct trigram shingles with any test
    doc is dropped before the split frame is returned."""
    from ics_search_engine_spark.operators.dedup import (
        decontaminated_split,
    )

    return (
        decontaminated_split(
            _docs(spark, sf_dir), test_frac=_SPLIT_TEST_FRAC,
            n=3, min_shared=3,
        )
        .select("doc_id", "split")
        .orderBy("doc_id")
    )


_SQL_DECONTAMINATED_SPLIT = f"""
WITH s AS (
  SELECT doc_id, text,
         {_sql_md5_32("doc_id::VARCHAR")}
           < {int(_SPLIT_TEST_FRAC * (1 << 32))} AS is_test
  FROM documents
),
t AS (SELECT doc_id, is_test, {_SQL_TOKS} AS toks FROM s),
g AS (
  SELECT doc_id, is_test,
         unnest(list_distinct(list_transform(
           range(1, len(toks) - 1),
           i -> {_sql_md5_32("toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]")}
         ))) AS h
  FROM t WHERE len(toks) >= 3
),
cont AS (
  SELECT d.doc_id FROM g d
  JOIN (SELECT doc_id, h FROM g WHERE is_test) b ON d.h = b.h
  WHERE NOT d.is_test
  GROUP BY d.doc_id, b.doc_id HAVING count(*) >= 3
)
SELECT doc_id, CASE WHEN is_test THEN 'test' ELSE 'train' END AS split
FROM s
WHERE is_test OR doc_id NOT IN (SELECT DISTINCT doc_id FROM cont)
ORDER BY doc_id
"""


def q_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (operators/similarity.semdedup): embedding-space
    near-dup removal within clusters.  The base table has no natural
    near-dups (max in-cell cosine 0.44), so the gate salts it with
    exact copies of a 1-in-25 slice under ids +10000 (same id%8 cell
    by construction) — every copy must drop, every original survive.
    The gate pins the pair-join + min-id-keeper logic with a
    deterministic cell; semantic-cluster quality is pytest territory."""
    from ics_search_engine_spark.operators.similarity import semdedup

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    extra = emb.filter(F.col("vec_id") % 25 == 0).select(
        (F.col("vec_id") + 10000).alias("vec_id"), "embedding"
    )
    salted = emb.unionByName(extra).withColumn(
        "cell", (F.col("vec_id") % 8).cast("int")
    )
    return (
        semdedup(salted, threshold=0.9, cell_col="cell")
        .select("vec_id")
        .orderBy("vec_id")
    )


_SQL_SEMDEDUP = """
WITH base AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
  UNION ALL
  SELECT vec_id + 10000 AS vec_id, embedding::DOUBLE[] AS v
  FROM embeddings WHERE vec_id % 25 = 0
),
e AS (SELECT vec_id, v, (vec_id % 8)::INT AS c FROM base),
losers AS (
  SELECT DISTINCT b.vec_id FROM e a JOIN e b
    ON a.c = b.c AND a.vec_id < b.vec_id
  WHERE round(list_dot_product(a.v, b.v)
              / (sqrt(list_dot_product(a.v, a.v))
                 * sqrt(list_dot_product(b.v, b.v))), 9) >= 0.9
)
SELECT vec_id FROM e
WHERE vec_id NOT IN (SELECT vec_id FROM losers)
ORDER BY vec_id
"""


def q_corpus_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-card summary (operators/textstats.corpus_report): the
    one-row corpus release numbers, exact-dup-rate variant for oracle
    parity (the approx form is the 10^12-row default)."""
    from ics_search_engine_spark.operators.textstats import corpus_report

    return corpus_report(_docs(spark, sf_dir), exact_dup_rate=True)


_SQL_CORPUS_REPORT = r"""
SELECT count(*) AS n_docs,
       sum(len(regexp_extract_all(text, '\S+'))) AS total_ws_tokens,
       round(avg(len(regexp_extract_all(text, '\S+'))), 6)
         AS mean_ws_tokens_r6,
       min(len(regexp_extract_all(text, '\S+'))) AS min_ws_tokens,
       max(len(regexp_extract_all(text, '\S+'))) AS max_ws_tokens,
       round(1.0 - count(DISTINCT md5(text)) / count(*)::DOUBLE, 4)
         AS dup_rate_r4,
       count(DISTINCT lang) AS n_langs,
       count(DISTINCT source) AS n_sources
FROM documents
"""


def q_script_ratios(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Writing-script composition (operators/textstats.script_ratios):
    per-doc Latin/CJK/Cyrillic/Arabic/digit char fractions.  The base
    corpus is all-Latin, so every 7th doc is salted with CJK text to
    make the unicode-range parity non-trivial."""
    from ics_search_engine_spark.operators.textstats import script_ratios

    docs = _docs(spark, sf_dir).select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(F.col("doc_id") % 7 == 0, F.lit(" 机器学习很有用"))
            .otherwise(F.lit("")),
        ).alias("text"),
    )
    return script_ratios(docs).orderBy("doc_id")


_SQL_SCRIPT_RATIOS = r"""
WITH d AS (
  SELECT doc_id,
         regexp_replace(text || CASE WHEN doc_id % 7 = 0
                        THEN ' 机器学习很有用' ELSE '' END,
                        '\s', '', 'g') AS t
  FROM documents
)
SELECT doc_id, length(t) AS n_chars_nospace,
  round(CASE WHEN length(t) > 0 THEN
    length(regexp_replace(t, '[^A-Za-z]', '', 'g'))::DOUBLE / length(t)
    ELSE 0 END, 6) AS latin_r6,
  round(CASE WHEN length(t) > 0 THEN
    length(regexp_replace(t, '[^一-鿿]', '', 'g'))::DOUBLE / length(t)
    ELSE 0 END, 6) AS cjk_r6,
  round(CASE WHEN length(t) > 0 THEN
    length(regexp_replace(t, '[^Ѐ-ӿ]', '', 'g'))::DOUBLE / length(t)
    ELSE 0 END, 6) AS cyrillic_r6,
  round(CASE WHEN length(t) > 0 THEN
    length(regexp_replace(t, '[^؀-ۿ]', '', 'g'))::DOUBLE / length(t)
    ELSE 0 END, 6) AS arabic_r6,
  round(CASE WHEN length(t) > 0 THEN
    length(regexp_replace(t, '[^0-9]', '', 'g'))::DOUBLE / length(t)
    ELSE 0 END, 6) AS digit_r6
FROM d ORDER BY doc_id
"""


def q_eql_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EQL text frontend (operators/eql.eql_text_query): the same
    view->click->purchase funnel as gate eql_sequence, but parsed from
    EQL text — so it shares that gate's generated SQL oracle."""
    from ics_search_engine_spark.operators.eql import eql_text_query

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return eql_text_query(
        ev,
        "sequence by user_id with maxspan=21600s [view] [click] [purchase]",
    )


def q_retriever_tree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES retriever-tree API (operators/hybrid.retriever_topk): a
    NESTED tree — rrf(linear([bm25, cosine], 0.7/0.3, window 30),
    bm25, window 40) — every child bounded to its rank window before
    fusion, fused scores rounded before ranks so the oracle's rank
    boundaries agree."""
    from ics_search_engine_spark.operators.hybrid import (
        Leg,
        LinearRetriever,
        RrfRetriever,
        retriever_topk,
    )

    bm = Leg(_bm25_leg(spark, sf_dir, 50), "bm25_r6")
    cs = Leg(_cosine_leg(spark, sf_dir, 50), "cosine_r6")
    inner = LinearRetriever([bm, cs], weights=[0.7, 0.3],
                            rank_window_size=30)
    tree = RrfRetriever([inner, bm], rank_constant=60,
                        rank_window_size=40)
    return retriever_topk(tree, k=15)


_SQL_RETRIEVER_TREE = _SQL_HYBRID_LEGS + """
, bmw AS (SELECT doc_id, bm25_r6 FROM bm WHERE r <= 30),
csw AS (SELECT doc_id, cosine_r6 FROM cs WHERE r <= 30),
bmx AS (SELECT min(bm25_r6) AS mn, max(bm25_r6) AS mx FROM bmw),
csx AS (SELECT min(cosine_r6) AS mn, max(cosine_r6) AS mx FROM csw),
bmn AS (SELECT doc_id, CASE WHEN bmx.mx = bmx.mn THEN 1.0
          ELSE (bm25_r6 - bmx.mn) / (bmx.mx - bmx.mn) END AS n0
        FROM bmw, bmx),
csn AS (SELECT doc_id, CASE WHEN csx.mx = csx.mn THEN 1.0
          ELSE (cosine_r6 - csx.mn) / (csx.mx - csx.mn) END AS n1
        FROM csw, csx),
lin AS (SELECT coalesce(bmn.doc_id, csn.doc_id) AS doc_id,
               round(coalesce(n0 * 0.7, 0.0) + coalesce(n1 * 0.3, 0.0), 9)
                 AS score
        FROM bmn FULL OUTER JOIN csn ON bmn.doc_id = csn.doc_id),
linr AS (SELECT doc_id,
                row_number() OVER (ORDER BY score DESC, doc_id ASC) AS r
         FROM lin),
c1 AS (SELECT doc_id, r FROM linr WHERE r <= 40),
c2 AS (SELECT doc_id, r FROM bm WHERE r <= 40),
f AS (SELECT coalesce(c1.doc_id, c2.doc_id) AS doc_id,
             round(coalesce(1.0 / (60.0 + c1.r), 0.0)
                   + coalesce(1.0 / (60.0 + c2.r), 0.0), 9) AS score
      FROM c1 FULL OUTER JOIN c2 ON c1.doc_id = c2.doc_id)
SELECT doc_id, score FROM f ORDER BY score DESC, doc_id ASC LIMIT 15
"""


def q_esql_inlinestats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES|QL INLINESTATS (operators/esql._cmd_inlinestats): join the
    per-user average back to every event, keep rows above it, count
    by type — one window exchange, no self-join."""
    from ics_search_engine_spark.operators.esql import esql_query

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    pipe = """FROM events
| INLINESTATS user_avg = AVG(value) BY user_id
| WHERE value > user_avg
| STATS n = COUNT(*) BY event_type
| SORT event_type ASC"""
    return esql_query(spark, pipe, {"events": ev})


_SQL_ESQL_INLINESTATS = """
WITH t AS (
  SELECT event_type, value,
         avg(value) OVER (PARTITION BY user_id) AS user_avg
  FROM events
)
SELECT event_type, count(*) AS n FROM t
WHERE value > user_avg
GROUP BY event_type ORDER BY event_type ASC
"""


def q_esql_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES|QL LOOKUP JOIN (operators/esql._cmd_lookup_join): documents
    against a per-language dimension (built from the same table), the
    lookup side broadcast."""
    from ics_search_engine_spark.operators.esql import esql_query

    docs = _docs(spark, sf_dir)
    dim = docs.groupBy("lang").agg(F.count("*").alias("lang_docs"))
    pipe = """FROM documents
| LOOKUP JOIN lang_dim ON lang
| WHERE n_chars > 200
| STATS n = COUNT(*), lang_docs = MAX(lang_docs) BY lang
| SORT lang ASC"""
    return esql_query(spark, pipe, {"documents": docs, "lang_dim": dim})


_SQL_ESQL_LOOKUP = """
WITH dim AS (SELECT lang, count(*) AS lang_docs FROM documents GROUP BY lang)
SELECT d.lang AS lang, count(*) AS n, max(dim.lang_docs) AS lang_docs
FROM documents d LEFT JOIN dim ON d.lang = dim.lang
WHERE d.n_chars > 200
GROUP BY d.lang ORDER BY d.lang ASC
"""


def q_esql_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES|QL SAMPLE, deterministic BY form (operators/esql.
    _cmd_sample): md5-threshold row sampling — the datapipe sampling
    convention, reproducible in the oracle."""
    from ics_search_engine_spark.operators.esql import esql_query

    docs = _docs(spark, sf_dir)
    pipe = """FROM documents
| SAMPLE 0.3 BY doc_id
| STATS n = COUNT(*) BY lang
| SORT lang ASC"""
    return esql_query(spark, pipe, {"documents": docs})


_SQL_ESQL_SAMPLE = f"""
SELECT lang, count(*) AS n FROM documents
WHERE {_sql_md5_32("doc_id::VARCHAR")} < {int(0.3 * (1 << 32))}
GROUP BY lang ORDER BY lang ASC
"""


def q_esql_change_point(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES|QL CHANGE_POINT command (operators/esql._cmd_change_point):
    the hourly-count series built and analyzed in one pipe; shares
    the change_point kernel, so the agg gate's oracle applies."""
    from ics_search_engine_spark.operators.esql import esql_query

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    pipe = """FROM events
| EVAL hour = DATE_TRUNC(1 hour, ts)
| STATS n_events = COUNT(*) BY hour
| CHANGE_POINT n_events ON hour"""
    return esql_query(spark, pipe, {"events": ev})


def q_pack_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing (operators/datapipe.
    pack_sequences): the corpus as one token stream in doc_id order,
    cut into 512-token training windows; per-window packing report.
    The global prefix-sum is the docmap two-phase shape — one range
    shuffle, O(partitions) driver longs, NO single-partition window."""
    from ics_search_engine_spark.operators.datapipe import (
        chunk_stats,
        pack_sequences,
    )

    docs = _docs(spark, sf_dir).select(
        "doc_id", F.size(toks_col()).alias("n_tokens")
    )
    packed = pack_sequences(docs, capacity=512)
    return chunk_stats(packed, capacity=512).orderBy("chunk_id")


_SQL_PACK_CHUNKS = f"""
WITH t AS (SELECT doc_id, len({_SQL_TOKS}) AS n FROM documents),
o AS (SELECT doc_id, n, sum(n) OVER (ORDER BY doc_id) - n AS off FROM t),
p AS (SELECT off // 512 AS chunk_id, n,
             CASE WHEN off % 512 + n > 512 THEN 1 ELSE 0 END AS sp
      FROM o)
SELECT chunk_id, count(*) AS n_docs, sum(n) AS n_tokens,
       sum(sp) AS n_spanning, round(sum(n) / 512.0, 6) AS fill_r6
FROM p GROUP BY chunk_id ORDER BY chunk_id
"""


# per-stratum sampling rates for the gate; thresholds derive from the
# SAME int(frac * 2^32) expression on both sides
_SAMPLE_FRACS = {"en": 0.5, "de": 0.25, "fr": 0.1}


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-rate stratified sampling (operators/datapipe.
    stratified_sample): per-language keep rates, md5-threshold
    decision — a single Filter, no shuffle; a row's fate is stable
    under corpus growth."""
    from ics_search_engine_spark.operators.datapipe import stratified_sample

    return (
        stratified_sample(
            _docs(spark, sf_dir), "doc_id", _SAMPLE_FRACS, strata_col="lang"
        )
        .select("doc_id", "lang")
        .orderBy("doc_id")
    )


_SQL_STRATIFIED_SAMPLE = f"""
SELECT doc_id, lang FROM documents
WHERE {_sql_md5_32("doc_id::VARCHAR")} < CASE lang
    WHEN 'de' THEN {int(_SAMPLE_FRACS["de"] * (1 << 32))}
    WHEN 'en' THEN {int(_SAMPLE_FRACS["en"] * (1 << 32))}
    WHEN 'fr' THEN {int(_SAMPLE_FRACS["fr"] * (1 << 32))}
    ELSE 0 END
ORDER BY doc_id
"""


def q_mix_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-proportion data mixing (operators/datapipe.mix_sources):
    downsample to a 3:1 en:de mix, as large as the scarcest side
    allows — integer-ratio math, deterministic hash-rank selection."""
    from ics_search_engine_spark.operators.datapipe import mix_sources

    return (
        mix_sources(_docs(spark, sf_dir), "lang", {"en": 3, "de": 1}, "doc_id")
        .select("doc_id", "lang")
        .orderBy("doc_id")
    )


_SQL_MIX_SOURCES = f"""
WITH c AS (
  SELECT lang, count(*) AS n,
         CASE lang WHEN 'en' THEN 3 WHEN 'de' THEN 1 END AS p
  FROM documents WHERE lang IN ('en', 'de') GROUP BY lang
),
u AS (SELECT min(n // p) AS u FROM c),
r AS (
  SELECT doc_id, lang,
         row_number() OVER (
           PARTITION BY lang
           ORDER BY {_sql_md5_32("doc_id::VARCHAR")}, doc_id) AS rk
  FROM documents WHERE lang IN ('en', 'de')
)
SELECT doc_id, lang FROM r, u
WHERE rk <= (CASE lang WHEN 'en' THEN 3 WHEN 'de' THEN 1 END) * u.u
ORDER BY doc_id
"""


def q_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cleaning-pipeline attrition report (operators/datapipe.
    filter_funnel): three ordered quality gates; each row is charged
    to the FIRST stage it fails.  One projection + one tiny agg."""
    from ics_search_engine_spark.operators.datapipe import filter_funnel

    docs = _docs(spark, sf_dir).withColumn("n_toks", F.size(toks_col()))
    return filter_funnel(
        docs,
        [
            ("min_tokens", F.col("n_toks") >= 10),
            ("known_lang", F.col("lang").isin("en", "de", "es", "fr")),
            ("short_enough", F.col("n_chars") <= 400),
        ],
    ).orderBy("stage_idx")


_SQL_FILTER_FUNNEL = f"""
WITH f AS (
  SELECT CASE
    WHEN NOT (len({_SQL_TOKS}) >= 10) THEN 0
    WHEN NOT (lang IN ('en', 'de', 'es', 'fr')) THEN 1
    WHEN NOT (n_chars <= 400) THEN 2
    ELSE 3 END AS fail
  FROM documents),
d AS (SELECT fail, count(*) AS n FROM f GROUP BY fail),
st AS (SELECT * FROM (VALUES (0, 'min_tokens'), (1, 'known_lang'),
                             (2, 'short_enough')) AS v(stage_idx, stage_name)),
j AS (SELECT st.stage_idx, st.stage_name, coalesce(d.n, 0) AS dropped
      FROM st LEFT JOIN d ON d.fail = st.stage_idx),
k AS (SELECT stage_idx, stage_name, dropped,
        (SELECT count(*) FROM documents)
        - coalesce(sum(dropped) OVER (ORDER BY stage_idx
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_in
      FROM j)
SELECT stage_idx, stage_name, n_in, n_in - dropped AS n_kept,
       dropped AS n_dropped
FROM k ORDER BY stage_idx
"""


def q_near_dup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive dup groups via distributed connected components
    (operators/components.connected_components — alternating
    large-star/small-star, Kiveris et al. SoCC'14).  The gate builds a
    deterministic chain-heavy edge set over doc_ids (runs of ordinal
    neighbors bridged every 31 ids) so the oracle's recursive-CTE
    reachability has real multi-hop components to close; the operator
    itself is property-tested against union-find on random graphs in
    tests/test_components.py."""
    from ics_search_engine_spark.operators.components import assign_components

    ids = _docs(spark, sf_dir).select("doc_id")
    a, b = ids.alias("a"), ids.alias("b")
    run_edges = a.join(
        b,
        (F.col("b.doc_id") == F.col("a.doc_id") + 1)
        & (F.col("a.doc_id") % 7 < 3),
    ).select(F.col("a.doc_id").alias("src"), F.col("b.doc_id").alias("dst"))
    bridge_edges = a.join(
        b,
        (F.col("b.doc_id") == F.col("a.doc_id") + 13)
        & (F.col("a.doc_id") % 31 == 0),
    ).select(F.col("a.doc_id").alias("src"), F.col("b.doc_id").alias("dst"))
    edges = run_edges.unionByName(bridge_edges)
    return (
        assign_components(ids, edges, node_col="doc_id")
        .select("doc_id", "root")
        .orderBy("doc_id")
    )


_SQL_NEAR_DUP_COMPONENTS = """
WITH RECURSIVE
d AS (SELECT doc_id FROM documents),
e0 AS (
  SELECT a.doc_id AS u, b.doc_id AS v
  FROM d a JOIN d b ON b.doc_id = a.doc_id + 1
  WHERE a.doc_id % 7 < 3
  UNION ALL
  SELECT a.doc_id AS u, b.doc_id AS v
  FROM d a JOIN d b ON b.doc_id = a.doc_id + 13
  WHERE a.doc_id % 31 = 0
),
e AS (SELECT u, v FROM e0 UNION SELECT v AS u, u AS v FROM e0),
cc AS (
  SELECT doc_id AS node, doc_id AS root FROM d
  UNION
  SELECT e.v AS node, cc.root FROM cc JOIN e ON e.u = cc.node
)
SELECT node AS doc_id, min(root) AS root
FROM cc GROUP BY node ORDER BY doc_id
"""


def q_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar int8 quantization of the embedding tier
    (operators/similarity.quantize_int8): per-vector symmetric scale =
    max|x|/127, codes = round(x/scale) — pure Catalyst array math, the
    Lucene/faiss SQ8 scheme.  Exact transform, exact oracle.  Codes
    emit as a comma-joined string — gate outputs must be atomic (the
    driver's pandas canonicalizer can't sort list columns)."""
    from ics_search_engine_spark.operators.similarity import quantize_int8

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return (
        quantize_int8(emb)
        .select(
            "vec_id",
            "q_scale",
            F.concat_ws(
                ",", F.transform("q_codes", lambda x: x.cast("string"))
            ).alias("q_codes_csv"),
        )
        .orderBy("vec_id")
    )


_SQL_QUANTIZE_INT8 = """
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         list_max(list_transform(embedding::DOUBLE[], x -> abs(x))) AS mx
  FROM embeddings
)
SELECT vec_id,
  CASE WHEN mx > 0 THEN mx / 127.0 ELSE 0.0 END AS q_scale,
  coalesce(array_to_string(list_transform(
    v, x -> CASE WHEN mx > 0 THEN round(x / (mx / 127.0))::TINYINT
                 ELSE 0::TINYINT END), ','), '') AS q_codes_csv
FROM e ORDER BY vec_id
"""


def q_knn_int8_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8-shortlist + exact-rerank kNN (operators/similarity.
    cosine_topk_int8_rerank): with the candidate set covering the
    table, the rerank must reproduce exact brute-force cosine — the
    same oracle as knn_cosine.  Sibling-gate boundary discipline:
    over-fetch the exact superset, cut on rounded order."""
    from ics_search_engine_spark.operators.similarity import (
        cosine_topk_int8_rerank,
        quantize_int8,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    coded = quantize_int8(emb.filter(F.col("vec_id") != 0))
    over = cosine_topk_int8_rerank(
        coded, [float(x) for x in qvec], k=25, n_candidates=10_000
    )
    return (
        over.select("vec_id", F.round(F.col("cosine"), 6).alias("cosine_r6"))
        .orderBy(F.desc("cosine_r6"), F.asc("vec_id"))
        .limit(20)
    )


def q_shuffled_head(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic corpus shuffle (operators/datapipe.
    shuffle_deterministic / shuffled_head): epoch-seeded total order
    by md5(key#seed).  The gate verifies the permutation's prefix —
    head-20 with the order key exposed, a TakeOrderedAndProject."""
    from ics_search_engine_spark.operators.datapipe import shuffled_head

    return shuffled_head(_docs(spark, sf_dir), 20, seed=7)


_SQL_SHUFFLED_HEAD = """
SELECT doc_id, md5(doc_id::VARCHAR || '#' || '7') AS shuffle_key
FROM documents ORDER BY shuffle_key LIMIT 20
"""


def q_curriculum_head(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum ordering (operators/datapipe.curriculum_order):
    easy→hard by fixed-width difficulty bucket (n_chars/50), shuffled
    within buckets by the seeded md5 key.  Head-20 with bucket + key
    exposed verifies the composite order's prefix."""
    from ics_search_engine_spark.operators.datapipe import curriculum_order

    ordered = curriculum_order(
        _docs(spark, sf_dir), "n_chars", bucket_width=50.0, seed=3
    )
    key = F.md5(F.concat_ws("#", F.col("doc_id"), F.lit("3")))
    return (
        ordered.select(
            "doc_id", "difficulty_bucket", key.alias("shuffle_key")
        )
        .orderBy("difficulty_bucket", "shuffle_key")
        .limit(20)
    )


_SQL_CURRICULUM_HEAD = """
SELECT doc_id, floor(n_chars / 50.0)::BIGINT AS difficulty_bucket,
       md5(doc_id::VARCHAR || '#' || '3') AS shuffle_key
FROM documents ORDER BY difficulty_bucket, shuffle_key LIMIT 20
"""


def q_quantize_binary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary (1-bit) quantization (operators/similarity.
    quantize_binary): sign bits packed into 32-bit words — the 32×
    compression rung (ES BBQ / faiss binary design).  Exact packing
    transform, exact oracle (the SQL mirrors the shift-sum per word).
    Codes emit as a comma-joined string — gate outputs must be atomic
    (the driver's pandas canonicalizer can't sort list columns)."""
    from ics_search_engine_spark.operators.similarity import quantize_binary

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return (
        quantize_binary(emb)
        .select(
            "vec_id",
            F.concat_ws(
                ",", F.transform("b_codes", lambda x: x.cast("string"))
            ).alias("b_codes_csv"),
        )
        .orderBy("vec_id")
    )


# testdata embeddings are 64-dim → exactly two 32-bit words
_SQL_QUANTIZE_BINARY = (
    "SELECT vec_id, coalesce(array_to_string(["
    + ", ".join(
        "("
        + " + ".join(
            f"CASE WHEN embedding[{32 * w + j + 1}] > 0"
            f" THEN {1 << j} ELSE 0 END"
            for j in range(32)
        )
        + ")::BIGINT"
        for w in range(2)
    )
    + "], ','), '') AS b_codes_csv FROM embeddings ORDER BY vec_id"
)


def q_knn_binary_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-shortlist + exact-rerank kNN (operators/similarity.
    cosine_topk_binary_rerank): full-table shortlist ⇒ must reproduce
    brute-force cosine — the knn_cosine oracle, same sibling-gate
    boundary discipline as knn_int8_rerank."""
    from ics_search_engine_spark.operators.similarity import (
        cosine_topk_binary_rerank,
        quantize_binary,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    coded = quantize_binary(emb.filter(F.col("vec_id") != 0))
    over = cosine_topk_binary_rerank(
        coded, [float(x) for x in qvec], k=25, n_candidates=10_000
    )
    return (
        over.select("vec_id", F.round(F.col("cosine"), 6).alias("cosine_r6"))
        .orderBy(F.desc("cosine_r6"), F.asc("vec_id"))
        .limit(20)
    )


def q_maxsim_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ColBERT-style MaxSim late interaction (operators/multivector):
    docs and query become 4×16-dim token bags by deterministic
    slicing; score = Σ over query tokens of the best doc-token dot.
    Top-20, sibling-gate rounding discipline."""
    from ics_search_engine_spark.operators.multivector import (
        maxsim_rerank,
        split_embedding,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    qvecs = [[float(x) for x in qvec[i * 16:(i + 1) * 16]] for i in range(4)]
    docs = split_embedding(emb.filter(F.col("vec_id") != 0), n_tokens=4)
    over = maxsim_rerank(docs, qvecs, k=25)
    return (
        over.select("vec_id", F.round(F.col("maxsim"), 6).alias("maxsim_r6"))
        .orderBy(F.desc("maxsim_r6"), F.asc("vec_id"))
        .limit(20)
    )


_SQL_MAXSIM_RERANK = """
WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
d AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id != 0
),
s AS (
  SELECT vec_id,
    greatest(
      list_dot_product(list_slice(v, 1, 16),  list_slice(q.qv, 1, 16)),
      list_dot_product(list_slice(v, 17, 32), list_slice(q.qv, 1, 16)),
      list_dot_product(list_slice(v, 33, 48), list_slice(q.qv, 1, 16)),
      list_dot_product(list_slice(v, 49, 64), list_slice(q.qv, 1, 16)))
    + greatest(
      list_dot_product(list_slice(v, 1, 16),  list_slice(q.qv, 17, 32)),
      list_dot_product(list_slice(v, 17, 32), list_slice(q.qv, 17, 32)),
      list_dot_product(list_slice(v, 33, 48), list_slice(q.qv, 17, 32)),
      list_dot_product(list_slice(v, 49, 64), list_slice(q.qv, 17, 32)))
    + greatest(
      list_dot_product(list_slice(v, 1, 16),  list_slice(q.qv, 33, 48)),
      list_dot_product(list_slice(v, 17, 32), list_slice(q.qv, 33, 48)),
      list_dot_product(list_slice(v, 33, 48), list_slice(q.qv, 33, 48)),
      list_dot_product(list_slice(v, 49, 64), list_slice(q.qv, 33, 48)))
    + greatest(
      list_dot_product(list_slice(v, 1, 16),  list_slice(q.qv, 49, 64)),
      list_dot_product(list_slice(v, 17, 32), list_slice(q.qv, 49, 64)),
      list_dot_product(list_slice(v, 33, 48), list_slice(q.qv, 49, 64)),
      list_dot_product(list_slice(v, 49, 64), list_slice(q.qv, 49, 64)))
    AS ms
  FROM d CROSS JOIN q
)
SELECT vec_id, round(ms, 6) AS maxsim_r6
FROM s ORDER BY maxsim_r6 DESC, vec_id ASC LIMIT 20
"""


def q_sparse_vector_engine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES sparse_vector / SPLADE-family retrieval (operators/
    sparsevec): docs expand to impact postings weight = 1 + ln(tf)
    (the deterministic log-saturation stand-in for a learned
    expansion), the query is a term→weight map, score = Σ qw·dw over
    overlapping tokens via the sorted-term fold.  Gated exact (no
    pruning); the prune+rescore path is pytest-covered (approximate
    set by design).  Top-20, sibling-gate rounding discipline."""
    from ics_search_engine_spark.operators.sparsevec import (
        sparse_postings,
        sparse_topk,
    )

    docs = _docs(spark, sf_dir)
    transcripts = docs.select(
        F.format_string("doc%08d", F.col("doc_id")).alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.col("text"),
    )
    posts = sparse_postings(transcripts, stem=False)
    qw = {"spark": 1.8, "stream": 1.2, "window": 0.7, "join": 0.4}
    top = sparse_topk(spark, posts, qw, k=20)
    return (
        top.select(
            F.substring("conv_id", 4, 8).cast("long").alias("doc_id"),
            F.round("score", 6).alias("score_r6"),
        )
        .orderBy(F.desc("score_r6"), F.asc("doc_id"))
        .limit(20)
    )


_SQL_SPARSE_VECTOR = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
posts AS (
  SELECT term, doc_id, count(*) AS tf FROM (
    SELECT doc_id, unnest(toks) AS term FROM t
  ) WHERE term IN ('spark','stream','window','join')
  GROUP BY term, doc_id
),
qw(term, w) AS (
  VALUES ('spark', 1.8), ('stream', 1.2), ('window', 0.7), ('join', 0.4)
),
scored AS (
  SELECT p.doc_id, sum(q.w * (1.0 + ln(p.tf))) AS score
  FROM posts p JOIN qw q USING (term) GROUP BY p.doc_id
)
SELECT doc_id, round(score, 6) AS score_r6
FROM scored ORDER BY score_r6 DESC, doc_id ASC LIMIT 20
"""


def q_ltr_rescore_engine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LTR rescore (operators/ltr): exact BM25 top-100 window, feature
    extraction (bm25, matched-term count, dl/avgdl, max tf) from the
    same single postings decode, linear model re-rank in-plan.
    Rounded-order top-20, the engine gates' boundary convention."""
    import shutil
    import tempfile

    from ics_search_engine_spark.operators.ltr import ltr_rescore
    from ics_search_engine_spark.operators.packed_index import (
        PackedIndex,
        build_packed_index,
    )

    docs = _docs(spark, sf_dir)
    transcripts = docs.select(
        F.format_string("doc%08d", F.col("doc_id")).alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.col("text"),
    )
    model = {
        "bm25": 1.0, "matched": 0.5, "dl_ratio": -0.25,
        "max_tf": 0.05, "bias": 0.1,
    }
    out = tempfile.mkdtemp(prefix="gate_ltr_idx_")
    try:
        build_packed_index(
            spark, transcripts, out, range_bits=8, with_positions=False,
            stem=False,
        )
        pidx = PackedIndex(spark, out)
        rows = ltr_rescore(
            spark, pidx, " ".join(DOCS_QUERY_TERMS), model, k=60,
            window=100,
        ).collect()
    finally:
        shutil.rmtree(out, ignore_errors=True)
    resolved = [(int(c[3:]), round(float(s), 6)) for c, _, s in rows]
    resolved.sort(key=lambda r: (-r[1], r[0]))
    return spark.createDataFrame(
        resolved[:20], "doc_id long, score_r6 double"
    )


_SQL_LTR_RESCORE = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
{_SQL_BM25_CTES}
feats AS (
  SELECT p.doc_id,
         sum(ln((s.n - d.df + 0.5) / (d.df + 0.5) + 1.0)
             * (p.tf * 2.2
                / (p.tf + 1.2 * (0.25 + 0.75 * p.dl / s.avgdl))))
           AS bm25,
         count(*) AS matched,
         any_value(p.dl) / any_value(s.avgdl) AS dl_ratio,
         max(p.tf) AS max_tf
  FROM posts p JOIN dfs d USING (term) CROSS JOIN stats s
  GROUP BY p.doc_id
),
win AS (
  SELECT *, row_number() OVER (ORDER BY bm25 DESC, doc_id ASC) AS rn
  FROM feats
),
ltr AS (
  SELECT doc_id,
         round(0.1 + 1.0 * bm25 + 0.5 * matched
               - 0.25 * dl_ratio + 0.05 * max_tf, 6) AS score_r6
  FROM win WHERE rn <= 100
)
SELECT doc_id, score_r6
FROM ltr ORDER BY score_r6 DESC, doc_id ASC LIMIT 20
"""


def q_search_template(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES search template (operators/templates): the mustache source

        {"query": "{{#strict}}+{{/strict}}{{main}} {{extra}}{{^extra}}
         stream{{/extra}}{{#boosts}} {{term}}^{{w}}{{/boosts}}",
         "k": {{k}}}

    rendered with {strict: true, main: spark, boosts: [{term: join,
    w: 2}], k: 60} — exercising truthy section, variable, inverted-
    section default, and a LIST section — yields '+spark stream
    join^2' through the stored-template registry and the qlang engine.
    Oracle replays the rendered query relationally (required spark,
    join boosted ×2).  Rounded-order top-20."""
    import shutil
    import tempfile

    from ics_search_engine_spark.operators.packed_index import (
        PackedIndex,
        build_packed_index,
    )
    from ics_search_engine_spark.operators.templates import TemplateRegistry

    docs = _docs(spark, sf_dir)
    transcripts = docs.select(
        F.format_string("doc%08d", F.col("doc_id")).alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.col("text"),
    )
    source = (
        '{"query": "{{#strict}}+{{/strict}}{{main}} '
        "{{extra}}{{^extra}}stream{{/extra}}"
        '{{#boosts}} {{term}}^{{w}}{{/boosts}}", "k": {{k}}}'
    )
    params = {
        "strict": True, "main": "spark",
        "boosts": [{"term": "join", "w": 2}], "k": 60,
    }
    out = tempfile.mkdtemp(prefix="gate_tmpl_idx_")
    try:
        build_packed_index(
            spark, transcripts, out, range_bits=8, with_positions=True,
            stem=False,
        )
        pidx = PackedIndex(spark, out)
        reg = TemplateRegistry()
        reg.put("docs_search", source)
        top = reg.search(spark, pidx, "docs_search", params).collect()
    finally:
        shutil.rmtree(out, ignore_errors=True)
    resolved = [(int(c[3:]), round(s, 6)) for c, _, s in top]
    resolved.sort(key=lambda r: (-r[1], r[0]))
    return spark.createDataFrame(
        resolved[:20], "doc_id long, bm25_r6 double"
    )


# rendered query '+spark stream join^2': spark required (weight 1),
# stream optional (1), join optional boosted (2); df over full vocab
_SQL_SEARCH_TEMPLATE = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
stats AS (SELECT count(*)::DOUBLE AS n, avg(len(toks)) AS avgdl FROM t),
alldfs AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM (
    SELECT doc_id, unnest(toks) AS term FROM t
  ) WHERE term IN ('spark','stream','join') GROUP BY term
),
qterms AS (
  SELECT term, df,
         CASE WHEN term = 'join' THEN 2.0 ELSE 1.0 END AS mult
  FROM alldfs
),
posts AS (
  SELECT term, doc_id, count(*) AS tf, any_value(dl) AS dl FROM (
    SELECT doc_id, len(toks) AS dl, unnest(toks) AS term FROM t
  ) WHERE term IN ('spark','stream','join')
  GROUP BY term, doc_id
),
scored AS (
  SELECT p.doc_id,
         q.mult * ln((s.n - q.df + 0.5) / (q.df + 0.5) + 1.0)
         * (p.tf * 2.2 / (p.tf + 1.2 * (0.25 + 0.75 * p.dl / s.avgdl)))
         AS contrib
  FROM posts p JOIN qterms q USING (term) CROSS JOIN stats s
),
cand AS (SELECT doc_id FROM t WHERE list_contains(toks, 'spark'))
SELECT s.doc_id, round(sum(s.contrib), 6) AS bm25_r6
FROM scored s JOIN cand c USING (doc_id)
GROUP BY s.doc_id
ORDER BY bm25_r6 DESC, s.doc_id ASC LIMIT 20
"""


def q_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain frequency cap (operators/datapipe.cap_per_key): keep
    at most 5 docs per source, best-first by (n_chars desc, doc_id
    asc) — the crawl-curation 'no host dominates the mix' rule."""
    from ics_search_engine_spark.operators.datapipe import cap_per_key

    capped = cap_per_key(
        _docs(spark, sf_dir), ["source"], 5,
        [F.desc("n_chars"), F.asc("doc_id")],
    )
    return capped.select("source", "doc_id", "n_chars").orderBy(
        "source", "doc_id"
    )


_SQL_DOMAIN_CAP = """
SELECT source, doc_id, n_chars FROM (
  SELECT source, doc_id, n_chars,
         row_number() OVER (PARTITION BY source
                            ORDER BY n_chars DESC, doc_id ASC) AS rn
  FROM documents
) WHERE rn <= 5 ORDER BY source, doc_id
"""


def q_c4_line_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 line-rule filter (operators/textstats.c4_line_rules): docs
    recast as multi-line pages with a punctuation-less heading, a body
    sentence, a 'javascript' boilerplate line, and (every 13th / 29th
    doc) a lorem-ipsum / brace line — exercising each line rule and
    both document-level drops.  min_words=5, min_lines=1."""
    from ics_search_engine_spark.operators.textstats import c4_line_rules

    nl = F.lit("\n")
    docs = _docs(spark, sf_dir).select(
        "doc_id",
        F.concat(
            F.lit("Heading without terminal punctuation"), nl,
            F.substring("text", 1, 120), F.lit("."), nl,
            F.lit("Please enable javascript to continue reading."),
            F.when(
                F.col("doc_id") % 13 == 0,
                F.concat(nl, F.lit("lorem ipsum dolor sit amet.")),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 29 == 0,
                F.concat(nl, F.lit("braces { in code lines confuse parsers.")),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    return c4_line_rules(docs, min_words=5, min_lines=1).orderBy("doc_id")


_SQL_C4_LINE_FILTER = """
WITH d AS (
  SELECT doc_id,
         'Heading without terminal punctuation' || chr(10)
         || substr(text, 1, 120) || '.' || chr(10)
         || 'Please enable javascript to continue reading.'
         || CASE WHEN doc_id % 13 = 0
                 THEN chr(10) || 'lorem ipsum dolor sit amet.'
                 ELSE '' END
         || CASE WHEN doc_id % 29 = 0
                 THEN chr(10) || 'braces { in code lines confuse parsers.'
                 ELSE '' END AS text
  FROM documents
),
ls AS (
  SELECT doc_id, text,
         list_filter(string_split(text, chr(10)),
                     x -> length(x) > 0) AS lines
  FROM d
),
ok AS (
  SELECT doc_id, text, lines,
         list_filter(lines, l ->
             right(trim(l), 1) IN ('.', '!', '?', '"')
             AND len(regexp_split_to_array(trim(l), '\\s+')) >= 5
             AND NOT contains(lower(trim(l)), 'javascript')) AS keptl
  FROM ls
)
SELECT doc_id,
       len(lines) AS n_lines,
       len(keptl) AS n_lines_kept,
       array_to_string(keptl, chr(10)) AS text_clean,
       (NOT contains(lower(text), 'lorem ipsum'))
       AND (NOT contains(text, '{'))
       AND len(keptl) >= 1 AS kept
FROM ok ORDER BY doc_id
"""


def q_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE encode (operators/bpe.bpe_encode) with a FIXED
    five-merge table — th, th+e, i+n, a+n, e+</w> — so the oracle can
    replay it: PER-MERGE-FIXPOINT in-learned-order application over
    space-joined symbol strings is equivalent to the greedy
    lowest-rank-first encode (merging two symbols never creates an
    occurrence of an earlier-learned pair — new pairs all involve the
    new symbol).  Each merge must iterate to a FIXPOINT, not a single
    replace() pass: non-overlapping left-to-right replace consumes the
    shared delimiter space between adjacent occurrences (' b a n a n a '
    -> ' b an a n a ' in one pass, the r3 advisor's finding), so the
    oracle runs one recursive CTE per merge until unchanged
    (_bpe_fixpoint_ctes; equivalence pytest-pinned on banana/thth/…
    in tests/test_bpe.py).  Output: top-30 (token, cnt).  The
    data-dependent FIT is pytest-pinned against an independent
    reference implementation (tests/test_bpe.py)."""
    from ics_search_engine_spark.operators.bpe import (
        bpe_encode,
        bpe_token_stats,
    )

    merges = [("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"),
              ("e", "</w>")]
    enc = bpe_encode(_docs(spark, sf_dir), merges)
    return bpe_token_stats(enc, k=30)


_BPE_GATE_MERGES = [("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"),
                    ("e", "</w>")]


def _bpe_fixpoint_ctes(
    merges: list[tuple[str, str]], carry: str = ""
) -> tuple[str, str]:
    """One recursive CTE per merge, iterating ``replace`` to a
    FIXPOINT before the next merge applies (in-learned-order,
    per-merge-fixpoint ≡ greedy lowest-rank-first encode_word — see
    q_bpe_encode docstring; a single replace() pass misses adjacent
    occurrences that share a delimiter space).  ``carry`` is a
    'col, '-style prefix of columns to thread through.  Returns
    (cte_sql, final_cte_name); callers start from a CTE named
    ``sym`` with the spaced symbol string in column ``s``."""
    parts, prev = [], "sym"
    for i, (a, b) in enumerate(merges):
        pat, rep = f" {a} {b} ", f" {a}{b} "
        f, g = f"bf{i}", f"bg{i}"
        parts.append(
            f"{f} AS (\n  SELECT {carry}s FROM {prev}\n  UNION ALL\n"
            f"  SELECT {carry}replace(s, '{pat}', '{rep}') AS s"
            f" FROM {f}\n"
            f"  WHERE replace(s, '{pat}', '{rep}') <> s\n),\n"
            f"{g} AS (SELECT {carry}s FROM {f}\n"
            f"  WHERE replace(s, '{pat}', '{rep}') = s)"
        )
        prev = g
    return ",\n".join(parts), prev


_BPE_CTES, _BPE_LAST = _bpe_fixpoint_ctes(_BPE_GATE_MERGES)
_BPE_CTES_LANG, _BPE_LAST_LANG = _bpe_fixpoint_ctes(
    _BPE_GATE_MERGES, carry="lang, "
)

_SQL_BPE_ENCODE = f"""
WITH RECURSIVE w AS (
  SELECT unnest(list_filter(
           regexp_split_to_array(lower(text), '[^a-z0-9]+'),
           x -> length(x) > 0)) AS word
  FROM documents
),
sym AS (
  SELECT ' ' || regexp_replace(word, '(.)', '\\1 ', 'g') || '</w> ' AS s
  FROM w
),
{_BPE_CTES},
toks AS (
  SELECT unnest(list_filter(string_split(s, ' '),
                            x -> length(x) > 0)) AS token
  FROM {_BPE_LAST}
)
SELECT token, count(*) AS cnt FROM toks
GROUP BY token ORDER BY cnt DESC, token ASC LIMIT 30
"""


def q_span_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5 span corruption (datapipe.span_corruption): deterministic
    md5-block masking, stride=8 / span_len=3 / keep_mod=3 (12.5%
    nominal mask rate) — (inputs, targets) example pairs with
    <extra_id_k> sentinels, pure Catalyst.  Oracle replays the
    closed-form block-membership rule with DuckDB list lambdas."""
    from ics_search_engine_spark.operators.datapipe import span_corruption

    return span_corruption(
        _docs(spark, sf_dir), stride=8, span_len=3, keep_mod=3
    ).orderBy("doc_id")


_SQL_SPAN_CORRUPTION = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
st AS (
  SELECT doc_id, toks,
         list_filter(range(0, len(toks), 8),
           s -> ('0x' || substr(md5(doc_id::VARCHAR || '#'
                                     || s::VARCHAR), 1, 8))::BIGINT
                % 3 = 0) AS starts
  FROM t
),
io AS (
  SELECT doc_id, toks, starts,
    list_filter(
      list_transform(range(0, len(toks)),
        p -> CASE
          WHEN (p % 8) < 3 AND list_contains(starts, p - (p % 8))
          THEN CASE WHEN p % 8 = 0
               THEN '<extra_id_'
                    || (list_position(starts, p) - 1)::VARCHAR || '>'
               ELSE NULL END
          ELSE toks[p + 1] END),
      x -> x IS NOT NULL) AS inputs_l,
    flatten(list_transform(starts,
      s -> list_prepend(
             '<extra_id_'
             || (list_position(starts, s) - 1)::VARCHAR || '>',
             list_slice(toks, s + 1, s + 3))))
    || ['<extra_id_' || len(starts)::VARCHAR || '>'] AS targets_l
  FROM st
)
SELECT doc_id, len(toks) AS n_tokens, len(starts) AS n_spans,
       array_to_string(inputs_l, ' ') AS inputs,
       array_to_string(targets_l, ' ') AS targets
FROM io ORDER BY doc_id
"""


def q_hybrid_sparse_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learned-sparse leg composed into the retriever-tree API
    (operators/hybrid × operators/sparsevec): rrf(bm25 top-50,
    sparse_vector top-50) — a Leg is ANY bounded (id, score) frame, so
    the sparse retriever plugs in with zero glue.  Sparse-leg boundary
    rounded before selection (sibling-gate convention)."""
    from ics_search_engine_spark.operators.hybrid import (
        Leg,
        RrfRetriever,
        retriever_topk,
    )
    from ics_search_engine_spark.operators.sparsevec import (
        sparse_postings,
        sparse_topk,
    )

    docs = _docs(spark, sf_dir)
    posts = sparse_postings(
        docs.select("doc_id", "text"), stem=False, key_cols=["doc_id"]
    )
    qw = {"spark": 1.8, "stream": 1.2, "window": 0.7, "join": 0.4}
    rows = sparse_topk(spark, posts, qw, k=60, key_cols=["doc_id"]).collect()
    lst = sorted(
        [(int(d), round(float(s), 6)) for d, s in rows],
        key=lambda r: (-r[1], r[0]),
    )[:50]
    sp_leg = spark.createDataFrame(lst, "doc_id long, sparse_r6 double")
    tree = RrfRetriever(
        [
            Leg(_bm25_leg(spark, sf_dir, 50), "bm25_r6"),
            Leg(sp_leg, "sparse_r6"),
        ],
        rank_constant=60,
        rank_window_size=50,
    )
    return retriever_topk(tree, k=20).select(
        "doc_id", F.col("score").alias("rrf_r9")
    )


_SQL_HYBRID_SPARSE_RRF = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
stats AS (SELECT count(*)::DOUBLE AS n, avg(len(toks)) AS avgdl FROM t),
posts AS (
  SELECT term, doc_id, count(*) AS tf, any_value(dl) AS dl FROM (
    SELECT doc_id, len(toks) AS dl, unnest(toks) AS term FROM t
  ) WHERE term IN ('spark','stream','window','join')
  GROUP BY term, doc_id
),
dfs AS (SELECT term, count(*) AS df FROM posts GROUP BY term),
bmtop AS (
  SELECT doc_id, round(sum(
           ln((s.n - d.df + 0.5) / (d.df + 0.5) + 1.0)
           * (p.tf * 2.2 / (p.tf + 1.2 * (0.25 + 0.75 * p.dl / s.avgdl)))
         ), 6) AS bm25_r6
  FROM posts p JOIN dfs d USING (term) CROSS JOIN stats s
  GROUP BY doc_id ORDER BY bm25_r6 DESC, doc_id ASC LIMIT 50
),
qw(term, w) AS (
  VALUES ('spark', 1.8), ('stream', 1.2), ('window', 0.7), ('join', 0.4)
),
sptop AS (
  SELECT p.doc_id, round(sum(q.w * (1.0 + ln(p.tf))), 6) AS sparse_r6
  FROM posts p JOIN qw q USING (term)
  GROUP BY p.doc_id ORDER BY sparse_r6 DESC, doc_id ASC LIMIT 50
),
bm AS (SELECT doc_id, row_number()
         OVER (ORDER BY bm25_r6 DESC, doc_id ASC) AS r FROM bmtop),
sp AS (SELECT doc_id, row_number()
         OVER (ORDER BY sparse_r6 DESC, doc_id ASC) AS r FROM sptop)
SELECT coalesce(bm.doc_id, sp.doc_id) AS doc_id,
       round(coalesce(1.0 / (60.0 + bm.r), 0.0)
             + coalesce(1.0 / (60.0 + sp.r), 0.0), 9) AS rrf_r9
FROM bm FULL OUTER JOIN sp ON bm.doc_id = sp.doc_id
ORDER BY rrf_r9 DESC, doc_id ASC LIMIT 20
"""


def q_sparse_vector_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The learned-sparse SERVING tier (serving.LocalSparseServer):
    Spark builds the term-sorted impact artifact, a Spark-free
    pyarrow+numpy process answers the query — reduceat fold in the
    same ascending-term order as the distributed path, so the same
    oracle gates both (shared SQL with sparse_vector_engine)."""
    import shutil
    import tempfile

    from ics_search_engine_spark.operators.sparsevec import (
        sparse_postings,
        write_sparse_artifact,
    )
    from ics_search_engine_spark.serving import LocalSparseServer

    docs = _docs(spark, sf_dir)
    qw = {"spark": 1.8, "stream": 1.2, "window": 0.7, "join": 0.4}
    out = tempfile.mkdtemp(prefix="gate_sparse_srv_")
    try:
        write_sparse_artifact(
            sparse_postings(
                docs.select("doc_id", "text"), stem=False,
                key_cols=["doc_id"],
            ),
            out,
        )
        srv = LocalSparseServer(out, key_cols=("doc_id",))
        rows = srv.search(qw, k=20)
    finally:
        shutil.rmtree(out, ignore_errors=True)
    return spark.createDataFrame(
        [(int(d), round(float(s), 6)) for d, s in rows],
        "doc_id long, score_r6 double",
    ).orderBy(F.desc("score_r6"), F.asc("doc_id"))


def q_shuffle_resume_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resumable dataloader cursor (datapipe.shuffle_page): page 2 of
    the deterministic epoch permutation, fetched as 'strictly after
    page 1's last shuffle_key' — search_after on the md5 order.  The
    oracle reads the same page as OFFSET 25 (md5 keys are unique, so
    cursor and offset agree)."""
    from ics_search_engine_spark.operators.datapipe import shuffle_page

    docs = _docs(spark, sf_dir)
    page1 = shuffle_page(docs, 25, seed=3).collect()
    after = page1[-1]["shuffle_key"]
    return shuffle_page(docs, 25, after_key=after, seed=3).orderBy(
        "shuffle_key"
    )


_SQL_SHUFFLE_RESUME_PAGE = """
SELECT doc_id, md5(doc_id::VARCHAR || '#3') AS shuffle_key
FROM documents
ORDER BY shuffle_key LIMIT 25 OFFSET 25
"""


def q_bpe_fertility_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-fertility report (operators/bpe × documents.lang):
    tokens-per-word by language under the fixed five-merge BPE of the
    bpe_encode gate — the vocabulary-audit view a multilingual
    pipeline checks before committing to a tokenizer."""
    from ics_search_engine_spark.operators.bpe import bpe_encode

    merges = [("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"),
              ("e", "</w>")]
    docs = _docs(spark, sf_dir)
    words = F.filter(
        F.split(F.lower(F.col("text")), "[^a-z0-9]+"),
        lambda x: F.length(x) > 0,
    )
    enc = bpe_encode(docs, merges)
    joined = enc.join(
        docs.select("doc_id", "lang", F.size(words).alias("n_words")),
        "doc_id",
    )
    return (
        joined.groupBy("lang")
        .agg(
            F.sum("n_words").alias("n_words"),
            F.sum("n_tokens").alias("n_tokens"),
        )
        .withColumn(
            "fertility_r6",
            F.round(F.col("n_tokens") / F.col("n_words"), 6),
        )
        .orderBy("lang")
    )


_SQL_BPE_FERTILITY = f"""
WITH RECURSIVE w AS (
  SELECT lang, unnest(list_filter(
           regexp_split_to_array(lower(text), '[^a-z0-9]+'),
           x -> length(x) > 0)) AS word
  FROM documents
),
sym AS (
  SELECT lang,
         ' ' || regexp_replace(word, '(.)', '\\1 ', 'g') || '</w> ' AS s
  FROM w
),
{_BPE_CTES_LANG},
cnt AS (
  SELECT lang,
         len(list_filter(string_split(s, ' '),
                         x -> length(x) > 0)) AS ntok
  FROM {_BPE_LAST_LANG}
)
SELECT lang, count(*) AS n_words, sum(ntok) AS n_tokens,
       round(sum(ntok)::DOUBLE / count(*), 6) AS fertility_r6
FROM cnt GROUP BY lang ORDER BY lang
"""


def q_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG sliding-window chunking (datapipe.chunk_documents): 40-token
    windows every 30 tokens (overlap 10), short tail kept, offsets
    carried — map-only Catalyst explode."""
    from ics_search_engine_spark.operators.datapipe import chunk_documents

    return chunk_documents(
        _docs(spark, sf_dir), size=40, overlap=10
    ).orderBy("doc_id", "chunk_idx")


_SQL_DOC_CHUNKS = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
s AS (
  SELECT doc_id, toks, unnest(range(0, len(toks), 30)) AS tok_start
  FROM t WHERE len(toks) > 0
)
SELECT doc_id, (tok_start // 30) AS chunk_idx, tok_start,
       len(list_slice(toks, tok_start + 1, tok_start + 40))
         AS n_chunk_tokens,
       array_to_string(list_slice(toks, tok_start + 1, tok_start + 40),
                       ' ') AS chunk_text
FROM s ORDER BY doc_id, chunk_idx
"""


def q_fim_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fill-in-the-middle transform (datapipe.fim_transform): PSM
    reordering <PRE> p <SUF> s <MID> m with md5-derived cut points
    1 ≤ c1 < c2 ≤ n; docs under 8 tokens pass through unmasked."""
    from ics_search_engine_spark.operators.datapipe import fim_transform

    return fim_transform(_docs(spark, sf_dir)).orderBy("doc_id")


_SQL_FIM_TRANSFORM = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
c AS (
  SELECT doc_id, toks, len(toks) AS n,
         ({_sql_md5_32("doc_id::VARCHAR || '#fim1'")}
          % (len(toks) - 1) + 1) AS c1
  FROM t
),
c2t AS (
  SELECT doc_id, toks, n, c1,
         (c1 + {_sql_md5_32("doc_id::VARCHAR || '#fim2'")}
               % (n - c1) + 1) AS c2
  FROM c
)
SELECT doc_id, n AS n_tokens, n >= 8 AS fim_applied,
       CASE WHEN n >= 8 THEN c1 END AS c1,
       CASE WHEN n >= 8 THEN c2 END AS c2,
       CASE WHEN n >= 8 THEN array_to_string(
         ['<PRE>'] || list_slice(toks, 1, c1)
         || ['<SUF>'] || list_slice(toks, c2 + 1, n)
         || ['<MID>'] || list_slice(toks, c1 + 1, c2), ' ')
       ELSE array_to_string(toks, ' ') END AS psm
FROM c2t ORDER BY doc_id
"""


def q_query_rules_engine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES query rules (operators/queryrules.rules_topk): a ruleset
    whose criteria fire on the request metadata — pin docs 3 and 7 on
    'stream' in the query, exclude 5 and 7 on 'join' (exclusion beats
    the pin for 7, ES precedence) — over the packed organic ranking.
    Pinned rows carry NULL score.  Rounded-order top-20."""
    import shutil
    import tempfile

    from ics_search_engine_spark.operators.packed_index import (
        PackedIndex,
        build_packed_index,
    )
    from ics_search_engine_spark.operators.queryrules import (
        Criterion,
        Rule,
        rules_topk,
    )

    docs = _docs(spark, sf_dir)
    transcripts = docs.select(
        F.format_string("doc%08d", F.col("doc_id")).alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.col("text"),
    )
    rules = [
        Rule("pin-on-stream", "pinned",
             [Criterion("contains", "user_query", ("stream",))],
             [("doc00000003", 0), ("doc00000007", 0)]),
        Rule("block-on-join", "exclude",
             [Criterion("contains", "user_query", ("join",))],
             [("doc00000005", 0), ("doc00000007", 0)]),
    ]
    out = tempfile.mkdtemp(prefix="gate_qrules_idx_")
    try:
        build_packed_index(
            spark, transcripts, out, range_bits=8, with_positions=False,
            stem=False,
        )
        pidx = PackedIndex(spark, out)
        rows = rules_topk(
            spark, pidx, " ".join(DOCS_QUERY_TERMS), rules, k=60
        ).collect()
    finally:
        shutil.rmtree(out, ignore_errors=True)
    pins = [(int(c[3:]), None, True) for c, _, s, p in map(tuple, rows) if p]
    organic = sorted(
        [
            (int(c[3:]), round(float(s), 6), False)
            for c, _, s, p in map(tuple, rows) if not p
        ],
        key=lambda r: (-r[1], r[0]),
    )
    return spark.createDataFrame(
        (pins + organic)[:20], "doc_id long, score_r6 double, pinned boolean"
    )


_SQL_QUERY_RULES = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
{_SQL_BM25_CTES}
org AS (
  SELECT doc_id, round(sum(contrib), 6) AS score_r6, false AS pinned
  FROM scored WHERE doc_id NOT IN (3, 5, 7)
  GROUP BY doc_id ORDER BY score_r6 DESC, doc_id ASC LIMIT 19
)
SELECT doc_id, NULL::DOUBLE AS score_r6, true AS pinned
FROM (VALUES (3)) p(doc_id)
UNION ALL
SELECT doc_id, score_r6, pinned FROM org
"""


def q_ingest_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ingest pipeline (operators/ingest.run_pipeline): dissect a
    synthesized log line, convert the id capture, uppercase, gsub the
    source name, set a constant, and parse a date — six processors
    compiled into ONE Catalyst projection (plan-tested map-only in
    tests/test_ingest.py)."""
    from ics_search_engine_spark.operators.ingest import run_pipeline

    docs = _docs(spark, sf_dir).select(
        "doc_id",
        F.concat_ws(
            " ", F.col("source"), F.col("doc_id").cast("string"),
            F.col("lang"),
        ).alias("log"),
        F.concat(
            F.lit("2026-01-"),
            F.lpad(((F.col("doc_id") % 28) + 1).cast("string"), 2, "0"),
        ).alias("dt"),
    )
    out = run_pipeline(
        docs,
        [
            {"dissect": {"field": "log",
                         "pattern": "%{src} %{id} %{lg}"}},
            {"convert": {"field": "id", "type": "long",
                         "target_field": "id_num"}},
            {"uppercase": {"field": "lg", "target_field": "lg_up"}},
            {"gsub": {"field": "src", "pattern": "^src",
                      "replacement": "source-"}},
            {"set": {"field": "env", "value": "prod"}},
            {"date": {"field": "dt", "formats": ["yyyy-MM-dd"],
                      "target_field": "ts"}},
        ],
    )
    return out.select(
        "doc_id", "src", "id_num", "lg_up", "env", "ts"
    ).orderBy("doc_id")


_SQL_INGEST_PIPELINE = """
WITH d AS (
  SELECT doc_id,
         source || ' ' || doc_id::VARCHAR || ' ' || lang AS log,
         '2026-01-' || lpad(((doc_id % 28) + 1)::VARCHAR, 2, '0') AS dt
  FROM documents
),
parts AS (SELECT doc_id, string_split(log, ' ') AS p, dt FROM d)
SELECT doc_id,
       regexp_replace(p[1], '^src', 'source-') AS src,
       p[2]::BIGINT AS id_num,
       upper(p[3]) AS lg_up,
       'prod' AS env,
       strptime(dt, '%Y-%m-%d') AS ts
FROM parts ORDER BY doc_id
"""


def q_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicated-substring removal (dedup.exact_substring_dedup,
    Lee et al. 2022 at the token-8-gram grain): every repeated 8-token
    span keeps its globally first occurrence (min id·10⁶+pos packed
    key — a map-side partial agg, deliberately not a per-gram window);
    later occurrences' tokens are cut.  ~970 duplicated grams exist in
    the sf0.01 corpus, so the gate exercises real coverage merging."""
    from ics_search_engine_spark.operators.dedup import (
        exact_substring_dedup,
    )

    return exact_substring_dedup(
        _docs(spark, sf_dir), l=8
    ).orderBy("doc_id")


_SQL_SUBSTRING_DEDUP = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
g AS (
  SELECT doc_id, p,
         md5(array_to_string(list_slice(toks, p + 1, p + 8), ' ')) AS h
  FROM (SELECT doc_id, toks, unnest(range(0, len(toks) - 8 + 1)) AS p
        FROM t WHERE len(toks) >= 8)
),
firsts AS (
  SELECT h, min(doc_id * 1000000 + p) AS first_key, count(*) AS occ
  FROM g GROUP BY h
),
dups AS (
  SELECT g.doc_id, list_sort(list(g.p)) AS starts
  FROM g JOIN firsts USING (h)
  WHERE firsts.occ > 1 AND g.doc_id * 1000000 + g.p != firsts.first_key
  GROUP BY g.doc_id
),
o AS (
  SELECT t.doc_id, toks, coalesce(starts, []) AS starts
  FROM t LEFT JOIN dups USING (doc_id)
)
SELECT doc_id, len(toks) AS n_tokens,
       len(toks) - len(kept) AS n_removed,
       coalesce(array_to_string(kept, ' '), '') AS text_dedup
FROM (
  SELECT doc_id, toks,
         [toks[p + 1] FOR p IN range(0, len(toks))
          IF len(list_filter(starts, s -> p >= s AND p < s + 8)) = 0]
           AS kept
  FROM o
) ORDER BY doc_id
"""


def q_semantic_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES semantic_text retrieval shape (datapipe.chunk_documents ×
    sparsevec.sparse_scores): documents chunk into 40-token windows
    (overlap 10), each chunk scores against the sparse query, a
    document's score is its BEST chunk (the nested-field max rollup) —
    top-20 docs with the winning chunk index."""
    from ics_search_engine_spark.operators.datapipe import chunk_documents
    from ics_search_engine_spark.operators.sparsevec import (
        sparse_postings,
        sparse_scores,
    )

    chunks = chunk_documents(_docs(spark, sf_dir), size=40, overlap=10)
    posts = sparse_postings(
        chunks, stem=False, key_cols=["doc_id", "chunk_idx"],
        text_col="chunk_text",
    )
    qw = {"spark": 1.8, "stream": 1.2, "window": 0.7, "join": 0.4}
    per_chunk = sparse_scores(
        spark, posts, qw, key_cols=["doc_id", "chunk_idx"]
    )
    best = (
        per_chunk.groupBy("doc_id")
        .agg(
            F.max(
                F.struct(
                    F.round("score", 6).alias("score_r6"),
                    (-F.col("chunk_idx")).alias("neg_idx"),
                )
            ).alias("b")
        )
        .select(
            "doc_id",
            F.col("b.score_r6").alias("score_r6"),
            (-F.col("b.neg_idx")).cast("int").alias("best_chunk"),
        )
    )
    return (
        best.orderBy(F.desc("score_r6"), F.asc("doc_id")).limit(20)
    )


# chunk tokens: doc toks sliced [s+1, s+40] every 30; chunk tf from the
# slice; doc score = max chunk score, best_chunk = SMALLEST idx at max
_SQL_SEMANTIC_CHUNKS = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
ch AS (
  SELECT doc_id, (tok_start // 30) AS chunk_idx,
         list_slice(toks, tok_start + 1, tok_start + 40) AS ctoks
  FROM (SELECT doc_id, toks, unnest(range(0, len(toks), 30)) AS tok_start
        FROM t WHERE len(toks) > 0)
),
posts AS (
  SELECT term, doc_id, chunk_idx, count(*) AS tf FROM (
    SELECT doc_id, chunk_idx, unnest(ctoks) AS term FROM ch
  ) WHERE term IN ('spark','stream','window','join')
  GROUP BY term, doc_id, chunk_idx
),
qw(term, w) AS (
  VALUES ('spark', 1.8), ('stream', 1.2), ('window', 0.7), ('join', 0.4)
),
chunk_scores AS (
  SELECT doc_id, chunk_idx,
         round(sum(q.w * (1.0 + ln(p.tf))), 6) AS score_r6
  FROM posts p JOIN qw q USING (term) GROUP BY doc_id, chunk_idx
),
best AS (
  SELECT doc_id, score_r6, chunk_idx AS best_chunk,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY score_r6 DESC, chunk_idx ASC) AS rn
  FROM chunk_scores
)
SELECT doc_id, score_r6, best_chunk
FROM best WHERE rn = 1
ORDER BY score_r6 DESC, doc_id ASC LIMIT 20
"""


def q_chunk_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-chunk document-mask manifest (datapipe.chunk_manifest over
    pack_sequences, capacity 512): every training window's occupying
    docs with in-window [start, end) spans — segments exploded to rows
    for the cross-engine compare.  Oracle rebuilds the same spans from
    a window prefix-sum."""
    from ics_search_engine_spark.operators.datapipe import (
        chunk_manifest,
        pack_sequences,
    )

    docs = _docs(spark, sf_dir).select(
        "doc_id", F.size(toks_col()).alias("n_tokens")
    )
    packed = pack_sequences(docs, capacity=512)
    man = chunk_manifest(packed, 512)
    return (
        man.select("chunk_id", F.explode("segments").alias("s"))
        .select(
            "chunk_id",
            F.col("s.doc").alias("doc_id"),
            F.col("s.start").alias("seg_start"),
            F.col("s.end").alias("seg_end"),
        )
        .orderBy("chunk_id", "seg_start")
    )


_SQL_CHUNK_MANIFEST = f"""
WITH t AS (SELECT doc_id, len({_SQL_TOKS}) AS n FROM documents),
o AS (
  SELECT doc_id, n,
         coalesce(sum(n) OVER (ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
  FROM t
),
spans AS (
  SELECT doc_id, n, off,
         unnest(range((off // 512)::BIGINT,
                      ((off + n - 1) // 512 + 1)::BIGINT)) AS chunk_id
  FROM o WHERE n > 0
)
SELECT chunk_id, doc_id,
       greatest(off, chunk_id * 512) - chunk_id * 512 AS seg_start,
       least(off + n, (chunk_id + 1) * 512) - chunk_id * 512 AS seg_end
FROM spans ORDER BY chunk_id, seg_start
"""


def q_sparse_quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """8-bit impact-quantized sparse tier (sparsevec.
    quantize_sparse_postings): per-term linear codes against the term
    max, scoring runs UNCHANGED on the dequantized column — the gate
    replays quantize→dequantize→score relationally.  Top-20, sibling
    rounding discipline."""
    from ics_search_engine_spark.operators.sparsevec import (
        quantize_sparse_postings,
        sparse_postings,
        sparse_topk,
    )

    docs = _docs(spark, sf_dir)
    posts = sparse_postings(
        docs.select("doc_id", "text"), stem=False, key_cols=["doc_id"]
    )
    q = quantize_sparse_postings(posts, bits=8, key_cols=["doc_id"])
    qw = {"spark": 1.8, "stream": 1.2, "window": 0.7, "join": 0.4}
    top = sparse_topk(spark, q, qw, k=20, key_cols=["doc_id"])
    return (
        top.select("doc_id", F.round("score", 6).alias("score_r6"))
        .orderBy(F.desc("score_r6"), F.asc("doc_id"))
        .limit(20)
    )


_SQL_SPARSE_QUANTIZED = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
posts AS (
  SELECT term, doc_id, 1.0 + ln(count(*)) AS dw FROM (
    SELECT doc_id, unnest(toks) AS term FROM t
  ) WHERE term IN ('spark','stream','window','join')
  GROUP BY term, doc_id
),
scales AS (SELECT term, max(dw) AS mx FROM posts GROUP BY term),
deq AS (
  SELECT p.term, p.doc_id,
         round(p.dw / s.mx * 255) * s.mx / 255 AS w
  FROM posts p JOIN scales s USING (term)
),
qw(term, q) AS (
  VALUES ('spark', 1.8), ('stream', 1.2), ('window', 0.7), ('join', 0.4)
)
SELECT d.doc_id, round(sum(qw.q * d.w), 6) AS score_r6
FROM deq d JOIN qw USING (term)
GROUP BY d.doc_id ORDER BY score_r6 DESC, doc_id ASC LIMIT 20
"""


def q_sparse_maxscore_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TAAT MaxScore early termination in the sparse serving tier
    (serving.LocalSparseMaxScore): per-term upper bounds close
    candidate admission once the tail terms cannot lift a new doc
    into the top-k; survivors refold ascending-term, so results are
    bit-identical to the exhaustive path — the same oracle gates
    both (shared SQL with sparse_vector_engine)."""
    import shutil
    import tempfile

    from ics_search_engine_spark.operators.sparsevec import (
        sparse_postings,
        write_sparse_artifact,
    )
    from ics_search_engine_spark.serving import LocalSparseMaxScore

    docs = _docs(spark, sf_dir)
    qw = {"spark": 1.8, "stream": 1.2, "window": 0.7, "join": 0.4}
    out = tempfile.mkdtemp(prefix="gate_sparse_ms_")
    try:
        write_sparse_artifact(
            sparse_postings(
                docs.select("doc_id", "text"), stem=False,
                key_cols=["doc_id"],
            ),
            out,
        )
        srv = LocalSparseMaxScore(out, key_cols=("doc_id",))
        rows = srv.search_maxscore(qw, k=20)
    finally:
        shutil.rmtree(out, ignore_errors=True)
    return spark.createDataFrame(
        [(int(d), round(float(s), 6)) for d, s in rows],
        "doc_id long, score_r6 double",
    ).orderBy(F.desc("score_r6"), F.asc("doc_id"))


def q_sparse_packed_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The packed numpy sparse hot path (serving.
    LocalSparsePackedServer): dense vectorized accumulation in
    ascending-term order — bit-identical to the fold servers and the
    Spark path, so the same oracle gates all four."""
    import shutil
    import tempfile

    from ics_search_engine_spark.operators.sparsevec import (
        sparse_postings,
        write_sparse_artifact,
    )
    from ics_search_engine_spark.serving import LocalSparsePackedServer

    docs = _docs(spark, sf_dir)
    qw = {"spark": 1.8, "stream": 1.2, "window": 0.7, "join": 0.4}
    out = tempfile.mkdtemp(prefix="gate_sparse_pk_")
    try:
        write_sparse_artifact(
            sparse_postings(
                docs.select("doc_id", "text"), stem=False,
                key_cols=["doc_id"],
            ),
            out,
        )
        srv = LocalSparsePackedServer(out, key_cols=("doc_id",))
        rows = srv.search(qw, k=20)
    finally:
        shutil.rmtree(out, ignore_errors=True)
    return spark.createDataFrame(
        [(int(d), round(float(s), 6)) for d, s in rows],
        "doc_id long, score_r6 double",
    ).orderBy(F.desc("score_r6"), F.asc("doc_id"))


def q_search_application(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES Search Application (operators/searchapp): stored template
    '+{{main}} {{extra}}' + a ruleset (pin doc 3 when the RENDERED
    query contains 'stream', exclude doc 5) behind one named endpoint
    — the full server-side policy chain, client sends only params.
    Rounded-order top-20; pinned row carries NULL score."""
    import shutil
    import tempfile

    from ics_search_engine_spark.operators.packed_index import (
        PackedIndex,
        build_packed_index,
    )
    from ics_search_engine_spark.operators.queryrules import (
        Criterion,
        Rule,
    )
    from ics_search_engine_spark.operators.searchapp import (
        SearchApplication,
        SearchAppRegistry,
    )

    docs = _docs(spark, sf_dir)
    transcripts = docs.select(
        F.format_string("doc%08d", F.col("doc_id")).alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.col("text"),
    )
    out = tempfile.mkdtemp(prefix="gate_sapp_idx_")
    try:
        build_packed_index(
            spark, transcripts, out, range_bits=8, with_positions=True,
            stem=False,
        )
        pidx = PackedIndex(spark, out)
        reg = SearchAppRegistry()
        reg.put(SearchApplication(
            "docs-app",
            '{"query": "+{{main}} {{extra}}", "k": 10}',
            rules=[
                Rule("pin", "pinned",
                     [Criterion("contains", "user_query", ("stream",))],
                     [("doc00000003", 0)]),
                Rule("block", "exclude", [Criterion("always")],
                     [("doc00000005", 0)]),
            ],
        ))
        rows = reg.search(
            spark, pidx, "docs-app",
            {"main": "spark", "extra": "stream"}, k=60,
        ).collect()
    finally:
        shutil.rmtree(out, ignore_errors=True)
    pins = [(int(c[3:]), None, True) for c, _, s, p in map(tuple, rows) if p]
    organic = sorted(
        [
            (int(c[3:]), round(float(s), 6), False)
            for c, _, s, p in map(tuple, rows) if not p
        ],
        key=lambda r: (-r[1], r[0]),
    )
    return spark.createDataFrame(
        (pins + organic)[:20], "doc_id long, score_r6 double, pinned boolean"
    )


# rendered '+spark stream': spark required + scores, stream optional;
# rules: pin 3 (query contains 'stream'), exclude 5; df over full vocab
_SQL_SEARCH_APPLICATION = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
stats AS (SELECT count(*)::DOUBLE AS n, avg(len(toks)) AS avgdl FROM t),
posts AS (
  SELECT term, doc_id, count(*) AS tf, any_value(dl) AS dl FROM (
    SELECT doc_id, len(toks) AS dl, unnest(toks) AS term FROM t
  ) WHERE term IN ('spark','stream')
  GROUP BY term, doc_id
),
dfs AS (SELECT term, count(*) AS df FROM posts GROUP BY term),
scored AS (
  SELECT p.doc_id,
         ln((s.n - d.df + 0.5) / (d.df + 0.5) + 1.0)
         * (p.tf * 2.2 / (p.tf + 1.2 * (0.25 + 0.75 * p.dl / s.avgdl)))
           AS contrib
  FROM posts p JOIN dfs d USING (term) CROSS JOIN stats s
),
cand AS (
  SELECT doc_id FROM t
  WHERE list_contains(toks, 'spark') AND doc_id NOT IN (3, 5)
),
org AS (
  SELECT s.doc_id, round(sum(s.contrib), 6) AS score_r6, false AS pinned
  FROM scored s JOIN cand c USING (doc_id)
  GROUP BY s.doc_id ORDER BY score_r6 DESC, s.doc_id ASC LIMIT 19
)
SELECT doc_id, NULL::DOUBLE AS score_r6, true AS pinned
FROM (VALUES (3)) p(doc_id)
UNION ALL
SELECT doc_id, score_r6, pinned FROM org
"""


def q_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph ANN (operators/graphann) under the DuckDB gate via the
    full-candidate convention (the PQ/IVF sibling rule): NN-Descent
    builds the k-NN graph, then LocalGraphSearcher runs with
    n_seeds = n — every node is scored up front, so the beam must
    return EXACTLY the brute-force answer regardless of graph
    connectivity.  Gates init, descent iterations, the
    vector-attach joins, and the searcher end-to-end; the real
    approximate path's recall-vs-ef curve is pytest-covered
    (tests/test_graphann.py)."""
    from ics_search_engine_spark.operators.graphann import (
        LocalGraphSearcher,
        nn_descent,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    docs = emb.filter(F.col("vec_id") != 0).select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias(
            "embedding"
        ),
    )
    g = nn_descent(docs, k=8, iters=1)
    searcher = LocalGraphSearcher(docs, g)
    n = docs.count()
    rows = searcher.search(
        [float(x) for x in qvec], k=20, ef=n, n_seeds=n
    )
    return spark.createDataFrame(
        [(int(i), round(float(s), 6)) for i, s in rows],
        "vec_id long, cosine_r6 double",
    ).orderBy(F.desc("cosine_r6"), F.asc("vec_id"))


def q_graph_index_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The persisted graph-ANN artifact end-to-end (operators/graphann.
    build_graph_index → LocalGraphSearcher.from_index): NN-Descent
    graph + vectors written as sorted parquet, reloaded with pyarrow
    (no Spark at query time), searched under the full-candidate
    convention (n_seeds = ef = n) — must reproduce the brute-force
    oracle exactly, same rule as knn_graph/vector_index_serve."""
    import shutil
    import tempfile

    from ics_search_engine_spark.operators.graphann import (
        LocalGraphSearcher,
        build_graph_index,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    docs = emb.filter(F.col("vec_id") != 0).select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias(
            "embedding"
        ),
    )
    out = tempfile.mkdtemp(prefix="gate_graphidx_")
    try:
        build_graph_index(spark, docs, out, k=8, iters=1)
        searcher = LocalGraphSearcher.from_index(out)
        n = docs.count()
        rows = searcher.search(
            [float(x) for x in qvec], k=20, ef=n, n_seeds=n
        )
    finally:
        shutil.rmtree(out, ignore_errors=True)
    return spark.createDataFrame(
        [(int(i), round(float(s), 6)) for i, s in rows],
        "vec_id long, cosine_r6 double",
    ).orderBy(F.desc("cosine_r6"), F.asc("vec_id"))


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "doc_token_stats": q_doc_token_stats,
    "postings_tf": q_postings_tf,
    "term_df": q_term_df,
    "tfidf_reference_formula": q_tfidf,
    "bm25_topk_docs": q_bm25_topk,
    "simhash32": q_simhash32,
    "exact_dup_groups": q_exact_dup_groups,
    "minhash_sig": q_minhash_sig,
    "shingle_fingerprint": q_shingle_fingerprint,
    "quality_scores": q_quality_scores,
    "knn_cosine": q_knn_cosine,
    "knn_cosine_ivf": q_knn_cosine_ivf,
    "events_hourly": q_events_hourly,
    "lang_source_profile": q_lang_source_profile,
    "phrase_match": q_phrase_match,
    "user_sessions": q_user_sessions,
    "minhash_band_pairs": q_minhash_band_pairs,
    "ngram_jaccard_pairs": q_ngram_jaccard_pairs,
    "embedding_near_dup": q_embedding_near_dup,
    "bm25_engine_packed": q_bm25_engine_packed,
    "bm25_engine_segmented": q_bm25_engine_segmented,
    "bm25_engine_deletes": q_bm25_engine_deletes,
    "bm25_engine_upsert": q_bm25_engine_upsert,
    "bm25_convs_engine": q_bm25_convs_engine,
    "bm25_convs_engine_sum": q_bm25_convs_engine_sum,
    "bm25_collapse_engine": q_bm25_collapse_engine,
    "bm25_engine_merge_acc": q_bm25_engine_merge_acc,
    "phrase_engine_packed": q_phrase_engine_packed,
    "near_engine_packed": q_near_engine_packed,
    "near_ordered_engine": q_near_ordered_engine,
    "iceberg_time_travel": q_iceberg_time_travel,
    "index_stats_engine": q_index_stats_engine,
    "bm25_wildcard_engine": q_bm25_wildcard_engine,
    "bm25_suffix_engine": q_bm25_suffix_engine,
    "spell_suggest_engine": q_spell_suggest_engine,
    "spell_suggest_symspell": q_spell_suggest_symspell,
    "lmd_engine_packed": q_lmd_engine_packed,
    "bm25_synonyms_engine": q_bm25_synonyms_engine,
    "bm25_prf_engine": q_bm25_prf_engine,
    "more_like_this_engine": q_more_like_this_engine,
    "facet_counts": q_facet_counts,
    "bm25_explain_engine": q_bm25_explain_engine,
    "snippets_engine": q_snippets_engine,
    "qlang_engine": q_qlang_engine,
    "bm25_fuzzy_engine": q_bm25_fuzzy_engine,
    "bm25_fuzzy_symspell": q_bm25_fuzzy_symspell,
    "term_pmi_pairs": q_term_pmi_pairs,
    "bm25_boosted_roles": q_bm25_boosted_roles,
    "blend_rank": q_blend_rank,
    "blend_rank_repeated": q_blend_rank_repeated,
    "bm25_conjunctive": q_bm25_conjunctive,
    "bm25_filtered": q_bm25_filtered,
    "bm25_filtered_engine": q_bm25_filtered_engine,
    "turn_context": q_turn_context,
    "hybrid_rrf": q_hybrid_rrf,
    "hybrid_minmax": q_hybrid_minmax,
    "bm25_msm_engine": q_bm25_msm_engine,
    "bm25_page2_engine": q_bm25_page2_engine,
    "bm25_regex_engine": q_bm25_regex_engine,
    "facet_date_histogram": q_facet_date_histogram,
    "term_vectors_engine": q_term_vectors_engine,
    "bm25_rescore_engine": q_bm25_rescore_engine,
    "significant_terms": q_significant_terms,
    "qlang_boost_engine": q_qlang_boost_engine,
    "bm25_delete_by_query": q_bm25_delete_by_query,
    "bool_query_engine": q_bool_query_engine,
    "phrase_prefix_engine": q_phrase_prefix_engine,
    "bm25_decay_engine": q_bm25_decay_engine,
    "top_hits_engine": q_top_hits_engine,
    "match_stats_engine": q_match_stats_engine,
    "cardinality_engine": q_cardinality_engine,
    "histogram_agg": q_histogram_agg,
    "range_agg": q_range_agg,
    "filters_agg": q_filters_agg,
    "date_histo_pipeline": q_date_histo_pipeline,
    "composite_page2": q_composite_page2,
    "multi_match_best": q_multi_match_best,
    "multi_match_cross": q_multi_match_cross,
    "percentiles_agg": q_percentiles_agg,
    "completion_suggest": q_completion_suggest,
    "adjacency_matrix_agg": q_adjacency_matrix,
    "bucket_pipeline": q_bucket_pipeline,
    "knn_filtered": q_knn_filtered,
    "has_parent_engine": q_has_parent_engine,
    "weighted_avg_agg": q_weighted_avg,
    "top_metrics_agg": q_top_metrics,
    "boosting_engine": q_boosting_engine,
    "pinned_engine": q_pinned_engine,
    "auto_date_histo": q_auto_date_histo,
    "serial_diff_rate": q_serial_diff_rate,
    "diversified_topk": q_diversified_topk,
    "rare_terms_agg": q_rare_terms_agg,
    "snapshot_restore": q_snapshot_restore,
    "sql_surface_stats": q_sql_surface_stats,
    "index_profile": q_index_profile,
    "span_first_engine": q_span_first_engine,
    "random_score_engine": q_random_score_engine,
    "terms_set_engine": q_terms_set_engine,
    "extended_stats_agg": q_extended_stats_agg,
    "boxplot_agg": q_boxplot_agg,
    "percentile_ranks_agg": q_percentile_ranks_agg,
    "mad_agg": q_mad_agg,
    "string_stats_agg": q_string_stats_agg,
    "matrix_stats_agg": q_matrix_stats_agg,
    "multi_terms_agg": q_multi_terms_agg,
    "t_test_agg": q_t_test_agg,
    "normalize_pipeline": q_normalize_pipeline,
    "percolate_match": q_percolate_match,
    "phrase_suggest": q_phrase_suggest,
    "federated_boost": q_federated_boost,
    "knn_pq": q_knn_pq,
    "rank_feature_engine": q_rank_feature_engine,
    "combined_fields_engine": q_combined_fields,
    "distance_feature_engine": q_distance_feature,
    "match_bool_prefix_engine": q_match_bool_prefix,
    "knn_ivfadc": q_knn_ivfadc,
    "mlt_unlike_engine": q_mlt_unlike,
    "vector_index_serve": q_vector_index_serve,
    "geo_distance_engine": q_geo_distance_engine,
    "geo_sort_engine": q_geo_sort_engine,
    "geotile_grid_agg": q_geotile_grid,
    "geo_distance_rings": q_geo_distance_rings,
    "token_counts": q_token_counts,
    "bm25_custom_sim": q_bm25_custom_sim,
    "geo_centroid_agg": q_geo_centroid,
    "geo_bounds_agg": q_geo_bounds,
    "bm25_update_by_query": q_bm25_update_by_query,
    "sampler_terms_agg": q_sampler_terms,
    "intervals_engine": q_intervals_engine,
    "script_score_engine": q_script_score_engine,
    "bm25_reindex_engine": q_bm25_reindex_engine,
    "bm25_scroll_engine": q_bm25_scroll_engine,
    "seg_after_engine": q_seg_after_engine,
    "bm25_sliced_engine": q_bm25_sliced_engine,
    "terms_enum_engine": q_terms_enum_engine,
    "cumulative_cardinality_agg": q_cumulative_cardinality,
    "bucket_script_agg": q_bucket_script_agg,
    "intervals_filter_engine": q_intervals_filter_engine,
    "rollup_search_agg": q_rollup_search,
    "transform_latest": q_transform_latest,
    "transform_pivot": q_transform_pivot,
    "rank_eval_metrics": q_rank_eval,
    "msearch_engine": q_msearch_engine,
    "count_matches_engine": q_count_matches,
    "sort_by_field_engine": q_sort_by_field,
    "missing_count_agg": q_missing_agg,
    "moving_fn_agg": q_moving_fn,
    "terms_shard_agg": q_terms_shard_agg,
    "analyze_api": q_analyze_api,
    "spell_missing_mode": q_spell_missing_mode,
    "scripted_metric_agg": q_scripted_metric,
    "explain_doc_engine": q_explain_doc,
    "field_caps_engine": q_field_caps,
    "dis_max_engine": q_dis_max,
    "mget_engine": q_mget,
    "eql_sequence": q_eql_sequence,
    "eql_until": q_eql_until,
    "eql_forbid": q_eql_forbid,
    "ngram_contamination": q_ngram_contamination,
    "categorize_text_agg": q_categorize_text,
    "change_point_agg": q_change_point,
    "esql_stats": q_esql_stats,
    "frequent_item_sets_agg": q_frequent_item_sets,
    "ks_test_agg": q_ks_test,
    "bucket_correlation_agg": q_bucket_correlation,
    "variable_width_histo": q_variable_width_histogram,
    "pack_chunks": q_pack_chunks,
    "stratified_sample": q_stratified_sample,
    "mix_sources": q_mix_sources,
    "filter_funnel": q_filter_funnel,
    "near_dup_components": q_near_dup_components,
    "quantize_int8": q_quantize_int8,
    "knn_int8_rerank": q_knn_int8_rerank,
    "shuffled_head": q_shuffled_head,
    "curriculum_head": q_curriculum_head,
    "quantize_binary": q_quantize_binary,
    "knn_binary_rerank": q_knn_binary_rerank,
    "maxsim_rerank": q_maxsim_rerank,
    "sparse_vector_engine": q_sparse_vector_engine,
    "ltr_rescore_engine": q_ltr_rescore_engine,
    "search_template": q_search_template,
    "domain_cap": q_domain_cap,
    "c4_line_filter": q_c4_line_filter,
    "bpe_encode": q_bpe_encode,
    "span_corruption": q_span_corruption,
    "hybrid_sparse_rrf": q_hybrid_sparse_rrf,
    "sparse_vector_serve": q_sparse_vector_serve,
    "shuffle_resume_page": q_shuffle_resume_page,
    "bpe_fertility_by_lang": q_bpe_fertility_by_lang,
    "doc_chunks": q_doc_chunks,
    "fim_transform": q_fim_transform,
    "query_rules_engine": q_query_rules_engine,
    "ingest_pipeline": q_ingest_pipeline,
    "substring_dedup": q_substring_dedup,
    "semantic_chunks": q_semantic_chunks,
    "chunk_manifest": q_chunk_manifest,
    "sparse_quantized": q_sparse_quantized,
    "sparse_maxscore_serve": q_sparse_maxscore_serve,
    "sparse_packed_serve": q_sparse_packed_serve,
    "search_application": q_search_application,
    "knn_graph": q_knn_graph,
    "graph_index_serve": q_graph_index_serve,
    "esql_inlinestats": q_esql_inlinestats,
    "esql_lookup": q_esql_lookup,
    "esql_sample": q_esql_sample,
    "esql_change_point": q_esql_change_point,
    "repetition_signals": q_repetition_signals,
    "unigram_nll": q_unigram_nll,
    "bigram_nll": q_bigram_nll,
    "dsir_weights": q_dsir_weights,
    "dsir_select": q_dsir_select,
    "sft_pairs": q_sft_pairs,
    "conversation_stats": q_conversation_stats,
    "conv_exact_dups": q_conv_exact_dups,
    "conv_near_dups": q_conv_near_dups,
    "chat_corpus_report": q_chat_corpus_report,
    "conv_token_trim": q_conv_token_trim,
    "conv_validity": q_conv_validity,
    "mix_sources_epochs": q_mix_sources_epochs,
    "pack_bins_ffd": q_pack_bins_ffd,
    "dedup_lines": q_dedup_lines,
    "scrub_pii": q_scrub_pii,
    "classifier_score": q_classifier_score,
    "retriever_tree": q_retriever_tree,
    "esql_fork_fuse": q_esql_fork_fuse,
    "decontaminated_split": q_decontaminated_split,
    "semdedup": q_semdedup,
    "corpus_report": q_corpus_report,
    "script_ratios": q_script_ratios,
    "eql_text": q_eql_text,
    "conv_dedup_transitive": q_conv_dedup_transitive,
    "rank_eval_engine": q_rank_eval_engine,
}

ORACLE_SQL: dict[str, str] = {
    "doc_token_stats": _SQL_DOC_TOKEN_STATS,
    "postings_tf": _SQL_POSTINGS_TF,
    "term_df": _SQL_TERM_DF,
    "tfidf_reference_formula": _SQL_TFIDF,
    "bm25_topk_docs": _SQL_BM25_TOPK,
    "simhash32": _SQL_SIMHASH32,
    "exact_dup_groups": _SQL_EXACT_DUP,
    "minhash_sig": _SQL_MINHASH_SIG,
    "shingle_fingerprint": _SQL_SHINGLE_FP,
    "quality_scores": _SQL_QUALITY,
    "knn_cosine": _SQL_KNN_COSINE,
    # full-probe IVF must equal brute force exactly — same oracle
    "knn_cosine_ivf": _SQL_KNN_COSINE,
    "events_hourly": _SQL_EVENTS_HOURLY,
    "lang_source_profile": _SQL_LANG_SOURCE,
    "phrase_match": _SQL_PHRASE,
    "user_sessions": _SQL_SESSIONS,
    "minhash_band_pairs": _SQL_MINHASH_BAND_PAIRS,
    "ngram_jaccard_pairs": _SQL_NGRAM_JACCARD_PAIRS,
    "embedding_near_dup": _SQL_EMB_NEAR_DUP,
    "bm25_engine_packed": _SQL_BM25_ENGINE,
    "bm25_engine_segmented": _SQL_BM25_ENGINE,
    "bm25_engine_deletes": _SQL_BM25_ENGINE_DELETES,
    "bm25_engine_upsert": _SQL_BM25_ENGINE_UPSERT,
    "bm25_convs_engine": _SQL_BM25_CONVS,
    "bm25_convs_engine_sum": _SQL_BM25_CONVS_SUM,
    "bm25_collapse_engine": _SQL_BM25_COLLAPSE,
    "bm25_engine_merge_acc": _SQL_BM25_ENGINE,
    "phrase_engine_packed": _SQL_PHRASE_ENGINE,
    "near_engine_packed": _SQL_NEAR_ENGINE,
    "near_ordered_engine": _SQL_NEAR_ORDERED,
    "iceberg_time_travel": _SQL_ICEBERG_TT,
    "index_stats_engine": _SQL_INDEX_STATS,
    "bm25_wildcard_engine": _SQL_BM25_WILDCARD,
    "bm25_suffix_engine": _SQL_BM25_SUFFIX,
    "spell_suggest_engine": _SQL_SPELL_SUGGEST,
    "spell_suggest_symspell": _SQL_SPELL_SUGGEST,
    "lmd_engine_packed": _SQL_LMD_ENGINE,
    "bm25_synonyms_engine": _SQL_BM25_SYNONYMS,
    "bm25_prf_engine": _SQL_BM25_PRF,
    "more_like_this_engine": _SQL_MLT_ENGINE,
    "facet_counts": _SQL_FACETS,
    "bm25_explain_engine": _SQL_EXPLAIN,
    "snippets_engine": _SQL_SNIPPETS,
    "qlang_engine": _SQL_QLANG,
    "bm25_fuzzy_engine": _SQL_FUZZY,
    "bm25_fuzzy_symspell": _SQL_FUZZY,
    "term_pmi_pairs": _SQL_PMI,
    "bm25_boosted_roles": _SQL_BM25_BOOSTED,
    "blend_rank": _SQL_BLEND,
    "blend_rank_repeated": _SQL_BLEND_REPEATED,
    "bm25_conjunctive": _SQL_BM25_CONJ,
    "bm25_filtered": _SQL_BM25_FILTERED,
    # the packed engine's filtered path must reproduce the identical
    # relational filter-query
    "bm25_filtered_engine": _SQL_BM25_FILTERED,
    "turn_context": _SQL_TURN_CONTEXT,
    "hybrid_rrf": _SQL_HYBRID_RRF,
    "hybrid_minmax": _SQL_HYBRID_MINMAX,
    "bm25_msm_engine": _SQL_BM25_MSM,
    "bm25_page2_engine": _SQL_BM25_PAGE2,
    "bm25_regex_engine": _SQL_BM25_REGEX,
    "facet_date_histogram": _SQL_DATE_HISTO,
    "term_vectors_engine": _SQL_TERM_VECTORS,
    "bm25_rescore_engine": _SQL_RESCORE,
    "significant_terms": _SQL_SIGTERMS,
    "qlang_boost_engine": _SQL_QLANG_BOOST,
    "bm25_delete_by_query": _SQL_DELETE_BY_QUERY,
    "bool_query_engine": _SQL_BOOL_QUERY,
    "phrase_prefix_engine": _SQL_PHRASE_PREFIX,
    "bm25_decay_engine": _SQL_BM25_DECAY,
    "top_hits_engine": _SQL_TOP_HITS,
    "match_stats_engine": _SQL_MATCH_STATS,
    "cardinality_engine": _SQL_CARDINALITY,
    "histogram_agg": _SQL_HISTOGRAM,
    "range_agg": _SQL_RANGE_AGG,
    "filters_agg": _SQL_FILTERS_AGG,
    "date_histo_pipeline": _SQL_DATE_HISTO_PIPELINE,
    "composite_page2": _SQL_COMPOSITE_PAGE2,
    "multi_match_best": _SQL_MULTI_MATCH_BEST,
    "multi_match_cross": _SQL_MULTI_MATCH_CROSS,
    "percentiles_agg": _SQL_PERCENTILES,
    "completion_suggest": _SQL_COMPLETION,
    "adjacency_matrix_agg": _SQL_ADJACENCY,
    "bucket_pipeline": _SQL_BUCKET_PIPELINE,
    "knn_filtered": _SQL_KNN_FILTERED,
    "has_parent_engine": _SQL_HAS_PARENT,
    "weighted_avg_agg": _SQL_WEIGHTED_AVG,
    "top_metrics_agg": _SQL_TOP_METRICS,
    "boosting_engine": _SQL_BOOSTING,
    "pinned_engine": _SQL_PINNED,
    "auto_date_histo": _SQL_AUTO_DATE_HISTO,
    "serial_diff_rate": _SQL_SERIAL_DIFF_RATE,
    "diversified_topk": _SQL_DIVERSIFIED,
    "rare_terms_agg": _SQL_RARE_TERMS,
    # restored state must rank as the ORIGINAL corpus
    "snapshot_restore": _SQL_BM25_ENGINE,
    # the SQL surface must reproduce the DataFrame-API tokenization
    "sql_surface_stats": _SQL_DOC_TOKEN_STATS,
    "index_profile": _SQL_INDEX_PROFILE,
    "span_first_engine": _SQL_SPAN_FIRST,
    "random_score_engine": _SQL_RANDOM_SCORE,
    "terms_set_engine": _SQL_TERMS_SET,
    "extended_stats_agg": _SQL_EXTENDED_STATS,
    "boxplot_agg": _SQL_BOXPLOT,
    "percentile_ranks_agg": _SQL_PERCENTILE_RANKS,
    "mad_agg": _SQL_MAD,
    "string_stats_agg": _SQL_STRING_STATS,
    "matrix_stats_agg": _SQL_MATRIX_STATS,
    "multi_terms_agg": _SQL_MULTI_TERMS,
    "t_test_agg": _SQL_T_TEST,
    "normalize_pipeline": _SQL_NORMALIZE,
    "percolate_match": _SQL_PERCOLATE,
    "phrase_suggest": _SQL_PHRASE_SUGGEST,
    "federated_boost": _SQL_FEDERATED,
    "knn_pq": _SQL_KNN_COSINE,
    "rank_feature_engine": _SQL_RANK_FEATURE,
    "combined_fields_engine": _SQL_COMBINED_FIELDS,
    "distance_feature_engine": _SQL_DISTANCE_FEATURE,
    "match_bool_prefix_engine": _SQL_MATCH_BOOL_PREFIX,
    "knn_ivfadc": _SQL_KNN_COSINE,
    "mlt_unlike_engine": _SQL_MLT_UNLIKE,
    "vector_index_serve": _SQL_KNN_COSINE,
    "geo_distance_engine": _SQL_GEO_DISTANCE,
    "geo_sort_engine": _SQL_GEO_SORT,
    "geotile_grid_agg": _SQL_GEOTILE,
    "geo_distance_rings": _SQL_GEO_RINGS,
    "token_counts": _SQL_TOKEN_COUNTS,
    "bm25_custom_sim": _SQL_CUSTOM_SIM,
    "geo_centroid_agg": _SQL_GEO_CENTROID,
    "geo_bounds_agg": _SQL_GEO_BOUNDS,
    "bm25_update_by_query": _SQL_UPDATE_BY_QUERY,
    "sampler_terms_agg": _SQL_SAMPLER_TERMS,
    "intervals_engine": _SQL_INTERVALS,
    "script_score_engine": _SQL_SCRIPT_SCORE,
    "bm25_reindex_engine": _SQL_BM25_REINDEX,
    "bm25_scroll_engine": _SQL_BM25_SCROLL,
    # the segmented ranking is defined bit-identical to one index over
    # the union, so page 2 shares the packed page-2 oracle
    "seg_after_engine": _SQL_BM25_PAGE2,
    "bm25_sliced_engine": _SQL_BM25_SLICED,
    "terms_enum_engine": _SQL_TERMS_ENUM,
    "cumulative_cardinality_agg": _SQL_CUM_CARDINALITY,
    "bucket_script_agg": _SQL_BUCKET_SCRIPT,
    "intervals_filter_engine": _SQL_INTERVALS_FILTER,
    "rollup_search_agg": _SQL_ROLLUP_SEARCH,
    "transform_latest": _SQL_TRANSFORM_LATEST,
    "transform_pivot": _SQL_TRANSFORM_PIVOT,
    "rank_eval_metrics": _SQL_RANK_EVAL,
    "msearch_engine": _SQL_MSEARCH,
    "count_matches_engine": _SQL_COUNT_MATCHES,
    "sort_by_field_engine": _SQL_SORT_BY_FIELD,
    "missing_count_agg": _SQL_MISSING_AGG,
    "moving_fn_agg": _SQL_MOVING_FN,
    "terms_shard_agg": _SQL_TERMS_SHARD,
    "analyze_api": _SQL_ANALYZE,
    "spell_missing_mode": _SQL_SPELL_MISSING,
    "scripted_metric_agg": _SQL_SCRIPTED_METRIC,
    "explain_doc_engine": _SQL_EXPLAIN_DOC,
    "field_caps_engine": _SQL_FIELD_CAPS,
    "dis_max_engine": _SQL_DIS_MAX,
    "mget_engine": _SQL_MGET,
    "eql_sequence": _SQL_EQL_SEQUENCE,
    "eql_until": _SQL_EQL_UNTIL,
    "eql_forbid": _SQL_EQL_FORBID,
    "ngram_contamination": _SQL_NGRAM_CONTAMINATION,
    "categorize_text_agg": _SQL_CATEGORIZE_TEXT,
    "change_point_agg": _SQL_CHANGE_POINT,
    "esql_stats": _SQL_ESQL_STATS,
    "frequent_item_sets_agg": _SQL_FREQUENT_ITEM_SETS,
    "ks_test_agg": _SQL_KS_TEST,
    "bucket_correlation_agg": _SQL_BUCKET_CORRELATION,
    "variable_width_histo": _SQL_VARIABLE_WIDTH_HISTOGRAM,
    "pack_chunks": _SQL_PACK_CHUNKS,
    "stratified_sample": _SQL_STRATIFIED_SAMPLE,
    "mix_sources": _SQL_MIX_SOURCES,
    "filter_funnel": _SQL_FILTER_FUNNEL,
    "near_dup_components": _SQL_NEAR_DUP_COMPONENTS,
    "quantize_int8": _SQL_QUANTIZE_INT8,
    "knn_int8_rerank": _SQL_KNN_COSINE,
    "shuffled_head": _SQL_SHUFFLED_HEAD,
    "curriculum_head": _SQL_CURRICULUM_HEAD,
    "quantize_binary": _SQL_QUANTIZE_BINARY,
    "knn_binary_rerank": _SQL_KNN_COSINE,
    "maxsim_rerank": _SQL_MAXSIM_RERANK,
    "sparse_vector_engine": _SQL_SPARSE_VECTOR,
    "ltr_rescore_engine": _SQL_LTR_RESCORE,
    "search_template": _SQL_SEARCH_TEMPLATE,
    "domain_cap": _SQL_DOMAIN_CAP,
    "c4_line_filter": _SQL_C4_LINE_FILTER,
    "bpe_encode": _SQL_BPE_ENCODE,
    "span_corruption": _SQL_SPAN_CORRUPTION,
    "hybrid_sparse_rrf": _SQL_HYBRID_SPARSE_RRF,
    "sparse_vector_serve": _SQL_SPARSE_VECTOR,
    "shuffle_resume_page": _SQL_SHUFFLE_RESUME_PAGE,
    "bpe_fertility_by_lang": _SQL_BPE_FERTILITY,
    "doc_chunks": _SQL_DOC_CHUNKS,
    "fim_transform": _SQL_FIM_TRANSFORM,
    "query_rules_engine": _SQL_QUERY_RULES,
    "ingest_pipeline": _SQL_INGEST_PIPELINE,
    "substring_dedup": _SQL_SUBSTRING_DEDUP,
    "semantic_chunks": _SQL_SEMANTIC_CHUNKS,
    "chunk_manifest": _SQL_CHUNK_MANIFEST,
    "sparse_quantized": _SQL_SPARSE_QUANTIZED,
    "sparse_maxscore_serve": _SQL_SPARSE_VECTOR,
    "sparse_packed_serve": _SQL_SPARSE_VECTOR,
    "search_application": _SQL_SEARCH_APPLICATION,
    "knn_graph": _SQL_KNN_COSINE,
    "graph_index_serve": _SQL_KNN_COSINE,
    "esql_inlinestats": _SQL_ESQL_INLINESTATS,
    "esql_lookup": _SQL_ESQL_LOOKUP,
    "esql_sample": _SQL_ESQL_SAMPLE,
    # the command shares the change_point kernel and bucket prep
    "esql_change_point": _SQL_CHANGE_POINT,
    "repetition_signals": _SQL_REPETITION_SIGNALS,
    "unigram_nll": _SQL_UNIGRAM_NLL,
    "bigram_nll": _SQL_BIGRAM_NLL,
    "dsir_weights": _SQL_DSIR,
    "dsir_select": _SQL_DSIR_SELECT,
    "sft_pairs": _SQL_SFT_PAIRS,
    "conversation_stats": _SQL_CONVERSATION_STATS,
    "conv_exact_dups": _SQL_CONV_EXACT_DUPS,
    "conv_near_dups": _SQL_CONV_NEAR_DUPS,
    "chat_corpus_report": _SQL_CHAT_CORPUS_REPORT,
    "conv_token_trim": _SQL_CONV_TOKEN_TRIM,
    "conv_validity": _SQL_CONV_VALIDITY,
    "mix_sources_epochs": _SQL_MIX_SOURCES_EPOCHS,
    # pack_bins_ffd: FFD is non-SQL-expressible — rows-only check by
    # design; invariants are pytest-pinned (tests/test_datapipe.py)
    "dedup_lines": _SQL_DEDUP_LINES,
    "scrub_pii": _SQL_SCRUB_PII,
    "classifier_score": _SQL_CLASSIFIER_SCORE,
    "retriever_tree": _SQL_RETRIEVER_TREE,
    "esql_fork_fuse": _SQL_ESQL_FORK_FUSE,
    "decontaminated_split": _SQL_DECONTAMINATED_SPLIT,
    "semdedup": _SQL_SEMDEDUP,
    "corpus_report": _SQL_CORPUS_REPORT,
    "script_ratios": _SQL_SCRIPT_RATIOS,
    # the text frontend compiles to the same engine call as eql_sequence
    "eql_text": _SQL_EQL_SEQUENCE,
    "conv_dedup_transitive": _SQL_CONV_DEDUP_TRANSITIVE,
    "rank_eval_engine": _SQL_RANK_EVAL_ENGINE,
}
