"""Result-set aggregations: top_hits, stats, and cardinality over a
query's full match set.

A search page shows more than ranked hits and facet counts: per-bucket
best hits (Lucene/ES ``top_hits``), numeric summaries of a doc-value
over the matches (ES ``stats``: count/min/max/sum/avg), and distinct
counts of an attribute (ES ``cardinality``).  The reference has none of
this — its result surface is a ranked URL list
(/root/reference/search.py:200-210) — so these are engine extensions
over the same packed-index match set that powers faceting
(operators/facets.matched_docs).

Scale shapes (the 100 TB question, per aggregation):

* ``top_hits`` — the match set is scored exhaustively (score_all: one
  shuffle on doc_ord), then cut to k per bucket in TWO phases: a local
  rank inside (bucket, salt) partitions bounds any one sort to a
  1/``presplit`` slice of a hot bucket, then the global per-bucket rank
  sees ≤ presplit × k rows per bucket.  A single window over a hot
  bucket (every doc in one ``role``) would otherwise sort the whole
  match set on one task.
* ``match_stats`` / ``cardinality`` — pure hash-agg rollups:
  matched set → docmap join (co-keyed, doc-count-sized) → attrs join →
  groupBy.  Output is |buckets| rows; nothing collects.  Exact distinct
  adds one extra shuffle (the distinct); the approx variant
  (``approx_count_distinct``, HLL++) is single-pass and is the 100 TB
  default — exact is kept because the driver gate needs a value DuckDB
  can reproduce bit-for-bit.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ics_search_engine_spark.operators.facets import matched_docs
from ics_search_engine_spark.operators.packed_index import (
    PackedIndex,
    decode_matched,
)
from ics_search_engine_spark.operators.query import query_weights, score_all
from ics_search_engine_spark.textproc.tokenizer import tokenize


def scored_matches(
    spark: SparkSession,
    pidx: PackedIndex,
    query: str,
    min_match: int | None = None,
) -> DataFrame:
    """Every matched doc with its full BM25 score → (doc_ord, score).
    The shared front half of top_hits and any scored whole-match-set
    analytics; same decode → broadcast-weight join → deterministic fold
    as the ranked path (operators/query.score_all), minus the top-k cut.
    """
    do_stem = pidx.stats.get("stem", True)
    q_terms = sorted(set(tokenize(query, for_query=True, do_stem=do_stem)))
    empty = spark.createDataFrame([], "doc_ord long, score double")
    if not q_terms:
        return empty
    term_df = pidx.df_for_terms(q_terms)
    weights = query_weights(query, term_df, pidx.n_docs, do_stem=do_stem)
    if not weights:
        return empty
    matched = pidx.index.filter(F.col("term").isin(sorted(weights)))
    posts = decode_matched(matched)
    return score_all(
        spark, posts, weights, pidx.avgdl, ["doc_ord"], min_match=min_match
    )


def top_hits(
    spark: SparkSession,
    pidx: PackedIndex,
    query: str,
    attrs: DataFrame,
    bucket_col: str,
    k: int = 3,
    presplit: int = 32,
) -> DataFrame:
    """Top-k hits per bucket of ``attrs.<bucket_col>`` →
    (bucket_col, rank, conv_id, turn_idx, score), rank 1..k inside each
    bucket by (score desc, conv_id asc, turn_idx asc).

    ``presplit`` is the hot-bucket split factor: phase 1 ranks inside
    (bucket, pmod(doc_ord, presplit)) so no single task sorts a whole
    hot bucket; phase 2 ranks the surviving ≤ presplit × k rows per
    bucket.  presplit=1 degenerates to the single-window plan (used by
    tests to prove the two-phase cut is exact)."""
    scored = scored_matches(spark, pidx, query)
    keyed = (
        pidx.docmap.select("doc_ord", "conv_id", "turn_idx")
        .join(scored, "doc_ord")
        .join(attrs, ["conv_id", "turn_idx"])
        .select(bucket_col, "conv_id", "turn_idx", "score", "doc_ord")
    )
    order = [F.desc("score"), F.asc("conv_id"), F.asc("turn_idx")]
    if presplit > 1:
        local = Window.partitionBy(
            bucket_col, F.pmod(F.col("doc_ord"), F.lit(presplit))
        ).orderBy(*order)
        keyed = (
            keyed.withColumn("_lr", F.row_number().over(local))
            .filter(F.col("_lr") <= k)
            .drop("_lr")
        )
    final = Window.partitionBy(bucket_col).orderBy(*order)
    return (
        keyed.withColumn("rank", F.row_number().over(final))
        .filter(F.col("rank") <= k)
        .select(bucket_col, "rank", "conv_id", "turn_idx", "score")
        .orderBy(F.asc(bucket_col), F.asc("rank"))
    )


def _matched_attrs(
    spark: SparkSession,
    pidx: PackedIndex,
    query: str,
    attrs: DataFrame,
    conjunctive: bool = False,
) -> DataFrame:
    """Match set joined to its doc-values — the shared front half of
    every aggregation below (same co-keyed join shape as facet_counts;
    nothing collects)."""
    docs = matched_docs(spark, pidx, query, conjunctive=conjunctive)
    return (
        pidx.docmap.join(docs, "doc_ord")
        .select("conv_id", "turn_idx")
        .join(attrs, ["conv_id", "turn_idx"])
    )


def match_stats(
    spark: SparkSession,
    pidx: PackedIndex,
    query: str,
    attrs: DataFrame,
    value_col: str,
    bucket_col: str | None = None,
    conjunctive: bool = False,
) -> DataFrame:
    """ES stats aggregation over the match set: count / min / max / sum
    of ``attrs.<value_col>`` (a numeric doc value), optionally per
    ``bucket_col`` → (bucket?, n_docs, min_v, max_v, sum_v).

    The mean is NOT emitted: cross-engine float division belongs to the
    caller (``sum_v / n_docs``, rounded to taste) — sums here stay in
    the value column's integer/exact type so the driver gate can hash
    them (module docstring, entry_queries.py 'no cross-row float sums').
    """
    keyed = _matched_attrs(spark, pidx, query, attrs, conjunctive)
    aggs = [
        F.count("*").alias("n_docs"),
        F.min(value_col).alias("min_v"),
        F.max(value_col).alias("max_v"),
        F.sum(value_col).alias("sum_v"),
    ]
    if bucket_col is None:
        return keyed.agg(*aggs)
    return keyed.groupBy(bucket_col).agg(*aggs).orderBy(F.asc(bucket_col))


def cardinality(
    spark: SparkSession,
    pidx: PackedIndex,
    query: str,
    attrs: DataFrame,
    card_col: str,
    bucket_col: str | None = None,
    exact: bool = True,
    rsd: float = 0.05,
    conjunctive: bool = False,
) -> DataFrame:
    """ES cardinality aggregation: distinct values of
    ``attrs.<card_col>`` across the match set, optionally per bucket →
    (bucket?, n_distinct).

    ``exact=True`` → countDistinct (an extra shuffle keyed on the
    value — exact, gate-able); ``exact=False`` → HLL++
    (approx_count_distinct at ``rsd``), single-pass and
    constant-memory per bucket — the 100 TB default, tested against the
    exact path's value within the rsd bound."""
    keyed = _matched_attrs(spark, pidx, query, attrs, conjunctive)
    agg = (
        F.countDistinct(card_col)
        if exact
        else F.approx_count_distinct(card_col, rsd)
    ).alias("n_distinct")
    if bucket_col is None:
        return keyed.agg(agg)
    return keyed.groupBy(bucket_col).agg(agg).orderBy(F.asc(bucket_col))


def histogram(
    spark: SparkSession,
    pidx: PackedIndex,
    query: str,
    attrs: DataFrame,
    value_col: str,
    interval: int,
    conjunctive: bool = False,
) -> DataFrame:
    """ES histogram aggregation: matched-doc count per fixed-width
    numeric bucket → (bucket_lo, n_docs), bucket_lo = floor(v /
    interval) · interval, ordered by bucket.  Empty buckets don't
    appear (zero-fill is presentation).  Same hash-agg rollup shape as
    facet_counts — |buckets| rows out, nothing collects."""
    keyed = _matched_attrs(spark, pidx, query, attrs, conjunctive)
    bucket = (
        F.floor(F.col(value_col) / F.lit(interval)) * F.lit(interval)
    ).cast("long")
    return (
        keyed.groupBy(bucket.alias("bucket_lo"))
        .agg(F.count("*").alias("n_docs"))
        .orderBy(F.asc("bucket_lo"))
    )


def range_agg(
    spark: SparkSession,
    pidx: PackedIndex,
    query: str,
    attrs: DataFrame,
    value_col: str,
    ranges: list[tuple[float | None, float | None]],
    conjunctive: bool = False,
) -> DataFrame:
    """ES range aggregation: matched-doc count per explicit [lo, hi)
    bucket → (range_key, n_docs) in the caller's range order.  Ranges
    may overlap (a doc counts in every range containing it — ES
    semantics), so each range is summed as an independent 0/1 column in
    ONE pass over the matched set (the filters_agg shape) — no
    per-range rescans.  None = unbounded end; key rendered '<lo>-<hi>'
    with '*' for None."""
    if not ranges:
        return spark.createDataFrame(
            [], "range_ord int, range_key string, n_docs long"
        )
    keyed = _matched_attrs(spark, pidx, query, attrs, conjunctive)
    v = F.col(value_col)
    conds, labels = [], []
    for lo, hi in ranges:
        cond = F.lit(True)
        if lo is not None:
            cond = cond & (v >= lo)
        if hi is not None:
            cond = cond & (v < hi)
        conds.append(cond)
        lo_s = "*" if lo is None else f"{lo:g}"
        hi_s = "*" if hi is None else f"{hi:g}"
        labels.append(f"{lo_s}-{hi_s}")
    # coalesce: an empty match set must yield doc_count 0 per bucket
    # (ES semantics), not NULL (sum over zero rows)
    row = keyed.agg(
        *[
            F.coalesce(F.sum(F.when(c, 1).otherwise(0)), F.lit(0)).alias(
                f"_r{i}"
            )
            for i, c in enumerate(conds)
        ]
    )
    return row.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("range_ord"),
                        F.lit(labels[i]).alias("range_key"),
                        F.col(f"_r{i}").alias("n_docs"),
                    )
                    for i in range(len(conds))
                ]
            )
        ).alias("kv")
    ).select("kv.range_ord", "kv.range_key", "kv.n_docs").orderBy("range_ord")


def filters_agg(
    spark: SparkSession,
    pidx: PackedIndex,
    query: str,
    attrs: DataFrame,
    named_filters: dict[str, F.Column],
    conjunctive: bool = False,
) -> DataFrame:
    """ES filters aggregation: matched-doc count per NAMED predicate
    over the doc-values → (filter_key, n_docs), key asc.  Buckets may
    overlap (each predicate is independent), so this is ONE pass that
    sums each predicate as a 0/1 column — |filters| counters per
    partition, a single row out per filter, no per-filter rescans."""
    keyed = _matched_attrs(spark, pidx, query, attrs, conjunctive)
    names = sorted(named_filters)
    # positional aliases: caller names are data (F.lit below), never
    # column identifiers — dots/backticks in a name must not parse;
    # coalesce: empty match set yields 0 per bucket (ES), not NULL
    row = keyed.agg(
        *[
            F.coalesce(
                F.sum(F.when(named_filters[n], 1).otherwise(0)), F.lit(0)
            ).alias(f"_c{i}")
            for i, n in enumerate(names)
        ]
    )
    return (
        row.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(n).alias("filter_key"),
                            F.col(f"_c{i}").alias("n_docs"),
                        )
                        for i, n in enumerate(names)
                    ]
                )
            ).alias("kv")
        )
        .select("kv.filter_key", "kv.n_docs")
        .orderBy("filter_key")
    )


def weighted_avg(
    spark: SparkSession,
    pidx: PackedIndex,
    query: str,
    attrs: DataFrame,
    value_col: str,
    weight_col: str,
    bucket_col: str | None = None,
    conjunctive: bool = False,
) -> DataFrame:
    """ES weighted_avg aggregation over the match set →
    (bucket?, num, den, wavg): num = Σ value·weight, den = Σ weight,
    wavg = num/den (NULL when den = 0, ES's empty-bucket value).
    num/den stay in the inputs' exact type (integer inputs → exact
    integer sums, hash-able by the driver gate); the division is the
    only float.  One hash-agg pass, |buckets| rows."""
    keyed = _matched_attrs(spark, pidx, query, attrs, conjunctive)
    aggs = [
        F.sum(F.col(value_col) * F.col(weight_col)).alias("num"),
        F.sum(weight_col).alias("den"),
    ]
    grouped = (
        keyed.agg(*aggs)
        if bucket_col is None
        else keyed.groupBy(bucket_col).agg(*aggs)
    )
    out = grouped.withColumn(
        "wavg",
        F.when(
            F.col("den") != 0, F.col("num") / F.col("den")
        ),
    )
    return out if bucket_col is None else out.orderBy(F.asc(bucket_col))


def top_metrics(
    spark: SparkSession,
    pidx: PackedIndex,
    query: str,
    attrs: DataFrame,
    sort_col: str,
    metric_cols: list[str],
    k: int = 1,
    ascending: bool = False,
    conjunctive: bool = False,
) -> DataFrame:
    """ES top_metrics aggregation: the metric column values from the k
    matched docs with the largest (or smallest) ``sort_col`` →
    (sort_col, metrics...), deterministic tie-break on (conv_id,
    turn_idx).  TakeOrderedAndProject over the match set — k rows
    leave the executors."""
    keyed = _matched_attrs(spark, pidx, query, attrs, conjunctive)
    lead = F.asc(sort_col) if ascending else F.desc(sort_col)
    return (
        keyed.select("conv_id", "turn_idx", sort_col, *metric_cols)
        .orderBy(lead, F.asc("conv_id"), F.asc("turn_idx"))
        .limit(k)
    )


def percentiles(
    spark: SparkSession,
    pidx: PackedIndex,
    query: str,
    attrs: DataFrame,
    value_col: str,
    ps: list[float],
    exact: bool = True,
    conjunctive: bool = False,
) -> DataFrame:
    """ES percentiles aggregation over a doc-value of the match set →
    (p, value) in the caller's order.  ``exact=True`` uses the
    linear-interpolation definition (Spark `percentile`; the same
    formula as SQL percentile_cont / DuckDB quantile_cont, so the gate
    can replay it); ``exact=False`` uses `approx_percentile`
    (t-digest-class single-pass sketch) — the 10^12 default, since the
    exact form materializes the value multiset per partition.  Both
    are ONE aggregation job; output is |ps| rows."""
    keyed = _matched_attrs(spark, pidx, query, attrs, conjunctive)
    arr = F.array(*[F.lit(float(p)) for p in ps])
    agg = (
        F.percentile(F.col(value_col), arr)
        if exact
        else F.percentile_approx(F.col(value_col), arr, 10_000)
    )
    row = keyed.agg(agg.alias("vals"))
    return row.select(
        F.posexplode("vals").alias("i", "value")
    ).select(
        F.element_at(arr, F.col("i") + 1).alias("p"),
        F.col("value").cast("double").alias("value"),
    )


def cumulative_sum(buckets: DataFrame, order_col: str, value_col: str,
                   alias: str = "cum") -> DataFrame:
    """ES cumulative_sum PIPELINE aggregation: running total of a
    parent aggregation's per-bucket metric, in bucket order.  Operates
    on ANY (bucket, value) frame (date_histogram, histogram, ...) —
    pipeline aggs are bucket-count-sized, so the single-partition
    window is driver-cheap by construction (|buckets| rows, the parent
    already reduced the corpus)."""
    w = Window.orderBy(F.asc(order_col)).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return buckets.withColumn(alias, F.sum(value_col).over(w))


def derivative(buckets: DataFrame, order_col: str, value_col: str,
               alias: str = "deriv") -> DataFrame:
    """ES derivative pipeline aggregation: first difference of the
    parent metric in bucket order; first bucket's derivative is NULL
    (ES emits no value there).  Same bucket-count-sized window note as
    cumulative_sum."""
    w = Window.orderBy(F.asc(order_col))
    return buckets.withColumn(
        alias, F.col(value_col) - F.lag(value_col, 1).over(w)
    )


def diversified_topk(
    spark: SparkSession,
    pidx: PackedIndex,
    query: str,
    attrs: DataFrame,
    key_col: str,
    max_per_key: int = 1,
    k: int = 10,
) -> DataFrame:
    """ES diversified_sampler as a ranking surface: the global top-k
    with AT MOST ``max_per_key`` docs per ``attrs.<key_col>`` value →
    (key, conv_id, turn_idx, score), score desc.  The generalization
    of field collapsing (collapse = max_per_key 1 on conv_id): a
    per-key window cut, then the global TakeOrderedAndProject — the
    same two-step shape as top_hits, so a hot key never forces a
    corpus-wide sort."""
    scored = scored_matches(spark, pidx, query)
    keyed = (
        pidx.docmap.select("doc_ord", "conv_id", "turn_idx")
        .join(scored, "doc_ord")
        .join(attrs, ["conv_id", "turn_idx"])
    )
    order = [F.desc("score"), F.asc("conv_id"), F.asc("turn_idx")]
    per_key = Window.partitionBy(key_col).orderBy(*order)
    return (
        keyed.withColumn("_r", F.row_number().over(per_key))
        .filter(F.col("_r") <= max_per_key)
        .select(key_col, "conv_id", "turn_idx", "score")
        .orderBy(*order)
        .limit(k)
    )


def rare_terms(
    spark: SparkSession,
    pidx: PackedIndex,
    query: str,
    attrs: DataFrame,
    facet_col: str,
    max_doc_count: int = 1,
    conjunctive: bool = False,
) -> DataFrame:
    """ES rare_terms aggregation: the facet values matched by AT MOST
    ``max_doc_count`` docs — the long-tail complement of the terms
    (facet) aggregation → (value, n_docs), (n_docs asc, value asc).
    Same facet rollup + a HAVING; ES approximates this with a CuckooFilter
    at scale, the exact hash-agg form here is already one shuffle."""
    keyed = _matched_attrs(spark, pidx, query, attrs, conjunctive)
    return (
        keyed.groupBy(facet_col)
        .agg(F.count("*").alias("n_docs"))
        .filter(F.col("n_docs") <= max_doc_count)
        .orderBy(F.asc("n_docs"), F.asc(facet_col))
    )


# auto_date_histogram interval ladder: (name, seconds) coarse→fine;
# ES's own ladder minus sub-hour rungs (transcript grain is seconds)
AUTO_INTERVALS = [
    ("year", 365 * 86400),
    ("quarter", 91 * 86400),
    ("month", 30 * 86400),
    ("week", 7 * 86400),
    ("day", 86400),
    ("hour", 3600),
]


def choose_auto_interval(span_seconds: float, target_buckets: int) -> str:
    """The FINEST ladder interval whose bucket count over the span
    stays ≤ target_buckets (ES auto_date_histogram's contract: 'at
    most N buckets').  Falls back to the coarsest rung."""
    chosen = AUTO_INTERVALS[0][0]
    for name, secs in AUTO_INTERVALS:
        if span_seconds / secs <= target_buckets:
            chosen = name
        else:
            break
    return chosen


def auto_date_histogram(
    spark: SparkSession,
    pidx: PackedIndex,
    query: str,
    attrs: DataFrame,
    ts_col: str,
    target_buckets: int = 10,
    conjunctive: bool = False,
) -> tuple[DataFrame, str]:
    """ES auto_date_histogram: pick the finest calendar interval that
    keeps the matched span within ``target_buckets`` buckets, then
    bucket-count like date_histogram → ((bucket, n_docs) rows,
    chosen interval name).

    Two jobs by necessity (ES pays the same shape): a min/max
    ts aggregation over the match set (2 scalars to the driver), then
    the rollup at the chosen granularity."""
    from ics_search_engine_spark.operators.facets import date_histogram

    keyed = _matched_attrs(spark, pidx, query, attrs, conjunctive)
    row = keyed.agg(
        F.min(ts_col).alias("lo"), F.max(ts_col).alias("hi")
    ).collect()[0]
    if row["lo"] is None:
        return (
            spark.createDataFrame([], "bucket timestamp, n_docs long"),
            AUTO_INTERVALS[-1][0],
        )
    span = (row["hi"] - row["lo"]).total_seconds()
    gran = choose_auto_interval(span, target_buckets)
    return (
        date_histogram(
            spark, pidx, query, attrs, ts_col, granularity=gran,
            conjunctive=conjunctive,
        ),
        gran,
    )


def rate(
    buckets: DataFrame,
    bucket_col: str,
    value_col: str,
    bucket_seconds: float,
    unit_seconds: float = 86400.0,
    alias: str = "rate",
) -> DataFrame:
    """ES rate aggregation (fixed-width parent buckets): rescale a
    per-bucket count/sum to a per-``unit`` rate —
    value · unit_seconds / bucket_seconds.  A pure column transform on
    the already-reduced frame (calendar-width parents like 'month'
    need per-bucket widths — join them on before calling)."""
    return buckets.withColumn(
        alias,
        F.col(value_col) * F.lit(float(unit_seconds) / float(bucket_seconds)),
    )


def serial_diff(buckets: DataFrame, order_col: str, value_col: str,
                lag: int = 1, alias: str = "sdiff") -> DataFrame:
    """ES serial_diff pipeline aggregation: value − value(lag buckets
    earlier) in bucket order; the first ``lag`` buckets emit NULL
    (derivative is the lag=1 special case)."""
    if lag < 1:
        raise ValueError("lag must be >= 1")
    w = Window.orderBy(F.asc(order_col))
    return buckets.withColumn(
        alias, F.col(value_col) - F.lag(value_col, lag).over(w)
    )


def adjacency_matrix(
    spark: SparkSession,
    pidx: PackedIndex,
    query: str,
    attrs: DataFrame,
    named_filters: dict[str, F.Column],
    conjunctive: bool = False,
) -> DataFrame:
    """ES adjacency_matrix aggregation: matched-doc counts for every
    named predicate AND every pairwise intersection → (key, n_docs),
    key = name or 'a&b' (names joined sorted, ES's convention), key
    asc; empty intersections don't appear.  Same ONE-pass 0/1-sum
    shape as filters_agg — n + n(n-1)/2 counters, one row group out.
    ES caps n at 100 filters for exactly this quadratic reason; the
    cap is the caller's."""
    keyed = _matched_attrs(spark, pidx, query, attrs, conjunctive)
    names = sorted(named_filters)
    cells: list[tuple[str, F.Column]] = [
        (n, named_filters[n]) for n in names
    ]
    for i, a in enumerate(names):
        for b in names[i + 1:]:
            cells.append((f"{a}&{b}", named_filters[a] & named_filters[b]))
    row = keyed.agg(
        *[
            F.coalesce(F.sum(F.when(cond, 1).otherwise(0)), F.lit(0)).alias(
                f"_c{i}"
            )
            for i, (_, cond) in enumerate(cells)
        ]
    )
    return (
        row.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(key).alias("key"),
                            F.col(f"_c{i}").alias("n_docs"),
                        )
                        for i, (key, _) in enumerate(cells)
                    ]
                )
            ).alias("kv")
        )
        .select("kv.key", "kv.n_docs")
        .filter(F.col("n_docs") > 0)
        .orderBy("key")
    )


def moving_avg(buckets: DataFrame, order_col: str, value_col: str,
               window: int, alias: str = "mavg") -> DataFrame:
    """ES moving_fn/moving_avg pipeline aggregation: mean of the
    parent metric over the trailing ``window`` buckets (current
    included; short head windows average what exists, ES's default).
    Bucket-count-sized input, same note as cumulative_sum."""
    w = Window.orderBy(F.asc(order_col)).rowsBetween(
        -(window - 1), Window.currentRow
    )
    return buckets.withColumn(alias, F.avg(value_col).over(w))


def bucket_sort(buckets: DataFrame, sort_cols: list, size: int | None = None,
                ) -> DataFrame:
    """ES bucket_sort pipeline aggregation: reorder the parent's
    buckets by metric columns and optionally truncate to ``size`` —
    presentation-layer paging of an already-reduced frame.
    ``sort_cols``: list of (col, 'asc'|'desc')."""
    for _, d in sort_cols:
        if d not in ("asc", "desc"):
            raise ValueError(f"sort direction must be 'asc'|'desc', got {d!r}")
    order = [
        F.asc(c) if d == "asc" else F.desc(c) for c, d in sort_cols
    ]
    out = buckets.orderBy(*order)
    return out.limit(size) if size is not None else out


def bucket_selector(buckets: DataFrame, predicate: F.Column) -> DataFrame:
    """ES bucket_selector pipeline aggregation: keep only buckets whose
    metrics satisfy the predicate (a Column over the bucket frame)."""
    return buckets.filter(predicate)


def bucket_script(buckets: DataFrame, script: str, alias: str,
                  gap_policy: str = "skip") -> DataFrame:
    """ES bucket_script pipeline aggregation: a computed per-bucket
    metric from a script over the bucket's sibling metrics.  The
    script language is Spark SQL expression syntax — the engine's one
    scripting convention (operators/scripting): the expression
    compiles to a Catalyst column, codegen-evaluated over the
    bucket-count-sized frame, never a Python interpreter.

    ``gap_policy``: ES's missing-data knob — 'skip' DROPS buckets
    where the script yields NULL (a referenced metric was missing /
    a division had no value), 'insert_zeros' keeps them with 0 (ES
    coerces missing inputs to zero; the post-hoc coalesce is
    equivalent for the arithmetic scripts the verb exists for)."""
    if gap_policy not in ("skip", "insert_zeros"):
        raise ValueError(f"unknown gap_policy: {gap_policy!r}")
    out = buckets.withColumn(alias, F.expr(script))
    if gap_policy == "skip":
        return out.filter(F.col(alias).isNotNull())
    return out.withColumn(
        alias, F.coalesce(F.col(alias), F.lit(0).cast("double"))
    )


def cumulative_cardinality(
    rows: DataFrame,
    bucket_col: str,
    key_cols: list[str],
    alias: str = "cum_cardinality",
) -> DataFrame:
    """ES cumulative_cardinality pipeline aggregation: per bucket, the
    number of DISTINCT keys seen in that bucket or any earlier one →
    (bucket_col, new_keys, alias) in bucket order.  ES layers this on
    per-bucket HyperLogLog sketches and warns the union is
    approximate; this form is EXACT, via the first-seen identity:

        cum_cardinality(b) = |{k : first_bucket(k) <= b}|

    so the plan is one groupBy(key).min(bucket) (map-side partial agg,
    key-count-sized), one groupBy(bucket).count() down to bucket
    grain, and the standard bucket-frame cumulative window — the
    corpus is never re-scanned per bucket and nothing quadratic or
    sketchy happens.  ``new_keys`` (first appearances per bucket) is
    ES's derived ``incremental`` value, emitted for free.

    Buckets where no key first appears still emit a row (carrying the
    running total) as long as ANY row fell in them — the bucket frame
    is rows' distinct buckets, the parent-histogram convention."""
    first_seen = rows.groupBy(*key_cols).agg(
        F.min(bucket_col).alias(bucket_col)
    )
    per_bucket = first_seen.groupBy(bucket_col).agg(
        F.count("*").alias("new_keys")
    )
    buckets = rows.select(bucket_col).distinct()
    w = Window.orderBy(F.asc(bucket_col)).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        buckets.join(per_bucket, bucket_col, "left")
        .withColumn("new_keys", F.coalesce("new_keys", F.lit(0)))
        .withColumn(alias, F.sum("new_keys").over(w))
        .orderBy(bucket_col)
    )


def composite_buckets(
    spark: SparkSession,
    pidx: PackedIndex,
    query: str,
    attrs: DataFrame,
    keys: list[str],
    size: int,
    after: tuple | None = None,
    conjunctive: bool = False,
) -> DataFrame:
    """ES composite aggregation: ALL (key...) buckets over the match
    set in key order, paged ``size`` at a time with an exclusive
    ``after`` cursor (the bucket-space analog of search_after — ES's
    only way to page an unbounded bucket set).  → (keys..., n_docs).

    The cursor is a lexicographic tuple predicate compiled into the
    plan, so each page is ONE job whose agg output is cut to ``size``
    by TakeOrderedAndProject — no offset scan, no driver accumulation
    of earlier pages."""
    keyed = _matched_attrs(spark, pidx, query, attrs, conjunctive)
    grouped = keyed.groupBy(*keys).agg(F.count("*").alias("n_docs"))
    if after is not None:
        if len(after) != len(keys):
            raise ValueError("after cursor arity != keys arity")
        # lexicographic strictly-greater: (k1 > a1) or (k1 = a1 and ...)
        # — NULL-safe, matching Spark's asc ordering (nulls first): a
        # NULL key is the smallest value, so k > NULL means k IS NOT
        # NULL and equality is eqNullSafe.  Plain >/== would return SQL
        # NULL against a NULL cursor component and silently drop every
        # remaining bucket.
        cond = F.lit(False)
        for i in range(len(keys) - 1, -1, -1):
            c = F.col(keys[i])
            if after[i] is None:
                gt, eq = c.isNotNull(), c.isNull()
            else:
                gt = c > F.lit(after[i])
                eq = c.eqNullSafe(F.lit(after[i]))
            cond = gt | (eq & cond)
        grouped = grouped.filter(cond)
    return grouped.orderBy(*[F.asc(k) for k in keys]).limit(size)


def extended_stats(
    spark: SparkSession,
    pidx: PackedIndex,
    query: str,
    attrs: DataFrame,
    value_col: str,
    sigma: float = 2.0,
    bucket_col: str | None = None,
    conjunctive: bool = False,
) -> DataFrame:
    """ES extended_stats aggregation: match_stats plus the second-moment
    family — sum_of_squares, POPULATION variance/std-deviation (ES's
    definition), and the ±``sigma`` std-deviation bounds around the
    mean → (bucket?, n_docs, min_v, max_v, sum_v, sum_sq, avg_v,
    var_pop, std_dev, std_upper, std_lower).

    Derived floats (avg, variance, bounds) come from the EXACT integer
    sums (Σv, Σv²) when the doc value is integral, so the only
    cross-engine float step is the final division — the same one-job
    hash-agg shape as match_stats; output is |buckets| rows."""
    keyed = _matched_attrs(spark, pidx, query, attrs, conjunctive)
    dt = keyed.schema[value_col].dataType.simpleString()
    # widen int32 before squaring — 46341² already wraps an int
    v = F.col(value_col).cast(
        "bigint" if dt in ("tinyint", "smallint", "int", "bigint")
        else "double"
    )
    aggs = [
        F.count("*").alias("n_docs"),
        F.min(value_col).alias("min_v"),
        F.max(value_col).alias("max_v"),
        F.sum(value_col).alias("sum_v"),
        F.sum(v * v).alias("sum_sq"),
    ]
    grouped = (
        keyed.agg(*aggs)
        if bucket_col is None
        else keyed.groupBy(bucket_col).agg(*aggs)
    )
    # try_divide: an empty match set leaves n_docs = 0 on the single
    # ungrouped output row, which plain division trips under ANSI
    n = F.col("n_docs").cast("double")
    avg_v = F.try_divide(F.col("sum_v").cast("double"), n)
    var_pop = F.try_divide(F.col("sum_sq").cast("double"), n) - avg_v * avg_v
    # Σv²/n − mean² can land an ulp below 0 on constant buckets
    std = F.sqrt(F.greatest(var_pop, F.lit(0.0)))
    out = (
        grouped.withColumn("avg_v", avg_v)
        .withColumn("var_pop", var_pop)
        .withColumn("std_dev", std)
        .withColumn("std_upper", F.col("avg_v") + F.lit(sigma) * std)
        .withColumn("std_lower", F.col("avg_v") - F.lit(sigma) * std)
    )
    return out if bucket_col is None else out.orderBy(F.asc(bucket_col))


def boxplot(
    spark: SparkSession,
    pidx: PackedIndex,
    query: str,
    attrs: DataFrame,
    value_col: str,
    conjunctive: bool = False,
) -> DataFrame:
    """ES boxplot aggregation, exact flavor: (min_v, q1, q2, q3, max_v)
    of the doc value over the match set, quartiles by linear
    interpolation (percentile_cont — what ES's TDigest converges to).
    One hash-agg job; Spark's exact ``percentile`` keeps a per-group
    sorted digest, fine for the gate scale — at 100 TB swap
    ``percentile_approx`` (same call shape, bounded memory)."""
    keyed = _matched_attrs(spark, pidx, query, attrs, conjunctive)
    qs = F.percentile(
        value_col, F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75))
    )
    return keyed.agg(
        F.min(value_col).alias("min_v"),
        qs[0].alias("q1"),
        qs[1].alias("q2"),
        qs[2].alias("q3"),
        F.max(value_col).alias("max_v"),
    )


def percentile_ranks(
    spark: SparkSession,
    pidx: PackedIndex,
    query: str,
    attrs: DataFrame,
    value_col: str,
    values: list[float],
    conjunctive: bool = False,
) -> DataFrame:
    """ES percentile_ranks aggregation: for each probe value x, the
    percentage of matched docs whose doc value is ≤ x →
    (value, pct_rank), one row per probe in input order.

    Contract note: this is the EXACT empirical CDF (100·|v ≤ x|/n).
    ES's t-digest interpolates between centroids and can differ in the
    low digits; the exact definition is deterministic and
    DuckDB-reproducible, which the driver gate requires.  One hash-agg
    job — each probe is one conditional-sum column, so the plan stays a
    single pass however many probes are asked."""
    keyed = _matched_attrs(spark, pidx, query, attrs, conjunctive)
    v = F.col(value_col)
    aggs = [F.count("*").alias("n")] + [
        F.sum(F.when(v <= F.lit(x), 1).otherwise(0)).alias(f"le_{i}")
        for i, x in enumerate(values)
    ]
    row = keyed.agg(*aggs)
    pairs = F.array(*[
        F.struct(
            F.lit(float(x)).alias("value"),
            F.try_divide(
                F.col(f"le_{i}").cast("double") * 100.0,
                F.col("n").cast("double"),
            ).alias("pct_rank"),
        )
        for i, x in enumerate(values)
    ])
    return row.select(F.explode(pairs).alias("p")).select(
        "p.value", "p.pct_rank"
    )


def median_abs_deviation(
    spark: SparkSession,
    pidx: PackedIndex,
    query: str,
    attrs: DataFrame,
    value_col: str,
    conjunctive: bool = False,
) -> DataFrame:
    """ES median_absolute_deviation aggregation, exact flavor:
    median(|v − median(v)|) with both medians percentile_cont-exact →
    one row (median_v, mad).

    Two aggregation passes by definition (the inner median must be
    known before deviations exist); the median scalar rides a broadcast
    nested-loop join (1×1), never a collect.  ES's approx flavor
    (t-digest both passes) is the 100 TB swap, same shape."""
    keyed = _matched_attrs(spark, pidx, query, attrs, conjunctive)
    med = keyed.agg(
        F.percentile(value_col, F.lit(0.5)).alias("median_v")
    )
    dev = keyed.join(F.broadcast(med)).select(
        "median_v",
        F.abs(F.col(value_col).cast("double") - F.col("median_v"))
        .alias("adev"),
    )
    return dev.groupBy("median_v").agg(
        F.percentile("adev", F.lit(0.5)).alias("mad")
    )


def string_stats(
    spark: SparkSession,
    pidx: PackedIndex,
    query: str,
    attrs: DataFrame,
    str_col: str,
    conjunctive: bool = False,
) -> DataFrame:
    """ES string_stats aggregation over a keyword/text doc value:
    (n_docs, min_len, max_len, sum_len, entropy) — lengths in
    characters, Shannon entropy (bits) of the CHARACTER distribution
    pooled across every matched value, ES's definition.  avg_length is
    sum_len/n_docs, left to the caller per the house no-cross-row-
    float-sums rule.

    Shape: one hash-agg for the lengths; the entropy leg explodes
    characters and reduces to |alphabet| rows before the tiny final
    fold — a groupBy(char) count, the same scale class as term df.  The
    two legs cross-join as 1×1 broadcast."""
    keyed = _matched_attrs(spark, pidx, query, attrs, conjunctive)
    lens = keyed.agg(
        F.count("*").alias("n_docs"),
        F.min(F.length(str_col)).alias("min_len"),
        F.max(F.length(str_col)).alias("max_len"),
        F.sum(F.length(str_col)).alias("sum_len"),
    )
    chars = (
        keyed.select(
            F.explode(F.split(F.col(str_col), "")).alias("ch")
        )
        .filter(F.length("ch") > 0)
        .groupBy("ch")
        .agg(F.count("*").alias("c"))
    )
    ent = (
        chars.agg(
            F.sum("c").alias("total"),
            F.sort_array(
                F.collect_list(F.struct("ch", "c"))
            ).alias("dist"),
        )
        # deterministic fold in char order: −Σ p·log2 p
        .select(
            F.aggregate(
                "dist",
                F.lit(0.0),
                lambda acc, x: acc
                - (x["c"].cast("double") / F.col("total"))
                * F.log2(x["c"].cast("double") / F.col("total")),
            ).alias("entropy")
        )
    )
    return lens.join(F.broadcast(ent))


def matrix_stats(
    spark: SparkSession,
    pidx: PackedIndex,
    query: str,
    attrs: DataFrame,
    col_a: str,
    col_b: str,
    conjunctive: bool = False,
) -> DataFrame:
    """ES matrix_stats aggregation over two numeric doc values: one row
    (n_docs, mean_a, mean_b, var_a, var_b, skew_a, skew_b, kurt_a,
    kurt_b, covariance, correlation) — population moments, Pearson
    (non-excess) kurtosis m4/m2², ES's definitions.

    Everything derives from the raw power sums Σv, Σv², Σv³, Σv⁴ and
    Σab.  Integral doc values are widened to BIGINT first (an int32
    doc value overflows at the 4th power long before its sum does) and
    the sums accumulate EXACTLY in int64 on both engines, so both
    compute the identical closed forms from identical sums — one
    hash-agg job, eleven output columns, no second pass."""
    keyed = _matched_attrs(spark, pidx, query, attrs, conjunctive)

    def _widened(c: str) -> F.Column:
        dt = keyed.schema[c].dataType.simpleString()
        return (
            F.col(c).cast("bigint")
            if dt in ("tinyint", "smallint", "int", "bigint")
            else F.col(c).cast("double")
        )

    a, b = _widened(col_a), _widened(col_b)
    sums = keyed.agg(
        F.count("*").alias("n_docs"),
        F.sum(a).alias("sa1"), F.sum(a * a).alias("sa2"),
        F.sum(a * a * a).alias("sa3"),
        F.sum(a * a * a * a).alias("sa4"),
        F.sum(b).alias("sb1"), F.sum(b * b).alias("sb2"),
        F.sum(b * b * b).alias("sb3"),
        F.sum(b * b * b * b).alias("sb4"),
        F.sum(a * b).alias("sab"),
    )
    n = F.col("n_docs").cast("double")

    def _over_n(s: str) -> F.Column:
        # try_divide: empty match set → n = 0 on the one output row
        return F.try_divide(F.col(s).cast("double"), n)

    def _moments(s1, s2, s3, s4):
        m = _over_n(s1)
        m2 = _over_n(s2) - m * m
        m3 = _over_n(s3) - 3.0 * m * _over_n(s2) + 2.0 * m * m * m
        m4 = (_over_n(s4) - 4.0 * m * _over_n(s3)
              + 6.0 * m * m * _over_n(s2)
              - 3.0 * m * m * m * m)
        skew = F.when(m2 > 0, m3 / F.pow(m2, 1.5)).otherwise(F.lit(0.0))
        kurt = F.when(m2 > 0, m4 / (m2 * m2)).otherwise(F.lit(0.0))
        return m, m2, skew, kurt

    ma, va, ska, ka = _moments("sa1", "sa2", "sa3", "sa4")
    mb, vb, skb, kb = _moments("sb1", "sb2", "sb3", "sb4")
    cov = _over_n("sab") - ma * mb
    corr = F.when(
        (va > 0) & (vb > 0), cov / F.sqrt(va * vb)
    ).otherwise(F.lit(0.0))
    return sums.select(
        "n_docs",
        ma.alias("mean_a"), mb.alias("mean_b"),
        va.alias("var_a"), vb.alias("var_b"),
        ska.alias("skew_a"), skb.alias("skew_b"),
        ka.alias("kurt_a"), kb.alias("kurt_b"),
        cov.alias("covariance"), corr.alias("correlation"),
    )


def multi_terms(
    spark: SparkSession,
    pidx: PackedIndex,
    query: str,
    attrs: DataFrame,
    keys: list[str],
    size: int = 10,
    conjunctive: bool = False,
) -> DataFrame:
    """ES multi_terms aggregation: doc counts per COMPOSITE key tuple
    over the match set, top ``size`` by (count desc, keys asc) →
    (keys..., n_docs).  Differs from composite_buckets in ordering
    contract: multi_terms ranks by popularity (TakeOrderedAndProject),
    composite pages the full bucket space in key order."""
    keyed = _matched_attrs(spark, pidx, query, attrs, conjunctive)
    return (
        keyed.groupBy(*keys)
        .agg(F.count("*").alias("n_docs"))
        .orderBy(F.desc("n_docs"), *[F.asc(k) for k in keys])
        .limit(size)
    )


def t_test(
    spark: SparkSession,
    pidx: PackedIndex,
    query: str,
    attrs: DataFrame,
    value_col: str,
    group_col: str,
    group_a: str,
    group_b: str,
    conjunctive: bool = False,
) -> DataFrame:
    """ES t_test aggregation (heteroscedastic/Welch, its default): the
    two-sided t statistic between the doc values of two filter groups
    of the match set → one row (n_a, n_b, mean_a, mean_b, t_stat).

    t = (m_a − m_b) / √(s²_a/n_a + s²_b/n_b), SAMPLE variances, from
    the exact integer power sums (one conditional-sum hash-agg job —
    the percentile_ranks shape, six conditional columns).  Degenerate
    inputs (a group with n < 2 or zero pooled variance) yield NULL
    t_stat rather than ±inf."""
    keyed = _matched_attrs(spark, pidx, query, attrs, conjunctive)
    v = F.col(value_col).cast("double")
    in_a = F.col(group_col) == F.lit(group_a)
    in_b = F.col(group_col) == F.lit(group_b)
    sums = keyed.agg(
        F.sum(F.when(in_a, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(in_b, 1).otherwise(0)).alias("n_b"),
        F.sum(F.when(in_a, v).otherwise(0.0)).alias("s1a"),
        F.sum(F.when(in_b, v).otherwise(0.0)).alias("s1b"),
        F.sum(F.when(in_a, v * v).otherwise(0.0)).alias("s2a"),
        F.sum(F.when(in_b, v * v).otherwise(0.0)).alias("s2b"),
    )
    # try_divide throughout: when() does NOT short-circuit its branch
    # expressions, so an empty group's 0-denominator would trip ANSI
    # mode even under the n >= 2 guard
    na, nb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    ma = F.try_divide(F.col("s1a"), na)
    mb = F.try_divide(F.col("s1b"), nb)
    var_a = F.try_divide(
        F.col("s2a") - F.try_divide(F.col("s1a") * F.col("s1a"), na),
        na - 1,
    )
    var_b = F.try_divide(
        F.col("s2b") - F.try_divide(F.col("s1b") * F.col("s1b"), nb),
        nb - 1,
    )
    se2 = F.try_divide(var_a, na) + F.try_divide(var_b, nb)
    t = F.when(
        (F.col("n_a") >= 2) & (F.col("n_b") >= 2) & (se2 > 0),
        (ma - mb) / F.sqrt(se2),
    )
    return sums.select(
        "n_a", "n_b",
        ma.alias("mean_a"), mb.alias("mean_b"), t.alias("t_stat"),
    )


def normalize_buckets(
    buckets: DataFrame,
    value_col: str,
    method: str = "rescale_0_1",
    alias: str = "norm",
) -> DataFrame:
    """ES normalize pipeline aggregation: rescale a parent metric
    across its sibling buckets.  Methods: ``rescale_0_1``
    ((v−min)/(max−min); constant frames → 0, ES's convention),
    ``percent_of_sum`` (v/Σv), ``z-score`` ((v−mean)/σ, population σ).
    Bucket-count-sized input (an already-reduced frame), so the single
    unpartitioned window is the right plan — same note as
    cumulative_sum."""
    v = F.col(value_col).cast("double")
    w = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    if method == "rescale_0_1":
        rng = F.max(v).over(w) - F.min(v).over(w)
        out = F.when(rng > 0, (v - F.min(v).over(w)) / rng).otherwise(
            F.lit(0.0)
        )
    elif method == "percent_of_sum":
        out = F.try_divide(v, F.sum(v).over(w))  # zero-sum frame → NULL
    elif method == "z-score":
        mean = F.avg(v).over(w)
        sd = F.sqrt(F.avg(v * v).over(w) - mean * mean)
        out = F.when(sd > 0, (v - mean) / sd).otherwise(F.lit(0.0))
    else:
        raise ValueError(f"unknown normalize method {method!r}")
    return buckets.withColumn(alias, out)


def sampler_matched(
    spark: SparkSession,
    pidx: PackedIndex,
    query: str,
    shard_size: int = 100,
    max_per_key: int | None = None,
    key_attrs: DataFrame | None = None,
    key_col: str | None = None,
    round_scores: bool = False,
) -> DataFrame:
    """ES ``sampler`` / ``diversified_sampler`` front half: the
    ``shard_size`` BEST-SCORING matched docs → (doc_ord), the sample
    any sub-aggregation then rolls up instead of the full match set —
    ES's cut-the-long-tail-of-barely-matching-docs knob.

    ``max_per_key`` + ``key_attrs``/``key_col`` is the diversified
    form: at most m sample slots per key value (row_number window over
    score order BEFORE the global cut, exactly ES's de-bias).

    ``round_scores=True`` cuts on round(score, 6) with the doc-order
    tie-break — the cross-engine-reproducibility mode the DuckDB gate
    drives (sub-ulp summation-order differences between engines could
    otherwise flip boundary membership); exact scores are the default.

    Scale: the cut is TakeOrderedAndProject over the scored match set
    (per-partition heaps, ≤ shard_size rows materialize); the
    diversified window shuffles once on the key."""
    scored = scored_matches(spark, pidx, query)
    s = F.round(F.col("score"), 6) if round_scores else F.col("score")
    if max_per_key is not None:
        if key_attrs is None or key_col is None:
            raise ValueError(
                "max_per_key requires key_attrs and key_col"
            )
        keyed = (
            pidx.docmap.select("doc_ord", "conv_id", "turn_idx")
            .join(scored, "doc_ord")
            .join(key_attrs, ["conv_id", "turn_idx"])
        )
        w = Window.partitionBy(key_col).orderBy(
            s.desc(), F.asc("doc_ord")
        )
        scored = (
            keyed.withColumn("_kr", F.row_number().over(w))
            .filter(F.col("_kr") <= max_per_key)
            .select("doc_ord", "score")
        )
        s = F.round(F.col("score"), 6) if round_scores else F.col("score")
    return (
        scored.orderBy(s.desc(), F.asc("doc_ord"))
        .limit(shard_size)
        .select("doc_ord")
    )


def sampler_terms(
    spark: SparkSession,
    pidx: PackedIndex,
    query: str,
    attrs: DataFrame,
    facet_col: str,
    shard_size: int = 100,
    max_per_key: int | None = None,
    key_attrs: DataFrame | None = None,
    key_col: str | None = None,
    round_scores: bool = False,
) -> DataFrame:
    """``sampler`` (or ``diversified_sampler``) wrapping a ``terms``
    sub-aggregation — facet counts over the top-``shard_size`` sample
    → (facet value, n_docs), facet value asc: the canonical ES nesting
    (what ARE the best hits about, undiluted by the match tail)."""
    docs = sampler_matched(
        spark, pidx, query, shard_size,
        max_per_key=max_per_key, key_attrs=key_attrs, key_col=key_col,
        round_scores=round_scores,
    )
    return (
        pidx.docmap.join(docs, "doc_ord")
        .join(attrs, ["conv_id", "turn_idx"])
        .groupBy(facet_col)
        .agg(F.count("*").alias("n_docs"))
        .orderBy(F.asc(facet_col))
    )


def missing_agg(
    spark: SparkSession,
    pidx: PackedIndex,
    query: str,
    attrs: DataFrame,
    value_col: str,
    conjunctive: bool = False,
) -> DataFrame:
    """ES ``missing`` aggregation: matched docs that LACK the doc
    value — NULL in ``attrs.<value_col>`` or absent from ``attrs``
    entirely (ES counts both: the field bucket is built from docs that
    have the field; missing is the complement) → ONE row
    (n_missing long).

    The attrs join is LEFT (unlike the sibling aggregations' inner
    ``_matched_attrs``) because absence IS the signal here."""
    docs = matched_docs(spark, pidx, query, conjunctive=conjunctive)
    keyed = (
        pidx.docmap.join(docs, "doc_ord")
        .select("conv_id", "turn_idx")
        .join(
            attrs.select("conv_id", "turn_idx", value_col),
            ["conv_id", "turn_idx"],
            "left",
        )
    )
    return keyed.agg(
        F.count(F.when(F.col(value_col).isNull(), 1))
        .cast("long")
        .alias("n_missing")
    )


def moving_fn(
    buckets: DataFrame,
    order_col: str,
    value_col: str,
    window: int,
    script: str,
    alias: str = "mfn",
    shift: int = 0,
) -> DataFrame:
    """ES ``moving_fn`` pipeline aggregation: an arbitrary function of
    a sliding window of sibling-bucket metric values.  The script is a
    Spark SQL expression over the array column ``_window`` (the
    engine's one scripting convention, operators/scripting.py) — e.g.
    ``array_max(_window)``, ``array_min(_window)``,
    ``aggregate(_window, 0D, (a, x) -> a + x)`` — compiled by Catalyst,
    never a Python UDF.

    Window semantics pinned to ES: with ``shift=0`` (default) the
    window holds the ``window`` buckets BEFORE the current one
    (exclusive — ES's moving_fn default, unlike moving_avg's
    inclusive trailing window); each +1 of ``shift`` slides the window
    one bucket rightward, so ``shift=1`` includes the current bucket.
    Head windows hold what exists; an EMPTY window gives whatever the
    script yields on an empty array (array_max → NULL, ES's null
    bucket).  Bucket-frame-sized input, same single-window note as
    cumulative_sum."""
    w = Window.orderBy(F.asc(order_col)).rowsBetween(
        -window + shift, shift - 1
    )
    return (
        buckets.withColumn(
            "_window", F.collect_list(F.col(value_col)).over(w)
        )
        .withColumn(alias, F.expr(script))
        .drop("_window")
    )


def terms_agg(
    spark: SparkSession,
    pidx: PackedIndex,
    query: str,
    attrs: DataFrame,
    facet_col: str,
    size: int = 10,
    shard_size: int | None = None,
    conjunctive: bool = False,
) -> DataFrame:
    """The ES ``terms`` aggregation with its DISTRIBUTED semantics made
    explicit: each shard reports only its local top-``shard_size``
    values, the coordinator sums what was reported, and every result
    carries ``doc_count_error_upper_bound`` — the worst-case count
    mass a value could have lost to shards that didn't report it.
    facet_counts is the exact (and exact-only) sibling; THIS is what
    "terms agg" means on a real cluster, where shipping every
    (shard, value) pair for a high-cardinality field is the thing you
    cannot do.

    Shards are the engine's native doc ranges (doc_ord >>
    range_bits) — the same physical partitioning every other
    distributed path uses.  Per ES:

    * ``shard_size`` defaults to ``size * 1.5 + 10``;
    * a shard's error contribution is the count of the LAST (smallest)
      value it returned — but only if it returned a full
      ``shard_size`` list (an exhausted shard hides nothing);
    * for each reported value, the bound sums the contributions of
      exactly the shards that did NOT report it.

    → (value, doc_count, doc_count_error_upper_bound), top ``size`` by
    (doc_count desc, value asc).  With ``shard_size`` ≥ the field
    cardinality every shard is exhaustive: counts equal the exact
    facet counts and every bound is 0 (the gate's criterion).

    Scale: per-(shard, value) partial counts → per-shard window cut at
    shard_size (each shard's sort is over ITS values only) → one
    candidate-sized rollup.  Nothing driver-side, no global sort of
    the value space.
    """
    if shard_size is None:
        shard_size = int(size * 1.5 + 10)
    range_bits = pidx.stats["range_bits"]
    docs = matched_docs(spark, pidx, query, conjunctive=conjunctive)
    keyed = (
        pidx.docmap.join(docs, "doc_ord")
        .select(
            F.shiftright(F.col("doc_ord"), range_bits).alias("shard"),
            "conv_id",
            "turn_idx",
        )
        .join(attrs.select("conv_id", "turn_idx", facet_col),
              ["conv_id", "turn_idx"])
        .filter(F.col(facet_col).isNotNull())
    )
    per_shard = keyed.groupBy("shard", facet_col).agg(
        F.count("*").alias("cnt")
    )
    w = Window.partitionBy("shard").orderBy(
        F.desc("cnt"), F.asc(facet_col)
    )
    reported = per_shard.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= shard_size
    )
    # a shard hides mass only if its report was cut at shard_size;
    # its per-value bound is then its smallest reported count
    shard_err = reported.groupBy("shard").agg(
        F.when(F.count("*") >= shard_size, F.min("cnt"))
        .otherwise(F.lit(0))
        .alias("contrib")
    )
    total = shard_err.agg(F.sum("contrib").alias("total_contrib"))
    merged = (
        reported.join(shard_err, "shard")
        .groupBy(facet_col)
        .agg(
            F.sum("cnt").alias("doc_count"),
            F.sum("contrib").alias("covered"),
        )
        .crossJoin(F.broadcast(total))
        .select(
            F.col(facet_col).alias("value"),
            F.col("doc_count").cast("long").alias("doc_count"),
            (F.col("total_contrib") - F.col("covered"))
            .cast("long")
            .alias("doc_count_error_upper_bound"),
        )
    )
    return merged.orderBy(
        F.desc("doc_count"), F.asc("value")
    ).limit(size)


def scripted_metric(
    spark: SparkSession,
    pidx: PackedIndex,
    query: str,
    attrs: DataFrame,
    map_script: str,
    reduce_script: str,
    bucket_col: str | None = None,
    alias: str = "value",
    conjunctive: bool = False,
) -> DataFrame:
    """ES ``scripted_metric`` aggregation in the engine's one scripting
    convention (Spark SQL expressions → Catalyst,
    operators/scripting.py): ``map_script`` evaluates per matched doc
    over its doc-value columns into ``_mapped``; ``reduce_script`` is
    an aggregate expression over ``_mapped`` (e.g. ``sum(_mapped)``,
    ``max(_mapped)``, ``count_if(_mapped > 0)``) → one row, or one per
    ``bucket_col``.

    ES's init/combine stages don't exist here BY DESIGN: they are
    Painless's manual reimplementation of what a declarative aggregate
    already is — Spark's hash aggregate runs the partial (combine)
    phase map-side automatically for decomposable reduce expressions,
    which is exactly the property ES asks scripted_metric authors to
    hand-guarantee.  A reduce that isn't decomposable still computes
    correctly (Catalyst plans it), it just shuffles more.
    """
    keyed = _matched_attrs(spark, pidx, query, attrs, conjunctive)
    mapped = keyed.withColumn("_mapped", F.expr(map_script))
    agg = F.expr(reduce_script).alias(alias)
    if bucket_col is None:
        return mapped.agg(agg)
    return mapped.groupBy(bucket_col).agg(agg).orderBy(F.asc(bucket_col))


def categorize_text(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_tokens: int = 8,
) -> DataFrame:
    """ES ``categorize_text``: cluster semi-structured messages (log
    lines, tool outputs, templated turns) into pattern buckets.

    ES runs a drain-like token tree with similarity thresholds; that
    algorithm is input-order-dependent, so this engine uses a
    DETERMINISTIC category key instead (a pure function of each text,
    documented here as the contract): lowercase reference tokenization
    (split on non-alphanumeric, drop length<2 tokens), keep the first
    ``max_tokens`` tokens, and mask every digit-bearing token as ``#``
    — ES's own output masks variable parts the same way.  Texts sharing
    a masked prefix land in one category.

    Output: (category, n_docs, example_id = min id) ordered by
    (n_docs desc, category) — bucket count is vocabulary-of-patterns
    sized.  Scale: one Catalyst projection + one hash agg (map-side
    partial), no UDF, no shuffle beyond the single groupBy.
    """
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"),
        lambda x: F.length(x) > 1,
    )
    key = F.array_join(
        F.transform(
            F.slice(toks, 1, max_tokens),
            lambda t: F.when(t.rlike("[0-9]"), F.lit("#")).otherwise(t),
        ),
        " ",
    )
    return (
        docs.select(key.alias("category"), F.col(id_col))
        .groupBy("category")
        .agg(
            F.count("*").alias("n_docs"),
            F.min(id_col).alias("example_id"),
        )
        .orderBy(F.desc("n_docs"), F.asc("category"))
    )


def change_point(
    buckets: DataFrame,
    order_col: str,
    value_col: str,
) -> DataFrame:
    """ES ``change_point`` (step-change flavor): find the split of an
    ordered bucket series that maximizes the standardized mean shift

        stat = |mean_left - mean_right| * sqrt(n_left*n_right/n)

    — the first step of binary segmentation / a two-sample z numerator
    (the classic CUSUM-equivalent form).  Ties (and FP noise) break on
    the ROUNDED stat (6 dp) then the earliest bucket, so the winner is
    engine-independent.

    Input is an already-aggregated bucket series (|buckets| rows —
    date_histogram output, NOT the corpus), so everything here is
    result-set-sized: one window pass for the prefix sums + one
    TakeOrdered(1).  Output: one row
    (<order_col>, stat_r6, mean_before_r6, mean_after_r6, direction).
    """
    w = Window.orderBy(order_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    v = F.col(value_col).cast("double")
    cur = (
        buckets.select(F.col(order_col), v.alias("_v"))
        .withColumn("_cum", F.sum("_v").over(w))
        .withColumn("_i", F.row_number().over(Window.orderBy(order_col)))
    )
    tot = buckets.agg(
        F.sum(v).alias("_tot"), F.count("*").alias("_n")
    )
    cand = cur.crossJoin(F.broadcast(tot)).filter(
        F.col("_i") < F.col("_n")
    )
    mean_l = F.col("_cum") / F.col("_i")
    mean_r = (F.col("_tot") - F.col("_cum")) / (F.col("_n") - F.col("_i"))
    stat = F.abs(mean_l - mean_r) * F.sqrt(
        F.col("_i") * (F.col("_n") - F.col("_i")) / F.col("_n")
    )
    return (
        cand.select(
            F.col(order_col),
            F.round(stat, 6).alias("stat_r6"),
            F.round(mean_l, 6).alias("mean_before_r6"),
            F.round(mean_r, 6).alias("mean_after_r6"),
            F.when(mean_r > mean_l, F.lit("spike_up"))
            .otherwise(F.lit("spike_down"))
            .alias("direction"),
        )
        .orderBy(F.desc("stat_r6"), F.asc(order_col))
        .limit(1)
    )


def frequent_item_sets(
    tx: DataFrame,
    min_support: float,
    max_size: int = 3,
    txn_col: str = "txn_id",
    item_col: str = "item",
) -> DataFrame:
    """ES ``frequent_item_sets``: itemsets of size 1..max_size whose
    support (fraction of transactions containing EVERY item) is >=
    ``min_support``.  ES mines with a sampled Eclat; this engine runs
    exact Apriori as relational levels — the classic result that
    level k's candidates can only extend level k-1's survivors:

    * L1 = one hash agg over (item);
    * Lk = the per-transaction frequent-item table self-joined k-1
      times with ``item_(i) < item_(i+1)`` (canonical order kills
      permutations), grouped and support-filtered.

    Every join key includes the transaction id, so the shuffle is by
    txn and the blow-up per transaction is C(f, k) where f is the
    count of FREQUENT items in that transaction — min_support prunes
    f before any pair is ever materialized.  Output: (items
    array<string> sorted, n_txns, support rounded 6dp), ordered by
    (size, -n_txns, items).
    """
    if not 0.0 < min_support <= 1.0:
        raise ValueError("min_support must be in (0, 1]")
    if max_size < 1:
        raise ValueError("max_size must be >= 1")
    tx = tx.select(
        F.col(txn_col).alias("t"), F.col(item_col).alias("i")
    ).distinct()
    n_txns = tx.select("t").distinct().count()
    floor = n_txns * min_support

    l1 = (
        tx.groupBy("i")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= floor)
    )
    out = l1.select(
        F.array("i").alias("items"), F.col("n").alias("n_txns")
    )
    # per-txn table restricted to frequent items (Apriori prune)
    txf = tx.join(F.broadcast(l1.select("i")), "i").select("t", "i")

    level = txf.select("t", F.array("i").alias("items"), F.col("i").alias("last"))
    for _ in range(2, max_size + 1):
        ext = level.join(
            txf.withColumnRenamed("i", "nxt"), "t"
        ).filter(F.col("nxt") > F.col("last"))
        level = ext.select(
            "t",
            F.array_append("items", F.col("nxt")).alias("items"),
            F.col("nxt").alias("last"),
        )
        sets = (
            level.groupBy("items")
            .agg(F.count("*").alias("n_txns"))
            .filter(F.col("n_txns") >= floor)
        )
        # Apriori: only transactions' itemsets that survived extend on
        level = level.join(F.broadcast(sets.select("items")), "items")
        out = out.unionByName(sets)

    return (
        out.select(
            "items",
            "n_txns",
            F.round(F.col("n_txns") / F.lit(n_txns), 6).alias("support"),
        )
        .orderBy(
            F.size("items"), F.desc("n_txns"), F.asc("items")
        )
    )


def bucket_count_ks_test(
    buckets: DataFrame,
    order_col: str,
    fg_col: str,
    bg_col: str,
) -> DataFrame:
    """ES ``bucket_count_ks_test`` (two-sample flavor): the
    Kolmogorov-Smirnov D statistic between two bucket-count series
    over the same ordered buckets — D = max |CDF_fg - CDF_bg| with
    each CDF the running fraction of that series' total.  Input is an
    aggregated bucket frame, so the whole computation is
    result-set-sized: one window pass + one global max.  Output: one
    row (d_stat_r6, at = first bucket attaining the max).
    """
    w = Window.orderBy(order_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    fg = F.col(fg_col).cast("double")
    bg = F.col(bg_col).cast("double")
    cum = buckets.select(
        F.col(order_col),
        F.sum(fg).over(w).alias("cfg"),
        F.sum(bg).over(w).alias("cbg"),
    )
    tot = buckets.agg(
        F.sum(fg).alias("tfg"), F.sum(bg).alias("tbg")
    )
    d = F.abs(F.col("cfg") / F.col("tfg") - F.col("cbg") / F.col("tbg"))
    return (
        cum.crossJoin(F.broadcast(tot))
        .select(F.col(order_col).alias("at"), F.round(d, 6).alias("d_stat_r6"))
        .orderBy(F.desc("d_stat_r6"), F.asc("at"))
        .limit(1)
    )


def bucket_correlation(
    buckets: DataFrame,
    value_col: str,
    indicator_col: str,
) -> DataFrame:
    """ES ``bucket_correlation``: Pearson correlation between a bucket
    metric and a caller-supplied indicator series carried on the same
    frame — Pearson r from one-pass co-moments (map-side partial),
    spelled covar_pop / (stddev_pop * stddev_pop) with try_divide so
    a zero-variance series yields NULL (the ES answer) instead of an
    ANSI divide-by-zero.  Output: one row (correlation_r6, n_buckets).
    """
    x = F.col(value_col).cast("double")
    y = F.col(indicator_col).cast("double")
    return buckets.agg(
        F.round(
            F.try_divide(
                F.covar_pop(x, y), F.stddev_pop(x) * F.stddev_pop(y)
            ),
            6,
        ).alias("correlation_r6"),
        F.count("*").alias("n_buckets"),
    )


def variable_width_histogram(
    df: DataFrame,
    value_col: str,
    n_buckets: int,
) -> DataFrame:
    """ES ``variable_width_histogram``: buckets sized by the data, not
    a fixed interval.  ES clusters greedily (input-order-dependent);
    this engine's deterministic contract is equal-frequency buckets —
    ``ntile(n)`` over the value order (ties broken by value only, so
    equal values always land in adjacent tiles deterministically).
    Output per bucket: (bucket 1-based, n_values, min, max) — like
    ES's (doc_count, min, max, centroid) surface minus the centroid
    (mean of a float column is shuffle-order-dependent; callers who
    want it can aggregate it themselves at their own rounding).

    One window pass (a global sort — the agg is defined by the total
    value order, same cost class as percentile_cont) + one hash agg.
    """
    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")
    v = F.col(value_col).cast("double")
    w = Window.orderBy(F.col("_v"))
    return (
        df.select(v.alias("_v"))
        .withColumn("bucket", F.ntile(n_buckets).over(w))
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_values"),
            F.min("_v").alias("min_value"),
            F.max("_v").alias("max_value"),
        )
        .orderBy("bucket")
    )
