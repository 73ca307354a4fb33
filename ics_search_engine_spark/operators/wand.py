"""Block-max WAND pruning over the packed index (SURVEY.md §7 step 7).

The reference scores EVERY posting of every query term
(/root/reference/search.py:148-162).  The north_star requires block-max
pruning: per-block score-upper-bound metadata, skip blocks that cannot
reach the current k-th score.

Our shard geometry makes this exact and embarrassingly parallel:
shards are doc-range-aligned across terms (shard_id = doc_ord >>
range_bits), so ALL postings of a document — for every term — live in
the same doc range.  Hence for range r:

    ub(r) = Σ_t w_t · max_tfn(t, r)   ≥  score(d)  for every d in r

and pruning ranges by ub(r) can never lose a true top-k doc.  Two
phases:

  1. score the most promising ranges (highest ub) exhaustively →
     threshold θ = k-th best score found;
  2. score the remaining ranges with ub(r) ≥ θ (metadata-only check —
     pruned ranges never decode a payload byte);
  3. top-k of the union.

Phase selection runs on shard METADATA (term, shard_id, max_tfn) —
tiny (n_query_terms × n_ranges rows) — and the payload column never
leaves the parquet reader for pruned shards (column pruning +
predicate pushdown on the shard_id join).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ics_search_engine_spark.operators.packed_index import (
    PackedIndex,
    score_shards_topk,
)
from ics_search_engine_spark.operators.query import query_weights
from ics_search_engine_spark.textproc.tokenizer import tokenize

# Above this many per-query metadata rows (n_query_terms × n_ranges),
# phase selection stays IN SPARK: the driver never collects or sorts
# the unpruned range table, the θ₀ seed is an O(k)
# TakeOrderedAndProject, and only the ranges that survive θ₀ (the
# genuinely-plausible band) are collected.  Below it, the driver-side
# path is cheaper (zero extra jobs).  At 10^12 docs / range_bits 22
# a 5-term query is ~1.2M metadata rows → spark path; every corpus
# that fits a driver collect comfortably stays on the driver path.
SPARK_META_ROWS_MAX = 250_000


def use_spark_meta(
    pidx: PackedIndex, n_terms: int, meta_mode: str | None
) -> bool:
    """The range-count threshold rule (unit-tested): explicit
    ``meta_mode`` wins; auto estimates per-query metadata rows as
    n_terms × n_ranges from the index stats alone (no job)."""
    if meta_mode == "spark":
        return True
    if meta_mode == "driver":
        return False
    if meta_mode is not None:
        raise ValueError(f"unknown meta_mode {meta_mode!r}")
    n_ranges = ((max(pidx.n_docs, 1) - 1) >> pidx.stats["range_bits"]) + 1
    return n_terms * n_ranges > SPARK_META_ROWS_MAX


def _spark_meta_ranges(
    pidx: PackedIndex,
    weights: dict[str, float],
    k: int,
    require_all: int | None,
    min_match: int | None,
    allowed_ords: DataFrame | None,
    want_stats: bool,
) -> tuple[list, int, int]:
    """Spark-side phase selection → (survivor ranges sorted by ub
    desc, n_ranges_total, seed_pruned).  The per-shard bound table
    (ub = Σ w·max_tfn, lb = max w·max_tfn, nterms) is a metadata-only
    aggregation that never reaches the driver whole; the θ₀ seed
    collects exactly k rows (TakeOrderedAndProject on lb); the final
    collect is survivor-sized.  n_ranges_total is -1 unless
    ``want_stats`` (counting the pre-seed table costs one extra
    metadata job the hot path shouldn't pay)."""
    wmap = F.create_map(
        *[x for t, w in sorted(weights.items())
          for x in (F.lit(t), F.lit(float(w)))]
    )
    contrib = wmap[F.col("term")] * F.col("max_tfn")
    per_shard = (
        pidx.index.filter(F.col("term").isin(sorted(weights)))
        .select("shard_id", contrib.alias("c"))
        .groupBy("shard_id")
        .agg(
            F.sum("c").alias("ub"),
            F.max("c").alias("lb"),
            F.count("*").alias("nterms"),
        )
    )
    if require_all is not None:
        per_shard = per_shard.filter(F.col("nterms") == require_all)
    if min_match is not None:
        per_shard = per_shard.filter(F.col("nterms") >= min_match)
    if allowed_ords is not None:
        per_shard = per_shard.join(
            allowed_ords.select("shard_id").distinct(), "shard_id",
            "left_semi",
        )
    n_ranges_total = per_shard.count() if want_stats else -1

    seed_pruned = 0
    survivors = per_shard
    if require_all is None and min_match is None and allowed_ords is None:
        # O(k) θ seed: the k-th largest metadata lower bound is a
        # valid global score lower bound (module docstring) — one
        # TakeOrderedAndProject job, k rows to the driver.
        seed = survivors.orderBy(
            F.desc("lb"), F.asc("shard_id")
        ).limit(k).collect()
        if len(seed) >= k:
            theta0 = seed[k - 1]["lb"]
            survivors = survivors.filter(F.col("ub") >= theta0)
    rows = survivors.select("shard_id", "ub").collect()
    ranges = sorted(
        ({"shard_id": r["shard_id"], "ub": r["ub"]} for r in rows),
        key=lambda r: (-r["ub"], r["shard_id"]),
    )
    if want_stats and n_ranges_total >= 0:
        seed_pruned = n_ranges_total - len(ranges)
    return ranges, (n_ranges_total if want_stats else len(ranges)), seed_pruned


def bm25_topk_wand(
    spark: SparkSession,
    pidx: PackedIndex,
    query: str,
    k: int = 10,
    phase1_ranges: int = 4,
    collect_stats: dict | None = None,
    conjunctive: bool = False,
    accumulator: str | None = None,
    allowed_docs: DataFrame | None = None,
    weights: dict[str, float] | None = None,
    min_match: int | None = None,
    meta_mode: str | None = None,
) -> DataFrame:
    """Top-k BM25 with block-max range pruning — result identical to the
    exhaustive packed path (invariant-tested).  ``collect_stats`` (if a
    dict) receives pruning counters for tests/bench.

    ``conjunctive=True``: AND semantics with the same shard-local,
    shuffle-free machinery — docs must match EVERY query term (any
    absent term empties the result).  Two conjunctive-only prunes come
    for free: a doc range whose metadata lacks ANY required term can
    never match and is dropped before scoring, and the OR upper bound
    remains a valid bound for the (smaller) conjunctive scores, so the
    θ pruning loop is unchanged.  Identical to the exhaustive
    bm25_topk_conjunctive (tested).

    ``accumulator`` forwards to score_shards_topk ('dense'|'merge'|
    None=auto by range_bits) — results are bit-identical either way.

    ``allowed_docs``: filter-query support (operators/filtered.py
    semantics — stats stay corpus-global, surviving scores are
    bit-identical to unfiltered), COMPOSED with θ pruning: ranges with
    no allowed doc drop at metadata level, ub(r) remains a valid upper
    bound for filtered scores (a filtered doc's score is unchanged),
    and θ from real filtered winners prunes the tail.  The metadata
    θ-seed is disabled, exactly as under conjunctive: the doc achieving
    a range's max_tfn may be filtered out, so lb(r) is not a real
    document's score.  This is the scale path for UNSELECTIVE filters
    (e.g. role='assistant' ≈ half the corpus), where the exhaustive
    bm25_topk_filtered_packed would decode every allowed shard.

    ``min_match=m``: minimum-should-match (Lucene's knob between OR
    and AND) — only docs matching >= m distinct query terms rank.
    Composes with θ pruning like conjunctive: ranges whose metadata
    holds < m of the query terms drop before scoring, the OR ub stays
    a valid bound for the (subset) msm scores, and the metadata θ-seed
    is disabled (the doc achieving a range's max_tfn may match < m
    terms).  Mutually exclusive with ``conjunctive``.

    ``meta_mode`` ∈ {None (auto), 'driver', 'spark'}: where phase
    selection runs.  'driver' is the historical path (collect the
    query's metadata rows, sort ranges driver-side — fine to ~10^5
    rows); 'spark' keeps the range table distributed, seeds θ₀ with
    an O(k) TakeOrderedAndProject and collects only θ₀ survivors —
    the 10^12-doc path where n_terms × n_ranges would swamp a driver
    collect.  Auto picks by the ``use_spark_meta`` threshold rule.
    Results are bit-identical either way (invariant-tested)."""
    do_stem = pidx.stats.get("stem", True)
    # ``weights``: pre-computed (term -> weight) override — lets the
    # query-expansion surfaces (Rocchio PRF, any externally weighted
    # query) ride the same θ pruning: ub(r) = Σ w_t·max_tfn(t,r) and
    # lb(r) = max_t w_t·max_tfn(t,r) are valid for ANY positive
    # per-term weights, not just qtf·idf.  ``query`` is ignored when
    # given.
    w_over = weights
    if w_over is not None:
        q_terms = sorted(w_over)
    else:
        q_terms = sorted(
            set(tokenize(query, for_query=True, do_stem=do_stem))
        )
    empty = spark.createDataFrame(
        [], "conv_id string, turn_idx int, score double"
    )
    if not q_terms:
        return empty

    spark_meta = False
    ubs: dict[int, float] = {}
    lbs: dict[int, float] = {}
    shard_terms: dict[int, int] = {}
    if pidx._shard_meta is not None:
        # serving mode, small vocabulary: metadata is driver-resident —
        # term stats and phase selection cost zero Spark jobs
        if w_over is not None:
            weights = dict(w_over)
        else:
            term_df = pidx.df_for_terms(q_terms)
            weights = query_weights(query, term_df, pidx.n_docs, do_stem)
        if not weights:
            return empty
        for t, w in weights.items():
            for shard_id, max_tfn in pidx._shard_meta.get(t, ()):
                ubs[shard_id] = ubs.get(shard_id, 0.0) + w * max_tfn
                c = w * max_tfn
                if c > lbs.get(shard_id, 0.0):
                    lbs[shard_id] = c
                shard_terms[shard_id] = shard_terms.get(shard_id, 0) + 1
    elif use_spark_meta(pidx, len(q_terms), meta_mode):
        # 10^12-doc regime: phase selection stays in Spark — only the
        # per-term df (|terms| rows) reaches the driver here; the
        # range table is handled by _spark_meta_ranges below.
        spark_meta = True
        if w_over is not None:
            weights = dict(w_over)
        else:
            term_df = {
                r["term"]: r["df"]
                for r in pidx.index.filter(F.col("term").isin(q_terms))
                .groupBy("term")
                .agg(F.sum("n_postings").alias("df"))
                .collect()
            }
            weights = query_weights(query, term_df, pidx.n_docs, do_stem)
        if not weights:
            return empty
    else:
        # ONE pushed-down metadata job fetches df AND block maxes for
        # just the query terms (seek-map analog; term IN (...) prunes
        # at the parquet/cache level)
        meta_rows = pidx.query_meta(q_terms)
        if w_over is not None:
            weights = dict(w_over)
        else:
            term_df: dict[str, int] = {}
            for r in meta_rows:
                term_df[r["term"]] = (
                    term_df.get(r["term"], 0) + r["n_postings"]
                )
            weights = query_weights(query, term_df, pidx.n_docs, do_stem)
        if not weights:
            return empty
        seen_term_shard = set()
        for r in meta_rows:
            w = weights.get(r["term"])
            if w is not None:
                ubs[r["shard_id"]] = (
                    ubs.get(r["shard_id"], 0.0) + w * r["max_tfn"]
                )
                c = w * r["max_tfn"]
                if c > lbs.get(r["shard_id"], 0.0):
                    lbs[r["shard_id"]] = c
                key = (r["term"], r["shard_id"])
                if key not in seen_term_shard:
                    seen_term_shard.add(key)
                    shard_terms[r["shard_id"]] = (
                        shard_terms.get(r["shard_id"], 0) + 1
                    )
    require_all = None
    if conjunctive:
        if min_match is not None:
            raise ValueError("conjunctive and min_match are mutually exclusive")
        # AND of an absent term is empty; a range missing any required
        # term cannot match — metadata-level conjunctive pruning
        if len(weights) < len(q_terms):
            return empty
        require_all = len(weights)
        if not spark_meta:
            ubs = {s: u for s, u in ubs.items()
                   if shard_terms.get(s, 0) == require_all}
    if min_match is not None:
        if min_match <= 1:
            min_match = None  # m <= 1 is plain OR semantics
        elif len(weights) < min_match:
            # fewer than m query terms exist in the index at all
            return empty
        elif not spark_meta:
            # metadata-level msm pruning: a range holding fewer than m
            # of the query terms can never produce a match
            ubs = {s: u for s, u in ubs.items()
                   if shard_terms.get(s, 0) >= min_match}

    allowed_ords = None
    if allowed_docs is not None:
        from ics_search_engine_spark.operators.filtered import (
            allowed_shard_ords,
        )

        allowed_ords = allowed_shard_ords(pidx, allowed_docs)
        if not spark_meta:
            # metadata-level filter pruning: a range with no allowed
            # doc cannot produce a result.  The distinct-shard collect
            # is range-grain (≤ n_ranges longs), the same size class
            # as the ub table itself.  (The spark path semi-joins this
            # frame instead — no collect.)
            allowed_shards = {
                r["shard_id"]
                for r in allowed_ords.select("shard_id").distinct().collect()
            }
            ubs = {s: u for s, u in ubs.items() if s in allowed_shards}

    if spark_meta:
        ranges, n_ranges_total, seed_pruned = _spark_meta_ranges(
            pidx, weights, k, require_all, min_match, allowed_ords,
            want_stats=collect_stats is not None,
        )
        if not ranges:
            return empty
    else:
        ub_rows = [{"shard_id": s, "ub": u} for s, u in ubs.items()]
        ranges = sorted(ub_rows, key=lambda r: (-r["ub"], r["shard_id"]))
        if not ranges:
            return empty
        n_ranges_total = len(ranges)

        # θ seed from metadata alone, BEFORE any scoring: for each
        # range r, lb(r) = max_t w_t·max_tfn(t,r) is the score lower
        # bound of a real document in r (BM25 contributions are
        # non-negative — idf is the Lucene log1p form, always > 0).
        # Ranges are disjoint, so the k-th largest lb over ranges
        # lower-bounds the FINAL k-th best score, and every range with
        # ub < θ₀ is prunable without decoding a byte.  Cuts the
        # iterative loop's early low-θ rounds (rare-term queries: the
        # rare term's high-lb ranges clear the common-term-only tail
        # up front).  Invalid under conjunctive semantics: the doc
        # achieving max_tfn may not match every required term.
        seed_pruned = 0
        if (
            require_all is None and min_match is None
            and allowed_ords is None and len(lbs) >= k
        ):
            theta0 = sorted(lbs.values(), reverse=True)[k - 1]
            kept0 = [r for r in ranges if r["ub"] >= theta0]
            seed_pruned = len(ranges) - len(kept0)
            ranges = kept0

    matched = pidx.index.filter(F.col("term").isin(q_terms))
    range_bits = pidx.stats["range_bits"]

    def score_ranges(shard_ids: list[int]) -> DataFrame:
        # shard-local scoring: each shard computes its own top-k with
        # no per-posting shuffle (see score_shards_topk), then a GLOBAL
        # limit k turns the round job into TakeOrderedAndProject — the
        # driver receives at most k rows per round no matter how many
        # ranges the batch holds (θ only ever needs the running top-k,
        # so merging per-round top-ks loses nothing; invariant-tested)
        sids = [int(s) for s in shard_ids]
        m = matched.filter(F.col("shard_id").isin(sids))
        al = (
            allowed_ords.filter(F.col("shard_id").isin(sids))
            if allowed_ords is not None else None
        )
        out = (
            score_shards_topk(
                m, weights, pidx.avgdl, k, range_bits,
                require_all=require_all, accumulator=accumulator,
                allowed=al, min_match=min_match,
            )
            .orderBy(F.desc("score"), F.asc("doc_ord"))
            .limit(k)
        )
        if collect_stats is not None and "round_plan" not in collect_stats:
            # plan-audit hook: the round job must be TakeOrderedAndProject
            collect_stats["round_plan"] = (
                out._jdf.queryExecution().executedPlan().toString()
            )
        return out

    def merge_topk(rows: list) -> list:
        rows.sort(key=lambda r: (-r["score"], r["doc_ord"]))
        return rows[:k]

    # Single-job bail-out: a pruning round's fixed cost is one Spark
    # job schedule (~0.3-0.6 s here) — worth paying only when θ can
    # prune MORE ranges than a job costs to decode (dozens).  With few
    # survivors (tiny corpora, or a θ seed that already cleared the
    # tail), score them all in ONE job instead of drip-feeding rounds.
    # Seed-aware widening: when the metadata θ₀ pruned over half the
    # ranges, iterating rarely buys more — θ₀ came from real per-range
    # max-score docs, so survivors are the genuinely-plausible band
    # (measured: q5_rare survivors 49/169, iterative rounds pruned 0
    # further while paying 2 extra job schedules) — score survivors in
    # one job.  When the seed pruned nothing (uniform common-term
    # bands) iteration still runs and its convergence bail-out governs.
    one_job = len(ranges) <= 4 * phase1_ranges or (
        seed_pruned > 0 and len(ranges) <= n_ranges_total // 2
    )
    if one_job:
        rows = merge_topk(score_ranges([r["shard_id"] for r in ranges]).collect())
        if collect_stats is not None:
            collect_stats.update(
                n_ranges=n_ranges_total, scored=len(ranges),
                pruned=seed_pruned, seed_pruned=seed_pruned, rounds=1,
            )
        if not rows:
            return empty
        return _resolve(spark, pidx, rows)

    # Iterative-doubling phases: score the highest-ub ranges in chunks
    # (phase1_ranges, 2x, 4x, ...), after each chunk re-derive
    # θ = current k-th best COMPLETE score (shards are doc-range-
    # aligned, so every scored doc's score is final) and drop all
    # remaining ranges with ub < θ.  A θ set once after a fixed small
    # phase is too shallow when the k-th result needs many ranges (a
    # rare term spread over dozens of ranges): measured on the
    # 690k-turn corpus, two-phase pruned 0 of 169 ranges where this
    # loop prunes like the serve tier's continuously-updated θ.
    # Each chunk is one Spark job over few shards; rounds are
    # O(log n_ranges) worst case, and the loop exits the moment
    # pruning clears the tail.  Results identical to exhaustive
    # (invariant-tested): pruning drops only ranges provably below θ.
    rows: list = []
    remaining = list(ranges)
    chunk = phase1_ranges
    n_scored = 0
    rounds = 0
    while remaining:
        if len(rows) >= k:
            theta = rows[k - 1]["score"]
            kept = [r for r in remaining if r["ub"] >= theta]
            if not kept:
                break
            if (
                len(kept) > 0.75 * len(remaining)
                and kept[0]["ub"] < 1.5 * theta
            ):
                # θ is clearing almost nothing AND cannot rise much
                # (best remaining ub is within 1.5x of it — near-
                # uniform band): stop paying per-round job overhead
                # and finish the survivors in ONE job.  When the best
                # remaining ub still towers over θ (rare-term ranges
                # not yet scored), keep doubling — θ will climb and
                # clear the tail.
                chunk = len(kept)
            remaining = kept
        batch, remaining = remaining[:chunk], remaining[chunk:]
        rows = merge_topk(
            rows + score_ranges([r["shard_id"] for r in batch]).collect()
        )
        n_scored += len(batch)
        rounds += 1
        chunk *= 2

    if collect_stats is not None:
        collect_stats.update(
            n_ranges=n_ranges_total,
            scored=n_scored,
            pruned=n_ranges_total - n_scored,
            seed_pruned=seed_pruned,
            rounds=rounds,
        )
    if not rows:
        return empty
    return _resolve(spark, pidx, rows)


def _resolve(spark: SparkSession, pidx: PackedIndex, rows: list) -> DataFrame:
    """doc_ord winners → (conv_id, turn_idx, score).

    Serving mode resolves the k winners from the driver-resident docmap
    (zero Spark jobs).  Otherwise: a pushed-down ``doc_ord IN (...)``
    point lookup — docmap is written SORTED by doc_ord, so parquet
    row-group min/max skip everything else (the doc-store point-read
    pattern; at 10^12 docs the driver map is impossible, the pushdown
    is not).
    """
    if pidx._docmap_local is not None:
        resolved = [
            (*pidx._docmap_local[int(r["doc_ord"])], float(r["score"]))
            for r in rows
        ]
        resolved.sort(key=lambda t: (-t[2], t[0], t[1]))
        return spark.createDataFrame(
            resolved, "conv_id string, turn_idx int, score double"
        )
    ords = [int(r["doc_ord"]) for r in rows]
    scores = {int(r["doc_ord"]): float(r["score"]) for r in rows}
    hits = pidx.docmap.filter(F.col("doc_ord").isin(ords)).select(
        "doc_ord", "conv_id", "turn_idx"
    ).collect()
    resolved = [
        (h["conv_id"], h["turn_idx"], scores[h["doc_ord"]]) for h in hits
    ]
    resolved.sort(key=lambda t: (-t[2], t[0], t[1]))
    return spark.createDataFrame(
        resolved, "conv_id string, turn_idx int, score double"
    )
