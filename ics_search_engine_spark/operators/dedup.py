"""Deduplication operators over the transcripts/documents model.

Replaces the reference's O(n²) first-seen nested-loop near-dup check
(/root/reference/components/document_processor.py:72-79, threshold 0.85
from utils/constants.py:28) with LSH-banded dataflow joins, plus the
training-pipeline dedup family (exact, MinHash, n-gram Jaccard).

Determinism: the reference keeps the FIRST-SEEN document — an
order-dependent rule that is meaningless under parallelism.  Every
operator here keeps the MINIMUM docID (conv_id, turn_idx) of each
duplicate group (SURVEY.md §2.2 P3), which is a pure data property.

Scale notes:
* banding joins group by (band_id, band_value) — worst-case skew is a
  band bucket holding many docs (quadratic pair blow-up); run
  ``exact_dedup`` FIRST so LSH only sees distinct texts, which removes
  the degenerate identical-text bucket case; AQE skew-join handles
  residual bucket imbalance;
* exact hamming / Jaccard verification runs only on candidate pairs;
* keeper = min docID over DIRECT neighbors, applied in one pass, is
  this module's default (mirrors the reference's pairwise-vs-kept-set
  shape); for TRANSITIVE groups use operators/components.py
  (alternating large/small-star connected components) —
  ``transitive_dedup(transcripts, pairs)`` accepts any pair frame
  produced here.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from ics_search_engine_spark.functions.udfs import simhash128
from ics_search_engine_spark.operators.index_build import DOC_KEY

_HAMMING_THRESHOLD_DEFAULT = 19  # floor(128 * (1 - 0.85)) = 19 bits


def _docid_col() -> Column:
    # single sortable string docID for pair ordering: conv_id + zero-
    # padded turn_idx (turn_idx < 10^6)
    return F.concat_ws("#", F.col("conv_id"), F.format_string("%06d", F.col("turn_idx")))


def with_simhash(transcripts: DataFrame) -> DataFrame:
    """(conv_id, turn_idx, sim_hi, sim_lo) — fingerprints bit-identical
    to /root/reference/utils/simhash.py:32-47 (see textproc.simhash)."""
    return transcripts.select(
        *DOC_KEY, simhash128(F.col("text")).alias("sh")
    ).select(*DOC_KEY, F.col("sh.sim_hi").alias("sim_hi"), F.col("sh.sim_lo").alias("sim_lo"))


def simhash_near_dup_pairs(
    fp: DataFrame,
    hamming_threshold: int = _HAMMING_THRESHOLD_DEFAULT,
    n_bands: int = 8,
) -> DataFrame:
    """Candidate generation by LSH banding over the 128-bit fingerprint
    (8 bands × 16 bits: any pair within 19 bits differs in ≤19 bands,
    pigeonhole guarantees ≥1 identical 16-bit band when 19 < 8? No —
    pigeonhole guarantees a clean band only when hamming < n_bands; at
    19 bits vs 8 bands this is a RECALL-BOUNDED approximation, exactly
    like production SimHash dedup; the reference's exact-but-quadratic
    scan cannot run at 10^12 docs).  Exact hamming verifies candidates.

    Returns (a_conv_id, a_turn_idx, b_conv_id, b_turn_idx, hamming)
    with docID(a) < docID(b).
    """
    band_width = 128 // n_bands
    bands = []
    for i in range(n_bands):
        # bands 0..(n/2-1) from hi, rest from lo
        src = "sim_hi" if i < n_bands // 2 else "sim_lo"
        shift = 64 - band_width * ((i % (n_bands // 2)) + 1)
        bands.append(
            F.expr(f"({src} >> {shift}) & {(1 << band_width) - 1}").alias(f"b{i}")
        )
    banded = fp.select(
        _docid_col().alias("docid"), "conv_id", "turn_idx",
        "sim_hi", "sim_lo", *bands,
    )
    stacked = banded.select(
        "docid", "conv_id", "turn_idx", "sim_hi", "sim_lo",
        F.posexplode(F.array(*[F.col(f"b{i}") for i in range(n_bands)])).alias(
            "band_id", "band_val"
        ),
    )
    a = stacked.alias("a")
    b = stacked.alias("b")
    cand = (
        a.join(
            b,
            on=[
                F.col("a.band_id") == F.col("b.band_id"),
                F.col("a.band_val") == F.col("b.band_val"),
                F.col("a.docid") < F.col("b.docid"),
            ],
        )
        .select(
            F.col("a.conv_id").alias("a_conv_id"),
            F.col("a.turn_idx").alias("a_turn_idx"),
            F.col("b.conv_id").alias("b_conv_id"),
            F.col("b.turn_idx").alias("b_turn_idx"),
            (
                F.bit_count(F.expr("a.sim_hi ^ b.sim_hi"))
                + F.bit_count(F.expr("a.sim_lo ^ b.sim_lo"))
            ).alias("hamming"),
        )
        .distinct()
    )
    return cand.filter(F.col("hamming") <= hamming_threshold)


def simhash_dedup(
    transcripts: DataFrame,
    hamming_threshold: int = _HAMMING_THRESHOLD_DEFAULT,
) -> DataFrame:
    """Drop near-duplicate turns, keeping the min-docID member of each
    direct-neighbor group — the deterministic analog of the reference's
    keep-first-seen rule (P3).  Returns the surviving transcripts."""
    fp = with_simhash(transcripts)
    pairs = simhash_near_dup_pairs(fp, hamming_threshold)
    # a < b always, so b is a duplicate of some earlier (smaller) doc
    losers = pairs.select(
        F.col("b_conv_id").alias("conv_id"),
        F.col("b_turn_idx").alias("turn_idx"),
    ).distinct()
    return transcripts.join(losers, DOC_KEY, "left_anti")


def exact_dedup(transcripts: DataFrame) -> DataFrame:
    """Exact text dedup: keep min docID per identical text (hash-groupBy
    — one shuffle on md5(text))."""
    keepers = (
        transcripts.groupBy(F.md5(F.col("text")).alias("h"))
        .agg(F.min(F.struct(*DOC_KEY)).alias("keep"))
        .select(F.col("keep.conv_id").alias("conv_id"),
                F.col("keep.turn_idx").alias("turn_idx"))
    )
    return transcripts.join(keepers, DOC_KEY, "left_semi")


def minhash_lsh_pairs(
    transcripts: DataFrame,
    n_hashes: int = 16,
    n_bands: int = 4,
    jaccard_threshold: float = 0.7,
) -> DataFrame:
    """MinHash + LSH near-dup candidates with exact n-gram-free Jaccard
    verification on the ESTIMATED signature (matches/n_hashes ≥ thr).
    Hashes are md5-derived 32-bit ints (cross-engine-exact family).
    """
    rows_per_band = n_hashes // n_bands
    toks = transcripts.select(
        *DOC_KEY,
        F.array_distinct(
            F.filter(
                F.split(F.lower(F.col("text")), "[^a-z0-9]+"),
                lambda x: F.length(x) > 1,
            )
        ).alias("terms"),
    ).filter(F.size("terms") > 0)
    t = toks.select(*DOC_KEY, F.explode("terms").alias("term"))
    sigs = t.groupBy(*DOC_KEY).agg(
        *[
            F.min(
                F.conv(
                    F.substring(F.md5(F.concat(F.lit(f"{i}:"), F.col("term"))), 1, 8),
                    16, 10,
                ).cast("long")
            ).alias(f"mh{i}")
            for i in range(n_hashes)
        ]
    )
    band_cols = [
        F.md5(
            F.concat_ws(
                "_",
                *[F.col(f"mh{b * rows_per_band + r}") for r in range(rows_per_band)],
            )
        ).alias(f"band{b}")
        for b in range(n_bands)
    ]
    banded = sigs.select(
        _docid_col().alias("docid"), *DOC_KEY,
        *[F.col(f"mh{i}") for i in range(n_hashes)], *band_cols,
    )
    stacked = banded.select(
        "docid", *DOC_KEY,
        F.array(*[F.col(f"mh{i}") for i in range(n_hashes)]).alias("sig"),
        F.posexplode(F.array(*[F.col(f"band{b}") for b in range(n_bands)])).alias(
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
                F.col("a.docid") < F.col("b.docid"),
            ],
        )
        .select(
            F.col("a.conv_id").alias("a_conv_id"),
            F.col("a.turn_idx").alias("a_turn_idx"),
            F.col("b.conv_id").alias("b_conv_id"),
            F.col("b.turn_idx").alias("b_turn_idx"),
            (
                F.aggregate(
                    F.zip_with("a.sig", "b.sig", lambda x, y: (x == y).cast("int")),
                    F.lit(0),
                    lambda acc, x: acc + x,
                ).cast("double")
                / n_hashes
            ).alias("est_jaccard"),
        )
        .distinct()
    )
    return cand.filter(F.col("est_jaccard") >= jaccard_threshold)


def ngram_jaccard_pairs(
    transcripts: DataFrame,
    n: int = 3,
    jaccard_threshold: float = 0.5,
    band_hashes: int = 8,
) -> DataFrame:
    """Exact n-gram (shingle) Jaccard on MinHash-LSH candidates: shingle
    sets are compared exactly via an intersection groupBy — the
    verification step the estimated-Jaccard variant skips."""
    shingled = transcripts.select(
        *DOC_KEY,
        F.array_distinct(
            F.when(
                F.size(F.filter(F.split(F.lower("text"), "[^a-z0-9]+"),
                                lambda x: F.length(x) > 1)) >= n,
                F.transform(
                    F.sequence(
                        F.lit(0),
                        F.size(F.filter(F.split(F.lower("text"), "[^a-z0-9]+"),
                                        lambda x: F.length(x) > 1)) - n,
                    ),
                    lambda i: F.concat_ws(
                        " ",
                        *[
                            F.element_at(
                                F.filter(F.split(F.lower("text"), "[^a-z0-9]+"),
                                         lambda x: F.length(x) > 1),
                                i + j + 1,
                            )
                            for j in range(n)
                        ],
                    ),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("shingles"),
    ).filter(F.size("shingles") > 0)

    # candidates via min-hash banding on shingles (1 hash per band)
    ex = shingled.select(
        _docid_col().alias("docid"), *DOC_KEY, F.size("shingles").alias("n_sh"),
        F.explode("shingles").alias("sh"),
    )
    ex = ex.withColumn(
        "h",
        F.conv(F.substring(F.md5(F.col("sh")), 1, 8), 16, 10).cast("long"),
    )
    sigs = ex.groupBy("docid", *DOC_KEY, "n_sh").agg(
        *[
            F.min(
                F.conv(
                    F.substring(F.md5(F.concat(F.lit(f"g{i}:"), F.col("sh"))), 1, 8),
                    16, 10,
                ).cast("long")
            ).alias(f"g{i}")
            for i in range(band_hashes)
        ]
    )
    stacked = sigs.select(
        "docid", *DOC_KEY, "n_sh",
        F.posexplode(F.array(*[F.col(f"g{i}") for i in range(band_hashes)])).alias(
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
                F.col("a.docid") < F.col("b.docid"),
            ],
        )
        .select("a.docid", "b.docid", "a.conv_id", "a.turn_idx",
                "b.conv_id", "b.turn_idx", "a.n_sh", "b.n_sh")
        .toDF("a_docid", "b_docid", "a_conv_id", "a_turn_idx",
              "b_conv_id", "b_turn_idx", "a_n", "b_n")
        .distinct()
    )
    # exact intersection: explode shingles of each side, join on shingle
    sh_a = ex.select(F.col("docid").alias("a_docid"), F.col("sh"))
    sh_b = ex.select(F.col("docid").alias("b_docid"), F.col("sh"))
    inter = (
        cand.join(sh_a, "a_docid")
        .join(sh_b, ["b_docid", "sh"])
        .groupBy(
            "a_docid", "b_docid", "a_conv_id", "a_turn_idx",
            "b_conv_id", "b_turn_idx", "a_n", "b_n",
        )
        .agg(F.count("*").alias("n_inter"))
    )
    jac = F.col("n_inter") / (F.col("a_n") + F.col("b_n") - F.col("n_inter"))
    return inter.select(
        "a_conv_id", "a_turn_idx", "b_conv_id", "b_turn_idx",
        jac.alias("jaccard"),
    ).filter(F.col("jaccard") >= jaccard_threshold)


def _shingle_hashes(text_col: str, n: int) -> Column:
    """Distinct 32-bit md5 hashes of n-token shingles (reference
    tokenization: lowercase, split non-alphanumeric, drop len<2) —
    the same hash family as rolling_fingerprint / minhash."""
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"),
        lambda x: F.length(x) > 1,
    )
    grams = F.transform(
        F.sequence(F.lit(0), F.size(toks) - n),
        lambda i: F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        " ",
                        *[F.element_at(toks, i + j + 1) for j in range(n)],
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long"),
    )
    return F.when(F.size(toks) >= n, F.array_distinct(grams)).otherwise(
        F.array().cast("array<long>")
    )


def ngram_contamination(
    docs: DataFrame,
    bench: DataFrame,
    n: int = 13,
    min_shared: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_id_col: str = "bench_id",
    bench_text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination: which training documents share
    n-token shingles with an evaluation set?  The standard LLM-corpus
    hygiene pass (e.g. GPT-3's 13-gram dedup against benchmarks) —
    reference engine has no analog; this is training-pipeline
    tooling over the same shingle family as the near-dup operators.

    Dataflow: distinct shingle hashes explode on BOTH sides; the
    benchmark side (eval sets are dimension-sized by definition) is
    BROADCAST, so the corpus side never shuffles for the join — the
    only exchange is the (doc, bench) partial-aggregated count.
    Output: (doc_id, bench_id, n_shared) with n_shared >= min_shared,
    ordered (n_shared desc, doc_id, bench_id).  A doc appearing in
    both tables reports itself maximally contaminated — by design
    (that IS the leak).
    """
    if n < 1:
        raise ValueError("n must be >= 1")
    dg = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(_shingle_hashes(text_col, n)).alias("h"),
    )
    bg = bench.select(
        F.col(bench_id_col).alias("bench_id"),
        F.explode(_shingle_hashes(bench_text_col, n)).alias("h"),
    )
    return (
        dg.join(F.broadcast(bg), "h")
        .groupBy("doc_id", "bench_id")
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
        .orderBy(F.desc("n_shared"), F.asc("doc_id"), F.asc("bench_id"))
    )


def dedup_lines_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """C4-style GLOBAL line deduplication (Raffel et al. 2020, §2.2:
    'we discarded all but one of any three-sentence span occurring more
    than once' — the widely-used line-grain variant): across the whole
    corpus, keep only the FIRST occurrence of each distinct non-empty
    line and reassemble documents from their surviving lines.

    'First' is deterministic: the occurrence with the smallest
    (id, line_idx).  This is cross-document dedup at the line grain —
    the within-document signals live in textstats.repetition_signals,
    and whole-document dedup in exact_dedup/minhash_lsh_pairs.

    Plan: posexplode lines → ONE exchange on the line hash (the
    keep/drop decision is a per-hash window, state never leaves the
    executor) → per-doc reassembly (second exchange, doc grain).
    Returns (id, n_lines, n_lines_kept, text_clean) — documents whose
    every line was seen earlier come back with n_lines_kept = 0 and an
    empty string (the caller's funnel decides their fate).
    """
    from pyspark.sql.window import Window

    lines = docs.select(
        id_col,
        F.posexplode(
            F.filter(
                F.split(F.col(text_col), "\n"), lambda x: F.length(x) > 0
            )
        ).alias("line_idx", "line"),
    )
    w = Window.partitionBy(F.md5("line")).orderBy(id_col, "line_idx")
    kept = (
        lines.withColumn("_rk", F.row_number().over(w))
        .withColumn("_keep", F.col("_rk") == 1)
        .drop("_rk")
    )
    return (
        kept.groupBy(id_col)
        .agg(
            F.count("*").alias("n_lines"),
            F.sum(F.col("_keep").cast("int")).alias("n_lines_kept"),
            F.concat_ws(
                "\n",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("_keep"),
                                F.struct("line_idx", "line"),
                            )
                        )
                    ),
                    lambda s: s["line"],
                ),
            ).alias("text_clean"),
        )
    )


def decontaminated_split(
    docs: DataFrame,
    test_frac: float = 0.02,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    min_shared: int = 3,
) -> DataFrame:
    """Contamination-safe train/test split: assign each document to
    the test side by deterministic hash rate (md5_32(id) < frac·2³²,
    the datapipe sampling convention — stable under corpus growth),
    then DROP from the train side every document sharing >=
    ``min_shared`` distinct n-token shingles with ANY test document
    (the ngram_contamination pass, test side broadcast).

    The eval-leak guard a real pretraining pipeline runs before
    training: without it, near-copies of held-out data leak into
    train and inflate eval.  Returns the surviving rows with a
    ``split`` column ('train' | 'test'); contaminated train docs are
    the rows you LOSE — count them via the frame's complement if the
    attrition number matters (or run ngram_contamination directly).
    """
    if not 0.0 < test_frac < 1.0:
        raise ValueError("test_frac must be in (0, 1)")
    thr = int(test_frac * (1 << 32))
    h = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10
    ).cast("long")
    test = docs.filter(h < thr)
    train = docs.filter(~(h < thr))
    cont = (
        ngram_contamination(
            train,
            test.select(F.col(id_col).alias("bench_id"), text_col),
            n=n,
            min_shared=min_shared,
            id_col=id_col,
            text_col=text_col,
        )
        .select(F.col("doc_id").alias(id_col))
        .distinct()
    )
    clean_train = train.join(cont, id_col, "left_anti")
    return clean_train.withColumn("split", F.lit("train")).unionByName(
        test.withColumn("split", F.lit("test"))
    )


def exact_substring_dedup(
    docs: DataFrame,
    l: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact duplicated-SUBSTRING removal (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better") at the
    token-``l``-gram grain: any span of ``l`` consecutive tokens that
    occurs more than once in the corpus keeps exactly its globally
    FIRST occurrence; every other occurrence's tokens are cut from
    their documents.  The paper builds a corpus suffix array; the
    distributed re-expression is rolling ``l``-gram keys + a
    first-occurrence aggregation — same keep-one semantics at the
    chosen grain, no suffix array, no driver state.

    "First" is the minimum of ``id·10⁶ + pos`` (documented packed
    key — ids are corpus ordinals and positions are bounded by
    maximum document length, so the packed order IS (id, pos)
    lexicographic; one integer min makes the aggregation a cheap
    map-side partial agg instead of a per-gram window, which is what
    survives a boilerplate gram occurring 10⁹ times).

    Plan: grams via transform+posexplode (map-only) → ONE exchange on
    the gram hash for the min-agg → join back (gram-grain, pruned to
    duplicated grams) → per-doc start-list agg (doc-grain exchange) →
    covered-position rebuild as nested array lambdas.  Output:
    (id, n_tokens, n_removed, text_dedup) for every input doc.
    """
    if l < 2:
        raise ValueError(f"l={l} must be >= 2")
    toks = F.filter(
        F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))),
                "[^a-z0-9]+"),
        lambda x: F.length(x) > 1,
    )
    t = docs.select(id_col, toks.alias("toks"))
    n = F.size("toks")
    grams = t.filter(n >= l).select(
        id_col,
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n - l),
                lambda p: F.md5(
                    F.concat_ws(" ", F.slice(F.col("toks"), p + 1, l))
                ),
            )
        ).alias("p", "h"),
    )
    key = F.col(id_col) * F.lit(1_000_000) + F.col("p")
    keyed = grams.withColumn("fk", key)
    firsts = keyed.groupBy("h").agg(
        F.min("fk").alias("first_key"), F.count("*").alias("occ")
    )
    dup_starts = (
        keyed.join(
            firsts.filter(F.col("occ") > 1).select("h", "first_key"), "h"
        )
        .filter(F.col("fk") != F.col("first_key"))
        .groupBy(id_col)
        .agg(F.sort_array(F.collect_list("p")).alias("starts"))
    )
    out = t.join(dup_starts, id_col, "left").withColumn(
        "starts",
        F.coalesce(F.col("starts"), F.array().cast("array<int>")),
    )
    covered = lambda p: F.exists(  # noqa: E731
        F.col("starts"), lambda s: (p >= s) & (p < s + l)
    )
    kept = F.filter(
        F.transform(
            "toks",
            lambda x, i: F.when(~covered(i), x),
        ),
        lambda x: x.isNotNull(),
    )
    return out.select(
        id_col,
        F.size("toks").alias("n_tokens"),
        (F.size("toks") - F.size(kept)).alias("n_removed"),
        F.concat_ws(" ", kept).alias("text_dedup"),
    )
