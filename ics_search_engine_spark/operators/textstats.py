"""Text-analysis operators for the training-data pipeline: language ID,
quality scoring, token counting, document fingerprinting.

All pure Catalyst expressions (whole-stage codegen) except nothing —
no UDFs needed here.  The per-document variants over the driver's
``documents`` table live in entry_queries (DuckDB-gated); these are the
transcript-schema forms plus the language-ID heuristic.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from ics_search_engine_spark.operators.index_build import DOC_KEY
from ics_search_engine_spark.textproc.tokenizer import STOP_WORDS

# Marker-word profiles for the n-gram/stop-word language heuristic.
# Classic closed-class giveaway words per language (public linguistic
# knowledge; the same approach as stopword-based langid baselines).
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "it",
           "was", "this", "are", "be", "have", "not", "you", "they"],
    "es": ["el", "la", "los", "las", "de", "que", "en", "un", "una", "por",
           "con", "para", "es", "se", "su", "al", "lo", "como", "del"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "eine", "zu",
           "den", "von", "mit", "auf", "im", "des", "sich", "dem", "werden"],
    "fr": ["le", "la", "les", "de", "des", "et", "est", "en", "un", "une",
           "du", "que", "qui", "dans", "pour", "pas", "sur", "avec", "ce"],
}


def _toks(c: str = "text") -> Column:
    return F.filter(F.split(F.lower(F.col(c)), "[^a-z0-9]+"),
                    lambda x: F.length(x) > 0)


# GPT-2-style pre-tokenizer, simplified to the RE2-compatible subset
# (no lookahead) so the identical pattern runs in Spark's Java regex
# AND the DuckDB oracle: contraction suffixes, space-prefixed letter
# runs, space-prefixed digit runs, space-prefixed punctuation runs.
# Counting these matches approximates a BPE tokenizer's pre-split
# token count — the budget number an LLM-data pipeline sizes with.
BPE_ISH_PATTERN = r"'(?:[sdmt]|ll|ve|re)| ?[a-zA-Z]+| ?[0-9]+| ?[^\sa-zA-Z0-9]+"


def token_counts(transcripts: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-turn token budgets → (conv_id, turn_idx, ws_tokens,
    bpe_tokens): whitespace-separated count (\\S+ runs — no trim/split
    edge cases on all-whitespace or newline-padded text) and the
    BPE-ish pre-tokenizer match count.  Both are single regexp passes
    inside codegen — the 100 TB shape is a map-only scan, no shuffle
    at all."""
    return transcripts.select(
        *DOC_KEY,
        F.size(
            F.regexp_extract_all(F.col(text_col), F.lit(r"\S+"), 0)
        ).alias("ws_tokens"),
        F.size(
            F.regexp_extract_all(F.col(text_col), F.lit(BPE_ISH_PATTERN), 0)
        ).alias("bpe_tokens"),
    )


def detect_language(transcripts: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language ID: count marker-word hits per language, pick
    the max (ties + zero-hit → 'und').  Deterministic tie-break by
    language code ascending.  Pure column expressions — one projection,
    no shuffle, no UDF."""
    toks = _toks(text_col)
    hit_cols = []
    for lang, markers in sorted(LANG_MARKERS.items()):
        hit_cols.append(
            F.struct(
                F.size(F.filter(toks, lambda x: x.isin(markers))).alias("hits"),
                F.lit(lang).alias("lang"),
            )
        )
    # array_max on struct: compares by hits then lang — we want max hits,
    # tie → SMALLEST lang, so invert lang ordering via sort+reverse trick:
    # instead pick via aggregate fold with explicit comparison.
    best = F.aggregate(
        F.array(*hit_cols),
        F.struct(F.lit(-1).alias("hits"), F.lit("und").alias("lang")),
        lambda acc, x: F.when(x["hits"] > acc["hits"], x).otherwise(acc),
    )
    return transcripts.withColumn(
        "lang_pred",
        F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und")),
    )


def quality_features(transcripts: DataFrame) -> DataFrame:
    """Per-turn quality features: token count, stop-word ratio, mean
    token length, non-alnum ratio, digit ratio, uppercase ratio."""
    toks = _toks()
    dl = F.size(toks)
    stop_hits = F.size(F.filter(toks, lambda x: x.isin(sorted(STOP_WORDS))))
    tok_chars = F.aggregate(toks, F.lit(0), lambda a, x: a + F.length(x))
    text_len = F.length("text")
    non_alnum = text_len - F.length(
        F.regexp_replace(F.col("text"), "[^a-zA-Z0-9 ]", "")
    )
    digits = F.length(F.regexp_replace(F.col("text"), "[^0-9]", ""))
    uppers = F.length(F.regexp_replace(F.col("text"), "[^A-Z]", ""))
    safe = lambda num, den: F.when(den > 0, num.cast("double") / den).otherwise(0.0)  # noqa: E731
    return transcripts.select(
        *DOC_KEY,
        dl.alias("n_tokens"),
        safe(stop_hits, dl).alias("stop_ratio"),
        safe(tok_chars, dl).alias("mean_token_len"),
        safe(non_alnum, text_len).alias("punct_ratio"),
        safe(digits, text_len).alias("digit_ratio"),
        safe(uppers, text_len).alias("upper_ratio"),
    )


def quality_filter(
    transcripts: DataFrame,
    min_tokens: int = 3,
    max_stop_ratio: float = 0.9,
    max_punct_ratio: float = 0.5,
) -> DataFrame:
    """Drop low-quality turns (too short / stopword-degenerate / mostly
    punctuation) — the batch analog of a pretraining quality gate."""
    feats = quality_features(transcripts)
    keep = feats.filter(
        (F.col("n_tokens") >= min_tokens)
        & (F.col("stop_ratio") <= max_stop_ratio)
        & (F.col("punct_ratio") <= max_punct_ratio)
    ).select(*DOC_KEY)
    return transcripts.join(keep, DOC_KEY, "left_semi")


def _grams(toks: Column, n: int) -> Column:
    """Array of space-joined n-grams (empty when the doc is shorter
    than n tokens)."""
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, i + j + 1) for j in range(n)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def repetition_signals(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_n: int = 2,
    dup_n: int = 5,
) -> DataFrame:
    """Within-document repetition signals, the published
    Gopher-rules family (Rae et al. 2021, §A1.1 'repetitious text'):

    line grain (pure per-row Catalyst — no shuffle):
      * ``n_lines``, ``dup_line_frac_r6``   — repeated-line fraction;
      * ``dup_line_char_frac_r6``           — chars in repeats beyond
                                              each line's first copy;
      * ``bullet_line_frac_r6``             — lines starting -, *, •;
      * ``ellipsis_line_frac_r6``           — lines ending ... / …;

    n-gram grain (explode → per-(doc, gram) count → per-doc fold; two
    exchanges, both on the doc grain — scales linearly):
      * ``top_gram_char_frac_r6`` — max_g c(g)·|g| / Σ_g c(g)·|g| over
        ``top_n``-grams (the most-frequent-n-gram char fraction);
      * ``dup_gram_char_frac_r6`` — Σ_{c(g)≥2} c(g)·|g| / Σ_g c(g)·|g|
        over ``dup_n``-grams (the duplicated-n-gram char fraction).

    Exact weighted-by-chars formulas are pinned here (the paper leaves
    position-union details open); short docs (< n tokens) score 0.
    """
    toks = _toks(text_col)
    lines = F.filter(
        F.split(F.col(text_col), "\n"), lambda x: F.length(x) > 0
    )
    nl = F.size(lines)
    dl_chars = F.aggregate(lines, F.lit(0), lambda a, x: a + F.length(x))
    dd_chars = F.aggregate(
        F.array_distinct(lines), F.lit(0), lambda a, x: a + F.length(x)
    )
    bullets = F.size(F.filter(lines, lambda x: x.rlike(r"^\s*[-*•]")))
    ellipsis = F.size(
        F.filter(lines, lambda x: x.rlike(r"(\.\.\.|…)\s*$"))
    )
    safe = lambda num, den: F.round(  # noqa: E731
        F.when(den > 0, num.cast("double") / den).otherwise(0.0), 6
    )
    base = docs.select(
        id_col,
        nl.alias("n_lines"),
        safe(nl - F.size(F.array_distinct(lines)), nl).alias(
            "dup_line_frac_r6"
        ),
        safe(dl_chars - dd_chars, dl_chars).alias("dup_line_char_frac_r6"),
        safe(bullets, nl).alias("bullet_line_frac_r6"),
        safe(ellipsis, nl).alias("ellipsis_line_frac_r6"),
    )

    def gram_frac(n: int, dup_only: bool, out: str) -> DataFrame:
        per_gram = (
            docs.select(
                id_col, F.explode(_grams(_toks(text_col), n)).alias("g")
            )
            .groupBy(id_col, "g")
            .agg(F.count("*").alias("c"), F.max(F.length("g")).alias("gl"))
        )
        w = F.col("c") * F.col("gl")
        num = (
            F.sum(F.when(F.col("c") >= 2, w).otherwise(F.lit(0)))
            if dup_only
            else F.max(w)
        )
        return per_gram.groupBy(id_col).agg(
            F.round(
                num.cast("double") / F.sum(w).cast("double"), 6
            ).alias(out)
        )

    top = gram_frac(top_n, dup_only=False, out="top_gram_char_frac_r6")
    dup = gram_frac(dup_n, dup_only=True, out="dup_gram_char_frac_r6")
    return (
        base.join(top, id_col, "left")
        .join(dup, id_col, "left")
        .fillna(
            0.0, subset=["top_gram_char_frac_r6", "dup_gram_char_frac_r6"]
        )
    )


def unigram_logprob(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document mean unigram negative log-likelihood under the
    corpus's own unigram distribution — the CCNet-style LM quality
    proxy (Wenzek et al. 2020 score documents by LM perplexity; with
    no external LM in-sandbox, the corpus unigram model is the
    deterministic stand-in): low = made of common words, high = rare/
    noisy vocabulary.

    nll(d) = (1/|d|) Σ_{token t in d} -ln( tf_corpus(t) / N )

    Plan: one explode + one (term) agg for the model, a join back on
    term, one (doc) agg — every key is either the term or the doc, so
    it scales like the postings build itself.  Fully lazy: the corpus
    total rides in as a broadcast one-row frame (no eager count), and
    the model's exchange is shared between the join branch and the
    total branch (ReusedExchange), so the corpus is tokenized exactly
    twice per run, never three times.  Empty docs are dropped (no
    tokens → no likelihood).
    """
    tok = docs.select(id_col, F.explode(_toks(text_col)).alias("term"))
    model = tok.groupBy("term").agg(F.count("*").alias("tf"))
    totals = model.agg(F.sum("tf").cast("double").alias("_total"))
    scored = (
        tok.join(model, "term")
        .crossJoin(F.broadcast(totals))
        .select(
            id_col,
            (-F.log(F.col("tf").cast("double") / F.col("_total"))).alias(
                "nll"
            ),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count("*").alias("n_tokens"),
        F.round(F.avg("nll"), 6).alias("mean_nll_r6"),
    )


def bigram_logprob(
    docs: DataFrame,
    alpha: float = 1.0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document mean BIGRAM negative log-likelihood under the
    corpus's own additively-smoothed bigram model — the LM-perplexity
    quality filter at the order CCNet actually uses context for
    (unigram_logprob is the order-1 sibling; with no external LM
    in-sandbox the corpus self-model is the deterministic stand-in):

        P(w2 | w1) = (c(w1 w2) + α) / (c(w1) + α·V)
        P(w1)      = tf(w1) / N          (first token of the doc)
        nll(d)     = (1/|d|) [ -ln P(t1) + Σ_{i≥2} -ln P(t_i|t_{i-1}) ]

    where V = |distinct unigrams| and N = total tokens.  Low = common
    word SEQUENCES (fluent text), high = rare transitions (shuffled /
    boilerplate / noisy text that a unigram model cannot tell apart
    from fluent text with the same vocabulary).

    Plan: bigram pairs come from the token ARRAY map-side
    (arrays_zip of two slices — no window, no self-join); the bigram
    and unigram models are one (w1, w2) and one (term) aggregation;
    scoring is two term-keyed joins + one doc-keyed aggregation —
    every exchange key is a term or the doc id, the postings-build
    shape.  V and N ride in as a broadcast one-row frame.  Empty docs
    are dropped; single-token docs score on the unigram term alone.
    """
    toks = _toks(text_col)
    base = docs.select(id_col, toks.alias("_t")).filter(F.size("_t") > 0)

    uni = base.select(id_col, F.explode("_t").alias("term"))
    uni_model = uni.groupBy("term").agg(F.count("*").alias("tf"))
    consts = uni_model.agg(
        F.sum("tf").cast("double").alias("_n"),
        F.count("*").cast("double").alias("_v"),
    )

    pairs = base.select(
        id_col,
        F.explode(
            F.arrays_zip(
                F.slice(F.col("_t"), 1, F.size("_t") - 1).alias("w1"),
                F.slice(F.col("_t"), 2, F.size("_t") - 1).alias("w2"),
            )
        ).alias("p"),
    ).select(id_col, F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    bi_model = pairs.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    w1_counts = uni_model.select(
        F.col("term").alias("w1"), F.col("tf").alias("c1")
    )

    bi_nll = (
        pairs.join(bi_model, ["w1", "w2"])
        .join(w1_counts, "w1")
        .crossJoin(F.broadcast(consts))
        .select(
            id_col,
            (-F.log(
                (F.col("c12") + F.lit(float(alpha)))
                / (F.col("c1") + F.lit(float(alpha)) * F.col("_v"))
            )).alias("nll"),
        )
    )
    first_nll = (
        base.select(id_col, F.element_at("_t", 1).alias("term"))
        .join(uni_model, "term")
        .crossJoin(F.broadcast(consts))
        .select(
            id_col,
            (-F.log(F.col("tf").cast("double") / F.col("_n"))).alias(
                "nll"
            ),
        )
    )
    return (
        bi_nll.unionByName(first_nll)
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(F.avg("nll"), 6).alias("mean_nll_r6"),
        )
    )


def rolling_fingerprint(transcripts: DataFrame, n: int = 3) -> DataFrame:
    """Min 32-bit hash over n-token shingles per turn (rolling-hash
    document fingerprint; shared family with entry_queries
    q_shingle_fingerprint)."""
    toks = F.filter(F.split(F.lower(F.col("text")), "[^a-z0-9]+"),
                    lambda x: F.length(x) > 1)
    fp = F.when(
        F.size(toks) >= n,
        F.array_min(
            F.transform(
                F.sequence(F.lit(0), F.size(toks) - n),
                lambda i: F.conv(
                    F.substring(
                        F.md5(F.concat_ws(
                            " ", *[F.element_at(toks, i + j + 1) for j in range(n)]
                        )),
                        1, 8,
                    ),
                    16, 10,
                ).cast("long"),
            )
        ),
    ).otherwise(F.lit(None).cast("long"))
    return transcripts.select(*DOC_KEY, fp.alias("fingerprint"))


def term_cooccurrence(
    tokens_df: DataFrame,
    top_v: int = 10_000,
    min_pairs: int = 5,
) -> DataFrame:
    """Pointwise mutual information of term PAIRS co-occurring in a
    document → (t1, t2, n_pair, pmi), t1 < t2.

    The collocation statistic a training-data pipeline uses to find
    multiword expressions and template boilerplate; the reference has
    no corpus-level term analytics at all (its only aggregate is df,
    /root/reference/components/index_manager.py:39).

    PMI(a,b) = ln( n_ab · N / (n_a · n_b) ) over DOCUMENT-level
    presence counts (tf ignored), pairs with n_ab < ``min_pairs``
    dropped.

    Scale: naive pair mining is O(doc_len²) per doc and vocabulary² in
    the worst case, so the vocabulary is pruned FIRST to the ``top_v``
    df-heaviest terms (broadcast set, the only collect — ≤ top_v rows);
    pair counting is then one self-join of the distinct (doc, term)
    relation on doc_id with t1 < t2 — a hash join whose per-doc fan-out
    is bounded by |doc ∩ top_v|², followed by a hash-agg rollup.  No
    driver-side row processing.

    ``tokens_df``: (doc_id, toks array<string>) — pass index-mode
    tokens for parity with the rest of the engine.
    """
    pres = tokens_df.select(
        "doc_id", F.explode(F.array_distinct("toks")).alias("term")
    )
    n_docs = tokens_df.count()
    dfs = pres.groupBy("term").agg(F.count("*").alias("df"))
    vocab = dfs.orderBy(F.desc("df"), F.asc("term")).limit(top_v)
    pres_v = pres.join(F.broadcast(vocab), "term").select(
        "doc_id", "term", "df"
    )
    left = pres_v.select(
        "doc_id",
        F.col("term").alias("t1"),
        F.col("df").alias("df1"),
    )
    right = pres_v.select(
        "doc_id",
        F.col("term").alias("t2"),
        F.col("df").alias("df2"),
    )
    pairs = (
        left.join(right, "doc_id")
        .filter(F.col("t1") < F.col("t2"))
        .groupBy("t1", "t2")
        .agg(
            F.count("*").alias("n_pair"),
            F.first("df1").alias("df1"),
            F.first("df2").alias("df2"),
        )
        .filter(F.col("n_pair") >= min_pairs)
    )
    pmi = F.log(
        F.col("n_pair").cast("double") * F.lit(float(n_docs))
        / (F.col("df1").cast("double") * F.col("df2").cast("double"))
    )
    return pairs.select(
        "t1", "t2", "n_pair", pmi.alias("pmi")
    ).orderBy(F.desc("pmi"), "t1", "t2")


# PII patterns, ordered; RE2-compatible (no lookarounds) so the SAME
# pattern strings run in Spark's Java regex and the DuckDB oracle
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("secret", r"\b[0-9a-f]{32,}\b", "<SECRET>"),
    ("phone", r"\+\d{9,15}\b", "<PHONE>"),
]


def scrub_pii(
    docs: DataFrame,
    text_col: str = "text",
    patterns: list[tuple[str, str, str]] | None = None,
) -> DataFrame:
    """Corpus-hygiene PII/secret scrubbing: replace emails, IPv4
    addresses, long hex tokens (API keys / hashes), and international
    phone numbers with typed placeholder tags, and count each category
    (counts measured on the ORIGINAL text, replacements applied
    sequentially in pattern order).

    Pure per-row Catalyst (regexp_count + chained regexp_replace) —
    whole-stage codegen, no shuffle, rides the scan like every other
    map-shaped hygiene verb.  Patterns are deliberately lookaround-free
    so the identical strings run under Java regex and RE2-family
    engines (the DuckDB gate).
    """
    pats = PII_PATTERNS if patterns is None else patterns
    out = docs
    scrubbed = F.col(text_col)
    for name, rx, tag in pats:
        out = out.withColumn(
            f"n_{name}", F.regexp_count(F.col(text_col), F.lit(rx))
        )
        scrubbed = F.regexp_replace(scrubbed, rx, tag)
    return out.withColumn(f"{text_col}_clean", scrubbed)


def corpus_report(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str | None = "lang",
    source_col: str | None = "source",
    exact_dup_rate: bool = False,
) -> DataFrame:
    """Dataset-card summary: one row of the numbers a corpus release
    documents — doc count, token totals (whitespace grain), length
    distribution, exact-duplicate rate, language/source cardinalities.
    One scan + one global agg (all sub-aggregates decomposable, so
    map-side partials do the work); the duplicate rate rides the same
    pass as approx_count_distinct over the text hash (HLL — the scale
    default; ``exact_dup_rate=True`` swaps in an exact distinct for
    oracle parity / small corpora)."""
    ws = F.size(F.regexp_extract_all(F.col(text_col), F.lit(r"\S+"), 0))
    aggs = [
        F.count("*").alias("n_docs"),
        F.sum(ws).alias("total_ws_tokens"),
        F.round(F.avg(ws), 6).alias("mean_ws_tokens_r6"),
        F.min(ws).alias("min_ws_tokens"),
        F.max(ws).alias("max_ws_tokens"),
        F.round(
            F.lit(1.0)
            - (
                F.countDistinct(F.md5(text_col))
                if exact_dup_rate
                else F.approx_count_distinct(F.md5(text_col))
            )
            / F.count("*").cast("double"),
            4,
        ).alias("dup_rate_r4" if exact_dup_rate else "approx_dup_rate_r4"),
    ]
    if lang_col is not None and lang_col in docs.columns:
        aggs.append(F.countDistinct(lang_col).alias("n_langs"))
    if source_col is not None and source_col in docs.columns:
        aggs.append(F.countDistinct(source_col).alias("n_sources"))
    return docs.select("*", ws.alias("_ws")).agg(*aggs)


def script_ratios(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document writing-script composition: the fraction of
    non-space characters in Latin, CJK, Cyrillic, and Arabic ranges
    (plus digits).  The zeroth language-ID signal — marker-word voting
    (detect_language) can only separate languages that share the Latin
    script; script ratios separate everything else first.  Pure
    regexp_replace length arithmetic inside codegen — no shuffle."""
    chars = F.length(F.regexp_replace(F.col(text_col), r"\s", ""))

    def ratio(cls: str, name: str):
        kept = F.length(
            F.regexp_replace(
                F.regexp_replace(F.col(text_col), r"\s", ""),
                f"[^{cls}]",
                "",
            )
        )
        return F.round(
            F.when(chars > 0, kept.cast("double") / chars).otherwise(0.0), 6
        ).alias(name)

    return docs.select(
        id_col,
        chars.alias("n_chars_nospace"),
        ratio("A-Za-z", "latin_r6"),
        ratio("一-鿿", "cjk_r6"),
        ratio("Ѐ-ӿ", "cyrillic_r6"),
        ratio("؀-ۿ", "arabic_r6"),
        ratio("0-9", "digit_r6"),
    )


# script → language shortcut for the non-Latin scripts the corpus
# carries; marker voting only makes sense within the Latin script
_SCRIPT_LANGS = [("cjk_r6", "zh"), ("cyrillic_r6", "ru"), ("arabic_r6", "ar")]


def detect_language_scripted(
    transcripts: DataFrame,
    text_col: str = "text",
    script_threshold: float = 0.3,
) -> DataFrame:
    """Language ID with a script pre-pass: if >= ``script_threshold``
    of a row's non-space characters are CJK/Cyrillic/Arabic the row is
    labeled zh/ru/ar directly; otherwise the Latin marker-word vote
    (detect_language) decides.  Same no-shuffle projection shape."""
    chars = F.length(F.regexp_replace(F.col(text_col), r"\s", ""))

    def frac(cls: str):
        kept = F.length(
            F.regexp_replace(
                F.regexp_replace(F.col(text_col), r"\s", ""),
                f"[^{cls}]",
                "",
            )
        )
        return F.when(chars > 0, kept.cast("double") / chars).otherwise(0.0)

    voted = detect_language(transcripts, text_col)
    pred = None
    for cls, lang in [
        ("一-鿿", "zh"),
        ("Ѐ-ӿ", "ru"),
        ("؀-ۿ", "ar"),
    ]:
        cond = frac(cls) >= script_threshold
        pred = F.when(cond, lang) if pred is None else pred.when(cond, lang)
    return voted.withColumn(
        "lang_pred", pred.otherwise(F.col("lang_pred"))
    )


# ------------------------------------------------- C4 line-rule filter


def c4_line_rules(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 5,
    min_lines: int = 3,
) -> DataFrame:
    """C4's line-level quality rules (Raffel et al. 2020, §2.2 —
    distinct from the three-sentence-span DEDUP, which lives in
    dedup.dedup_lines_corpus):

    * keep only lines ending in a terminal punctuation mark
      (``.``, ``!``, ``?``, ``"``),
    * keep only lines with ≥ ``min_words`` words,
    * drop any line containing the word "javascript" (case-
      insensitive),
    * drop the whole DOCUMENT if it contains "lorem ipsum" (case-
      insensitive) or a ``{`` (code), or if fewer than ``min_lines``
      lines survive.

    Returns every input doc as (id, n_lines, n_lines_kept, text_clean,
    kept boolean) — surviving text reassembled from surviving lines in
    order, ``kept`` the document-level verdict — so a filter_funnel
    stage can account attrition before dropping.

    Scale: pure Catalyst projection (split → filter → array ops), no
    UDF, no shuffle — a map-only stage at any corpus size.
    """
    lines = F.filter(
        F.split(F.col(text_col), "\n"), lambda x: F.length(x) > 0
    )

    def line_ok(line: Column) -> Column:
        t = F.trim(line)
        return (
            F.substring(t, -1, 1).isin(".", "!", "?", '"')
            & (F.size(F.split(t, r"\s+")) >= min_words)
            & ~F.lower(t).contains("javascript")
        )

    kept_lines = F.filter(lines, line_ok)
    doc_bad = F.lower(F.col(text_col)).contains("lorem ipsum") | F.col(
        text_col
    ).contains("{")
    return docs.select(
        id_col,
        F.size(lines).alias("n_lines"),
        F.size(kept_lines).alias("n_lines_kept"),
        F.concat_ws("\n", kept_lines).alias("text_clean"),
        (
            ~doc_bad & (F.size(kept_lines) >= min_lines)
        ).alias("kept"),
    )
