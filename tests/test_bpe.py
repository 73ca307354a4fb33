"""BPE training + encode (operators/bpe) vs an independent reference.

The test-local reference implements the same published algorithm
(Sennrich et al. 2016) from scratch over per-instance symbol LISTS —
a different representation than the operator's freq-dict — so a bug
in either shows up as divergence.
"""

import collections

import pytest

from ics_search_engine_spark.operators.bpe import (
    END,
    bpe_encode,
    bpe_token_stats,
    encode_word,
    fit_bpe,
    word_histogram,
)

CORPUS = (
    ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
)


def ref_fit(words, n_merges):
    """Reference: explicit symbol lists per word INSTANCE."""
    seqs = [list(w) + [END] for w in words]
    merges = []
    for _ in range(n_merges):
        counts = collections.Counter()
        for s in seqs:
            for pair in zip(s, s[1:]):
                counts[pair] += 1
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        for s in seqs:
            i = 0
            while i < len(s) - 1:
                if (s[i], s[i + 1]) == best:
                    s[i : i + 2] = [s[i] + s[i + 1]]
                else:
                    i += 1
    return merges, seqs


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(0, " ".join(CORPUS))], "doc_id long, text string"
    )


def test_fit_matches_reference(spark, docs):
    wf = word_histogram(docs)
    got = fit_bpe(wf, n_merges=8)
    want, _ = ref_fit(CORPUS, 8)
    assert got == want


def test_encode_word_matches_train_segmentation(spark, docs):
    """Greedy lowest-rank-first encode must reproduce the train-time
    final segmentation for every fit-set word."""
    wf = word_histogram(docs)
    merges = fit_bpe(wf, n_merges=10)
    ranks = {p: i for i, p in enumerate(merges)}
    _, seqs = ref_fit(CORPUS, 10)
    train_seg = {"".join(s).replace(END, ""): s for s in seqs}
    for w in set(CORPUS):
        assert encode_word(w, ranks) == train_seg[w]


def test_fit_deterministic(spark, docs):
    wf = word_histogram(docs)
    assert fit_bpe(wf, 6) == fit_bpe(wf, 6)


def test_fit_cap_bites(spark):
    df = spark.createDataFrame(
        [(0, "aa bb aa"), (1, "cc bb aa")], "doc_id long, text string"
    )
    wf = word_histogram(df)
    # cap=1 keeps only 'aa' (freq 3): tie (a,a)=3 vs (a,</w>)=3 breaks
    # lexicographic ('<' sorts before 'a'), so (a,</w>) merges first;
    # no merge may involve the capped-out b/c symbols
    merges = fit_bpe(wf, 5, max_words=1)
    assert merges[0] == ("a", END)
    assert all("b" not in a + b and "c" not in a + b for a, b in merges)


def test_distributed_encode_matches_driver(spark):
    rows = [(i, " ".join(CORPUS[i::3]) + " unseen widest") for i in range(3)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    merges = fit_bpe(word_histogram(df), 8)
    ranks = {p: i for i, p in enumerate(merges)}
    got = {r.doc_id: r.tokens for r in bpe_encode(df, merges).collect()}
    import re

    for i, text in rows:
        want = []
        for w in re.split(r"[^a-z0-9]+", text.lower()):
            if w:
                want.extend(encode_word(w, ranks))
        assert got[i] == want


def test_token_stats_and_empty_text(spark):
    df = spark.createDataFrame(
        [(0, "ab ab ab"), (1, ""), (2, None)], "doc_id long, text string"
    )
    merges = [("a", "b"), ("ab", END)]
    enc = bpe_encode(df, merges)
    rows = {r.doc_id: r for r in enc.collect()}
    assert rows[0].tokens == ["ab" + END] * 3
    assert rows[1].n_tokens == 0 and rows[2].n_tokens == 0
    top = bpe_token_stats(enc, k=2).collect()
    assert top[0].token == "ab" + END and top[0].cnt == 3


def test_no_merges_passthrough(spark):
    df = spark.createDataFrame([(0, "hi")], "doc_id long, text string")
    rows = bpe_encode(df, []).collect()
    assert rows[0].tokens == ["h", "i", END]


def test_oracle_fixpoint_cte_matches_greedy_encode():
    """The gate oracle's per-merge-fixpoint recursive CTEs must equal
    greedy encode_word on words with OVERLAPPING occurrences of one
    merge (banana/thth/…): a single replace() pass consumes the
    shared delimiter space and under-merges (the r3 advisor finding).
    DuckDB-only — no Spark session needed."""
    import duckdb

    from ics_search_engine_spark.entry_queries import (
        _BPE_GATE_MERGES,
        _bpe_fixpoint_ctes,
    )

    ranks = {p: i for i, p in enumerate(_BPE_GATE_MERGES)}
    words = [
        "banana", "thth", "dining", "anana", "nanana", "ththe",
        "ananan", "einein", "the", "then", "thee", "ee", "e", "a", "x",
    ]
    body, last = _bpe_fixpoint_ctes(_BPE_GATE_MERGES)
    sql = f"""
    WITH RECURSIVE w AS (SELECT unnest(?::VARCHAR[]) AS word),
    sym AS (SELECT ' ' || regexp_replace(word, '(.)', '\\1 ', 'g')
                   || '</w> ' AS s FROM w),
    {body}
    SELECT s FROM {last}
    """
    rows = duckdb.sql(sql, params=[words]).fetchall()
    got = sorted(tuple(x for x in r[0].split(" ") if x) for r in rows)
    want = sorted(tuple(encode_word(w, ranks)) for w in words)
    assert got == want
