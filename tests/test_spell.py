"""Spell suggestion (operators/spell.py) vs a pure-Python selection
oracle, plus serving-tier and LSM parity."""

import pytest

from oracle import bm25 as oracle
from ics_search_engine_spark.operators.fuzzy import edit_distance
from ics_search_engine_spark.operators.packed_index import (
    PackedIndex,
    build_packed_index,
)
from ics_search_engine_spark.operators.spell import (
    did_you_mean,
    suggest_terms,
)
from ics_search_engine_spark.serving import (
    LocalIndexServer,
    LocalSegmentedServer,
)
from ics_search_engine_spark.textproc.tokenizer import tokenize


@pytest.fixture(scope="module")
def setup(spark, small_df, small_rows, corpus_dir):
    out = f"{corpus_dir}/spell_idx"
    build_packed_index(spark, small_df, out, range_bits=9)
    idx = oracle.build_index(small_rows)
    return PackedIndex(spark, out), idx


def _best(idx, probe, max_dist=2):
    cands = [
        (t, idx.df(t), edit_distance(t, probe))
        for t in idx.postings
        if edit_distance(t, probe) <= max_dist
    ]
    cands.sort(key=lambda x: (x[2], -x[1], x[0]))
    return cands[0] if cands else None


@pytest.mark.parametrize("probe", [
    "machin",      # exact stem -> itself at distance 0
    "machne",      # typo of a real stem
    "learnin",     # missing char
    "reserch",     # transposed-ish (two edits)
    "zzzzzzqq",    # hopeless
])
def test_suggest_matches_selection_oracle(spark, setup, probe):
    pidx, idx = setup
    row = suggest_terms(spark, pidx, [probe]).collect()[0]
    want = _best(idx, probe)
    if want is None:
        assert (row["suggestion"], row["dist"], row["df"]) == (
            probe, None, None
        )
    else:
        t, df, dist = want
        assert (row["suggestion"], row["dist"], row["df"]) == (t, dist, df)


def test_suggest_is_one_bounded_collect(spark, setup):
    """Many probes still resolve in one job whose result is
    |probes|-bounded (each branch is a top-1)."""
    pidx, idx = setup
    probes = ["machne", "learnin", "reserch", "studnt", "zzzzzzqq"]
    rows = suggest_terms(spark, pidx, probes).collect()
    assert len(rows) == len(probes)
    assert [r["token"] for r in rows] == sorted(probes)


def test_did_you_mean_rewrites_and_preserves_order(spark, setup):
    pidx, idx = setup
    got = did_you_mean(spark, pidx, "machne learning machne")
    toks = tokenize("machne learning machne", for_query=True)
    fix0 = _best(idx, toks[0])[0]
    fix1 = _best(idx, toks[1])[0]
    assert got == f"{fix0} {fix1} {fix0}"


def test_did_you_mean_none_when_clean(spark, setup):
    pidx, _ = setup
    assert did_you_mean(spark, pidx, "machine learning") is None
    assert did_you_mean(spark, pidx, "") is None


def test_did_you_mean_keeps_hopeless_tokens(spark, setup, corpus_dir):
    pidx, idx = setup
    got = did_you_mean(spark, pidx, "machne zzzzzzqq")
    toks = tokenize("machne zzzzzzqq", for_query=True)
    assert got == f"{_best(idx, toks[0])[0]} {toks[1]}"


def test_serving_parity(spark, setup):
    pidx, _ = setup
    srv = LocalIndexServer(pidx.path)
    for q in [
        "machne learning machne",
        "machine learning",
        "machne zzzzzzqq",
        "reserch studnt",
        "",
    ]:
        assert srv.did_you_mean(q) == did_you_mean(spark, pidx, q), q


def test_lsm_parity(spark, setup, small_df, corpus_dir):
    """Suggestion over segments uses the UNION dictionary — identical
    to the compacted index."""
    import pyspark.sql.functions as F

    pidx, _ = setup
    seg_dirs = [f"{corpus_dir}/spell_seg_{i}" for i in range(2)]
    import os
    for i, d in enumerate(seg_dirs):
        if not os.path.exists(f"{d}/stats.json"):
            part = small_df.filter(F.pmod(F.hash("conv_id"), F.lit(2)) == i)
            build_packed_index(spark, part, d, range_bits=9)
    full = LocalIndexServer(pidx.path)
    lsm = LocalSegmentedServer(seg_dirs)
    for q in ["machne learning", "reserch studnt", "machine learning"]:
        assert lsm.did_you_mean(q) == full.did_you_mean(q), q


class TestCompletions:
    def test_completions_match_dictionary_scan(self, spark, setup):
        from ics_search_engine_spark.operators.spell import (
            suggest_completions,
        )

        pidx, idx = setup
        got = [
            (r["term"], r["df"])
            for r in suggest_completions(pidx, "ma", size=5).collect()
        ]
        cand = sorted(
            (
                (t, len(plist))
                for t, plist in idx.postings.items()
                if t.startswith("ma")
            ),
            key=lambda kv: (-kv[1], kv[0]),
        )[:5]
        assert got == cand

    def test_prefix_skips_query_analyzer(self, spark, setup):
        """1-char prefixes and stemmable fragments must not be dropped
        or stemmed — the prefix is typed text, not a term."""
        from ics_search_engine_spark.operators.spell import (
            suggest_completions,
        )

        pidx, _ = setup
        one = suggest_completions(pidx, "m", size=3).collect()
        assert len(one) == 3  # length-1 prefix still completes
        assert all(r["term"].startswith("m") for r in one)
        assert suggest_completions(pidx, "  ", size=3).count() == 0


def _lm_transcription(rows, toks, cands, max_phrases=200):
    """Pure-Python replay of phrase_suggest's stupid-backoff scoring
    over the stemmed index-mode corpus."""
    import itertools
    import math

    docs = [tokenize(t, for_query=False) for _, _, t in rows]
    cf: dict[str, int] = {}
    adj: dict[tuple[str, str], int] = {}
    total = 0
    for d in docs:
        total += len(d)
        for w in d:
            cf[w] = cf.get(w, 0) + 1
        for a, b in zip(d, d[1:]):
            adj[(a, b)] = adj.get((a, b), 0) + 1
    floor = 1.0 / (2.0 * total)

    def uni(w):
        return cf[w] / total if cf.get(w, 0) > 0 else floor

    def backoff(p, w):
        a = adj.get((p, w), 0)
        if a > 0:
            return a / cf[p]
        return 0.4 * cf[w] / total if cf.get(w, 0) > 0 else floor

    scored = []
    for ph in itertools.islice(
        itertools.product(*[cands[t] for t in toks]), max_phrases
    ):
        s = math.log10(uni(ph[0]))
        for i in range(1, len(ph)):
            s += math.log10(backoff(ph[i - 1], ph[i]))
        scored.append((" ".join(ph), s))
    scored.sort(key=lambda r: (-r[1], r[0]))
    return scored


class TestPhraseSuggest:
    def _cands(self, idx, probes, per_token=3, max_dist=2):
        out = {}
        for p in set(probes):
            cands = [
                (t, idx.df(t), edit_distance(t, p))
                for t in idx.postings
                if edit_distance(t, p) <= max_dist
            ]
            cands.sort(key=lambda x: (x[2], -x[1], x[0]))
            out[p] = [c[0] for c in cands[:per_token]] or [p]
        return out

    def test_candidate_terms_rank_and_oov(self, spark, setup):
        from ics_search_engine_spark.operators.spell import candidate_terms

        pidx, idx = setup
        probes = ["machne", "learnin", "qqqzzzxxxy"]
        got = candidate_terms(spark, pidx, probes, per_token=3)
        expect = self._cands(idx, probes)
        assert got == expect
        assert got["qqqzzzxxxy"] == ["qqqzzzxxxy"]  # OOV passthrough

    def test_phrase_suggest_matches_transcription(
        self, spark, setup, small_rows
    ):
        from ics_search_engine_spark.operators.spell import phrase_suggest

        pidx, idx = setup
        query = "machine lerning"
        toks = tokenize(query, for_query=True)
        cands = self._cands(idx, toks)
        expect = _lm_transcription(small_rows, toks, cands)[:3]
        got = [
            (r["suggestion"], r["score"])
            for r in phrase_suggest(spark, pidx, query, size=3).collect()
        ]
        assert [g[0] for g in got] == [e[0] for e in expect]
        for g, e in zip(got, expect):
            assert g[1] == pytest.approx(e[1], rel=1e-12)

    def test_context_beats_isolated_df(self, spark, setup, small_rows):
        """The phrase-vs-term distinction: the top suggestion's bigram
        must actually occur in the corpus (score strictly above the
        pure-backoff alternative when an adjacency exists)."""
        from ics_search_engine_spark.operators.spell import phrase_suggest

        pidx, idx = setup
        got = phrase_suggest(
            spark, pidx, "machine lerning", size=3
        ).collect()
        assert got, "expected suggestions"
        top = got[0]["suggestion"].split()
        docs = [tokenize(t, for_query=False) for _, _, t in small_rows]
        assert any(
            a == top[0] and b == top[1]
            for d in docs for a, b in zip(d, d[1:])
        ), "top suggestion's bigram should occur in the corpus"

    def test_empty_and_oov_queries(self, spark, setup):
        from ics_search_engine_spark.operators.spell import phrase_suggest

        pidx, idx = setup
        assert phrase_suggest(spark, pidx, "the and of").count() == 0
        rows = phrase_suggest(
            spark, pidx, "qqqzzzxxxy wwwvvvuuut", size=2
        ).collect()
        # both tokens OOV: one floor-scored passthrough phrase
        assert len(rows) == 1
        assert rows[0]["suggestion"] == "qqqzzzxxxy wwwvvvuuut"


class TestSymSpellExpander:
    """suggest_terms(expander='symspell') must equal the scan expander
    row-for-row in every suggest_mode — the shared deletion-index path
    (operators/fuzzy.ensure_deletes_dict)."""

    PROBES = ["machin", "machne", "learnin", "reserch", "zzzzzzqq"]

    @pytest.mark.parametrize("mode", ["always", "missing", "popular"])
    def test_identical_to_scan(self, spark, setup, mode):
        pidx, _ = setup
        want = sorted(
            tuple(r) for r in suggest_terms(
                spark, pidx, self.PROBES, mode=mode
            ).collect()
        )
        got = sorted(
            tuple(r) for r in suggest_terms(
                spark, pidx, self.PROBES, mode=mode, expander="symspell"
            ).collect()
        )
        assert got == want, mode

    def test_empty_probes(self, spark, setup):
        pidx, _ = setup
        assert suggest_terms(
            spark, pidx, [], expander="symspell"
        ).count() == 0

    def test_bad_expander(self, spark, setup):
        pidx, _ = setup
        with pytest.raises(ValueError):
            suggest_terms(spark, pidx, ["x"], expander="wat")
