"""Phrase search vs a pure-Python positional-intersection oracle."""

import pytest

from ics_search_engine_spark.operators.packed_index import (
    PackedIndex,
    build_packed_index,
)
from ics_search_engine_spark.operators.phrase import phrase_offsets, phrase_topk
from ics_search_engine_spark.textproc.tokenizer import tokenize


def _oracle_phrase(rows, phrase, k=10):
    offs = phrase_offsets(phrase)
    if not offs:
        return []
    base = offs[0][1]
    rel = [(t, o - base) for t, o in offs]
    out = []
    for conv_id, turn_idx, text in rows:
        toks = tokenize(text, for_query=False)
        pos_of = {}
        for p, t in enumerate(toks):
            pos_of.setdefault(t, set()).add(p)
        first = pos_of.get(rel[0][0], set())
        count = 0
        for p in first:
            if all(p + off in pos_of.get(t, set()) for t, off in rel[1:]):
                count += 1
        if count > 0:
            out.append((conv_id, turn_idx, count))
    out.sort(key=lambda x: (-x[2], x[0], x[1]))
    return out[:k]


class TestPhraseOffsets:
    def test_stopwords_occupy_positions(self):
        assert phrase_offsets("master of science") == [("master", 0), ("scienc", 2)]

    def test_single_char_skipped(self):
        # 'a' is both a stop word and len-1: occupies no position at all
        assert phrase_offsets("x machine learning") == [("machin", 0), ("learn", 1)]

    def test_empty(self):
        assert phrase_offsets("") == []
        assert phrase_offsets("the of and") == []


class TestPhraseSearch:
    @pytest.fixture(scope="class")
    def setup(self, spark, corpus_dir):
        rows = [
            ("c0", 0, "we study machine learning and search engines daily"),
            ("c1", 0, "machine learning is used; learning machine backwards"),
            ("c2", 0, "machine of learning"),  # not adjacent
            ("c3", 0, "machine learning machine learning machine learning"),
            ("c4", 0, "masters of science in machine learning"),
            ("c5", 0, "nothing relevant whatsoever appears here"),
        ]
        df = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
        out = f"{corpus_dir}/phrase_idx"
        build_packed_index(spark, df, out, range_bits=4)
        return PackedIndex(spark, out), rows

    @pytest.mark.parametrize("phrase", [
        "machine learning",
        "masters of science",
        "learning machine",
        "search engines",
        "machine of learning",
        "absent phrase entirely",
    ])
    def test_matches_oracle(self, spark, setup, phrase):
        pidx, rows = setup
        got = [
            (r["conv_id"], r["turn_idx"], r["match_count"])
            for r in phrase_topk(spark, pidx, phrase, k=10).collect()
        ]
        assert got == _oracle_phrase(rows, phrase), phrase

    def test_repeated_phrase_counts(self, spark, setup):
        pidx, rows = setup
        got = phrase_topk(spark, pidx, "machine learning", k=10).collect()
        counts = {r["conv_id"]: r["match_count"] for r in got}
        assert counts["c3"] == 3
        assert counts["c0"] == 1
        assert "c2" not in counts

    def test_stopword_gap_phrase(self, spark, setup):
        pidx, rows = setup
        got = {r["conv_id"] for r in phrase_topk(spark, pidx, "masters of science", k=10).collect()}
        assert got == {"c4"}

    def test_on_synthetic_corpus(self, spark, small_df, small_rows, corpus_dir):
        out = f"{corpus_dir}/phrase_idx_small"
        build_packed_index(spark, small_df, out, range_bits=9)
        pidx = PackedIndex(spark, out)
        for phrase in ["machine learning", "the spark"]:
            got = [
                (r["conv_id"], r["turn_idx"], r["match_count"])
                for r in phrase_topk(spark, pidx, phrase, k=10).collect()
            ]
            assert got == _oracle_phrase(small_rows, phrase), phrase


def _oracle_near(rows, query, window, k=10):
    """Anchored unordered-proximity oracle (see near_topk docstring)."""
    terms = sorted(set(tokenize(query, for_query=True)))
    if not terms:
        return []
    out = []
    for conv_id, turn_idx, text in rows:
        toks = tokenize(text, for_query=False)
        pos_of = {}
        for p, t in enumerate(toks):
            pos_of.setdefault(t, []).append(p)
        if not all(t in pos_of for t in terms):
            continue
        count = 0
        for p in pos_of[terms[0]]:
            if all(
                any(abs(q - p) <= window for q in pos_of[t])
                for t in terms[1:]
            ):
                count += 1
        if count > 0:
            out.append((conv_id, turn_idx, count))
    out.sort(key=lambda x: (-x[2], x[0], x[1]))
    return out[:k]


class TestNearSearch:
    @pytest.fixture(scope="class")
    def setup(self, spark, corpus_dir):
        rows = [
            ("c0", 0, "we study machine learning and search engines daily"),
            ("c1", 0, "machine tools help; far away words then learning ends"),
            ("c2", 0, "learning about the machine"),  # within 3, reversed
            ("c3", 0, "machine learning machine learning machine learning"),
            ("c4", 0, "machine alpha beta gamma delta epsilon zeta learning"),
            ("c5", 0, "nothing relevant whatsoever appears here"),
        ]
        df = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
        out = f"{corpus_dir}/near_idx"
        build_packed_index(spark, df, out, range_bits=4)
        return PackedIndex(spark, out), rows

    @pytest.mark.parametrize("query,window", [
        ("machine learning", 1),
        ("machine learning", 3),
        ("machine learning", 100),
        ("learning machine", 3),       # order-insensitive
        ("machine learning search", 4),
        ("machine", 1),                # single term -> tf
        ("absent terms query", 5),
        ("the of and", 2),             # all stop words -> empty
    ])
    def test_matches_oracle(self, spark, setup, query, window):
        from ics_search_engine_spark.operators.phrase import near_topk

        pidx, rows = setup
        got = [
            (r["conv_id"], r["turn_idx"], r["match_count"])
            for r in near_topk(spark, pidx, query, window, k=10).collect()
        ]
        assert got == _oracle_near(rows, query, window), (query, window)

    def test_window_tightens_monotonically(self, spark, setup):
        from ics_search_engine_spark.operators.phrase import near_topk

        pidx, rows = setup
        hits = {}
        for w in (1, 3, 7, 100):
            hits[w] = {
                (r["conv_id"], r["match_count"])
                for r in near_topk(spark, pidx, "machine learning", w, k=10).collect()
            }
        # widening the window never loses a match
        docs = {w: {c for c, _ in hits[w]} for w in hits}
        assert docs[1] <= docs[3] <= docs[7] <= docs[100]
        # c4 only matches at window >= 7 (distance 7)
        assert "c4" not in docs[3] and "c4" in docs[7]

    def test_on_synthetic_corpus(self, spark, small_df, small_rows, corpus_dir):
        from ics_search_engine_spark.operators.phrase import near_topk

        out = f"{corpus_dir}/near_idx_small"
        build_packed_index(spark, small_df, out, range_bits=9)
        pidx = PackedIndex(spark, out)
        for query, w in [("machine learning", 3), ("spark query engine", 6)]:
            got = [
                (r["conv_id"], r["turn_idx"], r["match_count"])
                for r in near_topk(spark, pidx, query, w, k=10).collect()
            ]
            assert got == _oracle_near(small_rows, query, w), (query, w)

def _oracle_near_ordered(rows, query, window, k=10):
    """Exact existential-chain oracle (recursive — no greedy shortcut)."""
    seq = tokenize(query, for_query=True)
    if not seq:
        return []
    out = []
    for conv_id, turn_idx, text in rows:
        toks = tokenize(text, for_query=False)
        pos_of = {}
        for p, t in enumerate(toks):
            pos_of.setdefault(t, []).append(p)
        if not all(t in pos_of for t in set(seq)):
            continue

        def ok(i, prev):
            if i == len(seq):
                return True
            return any(
                ok(i + 1, q)
                for q in pos_of[seq[i]]
                if prev < q <= prev + window
            )

        count = sum(1 for p in pos_of[seq[0]] if ok(1, p))
        if count > 0:
            out.append((conv_id, turn_idx, count))
    out.sort(key=lambda x: (-x[2], x[0], x[1]))
    return out[:k]


class TestNearOrdered:
    @pytest.fixture(scope="class")
    def setup(self, spark, corpus_dir):
        rows = [
            ("c0", 0, "we study machine learning and search engines daily"),
            ("c1", 0, "learning about the machine"),  # reversed: no ordered hit
            ("c2", 0, "machine learning machine learning machine learning"),
            # greedy-MIN counterexample: alpha@4, bravo@{5,8}, charlie@12
            # — the chain only completes through bravo=8 (min witness 5
            # strands charlie: 12 > 5+5)
            ("c3", 0, "pad pad pad pad alpha bravo pad pad bravo pad pad pad charlie"),
            # greedy-MAX counterexample: alpha@4, bravo@{5,8}, charlie@6
            # — only bravo=5 works (max witness 8 makes charlie@6 non-forward)
            ("c4", 0, "pad pad pad pad alpha bravo charlie pad bravo"),
            ("c5", 0, "machine alpha beta gamma delta epsilon zeta learning"),
            ("c6", 0, "nothing relevant whatsoever appears here"),
        ]
        df = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
        out = f"{corpus_dir}/near_ordered_idx"
        build_packed_index(spark, df, out, range_bits=4, with_positions=True)
        return PackedIndex(spark, out), rows, out

    @pytest.mark.parametrize("query,window", [
        ("machine learning", 1),
        ("machine learning", 3),
        ("learning machine", 3),          # order-SENSITIVE: c0 must drop
        ("alpha bravo charlie", 5),       # both greedy counterexamples
        ("alpha bravo charlie", 2),
        ("machine learning", 100),
        ("machine", 1),                   # single term -> tf
        ("machine machine", 2),           # duplicate term chain
        ("absent terms query", 5),
        ("the of and", 2),                # all stop words -> empty
    ])
    def test_matches_oracle(self, spark, setup, query, window):
        from ics_search_engine_spark.operators.phrase import near_ordered_topk

        pidx, rows, _ = setup
        got = [
            (r["conv_id"], r["turn_idx"], r["match_count"])
            for r in near_ordered_topk(spark, pidx, query, window, k=10).collect()
        ]
        assert got == _oracle_near_ordered(rows, query, window), (query, window)

    def test_greedy_counterexamples_pin_counts(self, spark, setup):
        """The two adversarial docs each have EXACTLY one valid chain —
        a greedy-min implementation would return 0 for c3, a greedy-max
        one 0 for c4."""
        from ics_search_engine_spark.operators.phrase import near_ordered_topk

        pidx, _, _ = setup
        got = {
            r["conv_id"]: r["match_count"]
            for r in near_ordered_topk(
                spark, pidx, "alpha bravo charlie", 5, k=10
            ).collect()
        }
        assert got == {"c3": 1, "c4": 1}

    def test_two_term_ordered_subset_of_unordered(self, spark, setup):
        """For TWO terms the chain gap and the anchor radius coincide
        (one gap from the anchor), so ordered hits ⊆ unordered hits.
        Beyond two terms they deliberately diverge: the chain reaches
        (n-1)·window from the anchor while unordered NEAR bounds every
        term to ±window of it — c3's 'alpha bravo charlie' matches
        ordered-5 (span 8 via bravo@8) but not unordered-5."""
        from ics_search_engine_spark.operators.phrase import (
            near_ordered_topk,
            near_topk,
        )

        pidx, _, _ = setup
        for q, w in [("machine learning", 3), ("machine learning", 1)]:
            ordered = {
                r["conv_id"]
                for r in near_ordered_topk(spark, pidx, q, w, k=10).collect()
            }
            unordered = {
                r["conv_id"] for r in near_topk(spark, pidx, q, w, k=10).collect()
            }
            assert ordered <= unordered, (q, w)
        chain = {
            r["conv_id"]
            for r in near_ordered_topk(
                spark, pidx, "alpha bravo charlie", 5, k=10
            ).collect()
        }
        radius = {
            r["conv_id"]
            for r in near_topk(spark, pidx, "alpha bravo charlie", 5, k=10).collect()
        }
        assert "c3" in chain and "c3" not in radius

    def test_serving_parity(self, spark, setup):
        from ics_search_engine_spark.serving import LocalIndexServer

        pidx, rows, out = setup
        srv = LocalIndexServer(out)
        for q, w in [
            ("machine learning", 3),
            ("learning machine", 3),
            ("alpha bravo charlie", 5),
            ("alpha bravo charlie", 2),
            ("machine machine", 2),
            ("machine", 1),
            ("absent terms query", 5),
        ]:
            spark_rows = [
                (r["conv_id"], r["turn_idx"], r["match_count"])
                for r in near_ordered_topk_import(spark, pidx, q, w)
            ]
            assert srv.search_near_ordered(q, w, k=10) == spark_rows, (q, w)


def near_ordered_topk_import(spark, pidx, q, w, k=10):
    from ics_search_engine_spark.operators.phrase import near_ordered_topk

    return near_ordered_topk(spark, pidx, q, w, k=k).collect()


class TestSpanFirst:
    @pytest.fixture(scope="class")
    def setup(self, spark, corpus_dir):
        rows = [
            ("c0", 0, "we study machine learning and search engines daily"),
            ("c1", 0, "machine learning is used; learning machine backwards"),
            ("c2", 0, "machine of learning"),
            ("c3", 0, "deep in the text sits a machine eventually"),
            ("c5", 0, "nothing relevant whatsoever appears here"),
        ]
        df = spark.createDataFrame(
            rows, "conv_id string, turn_idx int, text string"
        )
        out = f"{corpus_dir}/spanfirst_idx"
        build_packed_index(spark, df, out, range_bits=4)
        return PackedIndex(spark, out), rows

    def test_matches_token_scan(self, spark, setup):
        from ics_search_engine_spark.operators.phrase import span_first_topk
        from ics_search_engine_spark.textproc.tokenizer import tokenize

        pidx, rows = setup
        got = span_first_topk(spark, pidx, "machine", end=5, k=10**6
                              ).collect()
        probe = "machin"
        expect = {}
        for c, t, txt in rows:
            toks = tokenize(txt)
            if probe in toks:
                p = toks.index(probe)
                if p < 5:
                    expect[(c, t)] = p
        assert expect  # fixture must exercise the path
        assert {
            (r["conv_id"], r["turn_idx"]): r["first_pos"] for r in got
        } == expect
        order = [(r["first_pos"], r["conv_id"], r["turn_idx"]) for r in got]
        assert order == sorted(order)

    def test_multi_token_probe_rejected(self, spark, setup):
        from ics_search_engine_spark.operators.phrase import span_first_topk

        pidx, _ = setup
        with pytest.raises(ValueError):
            span_first_topk(spark, pidx, "machine learning", end=5)
