"""Fuzzy term expansion vs a pure-Python transcription, plus
serving ≡ Spark parity."""

import pytest

from oracle import bm25 as oracle
from ics_search_engine_spark.operators.fuzzy import (
    bm25_topk_fuzzy,
    edit_distance,
    select_matches,
)
from ics_search_engine_spark.operators.packed_index import (
    PackedIndex,
    build_packed_index,
)
from ics_search_engine_spark.serving import LocalIndexServer
from ics_search_engine_spark.textproc.tokenizer import tokenize

QUERIES = [
    "machine learning",        # exact terms: distance 0 is own match
    "machne learnng",          # one deletion each
    "sparkk",                  # one insertion
    "zzzzzzzzzz",              # nothing within distance
    "machine machne",          # instances accumulate on shared match
]


def _oracle_fuzzy(rows, query, k=10, max_dist=2, max_matches=8):
    idx = oracle.build_index(rows)
    probes: dict[str, int] = {}
    for t in tokenize(query, for_query=True):
        probes[t] = probes.get(t, 0) + 1
    qtf: dict[str, int] = {}
    for p, inst in probes.items():
        cands = [
            (t, idx.df(t), edit_distance(t, p))
            for t in idx.postings
            if edit_distance(t, p) <= max_dist
        ]
        for t, _d in select_matches(cands, max_matches):
            qtf[t] = qtf.get(t, 0) + inst
    scores: dict[tuple[str, int], float] = {}
    for term in sorted(qtf):
        d_f = idx.df(term)
        for docid, tf in idx.postings[term].items():
            scores[docid] = scores.get(docid, 0.0) + oracle.bm25_contribution(
                tf, idx.dl[docid], idx.avgdl, idx.n_docs, d_f, qtf[term]
            )
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
    return [(c, t, s) for (c, t), s in ranked[:k]]


class TestEditDistance:
    @pytest.mark.parametrize("a,b,d", [
        ("spark", "spark", 0),
        ("sprak", "spark", 2),      # classic: transposition costs 2
        ("machin", "machine", 1),
        ("", "abc", 3),
        ("kitten", "sitting", 3),
    ])
    def test_known_values(self, a, b, d):
        assert edit_distance(a, b) == d
        assert edit_distance(b, a) == d

    def test_agrees_with_spark_levenshtein(self, spark):
        pairs = [("sprak", "spark"), ("jion", "join"), ("machne", "machin"),
                 ("window", "windows"), ("abcdef", "xyz")]
        df = spark.createDataFrame(pairs, "a string, b string")
        import pyspark.sql.functions as F

        got = df.select(F.levenshtein("a", "b").alias("d")).collect()
        assert [r["d"] for r in got] == [
            edit_distance(a, b) for a, b in pairs
        ]


class TestFuzzySearch:
    @pytest.fixture(scope="class")
    def setup(self, spark, small_df, small_rows, corpus_dir):
        out = f"{corpus_dir}/fuzzy_idx"
        build_packed_index(spark, small_df, out, range_bits=9)
        return PackedIndex(spark, out), LocalIndexServer(out), small_rows

    @pytest.mark.parametrize("q", QUERIES)
    def test_matches_oracle_bit_identical(self, spark, setup, q):
        pidx, _, rows = setup
        got = [
            (r["conv_id"], r["turn_idx"], r["score"])
            for r in bm25_topk_fuzzy(spark, pidx, q, k=10).collect()
        ]
        assert got == _oracle_fuzzy(rows, q), q

    @pytest.mark.parametrize("q", QUERIES)
    def test_serving_identical_to_spark(self, spark, setup, q):
        pidx, srv, _ = setup
        spark_rows = [
            (r["conv_id"], r["turn_idx"], r["score"])
            for r in bm25_topk_fuzzy(spark, pidx, q, k=10).collect()
        ]
        assert srv.search_fuzzy(q, k=10) == spark_rows, q

    def test_max_matches_cap(self, spark, setup):
        pidx, srv, rows = setup
        q, cap = "machne", 2
        got = [
            (r["conv_id"], r["turn_idx"], r["score"])
            for r in bm25_topk_fuzzy(
                spark, pidx, q, k=10, max_matches=cap
            ).collect()
        ]
        assert got == _oracle_fuzzy(rows, q, max_matches=cap)
        assert srv.search_fuzzy(q, k=10, max_matches=cap) == got

    def test_closer_match_beats_heavier(self):
        # selection rule: distance ascends before df descends
        sel = select_matches(
            [("heavy", 1000, 2), ("close", 3, 1), ("tie", 3, 1)], 2
        )
        assert sel == [("close", 3), ("tie", 3)]


class TestSymSpell:
    """The deletion-index expander must be BIT-IDENTICAL to the scan
    expander (SymSpell candidates are a superset; exact verification
    trims) and its probe must push down on the sorted dkey table."""

    @pytest.fixture(scope="class")
    def setup(self, spark, small_df, small_rows, corpus_dir):
        out = f"{corpus_dir}/symspell_idx"
        build_packed_index(spark, small_df, out, range_bits=9)
        return PackedIndex(spark, out), small_rows

    def test_probe_delete_keys(self):
        from ics_search_engine_spark.operators.fuzzy import (
            probe_delete_keys,
        )

        assert probe_delete_keys("ab", 1) == {"ab", "a", "b"}
        assert probe_delete_keys("ab", 2) == {"ab", "a", "b", ""}
        assert probe_delete_keys("abc", 2) == {
            "abc", "ab", "ac", "bc", "a", "b", "c"
        }
        # depth 0: the word itself
        assert probe_delete_keys("x", 0) == {"x"}

    def test_expansion_bit_identical_to_scan(self, spark, setup):
        from ics_search_engine_spark.operators.fuzzy import (
            fuzzy_expand,
            fuzzy_expand_symspell,
        )

        pidx, _ = setup
        for q in QUERIES + ["a", "ab", "machinz learnz zzz"]:
            probes: dict[str, int] = {}
            for t in tokenize(q, for_query=True):
                probes[t] = probes.get(t, 0) + 1
            want = fuzzy_expand(pidx, probes, 2, 8)
            got = fuzzy_expand_symspell(spark, pidx, probes, 2, 8)
            assert got == want, q

    @pytest.mark.parametrize("q", QUERIES)
    def test_topk_identical_to_scan(self, spark, setup, q):
        pidx, _ = setup
        want = [
            (r["conv_id"], r["turn_idx"], r["score"])
            for r in bm25_topk_fuzzy(spark, pidx, q, k=10).collect()
        ]
        got = [
            (r["conv_id"], r["turn_idx"], r["score"])
            for r in bm25_topk_fuzzy(
                spark, pidx, q, k=10, expander="symspell"
            ).collect()
        ]
        assert got == want, q

    def test_dkey_probe_pushes_down(self, spark, setup):
        from ics_search_engine_spark.operators.fuzzy import (
            ensure_deletes_dict,
            probe_delete_keys,
        )
        import pyspark.sql.functions as F

        pidx, _ = setup
        deletes = ensure_deletes_dict(spark, pidx, 2)
        keys = sorted(probe_delete_keys("machne", 2))
        plan = (
            deletes.filter(F.col("dkey").isin(keys))
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "PushedFilters" in plan and "dkey" in plan, plan

    def test_deletes_dict_is_idempotent(self, spark, setup):
        import os

        from ics_search_engine_spark.operators.fuzzy import (
            DELETES_DICT_NAME,
            ensure_deletes_dict,
        )

        pidx, _ = setup
        d1 = ensure_deletes_dict(spark, pidx, 2)
        path = f"{pidx.path}/{DELETES_DICT_NAME}_d2"
        mtime = max(
            os.path.getmtime(os.path.join(path, f))
            for f in os.listdir(path)
        )
        d2 = ensure_deletes_dict(spark, pidx, 2)
        mtime2 = max(
            os.path.getmtime(os.path.join(path, f))
            for f in os.listdir(path)
        )
        assert mtime == mtime2
        assert d1.count() == d2.count()

    def test_bad_expander_raises(self, spark, setup):
        pidx, _ = setup
        with pytest.raises(ValueError):
            bm25_topk_fuzzy(spark, pidx, "x", expander="wat")

    def test_partial_dict_is_rebuilt_not_served(self, spark, setup):
        """A build killed mid-write leaves a parquet directory WITHOUT
        the _SUCCESS marker (Spark creates the path before commit).
        ensure_deletes_dict must treat that as 'not built' and
        rebuild; expander='auto' must NOT select it."""
        import os
        import shutil

        from ics_search_engine_spark.operators.fuzzy import (
            DELETES_DICT_NAME,
            deletes_dict_ready,
            ensure_deletes_dict,
            fuzzy_expand,
            fuzzy_expand_symspell,
        )

        pidx, _ = setup
        # Use a distinct max_dist so the class-scoped d2 dict is
        # untouched: simulate the partial tree for d1.
        path = f"{pidx.path}/{DELETES_DICT_NAME}_d1"
        if os.path.exists(path):
            shutil.rmtree(path)
        os.makedirs(os.path.join(path, "klen=3"))
        with open(os.path.join(path, "klen=3", "part-0.parquet"),
                  "wb") as f:
            f.write(b"PAR1 truncated garbage")
        assert not deletes_dict_ready(path)
        # auto with only the partial d1 tree on disk → scan path
        # (would throw or return garbage if it read the partial tree).
        top_auto = bm25_topk_fuzzy(
            spark, pidx, "machne", k=5, max_dist=1, expander="auto"
        ).collect()
        top_scan = bm25_topk_fuzzy(
            spark, pidx, "machne", k=5, max_dist=1, expander="scan"
        ).collect()
        assert [tuple(r) for r in top_auto] == [
            tuple(r) for r in top_scan
        ]
        # ensure_deletes_dict rebuilds over the partial tree and the
        # result is committed + bit-identical to the scan expander.
        ensure_deletes_dict(spark, pidx, 1)
        assert deletes_dict_ready(path)
        probes = {"machne": 1}
        assert fuzzy_expand_symspell(
            spark, pidx, probes, 1, 8
        ) == fuzzy_expand(pidx, probes, 1, 8)

    def test_ready_requires_success_marker(self, setup):
        from ics_search_engine_spark.operators.fuzzy import (
            DELETES_DICT_NAME,
            deletes_dict_ready,
        )

        pidx, _ = setup
        path = f"{pidx.path}/{DELETES_DICT_NAME}_d2"
        assert deletes_dict_ready(path)  # committed by the fixture
        assert not deletes_dict_ready(path + "_nonexistent")


class TestFuzzyWand:
    """use_wand=True must be rank- and score-identical to the
    exhaustive fuzzy path for every expander."""

    @pytest.fixture(scope="class")
    def setup(self, spark, small_df, small_rows, corpus_dir):
        out = f"{corpus_dir}/fuzzy_wand_idx"
        build_packed_index(spark, small_df, out, range_bits=9)
        return PackedIndex(spark, out), small_rows

    @pytest.mark.parametrize("q", QUERIES + ["machinz learnz"])
    def test_wand_identical_to_exhaustive(self, spark, setup, q):
        pidx, _ = setup
        plain = [
            tuple(r)
            for r in bm25_topk_fuzzy(spark, pidx, q, k=10).collect()
        ]
        wand = [
            tuple(r)
            for r in bm25_topk_fuzzy(
                spark, pidx, q, k=10, use_wand=True
            ).collect()
        ]
        assert wand == plain, q

    def test_wand_symspell_identical(self, spark, setup):
        pidx, _ = setup
        a = [tuple(r) for r in bm25_topk_fuzzy(
            spark, pidx, "machne", k=10, expander="symspell"
        ).collect()]
        b = [tuple(r) for r in bm25_topk_fuzzy(
            spark, pidx, "machne", k=10, expander="symspell",
            use_wand=True,
        ).collect()]
        assert a == b

    def test_serving_wand_identical(self, spark, setup):
        from ics_search_engine_spark.serving import LocalIndexServer

        pidx, _ = setup
        srv = LocalIndexServer(pidx.path)
        for q in QUERIES:
            plain = srv.search_fuzzy(q, k=10)
            st: dict = {}
            wand = srv.search_fuzzy(q, k=10, use_wand=True, stats=st)
            assert wand == plain, q
