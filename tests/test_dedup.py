"""Dedup operator tests: LSH precision/recall vs brute force, keeper
determinism, exact dedup."""

import numpy as np
import pytest

from ics_search_engine_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_dedup,
    simhash_near_dup_pairs,
    with_simhash,
)
from ics_search_engine_spark.textproc.simhash import simhash_text


@pytest.fixture(scope="module")
def fingerprints(spark, small_df):
    return with_simhash(small_df).collect()


def _brute_force_pairs(rows, threshold):
    ids = [(r["conv_id"], r["turn_idx"]) for r in rows]
    his = np.array([r["sim_hi"] for r in rows], dtype=np.int64).astype(np.uint64)
    los = np.array([r["sim_lo"] for r in rows], dtype=np.int64).astype(np.uint64)
    out = set()
    for i in range(len(rows)):
        xh = his[i] ^ his[i + 1:]
        xl = los[i] ^ los[i + 1:]
        ham = np.array(
            [bin(int(a)).count("1") + bin(int(b)).count("1") for a, b in zip(xh, xl)]
        )
        for j in np.flatnonzero(ham <= threshold):
            a, b = sorted([ids[i], ids[i + 1 + int(j)]])
            out.add((a, b, int(ham[j])))
    return out


class TestSimhashLSH:
    def test_udf_matches_scalar_core(self, spark, small_df, fingerprints):
        texts = {
            (r["conv_id"], r["turn_idx"]): r["text"]
            for r in small_df.limit(50).collect()
        }
        got = {
            (r["conv_id"], r["turn_idx"]): (r["sim_hi"], r["sim_lo"])
            for r in fingerprints
        }
        for k, text in texts.items():
            assert got[k] == simhash_text(text), k

    def test_precision_is_exact(self, spark, small_df, fingerprints):
        fp = with_simhash(small_df)
        pairs = simhash_near_dup_pairs(fp, hamming_threshold=19).collect()
        brute = _brute_force_pairs(fingerprints, 19)
        brute_keys = {(a, b) for a, b, _ in brute}
        assert len(pairs) > 0, "synthetic corpus should contain near-dups"
        for p in pairs:
            key = (
                (p["a_conv_id"], p["a_turn_idx"]),
                (p["b_conv_id"], p["b_turn_idx"]),
            )
            assert key in brute_keys, key
            assert p["hamming"] <= 19

    def test_recall_guaranteed_below_band_count(self, spark, small_df, fingerprints):
        # pigeonhole: hamming < n_bands(=8) → at least one clean band
        fp = with_simhash(small_df)
        got = {
            (
                (p["a_conv_id"], p["a_turn_idx"]),
                (p["b_conv_id"], p["b_turn_idx"]),
            )
            for p in simhash_near_dup_pairs(fp, hamming_threshold=19).collect()
        }
        brute_tight = {(a, b) for a, b, h in _brute_force_pairs(fingerprints, 7)}
        assert brute_tight, "expected some tight near-dups in corpus"
        missing = brute_tight - got
        assert not missing, missing

    def test_dedup_keeps_min_docid(self, spark, small_df):
        fp = with_simhash(small_df)
        pairs = simhash_near_dup_pairs(fp, hamming_threshold=19).collect()
        survivors = {
            (r["conv_id"], r["turn_idx"])
            for r in simhash_dedup(small_df).select("conv_id", "turn_idx").collect()
        }
        n_before = small_df.count()
        losers = {
            (p["b_conv_id"], p["b_turn_idx"]) for p in pairs
        }
        assert len(survivors) == n_before - len(losers)
        for a, b in (
            (
                (p["a_conv_id"], p["a_turn_idx"]),
                (p["b_conv_id"], p["b_turn_idx"]),
            )
            for p in pairs
        ):
            assert b not in survivors
            # 'a' survives unless itself a 'b' of some other pair
            if a not in losers:
                assert a in survivors


class TestExactDedup:
    def test_removes_identical_texts_keeps_min(self, spark):
        df = spark.createDataFrame(
            [
                ("c1", 0, "hello world code"),
                ("c1", 1, "hello world code"),
                ("c0", 5, "hello world code"),
                ("c2", 0, "unique text here"),
            ],
            "conv_id string, turn_idx int, text string",
        )
        out = {(r["conv_id"], r["turn_idx"]) for r in exact_dedup(df).collect()}
        assert out == {("c0", 5), ("c2", 0)}

    def test_idempotent(self, spark, small_df):
        once = exact_dedup(small_df)
        twice = exact_dedup(once)
        assert once.count() == twice.count()


class TestMinhashAndNgram:
    def test_minhash_finds_near_dups(self, spark, small_df):
        pairs = minhash_lsh_pairs(
            small_df, n_hashes=16, n_bands=8, jaccard_threshold=0.6
        )
        rows = pairs.collect()
        assert len(rows) > 0
        for r in rows:
            assert 0.6 <= r["est_jaccard"] <= 1.0

    def test_ngram_jaccard_exact_on_known_pair(self, spark):
        df = spark.createDataFrame(
            [
                ("a", 0, "the quick brown fox jumps over the lazy dog today"),
                ("b", 0, "the quick brown fox jumps over the lazy dog tonight"),
                ("c", 0, "completely different words appear in this sentence here"),
            ],
            "conv_id string, turn_idx int, text string",
        )
        rows = ngram_jaccard_pairs(df, n=3, jaccard_threshold=0.3).collect()
        keys = {
            ((r["a_conv_id"]), (r["b_conv_id"])): r["jaccard"] for r in rows
        }
        # 10-token texts differ in last token: shingles 8 vs 8, 7 shared
        # jaccard = 7 / (8 + 8 - 7) = 7/9
        assert ("a", "b") in keys
        assert abs(keys[("a", "b")] - 7 / 9) < 1e-12
        assert all(k == ("a", "b") for k in keys)


class TestDedupLinesCorpus:
    def test_first_occurrence_wins_and_reassembly(self, spark):
        from ics_search_engine_spark.operators.dedup import (
            dedup_lines_corpus,
        )

        docs = spark.createDataFrame(
            [
                (1, "shared header\nunique one\ncommon footer"),
                (2, "shared header\nunique two\ncommon footer"),
                (3, "shared header\ncommon footer"),
            ],
            "doc_id long, text string",
        )
        out = {
            r["doc_id"]: r.asDict()
            for r in dedup_lines_corpus(docs).collect()
        }
        assert out[1]["n_lines"] == 3 and out[1]["n_lines_kept"] == 3
        assert out[1]["text_clean"] == "shared header\nunique one\ncommon footer"
        # doc 2 loses both shared lines (doc 1 owns them), keeps its own
        assert out[2]["n_lines_kept"] == 1
        assert out[2]["text_clean"] == "unique two"
        # doc 3 is nothing but already-seen lines
        assert out[3]["n_lines_kept"] == 0
        assert out[3]["text_clean"] == ""

    def test_within_doc_duplicate_also_collapses(self, spark):
        from ics_search_engine_spark.operators.dedup import (
            dedup_lines_corpus,
        )

        docs = spark.createDataFrame(
            [(7, "same\nsame\nother")], "doc_id long, text string"
        )
        r = dedup_lines_corpus(docs).collect()[0]
        assert r["n_lines"] == 3 and r["n_lines_kept"] == 2
        assert r["text_clean"] == "same\nother"

    def test_deterministic(self, spark):
        from ics_search_engine_spark.operators.dedup import (
            dedup_lines_corpus,
        )

        docs = spark.createDataFrame(
            [(i, f"line{i % 5}\nline{(i + 1) % 5}") for i in range(40)],
            "doc_id long, text string",
        ).repartition(6)
        a = sorted(r.asDict().items() for r in dedup_lines_corpus(docs).collect())
        b = sorted(r.asDict().items() for r in dedup_lines_corpus(docs).collect())
        assert a == b
        # exactly 5 distinct lines survive corpus-wide
        total_kept = sum(
            r["n_lines_kept"] for r in dedup_lines_corpus(docs).collect()
        )
        assert total_kept == 5


class TestDecontaminatedSplit:
    def test_leaky_train_docs_dropped(self, spark):
        from ics_search_engine_spark.operators.dedup import (
            decontaminated_split,
        )

        # find an id that hashes into a 20% test bucket, then plant a
        # near-copy under an id that doesn't
        rows = [
            (i, f"w{i}a w{i}b w{i}c w{i}d unique only words {i}")
            for i in range(50)
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        base = decontaminated_split(docs, test_frac=0.2)
        split = {r["doc_id"]: r["split"] for r in base.collect()}
        test_ids = [d for d, s in split.items() if s == "test"]
        train_ids = [d for d, s in split.items() if s == "train"]
        assert test_ids and train_ids
        # plant: a train-side id carrying a test doc's exact text
        leak_src = test_ids[0]
        leak_text = rows[leak_src][1]
        planted = spark.createDataFrame(
            rows + [(1000 + train_ids[0], leak_text)],
            "doc_id long, text string",
        )
        out = decontaminated_split(planted, test_frac=0.2)
        got = {r["doc_id"]: r["split"] for r in out.collect()}
        planted_id = 1000 + train_ids[0]
        if planted_id in got:
            # it may itself hash to test; then it's kept as test
            assert got[planted_id] == "test"
        else:
            assert planted_id not in got  # dropped as contaminated
        # untouched originals keep their split
        for d in train_ids[:5]:
            assert got[d] == "train"

    def test_split_is_hash_stable(self, spark):
        from ics_search_engine_spark.operators.dedup import (
            decontaminated_split,
        )

        docs = spark.createDataFrame(
            [(i, f"x{i} y{i} z{i} q{i}") for i in range(60)],
            "doc_id long, text string",
        )
        a = {(r["doc_id"], r["split"]) for r in
             decontaminated_split(docs, 0.1).collect()}
        b = {(r["doc_id"], r["split"]) for r in
             decontaminated_split(docs, 0.1).collect()}
        assert a == b
        assert {s for _, s in a} == {"train", "test"}

    def test_bad_frac(self, spark):
        from ics_search_engine_spark.operators.dedup import (
            decontaminated_split,
        )

        docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
        import pytest as _pt

        with _pt.raises(ValueError):
            decontaminated_split(docs, 0.0)


class TestExactSubstringDedup:
    def run(self, spark, texts, l=4):
        from ics_search_engine_spark.operators.dedup import (
            exact_substring_dedup,
        )

        df = spark.createDataFrame(
            list(enumerate(texts)), "doc_id long, text string"
        )
        return {
            r.doc_id: r for r in exact_substring_dedup(df, l=l).collect()
        }

    def test_duplicated_span_removed_keep_first(self, spark):
        shared = "alpha bravo charlie delta"
        out = self.run(
            spark,
            [
                f"unique00 unique01 {shared} unique02",
                f"other00 {shared} other01 other02",
            ],
            l=4,
        )
        # doc 0 holds the first occurrence -> untouched
        assert out[0].n_removed == 0
        assert shared in out[0].text_dedup
        # doc 1's copy of the 4-gram is cut, the rest survives
        assert out[1].n_removed == 4
        assert out[1].text_dedup == "other00 other01 other02"

    def test_overlapping_dup_grams_merge_coverage(self, spark):
        shared = "alpha bravo charlie delta echo"  # two overlapping 4-grams
        out = self.run(
            spark, [f"{shared} zz00", f"yy00 {shared} yy01"], l=4
        )
        assert out[1].n_removed == 5  # union of [1,5) and [2,6) = 5 toks
        assert out[1].text_dedup == "yy00 yy01"

    def test_within_doc_repetition(self, spark):
        out = self.run(
            spark, ["alpha bravo charlie delta xx00 alpha bravo charlie delta"],
            l=4,
        )
        assert out[0].n_removed == 4  # second in-doc occurrence cut
        assert out[0].text_dedup == "alpha bravo charlie delta xx00"

    def test_short_docs_untouched_and_validation(self, spark):
        import pytest as _pytest

        out = self.run(spark, ["alpha bravo", ""], l=4)
        assert out[0].n_removed == 0 and out[1].n_tokens == 0
        from ics_search_engine_spark.operators.dedup import (
            exact_substring_dedup,
        )

        df = spark.createDataFrame([(0, "x")], "doc_id long, text string")
        with _pytest.raises(ValueError):
            exact_substring_dedup(df, l=1)
