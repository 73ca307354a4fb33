"""LSM serving for the round-3 query surfaces: N segments ≡ one
compacted index, bit-exact."""

import pyspark.sql.functions as F
import pytest

from ics_search_engine_spark.operators.packed_index import build_packed_index
from ics_search_engine_spark.serving import (
    LocalIndexServer,
    LocalSegmentedServer,
)


@pytest.fixture(scope="module")
def setup(spark, small_df, corpus_dir):
    full_dir = f"{corpus_dir}/segops_full"
    seg_dirs = [f"{corpus_dir}/segops_{c}" for c in "abc"]
    build_packed_index(spark, small_df, full_dir, range_bits=9,
                       with_positions=True)
    for i, d in enumerate(seg_dirs):
        part = small_df.filter(F.pmod(F.hash("conv_id"), F.lit(3)) == i)
        build_packed_index(spark, part, d, range_bits=9,
                           with_positions=True)
    return LocalIndexServer(full_dir), LocalSegmentedServer(seg_dirs)


class TestSegmentedPositional:
    @pytest.mark.parametrize("phrase", [
        "machine learning",
        "masters of science",
        "absent phrase entirely",
    ])
    def test_phrase_equals_compacted(self, setup, phrase):
        full, seg = setup
        assert seg.search_phrase(phrase, k=10) == full.search_phrase(
            phrase, k=10
        ), phrase

    @pytest.mark.parametrize("query,window", [
        ("machine learning", 1),
        ("machine learning", 5),
        ("spark query engine", 6),
    ])
    def test_near_equals_compacted(self, setup, query, window):
        full, seg = setup
        assert seg.search_near(query, window, k=10) == full.search_near(
            query, window, k=10
        ), (query, window)


class TestSegmentedWildcardQlang:
    @pytest.mark.parametrize("q,cap", [
        ("mach* learning", 1024),
        ("s*", 1024),
        ("s*", 3),          # cap selection must use the UNION df
        ("zzz*", 1024),
    ])
    def test_wildcard_equals_compacted(self, setup, q, cap):
        full, seg = setup
        assert seg.search_wildcard(q, k=10, max_expansions=cap) == (
            full.search_wildcard(q, k=10, max_expansions=cap)
        ), (q, cap)

    @pytest.mark.parametrize("q", [
        "machine learning",
        "+machine learning",
        "machine -learning",
        '"machine learning" spark',
        "+spark mach* -query",
        "+zzzqqq machine",
    ])
    def test_qlang_equals_compacted(self, setup, q):
        full, seg = setup
        assert seg.search_qlang(q, k=10) == full.search_qlang(q, k=10), q


class TestSegmentedFuzzy:
    @pytest.mark.parametrize("q", [
        "machne learnng",
        "machine learning",
        "zzzzzzzzzz",
    ])
    def test_fuzzy_equals_compacted(self, setup, q):
        full, seg = setup
        assert seg.search_fuzzy(q, k=10) == full.search_fuzzy(q, k=10), q

    def test_fuzzy_wand_identical(self, setup):
        """use_wand must not change segmented fuzzy results (per-
        segment block-max pruning through the weight override)."""
        full, seg = setup
        for q in ("machne learnng", "machine learning"):
            assert seg.search_fuzzy(q, k=10, use_wand=True) == \
                seg.search_fuzzy(q, k=10), q
            assert seg.search_fuzzy(q, k=10, use_wand=True) == \
                full.search_fuzzy(q, k=10, use_wand=True), q


class TestSegmentedNearOrdered:
    @pytest.mark.parametrize("query,window", [
        ("machine learning", 1),
        ("machine learning", 5),
        ("learning machine", 3),       # order-sensitive
        ("spark query engine", 6),     # 3-term chain
    ])
    def test_near_ordered_equals_compacted(self, setup, query, window):
        full, seg = setup
        assert seg.search_near_ordered(query, window, k=10) == (
            full.search_near_ordered(query, window, k=10)
        ), (query, window)


class TestSegmentedSynonyms:
    SYNS = {"machin": ["learn"], "queri": ["engin"]}

    @pytest.mark.parametrize("q", [
        "machine society",
        "machine",
        "query speed",
        "zzzabsent",
    ])
    def test_synonyms_equal_compacted(self, setup, q):
        """The discriminating statistic is df_g: the compacted index
        counts union docs directly; the LSM must reconstruct the SAME
        number from per-segment counts before weighting."""
        full, seg = setup
        assert seg.search_synonyms(q, self.SYNS, k=10) == (
            full.search_synonyms(q, self.SYNS, k=10)
        ), q

    def test_no_expansion_matches_plain_search(self, setup):
        full, seg = setup
        got = seg.search_synonyms("machine learning", {}, k=10)
        assert got == full.search("machine learning", k=10)
        assert got == seg.search("machine learning", k=10)
