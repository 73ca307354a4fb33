"""Block-max WAND invariant: pruned path ≡ exhaustive packed path ≡
oracle (SURVEY.md §5 item 5 — "the strongest internal check")."""

import pytest

from oracle import bm25 as oracle
from ics_search_engine_spark.operators.packed_index import (
    PackedIndex,
    build_packed_index,
)
from ics_search_engine_spark.operators.query import bm25_topk_packed
from ics_search_engine_spark.operators.wand import bm25_topk_wand
from ics_search_engine_spark.sources.transcripts import REFERENCE_QUERIES


@pytest.fixture(scope="module")
def pidx(spark, small_df, corpus_dir):
    out = f"{corpus_dir}/wand_index"
    build_packed_index(spark, small_df, out, range_bits=8)  # many ranges
    return PackedIndex(spark, out)


@pytest.fixture(scope="module")
def oracle_idx(small_rows):
    return oracle.build_index(small_rows)


@pytest.mark.parametrize("qid", sorted(REFERENCE_QUERIES))
def test_wand_equals_exhaustive_and_oracle(qid, spark, pidx, oracle_idx):
    query = REFERENCE_QUERIES[qid]
    wand = [
        tuple(r) for r in bm25_topk_wand(spark, pidx, query, k=10).collect()
    ]
    exhaustive = [
        tuple(r) for r in bm25_topk_packed(spark, pidx, query, k=10).collect()
    ]
    assert wand == exhaustive, qid
    assert wand == [tuple(x) for x in oracle.search(oracle_idx, query, k=10)], qid


def test_wand_actually_prunes(spark, pidx):
    # a rare planted term: its ub is high only in the ranges containing
    # it, so most ranges of a mixed query should be pruned
    stats: dict = {}
    bm25_topk_wand(spark, pidx, "xyzzyqux", k=3, phase1_ranges=2,
                   collect_stats=stats).collect()
    assert stats["n_ranges"] >= 1
    # with k=3 and a term present in ~2 ranges, pruning must kick in
    # whenever there are more ranges than phase1 scored
    if stats["n_ranges"] > 2:
        assert stats["pruned"] > 0, stats


def test_wand_small_k_prunes_common_query(spark, pidx):
    stats: dict = {}
    wand = [
        tuple(r)
        for r in bm25_topk_wand(
            spark, pidx, "machine learning", k=3, phase1_ranges=3,
            collect_stats=stats,
        ).collect()
    ]
    exhaustive = [
        tuple(r)
        for r in bm25_topk_packed(spark, pidx, "machine learning", k=3).collect()
    ]
    assert wand == exhaustive
    assert stats["scored"] + stats["pruned"] == stats["n_ranges"]


def test_wand_round_job_is_take_ordered(spark, pidx):
    """Every pruning round ships at most k rows to the driver: the
    round job's physical plan must be TakeOrderedAndProject (global
    limit k over the per-shard top-ks), not an unbounded collect of
    |batch|×k rows."""
    stats: dict = {}
    bm25_topk_wand(
        spark, pidx, "machine learning", k=3, phase1_ranges=2,
        collect_stats=stats,
    ).collect()
    assert "round_plan" in stats, stats.keys()
    assert "TakeOrderedAndProject" in stats["round_plan"], stats["round_plan"]


def test_wand_seed_theta_prunes_before_scoring(spark, pidx):
    """The metadata-only θ seed (k-th largest per-range single-term
    lower bound) prunes common-term-only ranges up front on a
    rare+common query, and the result stays identical to exhaustive."""
    stats: dict = {}
    wand = [
        tuple(r)
        for r in bm25_topk_wand(
            spark, pidx, "xyzzyqux machine", k=2, phase1_ranges=2,
            collect_stats=stats,
        ).collect()
    ]
    exhaustive = [
        tuple(r)
        for r in bm25_topk_packed(
            spark, pidx, "xyzzyqux machine", k=2
        ).collect()
    ]
    assert wand == exhaustive
    assert "seed_pruned" in stats
    # seed pruning is part of the total pruned accounting
    assert stats["scored"] + stats["pruned"] == stats["n_ranges"]
    if stats["n_ranges"] > 2:
        # the rare term's high-lb ranges set θ₀ above the common-only
        # tail's ub — some ranges must fall before any scoring
        assert stats["seed_pruned"] > 0, stats


def test_wand_cached_serving_equals_uncached(spark, pidx, oracle_idx):
    """Serving mode (driver-resident block-max metadata + executor
    cache) must return exactly what the cold path returns."""
    cached = PackedIndex(spark, pidx.path).cache()
    assert cached._shard_meta is not None  # small vocab -> driver meta
    for query in ["machine learning", "research", "xyzzyqux",
                  "the spark", "zzznotinthecorpus"]:
        hot = [tuple(r) for r in
               bm25_topk_wand(spark, cached, query, k=10).collect()]
        cold = [tuple(r) for r in
                bm25_topk_wand(spark, pidx, query, k=10).collect()]
        assert hot == cold, query


def test_sharded_scorer_equals_global_fold(spark, pidx, oracle_idx):
    """score_shards_topk (per-shard dense accumulation, no per-posting
    shuffle) is bit-identical to the global sorted-fold path."""
    import pyspark.sql.functions as F

    from ics_search_engine_spark.operators.packed_index import (
        decode_matched,
        score_shards_topk,
    )
    from ics_search_engine_spark.operators.query import (
        query_weights,
        score_topk,
    )
    from ics_search_engine_spark.textproc.tokenizer import tokenize

    for query in ["machine learning", "research", "master of computer science"]:
        q_terms = sorted(set(tokenize(query, for_query=True)))
        weights = query_weights(query, pidx.df_for_terms(q_terms), pidx.n_docs)
        matched = pidx.index.filter(F.col("term").isin(q_terms))
        sharded = score_shards_topk(
            matched, weights, pidx.avgdl, 10, pidx.stats["range_bits"]
        ).collect()
        sharded = sorted(
            ((r["doc_ord"], r["score"]) for r in sharded),
            key=lambda t: (-t[1], t[0]),
        )[:10]
        global_fold = [
            (r["doc_ord"], r["score"])
            for r in score_topk(
                spark, decode_matched(matched), weights, pidx.avgdl,
                ["doc_ord"], 10,
            ).collect()
        ]
        assert sharded == global_fold, query


def test_merge_accumulator_equals_dense(spark, pidx):
    """The sorted-merge accumulator (range_bits beyond the dense-array
    ceiling) is bit-identical to the dense path — same additions per
    doc in the same ascending-term order — in both disjunctive and
    conjunctive (require_all) modes."""
    import pyspark.sql.functions as F

    from ics_search_engine_spark.operators.packed_index import (
        score_shards_topk,
    )
    from ics_search_engine_spark.operators.query import query_weights
    from ics_search_engine_spark.textproc.tokenizer import tokenize

    for query, req in [
        ("machine learning", None),
        ("master of computer science", None),
        ("machine learning", 2),
        ("research", None),
    ]:
        q_terms = sorted(set(tokenize(query, for_query=True)))
        weights = query_weights(
            query, pidx.df_for_terms(q_terms), pidx.n_docs
        )
        matched = pidx.index.filter(F.col("term").isin(q_terms))
        rb = pidx.stats["range_bits"]
        ra = req if req is None else min(req, len(weights))
        dense = sorted(
            (tuple(r) for r in score_shards_topk(
                matched, weights, pidx.avgdl, 10, rb,
                require_all=ra, accumulator="dense",
            ).collect()),
            key=lambda t: (-t[1], t[0]),
        )
        merge = sorted(
            (tuple(r) for r in score_shards_topk(
                matched, weights, pidx.avgdl, 10, rb,
                require_all=ra, accumulator="merge",
            ).collect()),
            key=lambda t: (-t[1], t[0]),
        )
        assert dense == merge, (query, req)


def test_accumulator_auto_switch_threshold():
    """accumulator=None resolves dense at <= DENSE_RANGE_BITS_MAX and
    merge beyond; bogus names are rejected."""
    import pytest as _pytest

    from ics_search_engine_spark.operators.packed_index import (
        DENSE_RANGE_BITS_MAX,
    )

    assert DENSE_RANGE_BITS_MAX == 22
    # the switch itself is exercised end-to-end in
    # test_merge_accumulator_equals_dense via accumulator= overrides;
    # here pin the validation contract
    from ics_search_engine_spark.operators.packed_index import (
        score_shards_topk,
    )

    with _pytest.raises(ValueError):
        score_shards_topk(None, {}, 1.0, 5, 8, accumulator="bogus")


def test_local_serving_equals_oracle_and_spark(spark, pidx, oracle_idx):
    """In-process serving tier (no Spark at query time) is bit-identical
    to the oracle and the distributed WAND path on every reference
    query."""
    from ics_search_engine_spark.serving import LocalIndexServer

    srv = LocalIndexServer(pidx.path)
    for qid, query in sorted(REFERENCE_QUERIES.items()):
        local = srv.search(query, k=10)
        via_oracle = oracle.search(oracle_idx, query, k=10)
        assert local == via_oracle, qid
        via_wand = [
            tuple(r) for r in bm25_topk_wand(spark, pidx, query, k=10).collect()
        ]
        assert local == via_wand, qid


def test_serving_wand_identical_and_prunes(spark, pidx, oracle_idx):
    """Serving-tier block-max WAND: bit-identical results to the
    exhaustive serve path on every reference query, and on a rare+head
    query it must actually SKIP shards (the rare term pins θ high;
    head-term-only doc ranges fall below it)."""
    from ics_search_engine_spark.serving import LocalIndexServer

    srv = LocalIndexServer(pidx.path)
    any_pruned = 0
    for qid, query in sorted(REFERENCE_QUERIES.items()):
        stats: dict = {}
        wand = srv.search(query, k=3, use_wand=True, stats=stats)
        exhaustive = srv.search(query, k=3)
        assert wand == exhaustive, qid
        if stats:  # empty for absent/all-stop-word queries (no weights)
            assert stats["scored"] + stats["pruned"] == stats["n_ranges"], qid
        any_pruned += stats.get("pruned", 0)
        # k=10 as well (boundary behavior)
        assert srv.search(query, k=10, use_wand=True) == srv.search(query, k=10), qid
    # q5_rare pairs a planted rare term with common ones — the small-k
    # pass must have pruned something across the query set
    assert any_pruned > 0


class TestServingWandProperty:
    """Randomized-property WAND ≡ exhaustive over 60 synthesized
    corpora (server state built directly, no Spark) — varying doc
    counts, range_bits, df skew, and a deliberately biased avgdl to
    exercise the external-avgdl path the segmented server uses."""

    @staticmethod
    def _fake_server(rng, n_docs, n_terms, range_bits, avgdl_bias):
        import numpy as np

        from ics_search_engine_spark.functions.codec import pack_postings
        from ics_search_engine_spark.operators.packed_index import _tfn
        from ics_search_engine_spark.serving import LocalIndexServer

        dls = rng.integers(1, 40, size=n_docs).astype(np.uint64)
        srv = LocalIndexServer.__new__(LocalIndexServer)
        sum_dl = int(dls.sum())
        srv.stats = {
            "n_docs": n_docs,
            "avgdl": (sum_dl / n_docs) * avgdl_bias,
            "sum_dl": sum_dl,
            "range_bits": range_bits,
            "with_positions": False,
            "stem": True,
        }
        srv.postings = {}
        srv.df = {}
        terms = [f"t{i:02d}" for i in range(n_terms)]
        for t in terms:
            df = int(rng.integers(1, n_docs + 1))
            docs = np.sort(
                rng.choice(n_docs, size=df, replace=False)
            ).astype(np.uint64)
            tfs = rng.integers(1, 9, size=df).astype(np.uint64)
            dl_t = dls[docs.astype(np.int64)]
            srv.df[t] = df
            shard_ids = (docs >> np.uint64(range_bits)).astype(np.int64)
            rows = []
            for s in np.unique(shard_ids):
                m = shard_ids == s
                payload = pack_postings(docs[m], tfs[m], dl_t[m])
                mx = float(
                    _tfn(tfs[m], dl_t[m], srv.stats["avgdl"]).max()
                )
                rows.append((int(s), mx, payload))
            srv.postings[t] = rows
        srv._conv = np.array([f"c{i:05d}" for i in range(n_docs)], dtype=object)
        srv._turn = np.arange(n_docs)
        return srv, terms

    def test_wand_equals_exhaustive_random(self):
        import numpy as np

        for trial in range(60):
            rng = np.random.default_rng(1000 + trial)
            n_docs = int(rng.integers(5, 400))
            range_bits = int(rng.integers(2, 7))
            n_terms = int(rng.integers(1, 8))
            # avgdl_bias != 1 exercises external/global avgdl too
            bias = float(rng.choice([1.0, 0.7, 1.4]))
            srv, terms = self._fake_server(
                rng, n_docs, n_terms, range_bits, bias
            )
            q_n = int(rng.integers(1, min(4, n_terms) + 1))
            q_terms = list(rng.choice(terms, size=q_n, replace=False))
            from ics_search_engine_spark.operators.query import query_weights

            weights = query_weights(
                " ".join(q_terms),
                {t: srv.df[t] for t in q_terms},
                n_docs,
            )
            # every third trial scores with an EXTERNAL avgdl far above
            # the index's own (the segmented-server situation) so the
            # ub_scale mismatch correction is exercised, not just the
            # matched-avgdl path
            ext_avgdl = (
                srv.stats["avgdl"] * float(rng.uniform(2.0, 20.0))
                if trial % 3 == 0
                else None
            )
            for k in (1, 3, 10):
                ex = srv.score_with(dict(weights), k, avgdl=ext_avgdl)
                st: dict = {}
                wd = srv.score_with(
                    dict(weights), k, use_wand=True, stats=st,
                    avgdl=ext_avgdl,
                )
                assert wd == ex, (trial, k)


def test_wand_conjunctive_equals_exhaustive_conjunctive(spark, pidx, oracle_idx):
    """The shard-local conjunctive WAND path (no per-posting shuffle,
    metadata-level range pruning for incomplete ranges) returns exactly
    what the exhaustive intersection path returns."""
    from ics_search_engine_spark.operators.query import bm25_topk_conjunctive

    for query in ["machine learning", "research", "master of computer science",
                  "machine zzznotaterm"]:
        wand = [
            tuple(r)
            for r in bm25_topk_wand(
                spark, pidx, query, k=10, conjunctive=True
            ).collect()
        ]
        exhaustive = [
            tuple(r)
            for r in bm25_topk_conjunctive(spark, pidx, query, k=10).collect()
        ]
        assert wand == exhaustive, query
    # conjunctive results are the OR ranking filtered to all-term docs
    st: dict = {}
    wand_ml = bm25_topk_wand(
        spark, pidx, "machine learning", k=10, conjunctive=True,
        collect_stats=st,
    ).collect()
    assert len(wand_ml) > 0


def test_serving_conjunctive_equals_distributed(spark, pidx, oracle_idx):
    from ics_search_engine_spark.operators.query import bm25_topk_conjunctive
    from ics_search_engine_spark.serving import LocalIndexServer

    srv = LocalIndexServer(pidx.path)
    for query in ["machine learning", "master of computer science",
                  "machine zzznotaterm"]:
        local = srv.search(query, k=10, conjunctive=True)
        dist = [
            tuple(r)
            for r in bm25_topk_conjunctive(spark, pidx, query, k=10).collect()
        ]
        assert local == dist, query


def test_serving_conjunctive_wand_prunes_and_matches(spark, pidx):
    """conjunctive + use_wand at the serving tier: results identical to
    the exhaustive conjunctive path, stats populated, and ranges
    missing a required term pruned at the metadata level."""
    from ics_search_engine_spark.serving import LocalIndexServer

    srv = LocalIndexServer(pidx.path)
    for query in ["machine learning", "xyzzyqux machine",
                  "machine zzznotaterm"]:
        st: dict = {}
        wand = srv.search(query, k=5, use_wand=True, conjunctive=True,
                          stats=st)
        plain = srv.search(query, k=5, conjunctive=True)
        assert wand == plain, query
        if plain:  # absent-term query returns [] before stats
            assert st["scored"] + st["pruned"] == st["n_ranges"], query
    # the planted-rare term exists in few ranges: conjunctive metadata
    # pruning must restrict n_ranges below the common term's range count
    st_or: dict = {}
    srv.search("machine", k=5, use_wand=True, stats=st_or)
    st_and: dict = {}
    srv.search("xyzzyqux machine", k=5, use_wand=True, conjunctive=True,
               stats=st_and)
    assert st_and["n_ranges"] < st_or["n_ranges"]


class TestSparkMetaPath:
    """meta_mode='spark' (the 10^12-doc phase-selection fallback:
    range table stays distributed, θ₀ seed is an O(k)
    TakeOrderedAndProject) must be bit-identical to the driver path
    in every semantics mode, and the auto threshold rule must pick
    by estimated metadata rows."""

    @pytest.mark.parametrize("qid", sorted(REFERENCE_QUERIES))
    def test_spark_meta_equals_driver(self, qid, spark, pidx):
        query = REFERENCE_QUERIES[qid]
        a = [tuple(r) for r in bm25_topk_wand(
            spark, pidx, query, k=10, meta_mode="driver").collect()]
        b = [tuple(r) for r in bm25_topk_wand(
            spark, pidx, query, k=10, meta_mode="spark").collect()]
        assert a == b, qid

    def test_spark_meta_conjunctive_and_msm(self, spark, pidx):
        for kw in ({"conjunctive": True}, {"min_match": 2}):
            a = [tuple(r) for r in bm25_topk_wand(
                spark, pidx, "machine learning", k=10,
                meta_mode="driver", **kw).collect()]
            b = [tuple(r) for r in bm25_topk_wand(
                spark, pidx, "machine learning", k=10,
                meta_mode="spark", **kw).collect()]
            assert a == b, kw

    def test_spark_meta_filtered(self, spark, pidx, small_df):
        import pyspark.sql.functions as F

        allowed = small_df.filter(
            F.col("turn_idx") % 2 == 0
        ).select("conv_id", "turn_idx")
        a = [tuple(r) for r in bm25_topk_wand(
            spark, pidx, "machine learning", k=10,
            meta_mode="driver", allowed_docs=allowed).collect()]
        b = [tuple(r) for r in bm25_topk_wand(
            spark, pidx, "machine learning", k=10,
            meta_mode="spark", allowed_docs=allowed).collect()]
        assert a == b

    def test_spark_meta_seed_prunes_and_stats(self, spark, pidx):
        stats: dict = {}
        res = [tuple(r) for r in bm25_topk_wand(
            spark, pidx, "machine learning", k=3, phase1_ranges=3,
            meta_mode="spark", collect_stats=stats).collect()]
        want = [tuple(r) for r in bm25_topk_wand(
            spark, pidx, "machine learning", k=3, phase1_ranges=3,
            meta_mode="driver").collect()]
        assert res == want
        assert stats["n_ranges"] >= 1
        assert stats["scored"] + stats["pruned"] == stats["n_ranges"]

    def test_threshold_rule(self, pidx, monkeypatch):
        from ics_search_engine_spark.operators import wand as wand_mod

        n_ranges = ((max(pidx.n_docs, 1) - 1)
                    >> pidx.stats["range_bits"]) + 1
        # explicit modes always win
        assert wand_mod.use_spark_meta(pidx, 1, "spark") is True
        assert wand_mod.use_spark_meta(pidx, 10**9, "driver") is False
        with pytest.raises(ValueError):
            wand_mod.use_spark_meta(pidx, 1, "wat")
        # auto: compares n_terms * n_ranges against the threshold
        monkeypatch.setattr(
            wand_mod, "SPARK_META_ROWS_MAX", 2 * n_ranges)
        assert wand_mod.use_spark_meta(pidx, 2, None) is False
        assert wand_mod.use_spark_meta(pidx, 3, None) is True

    def test_auto_picks_spark_above_threshold(
        self, spark, pidx, monkeypatch
    ):
        """With the threshold forced to 0, auto must route through the
        spark path and still match the driver path."""
        from ics_search_engine_spark.operators import wand as wand_mod

        monkeypatch.setattr(wand_mod, "SPARK_META_ROWS_MAX", 0)
        auto = [tuple(r) for r in bm25_topk_wand(
            spark, pidx, "machine learning", k=5).collect()]
        drv = [tuple(r) for r in bm25_topk_wand(
            spark, pidx, "machine learning", k=5,
            meta_mode="driver").collect()]
        assert auto == drv
