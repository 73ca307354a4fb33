"""Packed-index build + index-backed query parity (SURVEY.md §7 step 5:
"parity test: index path ≡ slice path ≡ oracle")."""

import numpy as np
import pytest

from oracle import bm25 as oracle
from ics_search_engine_spark.functions.codec import unpack_postings
from ics_search_engine_spark.operators import index_build as ib
from ics_search_engine_spark.operators.docmap import assign_doc_ordinals
from ics_search_engine_spark.operators.packed_index import (
    PackedIndex,
    build_packed_index,
)
from ics_search_engine_spark.operators.query import bm25_topk_packed
from ics_search_engine_spark.sources.transcripts import REFERENCE_QUERIES

K = 10


@pytest.fixture(scope="module")
def index_dir(spark, small_df, corpus_dir):
    out = f"{corpus_dir}/packed_index"
    # small range_bits so multiple shards exist even at test scale
    build_packed_index(spark, small_df, out, range_bits=9)
    return out


@pytest.fixture(scope="module")
def pidx(spark, index_dir):
    return PackedIndex(spark, index_dir)


@pytest.fixture(scope="module")
def oracle_idx(small_rows):
    return oracle.build_index(small_rows)


class TestDocMap:
    def test_ordinals_dense_and_ordered(self, spark, small_df):
        toks = ib.tokenized(small_df).select("conv_id", "turn_idx", "dl")
        dm = assign_doc_ordinals(toks, num_partitions=7)
        rows = dm.orderBy("doc_ord").collect()
        n = len(rows)
        assert [r["doc_ord"] for r in rows] == list(range(n))
        keys = [(r["conv_id"], r["turn_idx"]) for r in rows]
        assert keys == sorted(keys)

    def test_deterministic_across_partitionings(self, spark, small_df):
        toks = ib.tokenized(small_df).select("conv_id", "turn_idx", "dl")
        a = {
            (r["conv_id"], r["turn_idx"]): r["doc_ord"]
            for r in assign_doc_ordinals(toks, num_partitions=3).collect()
        }
        b = {
            (r["conv_id"], r["turn_idx"]): r["doc_ord"]
            for r in assign_doc_ordinals(toks, num_partitions=13).collect()
        }
        assert a == b


class TestIndexStructure:
    def test_stats(self, pidx, oracle_idx):
        assert pidx.n_docs == oracle_idx.n_docs
        assert pidx.avgdl == oracle_idx.avgdl

    def test_df_matches_oracle(self, pidx, oracle_idx):
        got = {r["term"]: r["df"] for r in pidx.term_stats.collect()}
        want = {t: len(p) for t, p in oracle_idx.postings.items()}
        assert got == want

    def test_shards_bounded_and_sorted(self, pidx):
        range_size = 1 << pidx.stats["range_bits"]
        rows = pidx.index.collect()
        assert len(rows) > 0
        multi_shard_terms = set()
        seen_terms = {}
        for r in rows:
            assert r["n_postings"] <= range_size
            d, t, l, pos = unpack_postings(bytes(r["payload"]), with_positions=True)
            assert len(d) == r["n_postings"]
            # postings sorted by doc ordinal, within the shard's doc range
            assert np.all(np.diff(d.astype(np.int64)) > 0)
            assert np.all((d >> pidx.stats["range_bits"]) == r["shard_id"])
            # positions strictly increasing per posting
            for p in pos:
                if len(p) > 1:
                    assert np.all(np.diff(p.astype(np.int64)) > 0)
            seen_terms.setdefault(r["term"], 0)
            seen_terms[r["term"]] += 1
            if seen_terms[r["term"]] > 1:
                multi_shard_terms.add(r["term"])
        # head terms actually split across shards at this range_bits
        assert multi_shard_terms, "expected head terms split into multiple shards"

    def test_postings_content_matches_oracle(self, pidx, oracle_idx):
        docmap = {
            r["doc_ord"]: (r["conv_id"], r["turn_idx"])
            for r in pidx.docmap.collect()
        }
        # spot-check a head term, a mid term and a planted rare term
        import pyspark.sql.functions as F
        for term in ["the", "spark", "xyzzyqux"]:
            rows = pidx.index.filter(F.col("term") == term).collect()
            got = {}
            for r in sorted(rows, key=lambda r: r["shard_id"]):
                d, t, l, pos = unpack_postings(bytes(r["payload"]), with_positions=True)
                for i in range(len(d)):
                    got[docmap[int(d[i])]] = (int(t[i]), [int(x) for x in pos[i]])
            want = {
                docid: (tf, oracle_idx.positions[term][docid])
                for docid, tf in oracle_idx.postings.get(term, {}).items()
            }
            assert got == want, term


class TestBatchBoundaryInvariance:
    def test_max_tfn_independent_of_arrow_batching(
        self, spark, small_df, corpus_dir, pidx
    ):
        """Regression: the block-max metadata of the last group in each
        Arrow batch must not absorb the carried next group's values —
        packing with tiny batches must produce IDENTICAL index rows
        (payload bytes AND max_tfn) to the default batching."""
        key = "spark.sql.execution.arrow.maxRecordsPerBatch"
        old = spark.conf.get(key)
        out = f"{corpus_dir}/packed_index_tinybatch"
        try:
            spark.conf.set(key, "64")
            build_packed_index(spark, small_df, out, range_bits=9)
        finally:
            spark.conf.set(key, old)

        def content(df):
            return sorted(
                (r["term"], r["shard_id"], r["n_postings"], r["max_tfn"],
                 bytes(r["payload"]).hex())
                for r in df.collect()
            )

        tiny = content(PackedIndex(spark, out).index)
        assert tiny == content(pidx.index)


class TestPackedQueryParity:
    @pytest.mark.parametrize("qid", sorted(REFERENCE_QUERIES))
    def test_packed_topk_identical_to_oracle(self, qid, spark, pidx, oracle_idx):
        query = REFERENCE_QUERIES[qid]
        expected = oracle.search(oracle_idx, query, k=K)
        got = [
            (r["conv_id"], r["turn_idx"], r["score"])
            for r in bm25_topk_packed(spark, pidx, query, k=K).collect()
        ]
        assert [g[:2] for g in got] == [e[:2] for e in expected], qid
        for (_, _, es), (_, _, gs) in zip(expected, got):
            assert es == gs, (qid, es.hex(), gs.hex())


class TestMultiQuery:
    def test_multi_equals_per_query(self, spark, pidx, oracle_idx):
        from ics_search_engine_spark.operators.query import bm25_topk_multi

        rows = bm25_topk_multi(spark, pidx, REFERENCE_QUERIES, k=K).collect()
        by_q: dict = {}
        for r in rows:
            by_q.setdefault(r["query_id"], []).append(
                (r["rank"], r["conv_id"], r["turn_idx"], r["score"])
            )
        for qid, qtext in REFERENCE_QUERIES.items():
            expected = oracle.search(oracle_idx, qtext, k=K)
            got = sorted(by_q.get(qid, []))
            assert [(c, t, s) for _, c, t, s in got] == expected, qid

    def test_multi_merge_is_distributed(self, spark, pidx):
        """The batched path must NOT merge winners on the driver: the
        returned DataFrame is the live distributed plan (shard scoring
        via FlatMapGroupsInPandas + per-query window merge + docmap
        join), and it carries at most |queries| x k rows."""
        from ics_search_engine_spark.operators.query import bm25_topk_multi

        df = bm25_topk_multi(spark, pidx, REFERENCE_QUERIES, k=K)
        import contextlib, io
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain(mode="formatted")
        plan = buf.getvalue()
        # a driver-side merge would re-create the result as a local
        # relation — neither operator below would appear
        assert "FlatMapGroupsInPandas" in plan
        assert "Window" in plan
        assert "LocalTableScan" not in plan
        assert df.count() <= len(REFERENCE_QUERIES) * K

    def test_cache_does_not_change_results(self, spark, index_dir, oracle_idx):
        pidx2 = PackedIndex(spark, index_dir).cache()
        from ics_search_engine_spark.operators.query import bm25_topk_packed

        got = [
            (r["conv_id"], r["turn_idx"], r["score"])
            for r in bm25_topk_packed(spark, pidx2, "machine learning", k=K).collect()
        ]
        assert got == oracle.search(oracle_idx, "machine learning", k=K)


class TestConjunctive:
    def test_conjunctive_equals_filtered_or_ranking(
        self, spark, pidx, oracle_idx
    ):
        """AND semantics = the OR ranking restricted to docs matching
        every term, scores bit-identical (same fold over the same
        contributions)."""
        from ics_search_engine_spark.operators.query import (
            bm25_topk_conjunctive,
        )

        from ics_search_engine_spark.textproc.tokenizer import tokenize

        query = "machine learning"
        terms = sorted(set(tokenize(query, for_query=True)))
        all_docs = None
        for t in terms:
            docs = set(oracle_idx.postings.get(t, {}))
            all_docs = docs if all_docs is None else (all_docs & docs)
        expected = [
            r for r in oracle.search(oracle_idx, query, k=10_000)
            if r[:2] in all_docs
        ][:10]
        got = [
            tuple(r)
            for r in bm25_topk_conjunctive(spark, pidx, query, k=10).collect()
        ]
        assert got == expected
        assert len(got) > 0  # fixture corpus has docs with both terms

    def test_conjunctive_absent_term_empties(self, spark, pidx):
        from ics_search_engine_spark.operators.query import (
            bm25_topk_conjunctive,
        )

        assert (
            bm25_topk_conjunctive(
                spark, pidx, "machine zzznotaterm", k=10
            ).count()
            == 0
        )

    def test_multi_pushdown_resolution_equals_join(self, spark, pidx):
        """resolve='pushdown' (bounded collect + doc_ord IN point
        lookup) returns exactly what the broadcast-join mode
        returns."""
        from ics_search_engine_spark.operators.query import bm25_topk_multi

        join_rows = sorted(
            tuple(r)
            for r in bm25_topk_multi(
                spark, pidx, REFERENCE_QUERIES, k=K
            ).collect()
        )
        push_rows = sorted(
            tuple(r)
            for r in bm25_topk_multi(
                spark, pidx, REFERENCE_QUERIES, k=K, resolve="pushdown"
            ).collect()
        )
        assert push_rows == join_rows


class TestFusedPositionalPack:
    """The fused positional pack (_pack_sorted_rows: tf + position
    runs derived in numpy over sorted exploded rows, no collect_list)
    must produce payloads BYTE-IDENTICAL to the collect_list +
    _pack_sorted path it replaced."""

    def test_payloads_byte_identical_to_collect_list_path(
        self, spark, small_df, pidx, index_dir
    ):
        import pyspark.sql.functions as F

        from ics_search_engine_spark.operators.index_build import DOC_KEY
        from ics_search_engine_spark.operators.packed_index import (
            _pack_sorted,
        )
        from ics_search_engine_spark.sources import catalog

        # legacy path: groupBy + sort_array(collect_list(pos)) over
        # the same tokenized rows and docmap the fused build used
        toks = ib.tokenized(small_df)
        docmap = catalog.read_table(spark, f"{index_dir}/docmap")
        exploded = (
            toks.join(
                F.broadcast(docmap.select(*DOC_KEY, "doc_ord")), DOC_KEY
            )
            .select("doc_ord", "dl",
                    F.posexplode("tokens").alias("pos", "term"))
            .withColumn("shard_id", F.shiftright("doc_ord", 9))
        )
        posts_sorted = (
            exploded.repartition(8, "term", "shard_id")
            .groupBy("term", "shard_id", "doc_ord")
            .agg(
                F.count("*").cast("int").alias("tf"),
                F.first("dl").alias("dl"),
                F.sort_array(F.collect_list("pos")).alias("positions"),
            )
            .select("term", "shard_id", "doc_ord", "tf", "dl",
                    "positions")
            .sortWithinPartitions("term", "shard_id", "doc_ord")
        )
        legacy = {
            (r["term"], r["shard_id"]): (
                r["n_postings"], r["max_tfn"], bytes(r["payload"])
            )
            for r in _pack_sorted(
                posts_sorted, pidx.avgdl, True
            ).collect()
        }
        fused = {
            (r["term"], r["shard_id"]): (
                r["n_postings"], r["max_tfn"], bytes(r["payload"])
            )
            for r in pidx.index.select(
                "term", "shard_id", "n_postings", "max_tfn", "payload"
            ).collect()
        }
        assert set(fused) == set(legacy)
        diff = [k for k in fused if fused[k] != legacy[k]]
        assert not diff, f"{len(diff)} groups differ, e.g. {diff[:3]}"

    def test_no_collect_list_in_positional_build_plan(self, spark, small_df):
        """The fused build's pack input plan must not contain an
        ObjectHashAggregate (the profiled 690k bottleneck)."""
        import pyspark.sql.functions as F

        from ics_search_engine_spark.operators.docmap import (
            assign_doc_ordinals,
        )
        from ics_search_engine_spark.operators.index_build import DOC_KEY

        toks = ib.tokenized(small_df)
        docmap = assign_doc_ordinals(toks.select(*DOC_KEY, "dl"))
        exploded = (
            toks.join(
                F.broadcast(docmap.select(*DOC_KEY, "doc_ord")), DOC_KEY
            )
            .select("doc_ord", "dl",
                    F.posexplode("tokens").alias("pos", "term"))
            .withColumn("shard_id", F.shiftright("doc_ord", 9))
        )
        rows_sorted = exploded.repartition(
            8, "term", "shard_id"
        ).sortWithinPartitions("term", "shard_id", "doc_ord", "pos")
        plan = (
            rows_sorted._jdf.queryExecution().executedPlan().toString()
        )
        assert "ObjectHashAggregate" not in plan
        assert "collect_list" not in plan
