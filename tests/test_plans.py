"""Physical-plan audits: the optimizations we rely on at 100 TB must
actually appear in the plan — pushdown, pruning, broadcast, partial
aggregation (SURVEY.md §4)."""

import pyspark.sql.functions as F
import pytest

from ics_search_engine_spark.operators import index_build as ib
from ics_search_engine_spark.operators.packed_index import (
    PackedIndex,
    build_packed_index,
)


@pytest.fixture(scope="module")
def pidx(spark, small_df, corpus_dir):
    out = f"{corpus_dir}/plans_idx"
    build_packed_index(spark, small_df, out, range_bits=10)
    return PackedIndex(spark, out)


def _plan(df, mode: str = "simple") -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


class TestPushdownAndPruning:
    def test_term_filter_pushes_to_parquet_scan(self, pidx):
        df = pidx.index.filter(F.col("term").isin(["spark", "machin"]))
        plan = _plan(df, "formatted")
        assert "PushedFilters" in plan
        assert "In(term" in plan, plan[:2000]

    def test_wand_metadata_never_reads_payload(self, pidx):
        meta = pidx.index.filter(F.col("term").isin(["spark"])).select(
            "term", "shard_id", "max_tfn"
        )
        plan = _plan(meta, "formatted")
        # column pruning: ReadSchema must exclude the (large) payload col
        read_schema = [
            line for line in plan.splitlines() if "ReadSchema" in line
        ]
        assert read_schema, plan[:2000]
        assert "payload" not in read_schema[0]

    def test_docmap_point_lookup_pushes_doc_ord_filter(self, pidx):
        """The segmented pushdown resolution (_pushdown_lookup) relies
        on doc_ord IN (...) reaching the parquet scan: the docmap is
        written sorted by doc_ord, so row-group min/max skip everything
        but the winners' groups."""
        df = pidx.docmap.filter(F.col("doc_ord").isin([3, 77, 512])).select(
            "doc_ord", "conv_id", "turn_idx"
        )
        plan = _plan(df, "formatted")
        assert "PushedFilters" in plan
        assert "In(doc_ord" in plan, plan[:2000]

    def test_docmap_resolve_is_broadcast(self, spark, pidx):
        from ics_search_engine_spark.operators.query import bm25_topk_packed

        df = bm25_topk_packed(spark, pidx, "machine learning", k=5)
        assert "BroadcastHashJoin" in _plan(df)


class TestAggregationShape:
    def test_postings_partial_aggregation(self, spark, small_df):
        posts = ib.postings(ib.tokenized(small_df), with_positions=False)
        plan = _plan(posts)
        # partial (map-side) + final hash aggregation around one shuffle
        assert plan.count("HashAggregate") >= 2
        assert plan.count("Exchange") >= 1

    def test_topk_is_take_ordered_not_global_sort(self, spark, small_df):
        toks = ib.tokenized(small_df)
        posts = ib.postings(toks, with_positions=False)
        n, avgdl = ib.corpus_stats(toks)
        from ics_search_engine_spark.operators.query import bm25_topk

        df = bm25_topk(spark, posts, "machine learning", n, avgdl, k=10)
        assert "TakeOrderedAndProject" in _plan(df)

    def test_tokenizer_is_arrow_eval(self, spark, small_df):
        plan = _plan(ib.tokenized(small_df))
        # pandas UDFs run as ArrowEvalPython, never row-at-a-time
        # BatchEvalPython (input_hint: "no per-row Python")
        assert "ArrowEvalPython" in plan
        assert "BatchEvalPython" not in plan


class TestPackAndShardedQueryPlans:
    def test_pack_join_broadcasts_docmap(self, spark, pidx, small_df):
        """The pack stage's postings⋈doc_ord join must broadcast the
        (small) ordinal map rather than shuffle the postings."""
        from ics_search_engine_spark.operators.docmap import (
            assign_doc_ordinals,
        )
        from ics_search_engine_spark.operators import index_build as ib

        toks = ib.tokenized(small_df)
        dm = assign_doc_ordinals(toks.select(*ib.DOC_KEY, "dl"))
        posts = ib.postings(toks, with_positions=False).join(
            F.broadcast(dm.select(*ib.DOC_KEY, "doc_ord")), ib.DOC_KEY
        )
        assert "BroadcastHashJoin" in _plan(posts)

    def test_sharded_scorer_shuffles_payload_rows_not_postings(self, pidx):
        """score_shards_topk's only exchange is on shard_id over the
        matched PAYLOAD rows — the plan must not decode-then-shuffle
        (no per-posting exchange, no sort)."""
        from ics_search_engine_spark.operators.packed_index import (
            score_shards_topk,
        )

        matched = pidx.index.filter(F.col("term").isin(["spark", "machin"]))
        df = score_shards_topk(
            matched, {"spark": 1.0, "machin": 0.5}, pidx.avgdl, 10,
            pidx.stats["range_bits"],
        )
        plan = _plan(df)
        # exactly one exchange: hashpartitioning(shard_id...)
        assert plan.count("Exchange") == 1, plan
        assert "hashpartitioning(shard_id" in plan
        assert "FlatMapGroupsInPandas" in plan

    def test_filtered_scorer_cogroups_on_shard_id(self, spark, pidx):
        """The filter-query scorer (score_shards_topk(allowed=...))
        must apply the allowed-doc mask via a shard_id COGROUP: both
        sides exchange on shard_id only (payload rows and two-long
        filter rows — never a per-posting or per-doc-key shuffle into
        the kernel)."""
        from ics_search_engine_spark.operators.packed_index import (
            score_shards_topk,
        )

        rb = pidx.stats["range_bits"]
        matched = pidx.index.filter(F.col("term").isin(["spark", "machin"]))
        allowed = pidx.docmap.filter(F.col("turn_idx") % 2 == 0).select(
            F.shiftright(F.col("doc_ord"), rb).alias("shard_id"), "doc_ord"
        )
        df = score_shards_topk(
            matched, {"spark": 1.0, "machin": 0.5}, pidx.avgdl, 10, rb,
            allowed=allowed,
        )
        plan = _plan(df)
        assert "FlatMapCoGroupsInPandas" in plan
        exchanges = [
            ln for ln in plan.splitlines() if "Exchange" in ln
        ]
        assert len(exchanges) == 2, plan  # one per cogroup side
        assert all("hashpartitioning(shard_id" in ln for ln in exchanges), plan


def test_fused_build_single_posting_exchange(spark, small_df):
    """build_packed_index's fused plan: groupBy(term, shard_id, doc_ord)
    must REUSE the explicit repartition(term, shard_id) — partitioning
    on a subset of the grouping keys satisfies the aggregation's
    distribution, so posting-grain data crosses exactly one hash
    exchange (the other exchange is the broadcast of the tiny ordinal
    map)."""
    from ics_search_engine_spark.operators import index_build as ib
    from ics_search_engine_spark.operators.docmap import assign_doc_ordinals

    toks = ib.tokenized(small_df)
    dm = assign_doc_ordinals(toks.select(*ib.DOC_KEY, "dl"))
    exploded = (
        toks.join(F.broadcast(dm.select(*ib.DOC_KEY, "doc_ord")), ib.DOC_KEY)
        .select("doc_ord", "dl", F.posexplode("tokens").alias("pos", "term"))
        .withColumn("shard_id", F.shiftright("doc_ord", 9))
    )
    agged = (
        exploded.repartition(8, "term", "shard_id")
        .groupBy("term", "shard_id", "doc_ord")
        .agg(F.count("*").cast("int").alias("tf"), F.first("dl").alias("dl"))
        .sortWithinPartitions("term", "shard_id", "doc_ord")
    )
    plan = _plan(agged)
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "BroadcastHashJoin" in plan


class TestRound3QuerySurfacePlans:
    @pytest.fixture(scope="class")
    def ppidx(self, spark, small_df, corpus_dir):
        out = f"{corpus_dir}/plans_pos_idx"
        build_packed_index(spark, small_df, out, range_bits=10,
                           with_positions=True)
        return PackedIndex(spark, out)

    def test_near_pushes_term_filter_and_takeordered(self, spark, ppidx):
        from ics_search_engine_spark.operators.phrase import near_topk

        df = near_topk(spark, ppidx, "machine learning", 3, k=10)
        plan = _plan(df, "formatted")
        assert "In(term" in plan, plan[:2000]

    def test_snippet_text_join_is_broadcast(self, spark, ppidx, small_df):
        from ics_search_engine_spark.operators.snippets import highlight_topk

        df = highlight_topk(spark, ppidx, small_df, "machine learning", k=5)
        plan = _plan(df)
        # k winner rows broadcast against the transcripts scan — the
        # corpus is never shuffled for display payload
        assert "BroadcastHashJoin" in plan, plan[:3000]

    def test_qlang_term_filters_push_down(self, spark, ppidx):
        from ics_search_engine_spark.operators.qlang import bm25_topk_qlang

        df = bm25_topk_qlang(
            spark, ppidx, '+machine -slow "machine learning" spark', k=10
        )
        plan = _plan(df, "formatted")
        assert "In(term" in plan, plan[:2000]
        assert "TakeOrderedAndProject" in plan

    def test_wildcard_expansion_is_metadata_only(self, ppidx):
        """Prefix expansion scans term_stats (vocabulary-sized), never
        the payload-bearing index table."""
        df = ppidx.term_stats.filter(F.col("term").startswith("mach"))
        plan = _plan(df, "formatted")
        assert "StartsWith" in plan, plan[:2000]
        read_schema = [
            line for line in plan.splitlines() if "ReadSchema" in line
        ]
        assert read_schema and "payload" not in read_schema[0]


class TestAggregationPlans:
    """Round-3 aggregation-family plan audits: the shapes the module
    docstrings promise (term-IN pushdown through matched_docs, one-pass
    0/1 sums, TakeOrderedAndProject cuts, broadcast child joins)."""

    def test_matched_docs_pushes_term_filter(self, spark, pidx):
        from ics_search_engine_spark.operators.facets import matched_docs

        plan = _plan(matched_docs(spark, pidx, "machine"), "formatted")
        assert "PushedFilters" in plan
        assert "In(term" in plan or "EqualTo(term" in plan

    def test_filters_agg_is_single_aggregate_no_union(
        self, spark, pidx, small_df
    ):
        from ics_search_engine_spark.operators.aggs import filters_agg

        df = filters_agg(
            spark, pidx, "machine", small_df,
            {"a": F.col("role") == "user", "b": F.col("role") != "user"},
        )
        plan = _plan(df)
        # one pass: no Union of per-filter subplans
        assert "Union" not in plan

    def test_top_metrics_is_take_ordered(self, spark, pidx, small_df):
        from ics_search_engine_spark.operators.aggs import top_metrics

        attrs = small_df.select(
            "conv_id", "turn_idx", "role",
            F.length("text").alias("nchars"),
        )
        df = top_metrics(spark, pidx, "machine", attrs, "nchars",
                         ["role"], k=3)
        assert "TakeOrderedAndProject" in _plan(df)

    def test_diversified_global_cut_is_take_ordered(
        self, spark, pidx, small_df
    ):
        from ics_search_engine_spark.operators.aggs import diversified_topk

        df = diversified_topk(
            spark, pidx, "machine", small_df, "role", max_per_key=2, k=5
        )
        assert "TakeOrderedAndProject" in _plan(df)

    def test_has_parent_children_join_broadcasts(self, spark, pidx):
        from ics_search_engine_spark.operators.convs import has_parent_turns

        df = has_parent_turns(spark, pidx, "machine", k_parents=3)
        assert "BroadcastHashJoin" in _plan(df)

    def test_knn_filtered_predicate_reaches_scan(self, spark):
        from ics_search_engine_spark.operators.similarity import (
            cosine_topk_filtered,
        )

        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        qvec = [0.1] * len(emb.first()["embedding"])
        df = cosine_topk_filtered(
            emb, qvec, F.col("vec_id") % 2 == 0, k=5
        )
        plan = _plan(df)
        assert "TakeOrderedAndProject" in plan


class TestProfile:
    def test_profile_is_metadata_only_and_matches_df(self, spark, pidx):
        from ics_search_engine_spark.operators.query import profile_terms

        df = profile_terms(spark, pidx, "machine learning")
        plan = _plan(df, "formatted")
        read_schema = [
            line for line in plan.splitlines() if "ReadSchema" in line
        ]
        assert read_schema and "payload" not in read_schema[0]
        rows = {r["term"]: r for r in df.collect()}
        for t, r in rows.items():
            assert r["df"] == pidx.df_for_terms([t])[t]
            assert r["n_shards"] >= 1
        assert profile_terms(spark, pidx, "zz").count() == 0


class TestTermsEnum:
    def test_prefix_pushdown_metadata_only(self, spark, pidx):
        from ics_search_engine_spark.operators.query import terms_enum

        df = terms_enum(spark, pidx, "ma", size=10)
        plan = _plan(df, "formatted")
        read_schema = [
            line for line in plan.splitlines() if "ReadSchema" in line
        ]
        assert read_schema and "payload" not in read_schema[0]
        assert "StartsWith" in plan  # prefix reaches the scan

    def test_matches_dictionary(self, spark, pidx):
        from ics_search_engine_spark.operators.query import terms_enum

        got = [r["term"] for r in
               terms_enum(spark, pidx, "MA", size=5).collect()]
        vocab = sorted({
            r["term"]
            for r in pidx.index.select("term").distinct().collect()
            if r["term"].startswith("ma")
        })
        assert got == vocab[:5]
        assert len(got) <= 5

    def test_with_df_counts(self, spark, pidx):
        from ics_search_engine_spark.operators.query import terms_enum

        rows = terms_enum(spark, pidx, "ma", size=3, with_df=True).collect()
        for r in rows:
            assert r["df"] == pidx.df_for_terms([r["term"]])[r["term"]]

    def test_empty_prefix_rejected(self, spark, pidx):
        from ics_search_engine_spark.operators.query import terms_enum

        import pytest as _pytest
        with _pytest.raises(ValueError, match="non-empty"):
            terms_enum(spark, pidx, "")

    def test_no_match_prefix(self, spark, pidx):
        from ics_search_engine_spark.operators.query import terms_enum

        assert terms_enum(spark, pidx, "zzzzq", size=5).count() == 0


class TestSlicedPlan:
    def test_slice_predicate_adds_no_exchange(self, spark, pidx):
        """The slice filter is a pure row predicate on the scored
        frame: the sliced plan must have exactly as many Exchanges as
        the unsliced score-all path (bm25_topk_params rides the same
        score_all + TakeOrderedAndProject geometry) and still end in
        TakeOrderedAndProject."""
        from ics_search_engine_spark.operators.query import (
            bm25_topk_params,
        )
        from ics_search_engine_spark.operators.slices import (
            bm25_topk_sliced,
        )

        q = "machine learning"
        sliced = _plan(bm25_topk_sliced(spark, pidx, q, 1, 4, k=10))
        plain = _plan(bm25_topk_params(spark, pidx, q, k=10))
        assert sliced.count("Exchange") == plain.count("Exchange"), sliced
        assert "TakeOrderedAndProject" in sliced


class TestPercolatePlan:
    def test_broadcast_join_and_partial_agg(self, spark, small_df):
        """Percolation's 100 TB shape: query index broadcast (docs
        never shuffle on term) and the (doc, query) count keeping
        map-side partial aggregation."""
        from ics_search_engine_spark.operators.percolate import (
            build_query_index,
            percolate,
        )

        queries = spark.createDataFrame(
            [(0, "machine learning"), (1, "error handling")],
            "query_id int, query string",
        )
        qidx = build_query_index(spark, queries)
        df = percolate(spark, qidx, small_df, ["conv_id", "turn_idx"])
        plan = _plan(df)
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan
        assert "partial_count" in plan, plan[:3000]


class TestWave12Plans:
    def test_explain_doc_pushes_term_and_shard(self, spark, pidx):
        """explain_doc's decode must scan ONE shard's rows for the
        query terms only — both predicates at the parquet scan."""
        shard = 0
        df = pidx.index.filter(
            F.col("term").isin(["machin", "learn"])
            & (F.col("shard_id") == shard)
        )
        plan = _plan(df, "formatted")
        assert "PushedFilters" in plan
        assert "In(term" in plan
        assert "EqualTo(shard_id" in plan, plan[:2000]

    def test_sort_by_field_is_take_ordered(self, spark, pidx):
        """The field sort never sorts the match set globally: the k
        cut must be TakeOrderedAndProject, and no BM25 scoring fold
        (no aggregate over contributions) appears in the plan."""
        from ics_search_engine_spark.operators.querydsl import (
            sort_by_field_topk,
        )

        attrs = pidx.docmap.select(
            "conv_id", "turn_idx", (F.col("turn_idx") * 3).alias("v")
        )
        df = sort_by_field_topk(
            spark, pidx, "machine learning", attrs, "v", k=10
        )
        plan = _plan(df)
        assert "TakeOrderedAndProject" in plan

    def test_terms_agg_partial_counts_before_shuffle(self, spark, pidx):
        """The per-(shard, value) count must keep map-side partial
        aggregation — the property that bounds what a hot value ships."""
        from ics_search_engine_spark.operators.aggs import terms_agg

        attrs = pidx.docmap.select(
            "conv_id", "turn_idx",
            F.format_string("c%d", F.col("turn_idx") % 5).alias("cat"),
        )
        df = terms_agg(
            spark, pidx, "machine learning", attrs, "cat", size=5,
            shard_size=2,
        )
        plan = _plan(df)
        assert "partial_count" in plan or "partial count" in plan.lower()


class TestEqlPlan:
    def test_one_shared_window_and_one_event_exchange(self, spark):
        """The sequence matcher's scale contract: exactly TWO Window
        nodes over ONE sort of the event set — row_number, then a
        single WindowExec carrying every stage's next-match pointer
        (not one Window per stage), so adding stages never adds
        passes.  The chain joins reuse the cached window output."""
        import datetime as dt

        from ics_search_engine_spark.operators.eql import sequence_matches

        t0 = dt.datetime(2024, 1, 1)
        ev = spark.createDataFrame(
            [
                (i, f"u{i % 3}", "abc"[i % 3], t0 + dt.timedelta(seconds=i))
                for i in range(30)
            ],
            "event_id long, user_id string, event_type string, ts timestamp",
        )
        et = F.col("event_type")
        out = sequence_matches(
            ev,
            by="user_id",
            stages=[et == "a", et == "b", et == "c"],
            maxspan_s=60,
        )
        try:
            plan = _plan(out, "formatted")
            windows = [
                ln for ln in plan.splitlines()
                if ln.strip().startswith("(") and ") Window" in ln
            ]
            assert len(windows) == 2, plan[:3000]
        finally:
            # sequence_matches caches its window output; drop it
            spark.catalog.clearCache()


class TestEsqlPlan:
    def test_pipe_compiles_to_pushed_down_single_plan(self, spark):
        """The ES|QL compiler's whole point: the pipe must plan like
        the hand-written DataFrame program — WHERE reaches the parquet
        scan as PushedFilters, STATS keeps map-side partial
        aggregation, SORT+LIMIT is TakeOrderedAndProject."""
        from ics_search_engine_spark.operators.esql import esql_query

        ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        pipe = """FROM events
| WHERE event_type == "error" AND value > 50
| STATS n = COUNT(*) BY event_type
| SORT n DESC
| LIMIT 5"""
        df = esql_query(spark, pipe, {"events": ev})
        plan = _plan(df, "formatted")
        assert "PushedFilters" in plan
        assert "EqualTo(event_type,error)" in plan, plan[:2500]
        assert "GreaterThan(value,50" in plan
        assert "partial_count" in plan
        assert "TakeOrderedAndProject" in plan


class TestDatapipePlans:
    """100x-readiness audits for the training-pipeline verbs: the
    shuffle counts and pushdown shapes the scale claims rest on."""

    @pytest.fixture(scope="class")
    def docs(self, spark):
        rows = [(i, f"src{i % 3}", ["en", "de"][i % 2],
                 f"alpha beta w{i} gamma delta text {i}", (i * 7) % 90 + 10)
                for i in range(200)]
        return spark.createDataFrame(
            rows,
            "doc_id long, source string, lang string, text string,"
            " n_tokens long",
        )  # no repartition: the audits assert the OPERATORS add no shuffle

    def test_stratified_sample_is_filter_only(self, docs):
        from ics_search_engine_spark.operators.datapipe import (
            stratified_sample,
        )

        plan = _plan(stratified_sample(docs, "doc_id", 0.3))
        assert "Exchange" not in plan, plan  # a pure Filter — no shuffle

    def test_scrub_pii_is_projection_only(self, docs):
        from ics_search_engine_spark.operators.textstats import scrub_pii

        plan = _plan(scrub_pii(docs))
        assert "Exchange" not in plan, plan

    def test_classifier_score_is_projection_only(self, docs):
        from ics_search_engine_spark.operators.classifier import (
            score_quality,
        )

        plan = _plan(score_quality(docs, [0.1] * 16, 0.0))
        assert "Exchange" not in plan, plan

    def test_mix_sources_single_stratum_exchange(self, docs):
        from ics_search_engine_spark.operators.datapipe import mix_sources

        plan = _plan(mix_sources(docs, "source", {"src0": 1, "src1": 1},
                                 "doc_id"))
        # one hash exchange on the stratum key feeds the rank window
        assert plan.count("Exchange hashpartitioning") == 1, plan

    def test_pack_sequences_no_single_partition_window(self, docs):
        from ics_search_engine_spark.operators.datapipe import (
            pack_sequences,
        )

        plan = _plan(pack_sequences(docs, 256))
        # the range shuffle runs inside _with_global_offset's eager
        # localCheckpoint (before this plan exists); downstream the
        # pinned blocks appear as an RDD scan and the cumsum window
        # partitions by the range id — never SinglePartition
        assert "Scan ExistingRDD" in plan, plan
        assert "SinglePartition" not in plan, plan
        for ln in plan.splitlines():
            if "Window" in ln or "window" in ln.split("(")[0]:
                assert "SinglePartition" not in ln, plan

    def test_dedup_lines_two_data_exchanges(self, docs):
        from ics_search_engine_spark.operators.dedup import (
            dedup_lines_corpus,
        )

        plan = _plan(dedup_lines_corpus(docs))
        # line-hash window + doc-grain reassembly; partial aggregation
        # may add a same-key exchange but nothing else
        assert 2 <= plan.count("Exchange hashpartitioning") <= 3, plan

    def test_unigram_nll_reuses_model_exchange(self, docs):
        from ics_search_engine_spark.operators.textstats import (
            unigram_logprob,
        )

        df = unigram_logprob(docs)
        df.collect()  # exchange reuse is finalized by AQE at runtime
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "ReusedExchange" in plan, plan


class TestBucketedJoin:
    """The >4M-doc docmap-join strategy (packed_index.py's 'bucket both
    sides instead'): bucketed+sorted tables join with NO Exchange."""

    def test_bucketed_join_has_no_exchange(self, spark, small_df):
        import pyspark.sql.functions as F

        from ics_search_engine_spark.sources.bucketed import (
            cogrouped_join,
            write_bucketed,
        )

        left = small_df.select(
            "conv_id", "turn_idx", F.length("text").alias("dl")
        )
        right = small_df.select("conv_id", "turn_idx").withColumn(
            "doc_ord", F.monotonically_increasing_id()
        )
        write_bucketed(left, "t_bucket_left", 4, "conv_id", "turn_idx")
        write_bucketed(right, "t_bucket_right", 4, "conv_id", "turn_idx")
        try:
            old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            try:
                joined = cogrouped_join(
                    spark, "t_bucket_left", "t_bucket_right",
                    ["conv_id", "turn_idx"],
                )
                plan = _plan(joined)
                assert "SortMergeJoin" in plan, plan
                # THE claim: no shuffle of either side, ever
                assert "Exchange" not in plan, plan
                assert plan.count("Bucketed: true") == 2, plan
                # a LOCAL per-bucket sort remains: OSS Spark does not
                # propagate sortBy metadata into SMJ planning
                # (SPARK-19256) — it is per-bucket-sized, not a shuffle
                # and the join is CORRECT, not just well-planned
                assert joined.count() == small_df.count()
            finally:
                spark.conf.set(
                    "spark.sql.autoBroadcastJoinThreshold", old
                )
        finally:
            spark.sql("DROP TABLE IF EXISTS t_bucket_left")
            spark.sql("DROP TABLE IF EXISTS t_bucket_right")

    def test_validation(self, spark, small_df):
        from ics_search_engine_spark.sources.bucketed import write_bucketed

        with pytest.raises(ValueError):
            write_bucketed(small_df, "t_x", 0, "conv_id")
        with pytest.raises(ValueError):
            write_bucketed(small_df, "t_x", 4)


class TestWave18Plans:
    """Plan audits for the wave-18..22 operators: the shapes claimed
    in their docstrings, checked in the optimizer's output."""

    def test_sparse_topk_broadcasts_weights_and_takes_ordered(self, spark):
        from ics_search_engine_spark.operators.sparsevec import (
            sparse_postings,
            sparse_topk,
        )

        df = spark.createDataFrame(
            [("c0", 0, "alpha beta gamma"), ("c1", 0, "beta gamma delta")],
            "conv_id string, turn_idx int, text string",
        )
        posts = sparse_postings(df, stem=False)
        plan = _plan(sparse_topk(spark, posts, {"beta": 1.0, "gamma": 0.5}))
        assert "BroadcastHashJoin" in plan
        assert "TakeOrderedAndProject" in plan

    def test_map_only_verbs_have_no_exchange(self, spark):
        """span_corruption / fim_transform / c4_line_rules are claimed
        map-only — no Exchange may appear anywhere in their plans."""
        from ics_search_engine_spark.operators.datapipe import (
            fim_transform,
            span_corruption,
        )
        from ics_search_engine_spark.operators.textstats import (
            c4_line_rules,
        )

        docs = spark.createDataFrame(
            [(0, "alpha beta gamma delta")], "doc_id long, text string"
        )
        for out in (
            span_corruption(docs),
            fim_transform(docs),
            c4_line_rules(docs),
        ):
            assert "Exchange" not in _plan(out)

    def test_chunk_documents_map_only(self, spark):
        from ics_search_engine_spark.operators.datapipe import (
            chunk_documents,
        )

        docs = spark.createDataFrame(
            [(0, "alpha beta gamma delta")], "doc_id long, text string"
        )
        assert "Exchange" not in _plan(chunk_documents(docs, size=2))

    def test_cap_per_key_single_exchange(self, spark):
        from ics_search_engine_spark.operators.datapipe import cap_per_key

        docs = spark.createDataFrame(
            [(0, "s0"), (1, "s0")], "doc_id long, source string"
        )
        plan = _plan(cap_per_key(docs, ["source"], 1))
        assert plan.count("Exchange") == 1, plan

    def test_substring_dedup_no_window(self, spark):
        """The first-occurrence rule must be an aggregation (partial
        map-side), never a per-gram Window sort."""
        from ics_search_engine_spark.operators.dedup import (
            exact_substring_dedup,
        )

        docs = spark.createDataFrame(
            [(0, "alpha beta gamma delta epsilon")],
            "doc_id long, text string",
        )
        plan = _plan(exact_substring_dedup(docs, l=2))
        assert "Window" not in plan
        assert "HashAggregate" in plan

    def test_ltr_single_decode_take_ordered(self, spark, pidx):
        from ics_search_engine_spark.operators.ltr import ltr_features

        plan = _plan(ltr_features(spark, pidx, "machine learning"))
        assert "TakeOrderedAndProject" in plan
        # one decode: exactly one Arrow eval of the payload decoder
        assert plan.count("MapInPandas") <= 1
