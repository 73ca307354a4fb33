"""Training-data pipeline operators (operators/datapipe)."""

import pyspark.sql.functions as F
import pytest

from ics_search_engine_spark.operators.datapipe import (
    HASH_SPACE,
    chunk_stats,
    filter_funnel,
    mix_sources,
    pack_sequences,
    sample_quota,
    stratified_sample,
)


@pytest.fixture(scope="module")
def docs(spark):
    """120 docs with deterministic token counts, 3 sources, 2 langs."""
    rows = [
        (
            i,
            ["src_a", "src_b", "src_c"][i % 3],
            ["en", "de"][i % 2],
            (i * 37) % 90 + 10,  # n_tokens in [10, 99]
        )
        for i in range(120)
    ]
    return spark.createDataFrame(
        rows, "doc_id long, source string, lang string, n_tokens long"
    ).repartition(7)


class TestPackSequences:
    def test_offsets_are_exclusive_prefix_sums(self, docs):
        out = pack_sequences(docs, capacity=256).orderBy("doc_id").collect()
        acc = 0
        for r in out:
            assert r["token_offset"] == acc
            assert r["chunk_id"] == acc // 256
            assert r["chunk_pos"] == acc % 256
            assert r["spans_boundary"] == (acc % 256 + r["n_tokens"] > 256)
            acc += r["n_tokens"]

    def test_partition_count_invariance(self, docs):
        a = pack_sequences(docs, 256, num_partitions=2).orderBy("doc_id")
        b = pack_sequences(docs, 256, num_partitions=9).orderBy("doc_id")
        assert [r.asDict() for r in a.collect()] == [
            r.asDict() for r in b.collect()
        ]

    def test_chunk_stats_preserve_token_mass(self, docs):
        packed = pack_sequences(docs, capacity=256)
        stats = chunk_stats(packed, capacity=256)
        total = docs.agg(F.sum("n_tokens")).first()[0]
        got = stats.agg(
            F.sum("n_tokens"), F.sum("n_docs"), F.max("chunk_id")
        ).first()
        assert got[0] == total
        assert got[1] == 120
        assert got[2] == (total - 1) // 256 or got[2] >= 0

    def test_no_single_partition_exchange(self, docs):
        plan = pack_sequences(docs, 256)._jdf.queryExecution().executedPlan().toString()
        assert "SinglePartition" not in plan
        # the range shuffle now happens inside _with_global_offset's
        # EAGER localCheckpoint (executed before this plan is built),
        # so the downstream plan sees the pinned blocks as an RDD scan
        # and the cumsum window partitioned by the range id — never a
        # global single-partition window.
        assert "Scan ExistingRDD" in plan
        assert "Window" in plan

    def test_offset_range_shuffle_not_global_sort(self, docs):
        # pin the upstream shape _with_global_offset checkpoints: a
        # range repartition on the order key (what makes the prefix
        # sum shuffle-scalable), not a global ORDER BY.
        ranged = docs.repartitionByRange("doc_id")
        plan = ranged._jdf.queryExecution().executedPlan().toString()
        assert "rangepartitioning" in plan.lower()

    def test_bad_capacity(self, docs):
        with pytest.raises(ValueError):
            pack_sequences(docs, 0)


class TestStratifiedSample:
    def test_rate_nesting_and_determinism(self, docs):
        lo = stratified_sample(docs, "doc_id", 0.2)
        hi = stratified_sample(docs, "doc_id", 0.6)
        lo_ids = {r["doc_id"] for r in lo.collect()}
        hi_ids = {r["doc_id"] for r in hi.collect()}
        assert lo_ids <= hi_ids  # thresholds nest
        assert lo_ids == {r["doc_id"] for r in lo.collect()}  # stable
        assert 0 < len(lo_ids) < len(hi_ids) < 120

    def test_per_stratum_rates_drop_unlisted(self, docs):
        out = stratified_sample(
            docs, "doc_id", {"en": 1.0, "de": 0.3}, strata_col="lang"
        )
        by_lang = {
            r["lang"]: r["n"]
            for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()
        }
        assert by_lang.get("en") == 60  # rate 1.0 keeps all
        assert 0 < by_lang.get("de", 0) < 60

    def test_requires_strata_col_for_dict(self, docs):
        with pytest.raises(ValueError):
            stratified_sample(docs, "doc_id", {"en": 0.5})

    def test_growth_stability(self, spark, docs):
        """A row's fate is independent of the rest of the corpus."""
        kept_small = {
            r["doc_id"]
            for r in stratified_sample(
                docs.filter("doc_id < 40"), "doc_id", 0.5
            ).collect()
        }
        kept_full = {
            r["doc_id"]
            for r in stratified_sample(docs, "doc_id", 0.5).collect()
        }
        assert kept_small == {i for i in kept_full if i < 40}


class TestSampleQuota:
    def test_exact_counts(self, docs):
        out = sample_quota(docs, "doc_id", 7, ["source", "lang"])
        counts = out.groupBy("source", "lang").agg(F.count("*").alias("n"))
        assert all(r["n"] == 7 for r in counts.collect())
        assert counts.count() == 6

    def test_deterministic(self, docs):
        a = {r["doc_id"] for r in sample_quota(docs, "doc_id", 5, ["source"]).collect()}
        b = {r["doc_id"] for r in sample_quota(docs, "doc_id", 5, ["source"]).collect()}
        assert a == b and len(a) == 15


class TestMixSources:
    def test_exact_ratio_scarcest_bound(self, docs):
        # 40 docs per source; parts 3:1 -> U = min(40//3, 40//1) = 13
        out = mix_sources(docs, "source", {"src_a": 3, "src_b": 1}, "doc_id")
        counts = {
            r["source"]: r["n"]
            for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
        }
        assert counts == {"src_a": 39, "src_b": 13}

    def test_drops_unlisted_sources(self, docs):
        out = mix_sources(docs, "source", {"src_a": 1}, "doc_id")
        assert out.filter(F.col("source") != "src_a").count() == 0

    def test_bad_parts(self, docs):
        with pytest.raises(ValueError):
            mix_sources(docs, "source", {"src_a": 0}, "doc_id")
        with pytest.raises(ValueError):
            mix_sources(docs, "source", {}, "doc_id")


class TestFilterFunnel:
    def test_attrition_chain(self, docs):
        stages = [
            ("long_enough", F.col("n_tokens") >= 30),
            ("english", F.col("lang") == "en"),
            ("src_ab", F.col("source") != "src_c"),
        ]
        rep = {r["stage_name"]: r.asDict() for r in filter_funnel(docs, stages).collect()}
        # manual chain
        s1 = docs.filter(stages[0][1])
        s2 = s1.filter(stages[1][1])
        s3 = s2.filter(stages[2][1])
        assert rep["long_enough"]["n_in"] == 120
        assert rep["long_enough"]["n_kept"] == s1.count()
        assert rep["english"]["n_in"] == s1.count()
        assert rep["english"]["n_kept"] == s2.count()
        assert rep["src_ab"]["n_kept"] == s3.count()
        for r in rep.values():
            assert r["n_in"] - r["n_kept"] == r["n_dropped"]

    def test_empty_stages_rejected(self, docs):
        with pytest.raises(ValueError):
            filter_funnel(docs, [])


class TestMixSourcesBudget:
    def test_exact_counts_with_upsampling(self, docs):
        from ics_search_engine_spark.operators.datapipe import (
            mix_sources_budget,
        )

        # 40 docs per source; parts 3:1, budget 160 -> unit 40,
        # src_a take 120 (3 epochs), src_b take 40 (1 epoch)
        out = mix_sources_budget(
            docs, "source", {"src_a": 3, "src_b": 1}, "doc_id", 160
        )
        counts = {
            r["source"]: r["n"]
            for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
        }
        assert counts == {"src_a": 120, "src_b": 40}
        # every src_a row appears exactly 3 times (epochs 0, 1, 2)
        per_doc = (
            out.filter("source = 'src_a'")
            .groupBy("doc_id")
            .agg(F.count("*").alias("c"), F.sort_array(F.collect_list("epoch")).alias("es"))
            .collect()
        )
        assert all(r["c"] == 3 and r["es"] == [0, 1, 2] for r in per_doc)

    def test_fractional_epoch_by_hash_rank(self, docs):
        from ics_search_engine_spark.operators.datapipe import (
            mix_sources_budget,
        )

        # take = 100 over 40 docs -> 2 full epochs + 20 extra copies
        out = mix_sources_budget(docs, "source", {"src_a": 1}, "doc_id", 100)
        per_doc = {
            r["doc_id"]: r["c"]
            for r in out.groupBy("doc_id").agg(F.count("*").alias("c")).collect()
        }
        assert sorted(per_doc.values()).count(3) == 20
        assert sorted(per_doc.values()).count(2) == 20
        # deterministic: same call -> same extra-copy set
        again = {
            r["doc_id"]: r["c"]
            for r in mix_sources_budget(docs, "source", {"src_a": 1}, "doc_id", 100)
            .groupBy("doc_id").agg(F.count("*").alias("c")).collect()
        }
        assert per_doc == again

    def test_validation(self, docs):
        from ics_search_engine_spark.operators.datapipe import (
            mix_sources_budget,
        )

        with pytest.raises(ValueError):
            mix_sources_budget(docs, "source", {"src_a": 0}, "doc_id", 10)
        with pytest.raises(ValueError):
            mix_sources_budget(docs, "source", {"src_a": 1}, "doc_id", 0)


class TestPackBins:
    def test_capacity_respected_and_deterministic(self, docs):
        from ics_search_engine_spark.operators.datapipe import pack_bins

        out = pack_bins(docs, capacity=128, n_buckets=4)
        fills = (
            out.filter(~F.col("oversize"))
            .groupBy("bin_id")
            .agg(F.sum("n_tokens").alias("t"))
            .collect()
        )
        assert fills and all(r["t"] <= 128 for r in fills)
        a = sorted(
            (r["doc_id"], r["bin_id"]) for r in out.collect()
        )
        b = sorted(
            (r["doc_id"], r["bin_id"])
            for r in pack_bins(docs, capacity=128, n_buckets=4).collect()
        )
        assert a == b

    def test_oversize_flagged_own_bin(self, spark):
        from ics_search_engine_spark.operators.datapipe import pack_bins

        df = spark.createDataFrame(
            [(1, 500), (2, 50), (3, 60)], "doc_id long, n_tokens long"
        )
        out = {r["doc_id"]: r.asDict() for r in pack_bins(df, 100, n_buckets=1).collect()}
        assert out[1]["oversize"] is True
        assert out[2]["oversize"] is False
        # the oversize bin holds only that doc
        assert out[1]["bin_id"] not in (out[2]["bin_id"], out[3]["bin_id"])

    def test_ffd_beats_sequential_fill(self, spark):
        """FFD's fill factor >= naive arrival-order packing on a
        fragmentation-prone size mix."""
        from ics_search_engine_spark.operators.datapipe import pack_bins

        rows = [(i, [60, 50, 45, 35][i % 4]) for i in range(80)]
        df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
        n_bins = (
            pack_bins(df, 100, n_buckets=1)
            .select("bin_id").distinct().count()
        )
        # naive sequential: fill in doc_id order
        cap, bins, room = 100, 0, 0
        for _, t in rows:
            if room >= t:
                room -= t
            else:
                bins += 1
                room = cap - t
        assert n_bins <= bins

    def test_bad_args(self, docs):
        from ics_search_engine_spark.operators.datapipe import pack_bins

        with pytest.raises(ValueError):
            pack_bins(docs, 0)
        with pytest.raises(ValueError):
            pack_bins(docs, 100, n_buckets=0)


class TestPrepareCorpus:
    def test_end_to_end(self, spark):
        from ics_search_engine_spark.operators.datapipe import prepare_corpus

        rows = []
        for i in range(40):
            rows.append((i, f"the quick brown fox number {i} runs far and "
                            f"fast across the wide field today", "en", "web"))
        # exact duplicates of doc 0's text
        for i in range(40, 44):
            rows.append((i, rows[0][1], "en", "web"))
        # PII-bearing
        rows.append((50, "email me at a@b.io " + rows[1][1], "en", "wiki"))
        # wrong language
        rows.append((51, "der hund läuft über das weite feld " * 3, "de", "web"))
        # too short
        rows.append((52, "tiny", "en", "web"))
        docs = spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string"
        )
        packed, rep = prepare_corpus(
            docs, capacity=128, min_tokens=8, langs=("en",)
        )
        r = {x["stage_name"]: x.asDict() for x in rep.collect()}
        assert r["scrub_pii"]["n_in"] == 47 and r["scrub_pii"]["n_dropped"] == 0
        # line dedup collapses the 4 exact copies of doc 0's (single) line
        assert r["line_dedup"]["n_dropped"] == 4
        assert r["exact_dedup"]["n_dropped"] == 0  # already line-deduped
        assert r["quality_gates"]["n_dropped"] == 2  # lang + short
        out = packed.collect()
        assert len(out) == 41
        assert all("chunk_id" in x.asDict() for x in out)
        # scrubbed text made it through the chain
        t50 = [x for x in out if x["doc_id"] == 50][0]
        assert "<EMAIL>" in t50["text"] and "a@b.io" not in t50["text"]
        # offsets form a valid packing
        acc = 0
        for x in sorted(out, key=lambda x: x["doc_id"]):
            assert x["token_offset"] == acc
            acc += x["n_tokens"]

    def test_no_report_skips_counts(self, spark):
        from ics_search_engine_spark.operators.datapipe import prepare_corpus

        docs = spark.createDataFrame(
            [(1, "one two three four five six seven eight nine", "en", "w")],
            "doc_id long, text string, lang string, source string",
        )
        packed, rep = prepare_corpus(docs, capacity=64, min_tokens=2,
                                     report=False)
        assert rep is None and packed.count() == 1

    def test_mixing_stage(self, spark):
        from ics_search_engine_spark.operators.datapipe import prepare_corpus

        rows = [(i, f"w{i} common words appear here in every doc {i}",
                 "en", ["a", "b"][i % 2]) for i in range(40)]
        docs = spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string"
        )
        packed, rep = prepare_corpus(
            docs, capacity=64, min_tokens=3, mix_parts={"a": 1, "b": 1}
        )
        assert packed.count() == 40  # balanced already
        srcs = {r["source"] for r in packed.collect()}
        assert srcs == {"a", "b"}


class TestPackPropertyBased:
    """Hypothesis: pack_sequences' distributed offsets equal a plain
    python prefix sum on ANY input (sizes, duplicates of n_tokens,
    ragged partitioning)."""

    def test_random_corpora_match_python_prefix_sum(self, spark):
        from hypothesis import HealthCheck, given, settings
        from hypothesis import strategies as st

        @given(
            st.lists(
                st.integers(min_value=0, max_value=5000),
                min_size=1,
                max_size=120,
            ),
            st.integers(min_value=1, max_value=4096),
            st.integers(min_value=1, max_value=9),
        )
        @settings(
            max_examples=12,
            deadline=None,
            suppress_health_check=[HealthCheck.too_slow],
        )
        def check(tokens, capacity, nparts):
            df = spark.createDataFrame(
                [(i, t) for i, t in enumerate(tokens)],
                "doc_id long, n_tokens long",
            ).repartition(nparts)
            got = {
                r["doc_id"]: (
                    r["token_offset"], r["chunk_id"], r["chunk_pos"],
                    r["spans_boundary"],
                )
                for r in pack_sequences(
                    df, capacity, num_partitions=min(nparts, 4)
                ).collect()
            }
            acc = 0
            for i, t in enumerate(tokens):
                want = (
                    acc, acc // capacity, acc % capacity,
                    acc % capacity + t > capacity,
                )
                assert got[i] == want, (i, got[i], want)
                acc += t

        check()


class TestShuffleCurriculum:
    def test_shuffle_is_deterministic_and_total(self, docs):
        from ics_search_engine_spark.operators.datapipe import (
            shuffle_deterministic,
        )

        a = [r["doc_id"] for r in shuffle_deterministic(docs).collect()]
        b = [r["doc_id"] for r in shuffle_deterministic(docs).collect()]
        assert a == b
        assert sorted(a) == list(range(120))  # a permutation
        assert a != sorted(a)  # ... that actually shuffles

    def test_epoch_seed_changes_permutation(self, docs):
        from ics_search_engine_spark.operators.datapipe import (
            shuffle_deterministic,
        )

        e0 = [r["doc_id"] for r in shuffle_deterministic(docs, seed=0).collect()]
        e1 = [r["doc_id"] for r in shuffle_deterministic(docs, seed=1).collect()]
        assert e0 != e1 and sorted(e0) == sorted(e1)

    def test_shuffle_plan_is_range_sort_no_window(self, docs):
        from ics_search_engine_spark.operators.datapipe import (
            shuffle_deterministic,
        )

        plan = shuffle_deterministic(docs)._jdf.queryExecution(
        ).executedPlan().toString()
        assert "rangepartitioning" in plan
        assert "Window" not in plan  # no single-partition rank stage

    def test_head_is_take_ordered(self, docs):
        from ics_search_engine_spark.operators.datapipe import shuffled_head

        df = shuffled_head(docs, 5)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" in plan
        rows = df.collect()
        keys = [r["shuffle_key"] for r in rows]
        assert keys == sorted(keys) and len(rows) == 5

    def test_head_agrees_with_full_shuffle_prefix(self, docs):
        from ics_search_engine_spark.operators.datapipe import (
            shuffle_deterministic,
            shuffled_head,
        )

        full = [r["doc_id"] for r in shuffle_deterministic(docs).collect()]
        head = [r["doc_id"] for r in shuffled_head(docs, 7).collect()]
        assert head == full[:7]

    def test_curriculum_buckets_ascend_and_shuffle_within(self, docs):
        from ics_search_engine_spark.operators.datapipe import (
            curriculum_order,
        )

        rows = curriculum_order(
            docs, "n_tokens", bucket_width=20.0
        ).collect()
        buckets = [r["difficulty_bucket"] for r in rows]
        assert buckets == sorted(buckets)  # easy → hard
        # within the first bucket the raw difficulty must NOT be
        # monotone (intra-bucket shuffle, not a difficulty sort)
        first = [r["n_tokens"] for r in rows if r["difficulty_bucket"] == buckets[0]]
        assert len(first) > 3 and first != sorted(first)


class TestPrepareNearDedup:
    def test_near_dedup_stage_drops_transitive_chain(self, spark):
        from ics_search_engine_spark.operators.datapipe import prepare_corpus

        base = (
            "the quick brown fox jumps over the lazy dog near the river "
            "bank every single morning without fail for many years now"
        )
        rows = [
            (0, base, "en", "src_a"),
            # near-dup chain: each step mutates a couple of tokens
            (1, base.replace("morning", "evening"), "en", "src_a"),
            (2, base.replace("morning", "evening").replace("quick", "slow"),
             "en", "src_a"),
            (3, "completely different text about spark structured "
                "streaming watermarks and stateful aggregation semantics",
             "en", "src_b"),
        ]
        docs = spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string"
        )
        packed, rep = prepare_corpus(
            docs, capacity=64, min_tokens=3, near_dedup=True,
            scrub=False, line_dedup=False,
        )
        kept = {r["doc_id"] for r in packed.select("doc_id").collect()}
        assert kept == {0, 3}  # chain 0-1-2 collapses to its min
        stages = {r["stage_name"]: r for r in rep.collect()}
        assert stages["near_dedup"]["n_dropped"] == 2


class TestShufflePage:
    def test_pages_tile_the_permutation(self, spark):
        from ics_search_engine_spark.operators.datapipe import (
            shuffle_deterministic,
            shuffle_page,
        )

        docs = spark.createDataFrame(
            [(i,) for i in range(97)], "doc_id long"
        )
        full = [
            r["doc_id"]
            for r in shuffle_deterministic(docs, seed=5).collect()
        ]
        paged, after = [], None
        while True:
            rows = shuffle_page(
                docs, 20, after_key=after, seed=5
            ).collect()
            if not rows:
                break
            paged.extend(r["doc_id"] for r in rows)
            after = rows[-1]["shuffle_key"]
        assert paged == full  # no overlap, no skip, same order

    def test_resume_independent_of_page_size(self, spark):
        from ics_search_engine_spark.operators.datapipe import shuffle_page

        docs = spark.createDataFrame(
            [(i,) for i in range(60)], "doc_id long"
        )
        p1 = shuffle_page(docs, 30, seed=1).collect()
        tail_via_cursor = [
            r["doc_id"]
            for r in shuffle_page(
                docs, 30, after_key=p1[-1]["shuffle_key"], seed=1
            ).collect()
        ]
        whole = [
            r["doc_id"] for r in shuffle_page(docs, 60, seed=1).collect()
        ]
        assert tail_via_cursor == whole[30:]


class TestPrepareCorpusNewStages:
    def test_c4_substring_domaincap_stages(self, spark):
        from ics_search_engine_spark.operators.datapipe import (
            prepare_corpus,
        )

        shared = " ".join(f"shared{i:02d}" for i in range(8))

        def good(i):
            # every token doc-unique: no accidental cross-doc 8-grams
            return " ".join(f"g{i}w{j:02d}" for j in range(12)) + "."

        rows = [
            # doc 0: survives everything (first occurrence of `shared`)
            (0, good(0) + "\n" + shared + " tail00 tail01 tail02.",
             "en", "s0"),
            # doc 1: same shared 8-gram -> substring-cut (line rules
            # keep both lines: they end in '.' via the shared line's
            # period and have >= 5 words)
            (1, good(1) + "\n" + shared + " other00 other01 other02.",
             "en", "s0"),
            # doc 2: killed by C4 (lorem ipsum)
            (2, good(2) + "\nthis page is lorem ipsum filler content "
             "now.", "en", "s1"),
            # docs 3-6: same source, compete under domain_cap=2
            *[(i, good(i) + f" extra{i:02d} " + " ".join(
                f"w{i}x{j:02d}" for j in range(i)) + ".", "en", "s2")
              for i in range(3, 7)],
        ]
        docs = spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string"
        )
        packed, rep = prepare_corpus(
            docs, capacity=64, min_tokens=5,
            scrub=False, line_dedup=False,
            c4_rules=True, substring_dedup_l=8, domain_cap=2,
        )
        stages = {r.stage_name: r for r in rep.collect()}
        assert stages["c4_rules"].n_dropped == 1          # doc 2
        assert stages["substring_dedup"].n_dropped == 0   # cut, not drop
        assert stages["domain_cap"].n_dropped == 2        # 4 -> 2 in s2
        kept = {r.doc_id for r in packed.select("doc_id").collect()}
        assert 2 not in kept
        assert len(kept & {3, 4, 5, 6}) == 2
        # doc 1 lost its shared span but kept its own tail
        t1 = {r.doc_id: r.n_tokens for r in packed.collect()}
        assert t1[1] < t1[0]


class TestChunkManifest:
    def test_segments_tile_chunks_exactly(self, spark):
        from ics_search_engine_spark.operators.datapipe import (
            chunk_manifest,
            pack_sequences,
        )

        rows = [(i, 7 + (i * 13) % 40) for i in range(50)]
        docs = spark.createDataFrame(rows, "doc_id long, n_tokens int")
        cap = 64
        packed = pack_sequences(docs, capacity=cap)
        man = {r.chunk_id: r for r in chunk_manifest(packed, cap).collect()}
        total = sum(n for _, n in rows)
        n_chunks = (total + cap - 1) // cap
        assert set(man) == set(range(n_chunks))
        # within each chunk: contiguous, non-overlapping, full
        for cid, r in man.items():
            segs = [(s["start"], s["end"], s["doc"]) for s in r.segments]
            assert segs[0][0] == 0
            for (s1, e1, _), (s2, e2, _) in zip(segs, segs[1:]):
                assert e1 == s2  # contiguous, no gap or overlap
            want_end = cap if cid < n_chunks - 1 else total - cap * cid
            assert segs[-1][1] == want_end
            assert r.n_tokens == want_end
        # every doc's spans across chunks sum to its n_tokens
        per_doc: dict[int, int] = {}
        for r in man.values():
            for s in r.segments:
                per_doc[s["doc"]] = per_doc.get(s["doc"], 0) + (
                    s["end"] - s["start"]
                )
        assert per_doc == dict(rows)

    def test_long_doc_spans_many_chunks(self, spark):
        from ics_search_engine_spark.operators.datapipe import (
            chunk_manifest,
            pack_sequences,
        )

        docs = spark.createDataFrame(
            [(0, 10), (1, 300), (2, 10)], "doc_id long, n_tokens int"
        )
        packed = pack_sequences(docs, capacity=64)
        man = chunk_manifest(packed, 64).collect()
        spans1 = [
            (r.chunk_id, s["start"], s["end"])
            for r in man for s in r.segments if s["doc"] == 1
        ]
        assert len(spans1) == 5  # 300 tokens from offset 10 -> chunks 0..4
        assert sum(e - s for _, s, e in spans1) == 300
