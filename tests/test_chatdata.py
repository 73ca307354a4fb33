"""Chat/SFT extraction (operators/chatdata.py) — hand-built
conversations with known pairings, stats, and duplicates."""

import pytest

from ics_search_engine_spark.operators.chatdata import (
    conv_exact_dups,
    conversation_stats,
    sft_pairs,
)


@pytest.fixture(scope="module")
def convs(spark):
    rows = [
        # conv a: u/a/u/a with a tool call on turn 3
        ("a", 0, "user", "hello there", None),
        ("a", 1, "assistant", "hi, how can i help", None),
        ("a", 2, "user", "search the docs", None),
        ("a", 3, "assistant", "found three results", "search"),
        # conv b: assistant-first (no preceding turn -> no example),
        # then a normal pair; one null text
        ("b", 0, "assistant", "unprompted greeting", None),
        ("b", 1, "user", None, None),
        ("b", 2, "assistant", "reply to nothing", None),
        # conv c: duplicate of conv a's texts
        ("c", 0, "user", "hello there", None),
        ("c", 1, "assistant", "hi, how can i help", None),
        ("c", 2, "user", "search the docs", None),
        ("c", 3, "assistant", "found three results", None),
    ]
    return spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string",
    )


class TestSftPairs:
    def test_pairs_and_context(self, spark, convs):
        out = {
            (r["conv_id"], r["turn_idx"]): r.asDict()
            for r in sft_pairs(convs, context_turns=2).collect()
        }
        assert out[("a", 1)]["prompt"] == "user: hello there"
        assert out[("a", 1)]["response"] == "hi, how can i help"
        # two turns of context, rendered in order
        assert out[("a", 3)]["prompt"] == (
            "assistant: hi, how can i help\nuser: search the docs"
        )
        # assistant-first turn has no context -> no example
        assert ("b", 0) not in out
        # null text renders as empty; both prior turns in context
        assert out[("b", 2)]["prompt"] == (
            "assistant: unprompted greeting\nuser: "
        )

    def test_context_one_is_plain_pairing(self, spark, convs):
        out = {
            (r["conv_id"], r["turn_idx"]): r["prompt"]
            for r in sft_pairs(convs, context_turns=1).collect()
        }
        assert out[("a", 3)] == "user: search the docs"

    def test_bad_context(self, spark, convs):
        with pytest.raises(ValueError):
            sft_pairs(convs, context_turns=0)


class TestConversationStats:
    def test_counts(self, spark, convs):
        out = {
            r["conv_id"]: r.asDict()
            for r in conversation_stats(convs).collect()
        }
        a = out["a"]
        assert (a["n_turns"], a["n_user"], a["n_assistant"]) == (4, 2, 2)
        assert a["n_tool_calls"] == 1
        assert a["n_chars"] == sum(
            len(t) for t in [
                "hello there", "hi, how can i help",
                "search the docs", "found three results",
            ]
        )
        assert out["b"]["n_tool_calls"] == 0
        # no ts column -> no span column
        assert "span_seconds" not in a


class TestConvExactDups:
    def test_dup_resolution(self, spark, convs):
        dups = {
            r["conv_id"]: r["keeper"]
            for r in conv_exact_dups(convs).collect()
        }
        # conv c repeats conv a's text sequence exactly (tool/role
        # differences don't matter — the fingerprint is text-only)
        assert dups == {"c": "a"}


class TestConvNearDups:
    def test_rolled_text_and_near_pairs(self, spark, convs):
        from ics_search_engine_spark.operators.chatdata import (
            conv_near_dup_pairs,
            conv_rolled_text,
        )

        rolled = {
            r["conv_id"]: r["text"]
            for r in conv_rolled_text(convs).collect()
        }
        assert rolled["a"] == (
            "hello there hi, how can i help search the docs "
            "found three results"
        )
        # null turn renders empty (double space collapses via join)
        assert rolled["b"] == "unprompted greeting  reply to nothing"
        pairs = conv_near_dup_pairs(convs, jaccard_threshold=0.7).collect()
        got = {(r["a_conv_id"], r["b_conv_id"]): r["est_jaccard"]
               for r in pairs}
        # conv c is a text-identical copy of conv a -> jaccard 1.0
        assert got.get(("a", "c")) == 1.0
        assert all(k == ("a", "c") for k in got)


class TestPrepareChatCorpus:
    def test_composition_and_report(self, spark, convs):
        from ics_search_engine_spark.operators.chatdata import (
            prepare_chat_corpus,
            sft_pairs,
        )

        pairs, rep = prepare_chat_corpus(
            convs, min_turns=2, require_assistant=True
        )
        report = {r["stage"]: r["n_convs"] for r in rep.collect()}
        # a, b, c all pass structural gates; c is an exact dup of a
        assert report == {"input": 3, "structural": 3, "exact_dedup": 2}
        got = sorted(
            (r["conv_id"], r["turn_idx"]) for r in pairs.collect()
        )
        survivors = convs.filter("conv_id != 'c'")
        want = sorted(
            (r["conv_id"], r["turn_idx"])
            for r in sft_pairs(survivors, context_turns=1).collect()
        )
        assert got == want

    def test_near_dedup_stage_and_no_report(self, spark, convs):
        from ics_search_engine_spark.operators.chatdata import (
            prepare_chat_corpus,
        )

        # make c a NEAR (not exact) dup: tweak one turn's text
        import pyspark.sql.functions as F

        tweaked = convs.withColumn(
            "text",
            F.when(
                (F.col("conv_id") == "c") & (F.col("turn_idx") == 3),
                "found three results indeed",
            ).otherwise(F.col("text")),
        )
        pairs, rep = prepare_chat_corpus(
            tweaked, near_dedup=True, jaccard_threshold=0.5,
            report=False,
        )
        assert rep is None
        assert not [
            r for r in pairs.collect() if r["conv_id"] == "c"
        ]  # near-dup side dropped

    def test_near_dedup_is_transitive_chain_of_three(self, spark):
        """Chain A~C, B~C where A and B never pair directly (A<B<C):
        the transitive keeper rule keeps only the component minimum
        {A} — the doc-grain prepare_corpus semantics.  The pairwise
        larger-side drop this replaced would have kept {A, B}."""
        from ics_search_engine_spark.operators.chatdata import (
            conv_near_dup_drops,
        )

        pairs = spark.createDataFrame(
            [("a", "c", 0.8), ("b", "c", 0.8)],
            "a_conv_id string, b_conv_id string, est_jaccard double",
        )
        drops = sorted(
            r["conv_id"] for r in conv_near_dup_drops(pairs).collect()
        )
        assert drops == ["b", "c"]

    def test_near_dedup_end_to_end_transitive(self, spark):
        """prepare_chat_corpus(near_dedup=True) over a synthetic
        chain: three conversations where x~z and y~z share enough
        shingles to pair under LSH but x and y need not — survivors
        must be exactly one conversation per transitive component."""
        from ics_search_engine_spark.operators.chatdata import (
            conv_near_dup_drops,
            conv_near_dup_pairs,
            prepare_chat_corpus,
        )

        base = ("alpha bravo charlie delta echo foxtrot golf hotel "
                "india juliet kilo lima mike november oscar papa")
        words = base.split()
        # x: base; z: base minus last word; y: base minus first word —
        # each differs from z by ~1 shingle but x/y differ by 2.
        texts = {
            "x": " ".join(words),
            "y": " ".join(words[1:]),
            "z": " ".join(words[:-1]),
        }
        rows = []
        for cid, txt in texts.items():
            half = len(txt) // 2
            rows += [
                (cid, 0, "user", txt[:half], None, None),
                (cid, 1, "assistant", txt[half:], None, None),
            ]
        convs = spark.createDataFrame(
            rows,
            "conv_id string, turn_idx int, role string, text string,"
            " tool string, ts timestamp",
        )
        got_pairs = {
            (r["a_conv_id"], r["b_conv_id"])
            for r in conv_near_dup_pairs(
                convs, jaccard_threshold=0.5
            ).collect()
        }
        if got_pairs >= {("x", "z"), ("y", "z")}:
            # a genuine chain formed: transitive closure must collapse
            # it to the single component minimum
            drops = sorted(
                r["conv_id"]
                for r in conv_near_dup_drops(
                    conv_near_dup_pairs(
                        convs, jaccard_threshold=0.5
                    )
                ).collect()
            )
            assert drops == ["y", "z"]
        pairs, _ = prepare_chat_corpus(
            convs, near_dedup=True, jaccard_threshold=0.5,
            report=False,
        )
        survivors = {r["conv_id"] for r in pairs.collect()}
        comp = {"x", "y", "z"}
        dropped = {
            r["conv_id"]
            for r in conv_near_dup_drops(
                conv_near_dup_pairs(convs, jaccard_threshold=0.5)
            ).collect()
        }
        assert survivors == comp - dropped
        # component minima always survive
        assert "x" in survivors


class TestTrimToTokenBudget:
    def test_keep_last_whole_turns(self, spark):
        from ics_search_engine_spark.operators.chatdata import (
            trim_to_token_budget,
        )

        rows = [
            ("x", 0, "user", "one two three four five", None),   # 5
            ("x", 1, "assistant", "six seven eight", None),      # 3
            ("x", 2, "user", "nine ten", None),                  # 2
        ]
        df = spark.createDataFrame(
            rows,
            "conv_id string, turn_idx int, role string, text string, "
            "tool string",
        )
        kept = {
            r["turn_idx"]: r.asDict()
            for r in trim_to_token_budget(df, 5).collect()
        }
        # from the end: turn2 (2) + turn1 (3) = 5 fits; turn0 doesn't
        assert sorted(kept) == [1, 2]
        assert kept[1]["conv_tokens_kept"] == 5
        first = {
            r["turn_idx"]
            for r in trim_to_token_budget(df, 5, keep="first").collect()
        }
        assert first == {0}  # 5 fits, +3 would exceed

    def test_oversize_turn_dropped_not_clipped(self, spark):
        from ics_search_engine_spark.operators.chatdata import (
            trim_to_token_budget,
        )

        df = spark.createDataFrame(
            [("y", 0, "user", "a b c d e f", None)],
            "conv_id string, turn_idx int, role string, text string, "
            "tool string",
        )
        assert trim_to_token_budget(df, 3).count() == 0
        with pytest.raises(ValueError):
            trim_to_token_budget(df, 0)
        with pytest.raises(ValueError):
            trim_to_token_budget(df, 5, keep="middle")


class TestValidateTurnOrder:
    def test_all_predicates(self, spark):
        from ics_search_engine_spark.operators.chatdata import (
            validate_turn_order,
        )

        rows = [
            # valid: contiguous, alternating, user-first, asst-last
            ("v", 0, "user", "q", None),
            ("v", 1, "assistant", "a", None),
            # gap in turn_idx
            ("g", 0, "user", "q", None),
            ("g", 2, "assistant", "a", None),
            # consecutive same role
            ("s", 0, "user", "q", None),
            ("s", 1, "user", "q2", None),
            ("s", 2, "assistant", "a", None),
            # assistant-first / user-last
            ("o", 0, "assistant", "a", None),
            ("o", 1, "user", "q", None),
            # single user turn: alternating trivially, no assistant end
            ("u", 0, "user", "q", None),
        ]
        df = spark.createDataFrame(
            rows,
            "conv_id string, turn_idx int, role string, text string, "
            "tool string",
        )
        out = {
            r["conv_id"]: r.asDict()
            for r in validate_turn_order(df).collect()
        }
        assert out["v"]["valid"]
        assert not out["g"]["contiguous"] and not out["g"]["valid"]
        assert not out["s"]["alternating"] and out["s"]["contiguous"]
        assert not out["o"]["starts_with_user"]
        assert not out["o"]["ends_with_assistant"]
        assert out["u"]["alternating"] and not out["u"]["valid"]


class TestFuzzyAutoExpander:
    def test_auto_prefers_existing_dict(self, spark, tmp_path):
        import pyarrow.parquet as pq

        from ics_search_engine_spark.operators.fuzzy import (
            bm25_topk_fuzzy,
            ensure_deletes_dict,
        )
        from ics_search_engine_spark.operators.packed_index import (
            PackedIndex,
            build_packed_index,
        )
        from ics_search_engine_spark.sources.transcripts import (
            generate_turns,
        )

        d = tmp_path / "corpus"
        d.mkdir()
        pq.write_table(generate_turns(150, 5), str(d / "t.parquet"))
        out = str(tmp_path / "auto_idx")
        build_packed_index(
            spark, spark.read.parquet(str(d / "t.parquet")), out,
            range_bits=9,
        )
        pidx = PackedIndex(spark, out)
        scan = [tuple(r) for r in
                bm25_topk_fuzzy(spark, pidx, "machne", k=5).collect()]
        # no dict yet -> auto == scan (and must not build one)
        import os

        auto1 = [tuple(r) for r in bm25_topk_fuzzy(
            spark, pidx, "machne", k=5, expander="auto").collect()]
        assert auto1 == scan
        assert not os.path.exists(f"{out}/term_deletes_d2")
        # materialize, then auto takes the probe — identical results
        ensure_deletes_dict(spark, pidx, 2)
        auto2 = [tuple(r) for r in bm25_topk_fuzzy(
            spark, pidx, "machne", k=5, expander="auto").collect()]
        assert auto2 == scan
