"""Decay function scoring + match_phrase_prefix vs Python oracles."""

import datetime
import math

import pytest

from oracle.bm25 import K1, B, idf as py_idf
from ics_search_engine_spark.operators.funcscore import bm25_topk_decay
from ics_search_engine_spark.operators.packed_index import (
    PackedIndex,
    build_packed_index,
)
from ics_search_engine_spark.operators.phrase import (
    phrase_prefix_offsets,
    phrase_prefix_topk,
)
from ics_search_engine_spark.operators.query import bm25_topk_packed
from ics_search_engine_spark.textproc.tokenizer import tokenize

ROWS = [
    ("c0", 0, "machine learning models learn quickly", "2026-01-01"),
    ("c0", 1, "the machine merges batches", "2026-01-15"),
    ("c1", 0, "machine learning machine learning ahead", "2026-02-01"),
    ("c1", 1, "vector vectors vectorized victory", "2026-02-15"),
    ("c2", 0, "machines learned long ago", "2025-06-01"),
    ("c2", 1, "fresh machine learning news today", "2026-03-01"),
    ("c3", 0, "windows join streams while machines learn", "2026-02-20"),
]


@pytest.fixture(scope="module")
def setup(spark, corpus_dir):
    df = spark.createDataFrame(
        [(c, t, x) for c, t, x, _ in ROWS],
        "conv_id string, turn_idx int, text string",
    )
    out = f"{corpus_dir}/fscore_idx"
    build_packed_index(spark, df, out, range_bits=4, with_positions=True)
    attrs = spark.createDataFrame(
        [(c, t, d) for c, t, _, d in ROWS],
        "conv_id string, turn_idx int, ts_s string",
    ).selectExpr("conv_id", "turn_idx", "cast(ts_s as timestamp) as ts")
    return PackedIndex(spark, out), attrs


class TestDecay:
    ORIGIN = "2026-03-01"
    SCALE = 30.0

    def _oracle(self, spark, pidx, query, fn, mode, decay=0.5, offset_d=0.0):
        """Recompute: full BM25 per doc (via the engine's own untruncated
        ranking at k=len corpus) x a Python decay factor."""
        base = {
            (r["conv_id"], r["turn_idx"]): r["score"]
            for r in bm25_topk_packed(spark, pidx, query, k=100).collect()
        }
        o = datetime.datetime.fromisoformat(self.ORIGIN).replace(
            tzinfo=datetime.timezone.utc
        ).timestamp()
        out = []
        for c, t, _x, d in ROWS:
            if (c, t) not in base:
                continue
            v = datetime.datetime.fromisoformat(d).replace(
                tzinfo=datetime.timezone.utc
            ).timestamp()
            dist = max(0.0, abs(v - o) - offset_d * 86400.0)
            s = self.SCALE * 86400.0
            if fn == "gauss":
                f = math.exp(math.log(decay) / (s * s) * dist * dist)
            elif fn == "exp":
                f = math.exp(math.log(decay) / s * dist)
            else:
                sl = s / (1.0 - decay)
                f = max(0.0, (sl - dist) / sl)
            sc = base[(c, t)] * f if mode == "multiply" else base[(c, t)] + f
            out.append((c, t, sc))
        out.sort(key=lambda r: (-r[2], r[0], r[1]))
        return out

    @pytest.mark.parametrize("fn", ["gauss", "exp", "linear"])
    @pytest.mark.parametrize("mode", ["multiply", "sum"])
    def test_matches_oracle(self, spark, setup, fn, mode):
        pidx, attrs = setup
        got = [
            (r["conv_id"], r["turn_idx"], r["score"])
            for r in bm25_topk_decay(
                spark, pidx, "machine learning", attrs, "ts",
                origin=self.ORIGIN, scale_days=self.SCALE, k=10,
                fn=fn, mode=mode,
            ).collect()
        ]
        want = self._oracle(spark, pidx, "machine learning", fn, mode)
        assert [(c, t) for c, t, _ in got] == [(c, t) for c, t, _ in want]
        for (_, _, a), (_, _, b) in zip(got, want):
            assert a == pytest.approx(b, rel=1e-12)

    def test_decay_reranks(self, spark, setup):
        """The stale doc c2,0 must fall behind fresher lower-bm25 docs."""
        pidx, attrs = setup
        plain = [
            (r["conv_id"], r["turn_idx"])
            for r in bm25_topk_packed(spark, pidx, "machine", k=10).collect()
        ]
        decayed = [
            (r["conv_id"], r["turn_idx"])
            for r in bm25_topk_decay(
                spark, pidx, "machine", attrs, "ts",
                origin=self.ORIGIN, scale_days=7.0, k=10, decay=0.1,
            ).collect()
        ]
        assert set(plain) == set(decayed)  # multiply keeps the match set
        assert plain != decayed            # ...but re-ranks it
        assert decayed.index(("c2", 0)) > plain.index(("c2", 0))

    def test_offset_plateau(self, spark, setup):
        """Docs within the offset take factor exactly 1.0."""
        pidx, attrs = setup
        got = {
            (r["conv_id"], r["turn_idx"]): r["score"]
            for r in bm25_topk_decay(
                spark, pidx, "machine learning", attrs, "ts",
                origin=self.ORIGIN, scale_days=30.0, offset_days=400.0,
                k=10,
            ).collect()
        }
        base = {
            (r["conv_id"], r["turn_idx"]): r["score"]
            for r in bm25_topk_packed(
                spark, pidx, "machine learning", k=10
            ).collect()
        }
        assert got == base

    def test_bad_params_raise(self, spark, setup):
        pidx, attrs = setup
        with pytest.raises(ValueError):
            bm25_topk_decay(
                spark, pidx, "machine", attrs, "ts",
                origin=self.ORIGIN, scale_days=30.0, fn="cosine",
            )
        with pytest.raises(ValueError):
            bm25_topk_decay(
                spark, pidx, "machine", attrs, "ts",
                origin=self.ORIGIN, scale_days=30.0, decay=1.5,
            )


class TestPhrasePrefix:
    def test_offsets_analysis(self):
        # fixed part analyzes like phrase_offsets; prefix unstemmed
        fixed, pre, off = phrase_prefix_offsets("master of scien")
        assert fixed == [("master", 0)]
        assert pre == "scien"
        assert off == 2  # 'of' occupies position 1
        fixed, pre, off = phrase_prefix_offsets("lear*")
        assert fixed == [] and pre == "lear" and off == 0

    def _oracle(self, phrase, k=10):
        fixed, pre, pre_off = phrase_prefix_offsets(phrase)
        out = []
        for conv_id, turn_idx, text, _ in ROWS:
            toks = tokenize(text, for_query=False)
            base = fixed[0][1] if fixed else pre_off
            rel = [(t, o - base) for t, o in fixed]
            starts = (
                [p for p, t in enumerate(toks) if t == rel[0][0]]
                if rel else
                [p for p, t in enumerate(toks) if t.startswith(pre)]
            )
            count = 0
            for p in starts:
                ok = all(
                    0 <= p + off < len(toks) and toks[p + off] == t
                    for t, off in rel[1:]
                )
                if ok and rel:
                    q = p + (pre_off - base)
                    ok = 0 <= q < len(toks) and toks[q].startswith(pre)
                if ok:
                    count += 1
            if count > 0:
                out.append((conv_id, turn_idx, count))
        out.sort(key=lambda x: (-x[2], x[0], x[1]))
        return out[:k]

    @pytest.mark.parametrize("phrase", [
        "machine lear",      # classic autocomplete
        "machine learning",  # full term still matches as its own prefix
        "vect",              # single-prefix query: count = occurrences
        "machine zz",        # no expansion -> empty
        "windows jo",        # adjacency with a different fixed term
    ])
    def test_matches_oracle(self, spark, setup, phrase):
        pidx, _ = setup
        got = [
            (r["conv_id"], r["turn_idx"], r["match_count"])
            for r in phrase_prefix_topk(spark, pidx, phrase, k=10).collect()
        ]
        assert got == self._oracle(phrase), phrase

    def test_expansion_cap_binds(self, spark, setup):
        """max_expansions=1 keeps only the df-heaviest expansion."""
        pidx, _ = setup
        full = phrase_prefix_topk(spark, pidx, "machine lear", k=10).count()
        capped = phrase_prefix_topk(
            spark, pidx, "machine lear", k=10, max_expansions=1
        ).count()
        assert capped <= full


class TestRankFeature:
    FEATS = {("c0", 0): 5.0, ("c1", 0): 50.0, ("c2", 1): 0.0}
    # c0/1, c2/0, c3/0 carry NO feature -> contribute 0, stay ranked

    def _features(self, spark):
        return spark.createDataFrame(
            [(c, t, f) for (c, t), f in sorted(self.FEATS.items())],
            "conv_id string, turn_idx int, pagerank double",
        )

    def test_saturation_matches_transcription(self, spark, setup):
        from ics_search_engine_spark.operators.funcscore import (
            bm25_topk_rank_feature,
        )

        pidx, _ = setup
        base = {
            (r["conv_id"], r["turn_idx"]): r["score"]
            for r in bm25_topk_packed(
                spark, pidx, "machine learning", k=10
            ).collect()
        }
        got = {
            (r["conv_id"], r["turn_idx"]): r["score"]
            for r in bm25_topk_rank_feature(
                spark, pidx, "machine learning", self._features(spark),
                "pagerank", boost=2.0, fn="saturation", pivot=10.0, k=10,
            ).collect()
        }
        assert set(got) == set(base)
        for d, s in got.items():
            f = self.FEATS.get(d, 0.0)
            expect = base[d] + 2.0 * (f / (f + 10.0))
            assert s == pytest.approx(expect, rel=1e-12)

    def test_missing_feature_scores_plain_bm25(self, spark, setup):
        from ics_search_engine_spark.operators.funcscore import (
            bm25_topk_rank_feature,
        )

        pidx, _ = setup
        base = {
            (r["conv_id"], r["turn_idx"]): r["score"]
            for r in bm25_topk_packed(
                spark, pidx, "machine learning", k=10
            ).collect()
        }
        got = {
            (r["conv_id"], r["turn_idx"]): r["score"]
            for r in bm25_topk_rank_feature(
                spark, pidx, "machine learning", self._features(spark),
                "pagerank", boost=2.0, k=10,
            ).collect()
        }
        unfeat = [d for d in base if d not in self.FEATS]
        assert unfeat, "fixture should leave some docs featureless"
        for d in unfeat:
            assert got[d] == pytest.approx(base[d], rel=1e-15)

    def test_log_and_sigmoid_functions(self, spark):
        import pyspark.sql.functions as F

        from ics_search_engine_spark.operators.funcscore import (
            rank_feature_col,
        )

        df = spark.createDataFrame([(4.0,), (None,)], "f double")
        rows = df.select(
            rank_feature_col(F.col("f"), "log", scaling_factor=1.0)
            .alias("lg"),
            rank_feature_col(
                F.col("f"), "sigmoid", pivot=8.0, exponent=2.0
            ).alias("sg"),
        ).collect()
        assert rows[0]["lg"] == pytest.approx(math.log(5.0), rel=1e-12)
        assert rows[0]["sg"] == pytest.approx(
            16.0 / (16.0 + 64.0), rel=1e-12
        )
        assert rows[1]["lg"] == pytest.approx(0.0, abs=1e-15)
        assert rows[1]["sg"] == 0.0

    def test_unknown_function_raises(self, spark):
        import pyspark.sql.functions as F

        from ics_search_engine_spark.operators.funcscore import (
            rank_feature_col,
        )

        with pytest.raises(ValueError):
            rank_feature_col(F.col("f"), "nope")


class TestDistanceFeature:
    def test_matches_transcription(self, spark, setup):
        from ics_search_engine_spark.operators.funcscore import (
            bm25_topk_distance_feature,
        )

        pidx, attrs = setup
        base = {
            (r["conv_id"], r["turn_idx"]): r["score"]
            for r in bm25_topk_packed(
                spark, pidx, "machine learning", k=10
            ).collect()
        }
        origin = datetime.datetime.fromisoformat("2026-03-01").replace(
            tzinfo=datetime.timezone.utc
        ).timestamp()
        ts_of = {
            (r["conv_id"], r["turn_idx"]): r["ts"]
            .replace(tzinfo=datetime.timezone.utc).timestamp()
            for r in attrs.collect()
        }
        pivot = 14.0 * 86400.0
        got = {
            (r["conv_id"], r["turn_idx"]): r["score"]
            for r in bm25_topk_distance_feature(
                spark, pidx, "machine learning", attrs, "ts",
                origin="2026-03-01", pivot_days=14.0, boost=1.5, k=10,
            ).collect()
        }
        assert set(got) == set(base)
        for d, s in got.items():
            dist = abs(ts_of[d] - origin)
            expect = base[d] + 1.5 * (pivot / (pivot + dist))
            assert s == pytest.approx(expect, rel=1e-12)

    def test_missing_ts_keeps_bm25(self, spark, setup):
        from ics_search_engine_spark.operators.funcscore import (
            bm25_topk_distance_feature,
        )

        pidx, attrs = setup
        # drop c0's doc-values entirely: its docs must keep plain bm25
        part = attrs.filter("conv_id != 'c0'")
        base = {
            (r["conv_id"], r["turn_idx"]): r["score"]
            for r in bm25_topk_packed(
                spark, pidx, "machine learning", k=10
            ).collect()
        }
        got = {
            (r["conv_id"], r["turn_idx"]): r["score"]
            for r in bm25_topk_distance_feature(
                spark, pidx, "machine learning", part, "ts",
                origin="2026-03-01", pivot_days=14.0, boost=1.5, k=10,
            ).collect()
        }
        dropped = [d for d in base if d[0] == "c0"]
        assert dropped
        for d in dropped:
            assert got[d] == pytest.approx(base[d], rel=1e-15)

    def test_pivot_validation(self, spark, setup):
        from ics_search_engine_spark.operators.funcscore import (
            bm25_topk_distance_feature,
        )

        pidx, attrs = setup
        with pytest.raises(ValueError):
            bm25_topk_distance_feature(
                spark, pidx, "machine", attrs, "ts",
                origin="2026-03-01", pivot_days=0.0,
            )
