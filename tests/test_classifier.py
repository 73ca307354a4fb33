"""Hashed-feature quality classifier (operators/classifier)."""

import numpy as np
import pyspark.sql.functions as F
import pytest

from ics_search_engine_spark.operators.classifier import (
    fit_quality_classifier,
    hashed_features,
    quality_classifier_filter,
    score_quality,
    sigmoid,
)

GOOD = "the quick brown fox jumps over the lazy dog near the river bank"
BAD = "zz9 xq7 kk3 vv1 qq8 jj2 ww4 zz9 xq7 kk3 buy now click here spam"


@pytest.fixture(scope="module")
def labeled(spark):
    rows = []
    for i in range(60):
        rows.append((i, GOOD + f" extra{i % 7}", 1))
    for i in range(60, 120):
        rows.append((i, BAD + f" junk{i % 7}", 0))
    return spark.createDataFrame(rows, "doc_id long, text string, label int")


class TestHashedFeatures:
    def test_l1_normalized_and_deterministic(self, spark):
        df = spark.createDataFrame(
            [(1, "a b a"), (2, "")], "doc_id long, text string"
        )
        out = {r["doc_id"]: r["features"] for r in hashed_features(df, dim=16).collect()}
        assert abs(sum(out[1]) - 1.0) < 1e-12
        assert max(out[1]) == pytest.approx(2 / 3)  # 'a' twice
        assert 2 not in out  # empty doc -> no tokens -> no row
        again = {r["doc_id"]: r["features"] for r in hashed_features(df, dim=16).collect()}
        assert out == again


class TestFitAndScore:
    def test_separates_populations(self, spark, labeled):
        w, b = fit_quality_classifier(labeled, dim=64, iters=150)
        scored = score_quality(labeled, w, b, text_col="text")
        j = scored.join(labeled.select("doc_id", "label"), "doc_id").collect()
        good = [r["score_r6"] for r in j if r["label"] == 1]
        bad = [r["score_r6"] for r in j if r["label"] == 0]
        assert min(good) > max(bad)

    def test_fit_is_deterministic(self, labeled):
        w1, b1 = fit_quality_classifier(labeled, dim=32, iters=50)
        w2, b2 = fit_quality_classifier(labeled, dim=32, iters=50)
        assert np.array_equal(w1, w2) and b1 == b2

    def test_fit_cap_bites(self, labeled):
        w_cap, _ = fit_quality_classifier(labeled, dim=32, iters=50,
                                          max_fit_rows=20)
        w_full, _ = fit_quality_classifier(labeled, dim=32, iters=50)
        assert not np.array_equal(w_cap, w_full)

    def test_score_matches_numpy_model(self, spark):
        """The in-plan dot-product fold must equal the explicit
        features @ w + b computed driver-side."""
        df = spark.createDataFrame(
            [(1, "alpha beta gamma alpha"), (2, "delta epsilon")],
            "doc_id long, text string",
        )
        rng_w = [((i * 37) % 21 - 10) / 10.0 for i in range(32)]
        b = -0.05
        got = {r["doc_id"]: r["score_r6"] for r in score_quality(df, rng_w, b).collect()}
        feats = {r["doc_id"]: np.array(r["features"])
                 for r in hashed_features(df, dim=32).collect()}
        for did, x in feats.items():
            want = round(sigmoid(float(x @ np.array(rng_w)) + b), 6)
            assert got[did] == pytest.approx(want, abs=1e-6)

    def test_empty_doc_scores_sigmoid_bias(self, spark):
        df = spark.createDataFrame([(1, "")], "doc_id long, text string")
        got = score_quality(df, [0.5] * 8, 0.3).collect()[0]["score_r6"]
        assert got == pytest.approx(round(sigmoid(0.3), 6))

    def test_filter_keeps_top_slice(self, spark, labeled):
        w, b = fit_quality_classifier(labeled, dim=64, iters=150)
        kept = quality_classifier_filter(labeled, w, b, threshold=0.5)
        labels = {r["label"] for r in kept.collect()}
        assert labels == {1} and kept.count() == 60

    def test_no_labels_raises(self, spark):
        df = spark.createDataFrame([], "doc_id long, text string, label int")
        with pytest.raises(ValueError, match="no labeled rows"):
            fit_quality_classifier(df, dim=8, iters=5)
