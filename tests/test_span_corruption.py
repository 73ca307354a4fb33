"""T5 span corruption (datapipe.span_corruption) vs a Python oracle."""

import hashlib
import re

import pytest

from ics_search_engine_spark.operators.datapipe import span_corruption


def md5_32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def py_corrupt(doc_id, text, stride=8, span_len=3, keep_mod=3):
    toks = [
        t for t in re.split(r"[^a-z0-9]+", (text or "").lower())
        if len(t) > 1
    ]
    starts = [
        s for s in range(0, len(toks), stride)
        if md5_32(f"{doc_id}#{s}") % keep_mod == 0
    ]
    sset = set(starts)
    inputs, targets = [], []
    for p, t in enumerate(toks):
        blk = p - p % stride
        if p % stride < span_len and blk in sset:
            if p % stride == 0:
                inputs.append(f"<extra_id_{starts.index(p)}>")
        else:
            inputs.append(t)
    for k, s in enumerate(starts):
        targets.append(f"<extra_id_{k}>")
        targets.extend(toks[s : s + span_len])
    targets.append(f"<extra_id_{len(starts)}>")
    return (
        len(toks), len(starts), " ".join(inputs), " ".join(targets)
    )


TEXTS = [
    (0, "the quick brown fox jumps over the lazy dog and then runs far "
        "away into deep dark woods where nothing ever happens twice "
        "because repetition signals boredom for curious readers"),
    (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi"),
    (2, "short text"),
    (3, ""),
    (4, None),
    (5, "x y z a b c"),  # all len-1 tokens -> empty after filter
]


def test_matches_python_oracle(spark):
    df = spark.createDataFrame(TEXTS, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_tokens, r.n_spans, r.inputs, r.targets)
        for r in span_corruption(df).collect()
    }
    for doc_id, text in TEXTS:
        assert got[doc_id] == py_corrupt(doc_id, text), doc_id


def test_roundtrip_reconstruction(spark):
    """inputs + targets must reconstruct the full token stream: replace
    each <extra_id_k> in inputs by target span k."""
    df = spark.createDataFrame(TEXTS[:2], "doc_id long, text string")
    for r in span_corruption(df).collect():
        spans = {}
        cur = None
        for t in r.targets.split(" "):
            if t.startswith("<extra_id_"):
                cur = t
                spans[cur] = []
            else:
                spans[cur].append(t)
        rebuilt = []
        for t in r.inputs.split(" "):
            rebuilt.extend(spans[t] if t.startswith("<extra_id_") else [t])
        toks = [
            x for x in re.split(
                r"[^a-z0-9]+",
                dict(TEXTS)[r.doc_id].lower(),
            ) if len(x) > 1
        ]
        assert rebuilt == toks


def test_mask_rate_in_expected_band(spark):
    rows = [(i, " ".join(f"tok{j:03d}" for j in range(200)))
            for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = span_corruption(df, stride=8, span_len=3, keep_mod=3).collect()
    total = sum(r.n_tokens for r in out)
    masked = sum(
        r.n_tokens - (len(r.inputs.split(" ")) - r.n_spans) for r in out
    )
    rate = masked / total
    # expectation 3/8/3 = 12.5%; wide deterministic band
    assert 0.08 < rate < 0.17, rate


def test_validation(spark):
    df = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        span_corruption(df, stride=4, span_len=4)
    with pytest.raises(ValueError):
        span_corruption(df, stride=4, span_len=0)
