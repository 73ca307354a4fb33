"""Per-turn text equality under stable (conv_id, turn_idx) ordering —
the input_hint's per-row invariant, asserted directly.

The engine's ingestion transforms (ordinal assignment's range shuffle +
local sort, catalog table I/O) must carry every turn's text through
BYTE-identically, and doc_ord must equal the rank of (conv_id,
turn_idx) — the stable ordering every rank-identity claim sits on."""

from __future__ import annotations

import pyarrow.parquet as pq
import pyspark.sql.functions as F

from ics_search_engine_spark.operators.docmap import assign_doc_ordinals
from ics_search_engine_spark.sources import catalog
from ics_search_engine_spark.sources.transcripts import generate_turns


def test_ingestion_preserves_text_and_order(spark, tmp_path):
    src = str(tmp_path / "t.parquet")
    pq.write_table(generate_turns(120, seed=29), src)
    df = spark.read.parquet(src)
    # splice in hostile text rows: unicode, embedded newlines/tabs,
    # null bytes are not valid in parquet strings but surrogate-free
    # emoji and RTL are — plus empty and whitespace-only
    extra = spark.createDataFrame(
        [
            ("zzz_conv1", 0, "café رسالة \U0001f680"),
            ("zzz_conv1", 1, "line1\nline2\ttabbed  spaced"),
            ("zzz_conv1", 2, ""),
            ("zzz_conv2", 0, "   "),
        ],
        "conv_id string, turn_idx int, text string",
    )
    both = df.select("conv_id", "turn_idx", "text").unionByName(extra)

    with_ord = assign_doc_ordinals(both)
    out = str(tmp_path / "roundtrip")
    catalog.write_table(with_ord, out)
    back = catalog.read_table(spark, out)

    rows = back.select("conv_id", "turn_idx", "text", "doc_ord").collect()
    got = {(r["conv_id"], r["turn_idx"]): r["text"] for r in rows}
    expect = {
        (r["conv_id"], r["turn_idx"]): r["text"] for r in both.collect()
    }
    assert got == expect  # byte-identical text per turn, none lost

    # doc_ord IS the rank of (conv_id, turn_idx): stable ordering
    by_ord = sorted(rows, key=lambda r: r["doc_ord"])
    keys = [(r["conv_id"], r["turn_idx"]) for r in by_ord]
    assert keys == sorted(keys)
    assert [r["doc_ord"] for r in by_ord] == list(range(len(rows)))
