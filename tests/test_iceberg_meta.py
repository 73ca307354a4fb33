"""Pure-Python Iceberg v2 metadata layer (sources/iceberg_meta.py +
sources/avro_io.py): the north_rule's "Iceberg-backed index tables",
finally executed for real in-sandbox.

What interop CAN'T be proven here (no runtime jar, no network — see
tests/test_catalog.py's install-attempt record), these tests pin
instead: Avro container files obey the published spec byte-for-byte
where it is checkable (magic, metadata map, sync markers, raw-deflate
blocks, zig-zag varints), manifests carry the spec's reserved
field-ids and required fields, commits are atomic + optimistic, time
travel reproduces historical file sets exactly, and the WHOLE ENGINE
(build → query → serve) runs on the format with results bit-identical
to the parquet run.
"""

from __future__ import annotations

import glob
import io
import json
import os
import struct
import zlib

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import pyspark.sql.functions as F

from ics_search_engine_spark.sources import avro_io, catalog, iceberg_meta as im


# ---------------------------------------------------------------------------
# avro_io: spec conformance + round trips
# ---------------------------------------------------------------------------

NESTED_SCHEMA = {
    "type": "record",
    "name": "outer",
    "fields": [
        {"name": "s", "type": "string"},
        {"name": "n", "type": ["null", "long"], "default": None},
        {"name": "b", "type": "boolean"},
        {"name": "d", "type": "double"},
        {"name": "raw", "type": "bytes"},
        {
            "name": "arr",
            "type": {
                "type": "array",
                "items": {
                    "type": "record",
                    "name": "kv",
                    "fields": [
                        {"name": "key", "type": "int"},
                        {"name": "value", "type": ["null", "bytes"]},
                    ],
                },
            },
        },
        {"name": "again", "type": ["null", "kv"]},  # named-type reference
    ],
}

RECS = [
    {
        "s": "héllo",
        "n": None,
        "b": True,
        "d": -0.125,
        "raw": b"\x00\xff",
        "arr": [{"key": 1, "value": b"x"}, {"key": -7, "value": None}],
        "again": {"key": 2**40, "value": b""},
    },
    {
        "s": "",
        "n": -(2**62),
        "b": False,
        "d": 1e300,
        "raw": b"",
        "arr": [],
        "again": None,
    },
]


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_avro_round_trip(tmp_path, codec):
    p = str(tmp_path / "t.avro")
    avro_io.write_container(p, NESTED_SCHEMA, RECS, codec=codec,
                            metadata={"content": b"data"})
    schema, recs, meta = avro_io.read_container(p)
    assert recs == RECS
    assert schema == NESTED_SCHEMA
    assert meta["content"] == b"data"
    assert meta["avro.codec"] == codec.encode()


def test_avro_container_spec_layout(tmp_path):
    """Check the container bytes against the published spec directly —
    not through our own reader: magic, file-metadata map with
    avro.schema/avro.codec, 16-byte sync repeated after each block,
    raw-deflate (RFC 1951) block payload."""
    p = str(tmp_path / "t.avro")
    avro_io.write_container(p, NESTED_SCHEMA, RECS)
    raw = open(p, "rb").read()
    assert raw[:4] == b"Obj\x01"
    buf = io.BytesIO(raw[4:])
    n = avro_io._read_long(buf)
    meta = {}
    for _ in range(n):
        k = avro_io._read_bytes(buf).decode()
        meta[k] = avro_io._read_bytes(buf)
    assert avro_io._read_long(buf) == 0
    assert json.loads(meta["avro.schema"]) == NESTED_SCHEMA
    assert meta["avro.codec"] == b"deflate"
    sync = buf.read(16)
    count = avro_io._read_long(buf)
    assert count == len(RECS)
    block = avro_io._read_bytes(buf)
    # RFC-1951 raw deflate: zlib with a negative window decodes it
    zlib.decompressobj(-15).decompress(block)
    assert buf.read(16) == sync  # trailing sync marker
    assert not buf.read(1)  # exactly one block


def test_avro_zigzag_varint_encoding():
    """Spec examples: 0→0x00, -1→0x01, 1→0x02, -2→0x03, 2→0x04;
    and a multi-byte case 64→0x80 0x01."""
    for value, expect in [
        (0, b"\x00"), (-1, b"\x01"), (1, b"\x02"), (-2, b"\x03"),
        (2, b"\x04"), (64, b"\x80\x01"), (-64, b"\x7f"),
    ]:
        out = io.BytesIO()
        avro_io._write_long(out, value)
        assert out.getvalue() == expect, value
        assert avro_io._read_long(io.BytesIO(expect)) == value


def test_avro_corrupt_sync_detected(tmp_path):
    p = str(tmp_path / "t.avro")
    avro_io.write_container(p, NESTED_SCHEMA, RECS)
    raw = bytearray(open(p, "rb").read())
    raw[-1] ^= 0xFF  # flip a byte of the trailing sync marker
    open(p, "wb").write(raw)
    with pytest.raises(ValueError, match="sync"):
        avro_io.read_container(p)


def test_avro_empty_file_round_trip(tmp_path):
    p = str(tmp_path / "e.avro")
    avro_io.write_container(p, NESTED_SCHEMA, [])
    _, recs, _ = avro_io.read_container(p)
    assert recs == []


# ---------------------------------------------------------------------------
# schema + bounds
# ---------------------------------------------------------------------------


def test_schema_from_arrow_field_ids():
    sch = pa.schema(
        [
            ("term", pa.string()),
            ("shard_id", pa.int32()),
            ("doc_ord", pa.int64()),
            ("max_tfn", pa.float64()),
            ("payload", pa.binary()),
            ("emb", pa.list_(pa.float32())),
        ]
    )
    ice = im.schema_from_arrow(sch)
    assert ice["type"] == "struct" and ice["schema-id"] == 0
    ids = [f["id"] for f in ice["fields"]]
    assert ids == [1, 2, 3, 4, 5, 6]  # fresh sequential assignment
    types = [f["type"] for f in ice["fields"][:5]]
    assert types == ["string", "int", "long", "double", "binary"]
    lst = ice["fields"][5]["type"]
    assert lst["type"] == "list" and lst["element"] == "float"
    assert lst["element-id"] == 7  # ids unique across the whole schema
    assert im._last_column_id(ice) == 7


def test_bound_serialization_round_trip():
    cases = [
        ("int", -5), ("long", 2**40), ("float", 0.5), ("double", -1e9),
        ("boolean", True), ("string", "zebra"), ("binary", b"\x00\x01"),
        ("date", 19000), ("timestamp", 1_700_000_000_000_000),
    ]
    for t, v in cases:
        b = im.serialize_bound(t, v)
        assert im.deserialize_bound(t, b) == v, (t, v)
    # little-endian per spec
    assert im.serialize_bound("int", 1) == b"\x01\x00\x00\x00"
    assert im.serialize_bound("long", 1) == b"\x01" + b"\x00" * 7


# ---------------------------------------------------------------------------
# table commits: snapshots, time travel, stats, pruning, atomicity
# ---------------------------------------------------------------------------


def _mk_files(tbl: str, commit: str, tables: list[pa.Table]) -> list[str]:
    d = os.path.join(tbl, "data", commit)
    os.makedirs(d)
    out = []
    for i, t in enumerate(tables):
        p = os.path.join(d, f"part-{i}.parquet")
        pq.write_table(t, p)
        out.append(p)
    return out


@pytest.fixture()
def two_commit_table(tmp_path):
    tbl = str(tmp_path / "tbl")
    t1 = pa.table(
        {"term": ["apple", "box"], "doc_ord": pa.array([1, 2], pa.int64())}
    )
    t2 = pa.table(
        {"term": ["car", "dog"], "doc_ord": pa.array([3, 4], pa.int64())}
    )
    f1 = _mk_files(tbl, "c1", [t1])
    m1 = im.commit(tbl, f1, t1.schema, "append")
    f2 = _mk_files(tbl, "c2", [t2])
    m2 = im.commit(tbl, f2, t2.schema, "append")
    return tbl, f1, f2, m1, m2


def test_append_snapshots_and_time_travel(two_commit_table):
    tbl, f1, f2, m1, m2 = two_commit_table
    cur = im.IcebergMetaTable(tbl)
    assert sorted(cur.file_paths()) == sorted(
        os.path.abspath(p) for p in f1 + f2
    )
    assert cur.record_count() == 4
    old = im.IcebergMetaTable(tbl, snapshot_id=m1["current-snapshot-id"])
    assert old.file_paths() == [os.path.abspath(f1[0])]
    assert old.record_count() == 2
    # sequence numbers strictly increase; parent linkage recorded
    snaps = cur.snapshots
    assert [s["sequence-number"] for s in snaps] == [1, 2]
    assert snaps[1]["parent-snapshot-id"] == snaps[0]["snapshot-id"]
    assert snaps[1]["summary"]["operation"] == "append"
    assert snaps[1]["summary"]["total-records"] == "4"


def test_overwrite_replaces_live_set(two_commit_table):
    tbl, f1, f2, _, _ = two_commit_table
    t3 = pa.table({"term": ["eel"], "doc_ord": pa.array([9], pa.int64())})
    f3 = _mk_files(tbl, "c3", [t3])
    im.commit(tbl, f3, t3.schema, "overwrite")
    cur = im.IcebergMetaTable(tbl)
    assert cur.file_paths() == [os.path.abspath(f3[0])]
    assert cur.record_count() == 1
    assert len(cur.snapshots) == 3  # history retained for time travel
    # stale data files still on disk are NOT read (snapshot isolation)
    assert os.path.exists(f1[0])


def test_manifest_bounds_match_parquet_footers(two_commit_table):
    tbl, f1, _, _, _ = two_commit_table
    cur = im.IcebergMetaTable(tbl)
    info = next(f for f in cur.data_files() if f.path == os.path.abspath(f1[0]))
    term_f = cur._field("term")
    ord_f = cur._field("doc_ord")
    assert im.deserialize_bound("string", info.lower_bounds[term_f["id"]]) == "apple"
    assert im.deserialize_bound("string", info.upper_bounds[term_f["id"]]) == "box"
    assert im.deserialize_bound("long", info.lower_bounds[ord_f["id"]]) == 1
    assert im.deserialize_bound("long", info.upper_bounds[ord_f["id"]]) == 2
    assert info.record_count == 2
    assert info.file_size_in_bytes == os.path.getsize(f1[0])


def test_prune_files_by_bounds(two_commit_table):
    tbl, f1, f2, _, _ = two_commit_table
    cur = im.IcebergMetaTable(tbl)
    kept = cur.prune_files("term", ["car"])
    assert [f.path for f in kept] == [os.path.abspath(f2[0])]
    kept = cur.prune_files("doc_ord", [2, 99])
    assert [f.path for f in kept] == [os.path.abspath(f1[0])]
    assert cur.prune_files("term", ["zzz"]) == []
    # missing bounds must be conservative: a file without bounds for
    # the column is always kept (bounds are optional in the spec)
    cur._files[0].lower_bounds.clear()
    cur._files[0].upper_bounds.clear()
    kept = cur.prune_files("term", ["zzz"])
    assert [f.path for f in kept] == [cur._files[0].path]


def test_commit_is_optimistic_and_atomic(two_commit_table):
    """HadoopTables protocol: the next vN.metadata.json is claimed with
    O_EXCL; a pre-claimed version surfaces as CommitConflict and the
    version hint still points at consistent committed state."""
    tbl, _, _, _, _ = two_commit_table
    meta_dir = os.path.join(tbl, "metadata")
    v = im._read_version_hint(tbl)
    open(os.path.join(meta_dir, f"v{v + 1}.metadata.json"), "w").write("{}")
    t = pa.table({"term": ["x"], "doc_ord": pa.array([1], pa.int64())})
    f = _mk_files(tbl, "c9", [t])
    with pytest.raises(im.CommitConflict):
        im.commit(tbl, f, t.schema, "append")
    assert im._read_version_hint(tbl) == v  # hint untouched by the loser
    assert im.IcebergMetaTable(tbl).record_count() == 4


def test_version_hint_fallback_scan(two_commit_table):
    tbl, _, _, _, _ = two_commit_table
    os.remove(os.path.join(tbl, "metadata", "version-hint.text"))
    assert im._read_version_hint(tbl) == 2  # highest vN wins, like HadoopTables
    assert im.IcebergMetaTable(tbl).record_count() == 4


def test_relocated_table_rebases_paths(two_commit_table, tmp_path):
    tbl, *_ = two_commit_table
    moved = str(tmp_path / "elsewhere")
    os.rename(tbl, moved)
    cur = im.IcebergMetaTable(moved)
    assert cur.record_count() == 4
    assert all(os.path.exists(p) for p in cur.file_paths())


def test_schema_evolution_rejected(two_commit_table):
    tbl, _, _, _, _ = two_commit_table
    t = pa.table({"other": ["x"]})
    f = _mk_files(tbl, "c8", [t])
    with pytest.raises(ValueError, match="schema evolution"):
        im.commit(tbl, f, t.schema, "append")


def test_manifest_spec_field_ids(two_commit_table):
    """The written Avro schemas must carry the spec's reserved
    field-ids — that is what a by-id Iceberg reader resolves on."""
    tbl, _, _, _, _ = two_commit_table
    mlist = glob.glob(os.path.join(tbl, "metadata", "snap-*.avro"))[0]
    schema, _, meta = avro_io.read_container(mlist)
    ids = {f["name"]: f["field-id"] for f in schema["fields"]}
    assert ids["manifest_path"] == 500
    assert ids["manifest_length"] == 501
    assert ids["partition_spec_id"] == 502
    assert ids["added_snapshot_id"] == 503
    assert ids["content"] == 517
    assert ids["sequence_number"] == 515
    assert meta["format-version"] == b"2"

    man = glob.glob(os.path.join(tbl, "metadata", "*-m0.avro"))[0]
    schema, entries, meta = avro_io.read_container(man)
    ids = {f["name"]: f["field-id"] for f in schema["fields"]}
    assert ids == {"status": 0, "snapshot_id": 1, "data_file": 2,
                   "sequence_number": 3, "file_sequence_number": 4}
    df_ids = {
        f["name"]: f["field-id"]
        for f in next(
            f for f in schema["fields"] if f["name"] == "data_file"
        )["type"]["fields"]
    }
    assert df_ids["file_path"] == 100
    assert df_ids["file_format"] == 101
    assert df_ids["partition"] == 102
    assert df_ids["record_count"] == 103
    assert df_ids["file_size_in_bytes"] == 104
    assert df_ids["lower_bounds"] == 125
    assert df_ids["upper_bounds"] == 128
    assert df_ids["content"] == 134
    assert meta["content"] == b"data"
    assert entries and all(e["status"] == im.STATUS_ADDED for e in entries)
    assert all(e["data_file"]["file_format"] == "PARQUET" for e in entries)


def test_table_metadata_json_required_v2_keys(two_commit_table):
    tbl, _, _, _, m2 = two_commit_table
    meta = im.load_metadata(tbl)
    for key in (
        "format-version", "table-uuid", "location", "last-sequence-number",
        "last-updated-ms", "last-column-id", "current-schema-id", "schemas",
        "default-spec-id", "partition-specs", "last-partition-id",
        "default-sort-order-id", "sort-orders", "current-snapshot-id",
        "snapshots", "snapshot-log", "metadata-log",
    ):
        assert key in meta, key
    assert meta["format-version"] == 2
    assert meta["partition-specs"] == [{"spec-id": 0, "fields": []}]
    assert meta["sort-orders"] == [{"order-id": 0, "fields": []}]
    assert len(meta["snapshot-log"]) == 2
    assert len(meta["metadata-log"]) == 1  # prior version linked
    # the metadata file is the committed version (v2) and the snapshot
    # log's last entry is the current snapshot
    assert meta["snapshot-log"][-1]["snapshot-id"] == meta["current-snapshot-id"]


# ---------------------------------------------------------------------------
# catalog + engine integration (SPARK_GRAFT_PATH_FORMAT=iceberg, no jar)
# ---------------------------------------------------------------------------


@pytest.fixture()
def iceberg_fmt(monkeypatch):
    monkeypatch.setenv(catalog.PATH_FORMAT_ENV, "iceberg")


def test_catalog_write_read_iceberg_no_jar(spark, tmp_path, iceberg_fmt):
    df = spark.range(0, 100).select(
        F.concat(F.lit("t"), F.col("id") % 7).alias("term"),
        F.col("id").alias("doc_ord"),
    )
    out = str(tmp_path / "tbl")
    catalog.write_table(df, out, sort_cols=["term"], hash_col="term")
    # real Iceberg v2 directory layout
    assert os.path.isdir(os.path.join(out, "metadata"))
    assert glob.glob(os.path.join(out, "data", "*", "*.parquet"))
    assert catalog.is_iceberg_layout(out)
    meta = im.load_metadata(out)
    assert meta["format-version"] == 2
    back = catalog.read_table(spark, out)
    assert back.count() == 100
    # append adds a snapshot and both writes' rows are visible
    catalog.write_table(df.limit(10), out, mode="append")
    assert catalog.read_table(spark, out).count() == 110
    assert len(im.IcebergMetaTable(out).snapshots) == 2
    # overwrite flips the live set; history remains
    catalog.write_table(df.limit(5), out)
    assert catalog.read_table(spark, out).count() == 5
    assert len(im.IcebergMetaTable(out).snapshots) == 3


def test_catalog_read_ignores_orphan_files(spark, tmp_path, iceberg_fmt):
    """Snapshot isolation: a data file on disk but not in the current
    snapshot's manifests (orphan/stale) must not be read — the exact
    failure mode a naive directory scan of an Iceberg table hits."""
    df = spark.range(0, 10).select(F.col("id").alias("doc_ord"))
    out = str(tmp_path / "tbl")
    catalog.write_table(df, out)
    orphan = pa.table({"doc_ord": pa.array([999], pa.int64())})
    pq.write_table(orphan, os.path.join(out, "data", "orphan.parquet"))
    vals = [r.doc_ord for r in catalog.read_table(spark, out).collect()]
    assert 999 not in vals and len(vals) == 10
    # and the serving-tier reader agrees
    at = catalog.read_arrow_table(out)
    assert 999 not in at.column("doc_ord").to_pylist()


def test_empty_dataframe_commit(spark, tmp_path, iceberg_fmt):
    df = spark.range(0, 0).select(
        F.col("id").alias("doc_ord"),
        F.lit("x").alias("term"),
        F.array(F.lit(0.5)).cast("array<float>").alias("emb"),
    )
    out = str(tmp_path / "empty")
    catalog.write_table(df, out)
    back = catalog.read_table(spark, out)
    assert back.count() == 0
    assert back.columns == ["doc_ord", "term", "emb"]
    assert dict(back.dtypes)["emb"] == "array<float>"


def test_engine_on_iceberg_bit_identical(spark, tmp_path, small_df):
    """The flagship claim: the full engine — packed-index build, Spark
    query path, in-process serving — runs on Iceberg-backed index
    tables with results bit-identical to the parquet run."""
    from ics_search_engine_spark.operators.packed_index import (
        PackedIndex,
        build_packed_index,
    )
    from ics_search_engine_spark.operators.query import bm25_topk_packed
    from ics_search_engine_spark.serving import LocalIndexServer

    tr = small_df.limit(400)
    results = {}
    for fmt in ("parquet", "iceberg"):
        os.environ[catalog.PATH_FORMAT_ENV] = fmt
        try:
            idx_dir = str(tmp_path / f"idx_{fmt}")
            build_packed_index(spark, tr, idx_dir)
            pidx = PackedIndex(spark, idx_dir)
            top = bm25_topk_packed(spark, pidx, "merge sort stream", k=10)
            srv = LocalIndexServer(idx_dir)
            results[fmt] = (
                [(r.conv_id, r.turn_idx, r.score) for r in top.collect()],
                srv.search("merge sort stream", k=10),
                srv.search("merge sort stream", k=10, use_wand=True),
            )
        finally:
            os.environ.pop(catalog.PATH_FORMAT_ENV, None)
    assert results["iceberg"][0] == results["parquet"][0]
    assert results["iceberg"][1] == results["parquet"][1]
    assert results["iceberg"][2] == results["parquet"][2]
    assert results["iceberg"][0]  # non-empty
    # and the index tables really are Iceberg
    assert catalog.is_iceberg_layout(str(tmp_path / "idx_iceberg" / "index"))
    assert not catalog.is_iceberg_layout(str(tmp_path / "idx_parquet" / "index"))


class TestSchemaEvolution:
    def _base(self, tmp_path):
        tbl = str(tmp_path / "evo")
        t1 = pa.table(
            {"term": ["a", "b"], "doc_ord": pa.array([1, 2], pa.int64())}
        )
        f1 = _mk_files(tbl, "c1", [t1])
        m1 = im.commit(tbl, f1, t1.schema, "append")
        return tbl, t1, f1, m1

    def test_add_column_appends_schema_with_fresh_ids(self, tmp_path):
        tbl, t1, f1, m1 = self._base(tmp_path)
        t2 = pa.table(
            {
                "term": ["c"],
                "doc_ord": pa.array([3], pa.int64()),
                "lang": ["en"],
            }
        )
        f2 = _mk_files(tbl, "c2", [t2])
        m2 = im.commit(tbl, f2, t2.schema, "append")
        assert len(m2["schemas"]) == 2
        assert m2["current-schema-id"] == 1
        cur = next(s for s in m2["schemas"] if s["schema-id"] == 1)
        old = next(s for s in m2["schemas"] if s["schema-id"] == 0)
        # existing fields keep their committed ids
        assert [f["id"] for f in cur["fields"][:2]] == [
            f["id"] for f in old["fields"]
        ]
        # the added field gets a FRESH id past the old last-column-id
        assert cur["fields"][2]["id"] == m1["last-column-id"] + 1
        assert cur["fields"][2]["required"] is False
        assert m2["last-column-id"] == m1["last-column-id"] + 1

    def test_old_files_read_null_under_new_schema(self, tmp_path):
        tbl, t1, f1, m1 = self._base(tmp_path)
        t2 = pa.table(
            {
                "term": ["c"],
                "doc_ord": pa.array([3], pa.int64()),
                "lang": ["en"],
            }
        )
        _f2 = _mk_files(tbl, "c2", [t2])
        im.commit(tbl, _f2, t2.schema, "append")
        got = im.IcebergMetaTable(tbl).to_arrow().sort_by("doc_ord")
        assert got.column_names == ["term", "doc_ord", "lang"]
        assert got.column("lang").to_pylist() == [None, None, "en"]
        assert got.column("term").to_pylist() == ["a", "b", "c"]

    def test_time_travel_reads_the_old_shape(self, tmp_path):
        tbl, t1, f1, m1 = self._base(tmp_path)
        t2 = pa.table(
            {
                "term": ["c"],
                "doc_ord": pa.array([3], pa.int64()),
                "lang": ["en"],
            }
        )
        _f2 = _mk_files(tbl, "c2", [t2])
        im.commit(tbl, _f2, t2.schema, "append")
        old = im.IcebergMetaTable(tbl, snapshot_id=m1["current-snapshot-id"])
        got = old.to_arrow()
        assert got.column_names == ["term", "doc_ord"]  # pre-evolution shape
        assert got.num_rows == 2

    def test_rejects_rename_reorder_typechange(self, tmp_path):
        tbl, t1, f1, m1 = self._base(tmp_path)
        bad_rename = pa.table(
            {"word": ["x"], "doc_ord": pa.array([9], pa.int64())}
        )
        with pytest.raises(ValueError, match="ADDITIVE"):
            im.commit(tbl, _mk_files(tbl, "r", [bad_rename]),
                      bad_rename.schema, "append")
        bad_reorder = pa.table(
            {"doc_ord": pa.array([9], pa.int64()), "term": ["x"]}
        )
        with pytest.raises(ValueError, match="ADDITIVE"):
            im.commit(tbl, _mk_files(tbl, "o", [bad_reorder]),
                      bad_reorder.schema, "append")
        bad_type = pa.table(
            {"term": ["x"], "doc_ord": pa.array([9], pa.int32())}
        )
        with pytest.raises(ValueError, match="type change"):
            im.commit(tbl, _mk_files(tbl, "t", [bad_type]),
                      bad_type.schema, "append")

    def test_prune_still_works_across_mixed_schemas(self, tmp_path):
        tbl, t1, f1, m1 = self._base(tmp_path)
        t2 = pa.table(
            {
                "term": ["zebra"],
                "doc_ord": pa.array([30], pa.int64()),
                "lang": ["en"],
            }
        )
        _f2 = _mk_files(tbl, "c2", [t2])
        im.commit(tbl, _f2, t2.schema, "append")
        cur = im.IcebergMetaTable(tbl)
        kept = cur.prune_files("doc_ord", [30])
        assert len(kept) == 1 and kept[0].record_count == 1


# ---------------------------------------------------------------------------
# expire_snapshots: retention, GC reachability, metadata protocol
# ---------------------------------------------------------------------------


class TestExpireSnapshots:
    def _table(self, tmp_path, n_commits=4):
        table = str(tmp_path / "exp_tbl")
        os.makedirs(f"{table}/data", exist_ok=True)
        for i in range(n_commits):
            p = f"{table}/data/f{i}.parquet"
            pq.write_table(
                pa.table({"id": pa.array([i], pa.int64())}), p
            )
            im.commit(
                table, [p], pa.schema([("id", pa.int64())]),
                operation="append",
            )
        return table

    def test_keep_last_drops_and_gc(self, tmp_path):
        table = self._table(tmp_path, 4)
        meta, rep = im.expire_snapshots(table, keep_last=2)
        assert rep["expired_snapshots"] == 2
        assert len(meta["snapshots"]) == 2
        # append lineage: every data file is still reachable from the
        # newest snapshot's carried-forward manifests -> NO data file
        # may be deleted
        assert rep["deleted_data_files"] == 0
        assert rep["deleted_manifest_lists"] == 2
        for i in range(4):
            assert os.path.exists(f"{table}/data/f{i}.parquet")
        # reload honors the new metadata version
        t = im.IcebergMetaTable(table)
        assert t.record_count() == 4
        assert len(t.snapshots) == 2

    def test_overwrite_lineage_gc_deletes_orphans(self, tmp_path):
        table = str(tmp_path / "ow_tbl")
        os.makedirs(f"{table}/data", exist_ok=True)
        schema = pa.schema([("id", pa.int64())])
        for i in range(3):
            p = f"{table}/data/f{i}.parquet"
            pq.write_table(pa.table({"id": pa.array([i], pa.int64())}), p)
            # each OVERWRITE replaces the live set: old files become
            # unreachable once their snapshots expire
            im.commit(table, [p], schema, operation="overwrite")
        meta, rep = im.expire_snapshots(table, keep_last=1)
        assert rep["expired_snapshots"] == 2
        assert rep["deleted_data_files"] == 2
        assert not os.path.exists(f"{table}/data/f0.parquet")
        assert not os.path.exists(f"{table}/data/f1.parquet")
        assert os.path.exists(f"{table}/data/f2.parquet")
        assert im.IcebergMetaTable(table).record_count() == 1

    def test_current_always_retained_and_noop(self, tmp_path):
        table = self._table(tmp_path, 2)
        meta, rep = im.expire_snapshots(table, keep_last=10)
        assert rep["expired_snapshots"] == 0
        meta2, _ = im.expire_snapshots(table, older_than_ms=0)
        assert len(meta2["snapshots"]) == 2  # nothing older than epoch 0

    def test_time_travel_to_expired_snapshot_fails(self, tmp_path):
        table = self._table(tmp_path, 3)
        old = im.IcebergMetaTable(table).snapshots[0]["snapshot-id"]
        im.expire_snapshots(table, keep_last=1)
        with pytest.raises(Exception):
            im.IcebergMetaTable(table, snapshot_id=old)

    def test_validation(self, tmp_path):
        table = self._table(tmp_path, 1)
        with pytest.raises(ValueError):
            im.expire_snapshots(table)
        with pytest.raises(ValueError):
            im.expire_snapshots(table, keep_last=0)
        with pytest.raises(FileNotFoundError):
            im.expire_snapshots(str(tmp_path / "nope"), keep_last=1)
