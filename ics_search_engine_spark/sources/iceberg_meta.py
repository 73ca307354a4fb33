"""Apache Iceberg table format v2, metadata layer in pure Python.

The north_rule stores the index in "Iceberg-backed index tables"; this
sandbox has no Iceberg runtime jar and no network, so rounds 1-2 could
only verify the catalog shim's call chains.  This module closes the
gap as far as physics allows: it writes and reads REAL Iceberg v2
table directories — ``metadata/vN.metadata.json``, Avro manifest
lists, Avro manifests with per-file column bounds — implementing the
public table spec (https://iceberg.apache.org/spec/) directly:

* data files are parquet written by Spark (each commit into its own
  ``data/<uuid>/`` directory, so appends never collide);
* :func:`commit` turns those files into a snapshot: per-file stats
  (record count, size, value/null counts, lower/upper bounds, split
  offsets) are lifted from the parquet footers via pyarrow, written
  into a manifest (Avro, field-ids per spec), referenced from a
  manifest list, and committed by writing the next
  ``vN.metadata.json`` with O_EXCL (HadoopTables' optimistic-locking
  protocol) and atomically updating ``version-hint.text``;
* :class:`IcebergMetaTable` reads any snapshot (time travel) back to
  the exact data-file set, with manifest-level partition summaries and
  file-level bound pruning available to the caller.

Spec subset and honest deviations (all documented choices, not bugs):

* format-version 2, unpartitioned spec-0, unsorted order-0 (the
  engine realizes its layout — hash distribution + in-file sort —
  before the write, catalog._layout);
* ``overwrite`` commits reference only the new manifest, i.e. the
  snapshot's live set replaces the table; deleted files are not
  re-listed as DELETED entries (legal: a snapshot's content is
  defined by its manifest list; the audit trail is the snapshot log);
* field-ids follow the spec's reserved assignments for manifests and
  manifest lists, and data-schema field-ids are freshly assigned in
  column order (CREATE TABLE semantics);
* lower/upper bounds are written at full length (the 16-byte
  truncation in reference writers is an optimization, not a
  requirement) using the spec's single-value binary serialization
  (little-endian ints/floats, UTF-8 strings, raw binary);
* position/equality deletes, stats files and branching refs are out
  of scope — the engine's delete story is query-time tombstones +
  compaction (operators/segments.py), which maps to ``overwrite``
  snapshots here.

Interop cannot be proven in-sandbox (no jar to read our files back);
what IS proven by tests: container files obey the Avro spec (the
reader here is schema-driven, not a mirror of the writer's quirks),
field-ids and required fields match the published tables, commits are
atomic and optimistic, time travel returns historical file sets
exactly, and the whole engine runs end-to-end on this format via
``SPARK_GRAFT_PATH_FORMAT=iceberg`` with bit-identical query results.
"""

from __future__ import annotations

import json
import os
import struct
import time
import uuid
from dataclasses import dataclass
from typing import Any

import pyarrow as pa
import pyarrow.parquet as pq

from ics_search_engine_spark.sources import avro_io

# ---------------------------------------------------------------------------
# Iceberg schema (the table's column schema, JSON form)
# ---------------------------------------------------------------------------

_PA_PRIMITIVES: list[tuple[Any, str]] = []


def _arrow_to_iceberg_type(t: pa.DataType) -> Any:
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_int32(t) or pa.types.is_int16(t) or pa.types.is_int8(t):
        return "int"
    if pa.types.is_int64(t):
        return "long"
    if pa.types.is_float32(t):
        return "float"
    if pa.types.is_float64(t):
        return "double"
    if pa.types.is_boolean(t):
        return "boolean"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_date32(t):
        return "date"
    if pa.types.is_timestamp(t):
        return "timestamptz" if t.tz else "timestamp"
    if isinstance(t, pa.Decimal128Type):
        return f"decimal({t.precision}, {t.scale})"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return ("list", t.value_type)  # element type resolved by caller
    raise NotImplementedError(f"no Iceberg mapping for arrow type {t}")


def schema_from_arrow(schema: pa.Schema) -> dict:
    """Fresh field-id assignment over an Arrow schema → Iceberg schema
    JSON (struct).  Nested list element ids continue the sequence, as
    the spec requires ids to be unique within the schema."""
    next_id = 1
    fields = []
    pending_lists: list[tuple[dict, pa.DataType]] = []
    for f in schema:
        ice_t = _arrow_to_iceberg_type(f.type)
        fld = {"id": next_id, "name": f.name, "required": False}
        next_id += 1
        if isinstance(ice_t, tuple):  # list
            pending_lists.append((fld, ice_t[1]))
            fld["type"] = None  # patched below once element ids assigned
        else:
            fld["type"] = ice_t
        fields.append(fld)
    for fld, elem_t in pending_lists:
        elem = _arrow_to_iceberg_type(elem_t)
        if isinstance(elem, tuple):
            raise NotImplementedError("nested lists not needed by the engine")
        fld["type"] = {
            "type": "list",
            "element-id": next_id,
            "element": elem,
            "element-required": False,
        }
        next_id += 1
    return {"type": "struct", "schema-id": 0, "fields": fields}


_ICE_TO_ARROW = {
    "string": pa.string(),
    "int": pa.int32(),
    "long": pa.int64(),
    "float": pa.float32(),
    "double": pa.float64(),
    "boolean": pa.bool_(),
    "binary": pa.binary(),
    "date": pa.date32(),
    "timestamp": pa.timestamp("us"),
    "timestamptz": pa.timestamp("us", tz="UTC"),
}


def arrow_schema_from_iceberg(ice_schema: dict) -> pa.Schema:
    """Iceberg struct schema → Arrow schema (the writer's primitive +
    list subset).  Used by the read path to reconcile files written
    under OLDER schemas: reading with the target schema fills columns
    a file predates with nulls."""
    fields = []
    for f in ice_schema["fields"]:
        t = f["type"]
        if isinstance(t, dict) and t.get("type") == "list":
            at = pa.list_(_ICE_TO_ARROW[t["element"]])
        else:
            at = _ICE_TO_ARROW[t]
        fields.append(pa.field(f["name"], at, nullable=not f["required"]))
    return pa.schema(fields)


def _type_key(t: Any) -> Any:
    """Schema-comparison key for a field type (ignores assigned ids)."""
    if isinstance(t, dict) and t.get("type") == "list":
        return ("list", t["element"])
    return t


def _last_column_id(schema: dict) -> int:
    last = 0
    for f in schema["fields"]:
        last = max(last, f["id"])
        if isinstance(f["type"], dict) and f["type"].get("type") == "list":
            last = max(last, f["type"]["element-id"])
    return last


# spec: single-value binary serialization for bounds
def serialize_bound(ice_type: Any, v: Any) -> bytes | None:
    if v is None:
        return None
    if ice_type == "int" or ice_type == "date":
        return struct.pack("<i", int(v))
    if ice_type == "long":
        return struct.pack("<q", int(v))
    if ice_type == "float":
        return struct.pack("<f", float(v))
    if ice_type == "double":
        return struct.pack("<d", float(v))
    if ice_type == "boolean":
        return b"\x01" if v else b"\x00"
    if ice_type == "string":
        return str(v).encode("utf-8")
    if ice_type == "binary":
        return bytes(v)
    if ice_type in ("timestamp", "timestamptz"):
        # parquet stats give a datetime or int micros
        if isinstance(v, int):
            return struct.pack("<q", v)
        return struct.pack("<q", int(v.timestamp() * 1_000_000))
    return None  # unsupported bound type → omit (legal)


def deserialize_bound(ice_type: Any, b: bytes | None) -> Any:
    if b is None:
        return None
    if ice_type == "int" or ice_type == "date":
        return struct.unpack("<i", b)[0]
    if ice_type == "long":
        return struct.unpack("<q", b)[0]
    if ice_type == "float":
        return struct.unpack("<f", b)[0]
    if ice_type == "double":
        return struct.unpack("<d", b)[0]
    if ice_type == "boolean":
        return b == b"\x01"
    if ice_type == "string":
        return b.decode("utf-8")
    if ice_type in ("timestamp", "timestamptz"):
        return struct.unpack("<q", b)[0]
    return b


# ---------------------------------------------------------------------------
# Avro schemas for manifests and manifest lists (spec v2 tables;
# field-ids are the spec's reserved ids and are authoritative for
# readers — name-based resolution is a fallback in the spec)
# ---------------------------------------------------------------------------


def _opt(t: Any) -> list:
    return ["null", t]


def _f(name: str, fid: int, t: Any, **kw: Any) -> dict:
    d = {"name": name, "type": t, "field-id": fid}
    d.update(kw)
    return d


def _kv_array(name: str, kid: int, vid: int, vtype: Any) -> dict:
    """Iceberg encodes int-keyed maps as arrays of key/value records
    (spec: Avro's map type only supports string keys)."""
    return {
        "type": "array",
        "items": {
            "type": "record",
            "name": name,
            "fields": [
                _f("key", kid, "int"),
                _f("value", vid, vtype),
            ],
        },
        "logicalType": "map",
    }


MANIFEST_ENTRY_SCHEMA: dict = {
    "type": "record",
    "name": "manifest_entry",
    "fields": [
        _f("status", 0, "int"),
        _f("snapshot_id", 1, _opt("long"), default=None),
        _f("sequence_number", 3, _opt("long"), default=None),
        _f("file_sequence_number", 4, _opt("long"), default=None),
        _f(
            "data_file",
            2,
            {
                "type": "record",
                "name": "r2",
                "fields": [
                    _f("content", 134, "int"),
                    _f("file_path", 100, "string"),
                    _f("file_format", 101, "string"),
                    _f(
                        "partition",
                        102,
                        # unpartitioned table: empty struct (spec-0)
                        {"type": "record", "name": "r102", "fields": []},
                    ),
                    _f("record_count", 103, "long"),
                    _f("file_size_in_bytes", 104, "long"),
                    _f("column_sizes", 108, _opt(_kv_array("k117_v118", 117, 118, "long")), default=None),
                    _f("value_counts", 109, _opt(_kv_array("k119_v120", 119, 120, "long")), default=None),
                    _f("null_value_counts", 110, _opt(_kv_array("k121_v122", 121, 122, "long")), default=None),
                    _f("nan_value_counts", 137, _opt(_kv_array("k138_v139", 138, 139, "long")), default=None),
                    _f("lower_bounds", 125, _opt(_kv_array("k126_v127", 126, 127, "bytes")), default=None),
                    _f("upper_bounds", 128, _opt(_kv_array("k129_v130", 129, 130, "bytes")), default=None),
                    _f("key_metadata", 131, _opt("bytes"), default=None),
                    _f("split_offsets", 132, _opt({"type": "array", "items": "long", "element-id": 133}), default=None),
                    _f("equality_ids", 135, _opt({"type": "array", "items": "int", "element-id": 136}), default=None),
                    _f("sort_order_id", 140, _opt("int"), default=None),
                ],
            },
        ),
    ],
}

MANIFEST_LIST_SCHEMA: dict = {
    "type": "record",
    "name": "manifest_file",
    "fields": [
        _f("manifest_path", 500, "string"),
        _f("manifest_length", 501, "long"),
        _f("partition_spec_id", 502, "int"),
        _f("content", 517, "int"),
        _f("sequence_number", 515, "long"),
        _f("min_sequence_number", 516, "long"),
        _f("added_snapshot_id", 503, "long"),
        _f("added_files_count", 504, "int"),
        _f("existing_files_count", 505, "int"),
        _f("deleted_files_count", 506, "int"),
        _f("added_rows_count", 512, "long"),
        _f("existing_rows_count", 513, "long"),
        _f("deleted_rows_count", 514, "long"),
        _f(
            "partitions",
            507,
            _opt(
                {
                    "type": "array",
                    "items": {
                        "type": "record",
                        "name": "r508",
                        "fields": [
                            _f("contains_null", 509, "boolean"),
                            _f("contains_nan", 518, _opt("boolean"), default=None),
                            _f("lower_bound", 510, _opt("bytes"), default=None),
                            _f("upper_bound", 511, _opt("bytes"), default=None),
                        ],
                    },
                    "element-id": 508,
                }
            ),
            default=None,
        ),
        _f("key_metadata", 519, _opt("bytes"), default=None),
    ],
}

# manifest_entry.status
STATUS_EXISTING, STATUS_ADDED, STATUS_DELETED = 0, 1, 2


class CommitConflict(RuntimeError):
    """The optimistic O_EXCL commit lost to a concurrent writer."""


# ---------------------------------------------------------------------------
# parquet footer → data_file stats
# ---------------------------------------------------------------------------


def _file_stats(path: str, ice_schema: dict) -> dict:
    """Lift an Iceberg data_file record's stats from a parquet footer.
    Bounds come from row-group min/max (only when every row group has
    them); counts/sizes aggregate across row groups.  Nested columns
    (the engine has none in its index tables) are skipped for stats
    but the file still carries record_count/size."""
    md = pq.ParquetFile(path).metadata
    by_name = {f["name"]: f for f in ice_schema["fields"]}
    col_sizes: dict[int, int] = {}
    val_counts: dict[int, int] = {}
    null_counts: dict[int, int] = {}
    lowers: dict[int, bytes] = {}
    uppers: dict[int, bytes] = {}
    split_offsets: list[int] = []

    # map flat parquet leaf columns to top-level iceberg fields
    no_bounds: set[int] = set()
    for rg_i in range(md.num_row_groups):
        rg = md.row_group(rg_i)
        split_offsets.append(rg.column(0).file_offset if rg.num_columns else 4)
        for c_i in range(rg.num_columns):
            col = rg.column(c_i)
            name = col.path_in_schema.split(".")[0]
            fld = by_name.get(name)
            if fld is None or not isinstance(fld["type"], str):
                continue  # nested/list column → no per-column stats
            fid = fld["id"]
            col_sizes[fid] = col_sizes.get(fid, 0) + col.total_compressed_size
            val_counts[fid] = val_counts.get(fid, 0) + col.num_values
            st = col.statistics
            if st is None or not st.has_min_max:
                # a bound must cover EVERY row group or be omitted
                no_bounds.add(fid)
                lowers.pop(fid, None)
                uppers.pop(fid, None)
                continue
            if fid in no_bounds:
                continue
            if st.null_count is not None:
                null_counts[fid] = null_counts.get(fid, 0) + st.null_count
            lo = serialize_bound(fld["type"], st.min)
            hi = serialize_bound(fld["type"], st.max)
            if lo is None or hi is None:
                continue
            if fid not in lowers or _bound_lt(fld["type"], lo, lowers[fid]):
                lowers[fid] = lo
            if fid not in uppers or _bound_lt(fld["type"], uppers[fid], hi):
                uppers[fid] = hi

    def kv(d: dict[int, Any]) -> list[dict] | None:
        return [{"key": k, "value": v} for k, v in sorted(d.items())] or None

    return {
        "content": 0,
        "file_path": os.path.abspath(path),
        "file_format": "PARQUET",
        "partition": {},
        "record_count": md.num_rows,
        "file_size_in_bytes": os.path.getsize(path),
        "column_sizes": kv(col_sizes),
        "value_counts": kv(val_counts),
        "null_value_counts": kv(null_counts),
        "nan_value_counts": None,
        "lower_bounds": kv(lowers),
        "upper_bounds": kv(uppers),
        "key_metadata": None,
        "split_offsets": sorted(split_offsets) or None,
        "equality_ids": None,
        "sort_order_id": 0,
    }


def _bound_lt(ice_type: Any, a: bytes, b: bytes) -> bool:
    return deserialize_bound(ice_type, a) < deserialize_bound(ice_type, b)


# ---------------------------------------------------------------------------
# commit protocol (HadoopTables: vN.metadata.json + version-hint.text)
# ---------------------------------------------------------------------------


def _meta_dir(table: str) -> str:
    return os.path.join(table, "metadata")


def _now_ms() -> int:
    return int(time.time() * 1000)


def _read_version_hint(table: str) -> int:
    hint = os.path.join(_meta_dir(table), "version-hint.text")
    try:
        with open(hint) as f:
            return int(f.read().strip())
    except (FileNotFoundError, ValueError):
        # fall back to scanning, like HadoopTableOperations
        best = 0
        if os.path.isdir(_meta_dir(table)):
            for fn in os.listdir(_meta_dir(table)):
                if fn.startswith("v") and fn.endswith(".metadata.json"):
                    try:
                        best = max(best, int(fn[1:].split(".")[0]))
                    except ValueError:
                        pass
        return best


def load_metadata(table: str) -> dict | None:
    v = _read_version_hint(table)
    if v == 0:
        return None
    with open(os.path.join(_meta_dir(table), f"v{v}.metadata.json")) as f:
        return json.load(f)


def commit(
    table: str,
    data_files: list[str],
    arrow_schema: pa.Schema,
    operation: str = "append",
    properties: dict[str, str] | None = None,
) -> dict:
    """Commit ``data_files`` (parquet, already under ``table``) as a
    new snapshot.  ``operation`` is "append" (prior manifests carried
    forward) or "overwrite" (new manifest only — the live set is
    replaced).  Returns the new table metadata dict."""
    if operation not in ("append", "overwrite"):
        raise ValueError(f"operation must be append|overwrite: {operation}")
    os.makedirs(_meta_dir(table), exist_ok=True)

    prev = load_metadata(table)
    ice_schema = schema_from_arrow(arrow_schema)
    all_schemas = [ice_schema]
    if prev is not None:
        cur = next(
            s for s in prev["schemas"] if s["schema-id"] == prev["current-schema-id"]
        )
        cur_names = [f["name"] for f in cur["fields"]]
        new_names = [f["name"] for f in ice_schema["fields"]]
        # existing columns must keep their exact types (type promotion
        # is out of scope for this writer — loud, not silent)
        cur_types = {f["name"]: _type_key(f["type"]) for f in cur["fields"]}
        for f in ice_schema["fields"]:
            if f["name"] in cur_types and _type_key(f["type"]) != cur_types[f["name"]]:
                raise ValueError(
                    f"type change on column {f['name']!r} is out of scope "
                    f"for this writer: {cur_types[f['name']]} vs "
                    f"{_type_key(f['type'])}"
                )
        if new_names == cur_names:
            ice_schema = cur  # keep the committed field-ids stable
            all_schemas = prev["schemas"]
        elif new_names[: len(cur_names)] == cur_names:
            # ADDITIVE schema evolution (the Iceberg add-column verb):
            # existing fields keep their committed ids; appended fields
            # get fresh ids after last-column-id; added columns are
            # optional by spec (old files have no values for them).
            next_id = prev["last-column-id"] + 1
            added = []
            for f in ice_schema["fields"][len(cur_names):]:
                nf = dict(f)
                nf["id"] = next_id
                nf["required"] = False
                next_id += 1
                if isinstance(nf["type"], dict):  # list: fresh element id
                    nt = dict(nf["type"])
                    nt["element-id"] = next_id
                    next_id += 1
                    nf["type"] = nt
                added.append(nf)
            ice_schema = {
                "type": "struct",
                "schema-id": max(s["schema-id"] for s in prev["schemas"]) + 1,
                "fields": list(cur["fields"]) + added,
            }
            all_schemas = prev["schemas"] + [ice_schema]
        else:
            raise ValueError(
                "only ADDITIVE schema evolution is supported (drop/"
                f"rename/reorder are out of scope): {cur_names} vs "
                f"{new_names}"
            )

    seq = (prev["last-sequence-number"] + 1) if prev else 1
    snap_id = int.from_bytes(os.urandom(8), "big") >> 1  # positive long
    commit_uuid = str(uuid.uuid4())

    # ---- manifest ----
    entries = []
    added_rows = 0
    for fp in data_files:
        df_rec = _file_stats(fp, ice_schema)
        added_rows += df_rec["record_count"]
        entries.append(
            {
                "status": STATUS_ADDED,
                "snapshot_id": snap_id,
                "sequence_number": None,  # inherited from the manifest list
                "file_sequence_number": None,
                "data_file": df_rec,
            }
        )
    manifest_path = os.path.join(_meta_dir(table), f"{commit_uuid}-m0.avro")
    avro_io.write_container(
        manifest_path,
        MANIFEST_ENTRY_SCHEMA,
        entries,
        metadata={
            "schema": json.dumps(ice_schema).encode(),
            "schema-id": str(ice_schema["schema-id"]).encode(),
            "partition-spec": json.dumps([]).encode(),
            "partition-spec-id": b"0",
            "format-version": b"2",
            "content": b"data",
        },
    )

    new_manifest = {
        "manifest_path": os.path.abspath(manifest_path),
        "manifest_length": os.path.getsize(manifest_path),
        "partition_spec_id": 0,
        "content": 0,
        "sequence_number": seq,
        "min_sequence_number": seq,
        "added_snapshot_id": snap_id,
        "added_files_count": len(entries),
        "existing_files_count": 0,
        "deleted_files_count": 0,
        "added_rows_count": added_rows,
        "existing_rows_count": 0,
        "deleted_rows_count": 0,
        "partitions": [],  # unpartitioned: no summary fields
        "key_metadata": None,
    }
    manifests = [new_manifest]
    if operation == "append" and prev is not None and prev.get("current-snapshot-id"):
        manifests += _read_manifest_list_records(_current_manifest_list(prev))

    mlist_path = os.path.join(
        _meta_dir(table), f"snap-{snap_id}-1-{commit_uuid}.avro"
    )
    avro_io.write_container(
        mlist_path,
        MANIFEST_LIST_SCHEMA,
        manifests,
        metadata={
            "snapshot-id": str(snap_id).encode(),
            "sequence-number": str(seq).encode(),
            "parent-snapshot-id": str(
                prev.get("current-snapshot-id") if prev else None
            ).encode(),
            "format-version": b"2",
        },
    )

    # ---- table metadata ----
    total_rows = added_rows
    total_files = len(entries)
    if operation == "append":
        for m in manifests[1:]:
            total_rows += m["added_rows_count"] + m["existing_rows_count"]
            total_files += m["added_files_count"] + m["existing_files_count"]
    snapshot = {
        "snapshot-id": snap_id,
        **(
            {"parent-snapshot-id": prev["current-snapshot-id"]}
            if prev and prev.get("current-snapshot-id")
            else {}
        ),
        "sequence-number": seq,
        "timestamp-ms": _now_ms(),
        "manifest-list": os.path.abspath(mlist_path),
        "summary": {
            "operation": operation,
            "added-data-files": str(len(entries)),
            "added-records": str(added_rows),
            "total-records": str(total_rows),
            "total-data-files": str(total_files),
        },
        "schema-id": ice_schema["schema-id"],
    }
    meta = {
        "format-version": 2,
        "table-uuid": prev["table-uuid"] if prev else str(uuid.uuid4()),
        "location": os.path.abspath(table),
        "last-sequence-number": seq,
        "last-updated-ms": _now_ms(),
        "last-column-id": max(_last_column_id(s) for s in all_schemas),
        "current-schema-id": ice_schema["schema-id"],
        "schemas": all_schemas,
        "default-spec-id": 0,
        "partition-specs": [{"spec-id": 0, "fields": []}],
        "last-partition-id": 999,  # spec: partition field ids start at 1000
        "default-sort-order-id": 0,
        "sort-orders": [{"order-id": 0, "fields": []}],
        "properties": {
            "write.format.default": "parquet",
            **(prev.get("properties", {}) if prev else {}),
            **(properties or {}),
        },
        "current-snapshot-id": snap_id,
        "snapshots": (prev["snapshots"] if prev else []) + [snapshot],
        "snapshot-log": (prev.get("snapshot-log", []) if prev else [])
        + [{"timestamp-ms": snapshot["timestamp-ms"], "snapshot-id": snap_id}],
        "metadata-log": (prev.get("metadata-log", []) if prev else []),
    }

    # optimistic commit: O_EXCL on the next version file; a concurrent
    # writer that claimed it forces a retry on fresh state
    version = _read_version_hint(table) + 1
    if prev is not None:
        meta["metadata-log"] = meta["metadata-log"] + [
            {
                "timestamp-ms": prev["last-updated-ms"],
                "metadata-file": os.path.join(
                    _meta_dir(table), f"v{version - 1}.metadata.json"
                ),
            }
        ]
    target = os.path.join(_meta_dir(table), f"v{version}.metadata.json")
    try:
        fd = os.open(target, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    except FileExistsError:
        raise CommitConflict(
            f"{target} was claimed by a concurrent commit; retry on "
            "fresh table state"
        ) from None
    with os.fdopen(fd, "w") as f:
        json.dump(meta, f, indent=1)
    hint_tmp = os.path.join(_meta_dir(table), ".version-hint.text.tmp")
    with open(hint_tmp, "w") as f:
        f.write(str(version))
    os.replace(hint_tmp, os.path.join(_meta_dir(table), "version-hint.text"))
    return meta


def _current_manifest_list(meta: dict) -> str:
    snap = next(
        s for s in meta["snapshots"] if s["snapshot-id"] == meta["current-snapshot-id"]
    )
    return snap["manifest-list"]


def _rebase(path: str, table: str) -> str:
    """Manifests store absolute paths; if the table moved, rebase onto
    the current location (standard relocation trick)."""
    if os.path.exists(path):
        return path
    for anchor in ("/metadata/", "/data/"):
        if anchor in path:
            return os.path.join(table, anchor.strip("/"), path.split(anchor, 1)[1])
    return path


def _read_manifest_list_records(path: str, table: str | None = None) -> list[dict]:
    if table is not None:
        path = _rebase(path, table)
    _, records, _ = avro_io.read_container(path)
    return records


# ---------------------------------------------------------------------------
# reader
# ---------------------------------------------------------------------------


def _kv_to_dict(kv: list[dict] | None) -> dict[int, Any]:
    return {e["key"]: e["value"] for e in kv} if kv else {}


@dataclass
class DataFileInfo:
    path: str
    record_count: int
    file_size_in_bytes: int
    lower_bounds: dict[int, bytes]
    upper_bounds: dict[int, bytes]
    null_value_counts: dict[int, int]
    sequence_number: int


class IcebergMetaTable:
    """Read-side of the table format: snapshot → manifest list →
    manifests → live data files, with optional time travel and
    file-level min/max pruning."""

    def __init__(self, table: str, snapshot_id: int | None = None):
        self.table = table
        meta = load_metadata(table)
        if meta is None:
            raise FileNotFoundError(f"{table}: no Iceberg metadata")
        if meta.get("format-version") != 2:
            raise NotImplementedError(
                f"only format-version 2 supported, got {meta.get('format-version')}"
            )
        self.metadata = meta

        def _schema_by_id(schema_id: int) -> dict:
            return next(
                s for s in meta["schemas"] if s["schema-id"] == schema_id
            )

        self.schema = _schema_by_id(meta["current-schema-id"])
        sid = snapshot_id if snapshot_id is not None else meta.get("current-snapshot-id")
        if sid is None:
            self.snapshot = None
            self._files: list[DataFileInfo] = []
            return
        try:
            self.snapshot = next(
                s for s in meta["snapshots"] if s["snapshot-id"] == sid
            )
        except StopIteration:
            raise ValueError(f"snapshot {sid} not in {table}") from None
        # time travel reads the table AS IT WAS: the snapshot's own
        # schema (spec: snapshot.schema-id), not the current one
        if self.snapshot.get("schema-id") is not None:
            self.schema = _schema_by_id(self.snapshot["schema-id"])
        self._files = self._load_files()

    @property
    def snapshots(self) -> list[dict]:
        return self.metadata["snapshots"]

    def _load_files(self) -> list[DataFileInfo]:
        out: list[DataFileInfo] = []
        mlist = _rebase(self.snapshot["manifest-list"], self.table)
        for mf in _read_manifest_list_records(mlist):
            mpath = _rebase(mf["manifest_path"], self.table)
            _, entries, _ = avro_io.read_container(mpath)
            for e in entries:
                if e["status"] == STATUS_DELETED:
                    continue
                df = e["data_file"]
                seq = e["sequence_number"]
                if seq is None:  # inherited from the manifest (spec)
                    seq = mf["sequence_number"]
                out.append(
                    DataFileInfo(
                        path=_rebase(df["file_path"], self.table),
                        record_count=df["record_count"],
                        file_size_in_bytes=df["file_size_in_bytes"],
                        lower_bounds=_kv_to_dict(df.get("lower_bounds")),
                        upper_bounds=_kv_to_dict(df.get("upper_bounds")),
                        null_value_counts=_kv_to_dict(df.get("null_value_counts")),
                        sequence_number=seq,
                    )
                )
        return out

    def data_files(self) -> list[DataFileInfo]:
        return list(self._files)

    def file_paths(self) -> list[str]:
        return [f.path for f in self._files]

    def record_count(self) -> int:
        return sum(f.record_count for f in self._files)

    def _field(self, name: str) -> dict:
        for f in self.schema["fields"]:
            if f["name"] == name:
                return f
        raise KeyError(name)

    def prune_files(self, column: str, values: list[Any]) -> list[DataFileInfo]:
        """File-level pruning for an IN/equality predicate: keep files
        whose [lower, upper] bound range could contain any of the
        values; files without bounds for the column are kept (bounds
        are optional in the spec, absence means 'unknown')."""
        fld = self._field(column)
        if not isinstance(fld["type"], str):
            return list(self._files)
        fid, t = fld["id"], fld["type"]
        kept = []
        for f in self._files:
            lo, hi = f.lower_bounds.get(fid), f.upper_bounds.get(fid)
            if lo is None or hi is None:
                kept.append(f)
                continue
            lov, hiv = deserialize_bound(t, lo), deserialize_bound(t, hi)
            if any(lov <= v <= hiv for v in values):
                kept.append(f)
        return kept

    def to_arrow(self, columns: list[str] | None = None) -> pa.Table:
        """Materialize the snapshot with pyarrow — the serving tier's
        read path when the artifacts are Iceberg tables."""
        paths = self.file_paths()
        target = arrow_schema_from_iceberg(self.schema)
        if not paths:
            # empty snapshot: an empty table with the snapshot's schema
            return target.empty_table()
        import pyarrow.dataset as ds

        # reading with the snapshot's schema reconciles files written
        # under OLDER schemas: columns a file predates come back null
        # (name-based reconciliation is exact here because this writer
        # only ever evolves schemas additively — no renames)
        return ds.dataset(paths, format="parquet", schema=target).to_table(
            columns=columns
        )


def expire_snapshots(
    table: str,
    keep_last: int | None = None,
    older_than_ms: int | None = None,
    delete_files: bool = True,
) -> tuple[dict, dict]:
    """Iceberg snapshot expiration (the ``expireSnapshots`` table
    maintenance verb): drop snapshots outside the retention policy
    from table metadata and physically delete every file reachable
    ONLY from dropped snapshots — data files, manifests, and the
    dropped snapshots' manifest lists.  The current snapshot is always
    retained (spec behavior).  Policy: ``keep_last=N`` retains the N
    most recent snapshots; ``older_than_ms`` retains snapshots at or
    after the cutoff; giving both retains the union.

    Reachability is computed from the RETAINED snapshots' manifest
    lists, so a file shared by an expired and a live snapshot (the
    normal append-lineage case) is never touched — the same GC rule
    real Iceberg applies.  Publishes a new metadata version through
    the same O_EXCL + version-hint protocol as ``commit`` (concurrent
    writers raise CommitConflict, never corrupt).

    Returns (new_metadata, report) where report counts dropped
    snapshots and deleted data/manifest files."""
    if keep_last is None and older_than_ms is None:
        raise ValueError("need keep_last and/or older_than_ms")
    if keep_last is not None and keep_last < 1:
        raise ValueError(f"keep_last={keep_last} must be >= 1")
    meta = load_metadata(table)
    if meta is None:
        raise FileNotFoundError(f"no Iceberg metadata under {table}")
    snaps = meta["snapshots"]
    retained_ids = {meta["current-snapshot-id"]}
    if keep_last is not None:
        retained_ids.update(s["snapshot-id"] for s in snaps[-keep_last:])
    if older_than_ms is not None:
        retained_ids.update(
            s["snapshot-id"] for s in snaps
            if s["timestamp-ms"] >= older_than_ms
        )
    expired = [s for s in snaps if s["snapshot-id"] not in retained_ids]
    report = {
        "expired_snapshots": len(expired),
        "deleted_data_files": 0,
        "deleted_manifests": 0,
        "deleted_manifest_lists": 0,
    }
    if not expired:
        return meta, report

    def _snapshot_files(snap: dict) -> tuple[set, set]:
        mlist = _rebase(snap["manifest-list"], table)
        manifests = set()
        data = set()
        for rec in _read_manifest_list_records(mlist, table):
            mpath = _rebase(rec["manifest_path"], table)
            manifests.add(os.path.abspath(mpath))
            for fi in _read_manifest_data_files(mpath, table):
                data.add(os.path.abspath(fi))
        return manifests, data

    live_manifests: set = set()
    live_data: set = set()
    for s in snaps:
        if s["snapshot-id"] in retained_ids:
            m, d = _snapshot_files(s)
            live_manifests |= m
            live_data |= d
    dead_manifests: set = set()
    dead_data: set = set()
    for s in expired:
        m, d = _snapshot_files(s)
        dead_manifests |= m - live_manifests
        dead_data |= d - live_data

    if delete_files:
        for p in sorted(dead_data):
            if os.path.exists(p):
                os.remove(p)
                report["deleted_data_files"] += 1
        for p in sorted(dead_manifests):
            if os.path.exists(p):
                os.remove(p)
                report["deleted_manifests"] += 1
        for s in expired:
            p = _rebase(s["manifest-list"], table)
            if os.path.exists(p):
                os.remove(p)
                report["deleted_manifest_lists"] += 1

    new_meta = dict(meta)
    new_meta["snapshots"] = [
        s for s in snaps if s["snapshot-id"] in retained_ids
    ]
    new_meta["snapshot-log"] = [
        e for e in meta.get("snapshot-log", [])
        if e["snapshot-id"] in retained_ids
    ]
    new_meta["last-updated-ms"] = _now_ms()
    version = _read_version_hint(table) + 1
    new_meta["metadata-log"] = meta.get("metadata-log", []) + [
        {
            "timestamp-ms": meta["last-updated-ms"],
            "metadata-file": os.path.join(
                _meta_dir(table), f"v{version - 1}.metadata.json"
            ),
        }
    ]
    target = os.path.join(_meta_dir(table), f"v{version}.metadata.json")
    try:
        fd = os.open(target, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    except FileExistsError:
        raise CommitConflict(
            f"{target} was claimed by a concurrent commit; retry on "
            "fresh table state"
        ) from None
    with os.fdopen(fd, "w") as f:
        json.dump(new_meta, f, indent=1)
    hint_tmp = os.path.join(_meta_dir(table), ".version-hint.text.tmp")
    with open(hint_tmp, "w") as f:
        f.write(str(version))
    os.replace(hint_tmp, os.path.join(_meta_dir(table), "version-hint.text"))
    return new_meta, report


def _read_manifest_data_files(mpath: str, table: str) -> list[str]:
    """All data-file paths a manifest references, ANY entry status —
    the conservative reachability set for GC (a DELETED-status entry
    still names a path; treating it as referenced can only retain too
    much, never delete a live file)."""
    _, entries, _ = avro_io.read_container(mpath)
    return [_rebase(e["data_file"]["file_path"], table) for e in entries]
