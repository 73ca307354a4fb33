"""Index lifecycle verbs: snapshots, restore, and aliases.

The ES `_snapshot` / `_aliases` APIs re-expressed over this engine's
LSM segment model.  Segments are IMMUTABLE once their ready marker is
written (operators/segments, streaming ingest), which makes both verbs
metadata operations:

* a **snapshot** pins a segment SET: a manifest recording each
  segment's path and per-file (name, size, checksum).  No data copy by
  default — the files are immutable, so the manifest IS the state (the
  same insight behind Iceberg snapshots; a ``copy=True`` mode
  hard-copies for media that may be reclaimed).  Restore = validate
  the manifest against the files and hand back the pinned path list —
  subsequent upserts/deletes/compactions created NEW segments, so the
  pre-mutation state is still on disk, bit-exact.
* an **alias** maps a stable name to an index (segment-list) target in
  one JSON document; re-pointing is an atomic file replace (os.replace)
  — the ES blue/green alias-swap deploy pattern.

Checksums are md5 (the engine's hash convention) over file bytes;
at petabyte scale the per-file digest would come from the object
store's ETag instead of a local read — the manifest format already
carries it per file, so only `_digest` changes.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil


def _digest(path: str, chunk: int = 1 << 20) -> str:
    h = hashlib.md5()
    with open(path, "rb") as f:
        while True:
            b = f.read(chunk)
            if not b:
                break
            h.update(b)
    return h.hexdigest()


def _walk_files(seg_dir: str) -> list[dict]:
    out = []
    for root, _, files in os.walk(seg_dir):
        for name in sorted(files):
            p = os.path.join(root, name)
            rel = os.path.relpath(p, seg_dir)
            out.append(
                {"rel": rel, "size": os.path.getsize(p), "md5": _digest(p)}
            )
    out.sort(key=lambda d: d["rel"])
    return out


def create_snapshot(
    segment_paths: list[str],
    snap_dir: str,
    label: str = "",
    copy: bool = False,
) -> dict:
    """Pin ``segment_paths`` (age order) into a snapshot manifest under
    ``snap_dir``; with ``copy=True`` the segment trees are hard-copied
    under the snapshot directory and the manifest points at the copies.
    Returns the manifest."""
    os.makedirs(snap_dir, exist_ok=True)
    pinned = []
    for i, seg in enumerate(segment_paths):
        target = seg
        if copy:
            target = os.path.join(snap_dir, f"seg{i:05d}")
            # crash-safe + re-runnable: copy to a temp sibling, then
            # atomic rename; a half-copied tree from a previous crash
            # (no manifest yet) is discarded, never trusted
            tmp_t = target + ".copying"
            for stale in (tmp_t, target):
                if os.path.exists(stale):
                    shutil.rmtree(stale)
            shutil.copytree(seg, tmp_t)
            os.replace(tmp_t, target)
        pinned.append(
            {
                "path": os.path.abspath(target),
                "files": _walk_files(target),
            }
        )
    manifest = {"label": label, "copy": copy, "segments": pinned}
    tmp = os.path.join(snap_dir, "manifest.json.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(snap_dir, "manifest.json"))
    return manifest


class SnapshotCorrupt(RuntimeError):
    pass


def restore_snapshot(snap_dir: str, verify: bool = True) -> list[str]:
    """Validate the snapshot and return its pinned segment paths (age
    order) — feed them to SegmentedIndex / LocalSegmentedServer.
    ``verify=True`` recomputes every file digest and raises
    SnapshotCorrupt on any missing/resized/altered file (never a
    silently-wrong ranking)."""
    with open(os.path.join(snap_dir, "manifest.json")) as f:
        manifest = json.load(f)
    paths = []
    for seg in manifest["segments"]:
        p = seg["path"]
        expected = {rec["rel"] for rec in seg["files"]}
        actual = {
            os.path.relpath(os.path.join(root, name), p)
            for root, _, files in os.walk(p)
            for name in files
        }
        # files ADDED after the snapshot are as corrupting as missing
        # ones: Spark globs the directory, so a foreign parquet part
        # would silently join the "restored" index
        extras = actual - expected
        if extras:
            raise SnapshotCorrupt(
                f"foreign files in pinned segment {p}: {sorted(extras)[:3]}"
            )
        for rec in seg["files"]:
            fp = os.path.join(p, rec["rel"])
            if not os.path.exists(fp):
                raise SnapshotCorrupt(f"missing file: {fp}")
            if os.path.getsize(fp) != rec["size"]:
                raise SnapshotCorrupt(f"size changed: {fp}")
            if verify and _digest(fp) != rec["md5"]:
                raise SnapshotCorrupt(f"checksum mismatch: {fp}")
        paths.append(p)
    return paths


def set_alias(store: str, alias: str, segment_paths: list[str]) -> None:
    """Point ``alias`` at a segment list; atomic replace of the alias
    store (a JSON file), so readers see either the old or the new
    target, never a partial state.  Writers serialize on an advisory
    lock (fcntl on <store>.lock), so concurrent set_alias calls on one
    store cannot drop each other's update (the load-modify-replace
    race); readers never block."""
    def put(aliases):
        aliases[alias] = [os.path.abspath(p) for p in segment_paths]

    _update_aliases(store, put)


def load_aliases(store: str) -> dict[str, list[str]]:
    if not os.path.exists(store):
        return {}
    with open(store) as f:
        return json.load(f)


def resolve_alias(store: str, alias: str) -> list[str]:
    aliases = load_aliases(store)
    if alias not in aliases:
        raise KeyError(f"unknown alias: {alias}")
    return aliases[alias]


def open_pit(sidx) -> list[str]:
    """ES point-in-time (PIT): pin the CURRENT segment set of a
    ``SegmentedIndex`` → an immutable path list.

    Segments are immutable once ready-marked, so a PIT is pure
    metadata: queries built over ``SegmentedIndex(spark, pit)`` keep
    seeing exactly this state — later upserts, deletes, and streamed
    segments land as NEW directories that the pinned list never
    includes (a compaction may REPLACE directories, so hold PITs only
    across query sessions, or snapshot with ``create_snapshot`` for
    durability — a PIT is the zero-copy, zero-validation fast path; a
    snapshot is the checksummed durable form of the same idea).

    Use with scroll (operators/query.scroll_pages): ES requires a PIT
    for consistent deep scrolls for the same reason — each page must
    rank against the same doc set and the same collection stats.
    """
    return [s.path for s in sidx.segments]


def reindex(
    spark,
    transcripts,
    out_dir: str,
    query: str | None = None,
    sidx=None,
    transform=None,
    conjunctive: bool = False,
    **build_kw,
) -> dict:
    """ES ``_reindex``: rebuild documents into a FRESH index with new
    settings, optionally filtered by a search query and rewritten by a
    script → the new index's stats dict.

    ES reindex streams ``_source`` docs from a source index into a
    destination index with its own mappings/settings.  This engine's
    source-of-truth doc store is the transcripts table (the packed
    index stores no text — same reason update_by_query re-reads
    _source), so:

    * ``transcripts`` — the doc store to read from (conv_id, turn_idx,
      text).
    * ``query`` + ``sidx`` — optional source filter: only docs whose
      LIVE version in ``sidx`` matches ``query`` are copied
      (shadow/tombstone-aware via live_matched, so a doc matched only
      by a dead superseded version is not copied).
    * ``transform`` — optional DataFrame → DataFrame script over the
      selected docs (must preserve keys and ``text``, like
      update_by_query).
    * ``**build_kw`` — the DESTINATION settings: range_bits,
      with_positions, stem, index_partitions — the whole point of the
      verb is changing these without touching the source.

    Scale shape: one distributed join (live keys × doc store) plus the
    normal fused single-shuffle packed build; nothing collects on the
    driver.  Contrast with ``compact_segments``, which rewrites the
    SAME settings from the index's own postings without the doc store.
    """
    src = transcripts
    if query is not None:
        if sidx is None:
            raise ValueError("query filter requires sidx (the source index)")
        from ics_search_engine_spark.operators.segments import live_matched

        keys = live_matched(spark, sidx, query, conjunctive=conjunctive)
        # no forced broadcast: a reindex filter can match most of the
        # corpus, so the join strategy is AQE's call (broadcast when the
        # matched-key side turns out small, shuffle join otherwise)
        src = transcripts.join(
            keys.select("conv_id", "turn_idx"), ["conv_id", "turn_idx"]
        )
    if transform is not None:
        src = transform(src)
        missing = [
            c for c in ("conv_id", "turn_idx", "text")
            if c not in src.columns
        ]
        if missing:
            raise ValueError(f"transform dropped required columns: {missing}")
    from ics_search_engine_spark.operators.packed_index import (
        build_packed_index,
    )

    return build_packed_index(spark, src, out_dir, **build_kw)


# ---------------------------------------------------------------- rollover
#
# ES index-lifecycle rollover over the LSM segment model: an "index
# family" is two aliases in one store —
#
#   <name>        the READ alias: every live generation's segments
#   <name>@write  the WRITE alias: the ACTIVE generation's segments
#
# plus a generation counter (<name>@gen).  New segments register into
# both; `rollover` checks the ACTIVE generation against the caller's
# conditions (max_docs / max_segments / max_bytes — the ES trio minus
# max_age, which needs a clock this engine takes as input) and, when
# any is met, atomically resets the write alias to a fresh empty
# generation.  Readers always query the read alias, so a rollover is
# invisible to search — exactly ES's contract, where the rolled-over
# index keeps serving reads while writes move to the new one.
#
# Why this matters at 100 TB: compaction cost grows with generation
# size.  Rollover bounds the segment set that size-tiered compaction
# (operators/segments.pick_compaction) ever has to consider, the same
# role ILM plays for Lucene shards.


def _update_aliases(store: str, fn) -> None:
    """Apply ``fn(aliases_dict)`` under the store's writer lock with an
    atomic replace — the multi-key form of set_alias (one lock, one
    rename, so composite updates like rollover can't interleave)."""
    import fcntl

    lock_path = store + ".lock"
    with open(lock_path, "w") as lock:
        fcntl.flock(lock, fcntl.LOCK_EX)
        try:
            aliases = load_aliases(store)
            fn(aliases)
            tmp = f"{store}.{os.getpid()}.tmp"
            with open(tmp, "w") as f:
                json.dump(aliases, f)
            os.replace(tmp, store)
        finally:
            fcntl.flock(lock, fcntl.LOCK_UN)


def register_segment(store: str, name: str, seg_path: str) -> None:
    """Land a new ready segment in index family ``name``: it becomes
    visible to readers (read alias) AND counts toward the active
    generation's rollover conditions (write alias)."""
    p = os.path.abspath(seg_path)

    def add(aliases):
        for key in (name, f"{name}@write"):
            cur = aliases.setdefault(key, [])
            if p not in cur:
                cur.append(p)
        aliases.setdefault(f"{name}@gen", ["1"])

    _update_aliases(store, add)


def generation_stats(paths: list[str]) -> dict:
    """(n_docs, n_segments, bytes) of a segment-path list, from each
    segment's stats.json + on-disk footprint.  n_docs counts every
    stored doc version (shadowed versions included — they occupy
    compaction work, which is what rollover bounds).  A directory
    without stats.json (a bare metadata drop-in — every engine-built
    segment has one, including delete_by_query's empty tombstones)
    counts 0 docs; its bytes and segment slot still tally — it is
    still compaction work."""
    n_docs = 0
    n_bytes = 0
    for p in paths:
        stats_path = os.path.join(p, "stats.json")
        if os.path.exists(stats_path):
            with open(stats_path) as f:
                n_docs += json.load(f)["n_docs"]
        for d in _walk_files(p):
            n_bytes += d["size"]
    return {"n_docs": n_docs, "n_segments": len(paths), "bytes": n_bytes}


def rollover(
    store: str,
    name: str,
    max_docs: int | None = None,
    max_segments: int | None = None,
    max_bytes: int | None = None,
) -> dict:
    """ES ``_rollover``: evaluate the ACTIVE generation against the
    conditions; when any is met, reset the write alias to an empty new
    generation (read alias untouched) → a report dict::

        {"rolled": bool, "generation": int,
         "conditions": {"max_docs": bool, ...}, "stats": {...}}

    Condition evaluation and the alias swap run under ONE writer lock,
    so two concurrent rollovers cannot both fire on the same
    generation (the second sees the already-reset write alias)."""
    if max_docs is None and max_segments is None and max_bytes is None:
        raise ValueError("rollover needs at least one condition")
    report = {}

    def step(aliases):
        write = aliases.get(f"{name}@write", [])
        gen = int(aliases.get(f"{name}@gen", ["1"])[0])
        stats = generation_stats(write)
        conds = {}
        if max_docs is not None:
            conds["max_docs"] = stats["n_docs"] >= max_docs
        if max_segments is not None:
            conds["max_segments"] = stats["n_segments"] >= max_segments
        if max_bytes is not None:
            conds["max_bytes"] = stats["bytes"] >= max_bytes
        rolled = any(conds.values())
        if rolled:
            aliases[f"{name}@write"] = []
            gen += 1
            aliases[f"{name}@gen"] = [str(gen)]
        report.update(
            rolled=rolled, generation=gen, conditions=conds, stats=stats
        )

    _update_aliases(store, step)
    return report
