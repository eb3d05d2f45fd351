"""Point-in-time (PIT) readers.

Reference: ``action/search/CreatePitAction`` + ``search/internal/
PitReaderContext.java`` — ``POST /<index>/_search/point_in_time`` returns a
``pit_id`` that pins the index reader (segment set + liveDocs generation)
so every search presenting that id sees the index exactly as of open time,
while concurrent writes and deletes keep landing in the live view. The
reference keeps the Lucene reader refcounted open; clients page with
``search_after`` against the frozen view and eventually delete the PIT.

Spark-first re-expression: the engine's segment tree is write-once parquet
(immutable by construction), so the only MUTABLE reader state is the
liveDocs generation — the append-only tombstone files under
``<index>/deletes/``. A PIT handle therefore needs to pin exactly two
things: the index path and the *sorted list of delete files present at
open time*. ``PitIndex`` overrides ``InvertedIndex._delete_sources`` to
read only that pinned file set, making later ``delete_docs`` appends
invisible — no refcounting, no copy, zero storage cost per PIT (the
reference's keep-alive/expiry becomes irrelevant: parquet files are never
rewritten, only appended next to).

The handle serializes to JSON (like the reference's opaque base64
``pit_id``), so it survives driver restarts and can be shipped between
sessions — stronger than the reference, whose PITs die with the node.
"""

from __future__ import annotations

import hashlib
import json
import os
from dataclasses import dataclass

from opensearch_spark.index.build import InvertedIndex


def _delete_files(index_path: str) -> tuple[str, ...]:
    """Sorted parquet data files currently under <index>/deletes/."""
    ddir = os.path.join(index_path, "deletes")
    if not os.path.isdir(ddir):
        return ()
    return tuple(sorted(
        os.path.join(ddir, f) for f in os.listdir(ddir)
        if f.endswith(".parquet") and not f.startswith(("_", "."))))


def _index_build_id(index_path: str) -> str | None:
    meta_path = os.path.join(index_path, "meta.json")
    try:
        with open(meta_path) as f:
            return json.load(f).get("build_id")
    except (OSError, ValueError):
        return None


@dataclass(frozen=True)
class PointInTime:
    """Opaque PIT handle: (index path, pinned tombstone-file set, the
    index GENERATION it was opened against).

    ``pit_id`` is content-derived (sha256 of the path + build_id + the
    pinned file list), so it is deterministic for tests and two opens at
    the same generation share an id — handles are value objects
    identifying a GENERATION, not registry keys per open (the reference
    mints a fresh id per open because it must refcount a live Lucene
    reader; nothing here needs closing).

    ``build_id`` guards the frozen-view contract against IN-PLACE index
    rewrites: the immutability premise holds for appends (deletes,
    new segments) but ``merge_segments`` overwrites docs/postings in
    place, minting a fresh meta build_id — a PIT opened before such a
    refresh must fail LOUDLY, not silently serve post-merge data with
    pre-merge stats (round-4 review; the reference analog is a deleted
    PIT context: 'point in time has expired')."""

    index_path: str
    delete_files: tuple[str, ...]
    pit_id: str
    build_id: str | None = None

    def to_json(self) -> str:
        return json.dumps({"index_path": self.index_path,
                           "delete_files": list(self.delete_files),
                           "pit_id": self.pit_id,
                           "build_id": self.build_id})

    @staticmethod
    def from_json(s: str) -> "PointInTime":
        d = json.loads(s)
        return PointInTime(d["index_path"], tuple(d["delete_files"]),
                           d["pit_id"], d.get("build_id"))


def open_pit(index_path: str) -> PointInTime:
    """CreatePitAction analog: snapshot the current liveDocs generation."""
    files = _delete_files(index_path)
    build_id = _index_build_id(index_path)
    h = hashlib.sha256()
    h.update(index_path.encode())
    h.update((build_id or "").encode())
    for f in files:
        h.update(b"\0")
        h.update(f.encode())
    return PointInTime(index_path, files, h.hexdigest()[:32], build_id)


class PitIndex(InvertedIndex):
    """An ``InvertedIndex`` reader locked to a PIT's tombstone generation.

    Everything else (postings, dictionary, stats) is shared verbatim with
    the live reader — those tables are immutable, the reference's df/N
    semantics under soft deletes already keep counting tombstoned docs, so
    scores through a PIT are identical to scores at open time by
    construction. Opening against an index whose build_id has changed
    since ``open_pit`` (an in-place rebuild/merge) raises — the frozen
    view no longer exists on disk."""

    def __init__(self, pit: PointInTime):
        super().__init__(pit.index_path)
        self.pit = pit
        current = self.meta.get("build_id")
        if pit.build_id is not None and current != pit.build_id:
            raise RuntimeError(
                "PIT invalidated: the index at "
                f"{pit.index_path!r} was rebuilt/merged in place since "
                "the PIT was opened (build_id changed) — the frozen "
                "view no longer exists; open a new PIT")

    def _delete_sources(self) -> list[str]:
        return list(self.pit.delete_files)
