"""Shard request cache: search results keyed by (request, reader state).

Reference surface: ``server/.../indices/IndicesRequestCache.java`` — the
shard-level request cache keys on (shard, reader cache key, request bytes)
and is invalidated by refresh; ``modules/cache-common`` +
``plugins/cache-ehcache`` extend it with tiered (heap → disk) storage.

Spark-first re-expression: the cache value is the MATERIALIZED result of a
search request, written once as parquet under a sibling directory
``<index>_request_cache/`` (outside the index tree, so snapshots and
copy-on-write index clones never carry cache entries) and re-served as a
plain ``spark.read.parquet`` scan. The reference's
"reader cache key" (which changes on refresh, so a cache entry can never
outlive the data it summarizes) becomes a **generation fingerprint**:
index meta identity + the append-only ``deletes/`` file listing — any
rebuild, re-analyze, or tombstone append changes the fingerprint and every
prior entry silently misses. Keys are content-addressed (sha256 of the
canonical request JSON + generation), so the cache needs no coordination:
at cluster scale the same directory lives on the object store and is
shared by every executor and every repeated dashboard query — the exact
deployment shape the reference's request cache exists for.
"""
from __future__ import annotations

import hashlib
import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession


class RequestCache:
    """Read-through result cache over one immutable index generation."""

    def __init__(self, index, root: str | None = None,
                 extra_indexes: list | None = None):
        self.index = index
        # per-field sub-indexes (e.g. the *_title tree) are SEPARATE
        # trees with their own build_id/deletes: a cached result computed
        # through them must roll when THEY change, not only when the main
        # tree does (round-4 review) — pass every tree a request can read
        self.extra_indexes = list(extra_indexes or [])
        # SIBLING of the index tree, never inside it: snapshot/copytree
        # walks of the index must not pick up materialized query results
        # (stale-able cache entries have no place in a snapshot manifest)
        self.root = root or index.path.rstrip(os.sep) + "_request_cache"
        self.hits = 0
        self.misses = 0

    # -- reader identity ---------------------------------------------------
    def generation(self) -> str:
        """Fingerprint of everything that can change a query's answer —
        over EVERY tree the request can read (main + per-field
        sub-indexes): the meta keys a rebuild would bump plus each
        tree's append-only deletes listing (name+size per tombstone
        file — appends only ever add files, so the listing is a
        monotone version vector)."""
        blob = json.dumps(
            [self._tree_fingerprint(ix)
             for ix in [self.index, *self.extra_indexes]],
            sort_keys=True)
        return hashlib.sha256(blob.encode()).hexdigest()[:24]

    @staticmethod
    def _tree_fingerprint(index) -> dict:
        m = index.meta
        ident = {
            "layout_version": m.get("layout_version"),
            "doc_count": m.get("doc_count"),
            "analyzer": m.get("analyzer"),
            "with_positions": bool(m.get("with_positions")),
            "index_options": m.get("index_options", "freqs"),
            # every rebuild stamps a fresh build_id (build.py), so a
            # rebuild over EDITED data that reproduces identical
            # doc_count/config still rolls the generation; scoring params
            # are part of the answer too
            "build_id": m.get("build_id"),
            "k1": m.get("k1"), "b": m.get("b"),
            "keyword_cols": list(m.get("keyword_cols") or []),
        }
        if ident["build_id"] is None:
            # pre-build_id tree: fall back to the meta file's identity —
            # any rewrite of meta.json rolls the generation
            try:
                st = os.stat(os.path.join(index.path, "meta.json"))
                ident["build_id"] = f"mtime:{st.st_mtime_ns}:{st.st_size}"
            except OSError:
                pass
        dels = []
        ddir = os.path.join(index.path, "deletes")
        if os.path.isdir(ddir):
            for dirpath, _, files in os.walk(ddir):
                for fn in sorted(files):
                    p = os.path.join(dirpath, fn)
                    dels.append((os.path.relpath(p, ddir),
                                 os.path.getsize(p)))
        return {"path": os.path.basename(index.path.rstrip(os.sep)),
                "ident": ident, "deletes": sorted(dels)}

    def key(self, request: dict) -> str:
        """Content address of one request against the current generation
        (the reference hashes the serialized request bytes the same way:
        IndicesRequestCache.Key)."""
        blob = json.dumps(request, sort_keys=True, separators=(",", ":"))
        h = hashlib.sha256()
        h.update(self.generation().encode())
        h.update(b"\x00")
        h.update(blob.encode())
        return h.hexdigest()[:32]

    def _entry_path(self, request: dict) -> str:
        return os.path.join(self.root, self.key(request))

    # -- read-through ------------------------------------------------------
    _OK_MARKER = "_CACHE_OK"

    def _is_valid(self, path: str) -> bool:
        # our own completeness marker, written into the tmp dir before
        # publish — independent of Spark's _SUCCESS, which deployments
        # commonly disable (mapreduce.fileoutputcommitter.marksuccessfuljobs)
        return os.path.exists(os.path.join(path, self._OK_MARKER))

    def get_or_compute(self, spark: SparkSession, request: dict,
                       compute) -> DataFrame:
        """Serve ``request`` from cache, else run ``compute()`` and
        materialize its result. The parquet write is atomic-by-rename
        (per-writer-UNIQUE tmp dir + rename), so a concurrent reader never
        sees a partial entry and concurrent fillers of the same key never
        touch each other's tmp output — whoever publishes second simply
        discards its copy and serves the winner's entry."""
        path = self._entry_path(request)
        if self._is_valid(path):
            self.hits += 1
            return spark.read.parquet(path)
        self.misses += 1
        df = compute()
        tmp = f"{path}.{os.getpid()}.{uuid.uuid4().hex[:8]}.tmp"
        try:
            df.write.mode("overwrite").parquet(tmp)
            with open(os.path.join(tmp, self._OK_MARKER), "w") as f:
                f.write("")
            if self._is_valid(path):
                # a concurrent filler already published a COMPLETE entry
                # for this key while we computed — keys are
                # content-addressed so the results are interchangeable;
                # destroying the live entry (the old rmtree-then-replace)
                # would break readers holding its captured file listing
                # (round-4 review). Serve the winner, drop ours.
                shutil.rmtree(tmp, ignore_errors=True)
                return spark.read.parquet(path)
            # only an INVALID leftover (crashed writer) is cleared here
            shutil.rmtree(path, ignore_errors=True)
            try:
                os.replace(tmp, path)
            except OSError:
                # a concurrent filler published between our rmtree and
                # replace: their entry is complete — use it, drop ours
                if not self._is_valid(path):
                    raise
                shutil.rmtree(tmp, ignore_errors=True)
        except BaseException:
            shutil.rmtree(tmp, ignore_errors=True)
            raise
        return spark.read.parquet(path)

    # -- management (the `_cache/clear` API) --------------------------------
    def clear(self) -> None:
        shutil.rmtree(self.root, ignore_errors=True)
        self.hits = 0
        self.misses = 0

    def stats(self) -> dict:
        """RequestCacheStats shape: hit/miss counters + resident bytes.
        ``bytes`` counts LIVE entries only; orphaned tmp dirs (crashed
        writers) are reported separately so they're visible as reclaimable
        rather than inflating the live-cache number."""
        size = tmp_size = 0
        entries = 0
        if os.path.isdir(self.root):
            for e in os.listdir(self.root):
                p = os.path.join(self.root, e)
                n = 0
                for dirpath, _, files in os.walk(p):
                    for fn in files:
                        n += os.path.getsize(os.path.join(dirpath, fn))
                if e.endswith(".tmp"):
                    tmp_size += n
                else:
                    entries += 1
                    size += n
        return {"hits": self.hits, "misses": self.misses,
                "entries": entries, "bytes": size, "tmp_bytes": tmp_size}
