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

from pyspark.sql import DataFrame, SparkSession


class RequestCache:
    """Read-through result cache over one immutable index generation."""

    def __init__(self, index, root: str | None = None):
        self.index = index
        # SIBLING of the index tree, never inside it: snapshot/copytree
        # walks of the index must not pick up materialized query results
        # (stale-able cache entries have no place in a snapshot manifest)
        self.root = root or index.path.rstrip(os.sep) + "_request_cache"
        self.hits = 0
        self.misses = 0

    # -- reader identity ---------------------------------------------------
    def generation(self) -> str:
        """Fingerprint of everything that can change a query's answer:
        the meta keys a rebuild would bump plus the append-only deletes
        listing (name+size per tombstone file — appends only ever add
        files, so the listing is a monotone version vector)."""
        m = self.index.meta
        ident = {
            "layout_version": m.get("layout_version"),
            "doc_count": m.get("doc_count"),
            "analyzer": m.get("analyzer"),
            "with_positions": bool(m.get("with_positions")),
            "index_options": m.get("index_options", "freqs"),
        }
        dels = []
        ddir = os.path.join(self.index.path, "deletes")
        if os.path.isdir(ddir):
            for dirpath, _, files in os.walk(ddir):
                for fn in sorted(files):
                    p = os.path.join(dirpath, fn)
                    dels.append((os.path.relpath(p, ddir),
                                 os.path.getsize(p)))
        blob = json.dumps({"ident": ident, "deletes": sorted(dels)},
                          sort_keys=True)
        return hashlib.sha256(blob.encode()).hexdigest()[:24]

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
    def get_or_compute(self, spark: SparkSession, request: dict,
                       compute) -> DataFrame:
        """Serve ``request`` from cache, else run ``compute()`` and
        materialize its result. The parquet write is atomic-by-rename
        (tmp dir + rename), so a concurrent reader never sees a partial
        entry — it just misses and recomputes."""
        path = self._entry_path(request)
        if os.path.isdir(os.path.join(path, "")) and \
                os.path.exists(os.path.join(path, "_SUCCESS")):
            self.hits += 1
            return spark.read.parquet(path)
        self.misses += 1
        df = compute()
        tmp = path + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        df.write.mode("overwrite").parquet(tmp)
        shutil.rmtree(path, ignore_errors=True)
        os.replace(tmp, path)
        return spark.read.parquet(path)

    # -- management (the `_cache/clear` API) --------------------------------
    def clear(self) -> None:
        shutil.rmtree(self.root, ignore_errors=True)
        self.hits = 0
        self.misses = 0

    def stats(self) -> dict:
        """RequestCacheStats shape: hit/miss counters + resident bytes."""
        size = 0
        entries = 0
        if os.path.isdir(self.root):
            for dirpath, _, files in os.walk(self.root):
                for fn in files:
                    size += os.path.getsize(os.path.join(dirpath, fn))
            entries = len([e for e in os.listdir(self.root)
                           if not e.endswith(".tmp")])
        return {"hits": self.hits, "misses": self.misses,
                "entries": entries, "bytes": size}
