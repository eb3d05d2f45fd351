"""Per-segment HNSW ANN index (Malkov & Yashunin, arXiv:1603.09320).

Reference surface: the events-correlation-engine plugin maps a
``correlation_vector`` field type with ``m`` / ``ef_construction``
hyperparameters onto per-segment Lucene HNSW graphs
(``plugins/events-correlation-engine/src/main/java/org/opensearch/plugin/
correlation/core/index/CorrelationParamsContext.java:25-46`` declares the
params, ``codec/BasePerFieldCorrelationVectorsFormat.java`` wraps
``Lucene99HnswVectorsFormat``) and queries them with
``query/CorrelationQueryBuilder.java`` (field, vector, k, optional
filter) — Lucene searches each segment's graph independently and merges
the per-leaf top-k.

Spark re-expression (not a port — Lucene's graph lives in a columnar
codec; ours is a packed-blob table):

* **Build**: vectors are hash-assigned to ``n_segments`` deterministic
  segments; one ``applyInPandas`` pass builds an in-memory HNSW graph
  per segment and packs it into a SINGLE binary row (same discipline as
  the posting-list segments in ``index/segments.py``). Level assignment
  is md5-derived, insertion order is id-sorted — the graph, and
  therefore every query result, is bit-reproducible.
* **Query**: scan the ``n_segments`` blob rows → ``mapInPandas`` beam
  search per graph (each segment emits its local top-k) → global
  ``TakeOrderedAndProject`` merge, exactly Lucene's per-leaf kNN +
  TopDocs reduce. Query time touches no raw-vector table and shuffles
  only k rows per segment, so the plan is flat at any corpus size; at
  10^9 vectors you raise ``n_segments`` and the blob rows stay
  partition-parallel.
* **Filter**: ``filter_expr`` mirrors CorrelationQueryBuilder's filter —
  Lucene passes an acceptOrds bitset into the graph search; we evaluate
  the predicate on the segment's id/metadata arrays and let the beam
  TRAVERSE every node while COLLECTING only accepted ones (post-filtering
  the beam, pre-filtering the result — the Lucene FilteredKnnCollector
  posture), so a selective filter cannot strand the walk.

Distances: vectors are L2-normalized at build; d = 1 - cosine. Scores
returned are cosine similarity, rounded by the caller's convention.
"""

from __future__ import annotations

import hashlib
import io
import json
import math
import os

import numpy as np
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (ArrayType, BinaryType, DoubleType, IntegerType,
                               LongType, StructField, StructType)

__all__ = ["HnswGraph", "HnswIndex", "build_graph"]


def _level_for(id_: int, ml: float) -> int:
    """Deterministic geometric level draw: md5(id) -> uniform (0,1] ->
    floor(-ln(u) * mL), the paper's Algorithm 1 draw with the RNG replaced
    by a hash so rebuilds (and the test oracle) are stable."""
    h = int.from_bytes(hashlib.md5(str(int(id_)).encode()).digest()[:8], "big")
    u = (h + 1) / 2.0 ** 64
    return int(-math.log(u) * ml)


class HnswGraph:
    """One segment's hierarchical graph over an L2-normalized matrix.

    ``nbrs[level][i]`` is a python list of local ordinals. Layer 0 allows
    2*m links, upper layers m (Lucene/paper convention)."""

    def __init__(self, ids: np.ndarray, vecs: np.ndarray, m: int,
                 levels: list[int], nbrs: list[dict[int, list[int]]],
                 entry: int, max_level: int):
        self.ids = ids
        self.vecs = vecs
        self.m = m
        self.levels = levels
        self.nbrs = nbrs
        self.entry = entry
        self.max_level = max_level

    # -- serialization ----------------------------------------------------
    # npz (raw numpy buffers + a scalar header array), NOT pickle: the
    # blob is read back with allow_pickle=False, so a tampered index
    # directory can yield at worst a decode error — never code execution
    # on the executors (round-4 review; pickle.loads of
    # attacker-writable bytes is an arbitrary-code-execution sink).
    # Per-level adjacency is flattened as (sorted keys, counts, flat
    # neighbor stream) — neighbor ORDER inside each list is preserved
    # bit-for-bit, keeping the graph and every query reproducible.
    def to_blob(self) -> bytes:
        arrays = {
            "header": np.asarray(
                [2, int(self.ids.shape[0]), int(self.vecs.shape[1]),
                 int(self.m), int(self.entry), int(self.max_level),
                 len(self.nbrs)], dtype=np.int64),
            "ids": self.ids.astype(np.int64),
            "vecs": self.vecs.astype(np.float32).reshape(-1),
            "levels": np.asarray(self.levels, dtype=np.int32),
        }
        for lvl, table in enumerate(self.nbrs):
            keys = sorted(table)
            arrays[f"k{lvl}"] = np.asarray(keys, dtype=np.int32)
            arrays[f"c{lvl}"] = np.asarray(
                [len(table[k]) for k in keys], dtype=np.int32)
            flat = [o for k in keys for o in table[k]]
            arrays[f"f{lvl}"] = np.asarray(flat, dtype=np.int32)
        buf = io.BytesIO()
        np.savez_compressed(buf, **arrays)
        return buf.getvalue()

    @staticmethod
    def from_blob(blob: bytes) -> "HnswGraph":
        raw = bytes(blob)
        if not raw.startswith(b"PK"):
            raise ValueError(
                "HnswGraph.from_blob: not an npz blob — this index was "
                "written by a pre-round-4 (pickle-format) build; rebuild "
                "the index directory")
        z = np.load(io.BytesIO(raw), allow_pickle=False)
        hdr = z["header"]
        n, dim = int(hdr[1]), int(hdr[2])
        m, entry, max_level, n_levels = (int(hdr[3]), int(hdr[4]),
                                         int(hdr[5]), int(hdr[6]))
        ids = z["ids"].astype(np.int64)
        vecs = z["vecs"].astype(np.float64).reshape(n, dim)
        levels = z["levels"].astype(int).tolist()
        nbrs: list[dict[int, list[int]]] = []
        for lvl in range(n_levels):
            keys = z[f"k{lvl}"]
            counts = z[f"c{lvl}"]
            flat = z[f"f{lvl}"]
            table: dict[int, list[int]] = {}
            pos = 0
            for k, c in zip(keys.tolist(), counts.tolist()):
                table[k] = flat[pos:pos + c].tolist()
                pos += c
            nbrs.append(table)
        return HnswGraph(ids, vecs, m, levels, nbrs, entry, max_level)

    # -- search ------------------------------------------------------------
    def _greedy_layer(self, q: np.ndarray, ep: int, level: int) -> int:
        """Algorithm 2 with ef=1: greedy descent on one upper layer."""
        cur = ep
        cur_d = 1.0 - float(self.vecs[cur] @ q)
        improved = True
        while improved:
            improved = False
            for nb in self.nbrs[level].get(cur, ()):
                d = 1.0 - float(self.vecs[nb] @ q)
                if d < cur_d:
                    cur, cur_d, improved = nb, d, True
        return cur

    def _search_layer(self, q: np.ndarray, eps: list[int], ef: int,
                      level: int,
                      accept: np.ndarray | None = None
                      ) -> list[tuple[float, int]]:
        """Algorithm 2: beam search, returns (dist, ordinal) sorted asc.

        ``accept`` (layer-0 filtered kNN): the BEAM (navigation) stays
        unfiltered — pruning rejected nodes from the walk would strand it
        in accepted islands — but the COLLECTED results are only accepted
        ordinals, gathered during traversal (Lucene's acceptOrds /
        FilteredKnnCollector posture). Filtering after beam truncation
        instead would return fewer than ef (often zero) accepted hits for
        selective filters even though matches exist."""
        import heapq

        visited = set(eps)
        cand: list[tuple[float, int]] = []   # min-heap by dist
        best: list[tuple[float, int]] = []   # max-heap via negated dist
        res: list[tuple[float, int]] = []    # accepted-only, max-heap

        def collect(d: float, o: int) -> None:
            if accept is not None and not accept[o]:
                return
            heapq.heappush(res, (-d, o))
            if len(res) > ef:
                heapq.heappop(res)

        for e in eps:
            d = 1.0 - float(self.vecs[e] @ q)
            heapq.heappush(cand, (d, e))
            heapq.heappush(best, (-d, e))
            collect(d, e)
        while cand:
            d, c = heapq.heappop(cand)
            if d > -best[0][0]:
                break
            frontier = [nb for nb in self.nbrs[level].get(c, ())
                        if nb not in visited]
            if not frontier:
                continue
            visited.update(frontier)
            ds = 1.0 - self.vecs[np.asarray(frontier)] @ q
            for nb, dn in zip(frontier, ds):
                dn = float(dn)
                # collection is independent of beam admission (Lucene
                # collects every VISITED accepted node): an accepted node
                # beyond the ef-th unfiltered distance can still be among
                # the best accepted ones under a selective filter
                collect(dn, nb)
                if len(best) < ef or dn < -best[0][0]:
                    heapq.heappush(cand, (dn, nb))
                    heapq.heappush(best, (-dn, nb))
                    if len(best) > ef:
                        heapq.heappop(best)
        if accept is None:
            return sorted((-nd, o) for nd, o in best)
        return sorted((-nd, o) for nd, o in res)

    def search(self, q: np.ndarray, k: int, ef: int,
               accept: np.ndarray | None = None) -> list[tuple[int, float]]:
        """Top-k (global id, cosine) — beam traverses everything, only
        ``accept``-ed ordinals are collected (filter posture above)."""
        if self.ids.shape[0] == 0:
            return []
        qn = q / (np.linalg.norm(q) or 1.0)
        ep = self.entry
        for level in range(self.max_level, 0, -1):
            ep = self._greedy_layer(qn, ep, level)
        found = self._search_layer(qn, [ep], max(ef, k), 0, accept=accept)
        return [(int(self.ids[o]), 1.0 - d) for d, o in found[:k]]


def _select_neighbors(cands: list[tuple[float, int]],
                      m: int, vecs: np.ndarray) -> list[int]:
    """Algorithm 4 (heuristic selection): scan candidates closest-first,
    keep e unless some already-selected s is closer to e than e is to q —
    the occlusion rule that keeps the graph navigable across clusters."""
    out: list[int] = []
    for d, e in sorted(cands):
        if len(out) >= m:
            break
        ev = vecs[e]
        if all(1.0 - float(vecs[s] @ ev) >= d for s in out):
            out.append(e)
    if len(out) < m:  # backfill with pruned-but-closest (Lucene keepPruned)
        chosen = set(out)
        for d, e in sorted(cands):
            if len(out) >= m:
                break
            if e not in chosen:
                out.append(e)
    return out


def build_graph(ids: np.ndarray, vecs: np.ndarray, m: int = 8,
                ef_construction: int = 64) -> HnswGraph:
    """Algorithm 1 over one segment: id-sorted deterministic inserts."""
    if m < 2:
        # ml = 1/ln(m) → ZeroDivisionError at m=1, degenerate graph at
        # m=0; fail with a comprehensible message instead
        raise ValueError("build_graph: m must be >= 2")
    order = np.argsort(ids, kind="stable")
    ids = np.asarray(ids, dtype=np.int64)[order]
    vecs = np.asarray(vecs, dtype=np.float64)[order]
    norms = np.linalg.norm(vecs, axis=1)
    norms[norms == 0.0] = 1.0
    vecs = vecs / norms[:, None]

    ml = 1.0 / math.log(m)
    n = ids.shape[0]
    levels = [_level_for(int(ids[i]), ml) for i in range(n)]
    max_possible = max(levels) if n else 0
    nbrs: list[dict[int, list[int]]] = [dict() for _ in range(max_possible + 1)]
    entry, max_level = 0, -1

    g = HnswGraph(ids, vecs, m, levels, nbrs, entry, max_level)
    for i in range(n):
        lvl = levels[i]
        if g.max_level < 0:  # first point
            for layer in range(lvl + 1):
                nbrs[layer][i] = []
            g.entry, g.max_level = i, lvl
            continue
        q = vecs[i]
        ep = g.entry
        for layer in range(g.max_level, lvl, -1):
            ep = g._greedy_layer(q, ep, layer)
        eps = [ep]
        for layer in range(min(lvl, g.max_level), -1, -1):
            cands = g._search_layer(q, eps, ef_construction, layer)
            mmax = 2 * m if layer == 0 else m
            sel = _select_neighbors(cands, m, vecs)
            nbrs[layer][i] = list(sel)
            for s in sel:
                links = nbrs[layer].setdefault(s, [])
                links.append(i)
                if len(links) > mmax:  # shrink with the same heuristic
                    sv = vecs[s]
                    cl = [(1.0 - float(vecs[e] @ sv), e) for e in links]
                    nbrs[layer][s] = _select_neighbors(cl, mmax, vecs)
            eps = [o for _, o in cands] or eps
        if lvl > g.max_level:
            for layer in range(g.max_level + 1, lvl + 1):
                nbrs[layer].setdefault(i, [])
            g.entry, g.max_level = i, lvl
    return g


_BLOB_SCHEMA = StructType([
    StructField("seg", IntegerType()),
    StructField("n", LongType()),
    StructField("blob", BinaryType()),
])

_HIT_SCHEMA = StructType([
    StructField("vec_id", LongType()),
    StructField("cosine", DoubleType()),
])


class HnswIndex:
    """Build-time-materialized per-segment HNSW graphs (blob-row table).

    Layout under ``path``: ``graphs/`` parquet of (seg, n, blob),
    ``meta.json`` with m / ef_construction / n_segments / dim."""

    def __init__(self, path: str):
        self.path = path
        with open(os.path.join(path, "meta.json")) as f:
            self.meta = json.load(f)

    @staticmethod
    def build(df: DataFrame, out_dir: str, m: int = 8,
              ef_construction: int = 64, n_segments: int = 4,
              vec_col: str = "embedding", id_col: str = "vec_id") -> "HnswIndex":
        if "://" in out_dir:
            # graphs/ goes through Spark's filesystem layer but meta.json
            # is a driver-local open() — a remote out_dir would silently
            # split the index across filesystems (round-4 review)
            raise ValueError(
                "HnswIndex.build: out_dir must be a local path — the "
                "metadata write is driver-local; copy the finished index "
                "directory to remote storage as a unit")
        row = df.select(F.max(F.size(vec_col)).alias("d")).first()
        if row is None or row["d"] is None or int(row["d"]) <= 0:
            raise ValueError(
                "HnswIndex.build: input has no rows with a non-empty "
                f"{vec_col!r} vector — nothing to index")
        dim = int(row["d"])

        def _build(pdf):
            import pandas as pd

            seg = int(pdf["_seg"].iloc[0])
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            vecs = np.asarray(list(pdf[vec_col]), dtype=np.float64)
            g = build_graph(ids, vecs, m, ef_construction)
            return pd.DataFrame({"seg": [seg], "n": [len(ids)],
                                 "blob": [g.to_blob()]})

        base = df.select(F.col(id_col).cast("long").alias(id_col), vec_col) \
                 .withColumn("_seg",
                             F.pmod(F.xxhash64(F.col(id_col)),
                                    F.lit(n_segments)).cast("int"))
        blobs = base.groupBy("_seg").applyInPandas(_build, _BLOB_SCHEMA)
        blobs.write.mode("overwrite").parquet(os.path.join(out_dir, "graphs"))
        os.makedirs(out_dir, exist_ok=True)
        with open(os.path.join(out_dir, "meta.json"), "w") as f:
            json.dump({"m": m, "ef_construction": ef_construction,
                       "n_segments": n_segments, "dim": dim,
                       "vec_col": vec_col, "id_col": id_col,
                       "blob_format": 2}, f)
        return HnswIndex(out_dir)

    def topk(self, spark, query_vec: list[float], k: int = 10,
             ef_search: int = 100, exclude_id: int | None = None,
             accept_fn=None) -> DataFrame:
        """Per-segment beam search -> TakeOrderedAndProject merge.

        ``accept_fn(ids: np.ndarray) -> bool mask`` is the optional filter
        (CorrelationQueryBuilder's ``filter``), applied inside each
        segment the way Lucene applies acceptOrds."""
        q = np.asarray(query_vec, dtype=np.float64)
        graphs = spark.read.parquet(os.path.join(self.path, "graphs"))

        def _search(batches):
            import pandas as pd

            for pdf in batches:
                rows_id, rows_cos = [], []
                for blob in pdf["blob"]:
                    g = HnswGraph.from_blob(blob)
                    accept = None
                    if accept_fn is not None or exclude_id is not None:
                        accept = np.ones(g.ids.shape[0], dtype=bool)
                        if accept_fn is not None:
                            accept &= np.asarray(accept_fn(g.ids), dtype=bool)
                        if exclude_id is not None:
                            accept &= g.ids != int(exclude_id)
                    for vid, cos in g.search(q, k, ef_search, accept):
                        rows_id.append(vid)
                        rows_cos.append(cos)
                yield pd.DataFrame({"vec_id": pd.Series(rows_id, dtype="int64"),
                                    "cosine": pd.Series(rows_cos,
                                                        dtype="float64")})

        hits = graphs.mapInPandas(_search, _HIT_SCHEMA)
        hits = hits.withColumn("cosine", F.round(F.col("cosine"), 4))
        return (hits.orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
                .limit(k))
