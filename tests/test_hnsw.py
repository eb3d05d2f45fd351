"""Per-segment HNSW graph index (ml/hnsw.py).

Pins the algorithm itself — determinism of the md5-level build, blob
round-trip, beam-search recall at genuinely approximate settings, the
traverse-everything/collect-accepted filter posture — plus the Spark
plan shape (blob-scan → mapInPandas → TakeOrderedAndProject)."""

import numpy as np
import pytest

from opensearch_spark.ml.hnsw import HnswGraph, HnswIndex, build_graph


def _rand(n, dim, seed):
    rng = np.random.RandomState(seed)
    return rng.randn(n, dim)


def _brute_topk(vecs, q, k, accept=None):
    vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    qn = q / np.linalg.norm(q)
    cos = vn @ qn
    order = np.lexsort((np.arange(len(cos)), -cos))
    out = []
    for i in order:
        if accept is not None and not accept[i]:
            continue
        out.append(int(i))
        if len(out) >= k:
            break
    return out


def test_build_is_deterministic():
    vecs = _rand(300, 16, seed=7)
    ids = np.arange(300, dtype=np.int64)
    b1 = build_graph(ids, vecs, m=8, ef_construction=48).to_blob()
    b2 = build_graph(ids, vecs, m=8, ef_construction=48).to_blob()
    assert b1 == b2  # md5 level draw + id-sorted inserts: byte-identical

    # input row order must not matter either (the build sorts by id)
    perm = np.random.RandomState(1).permutation(300)
    b3 = build_graph(ids[perm], vecs[perm], m=8, ef_construction=48).to_blob()
    assert b3 == b1


def test_blob_round_trip():
    vecs = _rand(120, 8, seed=3)
    ids = np.arange(1000, 1120, dtype=np.int64)
    g = build_graph(ids, vecs, m=6, ef_construction=32)
    g2 = HnswGraph.from_blob(g.to_blob())
    assert np.array_equal(g2.ids, g.ids)
    assert g2.m == g.m and g2.entry == g.entry
    assert g2.max_level == g.max_level
    assert g2.nbrs == g.nbrs
    q = _rand(1, 8, seed=9)[0]
    # blob stores vecs float32 (the fixture's own width): compare ids and
    # rounded scores, never raw float64 sums
    a = [(i, round(s, 6)) for i, s in g.search(q, 5, 64)]
    b = [(i, round(s, 6)) for i, s in g2.search(q, 5, 64)]
    assert a == b


def test_exhaustive_ef_matches_brute_force():
    """ef >= n: the beam admits every reachable node, so a connected
    graph returns the exact top-k — the property the full-oracle gates
    (sim_hnsw_topk) rely on."""
    vecs = _rand(400, 24, seed=11)
    ids = np.arange(400, dtype=np.int64)
    g = build_graph(ids, vecs, m=8, ef_construction=64)
    for seed in (21, 22, 23):
        q = _rand(1, 24, seed=seed)[0]
        got = [i for i, _ in g.search(q, 10, ef=400)]
        assert got == _brute_topk(vecs, q, 10)


def test_approximate_recall_at_small_ef():
    """The genuinely-ANN regime (ef well under n): recall@10 must stay
    high — this is the property that holds at 10^9 vectors where
    exhaustive ef is impossible."""
    n, dim = 3000, 32
    vecs = _rand(n, dim, seed=5)
    ids = np.arange(n, dtype=np.int64)
    g = build_graph(ids, vecs, m=12, ef_construction=100)
    hits = total = 0
    for seed in range(40, 60):
        q = _rand(1, dim, seed=seed)[0]
        got = {i for i, _ in g.search(q, 10, ef=100)}
        want = set(_brute_topk(vecs, q, 10))
        hits += len(got & want)
        total += 10
    assert hits / total >= 0.9, f"recall@10 {hits/total:.2f}"


def test_filter_collects_only_accepted_but_traverses_all():
    """Lucene filtered-kNN posture: a selective accept mask must not
    strand the walk — results equal the brute-force filtered top-k."""
    vecs = _rand(500, 16, seed=13)
    ids = np.arange(500, dtype=np.int64)
    g = build_graph(ids, vecs, m=8, ef_construction=64)
    accept = (ids % 7 == 2)
    q = _rand(1, 16, seed=99)[0]
    got = [i for i, _ in g.search(q, 10, ef=500, accept=accept)]
    assert all(i % 7 == 2 for i in got)
    assert got == _brute_topk(vecs, q, 10, accept=accept)


def test_empty_and_single_point_graphs():
    g = build_graph(np.array([], dtype=np.int64), np.zeros((0, 4)), m=4)
    assert g.search(np.ones(4), 5, ef=10) == []
    g1 = build_graph(np.array([42], dtype=np.int64), np.ones((1, 4)), m=4)
    out = g1.search(np.ones(4), 5, ef=10)
    assert [i for i, _ in out] == [42]
    assert out[0][1] == pytest.approx(1.0)


def test_layer0_degree_bounded():
    """Link lists stay within the 2m (layer 0) / m (upper) caps after
    the shrink-on-overflow heuristic."""
    vecs = _rand(600, 16, seed=17)
    g = build_graph(np.arange(600, dtype=np.int64), vecs, m=6,
                    ef_construction=48)
    assert all(len(v) <= 12 for v in g.nbrs[0].values())
    for layer in range(1, len(g.nbrs)):
        assert all(len(v) <= 6 for v in g.nbrs[layer].values())


def test_spark_index_plan_and_merge(spark, sf_dir, tmp_path):
    """End-to-end through Spark: the query plan scans ONLY the packed
    graph-blob table (never the raw embeddings) and merges per-segment
    top-k with TakeOrderedAndProject."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    idx = HnswIndex.build(emb, str(tmp_path / "hnsw"), m=8,
                          ef_construction=64, n_segments=4)
    qv = [float(x) for x in emb.where("vec_id = 0").first()["embedding"]]
    df = idx.topk(spark, qv, k=10, ef_search=512, exclude_id=0)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    # the only scan is the packed blob table, never the raw vectors
    assert "ReadSchema: struct<seg:int,n:bigint,blob:binary>" in plan
    assert "embedding:array" not in plan
    rows = df.collect()
    assert len(rows) == 10 and all(r["vec_id"] != 0 for r in rows)
    cosines = [r["cosine"] for r in rows]
    assert cosines == sorted(cosines, reverse=True)


def test_selective_filter_still_returns_k():
    """Regression: accept was applied AFTER beam truncation, so a 1%-
    selective filter returned []/under-k despite matches existing. The
    collector must gather accepted nodes during traversal."""
    vecs = _rand(3000, 16, seed=11)
    ids = np.arange(3000, dtype=np.int64)
    g = build_graph(ids, vecs, m=8, ef_construction=48)
    rng = np.random.RandomState(3)
    accept = rng.rand(3000) < 0.02  # ~60 accepted of 3000
    q = _rand(1, 16, seed=5)[0]
    got = g.search(q, k=10, ef=100, accept=accept)
    assert len(got) == 10
    ids_got = [i for i, _ in got]
    assert all(accept[i] for i in ids_got)
    # quality: decent overlap with the brute-force accepted top-10
    want = _brute_topk(vecs, q, 10, accept=accept)
    assert len(set(ids_got) & set(want)) >= 5
