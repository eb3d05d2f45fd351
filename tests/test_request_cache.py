"""RequestCache semantics: hit/miss accounting, generation invalidation
(tombstone appends, meta changes), clear, key separation, atomicity shape.
Reference: indices/IndicesRequestCache.java (reader-keyed invalidation)."""
import os

import pytest
from pyspark.sql import functions as F

from opensearch_spark.entry_queries import get_searcher
from opensearch_spark.search.request_cache import RequestCache

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def searcher(spark):
    return get_searcher(spark, SF)


@pytest.fixture()
def cache(searcher, tmp_path):
    # cache root outside the index dir so tests never dirty the shared tree
    return RequestCache(searcher.index, root=str(tmp_path / "rc"))


def _compute_counter(df):
    calls = {"n": 0}

    def compute():
        calls["n"] += 1
        return df

    return compute, calls


def test_hit_skips_recompute(spark, searcher, cache):
    df = spark.range(5).select(F.col("id").alias("doc_id"))
    compute, calls = _compute_counter(df)
    req = {"query": {"match": {"text": "spark"}}, "size": 5}
    a = cache.get_or_compute(spark, req, compute).collect()
    b = cache.get_or_compute(spark, req, compute).collect()
    assert calls["n"] == 1  # second call served from the materialized entry
    assert sorted(a) == sorted(b)
    assert cache.stats()["hits"] == 1 and cache.stats()["misses"] == 1


def test_different_request_different_entry(spark, cache):
    df = spark.range(3).select(F.col("id").alias("doc_id"))
    compute, calls = _compute_counter(df)
    cache.get_or_compute(spark, {"q": 1}, compute)
    cache.get_or_compute(spark, {"q": 2}, compute)
    assert calls["n"] == 2
    assert cache.stats()["entries"] == 2


def test_generation_changes_on_tombstone_append(spark, searcher, cache,
                                                tmp_path):
    g0 = cache.generation()
    # simulate a delete_by_query append into the reader's deletes dir
    ddir = os.path.join(searcher.index.path, "deletes")
    existed = os.path.isdir(ddir)
    os.makedirs(ddir, exist_ok=True)
    probe = os.path.join(ddir, "test_rc_probe.parquet")
    try:
        with open(probe, "wb") as f:
            f.write(b"x" * 16)
        assert cache.generation() != g0  # appended file ⇒ new generation
        with open(probe, "wb") as f:
            f.write(b"x" * 32)
        assert cache.generation() != g0  # size change also invalidates
    finally:
        os.remove(probe)
        if not existed and not os.listdir(ddir):
            os.rmdir(ddir)
    assert cache.generation() == g0  # back to the original reader state


def test_entry_keyed_by_generation(spark, searcher, cache):
    # same request re-keys after a generation change → recompute
    df = spark.range(2).select(F.col("id").alias("doc_id"))
    compute, calls = _compute_counter(df)
    req = {"q": "same"}
    cache.get_or_compute(spark, req, compute)
    ddir = os.path.join(searcher.index.path, "deletes")
    existed = os.path.isdir(ddir)
    os.makedirs(ddir, exist_ok=True)
    probe = os.path.join(ddir, "test_rc_probe2.parquet")
    try:
        with open(probe, "wb") as f:
            f.write(b"y" * 8)
        cache.get_or_compute(spark, req, compute)
        assert calls["n"] == 2  # old entry invisible under the new key
    finally:
        os.remove(probe)
        if not existed and not os.listdir(ddir):
            os.rmdir(ddir)


def test_clear_resets(spark, cache):
    df = spark.range(1).select(F.col("id").alias("doc_id"))
    compute, calls = _compute_counter(df)
    cache.get_or_compute(spark, {"q": 0}, compute)
    cache.clear()
    assert cache.stats() == {"hits": 0, "misses": 0, "entries": 0,
                             "bytes": 0, "tmp_bytes": 0}
    cache.get_or_compute(spark, {"q": 0}, compute)
    assert calls["n"] == 2


def test_partial_write_never_served(spark, cache):
    # a .tmp directory (in-flight write) must not be seen as an entry
    df = spark.range(1).select(F.col("id").alias("doc_id"))
    compute, calls = _compute_counter(df)
    req = {"q": "partial"}
    path = cache._entry_path(req)
    os.makedirs(path + ".tmp", exist_ok=True)
    cache.get_or_compute(spark, req, compute)
    assert calls["n"] == 1  # computed (tmp dir ignored), not served stale
    assert cache.stats()["misses"] == 1


def test_request_executor_caches_size0(spark, searcher, tmp_path):
    """execute_search_request mirrors the reference default: size:0
    (aggs) requests read through the cache, hit on repeat."""
    from opensearch_spark.search.request import execute_search_request

    rc = RequestCache(searcher.index, root=str(tmp_path / "rc2"))
    body = {"query": {"match": {"text": "spark"}}, "size": 0,
            "aggs": {"by_lang": {"terms": {"field": "lang"}}}}
    a = execute_search_request(searcher, body, cache=rc).collect()
    b = execute_search_request(searcher, body, cache=rc).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert rc.stats()["misses"] == 1 and rc.stats()["hits"] == 1
    # hits requests (size>0) bypass the cache by default
    hits_body = {"query": {"match": {"text": "spark"}}, "size": 3}
    execute_search_request(searcher, hits_body, cache=rc).collect()
    assert rc.stats()["misses"] == 1  # unchanged — not cached
    # explicit opt-in caches a hits request too
    execute_search_request(searcher, hits_body, cache=rc,
                           request_cache=True).collect()
    assert rc.stats()["misses"] == 2


def test_rebuild_with_identical_meta_rolls_generation(spark, cache):
    """A rebuild that reproduces identical doc_count/config over EDITED
    data must still miss: the build_id stamped per build (or the meta
    file identity fallback) is part of the generation fingerprint."""
    df = spark.range(3).select(F.col("id").alias("doc_id"))
    compute, calls = _compute_counter(df)
    req = {"q": "rebuild"}
    cache.get_or_compute(spark, req, compute)
    cache.get_or_compute(spark, req, compute)
    assert calls["n"] == 1
    old = dict(cache.index.meta)
    try:
        cache.index.meta = dict(old, build_id="different-build")
        cache.get_or_compute(spark, req, compute)
        assert calls["n"] == 2  # same doc_count/analyzer, new build → miss
    finally:
        cache.index.meta = old


def test_entry_without_our_marker_is_not_served(spark, cache):
    """Hit detection uses our own _CACHE_OK marker, not Spark's _SUCCESS
    (deployments commonly disable success markers)."""
    import os
    import shutil

    df = spark.range(2).select(F.col("id").alias("doc_id"))
    compute, calls = _compute_counter(df)
    req = {"q": "marker"}
    cache.get_or_compute(spark, req, compute)
    path = cache._entry_path(req)
    assert os.path.exists(os.path.join(path, cache._OK_MARKER))
    os.remove(os.path.join(path, cache._OK_MARKER))
    cache.get_or_compute(spark, req, compute)  # invalid → recompute
    assert calls["n"] == 2
    # and the rewrite republished a valid entry
    assert os.path.exists(os.path.join(path, cache._OK_MARKER))
    shutil.rmtree(path, ignore_errors=True)
