"""Index sorting / sort-based early termination (index/sorted_store.py):
pruned-file top-k must equal the full sort, including ties that straddle
range-partition boundaries, and must actually skip files."""

import pytest
from pyspark.sql import functions as F

from opensearch_spark.index import sorted_store as SS


@pytest.fixture(scope="module")
def store(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("sorted") / "docs")
    # heavy ties: only 20 distinct sort values over 400 rows, so range
    # boundaries land inside tie groups
    df = spark.range(400).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 20).cast("int").alias("n_chars"))
    manifest = SS.write_sorted(df, out, "n_chars", "doc_id", n_parts=8)
    return out, manifest, df


def test_manifest_shape(store):
    out, manifest, _ = store
    assert manifest["sort_col"] == "n_chars"
    assert sum(e["rows"] for e in manifest["files"]) == 400
    assert all(e["min"] <= e["max"] for e in manifest["files"])


@pytest.mark.parametrize("k", [1, 10, 35, 100])
@pytest.mark.parametrize("ascending", [True, False])
def test_topk_equals_full_sort(spark, store, k, ascending):
    out, _, df = store
    got = [(r["doc_id"], r["n_chars"])
           for r in SS.topk_sorted(spark, out, k, ascending=ascending).collect()]
    order = ([F.asc("n_chars"), F.asc("doc_id")] if ascending
             else [F.desc("n_chars"), F.asc("doc_id")])
    want = [(r["doc_id"], r["n_chars"])
            for r in df.orderBy(*order).limit(k).collect()]
    assert got == want


def test_topk_prunes_files(store):
    _, manifest, _ = store
    total = len(manifest["files"])
    chosen = SS.prune_files_topk(manifest, 10, ascending=True)
    assert total > 1 and len(chosen) < total


def test_range_scan_matches_filter(spark, store):
    out, manifest, df = store
    got = sorted(r["doc_id"] for r in
                 SS.range_scan_sorted(spark, out, lo=3, hi=5).collect())
    want = sorted(r["doc_id"] for r in
                  df.where("n_chars BETWEEN 3 AND 5").collect())
    assert got == want
    # and it skips files outside the range
    assert len(SS.prune_files_range(manifest, 3, 5)) < len(manifest["files"])


def test_range_scan_empty(spark, store):
    out, _, _ = store
    assert SS.range_scan_sorted(spark, out, lo=999).count() == 0


def test_topk_desc_string_sort_key(spark, tmp_path):
    """Descending pruning must work for non-numeric sort keys (strings) —
    regression: the old order key negated min/max numerically."""
    out = str(tmp_path / "sdocs")
    df = spark.createDataFrame(
        [(i, f"commit{i:03d}") for i in range(100)],
        "doc_id long, sha string")
    SS.write_sorted(df, out, "sha", "doc_id", n_parts=4)
    got = [r["sha"] for r in SS.topk_sorted(spark, out, 5, ascending=False).collect()]
    assert got == [f"commit{i:03d}" for i in range(99, 94, -1)]


def test_tie_bound_frozen_no_cascade(spark, tmp_path):
    """Chained boundary ties must not cascade the tie bound into a
    full-table selection: only files touching the frozen k-prefix bound
    are appended."""
    out = str(tmp_path / "tdocs")
    # 10 distinct values over 400 rows, 8 files -> every boundary is a tie
    df = spark.range(400).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 10).cast("int").alias("n_chars"))
    m = SS.write_sorted(df, out, "n_chars", "doc_id", n_parts=8)
    chosen = SS.prune_files_topk(m, 10, ascending=True)
    assert len(chosen) < len(m["files"])
    # correctness unaffected
    got = [(r["doc_id"], r["n_chars"])
           for r in SS.topk_sorted(spark, out, 10).collect()]
    want = [(r["doc_id"], r["n_chars"])
            for r in df.orderBy("n_chars", "doc_id").limit(10).collect()]
    assert got == want
