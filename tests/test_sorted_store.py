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


def test_timestamp_sort_column_manifest_and_topk(spark, tmp_path):
    """Timestamp sort columns: parquet stats are datetime objects — the
    manifest must store an order-preserving JSON form and prune with it."""
    from opensearch_spark.index.sorted_store import (
        range_scan_sorted, topk_sorted, write_sorted)

    df = spark.sql("""
        SELECT id AS doc_id,
               timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,0,0,0,id)
                   AS ts
        FROM range(100)""")
    d = str(tmp_path / "tsorted")
    man = write_sorted(df, d, "ts", "doc_id", n_parts=4)
    assert all(isinstance(e["min"], str) for e in man["files"])
    top = topk_sorted(spark, d, 3).collect()
    assert [r.doc_id for r in top] == [0, 1, 2]
    import datetime
    lo = datetime.datetime(2024, 1, 1, 0, 0, 50)
    got = range_scan_sorted(spark, d, lo=lo).count()
    assert got == 50  # ids 50..99


def test_range_scan_tolerates_missing_stats(spark, tmp_path):
    """A file with an all-NULL sort column (no stats) is always read,
    never a TypeError in the pruner."""
    from opensearch_spark.index.sorted_store import (
        prune_files_range, range_scan_sorted, write_sorted)

    df = spark.sql("""
        SELECT id AS doc_id,
               CASE WHEN id < 50 THEN NULL ELSE CAST(id AS LONG) END AS v
        FROM range(100)""")
    d = str(tmp_path / "nsorted")
    man = write_sorted(df, d, "v", "doc_id", n_parts=4)
    # at least one file carries null stats (the NULL half)
    assert any(e["min"] is None for e in man["files"])
    files = prune_files_range(man, lo=90)
    assert files  # no crash, null-stat files included
    assert range_scan_sorted(spark, d, lo=90).count() == 10


def test_topk_on_empty_table(spark, tmp_path):
    from opensearch_spark.index.sorted_store import topk_sorted, write_sorted

    df = spark.range(0).selectExpr("id AS doc_id", "id AS v")
    d = str(tmp_path / "esorted")
    man = write_sorted(df, d, "v", "doc_id", n_parts=2)
    assert man["files"] == []
    assert topk_sorted(spark, d, 5).count() == 0


def test_range_prune_tz_aware_stats_vs_naive_bounds(spark, tmp_path):
    """Round-4 review: TIMESTAMP_MICROS stats come back tz-aware from
    pyarrow; a naive query bound at an exact file boundary must not
    prune the boundary file (the '+00:00' suffix sorted after the naive
    string)."""
    from datetime import datetime

    from opensearch_spark.index.sorted_store import (range_scan_sorted,
                                                     write_sorted)

    rows = [(i, datetime(2020, 1, 1 + i // 10, i % 10)) for i in range(40)]
    df = spark.createDataFrame(rows, "id long, ts timestamp")
    out = str(tmp_path / "tzstore")
    m = write_sorted(df, out, "ts", "id", n_parts=4)
    for e in m["files"]:
        assert "+" not in str(e["min"]), e  # stored naive-UTC
    lo, hi = datetime(2020, 1, 2), datetime(2020, 1, 3)
    got = sorted(r["id"] for r in
                 range_scan_sorted(spark, out, lo=lo, hi=hi).collect())
    want = sorted(i for i, ts in rows if lo <= ts <= hi)
    assert got == want and got  # boundary instants included
