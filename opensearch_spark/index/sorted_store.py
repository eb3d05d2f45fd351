"""Index sorting + sort-based early termination.

Reference: OpenSearch index sorting (``index.sort.field`` settings,
``IndexSortConfig.java``; Lucene ``IndexWriterConfig.setIndexSort``) lets a
top-k-by-sort-field query terminate after the first k docs per segment
because segments store docs in sort order.

Spark-first re-expression: write the table range-partitioned by
(sort_key, tiebreak) with rows sorted inside each file, and record a
manifest of per-file (min, max, rows) for the sort key — the parquet
footer stats, lifted to a driver-readable JSON. A top-k query then reads
ONLY the file prefix whose cumulative row count covers k (plus boundary
ties): early termination becomes file pruning, so at 100 TB a top-10 by
timestamp touches one file instead of the whole table. The same manifest
serves range predicates (files with [min,max] ∩ predicate = ∅ are skipped
— Lucene's PointValues skipping analog).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, functions as F

#: underscore-prefixed so Spark's parquet reader treats it as a hidden
#: file: a bare name inside the data dir breaks spark.read.parquet(path)
#: whenever Spark tries to parse it as a footer (the empty-table
#: fallback, or any session with parquet.mergeSchema=true)
MANIFEST = "_sort_manifest.json"
_MANIFEST_LEGACY = "sort_manifest.json"


def _canon_stat(v):
    """JSON-storable, ORDER-PRESERVING form of a parquet column statistic
    (and of query bounds, so manifest compares stay apples-to-apples):
    datetimes/dates → ISO strings (lexicographic == chronological; a
    bare-seconds string sorts before its .000001 sibling, correctly),
    Decimal → float, binary → hex (lexicographic order preserved)."""
    import datetime
    import decimal

    if isinstance(v, datetime.datetime):
        # TIMESTAMP_MICROS stats come back TZ-AWARE from pyarrow while
        # query bounds are usually naive; an aware isoformat's '+00:00'
        # suffix sorts AFTER the naive form of the same instant, wrongly
        # pruning boundary files (round-4 review). Normalize to naive
        # UTC — the engine's session-invariant convention.
        if v.tzinfo is not None:
            v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        return v.isoformat(sep=" ")
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    return v


def write_sorted(df: DataFrame, out_dir: str, sort_col: str,
                 tiebreak_col: str, n_parts: int = 8) -> dict:
    """Write ``df`` as a sort-partitioned parquet table + manifest.

    repartitionByRange gives non-overlapping value ranges per output file
    (equal keys can only touch at boundaries); sortWithinPartitions makes
    each file internally sorted, so a reader of the selected file prefix
    sees fully sorted data after a cheap k-way merge (Spark's orderBy over
    an already-clustered subset).

    Timestamp sort columns: Spark's default parquet output type (INT96)
    carries NO column statistics — which would silently void every prune
    for the store's headline top-k-by-timestamp use. The write forces
    TIMESTAMP_MICROS (stats-bearing) for the duration and restores the
    session setting after."""
    spark = df.sparkSession
    ts_key = "spark.sql.parquet.outputTimestampType"
    is_ts = dict(df.dtypes).get(sort_col, "").startswith("timestamp")
    prev = spark.conf.get(ts_key, None) if is_ts else None
    if is_ts:
        spark.conf.set(ts_key, "TIMESTAMP_MICROS")
    try:
        (df.repartitionByRange(n_parts, F.col(sort_col), F.col(tiebreak_col))
           .sortWithinPartitions(sort_col, tiebreak_col)
           .write.mode("overwrite").parquet(out_dir))
    finally:
        if is_ts:
            if prev is None:
                spark.conf.unset(ts_key)
            else:
                spark.conf.set(ts_key, prev)
    import pyarrow.parquet as pq

    files = sorted(
        os.path.join(out_dir, f) for f in os.listdir(out_dir)
        if f.endswith(".parquet"))
    entries = []
    for path in files:
        md = pq.ParquetFile(path).metadata
        mn = mx = None
        rows = md.num_rows
        if rows == 0:
            continue
        for rg in range(md.num_row_groups):
            grp = md.row_group(rg)
            for ci in range(grp.num_columns):
                col = grp.column(ci)
                if col.path_in_schema == sort_col and col.statistics:
                    st = col.statistics
                    # a row group whose sort-column chunk is all-NULL
                    # reports None min/max — min(value, None) would
                    # TypeError after the data is already written
                    if st.min is not None:
                        mn = st.min if mn is None else min(mn, st.min)
                    if st.max is not None:
                        mx = st.max if mx is None else max(mx, st.max)
        entries.append({"file": os.path.basename(path), "rows": rows,
                        "min": _canon_stat(mn), "max": _canon_stat(mx)})
    from opensearch_spark.index.build import _atomic_write_json

    manifest = {"sort_col": sort_col, "tiebreak_col": tiebreak_col,
                "files": entries}
    _atomic_write_json(os.path.join(out_dir, MANIFEST), manifest)
    return manifest


def _load_manifest(path: str) -> dict:
    p = os.path.join(path, MANIFEST)
    if not os.path.exists(p):  # tree written before the underscore rename
        p = os.path.join(path, _MANIFEST_LEGACY)
    with open(p) as f:
        m = json.load(f)
    # manifests written before the aware→naive-UTC canonicalization
    # carry '+00:00' suffixes that sort after naive bound strings —
    # normalize on load so old trees keep pruning correctly
    for e in m.get("files", []):
        for k in ("min", "max"):
            v = e.get(k)
            if isinstance(v, str) and v.endswith("+00:00"):
                e[k] = v[:-6]
    return m


def prune_files_topk(manifest: dict, k: int, ascending: bool = True) -> list[str]:
    """File prefix covering the global top-k by sort key.

    Files sorted by min (asc) / max (desc); accumulate until ≥ k rows, then
    keep every further file whose range can still contain a value ≤/≥ the
    bound B = worst stat of the chosen prefix — any top-k row has value
    within B, so the selection is sufficient (ties at range boundaries are
    the only extra files for non-overlapping ranges).

    Files with missing parquet column statistics (min/max None — e.g. an
    all-NULL sort column in that file) can't be ordered or pruned, so they
    are always included; they don't count toward the k-covering prefix or
    the bound, keeping the selection sufficient."""
    if k <= 0:
        return []
    fs = [e for e in manifest["files"]
          if e.get("min") is not None and e.get("max") is not None]
    no_stats = [e for e in manifest["files"]
                if e.get("min") is None or e.get("max") is None]
    # reverse=True (not value negation) so non-numeric sort keys — strings,
    # dates — order correctly in the descending case
    fs = (sorted(fs, key=lambda e: (e["min"], e["max"])) if ascending
          else sorted(fs, key=lambda e: (e["max"], e["min"]), reverse=True))
    chosen, cum = [], 0
    bound = None
    for e in fs:
        if cum < k:
            chosen.append(e)
            cum += e["rows"]
            continue
        if bound is None:
            # freeze the bound at the k-covering prefix: tie-appended files
            # must NOT extend it, else chained boundary ties cascade into a
            # full-table selection
            bound = (max(c["max"] for c in chosen) if ascending
                     else min(c["min"] for c in chosen))
        if (ascending and e["min"] <= bound) or \
           (not ascending and e["max"] >= bound):
            chosen.append(e)
        else:
            break
    return [e["file"] for e in chosen] + [e["file"] for e in no_stats]


def prune_files_range(manifest: dict, lo=None, hi=None) -> list[str]:
    """Files whose [min,max] intersects [lo,hi] (PointValues-style skip).
    Files with missing stats (all-NULL sort column) can't be skipped and
    are always included — same posture as prune_files_topk. Bounds pass
    through the same canonicalization the manifest stats were stored with
    (datetime/date/Decimal/bytes → sortable JSON forms)."""
    lo, hi = _canon_stat(lo), _canon_stat(hi)
    out = []
    for e in manifest["files"]:
        if e.get("min") is not None and e.get("max") is not None:
            if lo is not None and e["max"] < lo:
                continue
            if hi is not None and e["min"] > hi:
                continue
        out.append(e["file"])
    return out


def topk_sorted(spark: SparkSession, path: str, k: int,
                ascending: bool = True,
                columns: list[str] | None = None) -> DataFrame:
    """Early-terminated top-k over a write_sorted table: reads only the
    pruned file prefix, then a bounded sort+limit on that subset."""
    m = _load_manifest(path)
    files = prune_files_topk(m, k, ascending)
    if not files:  # empty table (manifest has no row-bearing files) / k<=0
        out = spark.read.parquet(path).where(F.lit(False))
        return out.select(*columns) if columns else out
    df = spark.read.parquet(*[os.path.join(path, f) for f in files])
    sc, tb = m["sort_col"], m["tiebreak_col"]
    order = ([F.asc(sc), F.asc(tb)] if ascending
             else [F.desc(sc), F.asc(tb)])
    out = df.orderBy(*order).limit(k)
    return out.select(*columns) if columns else out


def range_scan_sorted(spark: SparkSession, path: str,
                      lo=None, hi=None) -> DataFrame:
    """Range predicate over a write_sorted table with manifest file skip;
    the residual filter still applies (file stats are a superset)."""
    m = _load_manifest(path)
    files = prune_files_range(m, lo, hi)
    sc = m["sort_col"]
    if not files:
        return (spark.read.parquet(path).where(F.lit(False)))
    df = spark.read.parquet(*[os.path.join(path, f) for f in files])
    if lo is not None:
        df = df.where(F.col(sc) >= lo)
    if hi is not None:
        df = df.where(F.col(sc) <= hi)
    return df
