"""Inverted-index build: corpus DataFrame → docs / postings / dictionary /
stats tables (SURVEY.md §1.3 data model).

Mirrors the reference's write path behaviorally (analysis in
``index/mapper/DocumentParser.java:77``, Lucene segment write in
``index/engine/InternalEngine.java:1107-1186``, tiered merge in
``index/TieredMergePolicyProvider.java``) but is architected for Spark:

- one declarative DataFrame plan: analyze + per-doc tf (ONE Arrow UDF pass,
  map-side combine inside the tokenizer) → narrow explode → (term, bucket)
  repartition + sorted batch block encode (mapInPandas) → partitioned
  parquet write; the only wide shuffles are the postings repartition and
  the dictionary agg;
- **skew by construction**: blocks are built per (term, doc-bucket) group, so
  a hot term ('import', 'def' class — present in >60% of docs) is spread
  across ~n_docs/bucket_span independent groups instead of one giant reducer
  (the reference's analog is ``index.routing_partition_size``,
  ``OperationRouting.java:464``). AQE handles residual imbalance.
- 100 TB story: every stage is a hash shuffle on (term) or (term, bucket);
  no driver-side data, no global windows, no collect of anything O(N).
"""

from __future__ import annotations

import json
import os
from dataclasses import asdict, dataclass, field as dc_field

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

from opensearch_spark.analysis import termfreq_udf

LAYOUT_VERSION = 2  # bump on any on-disk format change (invalidates caches)

BLOCK_SCHEMA = (
    "term string, bucket long, block_seq int, first_doc long, last_doc long, "
    "n int, max_tf int, max_impact double, docs_vb binary, tfs_vb binary, "
    "dls_vb binary"
)


@dataclass(frozen=True)
class IndexConfig:
    field: str = "content"
    analyzer: str = "standard_code"
    id_col: str | None = None          # pre-existing dense id; None → assign
    order_cols: tuple = ()             # deterministic doc_id order (e.g. repo,path,commit)
    keyword_cols: tuple = ()           # exact-match filter columns kept in docs
    n_parts: int = 8                   # term-hash write partitions (dir pruning)
    bucket_span: int = 1 << 15         # doc_ids per posting bucket (skew control)
    k1: float = 1.2
    b: float = 0.75
    with_positions: bool = False


def assign_doc_ids(df: DataFrame, order_cols: list[str], n_parts: int = 32) -> DataFrame:
    """Deterministic dense doc_id without a single-partition global window —
    and without sending the corpus through Python.

    Range-partition + sort by ``order_cols``, count rows per partition (tiny
    collect), then ``doc_id = partition_offset + within-partition sequence``
    where the sequence comes from ``monotonically_increasing_id`` (pid<<33 |
    row-in-partition, follows the partition's sort order) — the scalable
    zipWithIndex, entirely JVM-side. Ties in order_cols would make ids
    nondeterministic, so order_cols must be a unique key.
    """
    sorted_df = df.repartitionByRange(n_parts, *order_cols).sortWithinPartitions(
        *order_cols
    )
    sorted_df = sorted_df.persist()
    counts = (
        sorted_df.select(F.spark_partition_id().alias("pid"))
        .groupBy("pid")
        .count()
        .collect()
    )
    by_pid = {r["pid"]: r["count"] for r in counts}
    offsets, acc = {}, 0
    for pid in sorted(by_pid):
        offsets[pid] = acc
        acc += by_pid[pid]
    spark = sorted_df.sparkSession
    off_df = spark.createDataFrame(
        [(int(p), int(o)) for p, o in offsets.items()], "_pid int, _off long")
    mid = F.monotonically_increasing_id()
    with_mid = sorted_df.withColumn("_pid", F.spark_partition_id()).withColumn(
        "_seq", mid - (mid.bitwiseAND(F.lit(-(1 << 33)))))
    out = (with_mid.join(F.broadcast(off_df), "_pid")
           .withColumn("doc_id", F.col("_off") + F.col("_seq"))
           .drop("_pid", "_seq", "_off"))
    return out


def _block_encode_map_fn(k1: float, b: float, avgdl: float):
    """Batch-path block encoder: ``mapInPandas`` over partitions that are
    hash-partitioned AND sorted by (term, bucket, doc_id).

    Why not ``groupBy().applyInPandas``: with 10^7-10^9 tiny (term, bucket)
    groups the per-group pandas overhead (~0.5 ms) dominates wall-clock and
    AQE coalesces the shuffle below the cluster's parallelism (measured 3×
    slower at local[32]). Here group boundaries are numpy slices inside each
    ~10k-row Arrow batch and one output DataFrame is built per batch, not
    per group; groups spanning batch boundaries are stitched via carry-over
    (bounded by bucket_span rows)."""
    import numpy as np

    from opensearch_spark.index.codec import make_blocks_batch

    cols = ["term", "bucket", "block_seq", "first_doc", "last_doc",
            "n", "max_tf", "max_impact", "docs_vb", "tfs_vb", "dls_vb"]

    def encode_range(pdf: pd.DataFrame, lo: int, hi: int,
                     starts: np.ndarray) -> pd.DataFrame | None:
        """Encode rows [lo, hi) of the batch; ``starts`` are group starts
        within that range (absolute indices, starts[0] == lo)."""
        if hi <= lo:
            return None
        tfs = pdf["tf"].to_numpy()[lo:hi]
        dls = pdf["dl"].to_numpy()[lo:hi]
        tf64 = tfs.astype("float64")
        impact = tf64 / (tf64 + k1 * (1.0 - b + b * dls.astype("float64") / avgdl))
        rows = make_blocks_batch(
            pdf["term"].to_numpy()[lo:hi],
            pdf["bucket"].to_numpy()[lo:hi],
            pdf["doc_id"].to_numpy()[lo:hi],
            tfs, impact, dls, starts - lo,
        )
        return pd.DataFrame(rows, columns=cols) if rows else None

    def run(batches):
        pend: pd.DataFrame | None = None
        for pdf in batches:
            if pend is not None:
                pdf = pd.concat([pend, pdf], ignore_index=True)
                pend = None
            if not len(pdf):
                continue
            t = pdf["term"].to_numpy()
            bk = pdf["bucket"].to_numpy()
            change = np.flatnonzero((t[1:] != t[:-1]) | (bk[1:] != bk[:-1])) + 1
            starts = np.concatenate(([0], change))
            # hold the last (possibly batch-spanning) group back for stitching
            last_start = int(starts[-1])
            out = encode_range(pdf, 0, last_start, starts[:-1])
            pend = pdf.iloc[last_start:].reset_index(drop=True)
            if out is not None:
                yield out
        if pend is not None and len(pend):
            out = encode_range(pend, 0, len(pend), np.zeros(1, dtype=np.int64))
            if out is not None:
                yield out

    return run


def encode_blocks(df: DataFrame, k1: float, b: float, avgdl: float,
                  n_shuffle: int) -> DataFrame:
    """(term, doc_id, tf, dl, bucket) rows → encoded block rows.

    Explicit-numPartitions repartition so AQE cannot coalesce below the
    cluster's parallelism (the python encode cost per row is invisible to
    AQE's byte-based sizing); local sort, then the batch encoder above."""
    return (
        df.repartition(n_shuffle, "term", "bucket")
        .sortWithinPartitions("term", "bucket", "doc_id")
        .mapInPandas(_block_encode_map_fn(k1, b, avgdl), BLOCK_SCHEMA)
    )


def build_index(
    spark: SparkSession,
    corpus: DataFrame,
    out_dir: str,
    config: IndexConfig = IndexConfig(),
) -> "InvertedIndex":
    """Full batch build. Writes the §1.3 tables under ``out_dir``."""
    cfg = config
    if cfg.id_col is None:
        docs_src = assign_doc_ids(corpus, list(cfg.order_cols))
    else:
        docs_src = corpus.withColumn("doc_id", F.col(cfg.id_col).cast("long"))

    # analysis + per-doc tf aggregation in ONE python pass (map-side
    # combine inside the tokenizer, see termfreq_udf): the cached frame
    # holds per-doc parallel arrays, and the former (term, doc_id) groupBy
    # of the full exploded token stream disappears entirely
    analyzed = docs_src.withColumn(
        "_tf", termfreq_udf(cfg.analyzer, cfg.with_positions)(F.col(cfg.field)))
    analyzed = analyzed.persist()

    # --- docs (stored fields + norms + per-row invariant) ---
    docs = analyzed.select(
        "doc_id",
        *[c for c in docs_src.columns if c != "doc_id"],
        F.col("_tf.dl").alias("dl"),
        F.sha2(F.col(cfg.field), 256).alias("content_sha256"),
    )
    docs.write.mode("overwrite").parquet(os.path.join(out_dir, "docs"))

    # --- flat postings: narrow explode of the cached per-doc arrays ---
    zip_expr = ("arrays_zip(_tf.terms, _tf.tfs, _tf.poss)"
                if cfg.with_positions else "arrays_zip(_tf.terms, _tf.tfs)")
    flat = analyzed.select(
        "doc_id", F.col("_tf.dl").alias("dl"),
        F.explode(F.expr(zip_expr)).alias("z"),
    ).select(
        F.col("z.terms").alias("term"), "doc_id",
        F.col("z.tfs").cast("long").alias("tf"), "dl",
        *([F.col("z.poss").alias("positions")] if cfg.with_positions else []),
    )
    if cfg.with_positions:
        flat.select("term", "doc_id", "positions").write.mode("overwrite").parquet(
            os.path.join(out_dir, "positions")
        )
        flat = flat.drop("positions")

    # --- dictionary (df, cf), then stats derived from it ---
    dictionary = flat.groupBy("term").agg(
        F.count("*").alias("df"), F.sum("tf").alias("cf")
    )
    dictionary.write.mode("overwrite").parquet(os.path.join(out_dir, "dictionary"))

    # stats without another full corpus pass: doc_count from the written
    # docs table's parquet footers (metadata-only count), sum_dl = Σ cf
    # over the (small) dictionary — Σ collection freq ≡ total token count
    doc_count = int(spark.read.parquet(os.path.join(out_dir, "docs")).count())
    sum_row = (spark.read.parquet(os.path.join(out_dir, "dictionary"))
               .agg(F.sum("cf").alias("s")).collect()[0])
    sum_dl = int(sum_row["s"] or 0)
    avgdl = sum_dl / doc_count if doc_count else 0.0
    spark.createDataFrame(
        [(doc_count, sum_dl, float(avgdl))], "doc_count long, sum_dl long, avgdl double"
    ).write.mode("overwrite").parquet(os.path.join(out_dir, "stats"))

    # --- blocked postings: shuffle on (term, bucket) → batch block encode ---
    bucketed = flat.withColumn(
        "bucket", (F.col("doc_id") / F.lit(cfg.bucket_span)).cast("long")
    )
    n_shuffle = int(spark.conf.get("spark.sql.shuffle.partitions"))
    blocks = encode_blocks(bucketed, cfg.k1, cfg.b, avgdl, n_shuffle)
    blocks = blocks.withColumn(
        "part", F.pmod(F.xxhash64("term"), F.lit(cfg.n_parts)).cast("int")
    )
    (
        blocks.repartition(cfg.n_parts, "part")
        .sortWithinPartitions("term", "bucket", "block_seq")
        .write.mode("overwrite")
        .partitionBy("part")
        .parquet(os.path.join(out_dir, "postings"))
    )

    analyzed.unpersist()
    meta = dict(asdict(cfg), doc_count=doc_count, sum_dl=sum_dl, avgdl=avgdl)
    meta["layout_version"] = LAYOUT_VERSION
    meta["order_cols"] = list(cfg.order_cols)
    meta["keyword_cols"] = list(cfg.keyword_cols)
    _atomic_write_json(os.path.join(out_dir, "meta.json"), meta)
    return InvertedIndex(out_dir)


def _atomic_write_json(path: str, obj) -> None:
    # two-phase write (temp + atomic rename), same discipline as the
    # reference translog checkpoint (Translog.java:277-283)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f, indent=1)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


class InvertedIndex:
    """Query-side handle over a built index directory."""

    def __init__(self, path: str):
        self.path = path
        with open(os.path.join(path, "meta.json")) as f:
            self.meta = json.load(f)
        self._cached: dict[str, DataFrame] = {}

    def cache(self, spark: SparkSession) -> "InvertedIndex":
        """Pin the index tables in executor memory (`df.persist()`), the
        analog of the reference's filesystem/page cache + filter bitset
        cache (`indices/IndicesQueryCache.java`). Optional: sized for
        query-serving deployments where the postings fit cluster memory;
        the uncached path streams from parquet and scales to any size."""
        names = ["docs", "postings", "dictionary"]
        if self.meta.get("with_positions"):
            names.append("positions")
        for n in names:
            if n not in self._cached:
                self._cached[n] = spark.read.parquet(
                    os.path.join(self.path, n)).persist()
        return self

    @property
    def n_parts(self) -> int:
        return int(self.meta["n_parts"])

    @property
    def analyzer(self) -> str:
        return self.meta["analyzer"]

    @property
    def doc_count(self) -> int:
        return int(self.meta["doc_count"])

    @property
    def avgdl(self) -> float:
        return float(self.meta["avgdl"])

    def _table(self, spark: SparkSession, name: str) -> DataFrame:
        if name in self._cached:
            return self._cached[name]
        return spark.read.parquet(os.path.join(self.path, name))

    def docs(self, spark: SparkSession) -> DataFrame:
        return self._table(spark, "docs")

    def postings(self, spark: SparkSession) -> DataFrame:
        return self._table(spark, "postings")

    def dictionary(self, spark: SparkSession) -> DataFrame:
        return self._table(spark, "dictionary")

    def positions(self, spark: SparkSession) -> DataFrame:
        return self._table(spark, "positions")

    def postings_for_terms(self, spark: SparkSession, terms: list[str]) -> DataFrame:
        """Term-pruned posting-block scan: directory pruning via ``part`` +
        parquet min/max row-group skipping via the sorted ``term`` column."""
        if not terms:
            return self.postings(spark).limit(0)
        parts = sorted(
            {r["p"] for r in
             spark.createDataFrame([(t,) for t in terms], "term string")
             .select(F.pmod(F.xxhash64("term"), F.lit(self.n_parts)).cast("int").alias("p"))
             .collect()}
        )
        df = self.postings(spark)
        return df.where(F.col("part").isin(parts) & F.col("term").isin(terms))

    def verify_sha256(self, spark: SparkSession, corpus: DataFrame, field: str = None) -> int:
        """Per-row invariant (BASELINE.json): sha256(content) equality between
        the built docs table and the source corpus. Returns #mismatches."""
        field = field or self.meta["field"]
        src = corpus.select(F.sha2(F.col(field), 256).alias("src_sha"))
        built = self.docs(spark).select(F.col("content_sha256").alias("src_sha"))
        # multiset equality via full-outer count compare
        a = src.groupBy("src_sha").count().withColumnRenamed("count", "a")
        b = built.groupBy("src_sha").count().withColumnRenamed("count", "b")
        j = a.join(b, "src_sha", "full_outer").where(
            F.coalesce("a", F.lit(0)) != F.coalesce("b", F.lit(0))
        )
        return j.count()
