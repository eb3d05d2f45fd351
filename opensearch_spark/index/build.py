"""Inverted-index build: corpus DataFrame → docs / postings / dictionary /
stats tables (SURVEY.md §1.3 data model).

Mirrors the reference's write path behaviorally (analysis in
``index/mapper/DocumentParser.java:77``, Lucene segment write in
``index/engine/InternalEngine.java:1107-1186``, tiered merge in
``index/TieredMergePolicyProvider.java``) but is architected for Spark:

- one declarative DataFrame plan: analyze (Arrow UDF) → posexplode →
  groupBy(term, doc) partial-agg → groupBy(term, bucket) applyInPandas block
  encode → partitioned parquet write;
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

from opensearch_spark.analysis import analyze_udf
from opensearch_spark.index.codec import make_blocks
from opensearch_spark.scoring.smallfloat import encode_norms

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
    """Deterministic dense doc_id without a single-partition global window.

    Range-partition + sort by ``order_cols``, count rows per partition (tiny
    collect), then add per-partition offsets in one mapInPandas pass — the
    standard scalable zipWithIndex. Ties in order_cols would make ids
    nondeterministic, so order_cols must be a unique key.
    """
    from pyspark import TaskContext

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
    offsets = {}
    acc = 0
    for pid in sorted(by_pid):
        offsets[pid] = acc
        acc += by_pid[pid]
    out_schema = T.StructType(
        sorted_df.schema.fields + [T.StructField("doc_id", T.LongType(), False)]
    )

    def add_ids(it):
        pid = TaskContext.get().partitionId()
        nxt = offsets.get(pid, 0)
        for pdf in it:
            pdf = pdf.copy()
            pdf["doc_id"] = range(nxt, nxt + len(pdf))
            nxt += len(pdf)
            yield pdf

    return sorted_df.mapInPandas(add_ids, out_schema)


def _block_encode_fn(k1: float, b: float, avgdl: float):
    def encode(pdf: pd.DataFrame) -> pd.DataFrame:
        term = pdf["term"].iloc[0]
        bucket = int(pdf["bucket"].iloc[0])
        docs = pdf["doc_id"].to_numpy()
        tfs = pdf["tf"].to_numpy()
        dl = pdf["dl"].to_numpy().astype("float64")
        tf64 = tfs.astype("float64")
        impact = tf64 / (tf64 + k1 * (1.0 - b + b * dl / avgdl))
        rows = make_blocks(docs, tfs, impact, dls=pdf["dl"].to_numpy())
        return pd.DataFrame(
            [(term, bucket) + r for r in rows],
            columns=[
                "term", "bucket", "block_seq", "first_doc", "last_doc",
                "n", "max_tf", "max_impact", "docs_vb", "tfs_vb", "dls_vb",
            ],
        )

    return encode


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

    analyzed = docs_src.withColumn("_tokens", analyze_udf(cfg.analyzer)(F.col(cfg.field)))
    analyzed = analyzed.persist()

    # --- docs (stored fields + norms + per-row invariant) ---
    docs = analyzed.select(
        "doc_id",
        *[c for c in docs_src.columns if c != "doc_id"],
        F.size("_tokens").alias("dl"),
        F.sha2(F.col(cfg.field), 256).alias("content_sha256"),
    )
    docs.write.mode("overwrite").parquet(os.path.join(out_dir, "docs"))

    # --- flat postings: (term, doc_id, tf[, positions]) ---
    exploded = analyzed.select(
        "doc_id", F.posexplode("_tokens").alias("pos", "term")
    )
    flat = exploded.groupBy("term", "doc_id").agg(
        F.count("*").alias("tf"),
        *(
            [F.sort_array(F.collect_list("pos")).alias("positions")]
            if cfg.with_positions
            else []
        ),
    )
    # flat feeds the positions write, the dictionary agg AND the block
    # encode — persist so the explode+groupBy shuffle runs once
    flat_cached = flat = flat.persist()
    if cfg.with_positions:
        flat.select("term", "doc_id", "positions").write.mode("overwrite").parquet(
            os.path.join(out_dir, "positions")
        )
        flat = flat.drop("positions")

    # --- stats (avgdl) + dictionary (df, cf) ---
    stats_row = (
        analyzed.agg(
            F.count("*").alias("doc_count"),
            F.sum(F.size("_tokens")).alias("sum_dl"),
        ).collect()[0]
    )
    doc_count, sum_dl = stats_row["doc_count"], int(stats_row["sum_dl"] or 0)
    avgdl = sum_dl / doc_count if doc_count else 0.0
    spark.createDataFrame(
        [(doc_count, sum_dl, float(avgdl))], "doc_count long, sum_dl long, avgdl double"
    ).write.mode("overwrite").parquet(os.path.join(out_dir, "stats"))

    dictionary = flat.groupBy("term").agg(
        F.count("*").alias("df"), F.sum("tf").alias("cf")
    )
    dictionary.write.mode("overwrite").parquet(os.path.join(out_dir, "dictionary"))

    # --- blocked postings: shuffle on (term, bucket) → applyInPandas encode ---
    with_dl = flat.join(
        analyzed.select("doc_id", F.size("_tokens").alias("dl")), "doc_id"
    )
    bucketed = with_dl.withColumn(
        "bucket", (F.col("doc_id") / F.lit(cfg.bucket_span)).cast("long")
    )
    blocks = bucketed.groupBy("term", "bucket").applyInPandas(
        _block_encode_fn(cfg.k1, cfg.b, avgdl), BLOCK_SCHEMA
    )
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
    flat_cached.unpersist()
    meta = dict(asdict(cfg), doc_count=doc_count, sum_dl=sum_dl, avgdl=avgdl)
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
