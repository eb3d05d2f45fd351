"""Document versioning + routing: the reference's write-path concurrency
and shard-placement semantics, re-expressed as deterministic columnar ops.

- ``upsert_versioned``: optimistic-concurrency upsert (InternalEngine
  versioned indexing, ``VersionFieldMapper.java``; seq_no/primary_term in
  ``SeqNoFieldMapper.java``): for each document id the highest version
  wins, ties broken by a deterministic writer order — exactly what a
  last-writer-wins bulk upsert into an index produces. One groupBy with a
  max_by struct; at 100 TB this is a single hash shuffle of the combined
  change stream (the base table never rewrites in place — parquet is
  immutable like segments, the upsert produces the next snapshot).
- ``routing_partition``: custom routing (``_routing``,
  ``cluster/routing/OperationRouting.java``: shard = hash(routing) %
  num_shards). The reference uses murmur3; we use the first-8-hex-of-md5
  integer hash so the DuckDB oracle reproduces the assignment bit-for-bit
  (the hash function is an implementation detail, the CONTRACT is a
  deterministic total map routing→shard that colocates equal keys).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def upsert_versioned(base: DataFrame, updates: DataFrame,
                     id_col: str = "doc_id",
                     version_col: str = "version") -> DataFrame:
    """Last-writer-wins merge of base + updates snapshots: max version per
    id; on equal versions the row with the greater ``_writer`` tag wins
    (updates=1 beats base=0 — the reference's 'index overwrites' path)."""
    cols = base.columns
    if set(cols) != set(updates.columns):
        raise ValueError("upsert_versioned: base/updates schemas differ")
    if "_writer" in cols:
        # withColumn would silently replace the user's column with the
        # internal winner tag (the assign_doc_ids reserved-column rule)
        raise ValueError(
            "upsert_versioned: input column '_writer' collides with the "
            "internal writer tag — rename it first")
    tagged = (base.withColumn("_writer", F.lit(0))
              .unionByName(updates.withColumn("_writer", F.lit(1))))
    payload = [c for c in cols if c not in (id_col, version_col)]
    # max_by on EXACTLY (version, _writer): payload columns must not
    # influence the winner (LWW is decided by version + writer order
    # alone) and must not need to be orderable (a map payload column
    # would make a max-of-struct comparator fail outright). Duplicate
    # (id, version) rows within ONE snapshot are a caller error — each
    # side is a snapshot with one row per id.
    key = F.struct(F.col(version_col), F.col("_writer"))
    val = F.struct(F.col(version_col),
                   *[F.col(c) for c in payload])
    won = (tagged.groupBy(id_col)
           .agg(F.max_by(val, key).alias("_w")))
    out_cols = ([F.col(id_col), F.col(f"_w.{version_col}").alias(version_col)]
                + [F.col(f"_w.{c}").alias(c) for c in payload])
    return won.select(*out_cols)


def routing_partition(df: DataFrame, routing_col: str,
                      n_shards: int) -> DataFrame:
    """Add a ``shard`` column: the NON-RESIZABLE-index posture of the
    reference's one routing formula (OperationRouting.java: shard =
    hash % routingNumShards / routingFactor) with routingNumShards ==
    n_shards, i.e. factor 1 — which reduces to hash % n_shards. Shares
    the exact bucket/shard helpers the resize family uses, so the two
    postures can never drift; an index that must support _split/_shrink
    uses routing_bucket/shard_for with the 1024-bucket space instead."""
    return df.withColumn(
        "shard",
        shard_for(routing_bucket(routing_col, routing_num_shards=n_shards),
                  n_shards, routing_num_shards=n_shards))


# --------------------------------------------------------------------------
# resize-safe routing (_split / _shrink)
# Reference: ``cluster/metadata/MetadataCreateIndexService.java``
# (getIndexNumberOfRoutingShards — every index carries a FIXED
# routingNumShards, a power of two >= the primary count),
# ``cluster/routing/OperationRouting.java`` (shardId = hash(routing) %
# routingNumShards / routingFactor), ``cluster/metadata/IndexMetadata.java``
# (selectSplitShard / selectShrinkShards),
# ``action/admin/indices/shrink/ResizeRequest.java``. Because a document's
# hash BUCKET never changes, resizing an index only changes the divisor:
# split N -> k*N sends parent shard i's docs to exactly child shards
# [i*k, (i+1)*k); shrink N -> N/k merges parent shards [j*k, (j+1)*k) into
# child j. No doc ever moves between unrelated shards — recovery is a
# local segment copy, which is what makes resize cheap in the reference
# and a pure metadata + repartition operation here.
# --------------------------------------------------------------------------

ROUTING_NUM_SHARDS = 1024


def routing_bucket(routing_col: str,
                   routing_num_shards: int = ROUTING_NUM_SHARDS,
                   id_col: str | None = None) -> F.Column:
    """The doc's permanent hash bucket (md5-derived like
    routing_partition, so the DuckDB oracle reproduces it bit-for-bit).

    A NULL routing value would hash to a NULL bucket and the row would
    silently land in a NULL shard (unreachable by any shard-equality
    lookup — round-4 review). Pass ``id_col`` to mirror the reference's
    fallback (OperationRouting: missing _routing routes by _id); with
    no fallback a NULL routing value raises at assignment time via the
    raise_error branch."""
    routing = F.col(routing_col).cast("string")
    if id_col is not None:
        routing = F.coalesce(routing, F.col(id_col).cast("string"))
    routing = F.when(routing.isNull(),
                     F.raise_error(F.lit(
                         f"routing_bucket: NULL {routing_col} value — "
                         "provide id_col for the _id fallback or clean "
                         "the routing column"))
                     ).otherwise(routing)
    h = F.conv(F.substring(F.md5(routing), 1, 8), 16, 10).cast("long")
    return (h % routing_num_shards).cast("int")


def shard_for(bucket: F.Column, n_shards: int,
              routing_num_shards: int = ROUTING_NUM_SHARDS) -> F.Column:
    """shard = bucket / routingFactor (OperationRouting.java). n_shards
    must divide routingNumShards (the reference enforces the same)."""
    if routing_num_shards % n_shards:
        raise ValueError(
            f"n_shards={n_shards} must divide routingNumShards="
            f"{routing_num_shards}")
    return (bucket / (routing_num_shards // n_shards)).cast("int")


def resize_routing(df: DataFrame, routing_col: str,
                   n_parent: int, n_child: int) -> DataFrame:
    """Doc→shard maps before and after a resize (split when
    n_child > n_parent, shrink when smaller; both must divide
    routingNumShards). Adds ``parent_shard`` and ``child_shard``; the
    IndexMetadata invariant (split: child/factor == parent; shrink:
    child == parent/factor) holds row-by-row by construction and is
    test-asserted."""
    b = routing_bucket(routing_col)
    return (df.withColumn("parent_shard", shard_for(b, n_parent))
            .withColumn("child_shard", shard_for(b, n_child)))
