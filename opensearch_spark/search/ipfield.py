"""ip and range field types over derived deterministic columns.

The reference maps ``ip`` fields to indexed 128/32-bit points
(server/src/main/java/org/opensearch/index/mapper/IpFieldMapper.java:
term/CIDR/range queries via InetAddressPoint) and ``*_range`` fields to
range-encoded points with INTERSECTS / WITHIN / CONTAINS relations
(index/mapper/RangeFieldMapper.java, index/query/RangeQueryBuilder.java
relation handling); ``ip_range`` buckets live in
search/aggregations/bucket/range/BinaryRangeAggregator.java (registered
in SearchModule.java).

The test corpus has no ip or range columns, so — exactly like the geo
family — both are DERIVED deterministically from doc_id: a Knuth
multiplicative hash spreads doc ids uniformly over the IPv4 space, and a
per-doc [lo, hi] interval is a simple arithmetic function of the id. All
predicates are plain Catalyst comparisons on a long column: they push to
the parquet scan (row-group min/max skip), stay in whole-stage codegen,
and at 100 TB the CIDR prefix comparison is one shift per row — no UDFs,
no shuffles beyond the caller's aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# Knuth multiplicative hash constant — spreads sequential ids uniformly
# across the 32-bit IPv4 space; the same expression is used by the DuckDB
# oracles so the derivation is part of the gated contract
IP_HASH_MULT = 2654435761
IP_SPACE = 1 << 32


def ip_num_expr(id_col: str = "doc_id") -> Column:
    """Derived IPv4 address as a uint32-valued long."""
    return (F.col(id_col).cast("long") * F.lit(IP_HASH_MULT)) % F.lit(IP_SPACE)


def ip_str_expr(num: Column) -> Column:
    """Dotted-quad string from the numeric form (IpFieldMapper stores the
    binary point; _source/docvalues render the string)."""
    return F.concat_ws(
        ".",
        (F.shiftright(num, 24) % 256).cast("string"),
        (F.shiftright(num, 16) % 256).cast("string"),
        (F.shiftright(num, 8) % 256).cast("string"),
        (num % 256).cast("string"),
    )


def with_ip(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach the derived ``ip_num`` (long) + ``ip`` (string) columns."""
    num = ip_num_expr(id_col)
    return df.withColumn("ip_num", num).withColumn("ip", ip_str_expr(F.col("ip_num")))


def parse_ip(ip: str) -> int:
    a, b, c, d = (int(x) for x in ip.split("."))
    for o in (a, b, c, d):
        if not 0 <= o <= 255:
            raise ValueError(f"bad ipv4 octet in {ip!r}")
    return (a << 24) | (b << 16) | (c << 8) | d


def parse_cidr(cidr: str) -> tuple[int, int]:
    """'a.b.c.d/p' → inclusive [lo, hi] numeric block bounds."""
    addr, _, p = cidr.partition("/")
    prefix = int(p) if p else 32
    if not 0 <= prefix <= 32:
        raise ValueError(f"bad cidr prefix in {cidr!r}")
    n = parse_ip(addr)
    host_bits = 32 - prefix
    lo = (n >> host_bits) << host_bits if host_bits < 32 else 0
    hi = lo + (1 << host_bits) - 1 if host_bits < 32 else IP_SPACE - 1
    return lo, hi


def ip_term(df: DataFrame, ip: str) -> DataFrame:
    """Exact ip term query (IpFieldMapper.termQuery; a bare term may also
    be a CIDR — callers pass masks to ip_cidr explicitly here)."""
    return df.where(F.col("ip_num") == F.lit(parse_ip(ip)))


def ip_cidr(df: DataFrame, cidr: str) -> DataFrame:
    """CIDR containment as one numeric between — pushes to the scan."""
    lo, hi = parse_cidr(cidr)
    return df.where(F.col("ip_num").between(F.lit(lo), F.lit(hi)))


def ip_range(df: DataFrame, gte: str | None = None,
             lt: str | None = None) -> DataFrame:
    """ip range query (RangeQueryBuilder on an ip field): [gte, lt)."""
    out = df
    if gte is not None:
        out = out.where(F.col("ip_num") >= F.lit(parse_ip(gte)))
    if lt is not None:
        out = out.where(F.col("ip_num") < F.lit(parse_ip(lt)))
    return out


def ip_range_agg(df: DataFrame, ranges: list[dict]) -> DataFrame:
    """ip_range aggregation (BinaryRangeAggregator): each spec is
    {key, from?, to?} ([from, to), ES semantics) or {key, mask} (CIDR,
    inclusive). Returns (key, doc_count) in spec order; empty buckets
    surface with count 0 (keyed ranges always emit). One conditional-sum
    pass — a single aggregate, no per-bucket scans."""
    aggs = []
    for spec in ranges:
        key = spec["key"]
        if "mask" in spec:
            lo, hi = parse_cidr(spec["mask"])
            cond = F.col("ip_num").between(F.lit(lo), F.lit(hi))
        else:
            cond = F.lit(True)
            if spec.get("from") is not None:
                cond = cond & (F.col("ip_num") >= F.lit(parse_ip(spec["from"])))
            if spec.get("to") is not None:
                cond = cond & (F.col("ip_num") < F.lit(parse_ip(spec["to"])))
        # coalesce: sum() over ZERO rows is NULL — the keyed-bucket
        # contract says empty buckets surface with count 0 (round-4
        # review: an empty input emitted NULL doc_counts)
        aggs.append(F.coalesce(F.sum(F.when(cond, 1).otherwise(0)),
                               F.lit(0)).alias(key))
    row = df.agg(*aggs)
    # unpivot to (key, doc_count) preserving spec order
    pairs = []
    for spec in ranges:
        pairs += [F.lit(spec["key"]), F.col(spec["key"])]
    return (row.select(F.explode(F.create_map(*pairs)).alias("key", "doc_count"))
            .select("key", F.col("doc_count").cast("long").alias("doc_count")))


# ---------------- range field type ----------------

RANGE_LO_MOD = 97   # derived interval: lo = (id % 97) * 10
RANGE_SPAN_MOD = 7  # hi = lo + 5 + (id % 7)


def range_lo_expr(id_col: str = "doc_id") -> Column:
    return (F.col(id_col).cast("long") % RANGE_LO_MOD) * 10


def range_hi_expr(id_col: str = "doc_id") -> Column:
    return range_lo_expr(id_col) + 5 + (F.col(id_col).cast("long") % RANGE_SPAN_MOD)


def with_range_field(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach the derived integer_range field as (r_lo, r_hi), inclusive
    ends (RangeFieldMapper stores [min, max] per doc)."""
    return (df.withColumn("r_lo", range_lo_expr(id_col))
            .withColumn("r_hi", range_hi_expr(id_col)))


def range_field_query(df: DataFrame, lo: int, hi: int,
                      relation: str = "intersects") -> DataFrame:
    """Query a range FIELD with a range QUERY under a relation
    (RangeQueryBuilder.relation → RangeFieldMapper.RangeType queries):

    - intersects: field ∩ query ≠ ∅  → r_lo <= hi AND r_hi >= lo
    - within:     field ⊆ query      → r_lo >= lo AND r_hi <= hi
    - contains:   field ⊇ query      → r_lo <= lo AND r_hi >= hi
    """
    rels = {
        "intersects": (F.col("r_lo") <= F.lit(hi)) & (F.col("r_hi") >= F.lit(lo)),
        "within": (F.col("r_lo") >= F.lit(lo)) & (F.col("r_hi") <= F.lit(hi)),
        "contains": (F.col("r_lo") <= F.lit(lo)) & (F.col("r_hi") >= F.lit(hi)),
    }
    if relation not in rels:
        raise ValueError(f"unknown range relation {relation!r}")
    return df.where(rels[relation])
