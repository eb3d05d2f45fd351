"""community_id ingest processor — network-flow hashing.

Reference: ``modules/ingest-common/src/main/java/org/opensearch/ingest/
common/CommunityIdProcessor.java`` (byte layout at
``generateCommunityIDHash``:413-431: seed(2B BE) + srcIP + dstIP +
proto(1B) + 0x00 pad + sport(2B BE) + dport(2B BE), SHA-1, base64,
``"1:"`` version prefix; directionality removed at :214-222 by putting
the smaller ``ip:port`` endpoint first; ICMP type/code become the ports
via the equivalence table at :486+ — echo 8↔0 etc.).

Everything is JVM column arithmetic: the packed flow tuple is built with
``hex/lpad/unhex`` byte plumbing and hashed with the built-in ``sha1`` —
whole-stage codegen, no UDFs, so at 100 TB the processor is a pure map
stage fused into whichever scan feeds it.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

PROTO_TCP, PROTO_UDP, PROTO_ICMP = 6, 17, 1

#: ICMPType.getEquivalentCode (CommunityIdProcessor.java:486-504): message
#: types whose reverse direction must hash identically map to the paired
#: type; everything else keeps its own code (one-way flow, tuple ordered).
ICMP_EQUIVALENT = {0: 8, 8: 0, 13: 14, 14: 13, 15: 16, 16: 15, 17: 18, 18: 17}


def _be_bytes(col: Column, nbytes: int) -> Column:
    """Big-endian fixed-width bytes of a non-negative integral column."""
    return F.unhex(F.lpad(F.hex(col.cast("bigint")), nbytes * 2, "0"))


def community_id(src_num: Column, dst_num: Column, sport: Column,
                 dport: Column, proto: int = PROTO_TCP,
                 seed: int = 0) -> Column:
    """``"1:" + base64(sha1(seed·src·dst·proto·pad·sport·dport))`` over
    uint32-valued IPv4 columns and integer ports, canonically ordered
    (smaller ip:port endpoint first) so both flow directions collide."""
    flip = (src_num > dst_num) | ((src_num == dst_num) & (sport > dport))
    a_ip = F.when(flip, dst_num).otherwise(src_num)
    b_ip = F.when(flip, src_num).otherwise(dst_num)
    a_p = F.when(flip, dport).otherwise(sport)
    b_p = F.when(flip, sport).otherwise(dport)
    data = F.concat(
        _be_bytes(F.lit(seed), 2), _be_bytes(a_ip, 4), _be_bytes(b_ip, 4),
        _be_bytes(F.lit(proto), 1), _be_bytes(F.lit(0), 1),
        _be_bytes(a_p, 2), _be_bytes(b_p, 2),
    )
    return F.concat(F.lit("1:"), F.base64(F.unhex(F.sha1(data))))


def icmp_ports(icmp_type: Column, icmp_code: Column) -> tuple[Column, Column]:
    """ICMP flows: type → source port; the equivalence table (or the raw
    code when no equivalent exists) → destination port."""
    dst = icmp_code
    for t, eq in ICMP_EQUIVALENT.items():
        dst = F.when(icmp_type == t, F.lit(eq)).otherwise(dst)
    return icmp_type, dst
