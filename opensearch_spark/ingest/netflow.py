"""community_id ingest processor — network-flow hashing.

Reference: ``modules/ingest-common/src/main/java/org/opensearch/ingest/
common/CommunityIdProcessor.java`` (byte layout at
``generateCommunityIDHash``:413-431: seed(2B BE) + srcIP + dstIP +
proto(1B) + 0x00 pad + sport(2B BE) + dport(2B BE), SHA-1, base64,
``"1:"`` version prefix; directionality removed at :213-222 by putting
the smaller ``ip:port`` endpoint first — EXCEPT one-way ICMP flows,
whose tuple "is considered to be ordered" (`!isICMPProtocol ||
!isOneway` guard at :216); ICMP type/code become the ports via the
equivalence table at :486+ — echo 8↔0 etc., and a type absent from the
table marks the flow one-way).

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
#: type; a type with no entry means a ONE-WAY flow (isOneway=true at the
#: reference's :216 swap guard) whose tuple keeps src→dst order.
ICMP_EQUIVALENT = {0: 8, 8: 0, 9: 10, 10: 9, 13: 14, 14: 13, 15: 16,
                   16: 15, 17: 18, 18: 17}


def _be_bytes(col: Column, nbytes: int) -> Column:
    """Big-endian fixed-width bytes of a non-negative integral column.
    Out-of-range input (negative, or wider than ``nbytes``) yields NULL —
    which nulls the whole digest via concat — rather than silently
    truncating the hex to a plausible-looking wrong prefix."""
    hexed = F.hex(col.cast("bigint"))
    ok = (col >= 0) & (F.length(hexed) <= 2 * nbytes)
    return F.when(ok, F.unhex(F.lpad(hexed, nbytes * 2, "0")))


def canonical_endpoints(src_num: Column, dst_num: Column, sport: Column,
                        dport: Column, ordered: Column | bool = False,
                        ) -> tuple[Column, Column, Column, Column]:
    """(a_ip, b_ip, a_port, b_port): the smaller ``ip:port`` endpoint
    first (CommunityIdProcessor.compareIPAndPort:454-456), UNLESS
    ``ordered`` — one-way ICMP flows keep src→dst order (:216). Shared by
    ``community_id`` and the gate so the ordering rule lives once."""
    greater = (src_num > dst_num) | ((src_num == dst_num) & (sport > dport))
    if isinstance(ordered, Column):
        flip = greater & ~ordered
    else:
        flip = F.lit(False) if ordered else greater
    a_ip = F.when(flip, dst_num).otherwise(src_num)
    b_ip = F.when(flip, src_num).otherwise(dst_num)
    a_p = F.when(flip, dport).otherwise(sport)
    b_p = F.when(flip, sport).otherwise(dport)
    return a_ip, b_ip, a_p, b_p


def community_id(src_num: Column, dst_num: Column, sport: Column,
                 dport: Column, proto: int = PROTO_TCP,
                 seed: int = 0, ordered: Column | bool = False) -> Column:
    """``"1:" + base64(sha1(seed·src·dst·proto·pad·sport·dport))`` over
    uint32-valued IPv4 columns and integer ports, canonically ordered
    (smaller ip:port endpoint first) so both flow directions collide —
    except ``ordered`` flows (one-way ICMP), which hash as-is."""
    a_ip, b_ip, a_p, b_p = canonical_endpoints(
        src_num, dst_num, sport, dport, ordered)
    data = F.concat(
        _be_bytes(F.lit(seed), 2), _be_bytes(a_ip, 4), _be_bytes(b_ip, 4),
        _be_bytes(F.lit(proto), 1), _be_bytes(F.lit(0), 1),
        _be_bytes(a_p, 2), _be_bytes(b_p, 2),
    )
    return F.concat(F.lit("1:"), F.base64(F.unhex(F.sha1(data))))


def icmp_ports(icmp_type: Column, icmp_code: Column,
               ) -> tuple[Column, Column, Column]:
    """ICMP flows: (source port, destination port, one_way). Type → source
    port; the equivalence table → destination port, falling back to the
    raw code for types with no equivalent — those flows are ONE-WAY
    (``one_way`` true) and must be passed as ``ordered`` to
    ``community_id`` (CommunityIdProcessor.java:188-211,216)."""
    dst = icmp_code
    for t, eq in ICMP_EQUIVALENT.items():
        dst = F.when(icmp_type == t, F.lit(eq)).otherwise(dst)
    one_way = ~icmp_type.isin(*ICMP_EQUIVALENT.keys())
    return icmp_type, dst, one_way
