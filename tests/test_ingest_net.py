"""community_id flow hashing vs an independent hashlib construction.

Reference behavior: ``modules/ingest-common/.../CommunityIdProcessor.java``
(generateCommunityIDHash:413-431 byte layout; endpoint ordering :214-222;
ICMP equivalence table :486+).
"""

import base64
import hashlib
import struct

from pyspark.sql import functions as F

from opensearch_spark.ingest.netflow import (
    ICMP_EQUIVALENT, PROTO_ICMP, PROTO_TCP, PROTO_UDP, community_id,
    icmp_ports,
)


def _ref_cid(src: int, dst: int, sport: int, dport: int,
             proto: int, seed: int = 0) -> str:
    """Independent reimplementation: struct-packed bytes + hashlib sha1."""
    if (src, sport) > (dst, dport):
        src, dst, sport, dport = dst, src, dport, sport
    data = (struct.pack(">H", seed) + struct.pack(">I", src)
            + struct.pack(">I", dst) + struct.pack(">BB", proto, 0)
            + struct.pack(">HH", sport, dport))
    return "1:" + base64.b64encode(hashlib.sha1(data).digest()).decode()


FLOWS = [
    # (src, dst, sport, dport) — both swap branches + equal-ip tie
    (0x0102_0304, 0x0506_0708, 1122, 3344),
    (0x0506_0708, 0x0102_0304, 3344, 1122),   # reverse direction
    (0xC0A8_0001, 0x0A00_0001, 80, 50000),
    (0x0A00_0001, 0x0A00_0001, 9999, 53),     # equal ips, port tiebreak
    (0, 0xFFFF_FFFF, 0, 65535),               # extremes
]


class TestCommunityId:
    def test_matches_hashlib_tcp_udp(self, spark):
        df = spark.createDataFrame(
            FLOWS, "src long, dst long, sport long, dport long")
        for proto in (PROTO_TCP, PROTO_UDP):
            got = [r["cid"] for r in df.select(
                community_id(F.col("src"), F.col("dst"), F.col("sport"),
                             F.col("dport"), proto).alias("cid")).collect()]
            want = [_ref_cid(*f, proto) for f in FLOWS]
            assert got == want, proto

    def test_direction_invariant(self, spark):
        df = spark.createDataFrame(
            FLOWS[:1] + FLOWS[1:2], "src long, dst long, sport long, dport long")
        cids = [r["cid"] for r in df.select(
            community_id(F.col("src"), F.col("dst"), F.col("sport"),
                         F.col("dport")).alias("cid")).collect()]
        assert cids[0] == cids[1]  # A→B and B→A hash identically

    def test_seed_changes_hash(self, spark):
        df = spark.createDataFrame(FLOWS[:1],
                                   "src long, dst long, sport long, dport long")
        a = df.select(community_id(F.col("src"), F.col("dst"), F.col("sport"),
                                   F.col("dport"), seed=0).alias("c")).first()["c"]
        b = df.select(community_id(F.col("src"), F.col("dst"), F.col("sport"),
                                   F.col("dport"), seed=7).alias("c")).first()["c"]
        assert a != b
        assert a == _ref_cid(*FLOWS[0], PROTO_TCP, 0)
        assert b == _ref_cid(*FLOWS[0], PROTO_TCP, 7)

    def test_icmp_port_mapping(self, spark):
        rows = [(8, 0), (0, 0), (13, 0), (3, 5), (11, 1)]
        df = spark.createDataFrame(rows, "t long, c long")
        sp, dp, ow = icmp_ports(F.col("t"), F.col("c"))
        got = [(r["sp"], r["dp"], r["ow"]) for r in
               df.select(sp.alias("sp"), dp.alias("dp"),
                         ow.alias("ow")).collect()]
        want = [(t, ICMP_EQUIVALENT.get(t, c), t not in ICMP_EQUIVALENT)
                for t, c in rows]
        assert got == want

    def test_icmp_echo_pair_collides(self, spark):
        # echo request (8,0) from A→B and echo reply (0,8→mapped) B→A
        df = spark.createDataFrame(
            [(0x01020304, 0x05060708, 8), (0x05060708, 0x01020304, 0)],
            "src long, dst long, t long")
        sp, dp, ow = icmp_ports(F.col("t"), F.lit(0))
        cids = [r["c"] for r in df.select(
            community_id(F.col("src"), F.col("dst"), sp.cast("long"),
                         dp.cast("long"), PROTO_ICMP, ordered=ow)
            .alias("c")).collect()]
        assert cids[0] == cids[1]

    def test_icmp_one_way_keeps_src_dst_order(self, spark):
        # dest-unreachable (type 3): no equivalence entry → one-way flow;
        # the reference SKIPS the endpoint swap (`!isICMPProtocol ||
        # !isOneway` at CommunityIdProcessor.java:216) even when
        # src > dst, so the tuple hashes in src→dst order
        src, dst, t, c = 0x05060708, 0x01020304, 3, 5
        df = spark.createDataFrame([(src, dst, t, c)],
                                   "src long, dst long, t long, c long")
        sp, dp, ow = icmp_ports(F.col("t"), F.col("c"))
        got = df.select(
            community_id(F.col("src"), F.col("dst"), sp.cast("long"),
                         dp.cast("long"), PROTO_ICMP, ordered=ow)
            .alias("cid")).first()["cid"]
        # unordered reference construction WOULD swap — must differ
        assert got != _ref_cid(src, dst, t, c, PROTO_ICMP)
        # ordered construction (no swap), same byte layout
        data = (struct.pack(">H", 0) + struct.pack(">I", src)
                + struct.pack(">I", dst) + struct.pack(">BB", PROTO_ICMP, 0)
                + struct.pack(">HH", t, c))
        want = "1:" + base64.b64encode(hashlib.sha1(data).digest()).decode()
        assert got == want

    def test_be_bytes_out_of_range_nulls_digest(self, spark):
        # a port wider than 2 bytes must null the digest, not silently
        # truncate the hex to a plausible-looking wrong hash
        df = spark.createDataFrame([(1, 2, 70000, 80), (1, 2, -5, 80)],
                                   "src long, dst long, sport long, dport long")
        got = [r["c"] for r in df.select(
            community_id(F.col("src"), F.col("dst"), F.col("sport"),
                         F.col("dport")).alias("c")).collect()]
        assert got == [None, None]
