"""ingest-user-agent and ingest-geoip enrichment processors.

Reference: ``modules/ingest-user-agent`` (UserAgentProcessor.java:95-243 —
parses a user-agent string into name / major / os / device with an
ordered, first-match-wins regex list, UserAgentParser.java; results are
memoized per node in UserAgentCache.java) and ``modules/ingest-geoip``
(GeoIpProcessor.java — MaxMind range-database lookup that adds
country_iso_code / city_name / location to the document).

The corpus has no user-agent or geo columns, so both INPUTS are derived
deterministically (the established geo/ip precedent): a UA string
templated from ``event_id`` with the version number varying per row, and
the ip field family's Knuth-spread ``ip_num``. The parse / lookup logic
is the real operator and runs identically in the engine and the DuckDB
oracle (same regex patterns, same range table).

Scale design:

- The UA parse is a fixed chain of ``LIKE`` guards + ``regexp_extract``
  — pure whole-stage codegen, zero UDFs, zero shuffles; at 100 TB it is
  a per-row constant-cost projection. (The reference needs
  UserAgentCache.java because it re-parses per document on a single
  node; Catalyst codegen makes the parse cheap enough that no cache is
  needed, and a cache would be a shuffle.)
- GeoIP lookup is a RANGE join. A real MaxMind GeoLite2 table is ~3M
  blocks — too large for BroadcastNestedLoopJoin to stay cheap against
  10^12 events. The scale-correct pattern implemented here: explode
  each range across the /8 prefix buckets it spans, then EQUI-join on
  the bucket (hash-partitionable, broadcast-able) and verify
  ``lo <= ip <= hi`` as a post-filter. Plan-asserted in
  tests/test_enrich.py: no BroadcastNestedLoopJoin appears.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# ---------------------------------------------------------------------------
# ingest-user-agent
# ---------------------------------------------------------------------------

# Derived UA templates, chosen by event_id % 5; {v} is the per-row version
# (100 + event_id % 30) so the regex capture does real per-row work.
_UA_TEMPLATES = [
    ("Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 "
     "(KHTML, like Gecko) Chrome/{v}.0.0.0 Safari/537.36"),
    ("Mozilla/5.0 (X11; Linux x86_64; rv:{v}.0) Gecko/20100101 "
     "Firefox/{v}.0"),
    ("Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) AppleWebKit/605.1.15 "
     "(KHTML, like Gecko) Version/{v}.1 Safari/605.1.15"),
    ("Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 "
     "(KHTML, like Gecko) Chrome/{v}.0.0.0 Safari/537.36 Edg/{v}.0.2210.91"),
    "curl/8.{v2}.0",
]

# Ordered first-match-wins parse rules (UserAgentParser.java applies
# uap-core's regexes.yml the same way): (LIKE guard, family name,
# major-version capture regex). Edge must precede Chrome and Safari;
# Chrome must precede Safari — exactly uap-core's ordering constraint.
UA_RULES = [
    ("%Edg/%", "Edge", r"Edg/(\d+)"),
    ("%Chrome/%", "Chrome", r"Chrome/(\d+)"),
    ("%Firefox/%", "Firefox", r"Firefox/(\d+)"),
    ("%Version/%", "Safari", r"Version/(\d+)"),
    ("%curl/%", "curl", r"curl/(\d+)"),
]

# os + device rules (UserAgentProcessor OS / DEVICE properties)
OS_RULES = [
    ("%Windows NT 10.0%", "Windows 10"),
    ("%Mac OS X%", "Mac OS X"),
    ("%Linux%", "Linux"),
]
_DEVICE_BY_OS = {"Windows 10": "Other", "Mac OS X": "Mac", "Linux": "Other"}


def ua_expr(id_col: str = "event_id") -> Column:
    """Derived user-agent string column (deterministic in the id)."""
    v = (F.col(id_col) % 30 + 100).cast("string")
    v2 = (F.col(id_col) % 10).cast("string")
    branches = []
    for tpl in _UA_TEMPLATES:
        parts, out = tpl.replace("{v2}", "\0v2\0").replace("{v}", "\0v\0"), []
        for piece in parts.split("\0"):
            if piece == "v":
                out.append(v)
            elif piece == "v2":
                out.append(v2)
            elif piece:
                out.append(F.lit(piece))
        branches.append(F.concat(*out))
    expr = F.when(F.col(id_col) % 5 == 0, branches[0])
    for i in range(1, 5):
        expr = expr.when(F.col(id_col) % 5 == i, branches[i])
    return expr


def ua_sql(id_col: str = "event_id") -> str:
    """The identical derivation as DuckDB SQL (oracle side)."""
    v = f"CAST({id_col} % 30 + 100 AS STRING)"
    v2 = f"CAST({id_col} % 10 AS STRING)"
    cases = []
    for i, tpl in enumerate(_UA_TEMPLATES):
        parts = tpl.replace("{v2}", "\0v2\0").replace("{v}", "\0v\0")
        args = []
        for piece in parts.split("\0"):
            if piece == "v":
                args.append(v)
            elif piece == "v2":
                args.append(v2)
            elif piece:
                args.append("'" + piece.replace("'", "''") + "'")
        cases.append(f"WHEN {id_col} % 5 = {i} THEN concat({', '.join(args)})")
    return "CASE " + " ".join(cases) + " END"


def parse_user_agent(df: DataFrame, field: str = "ua",
                     target: str = "user_agent") -> DataFrame:
    """UserAgentProcessor.execute: adds ``<target>_name``,
    ``<target>_major``, ``<target>_os``, ``<target>_device`` columns.
    First matching rule wins; no match → 'Other' (uap-core fallback)."""
    ua = F.col(field)
    name = None
    major = None
    for guard, fam, pat in UA_RULES:
        cond = ua.like(guard)
        name = (F.when(cond, fam) if name is None
                else name.when(cond, fam))
        cap = F.regexp_extract(ua, pat, 1)
        major = (F.when(cond, cap) if major is None
                 else major.when(cond, cap))
    name = name.otherwise("Other")
    major = major.otherwise(F.lit(None).cast("string"))
    os_col = None
    for guard, osname in OS_RULES:
        cond = ua.like(guard)
        os_col = (F.when(cond, osname) if os_col is None
                  else os_col.when(cond, osname))
    os_col = os_col.otherwise("Other")
    device = None
    for osname, dev in _DEVICE_BY_OS.items():
        cond = os_col == osname
        device = (F.when(cond, dev) if device is None
                  else device.when(cond, dev))
    device = device.otherwise("Other")
    return (df.withColumn(f"{target}_name", name)
              .withColumn(f"{target}_major", major)
              .withColumn(f"{target}_os", os_col)
              .withColumn(f"{target}_device", device))


def parse_user_agent_sql(field: str = "ua", target: str = "user_agent") -> str:
    """The identical parse as DuckDB SELECT fragments (oracle side)."""
    name_cases, major_cases = [], []
    for guard, fam, pat in UA_RULES:
        name_cases.append(f"WHEN {field} LIKE '{guard}' THEN '{fam}'")
        major_cases.append(f"WHEN {field} LIKE '{guard}' THEN "
                           f"regexp_extract({field}, '{pat}', 1)")
    os_cases = [f"WHEN {field} LIKE '{guard}' THEN '{osname}'"
                for guard, osname in OS_RULES]
    dev_cases = [f"WHEN ({'CASE ' + ' '.join(os_cases)} ELSE 'Other' END)"
                 f" = '{osname}' THEN '{dev}'"
                 for osname, dev in _DEVICE_BY_OS.items()]
    return (f"CASE {' '.join(name_cases)} ELSE 'Other' END AS {target}_name, "
            f"CASE {' '.join(major_cases)} ELSE NULL END AS {target}_major, "
            f"CASE {' '.join(os_cases)} ELSE 'Other' END AS {target}_os, "
            f"CASE {' '.join(dev_cases)} ELSE 'Other' END AS {target}_device")


# ---------------------------------------------------------------------------
# ingest-geoip
# ---------------------------------------------------------------------------

# Deterministic GeoLite2-style range table: non-aligned [lo, hi] uint32
# ranges (inclusive) with the fields GeoIpProcessor adds. Non-overlapping
# by construction so a lookup matches at most one row.
GEOIP_RANGES = [
    ("8.0.0.0", "31.255.255.255", "US", "New York", 40.71, -74.01),
    ("36.0.0.0", "47.9.255.255", "JP", "Tokyo", 35.68, 139.69),
    ("53.0.0.0", "68.127.255.255", "DE", "Berlin", 52.52, 13.41),
    ("77.16.0.0", "95.255.255.255", "FR", "Paris", 48.86, 2.35),
    ("101.0.0.0", "126.255.255.255", "CN", "Shanghai", 31.23, 121.47),
    ("134.0.0.0", "159.117.255.255", "GB", "London", 51.51, -0.13),
    ("163.0.0.0", "191.255.255.255", "BR", "Sao Paulo", -23.55, -46.63),
    ("197.32.0.0", "223.255.255.255", "IN", "Mumbai", 19.08, 72.88),
    ("229.0.0.0", "246.0.64.255", "AU", "Sydney", -33.87, 151.21),
]

_BUCKET_SHIFT = 24  # /8 prefix buckets


def geoip_table(spark) -> DataFrame:
    """The range table with lo/hi as longs, exploded to one row per /8
    prefix bucket the range spans (a real GeoLite2 load would do the
    same explode once at ingest; blocks are almost all within one /8,
    so the explode factor is ~1)."""
    from opensearch_spark.search.ipfield import parse_ip

    rows = [(parse_ip(lo), parse_ip(hi), cc, city, lat, lon)
            for lo, hi, cc, city, lat, lon in GEOIP_RANGES]
    df = spark.createDataFrame(
        rows, "lo LONG, hi LONG, country_iso_code STRING, city_name STRING,"
              " lat DOUBLE, lon DOUBLE")
    return df.withColumn(
        "bucket",
        F.explode(F.sequence(F.shiftright("lo", _BUCKET_SHIFT),
                             F.shiftright("hi", _BUCKET_SHIFT))))


def geoip_enrich(events: DataFrame, ranges: DataFrame,
                 ip_col: str = "ip_num") -> DataFrame:
    """GeoIpProcessor.execute as a bucketed broadcast hash equi-join:
    join on the /8 bucket, then the range containment filter. LEFT join —
    unmatched ips keep NULL geo fields, matching ignore_missing
    semantics."""
    cond = ((F.shiftright(F.col(ip_col), _BUCKET_SHIFT) == ranges["bucket"])
            & (F.col(ip_col) >= ranges["lo"])
            & (F.col(ip_col) <= ranges["hi"]))
    # drop via the ranges-side references so a same-named events column
    # (e.g. a pre-bucketed stream's own 'bucket') survives untouched
    return (events.join(F.broadcast(ranges), cond, "left")
            .drop(ranges["bucket"], ranges["lo"], ranges["hi"]))


# ---------------------------------------------------------------------------
# ingest-attachment (plugins/ingest-attachment, AttachmentProcessor.java:
# Tika-parsed `content` + `content_type` + `content_length` fields).
# The media-type detection (Tika's magic-byte sniff) and the plain-text
# passthrough are real; rich-format text extraction (PDF/PNG internals)
# requires Tika-class parsers absent from this environment and is the
# documented stub — those attachments get content '' and status 'stub',
# mirroring the honest mm_feature_extract posture.
# ---------------------------------------------------------------------------

_MAGIC_PDF = "255044462D"      # '%PDF-'
_MAGIC_PNG = "89504E470D0A"    # PNG signature prefix


def attachment_expr(text_col: str = "text", id_col: str = "doc_id"):
    """Derived binary attachment: doc_id%3 selects PDF-magic, PNG-magic,
    or plain utf-8 bytes of the first 80 chars of ``text``."""
    body = F.encode(F.substring(F.col(text_col), 1, 80), "utf-8")
    return (F.when(F.col(id_col) % 3 == 0, F.concat(F.unhex(F.lit(_MAGIC_PDF)), body))
             .when(F.col(id_col) % 3 == 1, F.concat(F.unhex(F.lit(_MAGIC_PNG)), body))
             .otherwise(body))


def attachment_expr_sql(text_col: str = "text", id_col: str = "doc_id") -> str:
    return (f"CASE WHEN {id_col} % 3 = 0 THEN unhex('{_MAGIC_PDF}')"
            f" || encode(substr({text_col}, 1, 80)) "
            f"WHEN {id_col} % 3 = 1 THEN unhex('{_MAGIC_PNG}')"
            f" || encode(substr({text_col}, 1, 80)) "
            f"ELSE encode(substr({text_col}, 1, 80)) END")


def process_attachment(df: DataFrame, data_col: str = "data") -> DataFrame:
    """AttachmentProcessor.execute: content_type (magic-byte sniff),
    content_length, content (plain text passthrough; rich formats
    stubbed with status='stub')."""
    # hex only a fixed-size prefix: a multi-MB attachment must not pay an
    # O(len) 2x-size hex materialization per row just to sniff 6 bytes
    h = F.hex(F.substring(F.col(data_col), 1, 6))
    ctype = (F.when(h.startswith(_MAGIC_PDF), "application/pdf")
              .when(h.startswith(_MAGIC_PNG), "image/png")
              .otherwise("text/plain"))
    # text/plain only when the bytes round-trip UTF-8: Spark's decode
    # replaces invalid sequences with U+FFFD while the DuckDB twin's
    # decode() ERRORS on them (round-4 review) — non-UTF-8 unknown
    # payloads classify as octet-stream on the engine side, keeping the
    # twins aligned on every input they can both process (the oracle's
    # derived corpus is valid UTF-8 by construction)
    decoded = F.decode(F.col(data_col), "utf-8")
    is_utf8 = F.encode(decoded, "utf-8") == F.col(data_col)
    ctype = F.when(ctype == "text/plain",
                   F.when(is_utf8, "text/plain")
                    .otherwise("application/octet-stream")) \
             .otherwise(ctype)
    is_plain = ctype == "text/plain"
    return (df.withColumn("content_type", ctype)
              .withColumn("content_length",
                          F.octet_length(F.col(data_col)).cast("long"))
              .withColumn("content",
                          F.when(is_plain, decoded).otherwise(F.lit("")))
              .withColumn("status",
                          F.when(is_plain, "extracted").otherwise("stub")))


def process_attachment_sql(data_col: str = "data") -> str:
    ct = (f"CASE WHEN starts_with(hex({data_col}), '{_MAGIC_PDF}')"
          f" THEN 'application/pdf' "
          f"WHEN starts_with(hex({data_col}), '{_MAGIC_PNG}')"
          f" THEN 'image/png' ELSE 'text/plain' END")
    return (f"{ct} AS content_type, "
            f"CAST(octet_length({data_col}) AS BIGINT) AS content_length, "
            f"CASE WHEN ({ct}) = 'text/plain' THEN decode({data_col})"
            f" ELSE '' END AS content, "
            f"CASE WHEN ({ct}) = 'text/plain' THEN 'extracted'"
            f" ELSE 'stub' END AS status")


def geoip_ranges_sql() -> str:
    """The same range table as a DuckDB VALUES CTE (oracle side)."""
    from opensearch_spark.search.ipfield import parse_ip

    vals = ", ".join(
        f"({parse_ip(lo)}, {parse_ip(hi)}, '{cc}', '{city}', "
        f"CAST({lat} AS DOUBLE), CAST({lon} AS DOUBLE))"
        for lo, hi, cc, city, lat, lon in GEOIP_RANGES)
    return (f"(SELECT * FROM (VALUES {vals}) "
            "AS t(lo, hi, country_iso_code, city_name, lat, lon))")
