"""ingest-user-agent / ingest-geoip / mapper-annotated-text unit tests:
parse semantics pinned against Python twins, and the plan shapes the
scale design relies on (geoip is a hash equi-join, never a
BroadcastNestedLoopJoin; every op is UDF-free codegen)."""

import re

import pytest
from pyspark.sql import functions as F

from opensearch_spark import enrich as EN
from opensearch_spark.search import annotated as AN


def explain_str(df, mode="formatted") -> str:
    qe = df._jdf.queryExecution()
    try:
        jvm = df.sparkSession._jvm
        return jvm.PythonSQLUtils.explainString(qe, mode)
    except Exception:
        return qe.toString()


# --------------------------------------------------------------------------
# user agent
# --------------------------------------------------------------------------

def _ua_py(event_id: int) -> str:
    v, v2 = 100 + event_id % 30, event_id % 10
    tpl = EN._UA_TEMPLATES[event_id % 5]
    return tpl.replace("{v2}", str(v2)).replace("{v}", str(v))


def _parse_py(ua: str):
    name, major = "Other", None
    for guard, fam, pat in EN.UA_RULES:
        if guard.strip("%") in ua:
            name = fam
            m = re.search(pat, ua)
            major = m.group(1) if m else ""
            break
    os_name = "Other"
    for guard, osname in EN.OS_RULES:
        if guard.strip("%") in ua:
            os_name = osname
            break
    device = EN._DEVICE_BY_OS.get(os_name, "Other")
    return name, major, os_name, device


def test_ua_parse_matches_python_twin(spark):
    ids = spark.range(0, 50).withColumnRenamed("id", "event_id")
    df = EN.parse_user_agent(ids.withColumn("ua", EN.ua_expr("event_id")))
    rows = {r["event_id"]: r for r in df.collect()}
    for i in range(50):
        ua = _ua_py(i)
        name, major, os_name, device = _parse_py(ua)
        r = rows[i]
        assert r["ua"] == ua, i
        assert r["user_agent_name"] == name, (i, ua)
        assert r["user_agent_major"] == major, (i, ua)
        assert r["user_agent_os"] == os_name, (i, ua)
        assert r["user_agent_device"] == device, (i, ua)


def test_ua_rule_order_edge_before_chrome(spark):
    """Edge UAs contain 'Chrome/' too — the ordered first-match-wins list
    (uap-core's ordering constraint) must classify them as Edge."""
    df = spark.createDataFrame(
        [("x Chrome/119.0 y Edg/119.0.2210.91",)], "ua STRING")
    row = EN.parse_user_agent(df).collect()[0]
    assert row["user_agent_name"] == "Edge"
    assert row["user_agent_major"] == "119"


def test_ua_no_match_falls_back_to_other(spark):
    df = spark.createDataFrame([("UnknownBot/1.0",)], "ua STRING")
    row = EN.parse_user_agent(df).collect()[0]
    assert row["user_agent_name"] == "Other"
    assert row["user_agent_major"] is None
    assert row["user_agent_os"] == "Other"


def test_ua_parse_is_pure_codegen(spark):
    ids = spark.range(0, 10).withColumnRenamed("id", "event_id")
    df = EN.parse_user_agent(ids.withColumn("ua", EN.ua_expr("event_id")))
    plan = explain_str(df)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "codegen id" in plan  # the projection is whole-stage compiled


# --------------------------------------------------------------------------
# geoip
# --------------------------------------------------------------------------

def _geoip_py(ip_num: int):
    from opensearch_spark.search.ipfield import parse_ip

    for lo, hi, cc, city, lat, lon in EN.GEOIP_RANGES:
        if parse_ip(lo) <= ip_num <= parse_ip(hi):
            return cc, city, lat, lon
    return None, None, None, None


def test_geoip_lookup_matches_python_twin(spark):
    from opensearch_spark.search import ipfield as IPF

    ev = IPF.with_ip(spark.range(0, 300).withColumnRenamed("id", "event_id"),
                     id_col="event_id")
    out = EN.geoip_enrich(ev, EN.geoip_table(spark)).collect()
    assert len(out) == 300  # left join, non-overlapping ranges: no fanout
    for r in out:
        cc, city, lat, lon = _geoip_py(r["ip_num"])
        assert r["country_iso_code"] == cc, r["ip_num"]
        assert r["city_name"] == city
        assert r["lat"] == lat and r["lon"] == lon


def test_geoip_range_spanning_multiple_buckets(spark):
    """A range spanning several /8s must match ips in EVERY spanned
    bucket (the explode covers the whole range, not just the first /8)."""
    from opensearch_spark.search.ipfield import parse_ip

    probes = ["8.0.0.1", "20.1.2.3", "31.255.255.254",  # US range edges+mid
              "32.0.0.0",  # one past the US range: no match
              "246.0.64.255", "246.0.65.0"]  # AU hi edge, one past
    df = spark.createDataFrame([(p, parse_ip(p)) for p in probes],
                               "ip STRING, ip_num LONG")
    got = {r["ip"]: r["country_iso_code"]
           for r in EN.geoip_enrich(df, EN.geoip_table(spark)).collect()}
    assert got["8.0.0.1"] == "US"
    assert got["20.1.2.3"] == "US"
    assert got["31.255.255.254"] == "US"
    assert got["32.0.0.0"] is None
    assert got["246.0.64.255"] == "AU"
    assert got["246.0.65.0"] is None


def test_geoip_preserves_same_named_event_columns(spark):
    """An events side that already carries a 'bucket'/'lo'/'hi' column
    must keep it — only the ranges-side join columns are dropped."""
    from opensearch_spark.search.ipfield import parse_ip

    df = spark.createDataFrame(
        [("8.0.0.1", parse_ip("8.0.0.1"), 42)],
        "ip STRING, ip_num LONG, bucket INT")
    out = EN.geoip_enrich(df, EN.geoip_table(spark)).collect()[0]
    assert out["bucket"] == 42
    assert out["country_iso_code"] == "US"


def test_geoip_plan_is_hash_join_not_bnlj(spark):
    """The scale contract: bucketed equi-join compiles to a
    BroadcastHashJoin — a 3M-block table at 10^12 events must never be
    BroadcastNestedLoopJoin."""
    from opensearch_spark.search import ipfield as IPF

    ev = IPF.with_ip(spark.range(0, 100).withColumnRenamed("id", "event_id"),
                     id_col="event_id")
    plan = explain_str(EN.geoip_enrich(ev, EN.geoip_table(spark)))
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


# --------------------------------------------------------------------------
# attachment
# --------------------------------------------------------------------------

def test_attachment_sniff_and_extract(spark):
    rows = [(0, "hello pdf world"), (1, "png bytes here"), (2, "plain text")]
    df = (spark.createDataFrame(rows, "doc_id LONG, text STRING")
          .select("doc_id",
                  EN.attachment_expr("text", "doc_id").alias("data")))
    out = {r["doc_id"]: r for r in EN.process_attachment(df).collect()}
    assert out[0]["content_type"] == "application/pdf"
    assert out[0]["status"] == "stub" and out[0]["content"] == ""
    assert out[0]["content_length"] == 5 + len("hello pdf world")
    assert out[1]["content_type"] == "image/png"
    assert out[1]["status"] == "stub"
    assert out[2]["content_type"] == "text/plain"
    assert out[2]["status"] == "extracted"
    assert out[2]["content"] == "plain text"


def test_attachment_is_pure_codegen(spark):
    df = (spark.createDataFrame([(0, "x")], "doc_id LONG, text STRING")
          .select("doc_id",
                  EN.attachment_expr("text", "doc_id").alias("data")))
    plan = explain_str(EN.process_attachment(df))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# --------------------------------------------------------------------------
# annotated_text
# --------------------------------------------------------------------------

@pytest.fixture()
def docs(spark):
    rows = [
        (0, "def merge(a, b): return a + b", "en", "src2"),
        (1, "table scan with a[i](x) call", "en", "src7"),  # incidental markup
        (2, "   leading space text", "en", "src2"),
        (3, "", "en", "src0"),
    ]
    return spark.createDataFrame(
        rows, "doc_id LONG, text STRING, lang STRING, source STRING")


def test_annotated_roundtrip_and_extraction(docs):
    out = {r["doc_id"]: r
           for r in AN.parse_annotated(AN.with_annotated(docs)).collect()}
    # markup-free text: plain == mention + ' ' + text, one annotation
    assert out[0]["plain"] == "src2 def merge(a, b): return a + b"
    assert out[0]["anno"] == "src2_en"
    assert out[0]["n_annos"] == 1
    # incidental markup in code text parses as a second annotation —
    # reference behavior for that input (AnnotatedText.parse strips all)
    assert out[1]["n_annos"] == 2
    assert out[1]["plain"] == "src7 table scan with ai call"
    assert out[1]["anno"] == "src7_en"  # first match wins the extraction
    # empty text still round-trips
    assert out[3]["plain"] == "src0 "
    assert out[3]["anno"] == "src0_en"


def test_annotated_markdown_regex_is_reference_pattern():
    # AnnotatedTextFieldMapper.java:200
    assert AN.MARKDOWN_RE == r"\[([^]\[]*)]\(([^)(]*)\)"
    m = re.search(AN.MARKDOWN_RE, "is [John Smith](type=person&value=JS) x")
    assert m.group(1) == "John Smith"
    assert m.group(2) == "type=person&value=JS"


def test_annotated_parse_is_pure_codegen(docs):
    plan = explain_str(AN.parse_annotated(AN.with_annotated(docs)))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_annotated_parse_property_vs_python_re(spark):
    """Property: Spark's regexp_replace/extract on the reference markdown
    pattern agrees with Python re on bracket/paren-laden code-ish text."""
    import re as _re

    from hypothesis import given, settings, strategies as st

    alphabet = "ab[]() =&_0"
    texts = []

    @settings(max_examples=60, deadline=None)
    @given(st.text(alphabet=alphabet, min_size=0, max_size=30))
    def collect(s):
        texts.append(s)

    collect()
    rows = [(i, t, "en", "srcX") for i, t in enumerate(dict.fromkeys(texts))]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING, lang STRING, source STRING")
    out = {r["doc_id"]: r
           for r in AN.parse_annotated(AN.with_annotated(df)).collect()}
    pat = _re.compile(AN.MARKDOWN_RE)
    for i, t, _, _ in rows:
        annotated = f"[srcX](entity=srcX_en) {t}"
        assert out[i]["plain"] == pat.sub(r"\1", annotated), repr(t)
        assert out[i]["n_annos"] == len(pat.findall(annotated)), repr(t)
        m = pat.search(annotated)
        exp_anno = _re.search(r"entity=(.*)", m.group(2))
        assert out[i]["anno"] == (exp_anno.group(1) if exp_anno else ""), repr(t)
