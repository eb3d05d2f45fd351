"""Geo operators (search/geo.py) and the percolator (search/percolate.py)."""

import math

import pytest
from pyspark.sql import functions as F

from opensearch_spark.search.geo import (
    geo_bounding_box, geo_distance, geotile_xy, haversine_km, with_geo,
)
from opensearch_spark.search.percolate import PercQuery, percolate, percolate_counts


# --------------------------------------------------------------------- geo
def test_haversine_known_distance(spark):
    # Paris (48.8566, 2.3522) → London (51.5074, -0.1278) ≈ 343.5 km
    df = spark.createDataFrame([(51.5074, -0.1278)], "lat double, lon double")
    d = df.select(haversine_km(F.col("lat"), F.col("lon"), 48.8566, 2.3522)
                  .alias("d")).collect()[0]["d"]
    assert abs(d - 343.5) < 1.0


def test_haversine_zero_and_antipode(spark):
    df = spark.createDataFrame([(10.0, 20.0), (-10.0, -160.0)],
                               "lat double, lon double")
    ds = [r["d"] for r in df.select(
        haversine_km(F.col("lat"), F.col("lon"), 10.0, 20.0).alias("d")
    ).collect()]
    assert ds[0] == pytest.approx(0.0, abs=1e-9)
    assert ds[1] == pytest.approx(math.pi * 6371.0088, rel=1e-6)  # antipode


def test_geotile_known_values(spark):
    # zoom 1: lon<0 → x=0, lon>0 → x=1; lat>0 → y=0, lat<0 → y=1
    df = spark.createDataFrame(
        [(40.0, -74.0), (40.0, 74.0), (-40.0, -74.0), (-40.0, 74.0)],
        "lat double, lon double")
    x, y = geotile_xy(F.col("lat"), F.col("lon"), 1)
    got = [(r["x"], r["y"]) for r in df.select(x.alias("x"), y.alias("y")).collect()]
    assert got == [(0, 0), (1, 0), (0, 1), (1, 1)]


def test_geo_distance_prefilter_loses_nothing(spark, sf_dir):
    """The bounding-box prefilter must be a superset of the radius."""
    docs = with_geo(spark.read.parquet(f"{sf_dir}/documents.parquet"))
    fast = geo_distance(docs, 10.0, 20.0, 4000.0).select("doc_id")
    exact = docs.withColumn(
        "d", F.round(haversine_km(F.col("lat"), F.col("lon"), 10.0, 20.0), 3)
    ).where(F.col("d") <= 4000.0).select("doc_id")
    assert {r[0] for r in fast.collect()} == {r[0] for r in exact.collect()}


def test_with_geo_bounds_and_determinism(spark, sf_dir):
    docs = with_geo(spark.read.parquet(f"{sf_dir}/documents.parquet"))
    row = docs.agg(F.min("lat"), F.max("lat"), F.min("lon"), F.max("lon")).collect()[0]
    assert -60.0 <= row[0] and row[1] < 60.0
    assert -180.0 <= row[2] and row[3] < 180.0
    a = docs.select("doc_id", "lat", "lon").orderBy("doc_id").limit(5).collect()
    b = docs.select("doc_id", "lat", "lon").orderBy("doc_id").limit(5).collect()
    assert a == b


def test_geo_bounding_box_is_range_only(spark, sf_dir):
    docs = with_geo(spark.read.parquet(f"{sf_dir}/documents.parquet"))
    out = geo_bounding_box(docs, top=30.0, left=-40.0, bottom=-10.0, right=40.0)
    rows = out.select("lat", "lon").collect()
    assert rows, "box must be non-vacuous on the test corpus"
    assert all(-10.0 <= r["lat"] <= 30.0 and -40.0 <= r["lon"] <= 40.0 for r in rows)


# --------------------------------------------------------------- percolator
def _tiny_docs(spark):
    return spark.createDataFrame(
        [
            (1, "alpha beta gamma", "en", "s0", 16),
            (2, "alpha alpha delta", "fr", "s1", 17),
            (3, "epsilon zeta", "en", "s0", 12),
            (4, "beta delta", "de", "s2", 300),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def _qs():
    return [
        PercQuery(1, "match", "text", terms=("alpha",)),                     # or
        PercQuery(2, "match", "text", terms=("alpha", "delta"),
                  min_should_match=2),                                       # and
        PercQuery(3, "match", "text", terms=("beta", "zeta", "omega"),
                  min_should_match=1),
        PercQuery(4, "term", "lang", value="en"),
        PercQuery(5, "range", "n_chars", lo=15.0, hi=20.0),
        PercQuery(6, "range", "n_chars", hi=12.0),
    ]


def test_percolate_semantics(spark):
    pairs = {(r["doc_id"], r["query_id"])
             for r in percolate(spark, _qs(), _tiny_docs(spark)).collect()}
    assert pairs == {
        (1, 1), (2, 1),                 # 'alpha' present
        (2, 2),                         # both 'alpha' and 'delta'
        (1, 3), (3, 3), (4, 3),         # any of beta/zeta/omega
        (1, 4), (3, 4),                 # lang=en
        (1, 5), (2, 5),                 # n_chars in [15, 20]
        (3, 6),                         # n_chars <= 12
    }


def test_percolate_msm_counts_distinct_terms(spark):
    """doc 2 has 'alpha' twice — tf must NOT satisfy msm=2 alone."""
    docs = spark.createDataFrame([(9, "alpha alpha alpha", "en", "s", 10)],
                                 "doc_id long, text string, lang string, "
                                 "source string, n_chars long")
    qs = [PercQuery(1, "match", "text", terms=("alpha", "delta"),
                    min_should_match=2)]
    assert percolate(spark, qs, docs).count() == 0


def test_percolate_counts_shape(spark):
    out = percolate_counts(spark, _qs(), _tiny_docs(spark))
    rows = {r["query_id"]: (r["n_matches"], r["sum_doc"]) for r in out.collect()}
    assert rows[1] == (2, 3) and rows[3] == (3, 8)
    assert out.columns == ["query_id", "n_matches", "min_doc", "max_doc", "sum_doc"]


def test_percolate_plan_broadcasts_queries(spark):
    """The stored-query side must broadcast: the docs corpus is never
    shuffled against it (the 100 TB posture: one scan of the docs)."""
    plan = percolate(spark, _qs(), _tiny_docs(spark))._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan


def test_percolate_over_threshold_flips_to_shuffle(spark):
    """Beyond broadcast_max_queries the match/term prefilter joins pin a
    shuffle-hash join (the documented scale route past a broadcastable
    standing-query set) — identical pairs either way."""
    qs = [q for q in _qs() if q.kind != "range"]  # range keeps broadcast
    docs = _tiny_docs(spark)
    want = {(r["doc_id"], r["query_id"])
            for r in percolate(spark, qs, docs).collect()}
    flipped = percolate(spark, qs, docs, broadcast_max_queries=0)
    got = {(r["doc_id"], r["query_id"]) for r in flipped.collect()}
    assert got == want
    plan = flipped._jdf.queryExecution().executedPlan().toString()
    assert "ShuffledHashJoin" in plan
    assert "BroadcastHashJoin" not in plan


def test_percolate_range_grid_join_above_threshold(spark):
    """Bounded range legs above broadcast_max_queries flip to the
    grid-bucketed interval join: equi-join on the value-grid bucket —
    NO BroadcastNestedLoop at any standing-query count (VERDICT r3 #6)
    — with pairs identical to the broadcast theta-join."""
    qs = [
        PercQuery(1, "range", "n_chars", lo=15.0, hi=20.0),
        PercQuery(2, "range", "n_chars", lo=10.0, hi=13.0),
        PercQuery(3, "range", "n_chars", lo=250.0, hi=400.0),
        PercQuery(4, "range", "n_chars", lo=17.0, hi=17.0),
    ]
    docs = _tiny_docs(spark)
    want = {(r["doc_id"], r["query_id"])
            for r in percolate(spark, qs, docs).collect()}
    assert want == {(1, 1), (2, 1), (3, 2), (4, 3), (2, 4)}
    grid = percolate(spark, qs, docs, broadcast_max_queries=0)
    got = {(r["doc_id"], r["query_id"]) for r in grid.collect()}
    assert got == want
    plan = grid._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "ShuffledHashJoin" in plan


def test_percolate_range_sweep_grid_half_planes(spark):
    """Unbounded / wider-than-cap ranges land on the doc-domain sweep
    grid (VERDICT r4 #5): half-planes and wide bounded ranges clamp to
    [vmin, vmax] and equi-join on a coarse cell id — pairs identical to
    the all-broadcast result and ZERO BroadcastNestedLoop because every
    query here has at least one finite bound."""
    qs = [
        PercQuery(1, "range", "n_chars", lo=15.0, hi=20.0),
        PercQuery(2, "range", "n_chars", hi=12.0),          # unbounded lo
        PercQuery(3, "range", "n_chars", lo=11.0, hi=10000.0),  # wide: width
        # 9989 > 256 * step(=p90 width 5) -> sweep-grid leg
        PercQuery(4, "range", "n_chars", lo=16.0, hi=17.0),
        PercQuery(5, "range", "n_chars", lo=16.0),          # unbounded hi
        PercQuery(6, "range", "n_chars", lo=99999.0),       # above vmax:
        # clamped interval empty -> matches nothing (and must not make
        # F.sequence count down)
    ]
    docs = _tiny_docs(spark)
    want = {(r["doc_id"], r["query_id"])
            for r in percolate(spark, qs, docs).collect()}
    assert not any(q == 6 for _, q in want)
    swept = percolate(spark, qs, docs, broadcast_max_queries=0)
    got = {(r["doc_id"], r["query_id"]) for r in swept.collect()}
    assert got == want
    plan = swept._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan


def test_percolate_all_half_plane_set_has_no_bnlj(spark):
    """Review r5: a standing set with NO bounded query (all half-planes)
    has no p90 width — it must go to the sweep grid above the broadcast
    threshold, not silently fall back to the broadcast theta join."""
    qs = [PercQuery(1, "range", "n_chars", lo=15.0),
          PercQuery(2, "range", "n_chars", hi=16.0),
          PercQuery(3, "range", "n_chars", lo=1000.0)]
    docs = _tiny_docs(spark)
    want = {(r["doc_id"], r["query_id"])
            for r in percolate(spark, qs, docs).collect()}
    assert want == {(1, 1), (2, 1), (4, 1), (1, 2), (3, 2)}  # q3 empty:
    # lo=1000 is above every doc value (max n_chars = 300)
    swept = percolate(spark, qs, docs, broadcast_max_queries=0)
    got = {(r["doc_id"], r["query_id"]) for r in swept.collect()}
    assert got == want
    plan = swept._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan


def test_percolate_full_range_only_leg_is_exists(spark):
    """A (None, None) range query is the ONLY shape that keeps a
    broadcast leg — it behaves as an exists query: matches every doc
    whose field is non-null, in BOTH postures."""
    qs = [PercQuery(1, "range", "n_chars"),
          PercQuery(2, "range", "n_chars", lo=16.0)]
    docs = _tiny_docs(spark).withColumn(
        "n_chars", F.when(F.col("doc_id") == 1, F.lit(None))
                    .otherwise(F.col("n_chars")))
    for bmax in (len(qs) + 1, 0):
        got = {(r["doc_id"], r["query_id"])
               for r in percolate(spark, qs, docs,
                                  broadcast_max_queries=bmax).collect()}
        assert (1, 1) not in got, f"null value matched full-range (bmax={bmax})"
        assert {(d, q) for d, q in got if q == 1} == \
            {(d, 1) for d in (2, 3, 4)}, got


def test_percolate_grid_join_tolerates_user_lo_hi_columns(spark):
    """A docs frame with ordinary columns named lo/hi must percolate
    identically through the grid path (working columns are
    underscore-namespaced); the sentinels themselves are rejected
    loudly rather than silently shadowed."""
    docs = _tiny_docs(spark).withColumn("lo", F.lit(1.0)) \
                            .withColumn("hi", F.lit(2.0))
    qs = [
        PercQuery(1, "range", "n_chars", lo=15.0, hi=20.0),
        PercQuery(2, "range", "n_chars", lo=10.0, hi=13.0),
    ]
    want = {(r["doc_id"], r["query_id"])
            for r in percolate(spark, qs, docs).collect()}
    got = {(r["doc_id"], r["query_id"])
           for r in percolate(spark, qs, docs,
                              broadcast_max_queries=0).collect()}
    assert got == want == {(1, 1), (2, 1), (3, 2)}
    with pytest.raises(ValueError, match="_bkt"):
        percolate(spark, qs, docs.withColumn("_bkt", F.lit(0)),
                  broadcast_max_queries=0)


def test_percolate_empty_query_set(spark):
    out = percolate(spark, [], _tiny_docs(spark))
    assert out.count() == 0 and out.columns == ["doc_id", "query_id"]


def test_streaming_percolate_matches_batch(spark, tmp_path):
    """Streaming percolation (alerts) gives the same pairs as the batch
    operator over the same rows — single code path by construction."""
    from opensearch_spark.streaming.alerts import start_streaming_percolate

    docs = _tiny_docs(spark)
    src = str(tmp_path / "stream_src")
    docs.repartition(2).write.parquet(src)

    got: list[tuple] = []
    epochs: list[int] = []

    def sink(rows, epoch):
        got.extend(rows)
        epochs.append(epoch)

    stream = spark.readStream.schema(docs.schema).parquet(src)
    q = start_streaming_percolate(spark, stream, _qs(), sink)
    q.awaitTermination(120)

    batch = {(r["doc_id"], r["query_id"])
             for r in percolate(spark, _qs(), docs).collect()}
    assert set(got) == batch and len(got) == len(batch)
    assert epochs, "at least one micro-batch must fire"


def test_percolate_phrase_adjacency(spark):
    """phrase stored queries: terms must be CONSECUTIVE and in order —
    a doc containing both words non-adjacent must not match."""
    docs = spark.createDataFrame(
        [(1, "alpha delta gamma", "en", "s", 17),
         (2, "alpha gamma delta", "en", "s", 17),   # both words, not adjacent
         (3, "delta alpha", "en", "s", 11),          # wrong order
         (4, "x alpha delta", "en", "s", 13)],
        "doc_id long, text string, lang string, source string, n_chars long")
    qs = [PercQuery(1, "phrase", "text", terms=("alpha", "delta"))]
    got = {(r["doc_id"], r["query_id"])
           for r in percolate(spark, qs, docs).collect()}
    assert got == {(1, 1), (4, 1)}


class TestRound4GeoQsFixes:
    def test_geo_distance_prefilter_is_conservative(self, spark):
        """Round-4 review: the lon prefilter clipped genuine matches —
        circle east/west extremes sit at higher |lat| than the origin,
        pole-crossing caps prune no meridian, and the antimeridian wraps."""
        from opensearch_spark.search.geo import geo_distance, haversine_km

        pts = [(1, 59.9, 75.0), (2, 59.9, 70.0), (3, 0.0, -178.5),
               (4, 0.0, 10.0)]
        df = spark.createDataFrame(pts, "doc_id long, lat double, lon double")
        # wide cap from (30, 0): point 1 is within 6371 km but outside
        # the old cos(origin)-width lon box
        got = {r["doc_id"] for r in
               geo_distance(df, 30.0, 0.0, 6371.0).collect()}
        assert 1 in got
        # pole-crossing cap from (45, 0) reaches point 2 at ~4766 km
        got = {r["doc_id"] for r in
               geo_distance(df, 45.0, 0.0, 5100.0).collect()}
        assert 2 in got
        # antimeridian: (0, 179) to (0, -178.5) is ~278 km
        got = {r["doc_id"] for r in
               geo_distance(df, 0.0, 179.0, 300.0).collect()}
        assert got == {3}

    def test_query_string_negative_ranges_and_field_groups(self):
        from opensearch_spark.search import queries as Q
        from opensearch_spark.search.query_string import parse_query_string

        r = parse_query_string("n:[-5 TO 5]", default_field="text")
        assert r == Q.Range(field="n", gte=-5, lte=5)
        g = parse_query_string("title:(foo bar)", default_field="text")
        assert isinstance(g, Q.Bool)
        assert {c.field for c in g.should} == {"title"}

    def test_simple_query_string_bare_tilde_is_fuzzy2(self):
        from opensearch_spark.search import queries as Q
        from opensearch_spark.search.query_string import \
            parse_simple_query_string

        f = parse_simple_query_string("foo~", default_field="text")
        assert f == Q.Fuzzy(field="text", value="foo", fuzziness=2)

    def test_ip_range_agg_empty_input_counts_zero(self, spark):
        from opensearch_spark.search.ipfield import ip_range_agg

        df = spark.createDataFrame([], "ip_num long").where("1=0")
        rows = ip_range_agg(df, [{"key": "a", "from": "10.0.0.0"},
                                 {"key": "b", "mask": "10.0.0.0/8"}]) \
            .collect()
        assert [(r["key"], r["doc_count"]) for r in rows] == \
            [("a", 0), ("b", 0)]

    def test_derived_field_date_from_millis_and_collision(self, spark):
        import pytest as _pt

        from opensearch_spark.search.derivedfields import with_derived_fields

        df = spark.createDataFrame([(1, 1577836800000)],
                                   "doc_id long, ms long")
        out = with_derived_fields(
            df, {"d": {"type": "date", "script": "doc['ms'].value"}})
        assert str(out.first()["d"]) == "2020-01-01"
        with _pt.raises(ValueError, match="conflicts"):
            with_derived_fields(
                df, {"ms": {"type": "long", "script": "1"}})


def test_percolate_range_postures_randomized_vs_bruteforce(spark):
    """Seeded randomized equivalence: every range-query shape (narrow,
    wide, half-planes both directions, full-range, empty-above-vmax,
    point) over docs INCLUDING null values, compared across the
    broadcast posture, the forced grid/sweep posture, and an
    independent pure-Python brute force. Guards the whole leg-routing
    surface far beyond the hand-picked cases."""
    import random

    rng = random.Random(0xC0FFEE)
    doc_rows = []
    for i in range(400):
        v = None if rng.random() < 0.08 else round(rng.uniform(-50, 950), 2)
        doc_rows.append((i, v))
    docs = spark.createDataFrame(doc_rows, "doc_id long, val double")
    qs = []
    for qid in range(120):
        shape = rng.random()
        if shape < 0.55:                       # bounded, mixed widths
            lo = round(rng.uniform(-100, 900), 2)
            w = rng.choice([0.0, rng.uniform(0.1, 30),
                            rng.uniform(100, 2000)])
            qs.append(PercQuery(qid, "range", "val", lo=lo,
                                hi=round(lo + w, 2)))
        elif shape < 0.75:                     # half-plane [lo, inf)
            qs.append(PercQuery(qid, "range", "val",
                                lo=round(rng.uniform(-100, 1100), 2)))
        elif shape < 0.95:                     # half-plane (-inf, hi]
            qs.append(PercQuery(qid, "range", "val",
                                hi=round(rng.uniform(-100, 1100), 2)))
        else:                                  # full-range (exists)
            qs.append(PercQuery(qid, "range", "val"))
    brute = {(d, q.query_id) for d, v in doc_rows if v is not None
             for q in qs
             if (q.lo is None or v >= q.lo) and (q.hi is None or v <= q.hi)}
    for bmax in (len(qs) + 1, 0):
        got = {(r["doc_id"], r["query_id"])
               for r in percolate(spark, qs, docs,
                                  broadcast_max_queries=bmax).collect()}
        assert got == brute, f"posture bmax={bmax} diverged"


def test_percolate_text_legs_randomized_vs_bruteforce(spark):
    """Seeded randomized equivalence for the text legs: match (msm 1..n),
    keyword term, and phrase queries over random word-soup docs vs a
    pure-Python brute force, in the broadcast AND the shuffle posture."""
    import random

    rng = random.Random(0xBEEF)
    vocab = [f"w{i}" for i in range(12)]
    langs = ["en", "fr", "de"]
    doc_rows = []
    for i in range(250):
        toks = [rng.choice(vocab) for _ in range(rng.randint(1, 12))]
        doc_rows.append((i, " ".join(toks), rng.choice(langs), "s", len(toks)))
    docs = spark.createDataFrame(
        doc_rows, "doc_id long, text string, lang string, source string, "
                  "n_chars long")
    qs, brute = [], set()
    toklists = {d: t.split() for d, t, *_ in doc_rows}
    for qid in range(60):
        shape = rng.random()
        if shape < 0.5:
            terms = tuple(rng.sample(vocab, rng.randint(1, 4)))
            msm = rng.randint(1, len(terms))
            qs.append(PercQuery(qid, "match", "text", terms=terms,
                                min_should_match=msm))
            for d, toks in toklists.items():
                if sum(1 for t in set(terms) if t in toks) >= msm:
                    brute.add((d, qid))
        elif shape < 0.7:
            lang = rng.choice(langs)
            qs.append(PercQuery(qid, "term", "lang", value=lang))
            for row in doc_rows:
                if row[2] == lang:
                    brute.add((row[0], qid))
        else:
            phrase = tuple(rng.choice(vocab)
                           for _ in range(rng.randint(2, 3)))
            qs.append(PercQuery(qid, "phrase", "text", terms=phrase))
            n = len(phrase)
            for d, toks in toklists.items():
                if any(tuple(toks[i:i + n]) == phrase
                       for i in range(len(toks) - n + 1)):
                    brute.add((d, qid))
    for bmax in (len(qs) + 1, 0):
        got = {(r["doc_id"], r["query_id"])
               for r in percolate(spark, qs, docs,
                                  broadcast_max_queries=bmax).collect()}
        assert got == brute, f"text posture bmax={bmax} diverged"


def test_geo_distance_randomized_centers_vs_bruteforce(spark, sf_dir):
    """Seeded randomized geo_distance: random origins INCLUDING
    antimeridian and near-pole centers, random radii — the
    prefilter+haversine result must equal a pure-Python haversine brute
    force over every doc (the r4 conservative-prefilter surface:
    latitude-band cosine, pole caps, modular longitude)."""
    import random

    docs = with_geo(spark.read.parquet(f"{sf_dir}/documents.parquet"))
    rows = [(r["doc_id"], r["lat"], r["lon"])
            for r in docs.select("doc_id", "lat", "lon").collect()]

    def hav_km(lat1, lon1, lat2, lon2):
        R = 6371.0088
        p1, p2 = math.radians(lat1), math.radians(lat2)
        dp = math.radians(lat2 - lat1)
        dl = math.radians(lon2 - lon1)
        a = (math.sin(dp / 2) ** 2
             + math.cos(p1) * math.cos(p2) * math.sin(dl / 2) ** 2)
        return 2 * R * math.asin(min(1.0, math.sqrt(a)))

    rng = random.Random(0x6E0)
    centers = [(rng.uniform(-55, 55), rng.uniform(-170, 170))
               for _ in range(6)]
    centers += [(10.0, 179.5), (-20.0, -179.8),     # antimeridian
                (88.0, 45.0), (-87.5, -120.0)]      # near-pole caps
    for case, (clat, clon) in enumerate(centers):
        radius = rng.choice([50.0, 500.0, 2500.0, 9000.0])
        got = {r["doc_id"] for r in
               geo_distance(docs, clat, clon, radius).collect()}
        want = {d for d, la, lo in rows
                if round(hav_km(clat, clon, la, lo), 3) <= radius}
        assert got == want, f"case {case}: center=({clat},{clon}) r={radius}"
