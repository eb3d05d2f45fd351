"""geo_polygon ray cast, geo_shape envelope relations, and semantic dedup.

Reference behavior: ``index/query/GeoPolygonQueryBuilder.java`` (point in
polygon), ``index/query/GeoShapeQueryBuilder.java`` +
``common/geo/ShapeRelation.java`` (envelope relation algebra);
semantic dedup follows SemDeDup (arXiv:2303.09540).
"""

import pytest
from pyspark.sql import functions as F

from opensearch_spark.ml import similarity as S
from opensearch_spark.search.geo import (
    POLYGON, envelope_relation, geo_polygon, point_in_polygon, polygon_sql,
    with_envelope, with_geo,
)


def _pts(spark, pts):
    return spark.createDataFrame(pts, "lat double, lon double")


SQUARE = [(0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0)]  # has horizontal edges


class TestPointInPolygon:
    def test_square_inside_outside(self, spark):
        df = _pts(spark, [(5.0, 5.0), (15.0, 5.0), (-1.0, 5.0),
                          (5.0, 15.0), (9.99, 9.99), (0.01, 0.01)])
        got = [bool(r["in"]) for r in df.select(
            point_in_polygon(F.col("lat"), F.col("lon"), SQUARE).alias("in")
        ).collect()]
        assert got == [True, False, False, False, True, True]

    def test_concave_polygon(self, spark):
        # arrowhead with a reflex vertex at (lat 5, lon 5): the notch is
        # the region just BELOW that vertex (lat < 5 near lon 5)
        poly = [(0.0, 0.0), (10.0, 5.0), (0.0, 10.0), (5.0, 5.0)]
        df = _pts(spark, [(5.0, 4.9), (2.0, 1.5), (4.0, 5.0),
                          (5.0, 9.0), (9.0, 5.0)])
        got = [bool(r["in"]) for r in df.select(
            point_in_polygon(F.col("lat"), F.col("lon"), poly).alias("in")
        ).collect()]
        assert got == [True, True, False, False, True]

    def test_sql_twin_agrees(self, spark):
        import duckdb

        pts = [(float(la) / 3.0, float(lo) / 3.0)
               for la in range(-150, 151, 7) for lo in range(-500, 501, 23)]
        df = _pts(spark, pts)
        spark_in = [bool(r["in"]) for r in df.select(
            point_in_polygon(F.col("lat"), F.col("lon"), POLYGON).alias("in")
        ).collect()]
        con = duckdb.connect()
        con.sql("CREATE TABLE p (lat DOUBLE, lon DOUBLE)")
        con.executemany("INSERT INTO p VALUES (?, ?)", pts)
        duck_in = [bool(r[0]) for r in con.sql(
            f"SELECT {polygon_sql(POLYGON)} FROM p").fetchall()]
        assert spark_in == duck_in
        assert any(spark_in) and not all(spark_in)

    def test_bbox_prefilter_equals_exact(self, spark, sf_dir):
        docs = with_geo(
            spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id"))
        via_op = {r["doc_id"] for r in geo_polygon(docs).collect()}
        exact = {r["doc_id"] for r in docs.where(
            point_in_polygon(F.col("lat"), F.col("lon"), POLYGON)).collect()}
        assert via_op == exact and via_op


class TestEnvelopeRelations:
    @pytest.fixture(scope="class")
    def env(self, spark, sf_dir):
        return with_envelope(
            spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id")).cache()

    def test_partition_intersects_disjoint(self, env):
        q = (0.0, 20.0, -40.0, 10.0)
        n = env.count()
        ni = envelope_relation(env, *q, "intersects").count()
        nd = envelope_relation(env, *q, "disjoint").count()
        assert ni + nd == n and ni > 0 and nd > 0

    def test_within_implies_intersects(self, env):
        q = (0.0, 30.0, -60.0, 0.0)
        w = {r["doc_id"] for r in envelope_relation(env, *q, "within").collect()}
        i = {r["doc_id"] for r in
             envelope_relation(env, *q, "intersects").collect()}
        assert w and w <= i

    def test_contains_doc76(self, env):
        # the gate's CONTAINS envelope sits inside doc 76's derived envelope
        q = (-40.0, -36.0, -144.0, -137.0)
        ids = {r["doc_id"] for r in
               envelope_relation(env, *q, "contains").collect()}
        assert 76 in ids

    def test_unknown_relation_raises(self, env):
        with pytest.raises(ValueError):
            envelope_relation(env, 0.0, 1.0, 0.0, 1.0, "overlaps")


class TestSemanticDedup:
    def test_survivors_plus_removed_cover_corpus(self, spark, sf_dir):
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        pairs = S.embedding_near_dup_pairs(emb, threshold=0.42).collect()
        assert pairs  # threshold chosen non-vacuous at every sf
        removed = {r["b"] for r in pairs}
        surv = {r["vec_id"] for r in S.semantic_dedup(emb, 0.42).collect()}
        allids = {r["vec_id"] for r in emb.select("vec_id").collect()}
        assert surv == allids - removed
        # every removed row has a surviving near-dup with a smaller id
        by_b = {}
        for r in pairs:
            by_b.setdefault(r["b"], []).append(r["a"])
        for b, partners in by_b.items():
            assert min(partners) < b

    def test_idempotent(self, spark, sf_dir):
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        once = S.semantic_dedup(emb, 0.42)
        twice = S.semantic_dedup(once, 0.42)
        assert once.count() == twice.count()


def _textbook_geohash(lat, lon, precision):
    """Interval-halving geohash from the public algorithm description."""
    b32 = "0123456789bcdefghjkmnpqrstuvwxyz"
    lat_lo, lat_hi = -90.0, 90.0
    lon_lo, lon_hi = -180.0, 180.0
    bits, out, even = 0, [], True
    bit_count, ch = 0, 0
    while len(out) < precision:
        if even:
            mid = (lon_lo + lon_hi) / 2
            if lon >= mid:
                ch = (ch << 1) | 1
                lon_lo = mid
            else:
                ch = ch << 1
                lon_hi = mid
        else:
            mid = (lat_lo + lat_hi) / 2
            if lat >= mid:
                ch = (ch << 1) | 1
                lat_lo = mid
            else:
                ch = ch << 1
                lat_hi = mid
        even = not even
        bit_count += 1
        if bit_count == 5:
            out.append(b32[ch])
            bit_count, ch = 0, 0
    return "".join(out)


class TestGeohashGrid:
    def test_known_cells(self, spark):
        # Public well-known examples of the geohash algorithm.
        assert _textbook_geohash(57.64911, 10.40744, 6) == "u4pruy"
        df = _pts(spark, [(57.64911, 10.40744), (48.669, -4.329)])
        from opensearch_spark.search.geo import geohash_col
        got = [r["h"] for r in df.select(
            geohash_col(F.col("lat"), F.col("lon"), 6).alias("h")
        ).collect()]
        assert got == ["u4pruy", "gbsuv7"]

    @pytest.mark.parametrize("precision", [1, 2, 4, 5])
    def test_matches_textbook_grid(self, spark, precision):
        pts = [(lat + 0.137, lon + 0.731)
               for lat in range(-90, 90, 17) for lon in range(-180, 180, 23)]
        from opensearch_spark.search.geo import geohash_col
        df = _pts(spark, pts)
        got = [r["h"] for r in df.select(
            geohash_col(F.col("lat"), F.col("lon"), precision).alias("h")
        ).collect()]
        want = [_textbook_geohash(lat, lon, precision) for lat, lon in pts]
        assert got == want

    def test_sql_twin_matches_spark(self, spark):
        import duckdb
        from opensearch_spark.search.geo import geohash_col, geohash_sql_parts
        pts = [(la * 7.31 - 88.0, lo * 13.7 - 170.0)
               for la in range(24) for lo in range(24)]
        df = _pts(spark, pts)
        got = sorted(r["h"] for r in df.select(
            geohash_col(F.col("lat"), F.col("lon"), 4).alias("h")).collect())
        lonq, latq, v, chars = geohash_sql_parts(4)
        con = duckdb.connect()
        con.execute("CREATE TABLE pts (lat DOUBLE, lon DOUBLE)")
        con.executemany("INSERT INTO pts VALUES (?, ?)", pts)
        want = sorted(r[0] for r in con.sql(
            f"WITH qz AS (SELECT {lonq} AS lonq, {latq} AS latq FROM pts), "
            f"vv AS (SELECT {v} AS v FROM qz) "
            f"SELECT {chars} FROM vv").fetchall())
        assert got == want


# --------------------------------------------------------------------------
# geo_shape POLYGON geometry vs doc envelopes
# Oracle: an INDEPENDENT pure-Python rect-vs-polygon implementation built
# on orientation-sign segment intersection (different primitive family
# from the operator's side-crossing interpolation), run over every sf0.001
# doc envelope.
# --------------------------------------------------------------------------

def _orient(a, b, c):
    return (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])


def _on_seg(a, b, c):
    return (min(a[0], b[0]) <= c[0] <= max(a[0], b[0])
            and min(a[1], b[1]) <= c[1] <= max(a[1], b[1]))


def _seg_x_seg(a, b, c, d):
    o1, o2 = _orient(a, b, c), _orient(a, b, d)
    o3, o4 = _orient(c, d, a), _orient(c, d, b)
    if (o1 > 0) != (o2 > 0) and (o3 > 0) != (o4 > 0) and 0 not in (o1, o2, o3, o4):
        return True
    for (p, q, r) in ((a, b, c), (a, b, d), (c, d, a), (c, d, b)):
        if _orient(p, q, r) == 0 and _on_seg(p, q, r):
            return True
    return False


def _pnpoly_py(y, x, vertices):
    inside = False
    n = len(vertices)
    for i in range(n):
        yi, xi = vertices[i]
        yj, xj = vertices[(i - 1) % n]
        if (yi > y) != (yj > y) and x < (y - yi) * (xj - xi) / (yj - yi) + xi:
            inside = not inside
    return inside


def _rect_poly_relation_py(ylo, yhi, xlo, xhi, vertices):
    """Independent oracle: relation of rect R to polygon P."""
    corners = [(ylo, xlo), (ylo, xhi), (yhi, xlo), (yhi, xhi)]
    rect_edges = [(corners[0], corners[1]), (corners[1], corners[3]),
                  (corners[3], corners[2]), (corners[2], corners[0])]
    n = len(vertices)
    edge_hit = False
    for i in range(n):
        a, b = vertices[i], vertices[(i + 1) % n]
        if (ylo <= a[0] <= yhi and xlo <= a[1] <= xhi) or \
           (ylo <= b[0] <= yhi and xlo <= b[1] <= xhi):
            edge_hit = True
            break
        if any(_seg_x_seg(a, b, c, d) for c, d in rect_edges):
            edge_hit = True
            break
    corner_in = _pnpoly_py(ylo, xlo, vertices)
    intersects = edge_hit or corner_in
    within = corner_in and not edge_hit
    contains = all(ylo <= y <= yhi and xlo <= x <= xhi for y, x in vertices)
    return {"intersects": intersects, "disjoint": not intersects,
            "within": within, "contains": contains}


class TestPolygonEnvelopeRelations:
    @pytest.fixture(scope="class")
    def env_rows(self, spark, sf_dir):
        from opensearch_spark.search.geo import with_envelope
        return (with_envelope(
            spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id"))
            .select("doc_id", "lat_lo", "lat_hi", "lon_lo", "lon_hi")
            .collect())

    @pytest.mark.parametrize("which", ["big", "small"])
    @pytest.mark.parametrize(
        "relation", ["intersects", "disjoint", "within", "contains"])
    def test_matches_independent_oracle(self, spark, sf_dir, env_rows,
                                        which, relation):
        from opensearch_spark.search.geo import (
            BIG_POLYGON, SMALL_POLYGON, polygon_envelope_relation,
            with_envelope)
        poly = BIG_POLYGON if which == "big" else SMALL_POLYGON
        env = with_envelope(
            spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id"))
        got = {r["doc_id"] for r in
               polygon_envelope_relation(env, poly, relation).collect()}
        want = {r["doc_id"] for r in env_rows
                if _rect_poly_relation_py(r["lat_lo"], r["lat_hi"],
                                          r["lon_lo"], r["lon_hi"],
                                          poly)[relation]}
        assert got == want

    def test_relations_non_vacuous(self, spark, sf_dir):
        from opensearch_spark.search.geo import (
            BIG_POLYGON, SMALL_POLYGON, polygon_envelope_relation,
            with_envelope)
        env = with_envelope(
            spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id")).cache()
        n = env.count()
        ni = polygon_envelope_relation(env, BIG_POLYGON, "intersects").count()
        nd = polygon_envelope_relation(env, BIG_POLYGON, "disjoint").count()
        nw = polygon_envelope_relation(env, BIG_POLYGON, "within").count()
        nc = polygon_envelope_relation(env, SMALL_POLYGON, "contains").count()
        assert ni + nd == n and ni > 0 and nd > 0 and nw > 0 and nc > 0

    def test_sql_twin_agrees(self, spark, sf_dir):
        import duckdb
        from opensearch_spark.search.geo import (
            BIG_POLYGON, SMALL_POLYGON, ENVELOPE_SQL_CTE,
            polygon_envelope_relation, polygon_envelope_relation_sql,
            with_envelope)
        env = with_envelope(
            spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id")).cache()
        con = duckdb.connect()
        con.sql(f"CREATE VIEW documents AS "
                f"SELECT * FROM read_parquet('{sf_dir}/documents.parquet')")
        for poly, rel in ((BIG_POLYGON, "intersects"), (BIG_POLYGON, "within"),
                          (BIG_POLYGON, "disjoint"), (SMALL_POLYGON, "contains")):
            got = {r["doc_id"] for r in
                   polygon_envelope_relation(env, poly, rel).collect()}
            want = {r[0] for r in con.sql(
                f"WITH {ENVELOPE_SQL_CTE} SELECT doc_id FROM env "
                f"WHERE {polygon_envelope_relation_sql(poly, rel)}").fetchall()}
            assert got == want, rel

    def test_unknown_relation_raises(self, spark):
        from opensearch_spark.search.geo import (
            BIG_POLYGON, polygon_envelope_relation, polygon_envelope_relation_sql)
        with pytest.raises(ValueError):
            polygon_envelope_relation_sql(BIG_POLYGON, "overlaps")
        df = _pts(spark, [(0.0, 0.0)])
        with pytest.raises(ValueError):
            polygon_envelope_relation(df, BIG_POLYGON, "overlaps")
