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
