"""Geo queries, sorts, and grid aggregations.

Reference: ``server/src/main/java/org/opensearch/index/query/
GeoDistanceQueryBuilder.java``, ``GeoBoundingBoxQueryBuilder.java``,
``search/aggregations/bucket/geogrid/GeoTileGridAggregationBuilder.java``
(+ ``GeoTileUtils.java`` for the slippy-map tile math),
``search/aggregations/metrics/GeoCentroidAggregationBuilder.java`` and
``GeoBoundsAggregator.java``, ``search/sort/GeoDistanceSortBuilder.java``.

The test corpus has no geo columns, so the gates derive a DETERMINISTIC
``geo_point`` per document from ``doc_id`` (pure integer-mod arithmetic —
reproducible in both engines, no external data). The operators themselves
are generic: give ``haversine_km`` / ``geotile_xy`` real lat/lon columns
and the same plans apply.

All geo math is JVM-side column arithmetic (whole-stage codegen): a
distance filter is a scan + filter (pushdown-friendly once the bounding
prefilter is applied), the tile grid is two integer expressions + one
hash aggregate — nothing here shuffles more than the grouping requires.
A 100 TB geo-distance query should prefilter with the cheap bounding box
(lat/lon range predicates push to parquet row-group stats) before the
trig — ``geo_distance`` below does exactly that.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F

EARTH_RADIUS_KM = 6371.0088  # mean Earth radius (IUGG), GeoUtils.java


def with_geo(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach the deterministic derived geo_point: lat ∈ [-60, 60),
    lon ∈ [-180, 180), two-decimal grid (id-hash mod arithmetic)."""
    return df.withColumn(
        "lat", F.lit(-60.0) + ((F.col(id_col) * 7919) % 12000) / F.lit(100.0)
    ).withColumn(
        "lon", F.lit(-180.0) + ((F.col(id_col) * 104729) % 36000) / F.lit(100.0)
    )


# the same derivation as DuckDB-runnable SQL (oracle twin)
GEO_SQL_CTE = """
g AS (
    SELECT *,
           -60.0 + ((doc_id * 7919) % 12000) / 100.0 AS lat,
           -180.0 + ((doc_id * 104729) % 36000) / 100.0 AS lon
    FROM documents
)
"""


def haversine_km(lat: Column, lon: Column,
                 origin_lat: float, origin_lon: float) -> Column:
    """Great-circle distance to a fixed origin (GeoDistance.ARC)."""
    dlat = F.radians(lat - F.lit(origin_lat)) / 2
    dlon = F.radians(lon - F.lit(origin_lon)) / 2
    a = (F.sin(dlat) * F.sin(dlat)
         + math.cos(math.radians(origin_lat)) * F.cos(F.radians(lat))
         * F.sin(dlon) * F.sin(dlon))
    return F.lit(2.0 * EARTH_RADIUS_KM) * F.asin(F.sqrt(a))


def haversine_sql(origin_lat: float, origin_lon: float) -> str:
    """Identical formula as DuckDB SQL over g.lat/g.lon (shared shape with
    haversine_km so both engines round-trip to the same 3 decimals)."""
    return (
        f"2 * {EARTH_RADIUS_KM} * asin(sqrt("
        f"sin(radians(lat - {origin_lat}) / 2) * sin(radians(lat - {origin_lat}) / 2)"
        f" + cos(radians({origin_lat})) * cos(radians(lat))"
        f" * sin(radians(lon - {origin_lon}) / 2) * sin(radians(lon - {origin_lon}) / 2)"
        f"))"
    )


def _bounding_box_deg(origin_lat: float, radius_km: float) -> tuple[float, float]:
    """CONSERVATIVE lat/lon half-widths (degrees) enclosing the radius —
    the cheap prefilter Lucene gets from the BKD tree; here it becomes a
    parquet-pushable range predicate. Conservative means: the lon width
    uses the smallest cosine over the whole LAT BAND (a circle's east/
    west extremes sit at higher |lat| than its center — using cos(origin)
    clipped genuine matches; round-4 review), and any band that reaches
    a pole (or a width ≥ 180°) disables the lon constraint entirely —
    every meridian passes near a pole."""
    dlat = math.degrees(radius_km / EARTH_RADIUS_KM) * 1.001
    lat_lo, lat_hi = origin_lat - dlat, origin_lat + dlat
    if lat_lo <= -90.0 or lat_hi >= 90.0:
        return dlat, 180.0  # cap crosses a pole: no lon pruning possible
    min_cos = min(math.cos(math.radians(lat_lo)),
                  math.cos(math.radians(lat_hi)))
    if min_cos <= 1e-9:
        return dlat, 180.0
    dlon = math.degrees(radius_km / (EARTH_RADIUS_KM * min_cos)) * 1.001
    return dlat, min(180.0, dlon)


def geo_distance(df: DataFrame, origin_lat: float, origin_lon: float,
                 radius_km: float, *, round_to: int = 3) -> DataFrame:
    """Filter to points within radius_km of the origin; adds ``dist_km``
    (rounded, so the inclusion decision is identical across engines).
    Plan: bounding-box range prefilter (pushdown) → haversine → filter.
    The lon prefilter compares MODULAR longitude distance, so an origin
    near ±180° keeps its antimeridian neighbors (round-4 review)."""
    dlat, dlon = _bounding_box_deg(origin_lat, radius_km)
    pre = df.where(
        (F.col("lat") >= origin_lat - dlat)
        & (F.col("lat") <= origin_lat + dlat))
    if dlon < 180.0:
        # modular lon difference in [0, 180]; plain |lon - lon0| would
        # drop matches across the antimeridian
        lon_diff = F.abs(
            F.pmod(F.col("lon") - F.lit(origin_lon) + F.lit(540.0),
                   F.lit(360.0)) - F.lit(180.0))
        pre = pre.where(lon_diff <= F.lit(dlon))
    d = F.round(haversine_km(F.col("lat"), F.col("lon"), origin_lat, origin_lon),
                round_to)
    return pre.withColumn("dist_km", d).where(F.col("dist_km") <= radius_km)


def geo_bounding_box(df: DataFrame, top: float, left: float,
                     bottom: float, right: float) -> DataFrame:
    """GeoBoundingBoxQueryBuilder.java: pure range predicates."""
    return df.where(
        (F.col("lat") <= F.lit(top)) & (F.col("lat") >= F.lit(bottom))
        & (F.col("lon") >= F.lit(left)) & (F.col("lon") <= F.lit(right))
    )


def geotile_xy(lat: Column, lon: Column, zoom: int) -> tuple[Column, Column]:
    """Slippy-map tile coordinates (GeoTileUtils.longEncode): x from the
    linear lon scale, y from the Mercator projection."""
    n = float(1 << zoom)
    x = F.floor((lon + F.lit(180.0)) / F.lit(360.0) * F.lit(n)).cast("long")
    lat_rad = F.radians(lat)
    merc = F.log(F.tan(lat_rad) + F.lit(1.0) / F.cos(lat_rad))
    y = F.floor((F.lit(1.0) - merc / F.lit(math.pi)) / F.lit(2.0) * F.lit(n)).cast("long")
    # clamp (GeoTileUtils checks bounds); lat within ±60 never hits them,
    # but keep the operator total for arbitrary inputs
    nmax = (1 << zoom) - 1
    x = F.greatest(F.lit(0), F.least(F.lit(nmax), x))
    y = F.greatest(F.lit(0), F.least(F.lit(nmax), y))
    return x, y


def geotile_sql(zoom: int) -> tuple[str, str]:
    """DuckDB twin of geotile_xy over g.lat/g.lon."""
    n = float(1 << zoom)
    nmax = (1 << zoom) - 1
    x = (f"greatest(0, least({nmax}, "
         f"CAST(floor((lon + 180.0) / 360.0 * {n}) AS BIGINT)))")
    y = (f"greatest(0, least({nmax}, CAST(floor((1.0 - "
         f"ln(tan(radians(lat)) + 1.0 / cos(radians(lat))) / pi()"
         f") / 2.0 * {n}) AS BIGINT)))")
    return x, y


# --------------------------------------------------------------------------
# geo_polygon query + geo_shape (envelope) relations
# Reference: ``server/src/main/java/org/opensearch/index/query/
# GeoPolygonQueryBuilder.java`` (point-in-polygon over indexed points) and
# ``GeoShapeQueryBuilder.java`` + ``common/geo/ShapeRelation.java``
# (INTERSECTS / DISJOINT / WITHIN / CONTAINS). The reference indexes
# polygons as BKD triangle trees (Lucene LatLonShape); here the corpus has
# no shape column, so the shape field is a deterministic derived ENVELOPE
# per document (the one shape type whose relation algebra is exact interval
# arithmetic — fully expressible as codegen range predicates), and the
# polygon query runs the classical ray-cast over the derived points.
# Both are pure JVM column expressions: a polygon with V vertices compiles
# to V crossing indicators + a parity test, an envelope relation to 4 range
# predicates — all pushdown-friendly after the cheap bbox prefilter.
# --------------------------------------------------------------------------

#: fixed query pentagon for the gate: (lat, lon) vertices, no two adjacent
#: vertices share a latitude (keeps every edge's slope finite; horizontal
#: edges are skipped by construction in both engines anyway)
POLYGON = [(45.0, -100.0), (20.0, -20.0), (-15.0, 30.0),
           (-40.0, -50.0), (5.0, -140.0)]


def _polygon_edges(vertices):
    """(yi, xi, yj, xj, slope) per non-horizontal edge; slope computed
    ONCE in Python so Spark and the SQL oracle multiply by the identical
    double (no per-engine division-order drift)."""
    n = len(vertices)
    edges = []
    for i in range(n):
        yi, xi = vertices[i]
        yj, xj = vertices[(i - 1) % n]
        if yj == yi:
            continue  # horizontal edge can never satisfy the crossing test
        edges.append((yi, xi, yj, xj, (xj - xi) / (yj - yi)))
    return edges


def point_in_polygon(lat: Column, lon: Column, vertices) -> Column:
    """PNPOLY ray cast: count edges whose half-open lat span covers the
    point and whose lon-intercept at the point's lat lies to its east;
    odd count = inside. V unrolled indicators + one parity test — whole
    stage codegen, no UDF."""
    c = F.lit(0)
    for yi, xi, yj, xj, slope in _polygon_edges(vertices):
        cross = ((F.lit(yi) > lat) != (F.lit(yj) > lat)) & \
            (lon < (lat - F.lit(yi)) * F.lit(slope) + F.lit(xi))
        c = c + F.when(cross, 1).otherwise(0)
    return (c % 2) == 1


def polygon_sql(vertices, lat: str = "lat", lon: str = "lon") -> str:
    """DuckDB twin of point_in_polygon (identical constants and op order)."""
    terms = []
    for yi, xi, yj, xj, slope in _polygon_edges(vertices):
        terms.append(
            f"(CASE WHEN (({yi!r} > {lat}) <> ({yj!r} > {lat})) AND "
            f"({lon} < ({lat} - {yi!r}) * {slope!r} + {xi!r}) "
            f"THEN 1 ELSE 0 END)")
    return "((" + " + ".join(terms) + ") % 2 = 1)"


def geo_polygon(df: DataFrame, vertices=None) -> DataFrame:
    """geo_polygon query (GeoPolygonQueryBuilder.java): bbox prefilter
    (pushable range predicates — the BKD-tree analog) then the exact
    ray cast."""
    vertices = vertices or POLYGON
    lat_lo = min(v[0] for v in vertices)
    lat_hi = max(v[0] for v in vertices)
    lon_lo = min(v[1] for v in vertices)
    lon_hi = max(v[1] for v in vertices)
    pre = df.where((F.col("lat") >= lat_lo) & (F.col("lat") <= lat_hi)
                   & (F.col("lon") >= lon_lo) & (F.col("lon") <= lon_hi))
    return pre.where(point_in_polygon(F.col("lat"), F.col("lon"), vertices))


# ---- geo_shape over derived envelopes -----------------------------------

#: derived envelope spans: height 0.5..6.5 deg, width 0.6..10.6 deg —
#: wide enough that WITHIN and CONTAINS are both non-vacuous vs the gate's
#: query envelopes at every test sf
ENV_LAT_SPAN_MOD = 7
ENV_LON_SPAN_MOD = 11


def with_envelope(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach the deterministic derived envelope (builds on with_geo's
    lat/lon as the south-west corner)."""
    g = with_geo(df, id_col)
    return (g.withColumn("lat_hi", F.col("lat") + 0.5
                         + (F.col(id_col) % ENV_LAT_SPAN_MOD))
            .withColumn("lon_hi", F.col("lon") + 0.6
                        + (F.col(id_col) % ENV_LON_SPAN_MOD))
            .withColumnRenamed("lat", "lat_lo")
            .withColumnRenamed("lon", "lon_lo"))


ENVELOPE_SQL_CTE = f"""
env AS (
    SELECT doc_id,
           -60.0 + ((doc_id * 7919) % 12000) / 100.0 AS lat_lo,
           -180.0 + ((doc_id * 104729) % 36000) / 100.0 AS lon_lo,
           -60.0 + ((doc_id * 7919) % 12000) / 100.0
               + 0.5 + (doc_id % {ENV_LAT_SPAN_MOD}) AS lat_hi,
           -180.0 + ((doc_id * 104729) % 36000) / 100.0
               + 0.6 + (doc_id % {ENV_LON_SPAN_MOD}) AS lon_hi
    FROM documents
)
"""


def envelope_relation(df: DataFrame, q_lat_lo: float, q_lat_hi: float,
                      q_lon_lo: float, q_lon_hi: float,
                      relation: str) -> DataFrame:
    """geo_shape envelope query under a ShapeRelation.java relation —
    exact 2-D interval algebra as pushable range predicates."""
    inter = ((F.col("lat_lo") <= q_lat_hi) & (F.col("lat_hi") >= q_lat_lo)
             & (F.col("lon_lo") <= q_lon_hi) & (F.col("lon_hi") >= q_lon_lo))
    if relation == "intersects":
        cond = inter
    elif relation == "disjoint":
        cond = ~inter
    elif relation == "within":  # doc envelope inside the query envelope
        cond = ((F.col("lat_lo") >= q_lat_lo) & (F.col("lat_hi") <= q_lat_hi)
                & (F.col("lon_lo") >= q_lon_lo) & (F.col("lon_hi") <= q_lon_hi))
    elif relation == "contains":  # doc envelope covers the query envelope
        cond = ((F.col("lat_lo") <= q_lat_lo) & (F.col("lat_hi") >= q_lat_hi)
                & (F.col("lon_lo") <= q_lon_lo) & (F.col("lon_hi") >= q_lon_hi))
    else:
        raise ValueError(f"unknown shape relation: {relation}")
    return df.where(cond)


def envelope_relation_sql(q_lat_lo: float, q_lat_hi: float,
                          q_lon_lo: float, q_lon_hi: float,
                          relation: str) -> str:
    """DuckDB twin of envelope_relation as a boolean expression over env."""
    inter = (f"(lat_lo <= {q_lat_hi!r} AND lat_hi >= {q_lat_lo!r} "
             f"AND lon_lo <= {q_lon_hi!r} AND lon_hi >= {q_lon_lo!r})")
    if relation == "intersects":
        return inter
    if relation == "disjoint":
        return f"(NOT {inter})"
    if relation == "within":
        return (f"(lat_lo >= {q_lat_lo!r} AND lat_hi <= {q_lat_hi!r} "
                f"AND lon_lo >= {q_lon_lo!r} AND lon_hi <= {q_lon_hi!r})")
    if relation == "contains":
        return (f"(lat_lo <= {q_lat_lo!r} AND lat_hi >= {q_lat_hi!r} "
                f"AND lon_lo <= {q_lon_lo!r} AND lon_hi >= {q_lon_hi!r})")
    raise ValueError(f"unknown shape relation: {relation}")


# --------------------------------------------------------------------------
# geohash_grid bucket aggregation
# Reference: ``modules/geo/src/main/java/org/opensearch/geo/search/
# aggregations/bucket/geogrid/GeoHashGridAggregationBuilder.java`` (+
# ``GeoHashGridAggregator.java``; cell encoding = classic geohash:
# MSB-first bit interleave of the binary lon/lat subdivision, base32).
# Fixed precision unrolls to pure integer shift/mask expressions — whole
# stage codegen in Spark and the identical arithmetic in the DuckDB
# oracle, so the bucket keys match exactly.
# --------------------------------------------------------------------------

GEOHASH_B32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def _geohash_bit_plan(precision: int):
    """(n_lon_bits, n_lat_bits, [(src, src_bit, out_bit), ...]) for the
    MSB-first interleave: even output bits from lon, odd from lat."""
    total = 5 * precision
    n_lon = (total + 1) // 2
    n_lat = total // 2
    plan = []
    for j in range(total):
        if j % 2 == 0:
            plan.append(("lon", n_lon - 1 - j // 2, total - 1 - j))
        else:
            plan.append(("lat", n_lat - 1 - (j - 1) // 2, total - 1 - j))
    return n_lon, n_lat, plan


def geohash_col(lat: Column, lon: Column, precision: int = 4) -> Column:
    """Geohash cell id of a point at the given precision (chars)."""
    n_lon, n_lat, plan = _geohash_bit_plan(precision)
    lon_q = F.least(F.lit((1 << n_lon) - 1), F.greatest(F.lit(0), F.floor(
        (lon + F.lit(180.0)) / F.lit(360.0) * F.lit(float(1 << n_lon))
    ).cast("long")))
    lat_q = F.least(F.lit((1 << n_lat) - 1), F.greatest(F.lit(0), F.floor(
        (lat + F.lit(90.0)) / F.lit(180.0) * F.lit(float(1 << n_lat))
    ).cast("long")))
    v = F.lit(0).cast("long")
    for src, src_bit, out_bit in plan:
        q = lon_q if src == "lon" else lat_q
        v = v + F.shiftleft(F.shiftright(q, src_bit).bitwiseAND(F.lit(1)),
                            out_bit)
    alphabet = F.array(*[F.lit(c) for c in GEOHASH_B32])
    chars = [
        F.element_at(alphabet,
                     (F.shiftright(v, 5 * (precision - 1 - k))
                      .bitwiseAND(F.lit(31)) + F.lit(1)).cast("int"))
        for k in range(precision)
    ]
    return F.concat(*chars)


def geohash_sql_parts(precision: int = 4, lat: str = "lat",
                      lon: str = "lon") -> tuple[str, str, str, str]:
    """DuckDB twin of geohash_col as CTE-stageable pieces (identical
    quantization + interleave): returns (lonq_expr over lat/lon,
    latq_expr over lat/lon, v_expr over lonq/latq, geohash_expr over v).
    Stage them as chained CTEs so each is computed once per row."""
    n_lon, n_lat, plan = _geohash_bit_plan(precision)
    lon_q = (f"least({(1 << n_lon) - 1}, greatest(0, "
             f"CAST(floor(({lon} + 180.0) / 360.0 * {float(1 << n_lon)!r}) "
             f"AS BIGINT)))")
    lat_q = (f"least({(1 << n_lat) - 1}, greatest(0, "
             f"CAST(floor(({lat} + 90.0) / 180.0 * {float(1 << n_lat)!r}) "
             f"AS BIGINT)))")
    terms = []
    for src, src_bit, out_bit in plan:
        q = "lonq" if src == "lon" else "latq"
        terms.append(f"((({q} >> {src_bit}) & 1) << {out_bit})")
    v = "(" + " + ".join(terms) + ")"
    chars = " || ".join(
        f"substr('{GEOHASH_B32}', "
        f"CAST(((v >> {5 * (precision - 1 - k)}) & 31) AS INT) + 1, 1)"
        for k in range(precision))
    return lon_q, lat_q, v, f"({chars})"


# --------------------------------------------------------------------------
# geo_shape POLYGON geometry vs doc envelopes — closes the last non-goal
# Reference: ``index/query/GeoShapeQueryBuilder.java`` with a POLYGON
# geometry + ``common/geo/ShapeRelation.java``. The reference answers these
# via the Lucene BKD triangle tree (LatLonShape); with doc shapes being
# axis-aligned envelopes, polygon-vs-rectangle relations reduce to EXACT
# algebra: per-edge segment-vs-rectangle intersection tests (each a handful
# of comparisons + one linear interpolation whose slope is a Python-computed
# constant) plus the existing PNPOLY ray cast for the containment cases.
# Everything unrolls to whole-stage-codegen boolean columns over the four
# envelope bounds; the DuckDB twin inlines the identical constants.
#
# Relation algebra over rect R (columns) and polygon P (constants):
#   edge_hit  = any edge of P touches R (endpoint inside R, or edge crosses
#               one of R's four sides)
#   intersects = edge_hit OR corner(R) in P       (no-hit + corner-in ⇒ R⊂P)
#   disjoint   = NOT intersects
#   within     = corner(R) in P AND NOT edge_hit  (R strictly inside P)
#   contains   = every vertex of P inside R       (R convex ⇒ edges follow)
# --------------------------------------------------------------------------

def _poly_segments(vertices):
    """Closed-ring segments ((y1, x1) -> (y2, x2)) with Python-computed
    inverse slopes: dxdy (lon per lat) for horizontal-side crossings and
    dydx (lat per lon) for vertical-side crossings; None where the edge is
    parallel to that side family (no proper crossing possible)."""
    segs = []
    n = len(vertices)
    for i in range(n):
        y1, x1 = vertices[i]
        y2, x2 = vertices[(i + 1) % n]
        dxdy = (x2 - x1) / (y2 - y1) if y2 != y1 else None
        dydx = (y2 - y1) / (x2 - x1) if x2 != x1 else None
        segs.append((y1, x1, y2, x2, dxdy, dydx))
    return segs


def _edge_hit_col(vertices) -> Column:
    """True when any polygon edge touches the envelope [lat_lo,lat_hi] x
    [lon_lo,lon_hi] (endpoint inside, or a proper side crossing)."""
    lat_lo, lat_hi = F.col("lat_lo"), F.col("lat_hi")
    lon_lo, lon_hi = F.col("lon_lo"), F.col("lon_hi")

    def inside(y, x):
        return ((lat_lo <= y) & (F.lit(y) <= lat_hi)
                & (lon_lo <= x) & (F.lit(x) <= lon_hi))

    hit = F.lit(False)
    for y1, x1, y2, x2, dxdy, dydx in _poly_segments(vertices):
        h = inside(y1, x1) | inside(y2, x2)
        ylo, yhi = min(y1, y2), max(y1, y2)
        xlo, xhi = min(x1, x2), max(x1, x2)
        if dxdy is not None:
            # crossing the horizontal sides y = lat_lo / lat_hi
            for side in (lat_lo, lat_hi):
                x_at = (side - F.lit(y1)) * F.lit(dxdy) + F.lit(x1)
                h = h | ((F.lit(ylo) <= side) & (side <= F.lit(yhi))
                         & (lon_lo <= x_at) & (x_at <= lon_hi))
        if dydx is not None:
            # crossing the vertical sides x = lon_lo / lon_hi
            for side in (lon_lo, lon_hi):
                y_at = (side - F.lit(x1)) * F.lit(dydx) + F.lit(y1)
                h = h | ((F.lit(xlo) <= side) & (side <= F.lit(xhi))
                         & (lat_lo <= y_at) & (y_at <= lat_hi))
        hit = hit | h
    return hit


def polygon_envelope_relation(df: DataFrame, vertices,
                              relation: str) -> DataFrame:
    """geo_shape POLYGON query against the derived doc envelopes under a
    ShapeRelation.java relation — exact segment/ray-cast algebra, all
    codegen columns over (lat_lo, lat_hi, lon_lo, lon_hi)."""
    edge_hit = _edge_hit_col(vertices)
    corner_in = point_in_polygon(F.col("lat_lo"), F.col("lon_lo"), vertices)
    if relation == "intersects":
        cond = edge_hit | corner_in
    elif relation == "disjoint":
        cond = ~(edge_hit | corner_in)
    elif relation == "within":      # doc envelope strictly inside polygon
        cond = corner_in & ~edge_hit
    elif relation == "contains":    # doc envelope covers the whole polygon
        cond = F.lit(True)
        for y, x in vertices:
            cond = cond & (F.col("lat_lo") <= y) & (F.lit(y) <= F.col("lat_hi")) \
                & (F.col("lon_lo") <= x) & (F.lit(x) <= F.col("lon_hi"))
    else:
        raise ValueError(f"unknown shape relation: {relation}")
    return df.where(cond)


def _edge_hit_sql(vertices) -> str:
    """DuckDB twin of _edge_hit_col over the env CTE columns."""
    parts = []
    for y1, x1, y2, x2, dxdy, dydx in _poly_segments(vertices):
        terms = [f"(lat_lo <= {y1!r} AND {y1!r} <= lat_hi AND "
                 f"lon_lo <= {x1!r} AND {x1!r} <= lon_hi)",
                 f"(lat_lo <= {y2!r} AND {y2!r} <= lat_hi AND "
                 f"lon_lo <= {x2!r} AND {x2!r} <= lon_hi)"]
        ylo, yhi = min(y1, y2), max(y1, y2)
        xlo, xhi = min(x1, x2), max(x1, x2)
        if dxdy is not None:
            for side in ("lat_lo", "lat_hi"):
                x_at = f"(({side} - {y1!r}) * {dxdy!r} + {x1!r})"
                terms.append(
                    f"({ylo!r} <= {side} AND {side} <= {yhi!r} AND "
                    f"lon_lo <= {x_at} AND {x_at} <= lon_hi)")
        if dydx is not None:
            for side in ("lon_lo", "lon_hi"):
                y_at = f"(({side} - {x1!r}) * {dydx!r} + {y1!r})"
                terms.append(
                    f"({xlo!r} <= {side} AND {side} <= {xhi!r} AND "
                    f"lat_lo <= {y_at} AND {y_at} <= lat_hi)")
        parts.append("(" + " OR ".join(terms) + ")")
    return "(" + " OR ".join(parts) + ")"


def polygon_envelope_relation_sql(vertices, relation: str) -> str:
    """DuckDB twin of polygon_envelope_relation as a boolean expression."""
    edge_hit = _edge_hit_sql(vertices)
    corner_in = polygon_sql(vertices, lat="lat_lo", lon="lon_lo")
    if relation == "intersects":
        return f"({edge_hit} OR {corner_in})"
    if relation == "disjoint":
        return f"(NOT ({edge_hit} OR {corner_in}))"
    if relation == "within":
        return f"({corner_in} AND NOT {edge_hit})"
    if relation == "contains":
        conds = [f"(lat_lo <= {y!r} AND {y!r} <= lat_hi AND "
                 f"lon_lo <= {x!r} AND {x!r} <= lon_hi)"
                 for y, x in vertices]
        return "(" + " AND ".join(conds) + ")"
    raise ValueError(f"unknown shape relation: {relation}")


#: small query triangle inside doc 76's derived envelope
#: (lat [-41.56, -35.06], lon [-145.96, -135.36]) so CONTAINS is
#: non-vacuous at every test sf
SMALL_POLYGON = [(-40.5, -144.5), (-37.0, -143.0), (-39.5, -136.5)]

#: large query hexagon (~60 x 80 deg) — big enough that WITHIN (doc
#: envelopes are at most 6.5 x 10.6 deg) and both INTERSECTS/DISJOINT are
#: non-vacuous at every test sf; concave at (5, -35) to exercise the ray
#: cast on a reflex vertex
BIG_POLYGON = [(40.0, -40.0), (15.0, 0.0), (-20.0, -15.0), (5.0, -35.0),
               (-25.0, -60.0), (0.0, -80.0), (30.0, -70.0)]
