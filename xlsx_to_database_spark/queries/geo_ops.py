"""Geospatial operators over deterministic synthetic coordinates.

The testdata carries no lat/lon, so every op derives coordinates from
customer keys with pure integer arithmetic (multiply-mod → fixed-point
/100) — deterministic, uniform-ish, and byte-identical in both engines.

Cross-engine exactness device: each geodesic/bit-twiddling formula is
built ONCE as a SQL expression string (common Spark/DuckDB dialect:
``floor``/``substr``/``>>``/``&``/``asin``/``radians``) and evaluated
verbatim by BOTH engines — identical expression tree over identical
doubles ⇒ identical IEEE results, no tolerance anywhere.

Spark-side scale notes: every op here is map-only or one-shuffle; the
geohash is 100% codegen arithmetic (no UDF), which is what makes
bucketing billions of points by cell essentially free at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from xlsx_to_database_spark.catalog import table
from xlsx_to_database_spark.registry import query

#: synthetic coordinates: multiply-mod fixed-point, 2 decimal places
# CAST .. AS DOUBLE before dividing: Spark parses the literal 100.0 as
# DECIMAL(4,1) (DuckDB as DOUBLE), so int/100.0 would diverge in TYPE
# (decimal vs double) and break hash parity; double/decimal -> double
# keeps both engines in IEEE land.
LAT_EXPR = "(CAST((k * 7919) % 17000 AS DOUBLE) / 100.0 - 85)"      # [-85, 85)
LON_EXPR = "(CAST((k * 104729) % 36000 AS DOUBLE) / 100.0 - 180)"   # [-180, 180)

_B32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def geohash5_expr(lat: str, lon: str) -> str:
    """SQL expression for the 5-character (25-bit) geohash of
    ``lat``/``lon`` expression strings — standard bit interleaving,
    longitude first, base32-coded MSB-first. Shared verbatim by the
    Spark plan (via ``expr``) and the DuckDB oracle."""
    lat_q = f"CAST(floor((({lat}) + 90) / 180 * 4096) AS BIGINT)"   # 12 bits
    lon_q = f"CAST(floor((({lon}) + 180) / 360 * 8192) AS BIGINT)"  # 13 bits
    terms = []
    for p in range(25):  # p = global bit position, MSB first
        if p % 2 == 0:
            src, bit = lon_q, 12 - p // 2
        else:
            src, bit = lat_q, 11 - (p - 1) // 2
        terms.append(f"((({src} >> {bit}) & 1) << {24 - p})")
    code = "(" + " + ".join(terms) + ")"
    chars = [
        f"substr('{_B32}', CAST(1 + (({code} >> {5 * (4 - t)}) & 31) AS INT), 1)"
        for t in range(5)
    ]
    return "concat(" + ", ".join(chars) + ")"


def haversine_expr(lat1: str, lon1: str, lat2: str, lon2: str) -> str:
    """SQL expression for the haversine great-circle distance in km
    (R = 6371), shared verbatim by both engines."""
    return (
        f"2 * 6371.0 * asin(sqrt("
        f"pow(sin(radians(({lat2}) - ({lat1})) / 2), 2)"
        f" + cos(radians({lat1})) * cos(radians({lat2}))"
        f" * pow(sin(radians(({lon2}) - ({lon1})) / 2), 2)))"
    )


_GH = geohash5_expr(LAT_EXPR, LON_EXPR)


@query(
    "geo_geohash",
    f"""
    SELECT k AS c_custkey,
           round({LAT_EXPR}, 2) AS lat,
           round({LON_EXPR}, 2) AS lon,
           {_GH} AS geohash5
    FROM (SELECT c_custkey AS k FROM customer)
    """,
)
def geo_geohash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geohash encoding (precision 5 ≈ 4.9 km cells) of every
    customer's synthetic location — THE spatial bucketing primitive:
    equal prefixes ⇒ nearby (the converse needs neighbor cells, which
    `join_grid_radius` demonstrates on grid cells). A geohash column
    turns spatial proximity joins into plain string-prefix equi-joins
    and makes Z-order-style clustering a lexicographic sort.

    Plan: map-only codegen arithmetic — bit interleaving and base32
    lookup are plain integer expressions (no UDF, no shuffle); encoding
    a 100 TB point set is exactly one pass. The same generated
    expression string runs in DuckDB, so the oracle match is
    bit-for-bit."""
    c = table(spark, sf_dir, "customer").selectExpr("c_custkey AS k")
    return c.selectExpr(
        "k AS c_custkey",
        f"round({LAT_EXPR}, 2) AS lat",
        f"round({LON_EXPR}, 2) AS lon",
        f"{_GH} AS geohash5",
    )


#: fixed warehouse sites (name, lat, lon)
_WAREHOUSES = (
    ("rotterdam", 51.92, 4.48),
    ("singapore", 1.35, 103.82),
    ("memphis", 35.15, -90.05),
    ("santos", -23.96, -46.33),
    ("yokohama", 35.44, 139.64),
)

_W_VALUES = ", ".join(
    f"('{n}', {la}, {lo})" for n, la, lo in _WAREHOUSES
)
_HAV = haversine_expr(LAT_EXPR, LON_EXPR, "w_lat", "w_lon")


@query(
    "geo_haversine_nearest",
    f"""
    SELECT c_custkey, warehouse, dist_km
    FROM (
      SELECT k AS c_custkey, w.name AS warehouse,
             round({_HAV}, 3) AS dist_km,
             row_number() OVER (
               PARTITION BY k ORDER BY round({_HAV}, 3), w.name
             ) AS rn
      FROM (SELECT c_custkey AS k FROM customer)
      CROSS JOIN (SELECT * FROM (VALUES {_W_VALUES})
                  AS v(name, w_lat, w_lon)) w
    ) WHERE rn = 1
    """,
)
def geo_haversine_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-warehouse assignment by haversine distance — the
    fulfilment/latency routing query. Each customer scores against the
    5 literal sites and keeps the argmin (ties break on site name; the
    rank key is the ROUNDED distance so the tie-break set is
    engine-identical).

    Plan: the site list is a broadcast 5-row fan-out (map-side), then
    one rank window per customer — but Spark rewrites rn=1 over a
    5-row partition into WindowGroupLimit, so per-customer state is one
    running minimum: effectively a map-only argmin with a shuffle on
    c_custkey only to group the 5 candidate rows. With K sites this is
    the K×N "cross join a bounded dim" shape, never N²."""
    c = table(spark, sf_dir, "customer").selectExpr("c_custkey AS k")
    w = spark.createDataFrame(
        list(_WAREHOUSES), "name string, w_lat double, w_lon double"
    )
    scored = (
        c.crossJoin(F.broadcast(w))
        .selectExpr(
            "k", "name AS warehouse", f"round({_HAV}, 3) AS dist_km"
        )
        .withColumnRenamed("k", "c_custkey")
    )
    rn = F.row_number().over(
        Window.partitionBy("c_custkey").orderBy("dist_km", "warehouse")
    )
    return (
        scored.withColumn("rn", rn).filter(F.col("rn") == 1).drop("rn")
    )


@query(
    "geo_bbox_agg",
    f"""
    SELECT c_nationkey AS nationkey,
           CAST(count(*) AS BIGINT) AS n_points,
           min(round({LAT_EXPR}, 2)) AS lat_min,
           max(round({LAT_EXPR}, 2)) AS lat_max,
           min(round({LON_EXPR}, 2)) AS lon_min,
           max(round({LON_EXPR}, 2)) AS lon_max,
           round(CAST(sum(CAST(round({LAT_EXPR}, 2) AS DECIMAL(8,2)))
                      AS DOUBLE) / count(*), 6) AS lat_centroid,
           round(CAST(sum(CAST(round({LON_EXPR}, 2) AS DECIMAL(8,2)))
                      AS DOUBLE) / count(*), 6) AS lon_centroid
    FROM (SELECT c_custkey AS k, c_nationkey FROM customer)
    GROUP BY c_nationkey
    """,
)
def geo_bbox_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation spatial summary: bounding box + centroid of customer
    locations — the tile/region statistics layer a map dashboard reads
    and the pre-aggregation a spatial partitioner sizes regions from.

    Exactness: coordinates quantize to DECIMAL(8,2) before the centroid
    sums, making the aggregation order-independent; extrema compare
    identical doubles. One partial-aggregating shuffle on the nation
    key — the canonical one-pass groupBy, nothing spatial about the
    plan (which is the point: bbox/centroid reduce to mergeable
    statistics)."""
    c = table(spark, sf_dir, "customer").selectExpr(
        "c_custkey AS k", "c_nationkey"
    )
    lat2 = f"round({LAT_EXPR}, 2)"
    lon2 = f"round({LON_EXPR}, 2)"
    return (
        c.selectExpr(
            "c_nationkey",
            f"{lat2} AS lat",
            f"{lon2} AS lon",
            f"CAST({lat2} AS DECIMAL(8,2)) AS lat_d",
            f"CAST({lon2} AS DECIMAL(8,2)) AS lon_d",
        )
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.min("lat").alias("lat_min"),
            F.max("lat").alias("lat_max"),
            F.min("lon").alias("lon_min"),
            F.max("lon").alias("lon_max"),
            F.round(
                F.sum("lat_d").cast("double") / F.count(F.lit(1)), 6
            ).alias("lat_centroid"),
            F.round(
                F.sum("lon_d").cast("double") / F.count(F.lit(1)), 6
            ).alias("lon_centroid"),
        )
    )


#: hexagon centered on the origin (radius ~60 degrees-of-arc units)
_POLY = ((60.0, 0.0), (30.0, 52.0), (-30.0, 52.0),
         (-60.0, 0.0), (-30.0, -52.0), (30.0, -52.0))


def point_in_polygon_expr(px: str, py: str, poly: tuple) -> str:
    """Ray-casting parity test as one unrolled SQL expression (edge
    count fixed ⇒ no loop, pure codegen): a horizontal ray from the
    point crosses edge (x1,y1)→(x2,y2) iff the edge straddles py and
    the intersection lies right of px. Odd crossings ⇒ inside. Shared
    verbatim by both engines. Horizontal edges (y1 == y2) are SKIPPED
    at generation time: they can never satisfy the straddle test, and
    emitting their term would put a literal zero denominator in the
    expression — correct only while both engines short-circuit the AND,
    a runtime error under strict/ANSI evaluation (round-5 advice)."""
    crossings = []
    n = len(poly)
    for i in range(n):
        x1, y1 = poly[i]
        x2, y2 = poly[(i + 1) % n]
        if y1 == y2:
            continue
        crossings.append(
            f"CAST(((({y1} > ({py})) <> ({y2} > ({py}))) AND "
            f"(({px}) < ({x2} - {x1}) * (({py}) - {y1})"
            f" / ({y2} - {y1}) + {x1})) AS INT)"
        )
    if not crossings:
        # Degenerate zero-height ring: every edge horizontal, nothing
        # can be inside — and "() % 2" would be a parse error.
        return "FALSE"
    return "((" + " + ".join(crossings) + ") % 2 = 1)"


_PIP = point_in_polygon_expr(LON_EXPR, LAT_EXPR, _POLY)


@query(
    "geo_point_in_polygon",
    f"""
    SELECT c_nationkey AS nationkey,
           CAST(count(*) AS BIGINT) AS n_total,
           CAST(count(*) FILTER (WHERE {_PIP}) AS BIGINT) AS n_inside
    FROM (SELECT c_custkey AS k, c_nationkey FROM customer)
    GROUP BY c_nationkey
    """,
)
def geo_point_in_polygon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-polygon containment (ray casting against a fixed
    hexagonal region) counted per nation — the geofencing primitive:
    delivery zones, regulatory regions, battlefield tiles all reduce to
    "is this point inside this polygon". With the vertex count fixed,
    the parity test unrolls into straight-line arithmetic — fully
    inside whole-stage codegen, no UDF, and the polygon test costs the
    same as any other filter predicate in a 100 TB scan. For many/large
    polygons the production pattern layers this behind a bbox or
    geohash-cell prefilter (`geo_geohash`) so exact ray casts run only
    on candidate cells."""
    c = table(spark, sf_dir, "customer").selectExpr(
        "c_custkey AS k", "c_nationkey"
    )
    return (
        c.selectExpr("c_nationkey", f"{_PIP} AS inside")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.count_if(F.col("inside")).alias("n_inside"),
        )
    )


@query(
    "geo_grid_density",
    f"""
    SELECT substr({_GH}, 1, 4) AS cell,
           CAST(count(*) AS BIGINT) AS n_points,
           CAST(count(DISTINCT c_nationkey) AS BIGINT) AS n_nations
    FROM (SELECT c_custkey AS k, c_nationkey FROM customer)
    GROUP BY 1
    ORDER BY n_points DESC, cell
    LIMIT 20
    """,
)
def geo_grid_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Density heatmap tiles: the 20 hottest precision-4 geohash cells
    (≈ 39 km) by point count, with nation diversity per cell — the
    aggregation layer behind every map heatmap and the input a spatial
    load balancer splits hot tiles from. Cell id is a prefix of the
    codegen geohash (coarsening = substring — the whole point of the
    encoding); one partial-aggregating shuffle on the cell, then global
    top-20 as TakeOrderedAndProject (per-partition heaps, no full
    sort)."""
    c = table(spark, sf_dir, "customer").selectExpr(
        "c_custkey AS k", "c_nationkey"
    )
    return (
        c.selectExpr(f"substr({_GH}, 1, 4) AS cell", "c_nationkey")
        .groupBy("cell")
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.countDistinct("c_nationkey").alias("n_nations"),
        )
        .orderBy(F.col("n_points").desc(), "cell")
        .limit(20)
    )
