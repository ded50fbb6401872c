"""Geographical operators, re-expressing the reference's shapefile ops
Spark-first (no GIS library: regions are plain DataFrames):

  * ``lookup_region``  — LookupRegion.scala:1 (point-in-region lookup;
    the shapefile's (bounding-box, geometry, attribute) triples become a
    broadcast region table with box columns and an optional polygon
    column; polygon containment is an even-odd ray cast in pure SQL).
  * ``segment_by_geographical_proximity`` —
    SegmentByGeographicalProximity.scala:1 (link every vertex to every
    region within ``distance``; the JTS distance becomes haversine
    meters, with a bounding prefilter so the exact distance only runs on
    box-candidates).

Scale shape: the region table is the small side — broadcast it, the
vertex side streams by with no shuffle; the box prefilter keeps the
per-row polygon/haversine work to candidates only.  For region tables
too large to broadcast, bucket both sides by integer grid cell
(cell = distance) and join cell-to-neighbor-cells — the same pattern as
the minhash band join; ``grid_cell`` is provided for that path.

The ``geodistance`` SQL macro in sql.py:33 is the scalar twin of
``haversine_m`` here.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EARTH_RADIUS_M = 6371009.0


def haversine_m(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle distance in meters (all-builtin, JVM-side)."""
    rlat1, rlat2 = F.radians(lat1), F.radians(lat2)
    dlat = F.radians(lat2 - lat1) / 2
    dlon = F.radians(lon2 - lon1) / 2
    a = F.sin(dlat) ** 2 + F.cos(rlat1) * F.cos(rlat2) * F.sin(dlon) ** 2
    return 2 * EARTH_RADIUS_M * F.asin(F.sqrt(a))


def point_in_polygon(lat: Column, lon: Column, polygon: Column) -> Column:
    """Even-odd ray cast against ``polygon`` =
    array<struct<lat:double,lon:double>> — pure SQL expressions, no UDF:
    count the edges whose segment crosses the horizontal ray from the
    point, odd count = inside."""
    n = F.size(polygon)
    idx = F.sequence(F.lit(0), n - 1)
    crossings = F.filter(
        idx,
        lambda i: (
            (F.element_at(polygon, i + 1)["lat"] > lat)
            != (F.element_at(polygon, (i + 1) % n + 1)["lat"] > lat)
        )
        & (
            lon
            < (F.element_at(polygon, (i + 1) % n + 1)["lon"]
               - F.element_at(polygon, i + 1)["lon"])
            * (lat - F.element_at(polygon, i + 1)["lat"])
            / (F.element_at(polygon, (i + 1) % n + 1)["lat"]
               - F.element_at(polygon, i + 1)["lat"])
            + F.element_at(polygon, i + 1)["lon"]
        ),
    )
    return F.size(crossings) % 2 == 1


def lookup_region(
    vertices: DataFrame,
    regions: DataFrame,
    lat_col: str = "lat",
    lon_col: str = "lon",
    id_col: str = "id",
    region_col: str = "region",
) -> DataFrame:
    """LookupRegion.scala:50-80 — first (here: lexicographically
    smallest, for determinism) region containing each point; vertices
    outside every region get NULL, like the reference's partial
    attribute.

    ``regions`` needs columns [region_col, min_lat, max_lat, min_lon,
    max_lon] and optionally ``polygon`` (array<struct<lat,lon>>); with a
    polygon, the box acts as the reference's BoundingBox prefilter and
    the ray cast decides.  Returns DataFrame[id, region]."""
    lat, lon = F.col(lat_col), F.col(lon_col)
    in_box = (
        (lat >= F.col("min_lat")) & (lat <= F.col("max_lat"))
        & (lon >= F.col("min_lon")) & (lon <= F.col("max_lon"))
    )
    cond = in_box
    if "polygon" in regions.columns:
        cond = in_box & point_in_polygon(lat, lon, F.col("polygon"))
    matched = (
        vertices.join(F.broadcast(regions), cond, "left")
        .groupBy(F.col(id_col).alias("id"))
        .agg(F.min(region_col).alias("region"))
    )
    return matched


def grid_cell(lat: Column, lon: Column, cell_deg: float) -> Column:
    """Integer grid cell for the non-broadcast proximity path: join
    cell == cell ± 1 in both axes instead of broadcasting regions."""
    return F.struct(
        F.floor(lat / cell_deg).cast("long").alias("clat"),
        F.floor(lon / cell_deg).cast("long").alias("clon"),
    )


def segment_by_geographical_proximity(
    vertices: DataFrame,
    regions: DataFrame,
    distance_m: float,
    lat_col: str = "lat",
    lon_col: str = "lon",
    id_col: str = "id",
    region_col: str = "region",
    metric: str = "haversine",
) -> DataFrame:
    """SegmentByGeographicalProximity.scala:60-95 — belongs-to links
    from each vertex to every region whose representative point
    (``regions.lat``/``regions.lon``) lies within ``distance_m``.
    Returns DataFrame[id, region].

    ``metric="haversine"`` is the production geodesic;
    ``metric="flat_deg"`` treats distance_m as squared *centidegrees*
    on quantized integer coordinates — exact integer arithmetic, used
    by the correctness gate so no cross-engine trig rounding can flip a
    link (the same quantization trick as models.lloyd_kmeans)."""
    r = F.broadcast(
        regions.select(
            F.col(region_col).alias("region"),
            F.col("lat").alias("_rlat"),
            F.col("lon").alias("_rlon"),
        )
    )
    v = vertices.select(
        F.col(id_col).alias("id"), F.col(lat_col).alias("_vlat"),
        F.col(lon_col).alias("_vlon"),
    )
    if metric == "flat_deg":
        dq = [
            F.floor(c * 100 + F.lit(0.5)).cast("long")
            for c in (F.col("_vlat"), F.col("_vlon"), F.col("_rlat"), F.col("_rlon"))
        ]
        d2 = (dq[0] - dq[2]) * (dq[0] - dq[2]) + (dq[1] - dq[3]) * (dq[1] - dq[3])
        return v.crossJoin(r).where(d2 <= F.lit(int(distance_m))).select("id", "region")
    # bounding prefilter: 1 deg latitude = ~111 km; longitude shrinks by
    # cos(lat) — bound with cos(84°)=0.1 and drop the lon filter
    # entirely in the polar caps so the prefilter only ever over-selects
    deg = distance_m / 111_000.0
    polar = (F.abs(F.col("_vlat")) > 84) | (F.abs(F.col("_rlat")) > 84)
    pre = (F.abs(F.col("_vlat") - F.col("_rlat")) <= deg) & (
        (F.abs(F.col("_vlon") - F.col("_rlon")) <= deg / 0.1) | polar
    )
    exact = haversine_m(
        F.col("_vlat"), F.col("_vlon"), F.col("_rlat"), F.col("_rlon")
    ) <= distance_m
    return v.crossJoin(r).where(pre & exact).select("id", "region")
