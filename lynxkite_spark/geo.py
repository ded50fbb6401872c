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


def _proximity_cells(
    lat: Column, lon: Column, cell_lat: float, cell_lon: float,
    n_lon: int, polar_margin_deg: float, expand: bool,
) -> Column:
    """array<struct<clat,clon>> of candidate-join cells for one point.

    The region side ``expand``s to its 3x3 neighborhood so the join is a
    plain equi-join on (clat, clon); longitude cells wrap modulo
    ``n_lon`` so the antimeridian seam joins its true neighbors.  Points
    within ``polar_margin_deg`` of the |lat| > 84 cap additionally land
    in a sentinel bucket (clat = -10**6): above 84 deg the cos(lat) >= 0.1
    bound behind ``cell_lon`` fails, so cap candidates are matched
    exhaustively inside that one (tiny) bucket — still via the same
    equi-join, never a cross join."""
    clat = F.floor((lat + F.lit(90.0)) / cell_lat).cast("long")
    clon = F.floor((lon + F.lit(180.0)) / cell_lon).cast("long")
    offsets = [(a, b) for a in (-1, 0, 1) for b in (-1, 0, 1)] if expand else [(0, 0)]
    cells = [
        F.struct(
            (clat + F.lit(a)).alias("clat"),
            F.pmod(clon + F.lit(b), F.lit(n_lon)).alias("clon"),
        )
        for a, b in offsets
    ]
    polar_cell = F.struct(
        F.lit(-(10**6)).cast("long").alias("clat"),
        F.lit(0).cast("long").alias("clon"),
    )
    in_cap = F.abs(lat) > F.lit(84.0 - polar_margin_deg)
    return F.concat(
        F.array(*cells),
        F.when(in_cap, F.array(polar_cell)).otherwise(
            F.array().cast("array<struct<clat:bigint,clon:bigint>>")
        ),
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
    strategy: str = "broadcast",
) -> DataFrame:
    """SegmentByGeographicalProximity.scala:60-95 — belongs-to links
    from each vertex to every region whose representative point
    (``regions.lat``/``regions.lon``) lies within ``distance_m``.
    Returns DataFrame[id, region].

    ``metric="haversine"`` is the production geodesic;
    ``metric="flat_deg"`` treats distance_m as squared *centidegrees*
    on quantized integer coordinates — exact integer arithmetic, used
    by the correctness gate so no cross-engine trig rounding can flip a
    link (the same quantization trick as models.lloyd_kmeans).

    ``strategy="broadcast"`` streams vertices past a broadcast region
    table (right for the usual small region list);
    ``strategy="grid"`` shuffles BOTH sides on an integer grid cell
    (cell = the bounding box of ``distance_m``) and equi-joins cell to
    neighbor cells — use when the region table is too large to
    broadcast.  Longitude cells wrap modulo the cell count so
    antimeridian neighbors meet; polar-cap rows land in one sentinel
    bucket.  Same results as broadcast, no cross join anywhere."""
    if strategy not in ("broadcast", "grid"):
        raise ValueError(f"unknown strategy {strategy!r} (broadcast|grid)")
    r = regions.select(
        F.col(region_col).alias("region"),
        F.col("lat").alias("_rlat"),
        F.col("lon").alias("_rlon"),
    )
    v = vertices.select(
        F.col(id_col).alias("id"), F.col(lat_col).alias("_vlat"),
        F.col(lon_col).alias("_vlon"),
    )
    if metric == "flat_deg":
        if strategy != "broadcast":
            raise ValueError(
                "metric='flat_deg' is the correctness-gate metric and only "
                "supports strategy='broadcast'; use metric='haversine' for "
                "the grid path")
        dq = [
            F.floor(c * 100 + F.lit(0.5)).cast("long")
            for c in (F.col("_vlat"), F.col("_vlon"), F.col("_rlat"), F.col("_rlon"))
        ]
        d2 = (dq[0] - dq[2]) * (dq[0] - dq[2]) + (dq[1] - dq[3]) * (dq[1] - dq[3])
        return (
            v.crossJoin(F.broadcast(r))
            .where(d2 <= F.lit(int(distance_m)))
            .select("id", "region")
        )
    # bounding prefilter: 1 deg latitude = ~111 km; longitude shrinks by
    # cos(lat) — bound with cos(84°)=0.1 and drop the lon filter
    # entirely in the polar caps so the prefilter only ever over-selects.
    # The lon delta wraps: points at 179.9 and -179.9 are 0.2° apart.
    deg = distance_m / 111_000.0
    dlon = F.abs(F.col("_vlon") - F.col("_rlon"))
    lon_near = F.least(dlon, F.lit(360.0) - dlon) <= deg / 0.1
    polar = (F.abs(F.col("_vlat")) > 84) | (F.abs(F.col("_rlat")) > 84)
    pre = (F.abs(F.col("_vlat") - F.col("_rlat")) <= deg) & (lon_near | polar)
    exact = haversine_m(
        F.col("_vlat"), F.col("_vlon"), F.col("_rlat"), F.col("_rlon")
    ) <= distance_m
    if strategy == "broadcast":
        return v.crossJoin(F.broadcast(r)).where(pre & exact).select("id", "region")
    import math

    cell_lat = deg
    # equal-width lon cells: a trailing short cell would break the ±1
    # adjacency across the antimeridian (a delta can span the short cell
    # plus a boundary), so round the cell COUNT down and widen the cells
    n_lon = max(1, int(360.0 // (deg / 0.1)))
    cell_lon = 360.0 / n_lon
    v_cells = v.select(
        "id", "_vlat", "_vlon",
        F.explode(_proximity_cells(
            F.col("_vlat"), F.col("_vlon"), cell_lat, cell_lon, n_lon,
            polar_margin_deg=deg, expand=False,
        )).alias("_c"),
    ).select("id", "_vlat", "_vlon", "_c.clat", "_c.clon")
    r_cells = r.select(
        "region", "_rlat", "_rlon",
        F.explode(_proximity_cells(
            F.col("_rlat"), F.col("_rlon"), cell_lat, cell_lon, n_lon,
            polar_margin_deg=deg, expand=True,
        )).alias("_c"),
    ).select("region", "_rlat", "_rlon", "_c.clat", "_c.clon")
    return (
        v_cells.join(r_cells, ["clat", "clon"])
        .where(pre & exact)
        .select("id", "region")
        .distinct()
    )
