"""SQL surface: graph states exposed as temp views + session UDFs.

The reference hands SQL to Spark SQL verbatim (ExecuteSQL.scala:135-145);
graph states appear as implicit tables (controllers/Project.scala:290-364):
``vertices``, ``edges`` (pre-joined triplet view: edge_* attrs plus
src_*/dst_* vertex attrs), ``edge_attributes``, ``belongs_to_<seg>``.
Custom UDFs registered into the session (graph_api/UDF.scala:50-55):
geodistance, hash (salted SHA-256), most_common, string_intersect.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lynxkite_spark.graph import Graph


def register_graph_views(
    graph: Graph,
    spark: SparkSession,
    prefix: str = "",
    segmentations: dict[str, DataFrame] | None = None,
) -> None:
    """Create the reference's implicit tables for ``spark.sql`` queries."""
    graph.vertices.createOrReplaceTempView(f"{prefix}vertices")
    graph.triplets().createOrReplaceTempView(f"{prefix}edges")
    graph.edges.createOrReplaceTempView(f"{prefix}edge_attributes")
    for name, bt in (segmentations or {}).items():
        bt.createOrReplaceTempView(f"{prefix}belongs_to_{name}")


def register_udfs(spark: SparkSession) -> None:
    """The reference's session UDFs (UDF.scala:50-55). ``hash`` and
    ``most_common`` need no registration — they are builtin sha2/mode in
    Spark SQL. The two below are compatibility shims, not hot-path ops
    (hot-path per-row compute stays in builtin functions / pandas UDFs)."""
    # geodistance(lat1, lon1, lat2, lon2) — haversine metres (UDF.scala:14-26)
    spark.udf.register(
        "geodistance",
        lambda lat1, lon1, lat2, lon2: _haversine(lat1, lon1, lat2, lon2),
        "double",
    )
    # string_intersect(a, b) over comma-separated sets (UDF.scala)
    spark.udf.register(
        "string_intersect",
        lambda a, b: sorted(set((a or "").split(",")) & set((b or "").split(","))),
        "array<string>",
    )


def _haversine(lat1, lon1, lat2, lon2) -> float:
    r = 6371000.0
    p1, p2 = math.radians(lat1), math.radians(lat2)
    dp = math.radians(lat2 - lat1)
    dl = math.radians(lon2 - lon1)
    a = math.sin(dp / 2) ** 2 + math.cos(p1) * math.cos(p2) * math.sin(dl / 2) ** 2
    return 2 * r * math.asin(math.sqrt(a))


def sql(spark: SparkSession, query: str, **tables: DataFrame) -> DataFrame:
    """SQL pass-through with explicit table bindings — the reference's
    SQL1..SQL10 boxes (WorkflowOperations.scala:380-442): each kwarg
    becomes a temp view for the duration of the query."""
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    return spark.sql(query)
