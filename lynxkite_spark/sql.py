"""SQL surface: graph states exposed as temp views + session UDFs.

The reference hands SQL to Spark SQL verbatim (ExecuteSQL.scala:135-145);
graph states appear as implicit tables (controllers/Project.scala:290-364):
``vertices``, ``edges`` (pre-joined triplet view: edge_* attrs plus
src_*/dst_* vertex attrs), ``edge_attributes``, ``belongs_to_<seg>``.
Custom UDFs registered into the session (graph_api/UDF.scala:50-55):
geodistance, hash (salted SHA-256), most_common, string_intersect.
"""

from __future__ import annotations

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
    """The reference's session UDFs (UDF.scala:50-55), every one a
    builtin-expression SQL function — zero Python in the row path.
    ``hash`` and ``most_common`` need no registration at all (builtin
    sha2/mode in Spark SQL); geodistance and string_intersect are
    registered as SQL macros so ``spark.sql`` queries can call them and
    still run entirely inside whole-stage codegen."""
    # geodistance(lat1, lon1, lat2, lon2) — haversine metres (UDF.scala:14-26)
    spark.sql("""
        CREATE OR REPLACE TEMPORARY FUNCTION geodistance(
            lat1 DOUBLE, lon1 DOUBLE, lat2 DOUBLE, lon2 DOUBLE
        ) RETURNS DOUBLE RETURN
            2 * 6371000.0 * asin(sqrt(
                pow(sin(radians(lat2 - lat1) / 2), 2)
                + cos(radians(lat1)) * cos(radians(lat2))
                  * pow(sin(radians(lon2 - lon1) / 2), 2)))
    """)
    # string_intersect(a, b) over comma-separated sets (UDF.scala)
    spark.sql("""
        CREATE OR REPLACE TEMPORARY FUNCTION string_intersect(
            a STRING, b STRING
        ) RETURNS ARRAY<STRING> RETURN
            array_sort(array_distinct(array_intersect(
                split(coalesce(a, ''), ','), split(coalesce(b, ''), ','))))
    """)


def sql(spark: SparkSession, query: str, **tables: DataFrame) -> DataFrame:
    """SQL pass-through with explicit table bindings — the reference's
    SQL1..SQL10 boxes (WorkflowOperations.scala:380-442): each kwarg
    becomes a temp view for the duration of the query."""
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    return spark.sql(query)
