"""Sources & sinks (SURVEY.md §2.8).

The reference's import/export boxes
(/root/reference/app/.../frontend_operations/ImportOperations.scala:36-455,
ExportOperations.scala) are thin wrappers over Spark readers/writers; so
are ours. Formats whose connectors are not in this container (JDBC
drivers, Delta, Iceberg runtime, Neo4j, BigQuery, Hive metastore) are
routed through the same API and fail with a clear message instead of an
opaque ClassNotFound.

At cluster scale the canonical source/sink is an Iceberg (or Delta)
catalog table — ``read_table(spark, "my_catalog.db.tbl", format="iceberg")``
— giving snapshot-isolated checkpoints and bucket-partitioned layouts
(`bucket(N, id)`), the columnar equivalent of the reference's
partition-count-preserving Parquet store (EntityIO.scala:71-110).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

FILE_FORMATS = {"parquet", "orc", "json", "csv", "avro", "text"}
CATALOG_FORMATS = {"iceberg", "delta", "hive"}
# connector-backed sources (ImportOperations.scala:167 Neo4j, :360
# BigQuery): spark-submit --packages supplies the DataSource V2 jars;
# the option names below are those connectors' public contracts
CONNECTOR_FORMATS = {
    "neo4j": "org.neo4j.spark.DataSource",
    "bigquery": "bigquery",
}


def read_table(
    spark: SparkSession,
    path_or_table: str,
    format: str = "parquet",
    schema: str | None = None,
    **options,
) -> DataFrame:
    """Unified import. CSV defaults mirror the reference's import box
    (ImportOperations.scala:36: delimiter, quote, infer)."""
    fmt = format.lower()
    if fmt in CATALOG_FORMATS:
        try:
            return spark.read.format(fmt).load(path_or_table)
        except Exception as e:  # connector jar not on classpath in sandbox
            raise RuntimeError(
                f"{fmt} runtime not available in this environment; "
                f"add the connector jar via spark-submit --packages"
            ) from e
    if fmt in CONNECTOR_FORMATS:
        try:
            reader = spark.read.format(CONNECTOR_FORMATS[fmt])
            for k, v in options.items():
                reader = reader.option(k, str(v))
            # neo4j: labels=/query= option selects nodes or cypher;
            # bigquery: the table id is the load() argument
            return reader.load(path_or_table) if fmt == "bigquery" else reader.load()
        except Exception as e:
            raise RuntimeError(
                f"{fmt} connector not available in this environment; add it "
                f"via spark-submit --packages (reference import box: "
                f"ImportOperations.scala:167/360)"
            ) from e
    if fmt == "jdbc":
        reader = spark.read.format("jdbc")
        for k, v in options.items():
            reader = reader.option(k, v)
        return reader.load()
    if fmt not in FILE_FORMATS:
        raise ValueError(f"unknown format {format!r}")
    reader = spark.read
    if schema:
        reader = reader.schema(schema)  # ReadParquetWithSchema.scala: zero-copy import
    if fmt == "csv":
        options.setdefault("header", "true")
        options.setdefault("inferSchema", "false" if schema else "true")
    for k, v in options.items():
        reader = reader.option(k, str(v))
    return getattr(reader, fmt)(path_or_table)


def write_table(
    df: DataFrame,
    path_or_table: str,
    format: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    bucket_by: tuple[int, str] | None = None,
    **options,
) -> None:
    """Unified export (ExportOperations.scala analog). ``bucket_by``
    requires a table sink (saveAsTable) — bucketing is the mechanism for
    co-located, shuffle-free joins on the cluster."""
    fmt = format.lower()
    writer = df.write.mode(mode)
    for k, v in options.items():
        writer = writer.option(k, str(v))
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if bucket_by:
        n, col = bucket_by
        writer.bucketBy(n, col).sortBy(col).format(fmt).saveAsTable(path_or_table)
        return
    if fmt in CATALOG_FORMATS:
        writer.format(fmt).saveAsTable(path_or_table)
        return
    if fmt == "jdbc":
        # url/dbtable/driver arrive via **options; path_or_table is the
        # logical name only (mirrors read_table's jdbc contract)
        writer.format("jdbc").save()
        return
    if fmt in CONNECTOR_FORMATS:
        # export twin of the import routing (ExportToNeo4j.scala:1,
        # ImportOperations.scala:360 BigQuery): same DataSource V2
        # class, options are the connector's public write contract
        try:
            w = writer.format(CONNECTOR_FORMATS[fmt])
            if fmt == "bigquery":
                w.save(path_or_table)
            else:
                w.save()
        except Exception as e:
            raise RuntimeError(
                f"{fmt} connector not available in this environment; add it "
                f"via spark-submit --packages (reference export box: "
                f"ExportToNeo4j.scala:1 / ImportOperations.scala:360)"
            ) from e
        return
    getattr(writer, fmt)(path_or_table)


def export_graph_to_neo4j(
    vertices: DataFrame,
    edges: DataFrame,
    url: str,
    node_label: str = "Vertex",
    relationship: str = "EDGE",
    **auth_options,
) -> None:
    """ExportToNeo4j.scala:1 — two connector writes: vertices as nodes
    keyed by ``id``, edges as relationships keyed by (src, dst).  The
    option names are the neo4j-spark connector's public contract; the
    jar arrives via spark-submit --packages on a cluster (clear
    RuntimeError here without it)."""
    write_table(
        vertices, "nodes", format="neo4j", mode="overwrite", url=url,
        labels=f":{node_label}", **{"node.keys": "id"}, **auth_options,
    )
    write_table(
        edges, "relationships", format="neo4j", mode="overwrite", url=url,
        **{
            "relationship": relationship,
            "relationship.save.strategy": "keys",
            "relationship.source.labels": f":{node_label}",
            "relationship.source.node.keys": "src:id",
            "relationship.target.labels": f":{node_label}",
            "relationship.target.node.keys": "dst:id",
        },
        **auth_options,
    )
