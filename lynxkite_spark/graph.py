"""Graph data model: vertices + edges DataFrames.

Maps the reference's metagraph entities
(/root/reference/app/com/lynxanalytics/biggraph/graph_api/MetaGraph.scala:64-183)
onto plain DataFrames:

  * VertexSet      -> vertices: DataFrame[id: long, ...attribute columns]
  * EdgeBundle     -> edges:    DataFrame[src: long, dst: long, ...attrs]
  * Attribute[T]   -> a nullable column (missing key == NULL)
  * segmentation   -> belongs_to: DataFrame[id: long, segment: long]

Vertex IDs are value-derived (xxhash64 of the name, or explicit longs),
never partition-derived, so re-runs at any parallelism produce identical
IDs (reference's randomNumbered trick replaced per SURVEY.md §4.2).
"""

from __future__ import annotations

from dataclasses import dataclass, replace

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Graph:
    """An immutable (vertices, edges) pair.

    ``vertices`` must contain an ``id`` long column; ``edges`` must contain
    ``src`` and ``dst`` long columns and may carry a ``weight`` double and
    further edge-attribute columns.
    """

    vertices: DataFrame
    edges: DataFrame

    # -- constructors --------------------------------------------------

    @staticmethod
    def from_edges(edges: DataFrame, vertices: DataFrame | None = None) -> "Graph":
        """Build a graph from an edge table; vertex set defaults to the
        distinct endpoints (isolated vertices need an explicit ``vertices``)."""
        if vertices is None:
            vertices = (
                edges.select(F.col("src").alias("id"))
                .unionAll(edges.select(F.col("dst").alias("id")))
                .distinct()
            )
        return Graph(vertices=vertices, edges=edges)

    @staticmethod
    def from_string_edges(
        table: DataFrame, src_col: str, dst_col: str
    ) -> tuple["Graph", DataFrame]:
        """Resolve string endpoints into long IDs — the reference's
        ImportEdgesForExistingVertices semantics
        (/root/reference/app/.../graph_operations/ImportGraphFromTable.scala:46-106):
        null endpoints dropped, names resolved against a unique dictionary.

        IDs are ``xxhash64(name)`` (value-derived: identical across runs and
        parallelism levels). Returns (graph, id_dictionary[id, name]).
        The dictionary join is broadcast when small; at 10^12-file scale the
        name dictionary join falls back to a shuffle hash join which AQE
        skew-splits if hub names dominate.
        """
        pairs = table.select(
            F.col(src_col).alias("src_name"), F.col(dst_col).alias("dst_name")
        ).where(F.col(src_col).isNotNull() & F.col(dst_col).isNotNull())
        names = (
            pairs.select(F.col("src_name").alias("name"))
            .unionAll(pairs.select("dst_name"))
            .distinct()
            .select(F.xxhash64("name").alias("id"), "name")
        )
        edges = pairs.select(
            F.xxhash64("src_name").alias("src"), F.xxhash64("dst_name").alias("dst")
        )
        g = Graph(vertices=names.select("id"), edges=edges)
        return g, names

    # -- views ---------------------------------------------------------

    def with_weight(self, default: float = 1.0) -> "Graph":
        """Ensure a positive ``weight`` column exists (reference PageRank
        uses constant 1.0 when no weight attribute is given,
        GraphComputationOperations.scala:388)."""
        if "weight" in self.edges.columns:
            return self
        return replace(self, edges=self.edges.withColumn("weight", F.lit(default)))

    def triplets(self) -> DataFrame:
        """The reference's pre-joined ``edges`` SQL view: edge attrs +
        src_* / dst_* vertex attrs
        (/root/reference/app/.../controllers/Project.scala:313-334)."""
        src_v = self.vertices.select(
            [F.col(c).alias(f"src_{c}") for c in self.vertices.columns]
        )
        dst_v = self.vertices.select(
            [F.col(c).alias(f"dst_{c}") for c in self.vertices.columns]
        )
        e = self.edges.select(
            [F.col(c).alias(f"edge_{c}") if c not in ("src", "dst") else F.col(c)
             for c in self.edges.columns]
        )
        return (
            e.join(src_v, e.src == src_v.src_id)
            .join(dst_v, e.dst == dst_v.dst_id)
            .drop("src_id", "dst_id")
        )

    def partitioned(self, num: int | None = None) -> "Graph":
        """Hash-partition vertices by id and edges by src so every
        gather-scatter join reuses one shuffle (reference keeps all
        entities co-partitioned, SortedRDD.scala:31-36)."""
        spark = self.vertices.sparkSession
        n = num or int(spark.conf.get("spark.sql.shuffle.partitions"))
        return Graph(
            vertices=self.vertices.repartition(n, "id"),
            edges=self.edges.repartition(n, "src"),
        )


def example_graph(spark: SparkSession) -> Graph:
    """The reference's canonical 4-vertex test fixture
    (/root/reference/app/.../graph_operations/ExampleGraph.scala:40-80)."""
    vertices = spark.createDataFrame(
        [
            (0, "Adam", 20.3, "Male", 1000.0),
            (1, "Eve", 18.2, "Female", None),
            (2, "Bob", 50.3, "Male", 2000.0),
            (3, "Isolated Joe", 2.0, "Male", None),
        ],
        "id long, name string, age double, gender string, income double",
    )
    edges = spark.createDataFrame(
        [
            (0, 0, 1, "Adam loves Eve", 1.0),
            (1, 1, 0, "Eve loves Adam", 2.0),
            (2, 2, 0, "Bob envies Adam", 3.0),
            (3, 2, 1, "Bob loves Eve", 4.0),
        ],
        "edge_id long, src long, dst long, comment string, weight double",
    )
    return Graph(vertices=vertices, edges=edges)


def graph_from_adjacency(spark: SparkSession, adj: dict[int, list[int]]) -> Graph:
    """SmallTestGraph-style fixture builder
    (/root/reference/test/.../graph_api/GraphTestUtils.scala:267-300):
    ``adj[v] = [out-neighbors...]``; vertices = all keys and targets."""
    vs = sorted(set(adj) | {d for ds in adj.values() for d in ds})
    vertices = spark.createDataFrame([(v,) for v in vs], "id long")
    rows = [(s, d) for s, ds in adj.items() for d in ds]
    edges = spark.createDataFrame(rows or [], "src long, dst long")
    return Graph(vertices=vertices, edges=edges)
