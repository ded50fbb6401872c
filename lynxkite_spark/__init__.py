"""lynxkite_spark — a PySpark-native link-graph analytics engine.

A from-scratch re-creation of the analytics capabilities of
lynxkite/lynxkite (reference at /root/reference) expressed Spark-first:
every operator is a DataFrame/SQL plan optimized by Catalyst; Python
touches rows only through Arrow-vectorized pandas UDFs.

Core model (SURVEY.md §1):
  * a graph is ``Graph(vertices: DataFrame[id: long, ...attrs],
    edges: DataFrame[src: long, dst: long, weight: double, ...attrs])``
  * segmentations (components, communities, triangles) are
    ``belongs_to`` tables ``[id: long, segment: long]``
  * attributes are nullable columns keyed by ``id``

Reference parity notes are cited file:line against /root/reference.
"""

from lynxkite_spark.graph import Graph
from lynxkite_spark.session import get_spark

__all__ = ["Graph", "get_spark"]
__version__ = "0.1.0"
