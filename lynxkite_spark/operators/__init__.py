from lynxkite_spark.operators.pagerank import pagerank
from lynxkite_spark.operators.components import connected_components
from lynxkite_spark.operators.labelprop import label_propagation
from lynxkite_spark.operators.triangles import triangle_count, enumerate_triangles
from lynxkite_spark.operators.degrees import degree
from lynxkite_spark.operators.shortest_path import shortest_path
from lynxkite_spark.operators.centrality import (
    eigenvector_centrality,
    harmonic_centrality,
    katz_centrality,
)
from lynxkite_spark.operators.coloring import greedy_coloring

__all__ = [
    "pagerank",
    "connected_components",
    "label_propagation",
    "triangle_count",
    "enumerate_triangles",
    "degree",
    "shortest_path",
    "eigenvector_centrality",
    "harmonic_centrality",
    "katz_centrality",
    "greedy_coloring",
]
