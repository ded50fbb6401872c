from lynxkite_spark.operators.pagerank import pagerank
from lynxkite_spark.operators.components import connected_components
from lynxkite_spark.operators.labelprop import label_propagation
from lynxkite_spark.operators.triangles import triangle_count, enumerate_triangles
from lynxkite_spark.operators.degrees import degree
from lynxkite_spark.operators.shortest_path import shortest_path
from lynxkite_spark.operators.centrality import (
    average_distance,
    eigenvector_centrality,
    harmonic_centrality,
    katz_centrality,
    laplacian_centrality,
    lin_centrality,
    sfigality,
)
from lynxkite_spark.operators.coloring import greedy_coloring
from lynxkite_spark.operators.kcore import core_decomposition
from lynxkite_spark.operators.modular import modular_clustering
from lynxkite_spark.operators.sampling import random_walk_sample

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
    "lin_centrality",
    "average_distance",
    "sfigality",
    "laplacian_centrality",
    "greedy_coloring",
    "core_decomposition",
    "modular_clustering",
    "random_walk_sample",
]
