from distributed_vector_database_spark.functions.vector import (
    dot,
    l2_norm,
    cosine_similarity,
    euclidean_distance,
    squared_euclidean,
)

__all__ = [
    "dot",
    "l2_norm",
    "cosine_similarity",
    "euclidean_distance",
    "squared_euclidean",
]
