from write_optimized_vector_database_spark.functions.distance import (
    cosine_similarity,
    dot_product,
    l2_distance,
    l2_normalize,
    l2_norm,
    squared_l2_distance,
)

__all__ = [
    "cosine_similarity",
    "dot_product",
    "l2_distance",
    "l2_norm",
    "l2_normalize",
    "squared_l2_distance",
]
