"""Driver-side NumPy bridge utilities.

Index training (k-means centroids, PQ codebooks, OPQ rotations) runs on
bounded samples collected to the driver. HOW the collect happens
matters: row-based `.collect()` boxes every float into a PyObject — a
65k × 64-dim sample is 4M boxed doubles and tens of seconds of pure
deserialization — while Arrow-batched `toPandas()` (enabled in
session.py) lands each cell as a NumPy array at columnar speed.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def collect_vectors_np(df: DataFrame, vec_col: str, dtype=np.float64) -> np.ndarray:
    """Collect one vector column into an (n, dim) ndarray via Arrow."""
    pdf = df.select(F.col(vec_col).cast("array<double>").alias("__v")).toPandas()
    if not len(pdf):
        return np.empty((0, 0), dtype=dtype)
    return np.stack(
        [np.asarray(v, dtype=dtype) for v in pdf["__v"].to_numpy()]
    )
