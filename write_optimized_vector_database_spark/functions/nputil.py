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


def arrow_matrix(batch, col: str, dtype=np.float64) -> np.ndarray:
    """(n, dim) matrix from a RecordBatch list column — the Arrow list
    buffer IS the flat matrix, so this is a reshape, not a per-row
    conversion. Requires non-null, fixed-length lists (every vector
    pass in this engine guarantees both)."""
    arr = batch.column(batch.schema.get_field_index(col))
    if arr.null_count:
        raise ValueError(
            f"arrow_matrix({col!r}): {arr.null_count} null rows — the flat "
            "buffer reshape would silently mis-align every later row"
        )
    if batch.num_rows:
        import pyarrow.compute as pc

        # Check per-row lengths via the list offsets, not divisibility of
        # the flattened length: rows of e.g. 3 and 5 values average out to
        # a clean divisor and would silently mis-align every later row.
        lens = pc.list_value_length(arr)
        mm = pc.min_max(lens)
        lo, hi = mm["min"].as_py(), mm["max"].as_py()
        if lo != hi:
            raise ValueError(
                f"arrow_matrix({col!r}): ragged lists (row lengths "
                f"{lo}..{hi}) — fixed-length vectors required"
            )
    flat = arr.flatten().to_numpy(zero_copy_only=False)
    return flat.astype(dtype, copy=False).reshape(batch.num_rows, -1)


def arrow_list_column(mat: np.ndarray, value_type=None):
    """pyarrow ListArray from an (n, w) matrix (row i → list of length w)."""
    import pyarrow as pa

    n, w = mat.shape
    values = pa.array(mat.reshape(-1), value_type) if value_type else pa.array(
        mat.reshape(-1)
    )
    offsets = pa.array(np.arange(n + 1, dtype=np.int64) * w, pa.int32())
    return pa.ListArray.from_arrays(offsets, values)
