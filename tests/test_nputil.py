"""Arrow bridge helpers: the list-buffer reshape that every full-table
vector pass (encode / assignment / rotation) now rides on. A silent
offset or slicing bug here would corrupt every index build, so the
helpers get direct gates beyond the operator-level oracles."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from write_optimized_vector_database_spark.functions.nputil import (
    arrow_list_column,
    arrow_matrix,
)


def _batch_of(rows: list[list[float]]) -> pa.RecordBatch:
    return pa.RecordBatch.from_arrays(
        [pa.array(list(range(len(rows))), pa.int64()), pa.array(rows)],
        names=["id", "vec"],
    )


def test_arrow_matrix_round_trip():
    rows = [[1.0, 2.0, 3.0], [4.0, 5.0, 6.0], [7.5, -1.0, 0.0]]
    m = arrow_matrix(_batch_of(rows), "vec")
    assert m.shape == (3, 3)
    assert np.array_equal(m, np.asarray(rows))


def test_arrow_matrix_respects_slice_offsets():
    """A sliced RecordBatch has non-zero list offsets — flatten() must
    honor them (a raw .values read would return the UNSLICED buffer)."""
    rows = [[float(i), float(i + 10)] for i in range(6)]
    sliced = _batch_of(rows).slice(2, 3)
    m = arrow_matrix(sliced, "vec")
    assert m.shape == (3, 2)
    assert np.array_equal(m, np.asarray(rows[2:5]))


def test_arrow_list_column_rebuilds_rows():
    mat = np.arange(12, dtype=np.int32).reshape(4, 3)
    arr = arrow_list_column(mat, pa.int32())
    assert arr.to_pylist() == [list(map(int, row)) for row in mat]


def test_matrix_list_inverse():
    rng = np.random.RandomState(7)
    mat = rng.randn(5, 8)
    arr = arrow_list_column(mat, pa.float64())
    batch = pa.RecordBatch.from_arrays(
        [pa.array(range(5), pa.int64()), arr], names=["id", "vec"]
    )
    assert np.array_equal(arrow_matrix(batch, "vec"), mat)
