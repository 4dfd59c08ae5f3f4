"""Z-order (Morton) multi-dimensional clustering — the layout operator
that makes multi-predicate scans prune at 100 TB.

A single-column sort clusters one predicate's row groups; interleaving
the bits of several low-cardinality keys clusters ALL of them at once:
rows close in z-value are close in every dimension, so parquet
row-group min/max stats stay tight for each column and a filter on any
of the z-dimensions skips most of the file (the Delta/Iceberg
``OPTIMIZE ZORDER BY`` design — public knowledge; the reference's
analog is its id_hash-sorted segment layout, types.h:98-106).

Everything is built from JVM-side bit arithmetic (`shiftleft`/
`shiftright`/`&`) — whole-stage codegen, no UDF — and has an exact
DuckDB SQL twin for the oracle gate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(cols: list[Column | str], bits: int = 8) -> Column:
    """Interleave the low `bits` bits of each column into one Morton key.

    zkey = Σ_i Σ_d ((col_d >> i) & 1) << (i·D + d)  for D columns.
    Callers bucket/clamp the inputs to `bits` bits first (e.g. `% 256`);
    the key is a LONG, so bits × len(cols) must stay ≤ 63.
    """
    ncols = len(cols)
    if bits * ncols > 63:
        raise ValueError(f"{ncols} cols × {bits} bits exceeds a long key")
    parts = []
    for d, c in enumerate(cols):
        c = F.col(c) if isinstance(c, str) else c
        c = c.cast("long")
        for i in range(bits):
            parts.append(
                F.shiftleft(F.shiftright(c, i).bitwiseAND(F.lit(1)), i * ncols + d)
            )
    out = parts[0]
    for p in parts[1:]:
        out = out + p
    return out


def zorder_key_sql(exprs: list[str], bits: int = 8) -> str:
    """DuckDB twin of `zorder_key` (same bit interleave, `>>`/`<<`/`&`)."""
    ncols = len(exprs)
    # each term fully parenthesized: SQL gives `+` tighter precedence
    # than `<<`, so a bare `a << 6 + b << 7` parses as `a << (6+b) << 7`
    parts = [
        f"(((({e}) >> {i}) & 1) << {i * ncols + d})"
        for d, e in enumerate(exprs)
        for i in range(bits)
    ]
    return "(" + " + ".join(parts) + ")"


def cluster_by_zorder(
    df: DataFrame, cols: list[Column | str], bits: int = 8, key_col: str = "__zkey"
) -> DataFrame:
    """Lay `df` out in z-order: range-partition on the Morton key, then
    sort within partitions. Writing the result gives every file a tight
    z-range — i.e. tight min/max on EVERY z-dimension — which is what
    turns multi-column point/range filters into row-group skips.
    The key column is dropped; it exists only to drive the layout."""
    keyed = df.withColumn(key_col, zorder_key(cols, bits=bits))
    return (
        keyed.repartitionByRange(F.col(key_col))
        .sortWithinPartitions(key_col)
        .drop(key_col)
    )
