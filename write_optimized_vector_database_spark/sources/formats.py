"""Interchange formats — JSONL / CSV sources & sinks beside Parquet.

The reference's only interchange surface is its WAL (FlatBuffers,
wal-record.fbs) and proprietary segments; the Spark engine's native
format is Parquet (columnar stats, pushdown). These helpers cover the
pipeline edges where data ENTERS or LEAVES as text:

- JSONL: the lingua franca of LLM corpora (one doc per line). Nested
  columns (vectors, tag arrays) round-trip losslessly given an explicit
  read schema — never rely on inference for float32 fidelity.
- CSV: flat columns only; arrays are refused loudly rather than
  silently stringified.
- Changelog export: the WAL-shaped changelog as JSONL for debugging /
  interchange, vectors included.

All writers go through Spark's distributed sinks (a directory of part
files, not a driver-side file) — at 100 TB the writer IS the cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def _has_complex_cols(schema: T.StructType) -> list[str]:
    return [
        f.name
        for f in schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
    ]


def write_jsonl(df: DataFrame, path: str, compression: str | None = None) -> None:
    """Write as JSON-lines (one object per row; nested columns kept)."""
    w = df.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.json(path)


def read_jsonl(spark: SparkSession, path: str, schema: T.StructType | str) -> DataFrame:
    """Read JSON-lines with an EXPLICIT schema.

    Schema inference samples the data (an extra pass) and widens every
    number to double/long — fine for floats, wrong for typed pipelines;
    an explicit schema makes the round-trip exact and single-pass."""
    return spark.read.schema(schema).json(path)


def write_csv(df: DataFrame, path: str, header: bool = True) -> None:
    """Write flat columns as CSV. Arrays/structs are refused: CSV has no
    list representation and Spark would throw deep inside the writer —
    fail at the API boundary with the column names instead."""
    complex_cols = _has_complex_cols(df.schema)
    if complex_cols:
        raise ValueError(
            f"CSV cannot represent nested columns {complex_cols}; "
            "serialize them first (e.g. to_json) or use JSONL/Parquet"
        )
    df.write.mode("overwrite").option("header", str(header).lower()).csv(path)


def read_csv(
    spark: SparkSession, path: str, schema: T.StructType | str, header: bool = True
) -> DataFrame:
    return (
        spark.read.schema(schema).option("header", str(header).lower()).csv(path)
    )


def export_changelog_jsonl(changelog: DataFrame, path: str) -> None:
    """Dump a WAL-shaped changelog as JSONL (vectors included) — the
    interchange/debug analog of replaying the reference's WAL frames."""
    write_jsonl(changelog, path)
