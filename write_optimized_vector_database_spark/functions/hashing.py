"""Hashing / id primitives.

The reference hashes ids with xxHash64 seed 0
(/root/reference/src/cpp/util/hash.h:17-21) and generates time-ordered
UUIDv7 ids (/root/reference/src/cpp/util/uuid-v7.cpp:15-71). Spark's
built-in `xxhash64` is the same hash family and is what the engine uses
internally (shard routing, zone-map sorting).

For **cross-engine deterministic** derivations (oracle-checkable in
DuckDB, which lacks xxhash64) there is `portable_hash` — the first 8 hex
chars of md5, as a non-negative int. It is also the right primitive for
deterministic hash-sampling at 100 TB scale: unlike `rand()`, it is
reproducible across retries, partitions, and engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def id_hash(col: Column | str) -> Column:
    """xxHash64 of the id — the engine-internal shard/sort key
    (reference hash.h:17-21; msg-buf.h shard = id_hash % 16)."""
    col = F.col(col) if isinstance(col, str) else col
    return F.xxhash64(col.cast("string"))


def portable_hash(col: Column | str, bits: int = 32) -> Column:
    """md5-derived non-negative int hash, identical in Spark and DuckDB.

    DuckDB equivalent: ('0x' || substring(md5(x::VARCHAR), 1, 8))::BIGINT
    """
    col = F.col(col) if isinstance(col, str) else col
    nhex = bits // 4
    return F.conv(F.substring(F.md5(col.cast("string")), 1, nhex), 16, 10).cast("long")


def portable_hash_sql(expr: str, bits: int = 32) -> str:
    """The DuckDB-side twin of portable_hash, as a SQL fragment."""
    nhex = bits // 4
    return f"('0x' || substring(md5(CAST({expr} AS VARCHAR)), 1, {nhex}))::BIGINT"


def deterministic_sample(col: Column | str, fraction: float, salt: str = "") -> Column:
    """Boolean hash-sample predicate: keeps ~`fraction` of rows,
    deterministically (reference `sample_p` probe sampling, types.h:74 /
    config.h:78 — made reproducible instead of RNG-based)."""
    col = F.col(col) if isinstance(col, str) else col
    salted = F.concat(col.cast("string"), F.lit(salt)) if salt else col
    return (portable_hash(salted) % 10_000) < int(fraction * 10_000)


def deterministic_sample_sql(expr: str, fraction: float, salt: str = "") -> str:
    e = f"CAST({expr} AS VARCHAR) || '{salt}'" if salt else expr
    return f"({portable_hash_sql(e)} % 10000) < {int(fraction * 10_000)}"


def bounded_training_sample(df, id_col: str, cap: int, salt: str = "train"):
    """Deterministic hash-sample bounded to ~``cap`` rows.

    Index training (KMeans codebooks, OPQ rotation) is driver-side NumPy:
    an unbounded `collect()` of the table is a driver OOM at 100 TB. One
    `count()` sizes the keep-fraction; the hash-sample itself is
    reproducible across retries and partitions (unlike `rand()`), so
    training is deterministic for a given table + cap.
    """
    if cap <= 0:
        raise ValueError(f"cap must be positive, got {cap}")
    n = df.count()
    if n <= cap:
        return df
    return df.filter(deterministic_sample(id_col, cap / n, salt=salt))


def uuid7(ts_col: Column | str | None = None) -> Column:
    """Time-ordered unique id string (UUIDv7-shaped: ms timestamp prefix +
    random tail; reference uuid-v7.cpp:15-71). Spark's `uuid()` supplies
    the randomness; the epoch-ms prefix preserves the time-ordering
    property the reference relies on for segment zone maps."""
    ts = (
        F.unix_millis(F.col(ts_col) if isinstance(ts_col, str) else ts_col)
        if ts_col is not None
        else F.unix_millis(F.current_timestamp())
    )
    return F.concat_ws("-", F.lpad(F.hex(ts), 12, "0"), F.expr("uuid()"))
