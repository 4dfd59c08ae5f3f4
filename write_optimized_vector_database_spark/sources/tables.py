"""Fixture-table sources.

The driver materializes deterministic synthetic parquet under
/root/testdata/sf{0.001,0.01,0.1}/ (see TESTDATA.md). These loaders are
thin `spark.read.parquet` wrappers — columnar scans with predicate
pushdown and column pruning are the Spark analog of the reference's
zone-mapped segment reads (/root/reference/include/woved/types.h:94-106).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLES}")
    # Queries assume UTC timestamp semantics (oracle comparisons are
    # against DuckDB's UTC-naive timestamps); pin it even under a
    # caller-provided session.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        # defensive: the conf must be set before planning the scan — the
        # harness may hand us a session built without it (get_spark sets
        # it, but entry/queries run under the caller's session)
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir.rstrip('/')}/{name}.parquet")
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    if name == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
        # older fixture generations carry ts as TIMESTAMP(NANOS) → read
        # as long nanos (spark.sql.legacy.parquet.nanosAsLong) → truncate
        # to µs timestamp, matching DuckDB's ns→µs cast in the oracles.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    # normalize TIMESTAMP_NTZ (tz-less parquet annotations) to session-tz
    # TIMESTAMP: the session is pinned UTC so wall values are unchanged,
    # and epoch functions (unix_micros etc.) accept only TIMESTAMP.
    for field in df.schema.fields:
        if isinstance(field.dataType, T.TimestampNTZType):
            df = df.withColumn(field.name, F.col(field.name).cast("timestamp"))
    return df


def events_stream_source(
    spark: SparkSession, src_dir: str, path_glob: str | None = None
) -> DataFrame:
    """readStream over an events-shaped parquet directory with `ts`
    normalized to a µs TIMESTAMP.

    File-stream sources require an explicit schema, but the fixture's
    `ts` physical type has varied across driver generations
    (TIMESTAMP(NANOS) → read as long under nanosAsLong, vs plain
    timestamp[us]). Sniff the effective type with ONE batch-side footer
    read and declare the stream schema to match — hard-coding either
    variant silently mis-scales every event time by 1000×."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    probe = src_dir if path_glob is None else f"{src_dir.rstrip('/')}/{path_glob}"
    ts_is_long = isinstance(
        spark.read.parquet(probe).schema["ts"].dataType, T.LongType
    )
    schema = (
        "event_id long, ts {} , user_id long, event_type string, "
        "value double, props string"
    ).format("long" if ts_is_long else "timestamp")
    reader = spark.readStream.schema(schema)
    if path_glob is not None:
        reader = reader.option("pathGlobFilter", path_glob)
    stream = reader.parquet(src_dir)
    if ts_is_long:
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return stream


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for spark.sql use."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int = 8,
    sort_col: str | None = None,
) -> None:
    """Materialize a bucketed (+optionally sorted) managed table.

    Bucketing is THE co-located-join lever at 100 TB: two tables
    bucketed by the same key into the same bucket count hash-split
    identically at WRITE time, so a later equi-join on that key needs
    NO Exchange on either side — the shuffle is paid once at layout
    time and amortized over every subsequent join (the Spark analog of
    the reference pre-partitioning its segments by id_hash,
    types.h:98-99). tests/test_bucketing.py pins the exchange-free
    plan."""
    writer = df.write.bucketBy(n_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.mode("overwrite").format("parquet").saveAsTable(table_name)


def embeddings_stream_source(
    spark: SparkSession, src_dir: str, path_glob: str | None = "embeddings.parquet"
) -> DataFrame:
    """readStream over the embeddings fixture (vec_id, embedding, label).

    File-stream sources need an explicit schema; the embeddings fixture
    has kept one stable shape across driver generations."""
    reader = spark.readStream.schema(
        "vec_id long, embedding array<float>, label int"
    )
    if path_glob is not None:
        reader = reader.option("pathGlobFilter", path_glob)
    return reader.parquet(src_dir.rstrip("/"))
