"""Streaming query registrations — real Structured Streaming runs whose
results are hash-checked against the DuckDB oracle.

Each callable starts an actual streaming query (file source →
watermarked aggregation → memory sink), drains it with availableNow,
and returns the sink table: the driver verifies streaming semantics
end-to-end, not just a batch twin.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from write_optimized_vector_database_spark.queries import register

_RAW_EVENTS_SCHEMA = (
    "event_id long, ts long, user_id long, event_type string, "
    "value double, props string"
)


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over the events fixture (ns→µs conversion inline)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return (
        spark.readStream.schema(_RAW_EVENTS_SCHEMA)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir.rstrip("/"))
        .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    )


@register(
    "evt_streaming_tumbling_hourly",
    oracle="""
SELECT date_trunc('hour', ts::TIMESTAMP) AS window_start, event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2 ORDER BY 1, 2
""",
    survey_ref="S1-S5 streaming + [EXT] windows",
    tags=["streaming", "events", "window"],
)
def evt_streaming_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ACTUAL streaming execution: watermarked 1-hour tumbling windows
    drained via availableNow into a memory sink. Hash-equal to the batch
    oracle because event-time windows are deterministic under replay —
    the streaming/batch unification Spark promises, verified."""
    from write_optimized_vector_database_spark.streaming.ingest import windowed_event_counts

    name = f"evt_stream_{int(time.time() * 1000)}"
    agg = windowed_event_counts(_events_stream(spark, sf_dir), window="1 hour")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.table(name).select(
        F.col("window.start").alias("window_start"),
        "event_type",
        "n_events",
        "total_value",
    ).orderBy("window_start", "event_type")
