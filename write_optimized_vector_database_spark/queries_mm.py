"""Multimodal query registrations `[EXT]` — binary-column pipelines.

The JVM-side blob metadata scan is oracle-checked; the Arrow-batched
decode/feature/frame pipelines are deterministic but Python-side
(registered rows-only, gated by tests/test_multimodal.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from write_optimized_vector_database_spark.operators import multimodal as MM
from write_optimized_vector_database_spark.queries import register
from write_optimized_vector_database_spark.sources.tables import load_table


def _blobs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", MM.blob_column("text").alias("blob"))


@register(
    "mm_blob_metadata_scan",
    oracle="""
SELECT doc_id,
       octet_length(encode(text))::BIGINT AS blob_size,
       md5(text) AS blob_md5
FROM documents ORDER BY doc_id
""",
    survey_ref="[EXT] multimodal-metadata",
    tags=["multimodal"],
)
def mm_blob_metadata_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blob metadata without decoding: size + content hash, JVM-side only
    (Parquet column pruning keeps un-touched blob columns unread)."""
    return (
        MM.blob_stats(_blobs(spark, sf_dir))
        .select("doc_id", "blob_size", "blob_md5")
        .orderBy("doc_id")
    )


@register(
    "mm_decoded_meta_histogram",
    oracle=None,  # Arrow-batched Python decode stub — rows-only check
    survey_ref="[EXT] multimodal-decode",
    tags=["multimodal"],
)
def mm_decoded_meta_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fake-decode metadata distribution: (n_channels,
    mime) histogram — exercises the full decode plumbing (schema,
    batching) without a codec library."""
    decoded = MM.with_decoded_meta(_blobs(spark, sf_dir))
    return (
        decoded.groupBy("meta.mime", "meta.n_channels")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("mime", "n_channels")
    )


@register(
    "mm_frame_sample_counts",
    oracle=None,  # iterator UDF — rows-only check
    survey_ref="[EXT] multimodal-frames",
    tags=["multimodal"],
)
def mm_frame_sample_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling fan-out: every doc yields exactly n_frames rows."""
    frames = MM.frame_sample(_blobs(spark, sf_dir), n_frames=4)
    return (
        frames.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_frames"), F.sum(F.octet_length("frame")).alias("bytes"))
        .orderBy("doc_id")
    )
