"""Changelog construction — the ingest-side data model.

A collection is an append-only changelog of operations, the Spark analog
of the reference WAL (/root/reference/schemas/wal-record.fbs:21-58):
one row per op with (op, id, id_hash, tenant, namespace, ts, vector,
tags, epoch). Epoch is the monotone last-writer-wins version key
(wal-record.fbs:50, types.h:21).

`synthetic_changelog` derives a deterministic op sequence from the
`embeddings` fixture (FIXTURES.md §3): every vector INSERTed, every 5th
id UPSERTed with new tags, every 10th-plus-3 id DELETEd. Both the Spark
builder and `SYNTHETIC_CHANGELOG_SQL` (its DuckDB twin) compute the
exact same rows, which is what makes mutation semantics hash-checkable
by the driver's oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from write_optimized_vector_database_spark.sources.tables import load_table

# Epoch bands: inserts < upserts < deletes, disjoint per id.
INSERT_EPOCH = 0
UPSERT_EPOCH = 100_000
DELETE_EPOCH = 200_000


def synthetic_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic changelog over the embeddings fixture.

    Columns: op, id (long), tenant, namespace, ts, vector, tags, epoch.
    """
    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vector")
    )
    base = emb.select(
        "id",
        "vector",
        F.concat(F.lit("t"), (F.col("id") % 2).cast("string")).alias("tenant"),
        F.concat(F.lit("ns"), ((F.col("id") / 2).cast("long") % 2).cast("string")).alias(
            "namespace"
        ),
    )
    inserts = base.select(
        F.lit("INSERT").alias("op"),
        "id",
        "tenant",
        "namespace",
        "vector",
        F.slice(
            F.array((F.col("id") % 50).cast("int"), ((F.col("id") * 7 + 3) % 50).cast("int")),
            1,
            (F.col("id") % 2 + 1).cast("int"),
        ).alias("tags"),
        (F.col("id") + INSERT_EPOCH).alias("epoch"),
    )
    upserts = (
        base.filter(F.col("id") % 5 == 0)
        .select(
            F.lit("UPSERT").alias("op"),
            "id",
            "tenant",
            "namespace",
            "vector",
            F.array(((F.col("id") * 13 + 1) % 50).cast("int")).alias("tags"),
            (F.col("id") + UPSERT_EPOCH).alias("epoch"),
        )
    )
    deletes = (
        base.filter(F.col("id") % 10 == 3)
        .select(
            F.lit("DELETE").alias("op"),
            "id",
            "tenant",
            "namespace",
            F.lit(None).cast(inserts.schema["vector"].dataType).alias("vector"),
            F.lit(None).cast("array<int>").alias("tags"),
            (F.col("id") + DELETE_EPOCH).alias("epoch"),
        )
    )
    return inserts.unionByName(upserts).unionByName(deletes)


# DuckDB twin of synthetic_changelog (vector column omitted where unused;
# oracle queries that need vectors join back to embeddings on id).
SYNTHETIC_CHANGELOG_SQL = """
changelog AS (
  SELECT 'INSERT' AS op, vec_id AS id,
         't' || (vec_id % 2) AS tenant,
         'ns' || ((vec_id // 2) % 2) AS namespace,
         ([ (vec_id % 50)::INT, ((vec_id * 7 + 3) % 50)::INT ])[1:(vec_id % 2 + 1)::INT] AS tags,
         vec_id + 0 AS epoch
  FROM embeddings
  UNION ALL
  SELECT 'UPSERT', vec_id, 't' || (vec_id % 2), 'ns' || ((vec_id // 2) % 2),
         [ ((vec_id * 13 + 1) % 50)::INT ], vec_id + 100000
  FROM embeddings WHERE vec_id % 5 = 0
  UNION ALL
  SELECT 'DELETE', vec_id, 't' || (vec_id % 2), 'ns' || ((vec_id // 2) % 2),
         NULL, vec_id + 200000
  FROM embeddings WHERE vec_id % 10 = 3
)
"""
