"""write_optimized_vector_database_spark — a PySpark-native analytics engine
with the query and data-processing capabilities of the reference system
sean-ks/Write-Optimized-Vector-Database (WOVeD).

The reference is a write-optimized vector store (Bε-tree buffered ingest,
IVF/PQ two-phase ANN query, tenant/namespace/tag filtering, last-writer-wins
versioning — see SURVEY.md). This package re-expresses that capability
surface Spark-first:

- the collection is a **changelog Parquet table** (op/epoch per record,
  reference: /root/reference/schemas/wal-record.fbs:21-58),
- visibility is a **latest-by-id window** + tombstone filter
  (reference: /root/reference/src/cpp/storage/latest-by-id.h:110-200),
- ANN is **partition-pruned IVF** (KMeans centroid table broadcast-joined
  against an index table partitioned by centroid_id,
  reference: /root/reference/src/cpp/core/config.h:74-100) with an exact
  brute-force rerank (two-phase, reference config.h:92-93,132),
- everything is declarative DataFrame/SQL so Catalyst handles pushdown,
  pruning and AQE; Pandas UDFs appear only where arrays meet NumPy.

Beyond the reference surface the package ships the LLM-data-pipeline
operators mandated by BASELINE.json: dedup (exact/MinHash-LSH/SimHash/
n-gram-Jaccard/embedding-cosine), similarity search, multimodal column
plumbing, and text analysis.
"""

__version__ = "0.1.0"

from write_optimized_vector_database_spark.session import get_spark

from write_optimized_vector_database_spark.maintenance import (  # noqa: E402
    IndexMaintainer,
    fair_scheduler_conf,
)
from write_optimized_vector_database_spark.collection import (  # noqa: E402
    IndexVacuumedError,
)

__all__ = [
    "get_spark",
    "IndexMaintainer",
    "IndexVacuumedError",
    "fair_scheduler_conf",
    "__version__",
]
