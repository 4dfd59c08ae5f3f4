"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` runs the flagship query (exact batch top-k over the
sf0.001 embeddings fixture). `queries()` / `oracle_sql()` re-export the
engine's query registry (write_optimized_vector_database_spark/queries.py) — one entry per
implemented operator from SURVEY.md §2, each with a DuckDB oracle where
the semantics are SQL-expressible.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from write_optimized_vector_database_spark.queries import registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    reg = registry()
    return reg["vec_topk_ip_exact"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.fn for name, q in registry().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query (omitted for non-SQL ops)."""
    return {name: q.oracle for name, q in registry().items() if q.oracle is not None}
