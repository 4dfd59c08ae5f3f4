"""Count-min sketch gate: the CMS estimate never underestimates the
exact count (the defining one-sided error guarantee)."""

from __future__ import annotations

from pyspark.sql import functions as F

from write_optimized_vector_database_spark.queries import registry


def test_cms_never_underestimates(spark, sf_dir):
    df = registry()["doc_cms_heavy_hitters"].fn(spark, sf_dir)
    assert df.filter(F.col("cms_count") < F.col("exact_count")).count() == 0
    assert df.count() == 20
