"""Query-time filters — the reference's filter engine surface.

Reference (working code in /root/reference/src/cpp/storage/buffer/msg-buf.h:236-255):
- tenant / namespace equality, empty string = wildcard (msg-buf.h:240-241)
- tag ANY-of: keep if tags ∩ tags_any ≠ ∅ (msg-buf.h:244-255; Roaring
  bitmap index declared for segments, config.h:117-125)
- tombstone skip (msg-buf.h:239)
- probe sampling `sample_p` (types.h:74, config.h:78)

Spark: all are single Catalyst expressions, so they push down to the
Parquet scan (PushedFilters) — the columnar-scan-plus-zone-map analog of
the reference's bitmap index; no index structure needs to exist. The
`arrays_overlap` tag filter evaluates inside codegen. Sampling is
hash-deterministic (see functions/hashing.py) rather than RNG so results
are reproducible and oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from write_optimized_vector_database_spark.functions.hashing import deterministic_sample


def tenant_namespace_filter(
    tenant: str | None = None, namespace: str | None = None
) -> Column:
    """Equality filter; None/empty = wildcard (msg-buf.h:240-241)."""
    cond = F.lit(True)
    if tenant:
        cond = cond & (F.col("tenant") == tenant)
    if namespace:
        cond = cond & (F.col("namespace") == namespace)
    return cond


def tags_any_filter(
    tags_any: list[int | str] | None, tag_dict: DataFrame | None = None
) -> Column:
    """ANY-of tag overlap (msg-buf.h:244-255). Empty list = wildcard.

    String tags are translated through the tag dictionary
    (config.h:122-123) into the same int `arrays_overlap` filter —
    pass `tag_dict` built by operators.tags.build_tag_dictionary."""
    if not tags_any:
        return F.lit(True)
    if any(isinstance(t, str) for t in tags_any):
        from write_optimized_vector_database_spark.operators.tags import (
            tags_any_strings_filter,
        )

        if tag_dict is None:
            raise ValueError("string tags_any requires a tag dictionary")
        return tags_any_strings_filter(tag_dict, [str(t) for t in tags_any])
    return F.arrays_overlap(F.col("tags"), F.array(*[F.lit(int(t)) for t in tags_any]))


def apply_query_filters(
    df: DataFrame,
    tenant: str | None = None,
    namespace: str | None = None,
    tags_any: list[int | str] | None = None,
    sample_p: float | None = None,
    id_col: str = "id",
    tag_dict: DataFrame | None = None,
) -> DataFrame:
    """The full filter stack of QueryRequest (types.h:67-75), applied as
    one conjunction so Catalyst can push it into the scan."""
    df = df.filter(
        tenant_namespace_filter(tenant, namespace)
        & tags_any_filter(tags_any, tag_dict=tag_dict)
    )
    if sample_p is not None and sample_p < 1.0:
        df = df.filter(deterministic_sample(id_col, sample_p))
    return df
