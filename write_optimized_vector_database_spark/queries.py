"""Query registry — the driver contract surface.

Every implemented operator from SURVEY.md §2 registers here as
(name → spark callable, optional DuckDB oracle SQL). `__spark_entry__.py`
re-exports this registry as `queries()` / `oracle_sql()`.

Conventions that keep the driver's hash-compare green:
- every computed column is aliased identically in Spark and SQL;
- float aggregates go through exact DECIMAL arithmetic then CAST AS
  DOUBLE (summation-order independent → bit-identical across engines);
- vector scores use folds proven bit-identical to DuckDB's
  list_inner_product/list_distance (see functions/distance.py);
- top-k ties break on ascending id (deterministic membership).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from write_optimized_vector_database_spark.sources.tables import load_table


@dataclass
class EngineQuery:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL; None → driver does rows-only check
    survey_ref: str = ""  # SURVEY.md §2 operator ids this query evidences
    tags: list[str] = field(default_factory=list)


REGISTRY: dict[str, EngineQuery] = {}


def register(
    name: str, oracle: str | None = None, survey_ref: str = "", tags: list[str] | None = None
):
    def deco(fn):
        REGISTRY[name] = EngineQuery(name, fn, oracle, survey_ref, tags or [])
        return fn

    return deco


# ---------------------------------------------------------------------------
# Vector search — exact top-k (SURVEY §2.2 Q1/Q2/Q12/Q14)
# ---------------------------------------------------------------------------

_TOPK_ORACLE = """
WITH q AS (
  SELECT vec_id AS query_id, embedding AS query_vec
  FROM embeddings WHERE vec_id < 8
),
scored AS (
  SELECT q.query_id, e.vec_id, {score_expr} AS score
  FROM q CROSS JOIN embeddings e
),
ranked AS (
  SELECT query_id, vec_id, score,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, vec_id ASC) AS rank
  FROM scored
)
SELECT query_id, vec_id, score, rank FROM ranked WHERE rank <= 10
"""

_SCORE_EXPRS = {
    "ip": "list_inner_product(q.query_vec::DOUBLE[], e.embedding::DOUBLE[])",
    "l2": "-list_distance(q.query_vec::DOUBLE[], e.embedding::DOUBLE[])",
    "cosine": (
        "CASE WHEN list_inner_product(q.query_vec::DOUBLE[], q.query_vec::DOUBLE[]) = 0"
        " OR list_inner_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]) = 0 THEN 0.0"
        " ELSE list_inner_product(q.query_vec::DOUBLE[], e.embedding::DOUBLE[])"
        " / (sqrt(list_inner_product(q.query_vec::DOUBLE[], q.query_vec::DOUBLE[]))"
        "    * sqrt(list_inner_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))) END"
    ),
}


def _fixture_queries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic query batch: the first 8 embedding rows act as the
    QueryRequest batch (reference types.h:67-75; batch ≤100 config.h:180)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )


def _make_topk_query(metric: str):
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        from write_optimized_vector_database_spark.operators.topk import exact_topk

        emb = load_table(spark, sf_dir, "embeddings")
        out = exact_topk(emb, _fixture_queries(spark, sf_dir), k=10, metric=metric)
        return out.withColumn("rank", F.col("rank").cast("long"))

    return fn


for _metric in ("ip", "l2", "cosine"):
    register(
        f"vec_topk_{_metric}_exact",
        oracle=_TOPK_ORACLE.format(score_expr=_SCORE_EXPRS[_metric]),
        survey_ref="Q1,Q2,Q12,Q14",
        tags=["vector", "topk"],
    )(_make_topk_query(_metric))


@register(
    "vec_point_lookup",
    oracle="""
SELECT vec_id, label, len(embedding)::BIGINT AS dim
FROM embeddings WHERE vec_id IN (7, 42, 123, 499)
ORDER BY vec_id
""",
    survey_ref="Q13",
    tags=["vector", "lookup"],
)
def vec_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point lookup by id (reference latest-by-id.h:170-200 getLatest/exists).
    Catalyst pushes the IN-filter to the parquet scan (zone-map pruning —
    the Spark analog of the reference's min/max id_hash segment stats,
    types.h:98-99)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        emb.filter(F.col("vec_id").isin(7, 42, 123, 499))
        .select("vec_id", "label", F.size("embedding").cast("long").alias("dim"))
        .orderBy("vec_id")
    )


# ---------------------------------------------------------------------------
# Relational checklist (SURVEY §2.4) — aggregation grammar
# ---------------------------------------------------------------------------


@register(
    "rel_pricing_summary",
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1 - l_discount AS DECIMAL(18,4)) AS DECIMAL(28,4))) AS DOUBLE) AS sum_disc_price,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
    survey_ref="§2.4 aggregations",
    tags=["relational", "agg"],
)
def rel_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary. DECIMAL accumulation makes the sums
    exact (summation-order independent), then a final CAST to DOUBLE —
    bit-identical to the DuckDB oracle regardless of partitioning."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_qty"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_base_price"),
            # product re-cast to scale 4 (exact: money inputs are 2-dp) so
            # the summed unscaled value stays < 2^53 — DuckDB's
            # decimal→double path double-rounds past that (int128→double÷10^s)
            F.sum(
                (
                    F.col("l_extendedprice").cast("decimal(18,4)")
                    * (F.lit(1) - F.col("l_discount")).cast("decimal(18,4)")
                ).cast("decimal(28,4)")
            )
            .cast("double")
            .alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# The driver's correctness harness checks the FIRST 50 registry entries in
# insertion order, so registration order IS the per-round check window.
# The ordering is derived from the CORRECTNESS_r*.json history on disk, not
# hand-listed, under one rule with three tiers:
#
#   1. RED   — any query whose most-recent driver row failed re-enters the
#              window and STAYS there every round until a green row exists.
#              (A red must never rotate out unwitnessed.)
#   2. NEVER — queries with no driver row ever, highest-value first
#              (_NEVER_CHECKED_HINTS front-loads operator-evidence queries
#              per VERDICT r03; the rest keep registration order).
#   3. GREEN — queries with a green row, in registration order. They keep
#              pytest + driver_sim coverage; the driver window is spent on
#              evidence it doesn't have yet.
_NEVER_CHECKED_HINTS = [
    # §2.2 Q15 — the only query-operator row with zero driver evidence
    "vec_recall_frontier",
    # remaining §2.2 / §2.4 operator-evidence gaps called out by VERDICT r03
    "vec_range_search_radius",
    "vec_knn_classify",
    "rel_window_frame_battery",
    # M3/M4 maintenance-stats evidence
    "emb_ivf_balance_stats",
    "emb_pq_distortion_stats",
    "emb_dimension_stats",
    # round-4 verdict deliverable: mixed-magic codec metadata (PNG/JPEG/GIF)
    "mm_mixed_codec_metadata",
]


def _driver_row_status() -> tuple[dict[str, str], dict[str, int]]:
    """(name → 'green' | 'red', name → last round checked) from the
    CORRECTNESS_r*.json driver history.

    Status is the BEST row across rounds (green wins): a query that was red
    in r01 and green in r03 is settled; one that was red in its latest
    appearance is not, regardless of how many rounds ago that was.
    `last_round` drives the green-rotation tier: with ~150 queries and a
    50-slot window, re-witnessing oldest-first bounds how stale any green
    can get (~3 rounds) — a silent regression in an old green can't hide
    indefinitely."""
    import glob
    import json
    import os
    import re

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    status: dict[str, str] = {}
    last_round: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        rnd = int(m.group(1)) if m else 0
        try:
            with open(path) as f:
                rows = json.load(f)
        except (OSError, ValueError):
            continue
        for name, row in rows.items():
            ok = (
                row.get("rows_match") is True
                and row.get("schema_match") is True
                and row.get("hash_match", True) is not False
                and not row.get("err")
            )
            if status.get(name) != "green":
                status[name] = "green" if ok else "red"
            last_round[name] = max(last_round.get(name, 0), rnd)
    return status, last_round


def registry() -> dict[str, EngineQuery]:
    # Import side-effect modules that register additional queries.
    import write_optimized_vector_database_spark.queries_dedup  # noqa: F401
    import write_optimized_vector_database_spark.queries_ext  # noqa: F401
    import write_optimized_vector_database_spark.queries_mm  # noqa: F401
    import write_optimized_vector_database_spark.queries_rel  # noqa: F401
    import write_optimized_vector_database_spark.queries_stream  # noqa: F401
    import write_optimized_vector_database_spark.queries_text  # noqa: F401

    status, last_round = _driver_row_status()
    hint_rank = {n: i for i, n in enumerate(_NEVER_CHECKED_HINTS)}
    reg_rank = {n: i for i, n in enumerate(REGISTRY)}

    def sort_key(name: str):
        tier = {"red": 0}.get(status.get(name, "never"), 2)
        if tier == 2 and status.get(name) is None:
            tier = 1
        # greens rotate oldest-witnessed-first (VERDICT r04 #1: 94 of 144
        # greens were last checked in r02/r03); reds/nevers keep the
        # hint-then-registration order
        return (
            tier,
            last_round.get(name, 0) if tier == 2 else 0,
            hint_rank.get(name, len(hint_rank)),
            reg_rank[name],
        )

    ordered = {n: REGISTRY[n] for n in sorted(REGISTRY, key=sort_key)}
    REGISTRY.clear()
    REGISTRY.update(ordered)
    return REGISTRY
