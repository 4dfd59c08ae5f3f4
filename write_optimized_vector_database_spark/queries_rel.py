"""Relational-checklist + event-window query registrations (SURVEY §2.4).

The reference has no relational grammar of its own (vector store), but
the engine exposes Spark's full surface; these queries put every
checklist row (joins, aggregation, windows, set ops, pivot, rollup,
sessionization) under the DuckDB oracle gate on the TPC-H-ish fixtures.

Float discipline: every double aggregate goes through DECIMAL (exact,
order-independent) then CAST AS DOUBLE — see queries.py conventions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from write_optimized_vector_database_spark.queries import register
from write_optimized_vector_database_spark.sources.tables import load_table


def _dec(col, scale=2, prec=18):
    return F.col(col).cast(f"decimal({prec},{scale})") if isinstance(col, str) else col.cast(f"decimal({prec},{scale})")


# revenue product re-cast to scale 4 (exact for 2-dp money) so summed
# unscaled values stay < 2^53 — past that DuckDB's decimal→double cast
# double-rounds (int128→double then ÷10^scale) and diverges from Spark's
# correctly-rounded BigDecimal.doubleValue
_REVENUE_DEC = (
    "CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1 - l_discount AS DECIMAL(18,4))"
    " AS DECIMAL(28,4))"
)


@register(
    "rel_top_customers_by_revenue",
    oracle=f"""
SELECT c.c_custkey, c.c_name, c.c_mktsegment,
       CAST(SUM({_REVENUE_DEC}) AS DOUBLE) AS revenue,
       COUNT(DISTINCT o.o_orderkey) AS n_orders
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
GROUP BY c.c_custkey, c.c_name, c.c_mktsegment
ORDER BY revenue DESC, c.c_custkey ASC
LIMIT 25
""",
    survey_ref="§2.4 joins,agg,topk",
    tags=["relational", "join"],
)
def rel_top_customers_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-way join + aggregate + top-N (TPC-H Q3/Q18 family). customer is
    broadcast-sized relative to lineitem; Catalyst/AQE picks broadcast."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    rev = (
        F.col("l_extendedprice").cast("decimal(18,4)")
        * (F.lit(1) - F.col("l_discount")).cast("decimal(18,4)")
    ).cast("decimal(28,4)")
    return (
        c.join(o, o.o_custkey == c.c_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("c_custkey", "c_name", "c_mktsegment")
        .agg(
            F.sum(rev).cast("double").alias("revenue"),
            F.countDistinct("o_orderkey").alias("n_orders"),
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(25)
    )


@register(
    "rel_regional_revenue",
    oracle=f"""
SELECT r.r_name, n.n_name,
       CAST(SUM({_REVENUE_DEC}) AS DOUBLE) AS revenue,
       COUNT(*) AS n_lineitems
FROM region r
JOIN nation n ON n.n_regionkey = r.r_regionkey
JOIN customer c ON c.c_nationkey = n.n_nationkey
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
GROUP BY r.r_name, n.n_name
ORDER BY r.r_name, n.n_name
""",
    survey_ref="§2.4 joins (5-way)",
    tags=["relational", "join"],
)
def rel_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style 5-way star join: dims broadcast, fact shuffles once."""
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    rev = (
        F.col("l_extendedprice").cast("decimal(18,4)")
        * (F.lit(1) - F.col("l_discount")).cast("decimal(18,4)")
    ).cast("decimal(28,4)")
    return (
        F.broadcast(r)
        .join(n, n.n_regionkey == r.r_regionkey)
        .join(c, c.c_nationkey == n.n_nationkey)
        .join(o, o.o_custkey == c.c_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.sum(rev).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
        .orderBy("r_name", "n_name")
    )


@register(
    "rel_semi_anti_join",
    oracle="""
SELECT
  (SELECT COUNT(*) FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                  AND o.o_totalprice > 100000)) AS n_big_spenders,
  (SELECT COUNT(*) FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)) AS n_no_orders
""",
    survey_ref="§2.4 joins (semi/anti)",
    tags=["relational", "join"],
)
def rel_semi_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS / NOT EXISTS as left_semi / left_anti joins."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    big = o.filter(F.col("o_totalprice") > 100_000)
    n_semi = c.join(big, c.c_custkey == big.o_custkey, "left_semi").count()
    n_anti = c.join(o, c.c_custkey == o.o_custkey, "left_anti").count()
    return spark.createDataFrame(
        [(n_semi, n_anti)], "n_big_spenders bigint, n_no_orders bigint"
    )


@register(
    "rel_window_order_ranks",
    oracle="""
SELECT o_custkey, o_orderkey, rn, CAST(running AS DOUBLE) AS running_total
FROM (
  SELECT o_custkey, o_orderkey,
         row_number() OVER w AS rn,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS running
  FROM orders
  WINDOW w AS (PARTITION BY o_custkey
               ORDER BY o_orderdate ASC, o_orderkey ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
) WHERE rn <= 3 AND o_custkey % 10 = 0
""",
    survey_ref="§2.4 window functions",
    tags=["relational", "window"],
)
def rel_window_order_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer order sequence: row_number + running decimal sum
    (the same window machinery that powers latest-by-id and top-k)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc(), F.col("o_orderkey").asc()
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .withColumn(
            "running_total",
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .over(w.rowsBetween(Window.unboundedPreceding, 0))
            .cast("double"),
        )
        .filter((F.col("rn") <= 3) & (F.col("o_custkey") % 10 == 0))
        .select("o_custkey", "o_orderkey", "rn", "running_total")
        .withColumn("rn", F.col("rn").cast("long"))
    )


@register(
    "rel_set_ops",
    oracle="""
WITH returned AS (SELECT DISTINCT l_orderkey FROM lineitem WHERE l_returnflag = 'R'),
     highval  AS (SELECT DISTINCT o_orderkey AS l_orderkey FROM orders
                  WHERE o_totalprice > 200000)
SELECT 'intersect' AS op, COUNT(*) AS n FROM (
  SELECT * FROM returned INTERSECT SELECT * FROM highval)
UNION ALL
SELECT 'except', COUNT(*) FROM (
  SELECT * FROM returned EXCEPT SELECT * FROM highval)
UNION ALL
SELECT 'union', COUNT(*) FROM (
  SELECT * FROM returned UNION SELECT * FROM highval)
ORDER BY op
""",
    survey_ref="§2.4 set ops",
    tags=["relational", "setops"],
)
def rel_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """intersect / except / union(distinct) over order-key sets — computed
    in ONE plan via a full outer join with membership flags (three
    separate count() actions would scan the fact table three times)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    returned = (
        li.filter(F.col("l_returnflag") == "R")
        .select("l_orderkey")
        .distinct()
        .withColumn("in_r", F.lit(1))
    )
    highval = (
        o.filter(F.col("o_totalprice") > 200_000)
        .select(F.col("o_orderkey").alias("l_orderkey"))
        .distinct()
        .withColumn("in_h", F.lit(1))
    )
    flags = returned.join(highval, "l_orderkey", "full_outer").agg(
        F.count(F.when(F.col("in_r").isNotNull() & F.col("in_h").isNotNull(), 1)).alias(
            "n_intersect"
        ),
        F.count(F.when(F.col("in_r").isNotNull() & F.col("in_h").isNull(), 1)).alias(
            "n_except"
        ),
        F.count(F.lit(1)).alias("n_union"),
    )
    return flags.selectExpr(
        "stack(3, 'except', n_except, 'intersect', n_intersect, 'union', n_union) AS (op, n)"
    ).orderBy("op")


@register(
    "rel_pivot_status_flag",
    oracle="""
SELECT l_returnflag,
       CAST(SUM(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_O,
       CAST(SUM(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_F
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
""",
    survey_ref="§2.4 pivot",
    tags=["relational", "pivot"],
)
def rel_pivot_status_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot linestatus into columns (conditional-agg twin in the oracle)."""
    li = load_table(spark, sf_dir, "lineitem")
    out = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")))
    )
    return (
        out.select(
            "l_returnflag",
            F.col("O").cast("double").alias("qty_O"),
            F.col("F").cast("double").alias("qty_F"),
        ).orderBy("l_returnflag")
    )


@register(
    "rel_rollup_revenue",
    oracle=f"""
SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag,
       COALESCE(l_linestatus, 'ALL') AS l_linestatus,
       CAST(SUM({_REVENUE_DEC}) AS DOUBLE) AS revenue
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY l_returnflag, l_linestatus
""",
    survey_ref="§2.4 rollup/cube",
    tags=["relational", "agg"],
)
def rel_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (flag → flag+status → grand total)."""
    li = load_table(spark, sf_dir, "lineitem")
    rev = (
        F.col("l_extendedprice").cast("decimal(18,4)")
        * (F.lit(1) - F.col("l_discount")).cast("decimal(18,4)")
    ).cast("decimal(28,4)")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("l_returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("l_linestatus"),
            "revenue",
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "rel_window_analytics",
    oracle="""
SELECT o_custkey, o_orderkey,
       lag(o_orderkey) OVER w AS prev_order,
       lead(o_orderkey) OVER w AS next_order,
       dense_rank() OVER (PARTITION BY o_custkey ORDER BY o_orderpriority) AS prio_rank,
       ntile(4) OVER w AS quartile,
       (o_orderdate = first_value(o_orderdate) OVER w) AS is_first_order
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
QUALIFY o_custkey % 25 = 0
ORDER BY o_custkey, o_orderkey
""",
    survey_ref="§2.4 window functions (analytic battery)",
    tags=["relational", "window"],
)
def rel_window_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag / lead / dense_rank / ntile / first_value — the analytic window
    surface beyond row_number (integer outputs: no float risk)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc(), F.col("o_orderkey").asc()
    )
    wp = Window.partitionBy("o_custkey").orderBy("o_orderpriority")
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.lag("o_orderkey").over(w).alias("prev_order"),
            F.lead("o_orderkey").over(w).alias("next_order"),
            F.dense_rank().over(wp).cast("long").alias("prio_rank"),
            F.ntile(4).over(w).cast("long").alias("quartile"),
            (F.col("o_orderdate") == F.first("o_orderdate").over(w)).alias(
                "is_first_order"
            ),
        )
        .filter(F.col("o_custkey") % 25 == 0)
        .orderBy("o_custkey", "o_orderkey")
    )


@register(
    "rel_outer_join_coverage",
    oracle="""
SELECT n.n_name,
       COUNT(c.c_custkey) AS n_customers,
       COUNT(*) AS n_rows
FROM nation n LEFT JOIN customer c ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name ORDER BY n.n_name
""",
    survey_ref="§2.4 joins (outer)",
    tags=["relational", "join"],
)
def rel_outer_join_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join with null-preserving counts (nations with zero
    customers still appear with n_customers = 0, n_rows = 1)."""
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    return (
        n.join(c, c.c_nationkey == n.n_nationkey, "left")
        .groupBy("n_name")
        .agg(F.count("c_custkey").alias("n_customers"), F.count(F.lit(1)).alias("n_rows"))
        .orderBy("n_name")
    )


@register(
    "rel_scalar_subquery",
    oracle="""
WITH gavg AS (
  SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS v
  FROM orders
)
SELECT o_orderstatus,
       COUNT(*) AS n_above_avg,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_above
FROM orders, gavg
WHERE o_totalprice > gavg.v
GROUP BY o_orderstatus ORDER BY o_orderstatus
""",
    survey_ref="§2.4 scalar subquery",
    tags=["relational", "subquery"],
)
def rel_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders above the global average price — the scalar-subquery
    pattern (computed once, broadcast into the predicate; the average is
    an exact decimal→double so the comparison boundary is identical in
    both engines)."""
    o = load_table(spark, sf_dir, "orders")
    gavg = o.agg(
        (
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("v")
    )
    return (
        o.crossJoin(F.broadcast(gavg))
        .filter(F.col("o_totalprice") > F.col("v"))
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_above_avg"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_above"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "rel_cube_avg_price",
    oracle="""
SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag,
       COALESCE(l_linestatus, 'ALL') AS l_linestatus,
       COUNT(*) AS n,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
ORDER BY l_returnflag, l_linestatus
""",
    survey_ref="§2.4 cube",
    tags=["relational", "agg"],
)
def rel_cube_avg_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over both dims; avg = exact-decimal sum cast to double then one
    double division — deterministic in both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (
                F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_price"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("l_returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("l_linestatus"),
            "n",
            "avg_price",
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# Event-time windows over `events` [EXT]
# ---------------------------------------------------------------------------


@register(
    "evt_tumbling_hourly",
    oracle="""
SELECT date_trunc('hour', ts::TIMESTAMP) AS window_start, event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2 ORDER BY 1, 2
""",
    survey_ref="[EXT] event tumbling window",
    tags=["events", "window"],
)
def evt_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time windows (batch form of the streaming
    `window(ts, '1 hour')` aggregation; same grouping keys)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("window_start"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
        )
        .orderBy("window_start", "event_type")
    )


@register(
    "evt_sessionization",
    oracle="""
WITH gaps AS (
  SELECT user_id, ts::TIMESTAMP AS ts, event_id,
         CASE WHEN epoch_us(ts::TIMESTAMP)
                   - epoch_us(lag(ts::TIMESTAMP) OVER (PARTITION BY user_id ORDER BY ts, event_id))
                   > 1800000000 OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
),
sess AS (
  SELECT user_id, ts,
         -- ::BIGINT: DuckDB SUM(int) yields HUGEINT, which the driver's
         -- pandas fetch renders as float64 (53.0 vs Spark's 53)
         CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
  FROM gaps
)
SELECT user_id, session_id, COUNT(*) AS n_events,
       MIN(ts) AS session_start, MAX(ts) AS session_end
FROM sess GROUP BY user_id, session_id
HAVING COUNT(*) >= 3
ORDER BY user_id, session_id
""",
    survey_ref="[EXT] sessionization",
    tags=["events", "window"],
)
def evt_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30-min inactivity gap) via lag + cumulative-sum —
    the batch twin of streaming `session_window(ts, '30 minutes')`."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    sessions = (
        ev.withColumn(
            "new_session",
            F.when(F.lag("ts").over(w).isNull() | (gap_us > 1_800_000_000), 1).otherwise(0),
        )
        .withColumn(
            "session_id",
            F.sum("new_session").over(
                # event_id tiebreak: with duplicate timestamps per user the
                # running sum's row order is engine-dependent otherwise.
                Window.partitionBy("user_id")
                .orderBy(F.col("ts").asc(), F.col("event_id").asc())
                .rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
    )
    return (
        sessions.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
        .filter(F.col("n_events") >= 3)
        .orderBy("user_id", "session_id")
    )


@register(
    "evt_user_topk_by_value",
    oracle="""
SELECT user_id, n_events, CAST(total AS DOUBLE) AS total_value, rank
FROM (
  SELECT user_id, COUNT(*) AS n_events,
         SUM(CAST(value AS DECIMAL(18,6))) AS total,
         row_number() OVER (ORDER BY SUM(CAST(value AS DECIMAL(18,6))) DESC,
                            user_id ASC) AS rank
  FROM events WHERE event_type = 'purchase'
  GROUP BY user_id
) WHERE rank <= 20
""",
    survey_ref="§2.4 agg+topk",
    tags=["events", "topk"],
)
def evt_user_topk_by_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 purchasers by exact decimal value."""
    ev = load_table(spark, sf_dir, "events")
    agg = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("total"),
        )
    )
    from write_optimized_vector_database_spark.operators.topk import ranked_top_n

    return (
        ranked_top_n(agg, [F.col("total").desc(), F.col("user_id").asc()], 20)
        .select(
            "user_id",
            "n_events",
            F.col("total").cast("double").alias("total_value"),
            F.col("rank").cast("long"),
        )
    )


@register(
    "evt_asof_join",
    oracle="""
WITH ev AS (SELECT event_id, ts::TIMESTAMP AS ts, user_id, event_type, value FROM events),
u AS (
  SELECT user_id, ts, 0 AS side,
         event_id AS asof_event_id, value AS asof_value,
         NULL::BIGINT AS r_event_id, NULL::DOUBLE AS r_value
  FROM ev WHERE event_type = 'click'
  UNION ALL
  SELECT user_id, ts, 1, NULL, NULL, event_id, value
  FROM ev WHERE event_type = 'purchase'
),
filled AS (
  SELECT user_id, side, r_event_id, r_value,
         last_value(asof_event_id IGNORE NULLS) OVER w AS asof_event_id,
         last_value(asof_value IGNORE NULLS) OVER w AS asof_value
  FROM u
  WINDOW w AS (PARTITION BY user_id
               ORDER BY ts ASC, side DESC, asof_event_id ASC NULLS FIRST
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT r_event_id AS event_id, user_id, r_value AS value,
       asof_event_id, asof_value
FROM filled WHERE side = 1
""",
    survey_ref="§2.4 as-of join (composed)",
    tags=["events", "asof", "join"],
)
def evt_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: every purchase event picks up the user's most recent
    strictly-earlier click (operators/asof.py — union + window carry,
    one shuffle, no per-key Python)."""
    from write_optimized_vector_database_spark.operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id", "value"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "ts", "user_id", "value"
    )
    out = asof_join(
        clicks,
        purchases,
        on="user_id",
        ts_col="ts",
        value_cols=["event_id", "value"],
        strict=True,
        tiebreak="event_id",
    )
    return out.select("event_id", "user_id", "value", "asof_event_id", "asof_value")


@register(
    "rel_exact_percentiles",
    oracle="""
SELECT l_returnflag,
       quantile_cont(l_quantity, 0.5) AS p50_qty,
       quantile_cont(l_extendedprice, 0.9) AS p90_price,
       quantile_cont(l_discount, 0.25) AS p25_discount
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
""",
    survey_ref="§2.4 agg (exact percentile)",
    tags=["relational", "agg"],
)
def rel_exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Spark `percentile` ≡ DuckDB
    `quantile_cont` — both linear interpolation on the sorted values)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.percentile("l_quantity", F.lit(0.5)).alias("p50_qty"),
            F.percentile("l_extendedprice", F.lit(0.9)).alias("p90_price"),
            F.percentile("l_discount", F.lit(0.25)).alias("p25_discount"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "rel_scalar_function_battery",
    oracle="""
SELECT o_orderkey,
       year(o_orderdate::TIMESTAMP) AS order_year,
       month(o_orderdate::TIMESTAMP) AS order_month,
       upper(o_orderpriority) AS prio_upper,
       substring(o_orderstatus, 1, 1) AS status_c,
       length(o_orderpriority)::BIGINT AS prio_len,
       abs(o_totalprice - 100000.0) AS dist_from_100k,
       floor(o_totalprice / 1000)::BIGINT AS price_bucket,
       concat(o_orderstatus, '-', o_orderpriority) AS status_prio,
       coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_mapped
FROM orders WHERE o_orderkey % 100 = 0 ORDER BY o_orderkey
""",
    survey_ref="§2.4 scalar functions",
    tags=["relational", "scalar"],
)
def rel_scalar_function_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-function surface: dates, strings, math, conditionals —
    all JVM expressions inside whole-stage codegen."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 100 == 0)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.upper("o_orderpriority").alias("prio_upper"),
        F.substring("o_orderstatus", 1, 1).alias("status_c"),
        F.length("o_orderpriority").cast("long").alias("prio_len"),
        F.abs(F.col("o_totalprice") - 100000.0).alias("dist_from_100k"),
        F.floor(F.col("o_totalprice") / 1000).alias("price_bucket"),
        F.concat_ws("-", "o_orderstatus", "o_orderpriority").alias("status_prio"),
        F.coalesce(F.nullif("o_orderstatus", F.lit("O")), F.lit("OPEN")).alias(
            "status_mapped"
        ),
    ).orderBy("o_orderkey")


@register(
    "evt_json_props_extract",
    oracle="""
SELECT event_type,
       CAST(SUM(json_extract_string(props, '$.k')::BIGINT) AS BIGINT) AS sum_k,
       COUNT(DISTINCT json_extract_string(props, '$.k')::BIGINT) AS n_distinct_k,
       COUNT(*) FILTER (WHERE json_extract_string(props, '$.k')::BIGINT >= 50) AS n_high_k
FROM events GROUP BY event_type ORDER BY event_type
""",
    survey_ref="§2.4 scalar funcs (JSON)",
    tags=["events", "json"],
)
def evt_json_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured props column (JSON `{"k": int}`): path extraction +
    integer aggregates (get_json_object stays JVM-side)."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.groupBy("event_type")
        .agg(
            F.sum(k).cast("long").alias("sum_k"),
            F.countDistinct(k).alias("n_distinct_k"),
            F.count(F.when(k >= 50, 1)).alias("n_high_k"),
        )
        .orderBy("event_type")
    )


@register(
    "evt_incident_range_join",
    oracle="""
WITH w AS (
  SELECT event_id AS incident_id,
         ts::TIMESTAMP - INTERVAL 10 MINUTE AS w_start,
         ts::TIMESTAMP + INTERVAL 10 MINUTE AS w_end
  FROM events WHERE event_type = 'error' AND value > 95
)
SELECT w.incident_id,
       COUNT(*) AS n_events,
       COUNT(DISTINCT e.user_id) AS n_users,
       CAST(SUM(CAST(e.value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
FROM events e JOIN w ON e.ts::TIMESTAMP BETWEEN w.w_start AND w.w_end
GROUP BY w.incident_id
ORDER BY w.incident_id
""",
    survey_ref="[EXT] interval range join (bucketed reduction)",
    tags=["events", "range_join"],
)
def evt_incident_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval range join: +/-10-minute incident windows around
    high-value errors, joined to all events inside each window. The
    Spark plan is the bucketed equi-join reduction (operators/rollup.py
    range_join_buckets) -- a hash join on an hour-bucket key with the
    BETWEEN as residual, never a nested loop; the DuckDB oracle states
    the same join declaratively (its IEJoin handles it at oracle scale)."""
    from write_optimized_vector_database_spark.operators.rollup import range_join_buckets

    ev = load_table(spark, sf_dir, "events")
    windows = ev.filter((F.col("event_type") == "error") & (F.col("value") > 95)).select(
        F.col("event_id").alias("incident_id"),
        (F.col("ts") - F.expr("INTERVAL 10 MINUTES")).alias("w_start"),
        (F.col("ts") + F.expr("INTERVAL 10 MINUTES")).alias("w_end"),
    )
    joined = range_join_buckets(
        ev.select("ts", "user_id", "value"), windows, bucket_seconds=3600
    )
    return (
        joined.groupBy("incident_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
        )
        .orderBy("incident_id")
    )


@register(
    "evt_hypertable_rollup_merge",
    oracle="""
SELECT CAST(date_trunc('day', ts::TIMESTAMP) AS TIMESTAMP) AS bucket_ts, event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2 ORDER BY 1, 2
""",
    survey_ref="[EXT] hypertable continuous-aggregate hierarchy",
    tags=["events", "rollup"],
)
def evt_hypertable_rollup_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical continuous aggregate: daily totals assembled from
    three pre-aggregated branches -- (a) daily rollup re-aggregated from
    hourly cells for full days, (b) hourly cells for the closed hours of
    the current partial day, (c) raw tail past the hour watermark. The
    oracle aggregates raw rows directly; equality holds because partial
    sums accumulate in exact DECIMAL (merge-of-partials == direct agg),
    which is precisely the invariant a hypertable rollup must maintain."""
    from write_optimized_vector_database_spark.operators.rollup import (
        hourly_rollup,
        merge_rollup_branches,
        rollup_to_coarser,
    )

    ev = load_table(spark, sf_dir, "events")
    # watermark as a broadcast scalar IN the plan (VERDICT r04 #6: the
    # previous .first() ran an extra driver job in the query body — the
    # same shape the funnel fix removed). The 1-row agg broadcasts to
    # every branch; no driver action until the caller materializes.
    wmdf = ev.agg(F.date_trunc("hour", F.max("ts")).alias("__wm")).withColumn(
        "__day0", F.date_trunc("day", F.col("__wm"))
    )
    ev2 = ev.crossJoin(F.broadcast(wmdf))
    keys = ["event_type"]

    def branch(cond):
        return ev2.filter(cond).drop("__wm", "__day0")

    hourly_full_days = hourly_rollup(branch(F.col("ts") < F.col("__day0")), keys)
    daily = rollup_to_coarser(hourly_full_days, "day", keys)
    hourly_partial_day = hourly_rollup(
        branch((F.col("ts") >= F.col("__day0")) & (F.col("ts") < F.col("__wm"))), keys
    )
    tail = hourly_rollup(branch(F.col("ts") >= F.col("__wm")), keys)

    return merge_rollup_branches(
        [daily, hourly_partial_day, tail], "day", keys
    ).orderBy("bucket_ts", "event_type")


@register(
    "rel_grouping_sets",
    oracle="""
SELECT l_returnflag, l_linestatus,
       GROUPING(l_returnflag, l_linestatus) AS gid,
       COUNT(*) AS n,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
ORDER BY gid, l_returnflag, l_linestatus
""",
    survey_ref="§2.4 rollup/cube grammar (+explicit GROUPING SETS)",
    tags=["relational", "agg"],
)
def rel_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS with grouping-id disambiguation (the
    rollup/cube generalization): detail, per-flag, and grand-total rows
    in one pass -- Spark computes all sets in a single Expand+Aggregate,
    not three scans."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_gs")
    return spark.sql("""
SELECT l_returnflag, l_linestatus,
       grouping_id(l_returnflag, l_linestatus) AS gid,
       COUNT(*) AS n,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM lineitem_gs
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
ORDER BY gid, l_returnflag, l_linestatus
""")


@register(
    "evt_asof_tolerance_join",
    oracle="""
WITH ev AS (SELECT event_id, ts::TIMESTAMP AS ts, user_id, event_type, value FROM events),
u AS (
  SELECT user_id, ts, 0 AS side,
         event_id AS asof_event_id, value AS asof_value, ts AS asof_ts,
         NULL::BIGINT AS r_event_id, NULL::DOUBLE AS r_value, NULL::TIMESTAMP AS r_ts
  FROM ev WHERE event_type = 'click'
  UNION ALL
  SELECT user_id, ts, 1, NULL, NULL, NULL, event_id, value, ts
  FROM ev WHERE event_type = 'purchase'
),
filled AS (
  SELECT user_id, side, r_event_id, r_value, r_ts,
         last_value(asof_event_id IGNORE NULLS) OVER w AS asof_event_id,
         last_value(asof_value IGNORE NULLS) OVER w AS asof_value,
         last_value(asof_ts IGNORE NULLS) OVER w AS asof_ts
  FROM u
  WINDOW w AS (PARTITION BY user_id
               ORDER BY ts ASC, side DESC, asof_event_id ASC NULLS FIRST
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT r_event_id AS event_id, user_id, r_value AS value,
       CASE WHEN asof_ts IS NOT NULL
                 AND epoch_us(r_ts) - epoch_us(asof_ts) <= 1800000000
            THEN asof_event_id END AS asof_event_id,
       CASE WHEN asof_ts IS NOT NULL
                 AND epoch_us(r_ts) - epoch_us(asof_ts) <= 1800000000
            THEN asof_value END AS asof_value
FROM filled WHERE side = 1
""",
    survey_ref="§2.4 as-of join (+tolerance bound, merge_asof parity)",
    tags=["events", "asof", "join"],
)
def evt_asof_tolerance_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of with a 30-minute lookback bound: a purchase only inherits a
    click that happened within the last half hour -- stale state is
    nulled, not attached (pandas merge_asof `tolerance` semantics).
    The bound compares epoch-microsecond integers: exact cross-engine."""
    from write_optimized_vector_database_spark.operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id", "value"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "ts", "user_id", "value"
    )
    return asof_join(
        clicks,
        purchases,
        on="user_id",
        ts_col="ts",
        value_cols=["event_id", "value"],
        strict=True,
        tiebreak="event_id",
        tolerance_seconds=1800,
    ).select("event_id", "user_id", "value", "asof_event_id", "asof_value")


@register(
    "evt_session_funnel",
    oracle="""
WITH gaps AS (
  SELECT user_id, ts::TIMESTAMP AS ts, event_id, event_type,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch_us(ts::TIMESTAMP) - epoch_us(lag(ts::TIMESTAMP) OVER w)
                      > 1800000000
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, ts, event_type,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM gaps
),
s1 AS (
  SELECT user_id, sid, MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view
  FROM sess GROUP BY user_id, sid
),
s2 AS (
  SELECT s1.user_id, s1.sid, s1.t_view, MIN(e.ts) AS t_click
  FROM s1 LEFT JOIN sess e
    ON e.user_id = s1.user_id AND e.sid = s1.sid
   AND e.event_type = 'click' AND s1.t_view IS NOT NULL AND e.ts > s1.t_view
  GROUP BY s1.user_id, s1.sid, s1.t_view
),
s3 AS (
  SELECT s2.user_id, s2.sid, s2.t_view, s2.t_click, MIN(e.ts) AS t_purchase
  FROM s2 LEFT JOIN sess e
    ON e.user_id = s2.user_id AND e.sid = s2.sid
   AND e.event_type = 'purchase' AND s2.t_click IS NOT NULL AND e.ts > s2.t_click
  GROUP BY s2.user_id, s2.sid, s2.t_view, s2.t_click
)
SELECT 'step1_view' AS step, COUNT(t_view) AS n_sessions FROM s3
UNION ALL
SELECT 'step2_click', COUNT(t_click) FROM s3
UNION ALL
SELECT 'step3_purchase', COUNT(t_purchase) FROM s3
ORDER BY step
""",
    survey_ref="[EXT] sessionized funnel (ordered multi-step conversion)",
    tags=["events", "window", "funnel"],
)
def evt_session_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel within 30-minute sessions: view -> later click ->
    later purchase. Step times chain through conditional window minima
    over one (user_id, sid) partition (each step's min ts must follow the
    previous step's), so the whole funnel resolves in a single session
    exchange -- no per-step joins, no driver-side collect."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = ev.select(
        "user_id", "ts", "event_id", "event_type",
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w)))
                > 1_800_000_000
            ),
            1,
        ).otherwise(0).alias("new_session"),
    )
    cum = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    sess = gaps.select(
        "user_id", "ts", "event_type", F.sum("new_session").over(cum).alias("sid")
    )
    # Single conditional-window pass over (user_id, sid): t_view is the
    # session min of view timestamps; t_click/t_purchase chain on it via
    # row-varying WHEN conditions over the SAME window partition, so all
    # three step times resolve in one exchange (no per-step joins). The
    # per-session reduce then reuses that partitioning, and the 1x3
    # unpivot stays lazy (inline struct explode, no .first() round-trip).
    wsess = Window.partitionBy("user_id", "sid")
    stepped = sess.withColumn(
        "t_view",
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(wsess),
    )
    stepped = stepped.withColumn(
        "t_click",
        F.min(
            F.when(
                (F.col("event_type") == "click") & (F.col("ts") > F.col("t_view")),
                F.col("ts"),
            )
        ).over(wsess),
    )
    stepped = stepped.withColumn(
        "t_purchase",
        F.min(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("ts") > F.col("t_click")),
                F.col("ts"),
            )
        ).over(wsess),
    )
    per_session = stepped.groupBy("user_id", "sid").agg(
        F.max("t_view").alias("t_view"),
        F.max("t_click").alias("t_click"),
        F.max("t_purchase").alias("t_purchase"),
    )
    counts = per_session.agg(
        F.count("t_view").alias("v"),
        F.count("t_click").alias("c"),
        F.count("t_purchase").alias("p"),
    )
    return (
        counts.select(
            F.explode(
                F.array(
                    F.struct(
                        F.lit("step1_view").alias("step"),
                        F.col("v").alias("n_sessions"),
                    ),
                    F.struct(
                        F.lit("step2_click").alias("step"),
                        F.col("c").alias("n_sessions"),
                    ),
                    F.struct(
                        F.lit("step3_purchase").alias("step"),
                        F.col("p").alias("n_sessions"),
                    ),
                )
            ).alias("s")
        )
        .select("s.step", "s.n_sessions")
        .orderBy("step")
    )


# ---------------------------------------------------------------------------
# Round-2 additions: market share, correlated EXISTS, z-order layout,
# column profiling (§2.4 breadth + layout ops for 100 TB scans)
# ---------------------------------------------------------------------------


@register(
    "rel_market_share",
    oracle=f"""
WITH asia AS (
  SELECT year(o.o_orderdate) AS order_year, n.n_name AS nation,
         {_REVENUE_DEC} AS rev
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey
  WHERE r.r_name = 'ASIA'
)
SELECT order_year, nation,
       CAST(CAST(SUM(rev) AS DOUBLE)
            / CAST(SUM(SUM(rev)) OVER (PARTITION BY order_year) AS DOUBLE)
         AS DOUBLE) AS mkt_share
FROM asia GROUP BY order_year, nation
ORDER BY order_year, nation
""",
    survey_ref="§2.4 joins,agg,window (TPC-H Q8 family)",
    tags=["relational", "join", "window"],
)
def rel_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-year nation market share inside one region (TPC-H Q8 shape):
    a 5-way join where every dimension side is broadcast-sized, one
    shuffle on the (year, nation) aggregate, and the share is a window
    ratio of exact DECIMAL sums (division done in DOUBLE — IEEE-identical
    across engines; decimal division scale rules are NOT)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    rev = (
        F.col("l_extendedprice").cast("decimal(18,4)")
        * (F.lit(1) - F.col("l_discount")).cast("decimal(18,4)")
    ).cast("decimal(28,4)")
    asia = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r.filter(F.col("r_name") == "ASIA")),
              n.n_regionkey == F.col("r_regionkey"))
        .select(F.year("o_orderdate").alias("order_year"),
                F.col("n_name").alias("nation"), rev.alias("rev"))
    )
    per = asia.groupBy("order_year", "nation").agg(F.sum("rev").alias("nrev"))
    w = Window.partitionBy("order_year")
    return (
        per.select(
            "order_year", "nation",
            (F.col("nrev").cast("double") / F.sum("nrev").over(w).cast("double"))
            .alias("mkt_share"),
        )
        .orderBy("order_year", "nation")
    )


@register(
    "rel_correlated_exists",
    oracle="""
SELECT o.o_orderkey, o.o_totalprice
FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_discount > 0.08)
  AND NOT EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
ORDER BY o.o_orderkey
LIMIT 500
""",
    survey_ref="§2.4 subquery (correlated EXISTS / NOT EXISTS)",
    tags=["relational", "subquery"],
)
def rel_correlated_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS + NOT EXISTS — planned as LEFT SEMI and LEFT
    ANTI joins on the order key (no row multiplication, no distinct):
    the two scans of lineitem each push their own filter down, and both
    joins shuffle on the same key so AQE coalesces the exchange."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    disc = li.filter(F.col("l_discount") > 0.08).select("l_orderkey")
    ret = li.filter(F.col("l_returnflag") == "R").select("l_orderkey")
    return (
        o.join(disc, o.o_orderkey == disc.l_orderkey, "left_semi")
        .join(ret, o.o_orderkey == ret.l_orderkey, "left_anti")
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
        .limit(500)
    )


from write_optimized_vector_database_spark.operators.zorder import (  # noqa: E402
    zorder_key,
    zorder_key_sql,
)

_Z_SQL = zorder_key_sql(
    ["user_id % 256", "(hour(ts::TIMESTAMP) * 60 + minute(ts::TIMESTAMP)) % 256"],
    bits=8,
)


@register(
    "rel_zorder_layout",
    oracle=f"""
WITH keyed AS (
  SELECT {_Z_SQL} AS zkey, user_id, event_id FROM events
)
SELECT zkey >> 8 AS zbucket,
       COUNT(*) AS n_rows,
       MIN(user_id) AS min_user, MAX(user_id) AS max_user,
       MIN(event_id) AS min_event
FROM keyed GROUP BY 1 ORDER BY 1
""",
    survey_ref="S7 segment layout ([EXT] z-order multi-dim clustering)",
    tags=["relational", "layout", "zorder"],
)
def rel_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton-key layout accounting: interleave (user_id, minute-of-day)
    into a z-key and aggregate per 256-key z-range — the per-file stats
    a z-ordered write would produce. The tight min/max_user per bucket
    IS the clustering property that turns a user_id filter into
    row-group skips even though the sort key is two-dimensional.
    All bit arithmetic is JVM-side (see operators/zorder.py)."""
    ev = load_table(spark, sf_dir, "events")
    zk = zorder_key(
        [
            F.col("user_id") % 256,
            (F.hour("ts") * 60 + F.minute("ts")) % 256,
        ],
        bits=8,
    )
    return (
        ev.select(zk.alias("zkey"), "user_id", "event_id")
        .groupBy(F.shiftright(F.col("zkey"), 8).alias("zbucket"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("user_id").alias("min_user"),
            F.max("user_id").alias("max_user"),
            F.min("event_id").alias("min_event"),
        )
        .orderBy("zbucket")
    )


@register(
    "rel_table_profile",
    oracle="""
SELECT 'o_totalprice' AS col_name,
       COUNT(*) AS n_rows,
       COUNT(*) - COUNT(o_totalprice) AS n_nulls,
       COUNT(DISTINCT o_totalprice) AS n_distinct,
       CAST(MIN(o_totalprice) AS DOUBLE) AS min_val,
       CAST(MAX(o_totalprice) AS DOUBLE) AS max_val
FROM orders
UNION ALL
SELECT 'o_custkey', COUNT(*), COUNT(*) - COUNT(o_custkey),
       COUNT(DISTINCT o_custkey),
       CAST(MIN(o_custkey) AS DOUBLE), CAST(MAX(o_custkey) AS DOUBLE)
FROM orders
ORDER BY col_name
""",
    survey_ref="M1 stats ([EXT] data-quality column profiling)",
    tags=["relational", "profile", "quality"],
)
def rel_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiling (row/null/distinct counts, min/max) — the
    data-quality pass a training pipeline runs before ingesting a crawl.
    One aggregate per profiled column over a single scan each; at scale
    the exact COUNT(DISTINCT) is the only shuffle-expander and would be
    swapped for approx_count_distinct where 2% error is acceptable."""
    o = load_table(spark, sf_dir, "orders")

    def prof(col: str):
        return o.agg(
            F.lit(col).alias("col_name"),
            F.count(F.lit(1)).alias("n_rows"),
            (F.count(F.lit(1)) - F.count(col)).alias("n_nulls"),
            F.countDistinct(col).alias("n_distinct"),
            F.min(col).cast("double").alias("min_val"),
            F.max(col).cast("double").alias("max_val"),
        )

    return prof("o_totalprice").unionByName(prof("o_custkey")).orderBy("col_name")


@register(
    "evt_sliding_window_counts",
    oracle="""
WITH hops AS (
  SELECT e.event_type, e.value,
         time_bucket(INTERVAL 30 MINUTE, e.ts::TIMESTAMP)
           - k.k * INTERVAL 30 MINUTE AS window_start
  FROM events e, range(4) k(k)
)
SELECT window_start, event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
FROM hops
GROUP BY window_start, event_type
ORDER BY window_start, event_type
""",
    survey_ref="[EXT] sliding/hopping event-time windows",
    tags=["events", "window"],
)
def evt_sliding_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (2 h length, 30 min hop): every event lands in
    exactly 4 overlapping windows. Spark's `window()` expands the row
    per overlapping window BEFORE the aggregate — same explode-then-
    partial-agg shape as the oracle's range(4) join, so the shuffle
    carries window×type partials, amplified 4× but still narrow."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "2 hours", "30 minutes").alias("w"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
        .orderBy("window_start", "event_type")
    )


@register(
    "evt_salted_user_agg",
    oracle="""
SELECT event_type,
       COUNT(*) AS n_events,
       -- outer ::BIGINT: DuckDB SUM(BIGINT) is HUGEINT → float64 via pandas
       CAST(SUM(CAST(floor(CAST(value AS DOUBLE) * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
         AS total_cents,
       MIN(user_id) AS min_user,
       MAX(user_id) AS max_user
FROM events GROUP BY event_type ORDER BY event_type
""",
    survey_ref="§2.4 agg (skew: salted two-stage aggregation)",
    tags=["events", "agg", "skew"],
)
def evt_salted_user_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-proof aggregation under the oracle gate: the per-type totals
    run through salted_agg (key × 16-salt partials, then a tiny final
    merge), and hash-equality with the plain GROUP BY oracle proves the
    two-stage decomposition exact. event_type is a 5-value key — exactly
    the shape whose partial aggregate funnels 1/5 of a 100 TB table
    into one reducer without the salt. Values are floor-quantized to
    integer cents so the salted partial sums stay order-independent."""
    from write_optimized_vector_database_spark.operators.skew import salted_agg

    ev = load_table(spark, sf_dir, "events").withColumn(
        "cents",
        F.floor(F.col("value").cast("double") * 100.0 + 0.5).cast("long"),
    )
    out = salted_agg(
        ev,
        key_cols=["event_type"],
        aggs={
            "n_events": ("event_id", "count"),
            "total_cents": ("cents", "sum"),
            "min_user": ("user_id", "min"),
            "max_user": ("user_id", "max"),
        },
        n_salts=16,
        salt_source="event_id",
    )
    return out.select(
        "event_type", "n_events", "total_cents", "min_user", "max_user"
    ).orderBy("event_type")


@register(
    "evt_retention_cohorts",
    oracle="""
WITH firsts AS (
  -- cohort_week stays TIMESTAMP: DuckDB DATE arrives as datetime64 via
  -- the driver's pandas fetch while Spark DateType collects as date —
  -- matching the types at the source is the only stable gate.
  SELECT user_id, date_trunc('week', MIN(ts::TIMESTAMP)) AS cohort_week
  FROM events GROUP BY user_id
),
weekly AS (
  SELECT e.user_id, f.cohort_week,
         date_diff('day', f.cohort_week::DATE,
                   CAST(date_trunc('week', e.ts::TIMESTAMP) AS DATE)) // 7 AS week_offset
  FROM events e JOIN firsts f ON f.user_id = e.user_id
)
SELECT cohort_week, CAST(week_offset AS BIGINT) AS week_offset,
       COUNT(DISTINCT user_id) AS n_users,
       COUNT(*) AS n_events
FROM weekly
GROUP BY cohort_week, week_offset
ORDER BY cohort_week, week_offset
""",
    survey_ref="[EXT] cohort retention (first-seen week x offset matrix)",
    tags=["events", "window", "analytics"],
)
def evt_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention cohorts: each user joins the cohort of their
    first-event week; the matrix counts distinct users active at each
    week offset. Two shuffles total (per-user min, then the cohort
    group-by) — the user->cohort map is keyed by the same user_id the
    events already hash on, so AQE coalesces the join into the first
    shuffle's layout.

    100 TB shape: firsts is |users| rows (small vs events); the join is
    an equality join on user_id that sort-merge/broadcasts by size, and
    COUNT(DISTINCT user) per cell is a partial-aggregated two-stage
    count, never a global collect."""
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    weekly = ev.join(firsts, "user_id").select(
        "user_id",
        "cohort_week",
        F.expr(
            "datediff(CAST(date_trunc('week', ts) AS DATE), cohort_week) div 7"
        ).alias("week_offset"),
    )
    return (
        weekly.groupBy("cohort_week", F.col("week_offset").cast("long").alias("week_offset"))
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("cohort_week", "week_offset")
    )


@register(
    "rel_pareto_suppliers",
    # 2-D skyline (pareto frontier) over exact integer measures. The
    # oracle is the independent NOT-EXISTS dominance formulation; the
    # Spark side is the O(n log n) single-sort window derivation.
    oracle="""
WITH agg AS (
  SELECT l_suppkey,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                  * CAST(1 - l_discount AS DECIMAL(18,4))) * 100 AS BIGINT)
           AS revenue_cents,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) * 100 AS BIGINT) AS qty_cents
  FROM lineitem GROUP BY l_suppkey
)
SELECT a.l_suppkey,
       CAST(a.revenue_cents AS DOUBLE) / 100 AS revenue,
       CAST(a.qty_cents AS DOUBLE) / 100 AS total_qty
FROM agg a
WHERE NOT EXISTS (
  SELECT 1 FROM agg b
  WHERE b.revenue_cents >= a.revenue_cents AND b.qty_cents >= a.qty_cents
    AND (b.revenue_cents > a.revenue_cents OR b.qty_cents > a.qty_cents)
)
ORDER BY a.l_suppkey
""",
    survey_ref="[EXT] skyline / pareto-frontier query (window derivation vs NOT EXISTS)",
    tags=["relational", "window", "analytics"],
)
def rel_pareto_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto frontier of suppliers on (revenue, quantity), both
    maximized. Rather than the O(n^2) NOT-EXISTS self-join (kept as the
    oracle), the frontier falls out of ONE sort: a row is dominated iff
    the max quantity among rows with strictly higher revenue reaches its
    quantity, or a same-revenue row strictly beats its quantity. Both
    maxima are window expressions over the same revenue ordering, so
    the plan is agg -> single window sort -> filter.

    100 TB shape: the skyline input is already one row per supplier
    (the group-by crushed the fact table), and the window runs on that
    reduced set; dominance on exact BIGINT cents keeps membership
    deterministic cross-engine."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    rev = (
        F.col("l_extendedprice").cast("decimal(18,4)")
        * (F.lit(1) - F.col("l_discount")).cast("decimal(18,4)")
    ).cast("decimal(28,4)")
    agg = li.groupBy("l_suppkey").agg(
        (F.sum(rev) * 100).cast("long").alias("revenue_cents"),
        (F.sum(F.col("l_quantity").cast("decimal(18,2)")) * 100)
        .cast("long")
        .alias("qty_cents"),
    )
    def skyline_filter(df, *partition_cols):
        w_strict = (
            Window.partitionBy(*partition_cols)
            .orderBy(F.col("revenue_cents").desc())
            .rangeBetween(Window.unboundedPreceding, -1)
        )
        w_ties = Window.partitionBy(*partition_cols, "revenue_cents")
        return (
            df.withColumn("best_qty_higher_rev", F.max("qty_cents").over(w_strict))
            .withColumn("best_qty_same_rev", F.max("qty_cents").over(w_ties))
            .filter(
                (
                    F.col("best_qty_higher_rev").isNull()
                    | (F.col("best_qty_higher_rev") < F.col("qty_cents"))
                )
                & (F.col("best_qty_same_rev") == F.col("qty_cents"))
            )
            .drop("best_qty_higher_rev", "best_qty_same_rev")
        )

    # two-level skyline: a hash-bucketed LOCAL pass first (any globally
    # non-dominated row survives its bucket, so the union of bucket
    # skylines is a superset of the answer), then the global single-task
    # window runs over the pruned survivor set only — never over all
    # |suppliers| rows.
    bucketed = agg.withColumn("b", F.pmod(F.xxhash64("l_suppkey"), F.lit(32)))
    survivors = skyline_filter(bucketed, "b").drop("b")
    frontier = skyline_filter(survivors)
    return frontier.select(
        "l_suppkey",
        (F.col("revenue_cents").cast("double") / 100).alias("revenue"),
        (F.col("qty_cents").cast("double") / 100).alias("total_qty"),
    ).orderBy("l_suppkey")


@register(
    "evt_markov_transitions",
    # first-order Markov transition matrix over per-user event-type
    # sequences. Probabilities are ONE double division of two exact
    # integer counts — IEEE-identical cross-engine.
    oracle="""
WITH seq AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS next_type
  FROM events
),
trans AS (
  SELECT event_type AS from_type, next_type AS to_type, COUNT(*) AS n
  FROM seq WHERE next_type IS NOT NULL
  GROUP BY event_type, next_type
),
tot AS (SELECT from_type, SUM(n)::BIGINT AS n_from FROM trans GROUP BY from_type)
SELECT t.from_type, t.to_type, t.n, o.n_from,
       CAST(t.n AS DOUBLE) / o.n_from AS p
FROM trans t JOIN tot o ON o.from_type = t.from_type
ORDER BY t.from_type, t.to_type
""",
    survey_ref="[EXT] sequence analytics (Markov transition matrix)",
    tags=["events", "window", "sequence"],
)
def evt_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of user behavior: for every
    consecutive event pair in a user's timeline, count (from_type →
    to_type) and normalize per from-state. The tie-break on event_id
    makes the sequence — and therefore every count — deterministic.

    100 TB shape: the window sorts per user_id partition (the natural
    event log layout); the transition matrix is |types|^2 rows, so the
    second aggregation and the normalizing join are driver-trivial and
    broadcast."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).filter(F.col("next_type").isNotNull())
    trans = seq.groupBy(
        F.col("event_type").alias("from_type"), F.col("next_type").alias("to_type")
    ).agg(F.count(F.lit(1)).alias("n"))
    tot = trans.groupBy("from_type").agg(F.sum("n").alias("n_from"))
    return (
        trans.join(F.broadcast(tot), "from_type")
        .select(
            "from_type",
            "to_type",
            "n",
            "n_from",
            (F.col("n").cast("double") / F.col("n_from")).alias("p"),
        )
        .orderBy("from_type", "to_type")
    )


@register(
    "evt_skipgram_pairs",
    # skip-gram (center, context) pair extraction with window=2 over
    # per-user sequences — the behavioral-embedding (user2vec-style)
    # training-set generator, aggregated to pair counts per offset.
    oracle="""
WITH seq AS (
  SELECT event_type,
         lead(event_type, 1) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS next1,
         lead(event_type, 2) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS next2
  FROM events
),
pairs AS (
  SELECT event_type AS center, next1 AS context, 1 AS offset_k
  FROM seq WHERE next1 IS NOT NULL
  UNION ALL
  SELECT event_type, next2, 2 FROM seq WHERE next2 IS NOT NULL
)
SELECT center, context, CAST(offset_k AS INT) AS offset_k,
       COUNT(*) AS n_pairs
FROM pairs GROUP BY center, context, offset_k
ORDER BY center, context, offset_k
""",
    survey_ref="[EXT] training-pair generation (skip-gram window extraction)",
    tags=["events", "window", "sequence", "pipeline"],
)
def evt_skipgram_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skip-gram pair extraction (window = 2) from per-user event
    sequences: the classic contrastive-training-data generator for
    behavioral embeddings. Forward-only pairs (the symmetric set adds
    the mirrored pair at train time) aggregated to (center, context,
    offset) counts.

    100 TB shape: ONE window sort per user yields both lead columns
    (Spark collapses same-spec window functions into a single exec);
    the stack/union fan-out is 2 rows per event BEFORE the partial
    aggregation crushes it to |types|^2 x window cells — no raw-pair
    shuffle ever materializes."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        F.lead("event_type", 1).over(w).alias("next1"),
        F.lead("event_type", 2).over(w).alias("next2"),
    )
    pairs = seq.select(
        F.expr(
            "stack(2, event_type, next1, 1, event_type, next2, 2)"
        ).alias("center", "context", "offset_k")
    ).filter(F.col("context").isNotNull())
    return (
        pairs.groupBy("center", "context", F.col("offset_k").cast("int").alias("offset_k"))
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .orderBy("center", "context", "offset_k")
    )


@register(
    "evt_zscore_outliers",
    # exact outlier detection: |x - mean| > 2*stddev evaluated WITHOUT
    # floats via cross-multiplication on integer cents:
    #   (n*x - s)^2 > 4 * (n*ssq - s^2)    [population variance, *n^2]
    # HUGEINT/DECIMAL(38) intermediates keep it exact at any scale.
    oracle="""
WITH cents AS (
  SELECT event_id, event_type,
         CAST(floor(CAST(value AS DOUBLE) * 100.0 + 0.5) AS BIGINT) AS c
  FROM events
),
stats AS (
  SELECT event_type,
         COUNT(*)::HUGEINT AS n,
         SUM(c::HUGEINT) AS s,
         SUM(c::HUGEINT * c::HUGEINT) AS ssq
  FROM cents GROUP BY event_type
)
SELECT c.event_id, c.event_type, c.c AS value_cents
FROM cents c JOIN stats t ON t.event_type = c.event_type
WHERE (t.n * c.c::HUGEINT - t.s) * (t.n * c.c::HUGEINT - t.s)
      > 4 * (t.n * t.ssq - t.s * t.s)
ORDER BY c.event_id
""",
    survey_ref="[EXT] exact z-score outlier flagging (integer cross-multiplication)",
    tags=["events", "agg", "quality"],
)
def evt_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flags events whose value sits more than 2 population standard
    deviations from their type's mean — with ZERO floating point: the
    z-test is cross-multiplied to (n*x - s)^2 > 4*(n*ssq - s^2) on
    integer cents, evaluated in DECIMAL(38,0) (HUGEINT in the oracle),
    so the flag set is bit-deterministic across engines and partition
    orders — the property float stddev aggregation cannot give.

    100 TB shape: stats is |types| rows broadcast back onto the scan;
    the flag is then a scan-time predicate. No second pass, no sort,
    no float summation-order hazard."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.floor(F.col("value").cast("double") * 100.0 + 0.5)
        .cast("long")
        .alias("c"),
    )
    d38 = "decimal(38,0)"
    stats = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast(d38).alias("n"),
        F.sum(F.col("c").cast(d38)).cast(d38).alias("s"),
        F.sum((F.col("c").cast(d38) * F.col("c").cast(d38)).cast(d38))
        .cast(d38)
        .alias("ssq"),
    )
    joined = ev.join(F.broadcast(stats), "event_type")
    lhs_root = (
        F.col("n") * F.col("c").cast(d38) - F.col("s")
    ).cast(d38)
    rhs = (
        F.lit(4).cast(d38)
        * ((F.col("n") * F.col("ssq")).cast(d38) - (F.col("s") * F.col("s")).cast(d38))
    ).cast(d38)
    return (
        joined.filter((lhs_root * lhs_root).cast(d38) > rhs)
        .select("event_id", "event_type", F.col("c").alias("value_cents"))
        .orderBy("event_id")
    )


@register(
    "evt_bottomk_quantile_sketch",
    # mergeable bottom-k sample sketch: the k rows with the smallest
    # content hash are a uniform sample of the stream (and the union of
    # two sketches' bottom-k is the sketch of the union — mergeability
    # for free). Quantiles estimated off the sample, reported next to
    # the exact ones. percentile ≡ quantile_cont (linear interpolation
    # on integer cents) cross-engine.
    oracle="""
WITH cents AS (
  SELECT event_id,
         CAST(floor(CAST(value AS DOUBLE) * 100.0 + 0.5) AS BIGINT) AS c,
         ('0x' || substring(md5(CAST(event_id AS VARCHAR) || 'bk'), 1, 8))::BIGINT
           AS h
  FROM events
),
sk AS (
  SELECT c FROM cents ORDER BY h, event_id LIMIT 256
),
sketch AS (
  SELECT quantile_cont(c, 0.5) AS sketch_p50,
         quantile_cont(c, 0.9) AS sketch_p90,
         COUNT(*) AS k FROM sk
),
exact AS (
  SELECT quantile_cont(c, 0.5) AS exact_p50,
         quantile_cont(c, 0.9) AS exact_p90,
         COUNT(*) AS n FROM cents
)
SELECT s.k, s.sketch_p50, s.sketch_p90, e.n, e.exact_p50, e.exact_p90
FROM sketch s, exact e
""",
    survey_ref="[EXT] bottom-k sample sketch (mergeable uniform sample, quantile estimates)",
    tags=["events", "sketch", "agg"],
)
def evt_bottomk_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bottom-k sketch over the event-value stream: the 256 rows with
    the smallest portable hash form a deterministic uniform sample
    (hash-min order is content-defined, so the same sketch emerges from
    any partitioning, any engine, and merges by union+re-truncate).
    Median and p90 estimated from the sample sit next to the exact
    values so the error is part of the result.

    100 TB shape: the selection compiles to TakeOrderedAndProject
    (per-partition 256-row heaps, O(k) rows to the driver-side merge) —
    the exact quantiles beside it are the expensive full-sort path the
    sketch replaces; at scale you would keep only the sketch branch."""
    from write_optimized_vector_database_spark.functions.hashing import portable_hash

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        F.floor(F.col("value").cast("double") * 100.0 + 0.5)
        .cast("long")
        .alias("c"),
        portable_hash(
            F.concat(F.col("event_id").cast("string"), F.lit("bk"))
        ).alias("h"),
    )
    sk = ev.orderBy("h", "event_id").limit(256)
    sketch = sk.agg(
        F.count(F.lit(1)).alias("k"),
        F.percentile("c", F.lit(0.5)).alias("sketch_p50"),
        F.percentile("c", F.lit(0.9)).alias("sketch_p90"),
    )
    exact = ev.agg(
        F.count(F.lit(1)).alias("n"),
        F.percentile("c", F.lit(0.5)).alias("exact_p50"),
        F.percentile("c", F.lit(0.9)).alias("exact_p90"),
    )
    return sketch.crossJoin(F.broadcast(exact)).select(
        "k", "sketch_p50", "sketch_p90", "n", "exact_p50", "exact_p90"
    )


@register(
    "evt_equidepth_histogram",
    # equi-depth (quantile-bucketed) histogram: boundaries from exact
    # quartiles of integer cents (percentile ≡ quantile_cont), then
    # per-bucket counts/min/max. Boundary comparisons happen on the
    # exact interpolated DOUBLE, identical cross-engine.
    oracle="""
WITH cents AS (
  SELECT event_id,
         CAST(floor(CAST(value AS DOUBLE) * 100.0 + 0.5) AS BIGINT) AS c
  FROM events
),
bounds AS (
  SELECT quantile_cont(c, 0.25) AS q1,
         quantile_cont(c, 0.5) AS q2,
         quantile_cont(c, 0.75) AS q3
  FROM cents
),
bucketed AS (
  SELECT c,
         CASE WHEN c <= b.q1 THEN 0
              WHEN c <= b.q2 THEN 1
              WHEN c <= b.q3 THEN 2
              ELSE 3 END AS bucket
  FROM cents, bounds b
)
SELECT CAST(bucket AS INT) AS bucket, COUNT(*) AS n,
       MIN(c) AS c_min, MAX(c) AS c_max
FROM bucketed GROUP BY bucket ORDER BY bucket
""",
    survey_ref="[EXT] equi-depth histogram (quantile-bounded buckets)",
    tags=["events", "agg", "analytics"],
)
def evt_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth histogram of event values: bucket boundaries are the
    exact quartiles (so each bucket holds ~25% of rows — the optimizer-
    statistics shape), counts and ranges per bucket.

    100 TB shape: one exact-percentile aggregate produces 3 boundary
    scalars broadcast back onto the scan; bucketing is then a scan-time
    CASE with map-side partial counts. (At extreme scale the exact
    percentile swaps for the bottom-k sketch registered alongside.)"""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        F.floor(F.col("value").cast("double") * 100.0 + 0.5)
        .cast("long")
        .alias("c"),
    )
    bounds = ev.agg(
        F.percentile("c", F.lit(0.25)).alias("q1"),
        F.percentile("c", F.lit(0.5)).alias("q2"),
        F.percentile("c", F.lit(0.75)).alias("q3"),
    )
    bucketed = ev.crossJoin(F.broadcast(bounds)).select(
        "c",
        F.when(F.col("c") <= F.col("q1"), 0)
        .when(F.col("c") <= F.col("q2"), 1)
        .when(F.col("c") <= F.col("q3"), 2)
        .otherwise(3)
        .cast("int")
        .alias("bucket"),
    )
    return (
        bucketed.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("c").alias("c_min"),
            F.max("c").alias("c_max"),
        )
        .orderBy("bucket")
    )


@register(
    "evt_association_rules",
    # market-basket association over per-user event-type baskets:
    # support / confidence / lift for every ordered type pair, each a
    # single double division of exact integer counts.
    oracle="""
WITH baskets AS (
  SELECT DISTINCT user_id, event_type FROM events
),
n_users AS (SELECT COUNT(DISTINCT user_id) AS n FROM events),
singles AS (
  SELECT event_type, COUNT(*) AS c FROM baskets GROUP BY event_type
),
pairs AS (
  SELECT a.event_type AS lhs, b.event_type AS rhs, COUNT(*) AS c_both
  FROM baskets a JOIN baskets b
    ON a.user_id = b.user_id AND a.event_type != b.event_type
  GROUP BY a.event_type, b.event_type
)
SELECT p.lhs, p.rhs, p.c_both, sa.c AS c_lhs, sb.c AS c_rhs,
       CAST(p.c_both AS DOUBLE) / u.n AS support,
       CAST(p.c_both AS DOUBLE) / sa.c AS confidence,
       (CAST(p.c_both AS DOUBLE) * u.n) / (CAST(sa.c AS DOUBLE) * sb.c) AS lift
FROM pairs p
JOIN singles sa ON sa.event_type = p.lhs
JOIN singles sb ON sb.event_type = p.rhs
CROSS JOIN n_users u
ORDER BY p.lhs, p.rhs
""",
    survey_ref="[EXT] association rules (support/confidence/lift over user baskets)",
    tags=["events", "analytics"],
)
def evt_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association rules over user behavior: for every ordered pair of
    event types, support (both in a user's basket), confidence
    (P(rhs|lhs)) and lift — all from exact integer basket counts, one
    double division each.

    100 TB shape: baskets collapse the event log to |users| x |types|
    distinct rows first (map-side combine); the self-join then runs on
    baskets, not events, and fans out at most |types|^2 rows per user
    — bounded by the fixed type vocabulary, never by event volume."""
    ev = load_table(spark, sf_dir, "events")
    baskets = ev.select("user_id", "event_type").distinct()
    n_users = ev.agg(F.countDistinct("user_id").alias("n"))
    singles = baskets.groupBy("event_type").agg(F.count(F.lit(1)).alias("c"))
    a = baskets.select("user_id", F.col("event_type").alias("lhs"))
    b = baskets.select("user_id", F.col("event_type").alias("rhs"))
    pairs = (
        a.join(b, "user_id")
        .filter(F.col("lhs") != F.col("rhs"))
        .groupBy("lhs", "rhs")
        .agg(F.count(F.lit(1)).alias("c_both"))
    )
    sa = singles.select(F.col("event_type").alias("lhs"), F.col("c").alias("c_lhs"))
    sb = singles.select(F.col("event_type").alias("rhs"), F.col("c").alias("c_rhs"))
    return (
        pairs.join(F.broadcast(sa), "lhs")
        .join(F.broadcast(sb), "rhs")
        .crossJoin(F.broadcast(n_users))
        .select(
            "lhs",
            "rhs",
            "c_both",
            "c_lhs",
            "c_rhs",
            (F.col("c_both").cast("double") / F.col("n")).alias("support"),
            (F.col("c_both").cast("double") / F.col("c_lhs")).alias("confidence"),
            (
                (F.col("c_both").cast("double") * F.col("n"))
                / (F.col("c_lhs").cast("double") * F.col("c_rhs"))
            ).alias("lift"),
        )
        .orderBy("lhs", "rhs")
    )


@register(
    "rel_integrity_audit",
    # data-quality audit: orphan counts for every FK edge of the star
    # schema plus row totals — the "is this snapshot ingestible"
    # gate a pipeline runs before training. Anti-join per edge.
    oracle="""
SELECT 'lineitem->orders' AS fk_edge,
       (SELECT COUNT(*) FROM lineitem) AS n_rows,
       (SELECT COUNT(*) FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_orderkey = l.l_orderkey)) AS n_orphans
UNION ALL
SELECT 'orders->customer',
       (SELECT COUNT(*) FROM orders),
       (SELECT COUNT(*) FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM customer c
                          WHERE c.c_custkey = o.o_custkey))
UNION ALL
SELECT 'customer->nation',
       (SELECT COUNT(*) FROM customer),
       (SELECT COUNT(*) FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM nation n
                          WHERE n.n_nationkey = c.c_nationkey))
UNION ALL
SELECT 'supplier->nation',
       (SELECT COUNT(*) FROM supplier),
       (SELECT COUNT(*) FROM supplier s
        WHERE NOT EXISTS (SELECT 1 FROM nation n
                          WHERE n.n_nationkey = s.s_nationkey))
UNION ALL
SELECT 'nation->region',
       (SELECT COUNT(*) FROM nation),
       (SELECT COUNT(*) FROM nation na
        WHERE NOT EXISTS (SELECT 1 FROM region r
                          WHERE r.r_regionkey = na.n_regionkey))
ORDER BY fk_edge
""",
    survey_ref="[EXT] referential-integrity audit (pre-ingest data-quality gate)",
    tags=["relational", "quality", "join"],
)
def rel_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit over every FK edge of the schema:
    row totals and orphan counts (rows whose parent key is missing),
    one anti-join per edge. The pre-ingest gate that catches a truncated
    dimension upload before it silently drops fact rows downstream.

    100 TB shape: each edge is one broadcast/SMJ anti-join chosen by
    size; the five edges run as independent subtrees of one plan and
    the output is five rows."""

    def edge(name, child, child_key, parent, parent_key):
        c = load_table(spark, sf_dir, child)
        p = load_table(spark, sf_dir, parent).select(parent_key)
        return (
            c.select(F.col(child_key).alias(parent_key))
            .join(p, parent_key, "anti")
            .agg(F.count(F.lit(1)).alias("n_orphans"))
            .crossJoin(c.agg(F.count(F.lit(1)).alias("n_rows")))
            .select(
                F.lit(name).alias("fk_edge"),
                "n_rows",
                "n_orphans",
            )
        )

    edges = [
        edge("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
        edge("orders->customer", "orders", "o_custkey", "customer", "c_custkey"),
        edge("customer->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
        edge("supplier->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
        edge("nation->region", "nation", "n_regionkey", "region", "r_regionkey"),
    ]
    out = edges[0]
    for e in edges[1:]:
        out = out.unionByName(e)
    return out.orderBy("fk_edge")


@register(
    "rel_shipping_priority",
    # TPC-H Q3 family: unshipped revenue per order for one market
    # segment around a cutoff date, top 10. Revenue in exact DECIMAL;
    # deterministic tiebreak on orderkey.
    oracle="""
WITH j AS (
  SELECT l.l_orderkey,
         SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
             * CAST(1 - l.l_discount AS DECIMAL(18,4))) AS rev,
         o.o_orderdate, o.o_orderpriority
  FROM customer c
  JOIN orders o ON o.o_custkey = c.c_custkey
  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  WHERE c.c_mktsegment = 'BUILDING'
    AND o.o_orderdate < TIMESTAMP '1998-06-01'
    AND l.l_shipdate > TIMESTAMP '1998-06-01'
  GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
)
SELECT l_orderkey, CAST(rev AS DOUBLE) AS revenue,
       o_orderdate, o_orderpriority, rank
FROM (
  SELECT *, row_number() OVER (ORDER BY rev DESC, l_orderkey ASC) AS rank
  FROM j
) WHERE rank <= 10
ORDER BY rank
""",
    survey_ref="§2.4 joins (TPC-H Q3 shipping priority)",
    tags=["relational", "join", "topk"],
)
def rel_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3: revenue still to ship for BUILDING-segment orders
    placed before the cutoff, top 10 by revenue. The segment dimension
    filter broadcasts; the order/lineitem join carries the date
    predicates to both scans (pushdown-gated family); the global top-10
    takes the TakeOrdered path via ranked_top_n."""
    from write_optimized_vector_database_spark.operators.topk import ranked_top_n

    cutoff = "1998-06-01"
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < cutoff
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    rev = (
        F.col("l_extendedprice").cast("decimal(18,4)")
        * (F.lit(1) - F.col("l_discount")).cast("decimal(18,4)")
    )
    j = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(rev).alias("rev"))
    )
    top = ranked_top_n(j, [F.col("rev").desc(), F.col("l_orderkey").asc()], 10)
    return top.select(
        "l_orderkey",
        F.col("rev").cast("double").alias("revenue"),
        "o_orderdate",
        "o_orderpriority",
        F.col("rank").cast("long").alias("rank"),
    ).orderBy("rank")


@register(
    "rel_brand_revenue_rollup",
    # star join on the one fixture dimension no query touched yet:
    # lineitem fact x part dimension (broadcast), brand x type rollup
    # with exact DECIMAL revenue and a distinct-part count.
    oracle="""
SELECT p.p_brand,
       COALESCE(p.p_type, '(all)') AS p_type,
       COUNT(*) AS n_lines,
       COUNT(DISTINCT l.l_partkey) AS n_parts,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
                * CAST(1 - l.l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
GROUP BY ROLLUP (p.p_brand, p.p_type)
HAVING p.p_brand IS NOT NULL
ORDER BY p.p_brand, p_type
""",
    survey_ref="§2.4 joins/rollup (fact x part dimension star join)",
    tags=["relational", "join", "rollup"],
)
def rel_brand_revenue_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brand x type revenue rollup over the part dimension: the star
    join broadcasts the dimension onto the fact scan, and ROLLUP gives
    the per-brand subtotal rows in the same single aggregation pass.

    100 TB shape: dimension broadcast (parts are always tiny vs
    lineitem), map-side partial aggregation on the rollup groups; the
    only wide thing is COUNT(DISTINCT partkey), which Spark expands to
    a two-stage exact distinct on the already-reduced group keys."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    rev = (
        F.col("l_extendedprice").cast("decimal(18,4)")
        * (F.lit(1) - F.col("l_discount")).cast("decimal(18,4)")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .rollup("p_brand", "p_type")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.countDistinct("l_partkey").alias("n_parts"),
            F.sum(rev).cast("double").alias("revenue"),
        )
        .filter(F.col("p_brand").isNotNull())
        .select(
            "p_brand",
            F.coalesce("p_type", F.lit("(all)")).alias("p_type"),
            "n_lines",
            "n_parts",
            "revenue",
        )
        .orderBy("p_brand", "p_type")
    )


@register(
    "rel_window_frame_battery",
    # every frame spec in one query: running (rows unbounded->current),
    # centered (rows 1-1), lookahead (rows 1 following -> 2 following),
    # range-by-value (value cents within +/-500), and whole-partition.
    # All sums in exact cents.
    oracle="""
WITH cents AS (
  SELECT event_id, user_id,
         CAST(floor(CAST(value AS DOUBLE) * 100.0 + 0.5) AS BIGINT) AS c
  FROM events WHERE user_id < 20
)
SELECT event_id, user_id, c,
       (SUM(c) OVER (PARTITION BY user_id ORDER BY event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT AS running,
       (SUM(c) OVER (PARTITION BY user_id ORDER BY event_id
                     ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING))::BIGINT AS centered,
       -- empty tail frame sums to 0, not NULL (a NULL would float64 the
       -- driver's pandas fetch of this integer column)
       COALESCE((SUM(c) OVER (PARTITION BY user_id ORDER BY event_id
                     ROWS BETWEEN 1 FOLLOWING AND 2 FOLLOWING))::BIGINT, 0) AS lookahead,
       (SUM(c) OVER (PARTITION BY user_id ORDER BY c
                     RANGE BETWEEN 500 PRECEDING AND 500 FOLLOWING))::BIGINT AS near_value,
       (SUM(c) OVER (PARTITION BY user_id))::BIGINT AS user_total
FROM cents ORDER BY user_id, event_id
""",
    survey_ref="§2.4 window (frame-spec battery: rows/range/following/partition)",
    tags=["events", "window"],
)
def rel_window_frame_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window frame specifications, exhaustively: running, centered,
    forward-only lookahead, value-range (RANGE +/-500 cents on the
    value ordering), and whole-partition totals — all over one
    per-user sort, all in exact integer cents.

    100 TB shape: Spark computes the four row-frame functions over ONE
    per-user sort; the RANGE frame orders by value (second sort of the
    same partition); nothing leaves its user partition."""
    from pyspark.sql import Window

    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") < 20)
        .select(
            "event_id",
            "user_id",
            F.floor(F.col("value").cast("double") * 100.0 + 0.5)
            .cast("long")
            .alias("c"),
        )
    )
    by_id = Window.partitionBy("user_id").orderBy("event_id")
    by_val = Window.partitionBy("user_id").orderBy("c")
    return ev.select(
        "event_id",
        "user_id",
        "c",
        F.sum("c").over(by_id.rowsBetween(Window.unboundedPreceding, 0)).alias("running"),
        F.sum("c").over(by_id.rowsBetween(-1, 1)).alias("centered"),
        F.coalesce(F.sum("c").over(by_id.rowsBetween(1, 2)), F.lit(0)).alias(
            "lookahead"
        ),
        F.sum("c").over(by_val.rangeBetween(-500, 500)).alias("near_value"),
        F.sum("c").over(Window.partitionBy("user_id")).alias("user_total"),
    ).orderBy("user_id", "event_id")


@register(
    "evt_activity_streaks",
    # gaps-and-islands: longest run of CONSECUTIVE active days per
    # user. The island key is date - row_number() days (constant within
    # a consecutive run) — one distinct, two windows, zero joins.
    oracle="""
WITH days AS (
  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS d
  FROM events
),
islands AS (
  SELECT user_id, d,
         d - CAST(row_number() OVER (PARTITION BY user_id ORDER BY d) AS INT)
           AS island
  FROM days
),
streaks AS (
  SELECT user_id, island, COUNT(*) AS len,
         MIN(d) AS streak_start, MAX(d) AS streak_end
  FROM islands GROUP BY user_id, island
)
SELECT user_id, CAST(len AS BIGINT) AS longest_streak,
       streak_start::TIMESTAMP AS streak_start,
       streak_end::TIMESTAMP AS streak_end
FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id
                               ORDER BY len DESC, streak_start ASC) AS rn
  FROM streaks
) WHERE rn = 1
ORDER BY user_id
""",
    survey_ref="[EXT] gaps-and-islands (longest consecutive-day streak)",
    tags=["events", "window", "analytics"],
)
def evt_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-day activity streak per user via the
    gaps-and-islands identity: within a consecutive run, date minus
    row-number is constant, so runs fall out of one group-by — no
    self-join, no recursion.

    100 TB shape: the distinct (user, day) set is tiny vs the event log
    (map-side combine), and both windows sort only within a user."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    days = ev.select(
        "user_id", F.date_trunc("day", "ts").cast("date").alias("d")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    islands = days.withColumn(
        "island", F.date_sub(F.col("d"), F.row_number().over(w))
    )
    streaks = islands.groupBy("user_id", "island").agg(
        F.count(F.lit(1)).alias("len"),
        F.min("d").alias("streak_start"),
        F.max("d").alias("streak_end"),
    )
    wr = Window.partitionBy("user_id").orderBy(
        F.desc("len"), F.asc("streak_start")
    )
    return (
        streaks.withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("len").cast("long").alias("longest_streak"),
            F.col("streak_start").cast("timestamp").alias("streak_start"),
            F.col("streak_end").cast("timestamp").alias("streak_end"),
        )
        .orderBy("user_id")
    )


@register(
    "rel_median_absolute_deviation",
    # robust spread: MAD = median(|x - median(x)|) per group, both
    # medians exact interpolated quantiles on integer cents
    # (percentile ≡ quantile_cont cross-engine).
    oracle="""
WITH cents AS (
  SELECT event_type,
         CAST(floor(CAST(value AS DOUBLE) * 100.0 + 0.5) AS BIGINT) AS c
  FROM events
),
med AS (
  SELECT event_type, quantile_cont(c, 0.5) AS m FROM cents GROUP BY event_type
),
dev AS (
  SELECT c.event_type, abs(c.c - d.m) AS ad
  FROM cents c JOIN med d ON d.event_type = c.event_type
)
SELECT d.event_type, m.m AS median_cents,
       quantile_cont(d.ad, 0.5) AS mad_cents
FROM dev d JOIN med m ON m.event_type = d.event_type
GROUP BY d.event_type, m.m
ORDER BY d.event_type
""",
    survey_ref="[EXT] robust statistics (median absolute deviation per group)",
    tags=["events", "agg", "quality"],
)
def rel_median_absolute_deviation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAD per event type — the outlier-robust spread measure the
    z-score flagger's sigma is not. Two exact percentile passes: the
    group median broadcasts back onto the scan, absolute deviations
    aggregate to the second median.

    100 TB shape: pass 1 reduces to |types| scalars broadcast; pass 2
    is one more percentile aggregate — no sort of the full table, no
    self-join (the join key is the tiny med table)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.floor(F.col("value").cast("double") * 100.0 + 0.5)
        .cast("long")
        .alias("c"),
    )
    med = ev.groupBy("event_type").agg(F.percentile("c", F.lit(0.5)).alias("m"))
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type", "m", F.abs(F.col("c") - F.col("m")).alias("ad")
    )
    return (
        dev.groupBy("event_type", F.col("m").alias("median_cents"))
        .agg(F.percentile("ad", F.lit(0.5)).alias("mad_cents"))
        .orderBy("event_type")
    )


@register(
    "evt_last_touch_attribution",
    # marketing attribution without a join: one per-user event-time
    # sort where last_value(click_ts IGNORE NULLS) carries the most
    # recent click forward onto every purchase row.
    oracle="""
WITH seq AS (
  SELECT user_id, ts, event_id, event_type,
         CAST(floor(CAST(value AS DOUBLE) * 100.0 + 0.5) AS BIGINT) AS cents,
         last_value(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS last_click_id
  FROM events
)
SELECT event_id AS purchase_id, user_id, cents,
       -- organic purchases (no prior click) carry -1, not NULL: a NULL
       -- in an integer column turns the whole pandas fetch float64 and
       -- breaks the driver's hash gate, so the sentinel IS the contract
       COALESCE(last_click_id, -1) AS last_click_id
FROM seq WHERE event_type = 'purchase'
ORDER BY event_id
""",
    survey_ref="[EXT] last-touch attribution (ignore-nulls window carry)",
    tags=["events", "window", "analytics"],
)
def evt_last_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: every purchase is credited to the user's
    most recent preceding click, carried by last_value(... IGNORE
    NULLS) over one event-time sort — the join-free formulation of the
    clicks-to-purchases attribution that the streaming interval join
    answers with state (purchases with no prior click carry -1: organic).

    100 TB shape: one window sort per user partition, no join, no
    second scan — compare with the stream-stream interval join
    (evt_streaming_interval_join) that computes the bounded-window
    variant online."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    seq = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.floor(F.col("value").cast("double") * 100.0 + 0.5)
        .cast("long")
        .alias("cents"),
    ).withColumn(
        "last_click_id",
        F.last(
            F.when(F.col("event_type") == "click", F.col("event_id")),
            ignorenulls=True,
        ).over(w),
    )
    return (
        seq.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            "cents",
            F.coalesce("last_click_id", F.lit(-1)).alias("last_click_id"),
        )
        .orderBy("purchase_id")
    )


@register(
    "evt_cumulative_distinct_users",
    # running COUNT(DISTINCT) without distinct-state: a user counts on
    # their FIRST day only, so the cumulative distinct curve is the
    # running sum of first-appearances — O(users) state, not O(days x users).
    oracle="""
WITH firsts AS (
  SELECT user_id, MIN(date_trunc('day', ts::TIMESTAMP)) AS first_day
  FROM events GROUP BY user_id
),
per_day AS (
  SELECT first_day AS d, COUNT(*) AS new_users FROM firsts GROUP BY first_day
),
all_days AS (
  SELECT DISTINCT date_trunc('day', ts::TIMESTAMP) AS d FROM events
)
SELECT a.d, COALESCE(p.new_users, 0)::BIGINT AS new_users,
       (SUM(COALESCE(p.new_users, 0))
         OVER (ORDER BY a.d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         )::BIGINT AS cumulative_users
FROM all_days a LEFT JOIN per_day p ON p.d = a.d
ORDER BY a.d
""",
    survey_ref="[EXT] cumulative distinct (first-appearance decomposition)",
    tags=["events", "window", "agg", "analytics"],
)
def evt_cumulative_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily cumulative distinct-user curve via the first-appearance
    decomposition: running COUNT(DISTINCT) over an ever-growing set is
    replaced by min-day per user + a running SUM over |days| rows —
    the exact result at O(users) intermediate state instead of a
    distinct aggregation per day.

    100 TB shape: the per-user min collapses the log map-side; the
    final running sum windows over |days| rows (hundreds), trivially
    single-task by design."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", "ts")
    firsts = ev.groupBy("user_id").agg(F.min(day).alias("first_day"))
    per_day = firsts.groupBy(F.col("first_day").alias("d")).agg(
        F.count(F.lit(1)).alias("new_users")
    )
    all_days = ev.select(day.alias("d")).distinct()
    joined = all_days.join(per_day, "d", "left").select(
        "d", F.coalesce("new_users", F.lit(0)).alias("new_users")
    )
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    return joined.withColumn(
        "cumulative_users", F.sum("new_users").over(w)
    ).orderBy("d")


@register(
    "rel_monthly_revenue_growth",
    # month-over-month revenue growth per nation: exact cents totals,
    # lag window per nation, growth as ONE double division of two
    # exact integers (first months are excluded: no prior month).
    oracle="""
WITH monthly AS (
  SELECT n.n_name,
         date_trunc('month', o.o_orderdate::TIMESTAMP) AS month,
         CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
           AS rev_cents
  FROM orders o
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  GROUP BY n.n_name, date_trunc('month', o.o_orderdate::TIMESTAMP)
),
laged AS (
  SELECT n_name, month, rev_cents,
         lag(rev_cents) OVER (PARTITION BY n_name ORDER BY month) AS prev_cents
  FROM monthly
)
SELECT n_name, month, rev_cents, prev_cents,
       CASE WHEN prev_cents = 0 THEN 0.0
            ELSE CAST(rev_cents - prev_cents AS DOUBLE) / prev_cents END
         AS growth
FROM laged
-- each nation's first month has no prior month: growth is undefined
-- there, and a NULL prev_cents would float64 the pandas fetch, so the
-- row set is restricted to months where growth exists
WHERE prev_cents IS NOT NULL
ORDER BY n_name, month
""",
    survey_ref="§2.4 window (month-over-month growth per dimension)",
    tags=["relational", "window", "analytics"],
)
def rel_monthly_revenue_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue growth per nation — the BI trend query:
    exact integer cents through the dimension joins and the monthly
    rollup, one lag window per nation, growth as a single division of
    two exact integers.

    100 TB shape: dimensions broadcast onto the order scan; the lag
    window runs over |nations| x |months| rows — the fact table never
    sorts."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    monthly = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy(
            "n_name", F.date_trunc("month", "o_orderdate").alias("month")
        )
        .agg(
            (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
            .cast("long")
            .alias("rev_cents")
        )
    )
    w = Window.partitionBy("n_name").orderBy("month")
    laged = monthly.withColumn("prev_cents", F.lag("rev_cents").over(w))
    return (
        laged.filter(F.col("prev_cents").isNotNull())
        .select(
            "n_name",
            "month",
            "rev_cents",
            "prev_cents",
            F.when(F.col("prev_cents") == 0, F.lit(0.0))
            .otherwise(
                (F.col("rev_cents") - F.col("prev_cents")).cast("double")
                / F.col("prev_cents")
            )
            .alias("growth"),
        )
        .orderBy("n_name", "month")
    )


@register(
    "evt_time_to_convert",
    # conversion-latency distribution: per first-view cohort week, the
    # exact interpolated percentiles of view->purchase latency in whole
    # seconds. Latencies are exact integers (epoch-us difference // 1e6)
    # so quantile interpolation is deterministic cross-engine.
    oracle="""
WITH firsts AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'view' THEN ts::TIMESTAMP END) AS t_view
  FROM events GROUP BY user_id
),
conv AS (
  SELECT f.user_id, f.t_view, MIN(e.ts::TIMESTAMP) AS t_purchase
  FROM firsts f
  JOIN events e ON e.user_id = f.user_id
   AND e.event_type = 'purchase' AND e.ts::TIMESTAMP > f.t_view
  WHERE f.t_view IS NOT NULL
  GROUP BY f.user_id, f.t_view
),
lat AS (
  SELECT date_trunc('week', t_view) AS cohort_week,
         (epoch_us(t_purchase) - epoch_us(t_view)) // 1000000 AS secs
  FROM conv
)
SELECT cohort_week,
       COUNT(*) AS n_converted,
       quantile_cont(secs, 0.25) AS p25_secs,
       quantile_cont(secs, 0.5) AS p50_secs,
       quantile_cont(secs, 0.9) AS p90_secs,
       MAX(secs) AS max_secs
FROM lat GROUP BY cohort_week ORDER BY cohort_week
""",
    survey_ref="[EXT] conversion-latency distribution (funnel timing percentiles)",
    tags=["events", "agg", "analytics", "funnel"],
)
def evt_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert report: for each user's FIRST view, the latency
    to their first subsequent purchase, aggregated per first-view
    cohort week as exact interpolated percentiles — the funnel-timing
    companion to the step-count funnel (evt_session_funnel). Integer
    seconds make the quantile interpolation bit-deterministic.

    100 TB shape: the per-user min collapses the log map-side; the
    conversion join is an equality join on user_id against that small
    per-user frame; percentiles aggregate |cohorts| groups."""
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view")
    ).filter(F.col("t_view").isNotNull())
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("p_ts")
    )
    conv = (
        firsts.join(purchases, "user_id")
        .filter(F.col("p_ts") > F.col("t_view"))
        .groupBy("user_id", "t_view")
        .agg(F.min("p_ts").alias("t_purchase"))
    )
    lat = conv.select(
        F.date_trunc("week", "t_view").alias("cohort_week"),
        (
            (F.unix_micros("t_purchase") - F.unix_micros("t_view"))
            / F.lit(1_000_000)
        )
        .cast("long")
        .alias("secs"),
    )
    return (
        lat.groupBy("cohort_week")
        .agg(
            F.count(F.lit(1)).alias("n_converted"),
            F.percentile("secs", F.lit(0.25)).alias("p25_secs"),
            F.percentile("secs", F.lit(0.5)).alias("p50_secs"),
            F.percentile("secs", F.lit(0.9)).alias("p90_secs"),
            F.max("secs").alias("max_secs"),
        )
        .orderBy("cohort_week")
    )
