"""Relational operator coverage over the TPC-H-ish tables + events.

Demonstrates the general DataFrame surface (scan/filter/project/aggregate/
broadcast join/window/sessionize/top-n) with DuckDB oracles — the glue
operators every pipeline above composes with.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from search_engine_spark.pipelines.common import load

SESSION_GAP_SEC = 1800


def rel_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary (filter → hash agg)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 6).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 6).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.count("*").cast("long").alias("count_order"),
        )
    )


SQL_REL_PRICING_SUMMARY = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 6) AS sum_qty,
       round(sum(l_extendedprice), 6) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 6) AS sum_disc_price,
       round(avg(l_quantity), 6) AS avg_qty,
       count(*)::BIGINT AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def rel_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer ⋈ orders ⋈ nation (broadcast dims) → top spenders."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    nation = load(spark, sf_dir, "nation")
    agg = (
        orders.join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(F.sum("o_totalprice"), 6).alias("total_spent"),
            F.count("*").cast("long").alias("n_orders"),
        )
    )
    # Global top-20 via orderBy().limit() → TakeOrderedAndProject (per-task
    # local top-20 + tiny driver merge), NOT an unpartitioned Window, which
    # would funnel every aggregated customer row through one task. The rank
    # column is then derived on the 20-row result, where a single-partition
    # window is free (asserted in tests/test_plans.py).
    top = agg.orderBy(F.desc("total_spent"), F.asc("c_custkey")).limit(20)
    w = Window.orderBy(F.desc("total_spent"), F.asc("c_custkey"))
    return (
        top.withColumn("rank", F.row_number().over(w))
        .select("rank", "c_custkey", "c_name", "n_name", "total_spent", "n_orders")
    )


SQL_REL_TOP_CUSTOMERS = """
WITH agg AS (
  SELECT c_custkey, c_name, n_name,
         round(sum(o_totalprice), 6) AS total_spent,
         count(*)::BIGINT AS n_orders
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  GROUP BY c_custkey, c_name, n_name
)
SELECT row_number() OVER (ORDER BY total_spent DESC, c_custkey ASC)::INT AS rank,
       c_custkey, c_name, n_name, total_spent, n_orders
FROM agg
ORDER BY rank
LIMIT 20
"""


def rel_event_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windowed aggregation over the events stream table."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.withColumn(
            "hour_bucket", F.floor(F.unix_timestamp("ts") / 3600).cast("long")
        )
        .groupBy("hour_bucket", "event_type")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
            F.count(F.lit(1)).cast("long").alias("rows"),
        )
    )


SQL_REL_EVENT_WINDOWS = """
SELECT floor(epoch(ts) / 3600)::BIGINT AS hour_bucket, event_type,
       count(*)::BIGINT AS n_events,
       round(sum(value), 6) AS sum_value,
       count(*)::BIGINT AS rows
FROM events
GROUP BY 1, 2
"""


def rel_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: gap > 30 min starts a new session (lag + running sum)."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    with_gap = ev.withColumn(
        "new_session",
        F.when(
            (F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w)))
            > SESSION_GAP_SEC,
            1,
        )
        .otherwise(0)
        + F.when(F.lag("ts").over(w).isNull(), 1).otherwise(0),
    )
    return with_gap.groupBy("user_id").agg(
        F.sum("new_session").cast("long").alias("n_sessions"),
        F.count("*").cast("long").alias("n_events"),
    )


SQL_REL_SESSIONIZE = f"""
WITH g AS (
  SELECT user_id,
         CASE WHEN lag(ts) OVER w IS NULL THEN 1
              WHEN epoch(ts) - epoch(lag(ts) OVER w) > {SESSION_GAP_SEC} THEN 1
              ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id, sum(new_session)::BIGINT AS n_sessions,
       count(*)::BIGINT AS n_events
FROM g GROUP BY user_id
"""


def rel_sessionize_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization via Spark's native ``session_window`` — the
    state-store-ready formulation (the identical groupBy works under
    Structured Streaming with watermarked session state, which the
    lag+running-sum window formulation cannot).

    Boundary semantics: a session window spans [first_ts, last_ts + gap),
    so an event exactly ``gap`` after its predecessor starts a NEW
    session — i.e. new-session-iff ``gap_sec >= SESSION_GAP_SEC``, one
    tick stricter than ``rel_sessionize``'s ``>``. The DuckDB oracle
    mirrors that (>=). The driver fixture has no exact-gap event pairs
    (verified at sf 0.001/0.01/0.1), so both formulations agree on it —
    pinned by tests/test_plans.py::test_sessionize_native_matches_lag_sum.
    Both are kept as gate entries: same answers, different plans (two
    aggregations over session windows here vs a window function + one
    aggregation there).
    """
    ev = load(spark, sf_dir, "events")
    per_session = (
        ev.groupBy(
            "user_id",
            F.session_window("ts", f"{SESSION_GAP_SEC} seconds"),
        )
        .agg(F.count("*").alias("n"))
    )
    return per_session.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n_sessions"),
        F.sum("n").cast("long").alias("n_events"),
    )


SQL_REL_SESSIONIZE_NATIVE = f"""
WITH g AS (
  SELECT user_id,
         CASE WHEN lag(ts) OVER w IS NULL THEN 1
              WHEN epoch(ts) - epoch(lag(ts) OVER w) >= {SESSION_GAP_SEC}
                THEN 1
              ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id, sum(new_session)::BIGINT AS n_sessions,
       count(*)::BIGINT AS n_events
FROM g GROUP BY user_id
"""


def rel_distinct_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set ops: distinct keys of two relations unioned then counted."""
    orders = load(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("key"), F.lit("orders").alias("src")
    )
    cust = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("key"), F.lit("customer").alias("src")
    )
    return (
        orders.unionAll(cust)
        .groupBy("key")
        .agg(
            F.count("*").cast("long").alias("appearances"),
            F.countDistinct("src").cast("long").alias("n_sources"),
        )
    )


SQL_REL_DISTINCT_UNION = """
SELECT key, count(*)::BIGINT AS appearances,
       count(DISTINCT src)::BIGINT AS n_sources
FROM (
  SELECT o_custkey AS key, 'orders' AS src FROM orders
  UNION ALL
  SELECT c_custkey AS key, 'customer' AS src FROM customer
)
GROUP BY key
"""
