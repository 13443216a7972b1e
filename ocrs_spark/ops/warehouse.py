"""Warehouse reporting shapes the rest of the contract doesn't cover:

- ``sales_rollup``: GROUP BY ROLLUP — the multi-level subtotal report
  (nation x order-priority, nation, grand total) in ONE pass. Spark
  plans rollup/cube/grouping-sets as an Expand node (each input row
  replicated once per grouping set, here 3x) feeding a single hash
  aggregate, so partial (map-side) aggregation still applies and the
  job pays exactly one shuffle of pre-aggregated rows — at 100 TB this
  beats the naive three-queries-plus-union by 3x on scan cost and
  keeps subtotals consistent within a single snapshot. grouping()
  flags are emitted per column (not grouping_id()) because Spark and
  DuckDB disagree on the bit packing of the combined id.
- ``cohort_retention``: the classic weekly-cohort retention triangle.
  Cohort = epoch-anchored week of a user's FIRST event; each
  (cohort_week, week_offset) cell counts distinct users active that
  many weeks later. first-event table and the join back to the stream
  both hash on user_id, so the two shuffles share one exchange; the
  distinct-count agg then shuffles the tiny (cohort, offset, user)
  projection. Epoch-anchored integer weeks (es // 604800) keep both
  engines exact — no locale/ISO week rules.
- ``event_transitions``: first-order Markov transition matrix over
  each user's event sequence — lead() over (user_id ORDER BY ts,
  event_id) pairs every event with its successor, then one count
  aggregate per (src, dst) and a per-src normalization. The window
  sort shuffles on user_id once; the transition matrix itself is
  |event_types|^2 rows, driver-sized. The deterministic (ts, event_id)
  tiebreak makes the sequence — and the oracle — reproducible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import load_tables
from .relational import ntz_epoch_seconds

WEEK_S = 7 * 24 * 3600


def rollup_over(
    orders: DataFrame, customer: DataFrame, nation: DataFrame
) -> DataFrame:
    joined = (
        orders.select("o_custkey", "o_orderpriority", "o_totalprice")
        .join(
            customer.select("c_custkey", "c_nationkey"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
    )
    return (
        joined.rollup("n_name", "o_orderpriority")
        .agg(
            F.grouping("n_name").cast("int").alias("g_nation"),
            F.grouping("o_orderpriority").cast("int").alias("g_priority"),
            F.count("*").cast("long").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
        .select(
            F.coalesce("n_name", F.lit("ALL")).alias("nation"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "g_nation",
            "g_priority",
            "n_orders",
            "total_price",
        )
    )


def sales_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders, customer, nation = load_tables(
        spark, sf_dir, "orders", "customer", "nation"
    )
    return rollup_over(orders, customer, nation)


ORACLE_SALES_ROLLUP = """
SELECT coalesce(n_name, 'ALL') AS nation,
       coalesce(o_orderpriority, 'ALL') AS priority,
       GROUPING(n_name)::INT AS g_nation,
       GROUPING(o_orderpriority)::INT AS g_priority,
       count(*)::BIGINT AS n_orders,
       round(sum(o_totalprice), 2) AS total_price
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY ROLLUP(n_name, o_orderpriority)
"""


def retention_over(events: DataFrame) -> DataFrame:
    ev = events.select(
        "user_id",
        (ntz_epoch_seconds("ts").cast("long") / WEEK_S)
        .cast("long")
        .alias("week"),
    )
    first = ev.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        ev.join(first, "user_id")
        .groupBy(
            "cohort_week",
            (F.col("week") - F.col("cohort_week")).alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").cast("long").alias("active_users"))
    )


def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = load_tables(spark, sf_dir, "events")
    return retention_over(events)


ORACLE_COHORT_RETENTION = f"""
WITH ev AS (
  SELECT user_id, (floor(epoch(ts))::BIGINT // {WEEK_S}) AS week FROM events
),
first AS (
  SELECT user_id, min(week) AS cohort_week FROM ev GROUP BY user_id
)
SELECT cohort_week,
       week - cohort_week AS week_offset,
       count(DISTINCT ev.user_id)::BIGINT AS active_users
FROM ev JOIN first ON ev.user_id = first.user_id
GROUP BY 1, 2
"""


def transitions_over(events: DataFrame) -> DataFrame:
    seq = Window.partitionBy("user_id").orderBy(
        ntz_epoch_seconds("ts").cast("long"), "event_id"
    )
    pairs = (
        events.select("user_id", "event_id", "event_type", "ts")
        .withColumn("next_type", F.lead("event_type").over(seq))
        .filter(F.col("next_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("src"), F.col("next_type").alias("dst")
        )
        .agg(F.count("*").cast("long").alias("n"))
    )
    per_src = Window.partitionBy("src")
    return pairs.withColumn(
        "p", F.round(F.col("n") / F.sum("n").over(per_src), 4)
    )


def event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = load_tables(spark, sf_dir, "events")
    return transitions_over(events)


ORACLE_EVENT_TRANSITIONS = """
WITH seq AS (
  SELECT event_type AS src,
         lead(event_type) OVER (
           PARTITION BY user_id ORDER BY floor(epoch(ts))::BIGINT, event_id
         ) AS dst
  FROM events
),
pairs AS (
  SELECT src, dst, count(*)::BIGINT AS n
  FROM seq WHERE dst IS NOT NULL GROUP BY src, dst
)
SELECT src, dst, n,
       round(n::DOUBLE / sum(n) OVER (PARTITION BY src), 4) AS p
FROM pairs
"""


QUERIES = {
    "sales_rollup": sales_rollup,
    "cohort_retention": cohort_retention,
    "event_transitions": event_transitions,
}

ORACLES = {
    "sales_rollup": ORACLE_SALES_ROLLUP,
    "cohort_retention": ORACLE_COHORT_RETENTION,
    "event_transitions": ORACLE_EVENT_TRANSITIONS,
}
