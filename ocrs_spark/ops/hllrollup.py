"""Mergeable HLL sketch rollups — the summary-table pattern for
distinct counts at 100 TB.

Exact ``count(DISTINCT user)`` per day needs a full shuffle of the base
table every time anyone asks; the production pattern is a SUMMARY TABLE
holding one DataSketches HLL binary per day (``hll_sketch_agg``,
map-side combinable like any partial aggregate). Any distinct-count
question over any day range is then answered from the summary alone:
``hll_union_agg`` merges the per-day registers (order-insensitive
max-per-register) and ``hll_sketch_estimate`` reads the estimate — the
base table is never rescanned, and appending a new day is a one-day
sketch union, which is what makes the rollup incrementally maintainable.

Driver row: per-day exact distinct users (DuckDB-oracled) PLUS a
``hll_within_bound`` flag asserting the sketch estimate for that day is
within ±5% of the exact value (lgConfigK=12 → RSE 1.04/√2¹² ≈ 1.6%, so
5% is >3σ). The oracle emits literal TRUE — the driver's value hash
therefore fails if the sketch path ever drifts out of tolerance.

Merge semantics that can't be SQL-oracled (union-vs-global equivalence,
incremental append) are pinned in tests/test_hllrollup.py.
"""

from __future__ import annotations

from pyspark.sql import functions as F

LG_K = 12
REL_TOL = 0.05  # > 3x the lgK=12 relative standard error


def _daily(spark, sf_dir: str):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    # ntz wall time -> zoned under the session's pinned UTC tz; day as
    # epoch bigint so both engines hash identically (see ops.relational)
    ts = F.col("ts").cast("timestamp")
    return ev.select(
        F.unix_timestamp(F.date_trunc("day", ts)).alias("day_epoch"),
        "user_id",
    )


def daily_sketch_summary(spark, sf_dir: str):
    """The summary table: one HLL binary per day. At scale this is the
    materialized artifact (tiny: 2^lgK registers per day) every
    distinct-count query reads instead of the base table."""
    return (
        _daily(spark, sf_dir)
        .groupBy("day_epoch")
        .agg(F.hll_sketch_agg("user_id", F.lit(LG_K)).alias("sketch"))
    )


def daily_distinct_users(spark, sf_dir: str):
    """(day_epoch, n_users, hll_within_bound): exact daily distinct
    users, plus the sketch-vs-exact tolerance flag the oracle pins to
    TRUE."""
    daily = _daily(spark, sf_dir)
    agg = daily.groupBy("day_epoch").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.hll_sketch_estimate(
            F.hll_sketch_agg("user_id", F.lit(LG_K))
        ).alias("est"),
    )
    return agg.select(
        "day_epoch",
        "n_users",
        (
            F.abs(F.col("est") - F.col("n_users"))
            <= F.col("n_users") * REL_TOL
        ).alias("hll_within_bound"),
    )


ORACLE_DAILY_DISTINCT = """
SELECT CAST(epoch(date_trunc('day', ts)) AS BIGINT) AS day_epoch,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       TRUE AS hll_within_bound
FROM events
GROUP BY 1
"""

QUERIES = {"daily_distinct_users": daily_distinct_users}
ORACLES = {"daily_distinct_users": ORACLE_DAILY_DISTINCT}
