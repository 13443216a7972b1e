"""CUSUM changepoint detection over the daily event-volume series —
the corpus-monitoring alarm that catches a LEVEL SHIFT (a source
turning off, a crawler loop, a template flood arriving) that drift's
per-snapshot PSI gate and trending's window-over-window movers both
miss when the shift unfolds gradually.

Exactness: the textbook CUSUM is the recurrence
``S_t = max(0, S_{t-1} + dev_t)`` — sequential state, unexpressible as
a plain window. But it has the max-drawdown CLOSED FORM

    S_t = C_t - min(0, min_{j<=t} C_j),   C_t = sum_{j<=t} dev_j

so two running windows (sum + min) over the DAY table compute it
exactly; every quantity is integer milli (dev in milli-events around
the integer-milli mean, threshold = K_MAD x integer mean absolute
deviation), so the DuckDB oracle matches bit-for-bit.

Non-vacuity: the monitored series plants a documented x2 level shift
on days >= PLANT_FROM_DAY (multiplicative, so the alarm fires at
every SF — an additive step would drown as daily counts grow).

Scale: corpus-scale work is ONE groupBy(day); every window runs over
the bounded calendar-day table (tens of thousands of rows at worst),
the same small-table-window shape as alloc/compaction. No join, no
corpus-wide window.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from . import load_tables
from .relational import ntz_epoch_seconds

DAY_S = 24 * 3600
# Day index (epoch days) where the planted x2 level shift begins:
# 2024-01-21 — the last 10 of the corpus's 30 days.
PLANT_FROM_DAY = 19743
PLANT_FACTOR = 2
K_MAD = 4  # alarm threshold = K_MAD x mean absolute deviation


def cusum_changepoint(spark, sf_dir: str):
    """(day, n_events, monitored, dev_milli, cusum_milli, alarm) per
    day, ordered arbitrarily (the driver canonicalizes); alarm is
    TRUE where the CUSUM statistic exceeds K_MAD x MAD."""
    (events,) = load_tables(spark, sf_dir, "events")
    daily = (
        events.select(
            (ntz_epoch_seconds("ts").cast("long") / DAY_S)
            .cast("long")
            .alias("day")
        )
        .groupBy("day")
        .agg(F.count("*").cast("long").alias("n_events"))
        .withColumn(
            "monitored",
            F.when(
                F.col("day") >= PLANT_FROM_DAY,
                F.col("n_events") * PLANT_FACTOR,
            )
            .otherwise(F.col("n_events"))
            .cast("long"),
        )
    )
    # Global aggregates over the bounded day table.
    stats = daily.agg(
        F.count("*").cast("long").alias("n_days"),
        F.sum("monitored").cast("long").alias("total"),
    )
    with_mean = daily.crossJoin(F.broadcast(stats)).select(
        "day",
        "n_events",
        "monitored",
        F.expr("1000 * monitored - (1000 * total) div n_days")
        .cast("long")
        .alias("dev_milli"),
    )
    mad = with_mean.agg(
        F.expr("sum(abs(dev_milli)) div count(*)")
        .cast("long")
        .alias("mad_milli")
    )
    w_run = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    csum = with_mean.select(
        "day",
        "n_events",
        "monitored",
        "dev_milli",
        F.sum("dev_milli").over(w_run).cast("long").alias("c"),
    )
    cum = csum.withColumn(
        "c_min", F.min("c").over(w_run).cast("long")
    )
    return cum.crossJoin(F.broadcast(mad)).select(
        "day",
        "n_events",
        "monitored",
        "dev_milli",
        F.expr("c - least(0L, c_min)").cast("long").alias("cusum_milli"),
        (
            F.expr("c - least(0L, c_min)") > K_MAD * F.col("mad_milli")
        ).alias("alarm"),
    )


ORACLE_CUSUM = f"""
WITH daily AS (
  SELECT (floor(epoch(ts))::BIGINT // {DAY_S}) AS day,
         count(*)::BIGINT AS n_events
  FROM events GROUP BY 1
),
mon AS (
  SELECT day, n_events,
         (CASE WHEN day >= {PLANT_FROM_DAY}
               THEN n_events * {PLANT_FACTOR} ELSE n_events END)::BIGINT
           AS monitored
  FROM daily
),
dev AS (
  SELECT day, n_events, monitored,
         (1000 * monitored
          - (1000 * (SELECT sum(monitored) FROM mon))
            // (SELECT count(*) FROM mon))::BIGINT AS dev_milli
  FROM mon
),
mad AS (
  SELECT (sum(abs(dev_milli)) // count(*))::BIGINT AS mad_milli FROM dev
),
csum AS (
  SELECT day, n_events, monitored, dev_milli,
         sum(dev_milli) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
           ::BIGINT AS c
  FROM dev
),
run AS (
  SELECT day, n_events, monitored, dev_milli, c,
         min(c) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
           ::BIGINT AS c_min
  FROM csum
)
SELECT day, n_events, monitored, dev_milli,
       (c - least(0, c_min))::BIGINT AS cusum_milli,
       (c - least(0, c_min)) > {K_MAD} * (SELECT mad_milli FROM mad)
         AS alarm
FROM run
"""


QUERIES = {"cusum_changepoint": cusum_changepoint}
ORACLES = {"cusum_changepoint": ORACLE_CUSUM}
