"""Per-key trend fitting: closed-form least-squares regression of
event value on time, one aggregate per key — the scalable ML primitive
behind drift dashboards and per-entity forecasting (MLlib fits one
global model; a 10^9-user table wants one tiny model PER KEY, which is
an aggregation problem, not an iterative one).

slope = (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2) from four running sums — ONE
groupBy(user_id) with map-side partial combine, no iteration, no
per-key collect. Cross-engine exactness is engineered: x is epoch
seconds rebased to 2024-01-01 (keeps x^2 sums inside BIGINT) and y is
value in integer cents (round(value*100) — the same double rounds the
same way in both engines), so every sum is EXACT integer arithmetic
and the only floats are two final correctly-rounded divisions. The
usual caveat — float sums across fold orders — never arises.

Output: per-user slope in cents/day, intercept at the rebase epoch,
and n; keys with a single observation (or zero x-variance) yield null
slope on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import load_tables

_REBASE = 1704067200  # 2024-01-01T00:00:00Z
_EPOCH = "timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"


def value_trends(events: DataFrame) -> DataFrame:
    pts = events.select(
        "user_id",
        (F.expr(_EPOCH).cast("long") - _REBASE).alias("x"),
        F.round(F.col("value") * 100).cast("long").alias("y"),
    )
    g = pts.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    denom = g["n"] * g["sxx"] - g["sx"] * g["sx"]
    slope = (g["n"] * g["sxy"] - g["sx"] * g["sy"]) / denom  # cents per second
    intercept = (g["sy"] - slope * g["sx"]) / g["n"]
    return g.select(
        "user_id",
        "n",
        F.when(denom > 0, F.round(slope * 86400, 6)).alias("slope_cents_per_day"),
        F.when(denom > 0, F.round(intercept, 6)).alias("intercept_cents"),
    )


def user_value_trends(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = load_tables(spark, sf_dir, "events")
    return value_trends(events)


ORACLE_TRENDS = f"""
WITH pts AS (
  SELECT user_id,
         floor(epoch(ts))::BIGINT - {_REBASE} AS x,
         round(value * 100)::BIGINT AS y
  FROM events
),
g AS (
  SELECT user_id, count(*)::BIGINT AS n,
         sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy,
         sum(x * y)::BIGINT AS sxy, sum(x * x)::BIGINT AS sxx
  FROM pts GROUP BY user_id
)
SELECT user_id, n,
  CASE WHEN n * sxx - sx * sx > 0 THEN
    round((n * sxy - sx * sy)::DOUBLE / (n * sxx - sx * sx) * 86400, 6)
  END AS slope_cents_per_day,
  CASE WHEN n * sxx - sx * sx > 0 THEN
    round((sy - (n * sxy - sx * sy)::DOUBLE / (n * sxx - sx * sx) * sx) / n, 6)
  END AS intercept_cents
FROM g
"""


QUERIES = {"user_value_trends": user_value_trends}
ORACLES = {"user_value_trends": ORACLE_TRENDS}
