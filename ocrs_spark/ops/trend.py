"""Per-key trend fitting: closed-form least-squares regression of
event value on time, one aggregate per key — the scalable ML primitive
behind drift dashboards and per-entity forecasting (MLlib fits one
global model; a 10^9-user table wants one tiny model PER KEY, which is
an aggregation problem, not an iterative one).

slope = (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2) from four running sums — ONE
extra same-key aggregate (the per-user min timestamp) plus ONE groupBy
with map-side partial combine, no iteration, no per-key collect.
Cross-engine exactness AND overflow-safety are engineered together:

- x is epoch seconds rebased to the USER'S OWN first event (a same-key
  min + co-partitioned join), so |x| is bounded by the key's activity
  span, not the calendar — a fixed-epoch rebase left x^2 sums one
  power-user away from wrapping int64 silently in Spark while DuckDB's
  BIGINT cast errored, a parity break;
- y is value in integer cents (round(value*100) — the same double
  rounds the same way in both engines);
- per-row products are computed in DECIMAL(38,0) (Spark) / HUGEINT
  (DuckDB) — both exact 128-bit integer arithmetic, good to ~1e38, so
  sums and the n*Sxx cross-products never wrap for any realistic key
  (bound: n * span_s^2 < 1e38 — a 10^9-event user over a decade is
  ~1e26);
- both engines divide the SAME two exact integers after an explicit
  cast to double, the only floating step.

Output: per-user slope in cents/day, the intercept in cents AT THE
USER'S FIRST EVENT (the rebase origin), and n; keys with a single
observation (or zero x-variance) yield null slope on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import load_tables
from .relational import ntz_epoch_seconds

_DEC = "decimal(38,0)"


def value_trends(events: DataFrame) -> DataFrame:
    pts = events.select(
        "user_id",
        ntz_epoch_seconds("ts").cast("long").alias("es"),
        F.round(F.col("value") * 100).cast("long").alias("y"),
    )
    x0 = pts.groupBy("user_id").agg(F.min("es").alias("x0"))
    rebased = pts.join(x0, "user_id").select(
        "user_id", (F.col("es") - F.col("x0")).alias("x"), "y"
    )
    xd = F.col("x").cast(_DEC)
    g = rebased.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(xd).alias("sx"),
        F.sum(F.col("y").cast(_DEC)).alias("sy"),
        F.sum(xd * F.col("y")).alias("sxy"),
        F.sum(xd * F.col("x")).alias("sxx"),
    )
    nd = g["n"].cast(_DEC)
    num = nd * g["sxy"] - g["sx"] * g["sy"]
    den = nd * g["sxx"] - g["sx"] * g["sx"]
    slope = num.cast("double") / den.cast("double")  # cents per second
    intercept = (g["sy"].cast("double") - slope * g["sx"].cast("double")) / g["n"]
    return g.select(
        "user_id",
        "n",
        F.when(den > 0, F.round(slope * 86400, 6)).alias("slope_cents_per_day"),
        F.when(den > 0, F.round(intercept, 6)).alias("intercept_cents"),
    )


def user_value_trends(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = load_tables(spark, sf_dir, "events")
    return value_trends(events)


ORACLE_TRENDS = """
WITH pts AS (
  SELECT user_id,
         floor(epoch(ts))::BIGINT AS es,
         round(value * 100)::BIGINT AS y
  FROM events
),
rebased AS (
  SELECT user_id,
         es - min(es) OVER (PARTITION BY user_id) AS x,
         y
  FROM pts
),
g AS (
  SELECT user_id, count(*)::BIGINT AS n,
         sum(x) AS sx, sum(y) AS sy,
         sum(x * y) AS sxy, sum(x * x) AS sxx
  FROM rebased GROUP BY user_id
)
SELECT user_id, n,
  CASE WHEN n * sxx - sx * sx > 0 THEN
    round((n * sxy - sx * sy)::DOUBLE / (n * sxx - sx * sx)::DOUBLE * 86400, 6)
  END AS slope_cents_per_day,
  CASE WHEN n * sxx - sx * sx > 0 THEN
    round((sy::DOUBLE
           - (n * sxy - sx * sy)::DOUBLE / (n * sxx - sx * sx)::DOUBLE
             * sx::DOUBLE) / n, 6)
  END AS intercept_cents
FROM g
"""


QUERIES = {"user_value_trends": user_value_trends}
ORACLES = {"user_value_trends": ORACLE_TRENDS}
