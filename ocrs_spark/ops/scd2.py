"""SCD2 dimension history build: collapse an observation stream into
type-2 slowly-changing-dimension rows (valid_from / valid_to /
is_current) — the warehouse primitive behind every "what was this
user's segment AT THE TIME of the event" join, and the one classic
dimensional operator this library still lacked (ivm.py maintains
aggregates, temporal.py consumes validity intervals via as-of joins;
this op PRODUCES those intervals from raw observations).

Semantics: per user, order observations totally by (ts, event_id) —
the event_id tiebreak makes reruns and engine choice irrelevant even
with same-timestamp observations — keep a row iff it is the user's
first observation or its tracked attribute differs from the previous
observation (lag), then close each kept version with the next kept
version's start (lead). The current version has valid_to NULL.

Scale shape: two windows, both partitioned by user_id — per-key
history scans, embarrassingly parallel across 10^9 users; partition
width is one USER'S observation count, so there is no global sort and
no single-task window anywhere (the skew-advisor op quantifies when a
bot-grade key would need pre-salting). Change detection drops the
unchanged tail BEFORE the second window, so the lead() pass runs over
versions, not observations — on real dimensions that is orders of
magnitude smaller.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from . import load_tables


def scd2_over(events: DataFrame) -> DataFrame:
    """(user_id, event_type, valid_from, valid_to, is_current)."""
    obs = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changed = (
        events.select("user_id", "event_type", "ts", "event_id")
        .withColumn("prev_type", F.lag("event_type").over(obs))
        .filter(
            F.col("prev_type").isNull()
            | (F.col("event_type") != F.col("prev_type"))
        )
    )
    ver = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return changed.select(
        "user_id",
        "event_type",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(ver).alias("valid_to"),
        F.lead("ts").over(ver).isNull().alias("is_current"),
    )


def scd2_user_type_history(spark, sf_dir):
    (events,) = load_tables(spark, sf_dir, "events")
    return scd2_over(events)


ORACLE_SCD2 = """
WITH obs AS (
  SELECT user_id, event_type, ts, event_id,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type
  FROM events
),
changed AS (
  SELECT user_id, event_type, ts, event_id FROM obs
  WHERE prev_type IS NULL OR event_type <> prev_type
)
SELECT user_id, event_type,
       ts AS valid_from,
       lead(ts) OVER (PARTITION BY user_id
                      ORDER BY ts, event_id) AS valid_to,
       lead(ts) OVER (PARTITION BY user_id
                      ORDER BY ts, event_id) IS NULL AS is_current
FROM changed
"""

QUERIES = {"scd2_user_type_history": scd2_user_type_history}
ORACLES = {"scd2_user_type_history": ORACLE_SCD2}
