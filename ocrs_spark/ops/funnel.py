"""Ordered-funnel analytics over the event stream: how many users
complete view -> click -> purchase IN ORDER, each step within a
bounded window of the previous — a sequential pattern Spark has no
native operator for (Trino/Flink expose SQL MATCH_RECOGNIZE; warehouse
funnel queries are its most common use).

Semantics are GREEDY FIRST-TOUCH, the convention funnel products
(GA/Amplitude-style) report: step k anchors at the EARLIEST event that
validly follows step k-1's anchor. A user whose only completing path
runs through a LATER intermediate event (view, click@+1s,
click@+6d, purchase@+6d+2d) counts as not converting — the purchase is
outside the window of the FIRST click, and first-touch deliberately
does not backtrack. The any-valid-sequence variant is a per-user
ordered scan (sort within user, one forward pass keeping the latest
feasible anchor per step) — a different, more expensive operator; this
one is the aggregation-only shape, and the oracle encodes the same
first-touch rule.

The scalable spelling avoids per-user event-array materialization
(collect_list per user concentrates a power-law user's whole history
in one row): each step is ONE filtered min-aggregate on user_id —
step k's earliest valid timestamp is min(ts) over events of the step
type that land strictly after step k-1's timestamp and within the
window — chained by equi-joins on user_id. Every shuffle in the chain
hashes the SAME key, so AQE/exchange reuse co-locates them, per-task
state is a single timestamp per user, and a user with 10^6 events
costs the same reduce-side work as one with 10. Timestamps compare as
epoch seconds (integer) so the window bound is exact on both engines.

Output: one row per funnel step with users reached and the conversion
rate from the previous step (step 0 = all users seen in the stream).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import load_tables
from .relational import ntz_epoch_seconds

FUNNEL_STEPS = ("view", "click", "purchase")
STEP_WINDOW_S = 7 * 24 * 3600


def funnel_reach(events: DataFrame, steps=FUNNEL_STEPS, window_s: int = STEP_WINDOW_S) -> DataFrame:
    ev = events.select(
        "user_id", "event_type", ntz_epoch_seconds("ts").cast("long").alias("es")
    )
    total = ev.select("user_id").distinct().agg(
        F.count("*").cast("long").alias("users")
    )

    reached = None  # DataFrame (user_id, t): earliest completion of step k
    counts = [total.select(F.lit(0).alias("step"), F.lit("all_users").alias("step_name"), "users")]
    for k, step in enumerate(steps, start=1):
        cand = ev.filter(F.col("event_type") == step)
        if reached is None:
            nxt = cand.groupBy("user_id").agg(F.min("es").alias("t"))
        else:
            nxt = (
                cand.join(reached.withColumnRenamed("t", "prev_t"), "user_id")
                .filter(
                    (F.col("es") > F.col("prev_t"))
                    & (F.col("es") <= F.col("prev_t") + window_s)
                )
                .groupBy("user_id")
                .agg(F.min("es").alias("t"))
            )
        reached = nxt
        counts.append(
            reached.agg(F.count("*").cast("long").alias("users")).select(
                F.lit(k).alias("step"), F.lit(step).alias("step_name"), "users"
            )
        )

    out = counts[0]
    for c in counts[1:]:
        out = out.unionByName(c)
    # the funnel summary is 1 + len(steps) rows — a driver-sized frame,
    # so the unpartitioned lag window is fine here
    prev = F.lag("users").over(Window.orderBy("step"))
    return out.withColumn(
        "conversion",
        F.when(prev > 0, F.round(F.col("users") / prev, 4)),
    )


def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = load_tables(spark, sf_dir, "events")
    return funnel_reach(events)


def _oracle() -> str:
    steps_sql = []
    prev_cte = None
    for k, step in enumerate(FUNNEL_STEPS, start=1):
        if prev_cte is None:
            steps_sql.append(
                f"s{k} AS (SELECT user_id, min(es) AS t FROM ev"
                f" WHERE event_type = '{step}' GROUP BY user_id)"
            )
        else:
            steps_sql.append(
                f"s{k} AS (SELECT ev.user_id, min(es) AS t FROM ev"
                f" JOIN {prev_cte} p ON p.user_id = ev.user_id"
                f" WHERE event_type = '{step}' AND es > p.t"
                f" AND es <= p.t + {STEP_WINDOW_S} GROUP BY ev.user_id)"
            )
        prev_cte = f"s{k}"
    unions = ["SELECT 0 AS step, 'all_users' AS step_name, count(DISTINCT user_id)::BIGINT AS users FROM ev"]
    for k, step in enumerate(FUNNEL_STEPS, start=1):
        unions.append(f"SELECT {k}, '{step}', count(*)::BIGINT FROM s{k}")
    body = "\nUNION ALL\n".join(unions)
    return f"""
WITH ev AS (
  SELECT user_id, event_type, floor(epoch(ts))::BIGINT AS es FROM events
),
{", ".join(steps_sql)},
reach AS ({body})
SELECT step, step_name, users,
       CASE WHEN lag(users) OVER (ORDER BY step) > 0
            THEN round(users::DOUBLE / lag(users) OVER (ORDER BY step), 4)
       END AS conversion
FROM reach
"""


ORACLE_FUNNEL = _oracle()

QUERIES = {"funnel_conversion": funnel_conversion}
ORACLES = {"funnel_conversion": ORACLE_FUNNEL}
