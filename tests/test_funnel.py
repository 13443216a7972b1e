"""Contracts for ordered-funnel analytics (ops/funnel.py): strict
ordering (a purchase BEFORE the click doesn't count), the step window
bound, monotone reach, and hand-computed conversions.
"""

import datetime as dt

from pyspark.sql import Row

from ocrs_spark.ops.funnel import funnel_reach


def _ts(s):
    return dt.datetime.fromisoformat(s)


def _events(spark, rows):
    return spark.createDataFrame(
        [Row(user_id=u, event_type=t, ts=_ts(ts)) for u, t, ts in rows]
    ).selectExpr("user_id", "event_type", "cast(ts as timestamp_ntz) as ts")


def test_funnel_order_and_window(spark):
    rows = [
        # u1: full funnel in order
        (1, "view", "2024-01-01T00:00:00"),
        (1, "click", "2024-01-02T00:00:00"),
        (1, "purchase", "2024-01-03T00:00:00"),
        # u2: purchase BEFORE click -> stops at click
        (2, "view", "2024-01-01T00:00:00"),
        (2, "purchase", "2024-01-01T12:00:00"),
        (2, "click", "2024-01-02T00:00:00"),
        # u3: click outside the 7-day window -> stops at view
        (3, "view", "2024-01-01T00:00:00"),
        (3, "click", "2024-01-09T00:00:01"),
        # u4: never views; a click alone matches nothing
        (4, "click", "2024-01-01T00:00:00"),
    ]
    out = {r["step_name"]: r for r in funnel_reach(_events(spark, rows)).collect()}
    assert out["all_users"]["users"] == 4
    assert out["view"]["users"] == 3
    assert out["click"]["users"] == 2  # u1, u2
    assert out["purchase"]["users"] == 1  # u1 only
    assert out["view"]["conversion"] == 0.75
    assert out["click"]["conversion"] == 0.6667
    assert out["purchase"]["conversion"] == 0.5
    assert out["all_users"]["conversion"] is None


def test_same_timestamp_is_not_after(spark):
    rows = [
        (1, "view", "2024-01-01T00:00:00"),
        (1, "click", "2024-01-01T00:00:00"),  # simultaneous: strict > fails
    ]
    out = {r["step_name"]: r["users"] for r in funnel_reach(_events(spark, rows)).collect()}
    assert out["view"] == 1 and out["click"] == 0


def test_reach_is_monotone_on_real_events(spark):
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    rows = sorted(funnel_reach(events).collect(), key=lambda r: r["step"])
    users = [r["users"] for r in rows]
    assert all(a >= b for a, b in zip(users, users[1:]))
    assert users[-1] > 0  # the synthetic stream completes funnels
