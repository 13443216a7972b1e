"""Contracts for per-key trend fitting (ops/trend.py): exact slope on
a hand-built line, noise-free intercept, degenerate keys, and integer
exactness of the sufficient statistics.
"""

import datetime as dt

from pyspark.sql import Row

from ocrs_spark.ops.trend import value_trends

_BASE = dt.datetime(2024, 1, 1)


def _events(spark, rows):
    return spark.createDataFrame(
        [
            Row(user_id=u, ts=_BASE + dt.timedelta(seconds=s), value=v)
            for u, s, v in rows
        ]
    ).selectExpr("user_id", "cast(ts as timestamp_ntz) as ts", "value")


def test_exact_line(spark):
    # value rises 1.00 (100 cents) per day for user 1
    day = 86400
    rows = [(1, i * day, 10.0 + i * 1.0) for i in range(5)]
    out = {r["user_id"]: r for r in value_trends(_events(spark, rows)).collect()}
    assert out[1]["slope_cents_per_day"] == 100.0
    assert out[1]["intercept_cents"] == 1000.0
    assert out[1]["n"] == 5


def test_flat_series_has_zero_slope(spark):
    rows = [(2, i * 3600, 5.0) for i in range(4)]
    out = value_trends(_events(spark, rows)).collect()[0]
    assert out["slope_cents_per_day"] == 0.0
    assert out["intercept_cents"] == 500.0


def test_single_point_and_zero_variance_are_null(spark):
    rows = [(1, 100, 3.0), (2, 50, 1.0), (2, 50, 9.0)]  # u2: same timestamp
    out = {r["user_id"]: r for r in value_trends(_events(spark, rows)).collect()}
    assert out[1]["slope_cents_per_day"] is None
    assert out[2]["slope_cents_per_day"] is None


def test_cent_rounding_matches_double_halves(spark):
    # 0.005 -> round-half-even at the cent boundary, same on both paths
    rows = [(1, 0, 0.005), (1, 60, 0.015)]
    out = value_trends(_events(spark, rows)).collect()[0]
    assert out["n"] == 2 and out["slope_cents_per_day"] is not None
