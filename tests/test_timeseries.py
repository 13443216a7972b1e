"""RANGE-frame rolling windows + NTILE deciles: hand fixtures pin the
value-based frame semantics (a missing day SHORTENS the window — the
difference from a ROWS frame), the frame arithmetic at series edges,
and NTILE's total-order tie handling. DuckDB parity in test_oracles."""

from __future__ import annotations

from datetime import datetime

from ocrs_spark.ops.timeseries import DAY_S, deciles_over, rolling_over

EV_SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double"


def _events(spark, rows):
    """rows: (event_id, day_number, event_type, value)."""
    return spark.createDataFrame(
        [
            (i, datetime.utcfromtimestamp(d * DAY_S + 60), 1, t, v)
            for i, d, t, v in rows
        ],
        EV_SCHEMA,
    )


def test_rolling_range_frame_skips_missing_days(spark):
    # type 'a': days 100 (2 events), 101, 109. Day 109's 7-day frame is
    # [103, 109] — it must contain ONLY day 109: a ROWS(-6, 0) frame
    # would wrongly reach back to days 101 and 100.
    ev = _events(
        spark,
        [
            (0, 100, "a", 1.0),
            (1, 100, "a", 1.0),
            (2, 101, "a", 1.0),
            (3, 109, "a", 1.0),
        ],
    )
    got = {r.day: (r.n, r.n_7d, r.avg_7d) for r in rolling_over(ev).collect()}
    assert got == {
        100: (2, 2, 2.0),
        101: (1, 3, 1.5),  # frame [95,101] holds days 100+101
        109: (1, 1, 1.0),  # frame [103,109] holds day 109 alone
    }


def test_rolling_partitions_isolate_event_types(spark):
    ev = _events(spark, [(0, 50, "a", 1.0), (1, 50, "b", 1.0), (2, 51, "b", 1.0)])
    got = {(r.event_type, r.day): r.n_7d for r in rolling_over(ev).collect()}
    assert got == {("a", 50): 1, ("b", 50): 1, ("b", 51): 2}


def test_deciles_partition_evenly_and_cover_range(spark):
    # 20 events, values 0..19 -> each decile holds exactly 2, and the
    # bucket edges tile the sorted order.
    ev = _events(spark, [(i, 10, "a", float(i)) for i in range(20)])
    rows = sorted(deciles_over(ev).collect(), key=lambda r: r.decile)
    assert [r.decile for r in rows] == list(range(1, 11))
    assert all(r.n == 2 for r in rows)
    assert [(r.lo, r.hi) for r in rows] == [
        (2.0 * k, 2.0 * k + 1.0) for k in range(10)
    ]


def test_deciles_ties_break_on_event_id(spark):
    # all values equal: the (value, event_id) total order makes the
    # assignment deterministic — first ids land in low deciles.
    ev = _events(spark, [(i, 10, "a", 5.0) for i in range(10)])
    rows = sorted(deciles_over(ev).collect(), key=lambda r: r.decile)
    assert [r.decile for r in rows] == list(range(1, 11))
    assert all(r.n == 1 and r.lo == 5.0 and r.hi == 5.0 for r in rows)
