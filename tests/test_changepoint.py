"""Contracts for CUSUM changepoint detection (ops/changepoint.py):
the closed-form (running sum minus clamped running min) must equal the
TEXTBOOK recurrence S_t = max(0, S_{t-1} + dev_t) computed in pure
Python, and the planted x2 level shift must actually raise the alarm
after (never before a full CUSUM build-up preceding) the plant day.
"""

import pyarrow.parquet as pq

from ocrs_spark.ops.changepoint import (
    DAY_S,
    K_MAD,
    PLANT_FACTOR,
    PLANT_FROM_DAY,
    cusum_changepoint,
)

SF = "/root/testdata/sf0.001"


def _expected():
    t = pq.read_table(f"{SF}/events.parquet", columns=["ts"])
    days = {}
    for ts in t["ts"].to_pylist():
        d = int(ts.timestamp()) // DAY_S
        days[d] = days.get(d, 0) + 1
    series = sorted(days.items())
    mon = [
        (d, n, n * PLANT_FACTOR if d >= PLANT_FROM_DAY else n)
        for d, n in series
    ]
    total = sum(m for _, _, m in mon)
    mean_milli = (1000 * total) // len(mon)
    devs = [1000 * m - mean_milli for _, _, m in mon]
    mad = sum(abs(v) for v in devs) // len(devs)
    out = {}
    s = 0  # the textbook recurrence, not the closed form
    for (d, n, m), dev in zip(mon, devs):
        s = max(0, s + dev)
        out[d] = {
            "n_events": n,
            "monitored": m,
            "dev_milli": dev,
            "cusum_milli": s,
            "alarm": s > K_MAD * mad,
        }
    return out


def test_closed_form_equals_recurrence(spark):
    exp = _expected()
    rows = cusum_changepoint(spark, SF).collect()
    assert len(rows) == len(exp)
    for r in rows:
        e = exp[r["day"]]
        for k, v in e.items():
            assert r[k] == v, (r["day"], k, r[k], v)


def test_alarm_fires_only_after_the_planted_shift(spark):
    rows = sorted(cusum_changepoint(spark, SF).collect(), key=lambda r: r["day"])
    alarms = [r["day"] for r in rows if r["alarm"]]
    assert alarms, "planted x2 shift must raise the alarm"
    assert min(alarms) >= PLANT_FROM_DAY
    # CUSUM is clamped at zero: never negative anywhere.
    assert all(r["cusum_milli"] >= 0 for r in rows)
