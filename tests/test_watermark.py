"""Contracts for watermark-disorder stats (ops/watermark.py): a
pure-Python replay of the jittered arrival stream (independent of the
two-phase distributed scan), quantile-definition minimality, and the
ordering invariants of the lateness curve.
"""

import hashlib

import pyarrow.parquet as pq

from ocrs_spark.ops.watermark import PCTS, watermark_disorder_stats

SF = "/root/testdata/sf0.001"


def _py_lateness():
    t = pq.read_table(f"{SF}/events.parquet", columns=["event_id", "ts"])
    rows = []
    for eid, ts in zip(t["event_id"].to_pylist(), t["ts"].to_pylist()):
        es = int(ts.timestamp())
        j = int(hashlib.md5(str(eid).encode()).hexdigest()[:8], 16) % 14401 - 7200
        rows.append((es + j, eid, es))
    rows.sort()  # arrival order: (arr, event_id)
    run = None
    out = []
    for _, _, es in rows:
        out.append(0 if run is None else max(0, run - es))
        run = es if run is None else max(run, es)
    return out


def test_quantiles_match_python_replay(spark):
    late = sorted(_py_lateness())
    n = len(late)
    rows = {r["pct"]: r for r in watermark_disorder_stats(spark, SF).collect()}
    assert set(rows) == set(PCTS)
    for pct in PCTS:
        # smallest value whose cumulative count reaches ceil(pct*n/100)
        need = -(-pct * n // 100)
        want = late[need - 1]
        r = rows[pct]
        assert r["lateness_s"] == want
        assert r["n_events"] == n
        assert r["max_lateness_s"] == late[-1]


def test_curve_is_monotone_and_bounded(spark):
    rows = sorted(
        watermark_disorder_stats(spark, SF).collect(), key=lambda r: r["pct"]
    )
    vals = [r["lateness_s"] for r in rows]
    assert vals == sorted(vals)  # higher pct, never smaller lateness
    assert all(0 <= v <= rows[0]["max_lateness_s"] for v in vals)
    assert rows[-1]["max_lateness_s"] <= 7200 * 2  # jitter bound
    assert rows[-1]["lateness_s"] > 0  # planted disorder is visible
