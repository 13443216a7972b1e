"""Contracts for change-rate recrawl estimation (ops/changerate.py):
a pure-Python recompute of the planted change bits, tier threshold
semantics, and the monotone ordering between lambda and tier.
"""

import hashlib

import pyarrow.parquet as pq

from ocrs_spark.ops.changerate import (
    CHANGE_MOD,
    K_FETCHES,
    TIER_DAILY_MILLI,
    TIER_WEEKLY_MILLI,
    _SALT,
    recrawl_change_rate,
)

SF = "/root/testdata/sf0.001"


def _py_changed(doc_id, s):
    h = int(hashlib.md5(f"{doc_id}{_SALT}{s}".encode()).hexdigest()[:8], 16)
    return h % CHANGE_MOD == 0


def _expected():
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id"])
    out = {}
    for doc_id in t["doc_id"].to_pylist():
        x = sum(_py_changed(doc_id, s) for s in range(K_FETCHES))
        lam = (1000 * x) // K_FETCHES
        tier = (
            "daily"
            if lam >= TIER_DAILY_MILLI
            else "weekly" if lam >= TIER_WEEKLY_MILLI else "quarterly"
        )
        out[doc_id] = (K_FETCHES, x, lam, tier)
    return out


def test_change_rate_matches_python_recompute(spark):
    exp = _expected()
    got = recrawl_change_rate(spark, SF).collect()
    assert len(got) == len(exp)
    for r in got:
        assert (
            r["n_obs"],
            r["n_changed"],
            r["lambda_milli"],
            r["tier"],
        ) == exp[r["doc_id"]]


def test_tiers_partition_lambda_range(spark):
    rows = recrawl_change_rate(spark, SF).collect()
    by_tier = {"daily": [], "weekly": [], "quarterly": []}
    for r in rows:
        by_tier[r["tier"]].append(r["lambda_milli"])
    # thresholds honored exactly
    assert all(v >= TIER_DAILY_MILLI for v in by_tier["daily"])
    assert all(
        TIER_WEEKLY_MILLI <= v < TIER_DAILY_MILLI for v in by_tier["weekly"]
    )
    assert all(v < TIER_WEEKLY_MILLI for v in by_tier["quarterly"])
    # with CHANGE_MOD=3 and K=6 the planted corpus populates >=2 tiers,
    # so the operator is non-degenerate
    assert sum(1 for v in by_tier.values() if v) >= 2
