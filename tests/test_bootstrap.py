"""Contracts for bootstrap confidence intervals (ops/bootstrap.py):
interval sanity around the point estimate, determinism, coverage of a
known shift, and the degenerate constant-column case.
"""

from pyspark.sql import Row

from ocrs_spark.ops.bootstrap import mean_ci

SF = "/root/testdata/sf0.001"


def test_interval_brackets_point_and_is_deterministic(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    a = mean_ci(docs).collect()[0]
    b = mean_ci(docs).collect()[0]
    assert tuple(a) == tuple(b)
    assert a["ci_lo"] <= a["point_mean"] <= a["ci_hi"]
    assert a["ci_lo"] < a["ci_hi"]  # real sampling noise, non-degenerate
    # half-subsample means of ~500 docs shouldn't wander far
    assert (a["ci_hi"] - a["ci_lo"]) < a["point_mean"] * 0.5


def test_constant_column_has_zero_width(spark):
    docs = spark.createDataFrame([Row(doc_id=i, n_chars=42) for i in range(200)])
    out = mean_ci(docs).collect()[0]
    assert out["point_mean"] == 42.0
    assert out["ci_lo"] == 42.0 and out["ci_hi"] == 42.0


def test_interval_separates_a_real_shift(spark):
    lo = spark.createDataFrame([Row(doc_id=i, n_chars=100 + i % 7) for i in range(400)])
    hi = spark.createDataFrame(
        [Row(doc_id=i, n_chars=200 + i % 7) for i in range(400)]
    )
    a, b = mean_ci(lo).collect()[0], mean_ci(hi).collect()[0]
    # a 2x mean shift is far outside both intervals
    assert a["ci_hi"] < b["ci_lo"]
