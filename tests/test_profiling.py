"""Profiling: hand-computed metrics on a tiny frame, HLL swap-in error
bound, check verdicts, and DuckDB oracle parity for both rows (also
swept by test_oracles)."""

import duckdb
import pytest

from pyspark.sql import functions as F

from ocrs_spark.ops.profiling import (
    ORACLE_CHECKS,
    ORACLE_PROFILE,
    data_profile,
    data_quality_checks,
)

SF = "/root/testdata/sf0.001"


def test_profile_hand_computed(spark):
    docs = spark.createDataFrame(
        [(1, "ab", "en", "s", 2), (2, None, "en", "s", 0), (2, "abcd", None, "s", 4)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    events = spark.createDataFrame(
        [], "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    from ocrs_spark.ops import profiling

    orig = profiling.load_tables
    try:
        profiling.load_tables = lambda s, d, t: (docs if t == "documents" else events,)
        out = {
            (r["table"], r["column"], r["metric"]): r["value"]
            for r in data_profile(spark, "x").collect()
        }
    finally:
        profiling.load_tables = orig
    assert out[("documents", "doc_id", "count")] == 3.0
    assert out[("documents", "doc_id", "distinct")] == 2.0
    assert out[("documents", "text", "nulls")] == 1.0
    assert out[("documents", "text", "avg_len")] == 3.0  # (2+4)/2 non-null
    assert out[("documents", "lang", "distinct")] == 1.0
    assert out[("documents", "n_chars", "min")] == 0.0
    assert out[("documents", "n_chars", "max")] == 4.0
    assert out[("events", "event_id", "count")] == 0.0


def test_hll_swap_in_error_bound(spark):
    """The 100-TB path replaces exact count(DISTINCT) with HLL
    approx_count_distinct; pin its error so the swap is evidence."""
    (docs,) = __import__(
        "ocrs_spark.ops", fromlist=["load_tables"]
    ).load_tables(spark, SF, "documents")
    row = docs.agg(
        F.countDistinct("text").alias("exact"),
        F.approx_count_distinct("text", 0.01).alias("approx"),
    ).collect()[0]
    assert abs(row["approx"] - row["exact"]) / max(row["exact"], 1) < 0.03


def test_checks_pass_on_corpus(spark):
    out = {r["check"]: r for r in data_quality_checks(spark, SF).collect()}
    assert out["doc_id_unique"]["passed"]
    assert out["doc_id_complete"]["passed"]
    assert out["n_chars_positive"]["passed"]
    assert len(out) == 6


@pytest.mark.parametrize(
    "fn,sql", [(data_profile, ORACLE_PROFILE), (data_quality_checks, ORACLE_CHECKS)]
)
def test_oracle_parity(spark, fn, sql):
    import sys

    sys.path.insert(0, "tests")
    from test_oracles import _duck_rows, _rowset

    con = duckdb.connect()
    for t in ("documents", "events"):
        con.execute(f"create view {t} as select * from '{SF}/{t}.parquet'")
    sdf = fn(spark, SF).toPandas()
    assert len(sdf) > 0
    ocols, orows = _duck_rows(con.sql(sql))
    a, ca = _rowset(
        list(sdf.columns), [tuple(t) for t in sdf.itertuples(index=False, name=None)]
    )
    b, cb = _rowset(ocols, orows)
    assert ca == cb and a == b
