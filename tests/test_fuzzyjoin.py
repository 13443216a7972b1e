"""Contracts for pigeonhole-blocked fuzzy entity matching
(ops/fuzzyjoin.py): 100% recall of planted distance-1 pairs, rejection
beyond the distance bound, and the no-nested-loop plan shape.
"""

from pyspark.sql import Row
from pyspark.sql import functions as F

from ocrs_spark.ops.fuzzyjoin import entity_tables, fuzzy_match

SF = "/root/testdata/sf0.001"


def test_planted_pairs_fully_recovered(spark):
    cust = spark.read.parquet(f"{SF}/customer.parquet")
    dirty, canon = entity_tables(cust)
    n = cust.count()
    out = fuzzy_match(dirty, canon).collect()
    self_pairs = {(r["dirty_key"], r["canon_key"]) for r in out if r["dirty_key"] == r["canon_key"]}
    # the pigeonhole guarantee, observable: every planted pair survives
    assert len(self_pairs) == n
    assert all(r["dist"] == 1 for r in out if r["dirty_key"] == r["canon_key"])


def test_distance_bound_rejects_double_edits(spark):
    dirty = spark.createDataFrame(
        [Row(dirty_key=1, dirty_name="xxromita"),  # two edits from 'karomita'
         Row(dirty_key=2, dirty_name="xaromita")]  # one edit
    )
    canon = spark.createDataFrame([Row(canon_key=9, canon_name="karomita")])
    got = {(r["dirty_key"], r["canon_key"]) for r in fuzzy_match(dirty, canon).collect()}
    assert got == {(2, 9)}


def test_half_blocking_finds_edits_in_either_half(spark):
    canon = spark.createDataFrame([Row(canon_key=1, canon_name="abcdefgh")])
    dirty = spark.createDataFrame(
        [Row(dirty_key=1, dirty_name="xbcdefgh"),  # edit in first half
         Row(dirty_key=2, dirty_name="abcdefgx")]  # edit in second half
    )
    got = {r["dirty_key"] for r in fuzzy_match(dirty, canon).collect()}
    assert got == {1, 2}


def test_plan_has_no_nested_loop(spark):
    cust = spark.read.parquet(f"{SF}/customer.parquet")
    dirty, canon = entity_tables(cust)
    plan = fuzzy_match(dirty, canon)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
