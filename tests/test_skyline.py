"""Contracts for the distributed skyline (ops/skyline.py): hand-built
frontiers, duplicate-point retention, tie dominance, partitioning
independence, and the naive-quadratic equivalence.
"""

from pyspark.sql import Row
from pyspark.sql import functions as F

from ocrs_spark.ops.skyline import skyline


def _pts(spark, triples, parts=None):
    df = spark.createDataFrame(
        [Row(doc_id=i, x=x, y=y) for i, (x, y) in enumerate(triples)],
        "doc_id long, x long, y long",
    )
    return df.repartition(parts) if parts else df


def _sky(spark, triples, parts=None):
    return {(r["x"], r["y"]) for r in skyline(_pts(spark, triples, parts)).collect()}


def test_hand_frontier(spark):
    # frontier: (5,1), (3,4), (1,6); dominated: (2,2), (3,3), (1,1)
    pts = [(5, 1), (3, 4), (1, 6), (2, 2), (3, 3), (1, 1)]
    assert _sky(spark, pts) == {(5, 1), (3, 4), (1, 6)}


def test_ties_and_duplicates(spark):
    # (4,4) dominates (4,3) and (3,4); duplicate (4,4) both survive
    rows = skyline(
        _pts(spark, [(4, 4), (4, 4), (4, 3), (3, 4)])
    ).collect()
    assert sorted((r["x"], r["y"]) for r in rows) == [(4, 4), (4, 4)]


def test_partitioning_independence(spark):
    pts = [((i * 13) % 50, (i * 29) % 50) for i in range(300)]
    assert _sky(spark, pts, parts=2) == _sky(spark, pts, parts=23)


def test_matches_naive_quadratic(spark):
    pts = [((i * 13) % 50, (i * 29) % 50) for i in range(200)]
    df = _pts(spark, pts, parts=7)
    got = {(r["doc_id"]) for r in skyline(df).collect()}
    q = df.alias("q")
    dominated = (
        df.alias("p")
        .join(
            q,
            (F.col("q.x") >= F.col("p.x"))
            & (F.col("q.y") >= F.col("p.y"))
            & ((F.col("q.x") > F.col("p.x")) | (F.col("q.y") > F.col("p.y"))),
            "left_semi",
        )
        .select("p.doc_id")
    )
    want = {r["doc_id"] for r in df.join(dominated, "doc_id", "left_anti").collect()}
    assert got == want
