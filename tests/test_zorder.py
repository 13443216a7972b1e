"""Contracts for the z-order layout planner (ops/zorder.py): Morton
interleave algebra, layout-independent answers, and the measured
pruning advantage on the real events table.
"""

from pyspark.sql import Row
from pyspark.sql import functions as F

from ocrs_spark.ops.zorder import _interleave_spark, zorder_pruning_stats

SF = "/root/testdata/sf0.001"


def test_morton_interleave_algebra(spark):
    # z(x=0b11, y=0b01) = bits x1 y1 x0 y0 = 1 0 1 1 = 11
    df = spark.createDataFrame([Row(x16=3, y16=1)])
    z = df.select(F.expr(_interleave_spark("x16", "y16")).alias("z")).collect()[0]["z"]
    assert z == 11
    # interleave is monotone in each dim at fixed other dim
    rows = spark.createDataFrame([Row(x16=i, y16=5) for i in range(8)])
    zs = [
        r["z"]
        for r in rows.select(F.expr(_interleave_spark("x16", "y16")).alias("z"))
        .orderBy("x16")
        .collect()
    ]
    assert zs == sorted(zs)


def test_layouts_agree_on_the_answer_and_zorder_prunes_better(spark):
    events = spark.read.parquet(f"{SF}/events.parquet")
    out = {r["layout"]: r for r in zorder_pruning_stats(events).collect()}
    assert out["zorder"]["rows_matched"] == out["linear"]["rows_matched"] > 0
    # the measured claim: the 2-D box touches fewer z-order files
    assert out["zorder"]["files_touched"] < out["linear"]["files_touched"]
    assert out["zorder"]["files_touched"] >= 1
