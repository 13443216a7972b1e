"""Contracts for incremental view maintenance (ops/ivm.py): hand-built
merge algebra, new-group handling, and the no-base-rescan plan.
"""

from pyspark.sql import Row
from pyspark.sql import functions as F

from ocrs_spark.ops.ivm import _derive, _partials, ivm_merged_view, merge_partials

SF = "/root/testdata/sf0.001"


def _docs(spark, rows):
    return spark.createDataFrame(
        [Row(doc_id=i, lang=l, source=s, n_chars=c) for i, (l, s, c) in enumerate(rows)]
    )


def test_merge_algebra_hand_case(spark):
    base = _partials(_docs(spark, [("en", "a", 10), ("en", "a", 20), ("fr", "b", 7)]))
    delta = _partials(_docs(spark, [("en", "a", 30), ("de", "c", 5)]))
    out = {
        (r["lang"], r["source"]): r
        for r in _derive(merge_partials(base, delta)).collect()
    }
    en = out[("en", "a")]
    assert (en["n"], en["mn"], en["mx"]) == (3, 10, 30)
    assert en["avg_chars"] == 20.0
    # var = (100+400+900)/3 - 400 = 66.666667
    assert en["var_chars"] == round((1400 - 60 * 60 / 3) / 3, 6)
    # delta-only group appears; base-only group survives untouched
    assert out[("de", "c")]["n"] == 1 and out[("de", "c")]["var_chars"] == 0.0
    assert out[("fr", "b")]["n"] == 1


def test_merge_never_rescans_the_base(spark):
    plan = (
        ivm_merged_view(spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the stored view is a pinned checkpoint; only the DELTA scans the
    # documents table
    assert plan.count("FileScan parquet") == 1
    assert "Scan ExistingRDD" in plan  # the materialized base partials


def test_merged_equals_full_recompute(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    full = _derive(_partials(docs))
    got = ivm_merged_view(spark, SF)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, full.collect()))
