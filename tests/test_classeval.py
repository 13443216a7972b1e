"""Handcrafted contracts for the filter-model evaluation ops
(ops/classeval.py): exact tie-corrected AUC on known cases, the
two-phase prefix-sum AUC matching the naive single-window formula,
and PR-curve operating points computed by hand.
"""

from pyspark.sql import Row, Window
from pyspark.sql import functions as F

from ocrs_spark.ops.classeval import pr_curve, roc_auc


def _scored(spark, rows):
    return spark.createDataFrame(
        [Row(doc_id=i, label=l, score=s) for i, (l, s) in enumerate(rows)],
        "doc_id bigint, label int, score bigint",
    )


def _auc(spark, rows):
    r = roc_auc(_scored(spark, rows)).collect()[0]
    return r["auc"], r["n_pos"], r["n_neg"]


def test_auc_known_cases(spark):
    # perfect separation
    assert _auc(spark, [(1, 10), (1, 9), (0, 2), (0, 1)])[0] == 1.0
    # perfectly reversed
    assert _auc(spark, [(0, 10), (0, 9), (1, 2), (1, 1)])[0] == 0.0
    # everything tied -> 0.5 exactly (trapezoid through the tie block)
    assert _auc(spark, [(1, 5), (1, 5), (0, 5), (0, 5)])[0] == 0.5
    # hand-computed mixed case: pos scores {3, 1}, neg scores {2, 1}
    # pairs: (3>2)=1, (3>1)=1, (1<2)=0, (1=1)=0.5 -> AUC = 2.5/4
    assert _auc(spark, [(1, 3), (1, 1), (0, 2), (0, 1)])[0] == 0.625


def test_auc_degenerate_single_class(spark):
    auc, n_pos, n_neg = _auc(spark, [(1, 3), (1, 1)])
    assert auc is None and n_pos == 2 and n_neg == 0


def test_distributed_auc_matches_single_window(spark):
    # ~200 rows, heavy ties, deterministic pseudo-noise
    rows = [((i * 3) % 2, ((i * 7) % 13) * 2 + (i % 2)) for i in range(200)]
    df = _scored(spark, rows)
    got = roc_auc(df).collect()[0]

    g = df.groupBy("score").agg(
        F.sum("label").alias("pos"), F.sum(1 - F.col("label")).alias("neg")
    )
    w = Window.orderBy("score").rowsBetween(Window.unboundedPreceding, -1)
    naive = (
        g.withColumn("cumneg", F.coalesce(F.sum("neg").over(w), F.lit(0)))
        .agg(
            F.round(
                F.sum(F.col("pos") * (F.col("cumneg") + F.col("neg") / 2.0))
                / (F.sum("pos") * F.sum("neg")),
                6,
            ).alias("auc")
        )
        .collect()[0]["auc"]
    )
    assert got["auc"] == naive


def test_pr_curve_hand_case(spark):
    # scores: pos {10, 4}, neg {6, 2}; thresholds 5 and 0
    df = _scored(spark, [(1, 10), (1, 4), (0, 6), (0, 2)])
    out = {
        r["threshold"]: r
        for r in pr_curve(df, thresholds=(5, 0)).collect()
    }
    t5 = out[5]
    assert (t5["tp"], t5["fp"], t5["fn"]) == (1, 1, 1)
    assert t5["precision"] == 0.5 and t5["recall"] == 0.5 and t5["f1"] == 0.5
    t0 = out[0]
    assert (t0["tp"], t0["fp"], t0["fn"]) == (2, 2, 0)
    assert t0["precision"] == 0.5 and t0["recall"] == 1.0
    # f1 at recall=1, precision=0.5 -> 2*0.5*1/(1.5) = 2/3
    assert t0["f1"] == 0.666667


def test_pr_curve_empty_prediction_bucket(spark):
    df = _scored(spark, [(1, 1), (0, 1)])
    row = pr_curve(df, thresholds=(99,)).collect()[0]
    assert (row["tp"], row["fp"], row["fn"]) == (0, 0, 1)
    # no predicted positives: precision (and hence F1) undefined, recall 0
    assert row["precision"] is None and row["recall"] == 0.0 and row["f1"] is None


def test_calibration_hand_case(spark):
    from ocrs_spark.ops.classeval import calibration_bins

    # (label, milli-prob score): bins 0, 1, 1, 9
    out = {
        r["bin"]: r
        for r in calibration_bins(
            _scored(spark, [(0, 50), (1, 150), (0, 150), (1, 950)])
        ).collect()
    }
    assert set(out) == {0, 1, 9}
    b0, b1, b9 = out[0], out[1], out[9]
    assert (b0["n"], b0["pos"], b0["score_sum"], b0["brier_micro_sum"]) == (
        1, 0, 50, 2500,
    )
    assert (b0["confidence"], b0["accuracy"], b0["gap"]) == (0.05, 0.0, 0.05)
    # bin 1: scores 150+150, one positive -> brier (150-1000)^2 + 150^2
    assert (b1["n"], b1["pos"], b1["score_sum"]) == (2, 1, 300)
    assert b1["brier_micro_sum"] == 850 * 850 + 150 * 150
    assert (b1["confidence"], b1["accuracy"], b1["gap"]) == (0.15, 0.5, 0.35)
    assert (b9["confidence"], b9["accuracy"], b9["gap"]) == (0.95, 1.0, 0.05)


def test_calibration_totals_consistent_with_auc_row(spark):
    """The calibration bins partition the corpus: bin sizes sum to the
    doc count and bin positives sum to the AUC row's n_pos; derived
    ECE/Brier land in their legal ranges."""
    from ocrs_spark.ops.classeval import (
        filter_model_auc,
        filter_model_calibration,
    )

    sf = "/root/testdata/sf0.001"
    bins = filter_model_calibration(spark, sf).collect()
    auc = filter_model_auc(spark, sf).collect()[0]
    n_docs = spark.read.parquet(f"{sf}/documents.parquet").count()
    assert sum(r["n"] for r in bins) == n_docs
    assert sum(r["pos"] for r in bins) == auc["n_pos"]
    ece = sum(r["n"] * r["gap"] for r in bins) / n_docs
    brier = sum(r["brier_micro_sum"] for r in bins) / (n_docs * 1_000_000)
    assert 0.0 <= ece <= 1.0
    assert 0.0 <= brier <= 1.0
    # the planted scorer is informative but imperfect: both metrics
    # must be strictly inside the open interval
    assert 0.0 < brier < 0.5
