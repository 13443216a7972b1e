"""Corpus drift: the planted perturbed batch pushes PSI over the alert
bar on every monitored feature, while the unperturbed later half alone
stays quiet — the metric detects the drift, not the split (also swept
against the DuckDB oracle by test_oracles)."""

from ocrs_spark.ops.drift import (
    PSI_ALERT,
    _histogram,
    _slices,
    corpus_drift,
)

SF = "/root/testdata/sf0.001"


def test_planted_drift_flags_every_feature(spark):
    out = corpus_drift(spark, SF).toPandas().set_index("feature")
    assert sorted(out.index) == ["lang", "len", "tok"]
    assert out["drifted"].all(), out
    assert (out["psi"] > PSI_ALERT).all()
    # the unseen-lang plant creates a zero-reference bin -> the lang PSI
    # is dominated by the eps-substituted new-category term, far above
    # the histogram shifts
    assert out.loc["lang", "psi"] > out.loc["len", "psi"]


def test_no_plant_control_is_quiet(spark):
    # ref vs the raw later half (no planted batch): both halves come
    # from the same synthetic generator, so PSI must sit under the bar
    # for every feature — the verdict is driven by the plant.
    import pyspark.sql.functions as F

    ref, cand = _slices(spark, SF)
    from ocrs_spark.ops.drift import DRIFT_N

    clean = cand.filter(~F.col("lang").eqNullSafe("xx"))
    hr = _histogram(ref).withColumnRenamed("cnt", "cr")
    hc = _histogram(clean).withColumnRenamed("cnt", "cc")
    tr = hr.groupBy("feature").agg(F.sum("cr").alias("tr"))
    tc = hc.groupBy("feature").agg(F.sum("cc").alias("tc"))
    j = hr.join(hc, ["feature", "bin"], "full").join(tr, "feature").join(tc, "feature")
    pr = F.coalesce("cr", F.lit(0)) / F.col("tr")
    pc = F.coalesce("cc", F.lit(0)) / F.col("tc")
    pr = F.when(pr == 0, F.lit(1e-4)).otherwise(pr)
    pc = F.when(pc == 0, F.lit(1e-4)).otherwise(pc)
    psi = (
        j.groupBy("feature")
        .agg(F.sum((pc - pr) * F.log(pc / pr)).alias("psi"))
        .toPandas()
        .set_index("feature")
    )
    assert (psi["psi"] < PSI_ALERT).all(), psi
    assert DRIFT_N > 0  # the contract row, by contrast, plants drift


def test_drift_plan_shape(spark):
    """The PSI gate's 100-TB viability: the histogram reduction does
    map-side partial aggregation, the per-feature totals join back as
    broadcasts (bins x features is constant-sized), and no stage drops
    to row-at-a-time Python."""
    from tests.test_plans import plan_of

    plan = plan_of(corpus_drift(spark, SF))
    assert "partial_count" in plan or "partial_" in plan
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
