"""Physical-plan shape assertions: the properties that make these
operators viable at 100 TB must hold in the optimized plan, not just in
intent — filter pushdown, column pruning, broadcast joins, partial
aggregation, and whole-stage codegen coverage."""

import re

import pytest

from ocrs_spark.ops.relational import (
    q1_pricing_summary,
    q5_local_supplier_volume,
    q6_forecast_revenue,
)
from ocrs_spark.pipeline import explode_spans

SF_DIR = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def test_q6_filter_pushdown_and_pruning(spark):
    plan = plan_of(q6_forecast_revenue(spark, SF_DIR))
    assert "PushedFilters:" in plan
    # Date + discount + quantity predicates reach the parquet scan.
    assert re.search(r"PushedFilters:.*l_shipdate", plan)
    assert re.search(r"PushedFilters:.*l_discount", plan)
    # Column pruning: the scan must not read unused wide columns.
    m = re.search(r"ReadSchema: (\S+)", plan)
    assert m and "l_returnflag" not in m.group(1) and "l_orderkey" not in m.group(1)


def test_q1_partial_aggregation(spark):
    plan = plan_of(q1_pricing_summary(spark, SF_DIR))
    # Two HashAggregates (partial before the exchange, final after).
    assert plan.count("HashAggregate") >= 2
    assert "partial_sum" in plan  # map-side combine proven, not assumed


def test_q5_broadcasts_small_dims(spark):
    plan = plan_of(q5_local_supplier_volume(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan


def test_explode_prunes_media_bytes(spark):
    from ocrs_spark.fixtures import corpus_to_spark, generate_corpus

    docs, media, _ = corpus_to_spark(spark, generate_corpus(n_docs=4))
    plan = plan_of(explode_spans(docs).filter("kind = 'image'"))
    assert "Generate explode" in plan or "explode" in plan.lower()
