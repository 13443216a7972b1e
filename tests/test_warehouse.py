"""Warehouse reporting ops: hand fixtures pin the ROLLUP subtotal
structure (grouping flags, ALL labels, level consistency), the
epoch-week cohort triangle, and the Markov transition normalization.
DuckDB parity runs in test_oracles.py like every op; the plan tests
here pin the single-pass Expand strategy and the broadcast dim join."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from ocrs_spark.ops.warehouse import (
    WEEK_S,
    retention_over,
    rollup_over,
    transitions_over,
)

EV_SCHEMA = "event_id long, ts timestamp, user_id long, event_type string"


def _events(spark, rows):
    """rows: (event_id, epoch_seconds, user_id, event_type)."""
    return spark.createDataFrame(
        [(i, datetime.utcfromtimestamp(es), u, t) for i, es, u, t in rows],
        EV_SCHEMA,
    )


def _dims(spark):
    nation = spark.createDataFrame(
        [(0, "AAA"), (1, "BBB")], "n_nationkey long, n_name string"
    )
    customer = spark.createDataFrame(
        [(10, 0), (11, 0), (12, 1)], "c_custkey long, c_nationkey long"
    )
    orders = spark.createDataFrame(
        [
            (1, 10, "1-URGENT", 100.0),
            (2, 10, "2-HIGH", 50.0),
            (3, 11, "1-URGENT", 25.0),
            (4, 12, "2-HIGH", 10.0),
        ],
        "o_orderkey long, o_custkey long, o_orderpriority string, o_totalprice double",
    )
    return orders, customer, nation


def test_rollup_levels_and_grand_total(spark):
    out = rollup_over(*_dims(spark)).collect()
    by_flags = {}
    for r in out:
        by_flags.setdefault((r.g_nation, r.g_priority), []).append(r)
    # three rollup levels, nothing else (no cube-only (1,0) level)
    assert set(by_flags) == {(0, 0), (0, 1), (1, 1)}
    leaf = {(r.nation, r.priority): (r.n_orders, r.total_price) for r in by_flags[(0, 0)]}
    assert leaf == {
        ("AAA", "1-URGENT"): (2, 125.0),
        ("AAA", "2-HIGH"): (1, 50.0),
        ("BBB", "2-HIGH"): (1, 10.0),
    }
    subtotal = {r.nation: (r.priority, r.n_orders, r.total_price) for r in by_flags[(0, 1)]}
    assert subtotal == {"AAA": ("ALL", 3, 175.0), "BBB": ("ALL", 1, 10.0)}
    (grand,) = by_flags[(1, 1)]
    assert (grand.nation, grand.priority, grand.n_orders, grand.total_price) == (
        "ALL", "ALL", 4, 185.0,
    )


def test_rollup_plan_is_single_pass_expand_with_broadcast_dim(spark):
    plan = rollup_over(*_dims(spark))._jdf.queryExecution().executedPlan().toString()
    assert "Expand" in plan  # one scan feeds all grouping sets
    assert "BroadcastHashJoin" in plan  # nation side never shuffles


def test_retention_cohorts_anchor_at_first_event_week(spark):
    w = WEEK_S
    ev = _events(
        spark,
        [
            # user 1: first event week 100, returns weeks 101 and 103
            (0, 100 * w + 5, 1, "view"),
            (1, 101 * w + 9, 1, "view"),
            (2, 103 * w, 1, "click"),
            # user 2: same cohort week 100, never returns (two events same week)
            (3, 100 * w + 80, 2, "view"),
            (4, 100 * w + 90, 2, "view"),
            # user 3: cohort week 101
            (5, 101 * w + 1, 3, "view"),
        ],
    )
    got = {
        (r.cohort_week, r.week_offset): r.active_users
        for r in retention_over(ev).collect()
    }
    assert got == {
        (100, 0): 2,
        (100, 1): 1,
        (100, 3): 1,
        (101, 0): 1,
    }


def test_transitions_probabilities_normalize_per_source(spark):
    ev = _events(
        spark,
        [
            # user 1: view -> view -> click
            (0, 10, 1, "view"),
            (1, 20, 1, "view"),
            (2, 30, 1, "click"),
            # user 2: view -> click (cross-user pairs must NOT form)
            (3, 40, 2, "view"),
            (4, 50, 2, "click"),
            # user 3: a single event contributes no pair
            (5, 60, 3, "purchase"),
        ],
    )
    got = {(r.src, r.dst): (r.n, r.p) for r in transitions_over(ev).collect()}
    assert got == {
        ("view", "view"): (1, 0.3333),
        ("view", "click"): (2, 0.6667),
    }


def test_transitions_same_timestamp_ties_break_on_event_id(spark):
    ev = _events(spark, [(1, 100, 7, "b"), (0, 100, 7, "a"), (2, 200, 7, "c")])
    got = {(r.src, r.dst) for r in transitions_over(ev).collect()}
    assert got == {("a", "b"), ("b", "c")}


def test_transitions_probability_sums_to_one_per_source(spark):
    ev = _events(spark, [(i, 10 * i, i % 4, t) for i, t in enumerate("vvcvpcvp" * 3)])
    sums = (
        transitions_over(ev)
        .groupBy("src")
        .agg(F.round(F.sum("p"), 2).alias("s"))
        .collect()
    )
    assert sums and all(abs(r.s - 1.0) <= 0.01 for r in sums)
