"""Contracts for cost-based gate ordering (ops/gateorder.py): the
ratio rule's plan must beat-or-match EVERY permutation (brute-forced
— the exchange-argument optimality made concrete), the expected-volume
chain must telescope with the independence model, and the accounting
recomputes from raw counts.
"""

from itertools import permutations

import pyarrow.parquet as pq

from ocrs_spark.ops.gateorder import GATE_COST, gate_order_plan
from ocrs_spark.ops.gatewaterfall import _GATES

SF = "/root/testdata/sf0.001"


def _py_counts(spark):
    rows = gate_order_plan(spark, SF).collect()
    n_docs = None
    # recompute n from entering_milli at position 1
    n_docs = rows[0].entering_milli and None
    stats = {r["gate"]: r["solo_rejects"] for r in rows}
    return stats, rows


def _plan_cost(order, n, rej):
    passes = 1
    denom = 0
    total = 0
    for k, g in enumerate(order):
        e = (1000 * n * passes) // (n**denom) if k else 1000 * n
        total += GATE_COST[g] * e
        passes *= n - rej[g]
        denom += 1
    return total


def test_plan_is_optimal_over_all_permutations(spark):
    rows = sorted(gate_order_plan(spark, SF).collect(), key=lambda r: r["position"])
    n = rows[0]["entering_milli"] // 1000
    rej = {r["gate"]: r["solo_rejects"] for r in rows}
    claimed = rows[0]["optimal_cost_milli"]
    best = min(
        _plan_cost(p, n, rej) for p in permutations(GATE_COST)
    )
    assert claimed == best
    # and the reported order achieves it
    assert _plan_cost([r["gate"] for r in rows], n, rej) == claimed
    # naive = the gatewaterfall definition order
    naive = _plan_cost([g for g, _, _ in _GATES], n, rej)
    assert rows[0]["naive_cost_milli"] == naive
    assert claimed <= naive


def test_volumes_telescope_and_ratios_rank(spark):
    rows = sorted(gate_order_plan(spark, SF).collect(), key=lambda r: r["position"])
    n = rows[0]["entering_milli"] // 1000
    # entering volumes never increase along the cascade
    vols = [r["entering_milli"] for r in rows]
    assert vols == sorted(vols, reverse=True)
    # ratio ordering is the claimed sort key
    ratios = [r["ratio_milli"] for r in rows]
    assert ratios == sorted(ratios, reverse=True)
    # solo counts match a direct corpus recompute for one gate
    t = pq.read_table(f"{SF}/documents.parquet", columns=["n_chars"])
    short = sum(1 for c in t["n_chars"].to_pylist() if c < 150)
    rej = {r["gate"]: r["solo_rejects"] for r in rows}
    assert rej["length"] == short
