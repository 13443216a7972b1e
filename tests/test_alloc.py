"""Contracts for Neyman eval-sample allocation (ops/alloc.py): a
pure-Python recompute (integer moments, sqrt weight, largest-remainder
apportionment), the sum(alloc) == BUDGET identity, and the
exactly-leftover-strata-get-extras structure.
"""

import math
from collections import defaultdict

import pyarrow.parquet as pq

from ocrs_spark.ops.alloc import BUDGET, eval_sample_allocation

SF = "/root/testdata/sf0.001"


def _py_alloc():
    t = pq.read_table(f"{SF}/documents.parquet", columns=["source", "n_chars"])
    mom = defaultdict(lambda: [0, 0, 0])  # n, s1, s2
    for src, x in zip(t["source"].to_pylist(), t["n_chars"].to_pylist()):
        m = mom[src]
        m[0] += 1
        m[1] += x
        m[2] += x * x
    w = {
        src: math.floor(math.sqrt(n * s2 - s1 * s1) * 1000)
        for src, (n, s1, s2) in mom.items()
    }
    wt = sum(w.values())
    base = {s: (BUDGET * wv) // wt for s, wv in w.items()}
    rem = {s: (BUDGET * wv) % wt for s, wv in w.items()}
    leftover = BUDGET - sum(base.values())
    order = sorted(w, key=lambda s: (-rem[s], s))
    extras = set(order[:leftover])
    return {
        s: (mom[s][0], w[s], base[s], int(s in extras), base[s] + (s in extras))
        for s in w
    }


def test_allocation_matches_python_recompute(spark):
    exp = _py_alloc()
    got = eval_sample_allocation(spark, SF).collect()
    assert len(got) == len(exp)
    for r in got:
        assert (
            r["n_docs"],
            r["weight_milli"],
            r["base_alloc"],
            r["extra"],
            r["alloc"],
        ) == exp[r["source"]]


def test_budget_exhausted_exactly(spark):
    rows = eval_sample_allocation(spark, SF).collect()
    assert sum(r["alloc"] for r in rows) == BUDGET
    assert all(r["alloc"] >= r["base_alloc"] for r in rows)
    assert all(r["extra"] in (0, 1) for r in rows)
    # non-degenerate: weights differ across strata and every stratum
    # with documents gets a positive allocation at this budget
    weights = {r["weight_milli"] for r in rows}
    assert len(weights) > 1
    assert all(r["alloc"] > 0 for r in rows)
