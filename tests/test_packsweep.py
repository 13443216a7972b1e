"""Contracts for the packing-efficiency budget sweep
(ops/packing.py::packing_efficiency_sweep): a pure-Python recompute of
every per-budget statistic from the same doc_id-ordered token stream,
plus the cross-budget monotonicity the sweep exists to expose.
"""

import pyarrow.parquet as pq

from ocrs_spark.ops.packing import SWEEP_BUDGETS, packing_efficiency_sweep

SF = "/root/testdata/sf0.001"


def _expected():
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    rows = sorted(
        (d, len([w for w in txt.split(" ") if w]))
        for d, txt in zip(t["doc_id"].to_pylist(), t["text"].to_pylist())
    )
    out = {}
    for b in SWEEP_BUDGETS:
        start = 0
        straddled = aligned = total = 0
        for _, n in rows:
            if n > 0 and (start + n - 1) // b > start // b:
                straddled += 1
            if start % b == 0:
                aligned += 1
            total += n
            start += n
        windows = (total + b - 1) // b
        out[b] = {
            "n_docs": len(rows),
            "total_tokens": total,
            "straddled_docs": straddled,
            "aligned_docs": aligned,
            "straddle_milli": (1000 * straddled) // len(rows),
            "n_windows": windows,
            "last_fill_milli": (1000 * (total - (windows - 1) * b)) // b,
        }
    return out


def test_sweep_matches_python_recompute(spark):
    exp = _expected()
    got = packing_efficiency_sweep(spark, SF).collect()
    assert len(got) == len(SWEEP_BUDGETS)
    for r in got:
        e = exp[r["budget"]]
        for k, v in e.items():
            assert r[k] == v, (r["budget"], k, r[k], v)


def test_straddle_grows_with_budget_halving(spark):
    # Halving the window size can only create MORE boundaries inside
    # the same token stream, so straddled_docs is non-increasing in
    # budget — the trade-off curve the sweep is for.
    rows = {r["budget"]: r for r in packing_efficiency_sweep(spark, SF).collect()}
    budgets = sorted(rows)
    for small, large in zip(budgets, budgets[1:]):
        assert rows[small]["straddled_docs"] >= rows[large]["straddled_docs"]
        assert rows[small]["n_windows"] >= rows[large]["n_windows"]
    # Every budget sees the same corpus.
    totals = {r["total_tokens"] for r in rows.values()}
    docs = {r["n_docs"] for r in rows.values()}
    assert len(totals) == 1 and len(docs) == 1
