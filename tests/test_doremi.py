"""Contracts for DoReMi-style domain reweighting (ops/doremi.py):
a full pure-Python recompute of the planted losses + multiplicative-
weights trajectory + allocation, and the economic invariants (harder
domains weigh more, the floor allocation never over-commits).
"""

import hashlib

import pyarrow.parquet as pq

from ocrs_spark.ops.doremi import (
    BASE_LOSS,
    ETA_DIV,
    NOISE_MOD,
    REF_LOSS_MILLI,
    ROUNDS,
    TOTAL_BUDGET,
    _SALT,
    domain_reweight_mw,
)

SF = "/root/testdata/sf0.001"


def _expected():
    tbl = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "lang"])
    agg = {}
    for doc_id, lang in zip(
        tbl["doc_id"].to_pylist(), tbl["lang"].to_pylist()
    ):
        noise = (
            int(hashlib.md5(f"{doc_id}{_SALT}".encode()).hexdigest()[:8], 16)
            % NOISE_MOD
        )
        excess = max(
            BASE_LOSS.get(lang, REF_LOSS_MILLI) + noise - REF_LOSS_MILLI, 0
        )
        n, s = agg.get(lang, (0, 0))
        agg[lang] = (n + 1, s + excess)
    rows = {}
    for lang, (n, s) in agg.items():
        mean = s // n
        w = 1000
        for _ in range(ROUNDS):
            w = (w * (1000 + mean // ETA_DIV)) // 1000
        rows[lang] = (n, mean, w)
    w_total = sum(w for _, _, w in rows.values())
    return {
        lang: (n, mean, w, (TOTAL_BUDGET * w) // w_total)
        for lang, (n, mean, w) in rows.items()
    }, w_total


def test_reweight_matches_python_recompute(spark):
    exp, w_total = _expected()
    got = {r["lang"]: r for r in domain_reweight_mw(spark, SF).collect()}
    assert set(got) == set(exp)
    for lang, (n, mean, w, alloc) in exp.items():
        r = got[lang]
        assert (
            r["n_docs"],
            r["mean_excess_milli"],
            r["weight_milli"],
            r["alloc_docs"],
        ) == (n, mean, w, alloc)
        assert r["weight_share"] == round(w / w_total, 6)


def test_reweight_invariants(spark):
    rows = domain_reweight_mw(spark, SF).collect()
    # floor division never over-commits the budget
    assert sum(r["alloc_docs"] for r in rows) <= TOTAL_BUDGET
    # harder domains (higher mean excess) never weigh less
    by_excess = sorted(rows, key=lambda r: r["mean_excess_milli"])
    weights = [r["weight_milli"] for r in by_excess]
    assert weights == sorted(weights)
    # every domain keeps at least its base weight (excess is clamped >= 0)
    assert all(r["weight_milli"] >= 1000 for r in rows)
    # the planted losses are non-degenerate: zh boosted strictly above en
    got = {r["lang"]: r["weight_milli"] for r in rows}
    assert got["zh"] > got["en"]
