"""Contracts for pointer-jumping canonical resolution
(ops/canonical.py): a pure-Python walk of the planted chains, terminal
fixpoint (every canonical_id maps to itself), hop-distance structure,
and the log-round bound actually sufficing for the planted max chain.
"""

import pyarrow.parquet as pq

from ocrs_spark.ops.canonical import (
    CHAIN_LEN,
    CHAIN_MOD,
    _rounds,
    canonical_resolution,
)

SF = "/root/testdata/sf0.001"


def _py_resolve(doc_id):
    cur, hops = doc_id, 0
    while 1 <= cur % CHAIN_MOD <= CHAIN_LEN:
        cur -= 1
        hops += 1
    return cur, hops


def test_resolution_matches_python_walk(spark):
    ids = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id"])[
        "doc_id"
    ].to_pylist()
    exp = {d: _py_resolve(d) for d in ids}
    got = canonical_resolution(spark, SF).collect()
    assert len(got) == len(exp)
    for r in got:
        assert (r["canonical_id"], r["n_hops"]) == exp[r["doc_id"]]


def test_fixpoint_and_round_bound(spark):
    rows = {r["doc_id"]: r for r in canonical_resolution(spark, SF).collect()}
    hops = [r["n_hops"] for r in rows.values()]
    # every canonical target is itself terminal (true fixpoint)
    for r in rows.values():
        tgt = rows.get(r["canonical_id"])
        if tgt is not None:
            assert tgt["canonical_id"] == r["canonical_id"]
            assert tgt["n_hops"] == 0
    # the planted max chain is fully resolved and present
    assert max(hops) == CHAIN_LEN
    assert min(hops) == 0
    # pointer doubling reaches the max chain within the declared rounds
    # (r6: the former extra fixpoint-proof round was dropped; the bound
    # is exactly 2^rounds >= CHAIN_LEN)
    assert (1 << _rounds()) >= CHAIN_LEN
    assert (1 << (_rounds() - 1)) < CHAIN_LEN  # and not one round more
