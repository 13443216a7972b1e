"""Contracts for resharding-cost planning (ops/reshard.py): a pure-
Python recompute of both placement schemes, the defining consistent-
hashing invariant (a key that moves can only move TO the new shard),
and the cost separation the op exists to expose.
"""

import hashlib

import pyarrow.parquet as pq

from ocrs_spark.ops.reshard import (
    N_NEW,
    N_OLD,
    RING_NEW,
    RING_OLD,
    _SALT,
    reshard_move_plan,
)

SF = "/root/testdata/sf0.001"


def _h(doc_id):
    return int(
        hashlib.md5(f"{doc_id}|{_SALT}".encode()).hexdigest()[:8], 16
    )


def _owner(ring, h):
    for pos, shard in ring:  # ring is sorted by position
        if pos >= h:
            return shard
    return ring[0][1]  # wrap


def _doc_hashes():
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id"])
    return [_h(d) for d in t["doc_id"].to_pylist()]


def test_move_plan_matches_python_recompute(spark):
    hashes = _doc_hashes()
    exp = {
        "mod": sum(h % N_OLD != h % N_NEW for h in hashes),
        "ring": sum(
            _owner(RING_OLD, h) != _owner(RING_NEW, h) for h in hashes
        ),
    }
    rows = {r["strategy"]: r for r in reshard_move_plan(spark, SF).collect()}
    assert set(rows) == {"mod", "ring"}
    for strat, r in rows.items():
        assert r["n_docs"] == len(hashes)
        assert r["moved_docs"] == exp[strat]
        assert r["moved_milli"] == (1000 * exp[strat]) // len(hashes)


def test_ring_moves_only_to_the_new_shard(spark):
    # THE consistent-hashing property: growing the ring only inserts
    # shard N_OLD's vnodes, so any key whose owner changes must now be
    # owned by the NEW shard — old shards never trade keys with each
    # other. (mod-N placement violates this wildly: that's the bill.)
    for h in _doc_hashes():
        old, new = _owner(RING_OLD, h), _owner(RING_NEW, h)
        if old != new:
            assert new == N_OLD
    # And the separation the planner reports: ring must move strictly
    # less than mod when growing 8 -> 9.
    rows = {r["strategy"]: r for r in reshard_move_plan(spark, SF).collect()}
    assert 0 < rows["ring"]["moved_docs"] < rows["mod"]["moved_docs"]
