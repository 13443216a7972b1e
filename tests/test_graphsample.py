"""Bounded-fanout neighbor-sampling semantics over the extracted link
graph: the fanout cap must hold at both hops (the skew bound IS the
operator), every seed with neighbors must be covered, and the sample
must be reproducible. Cross-engine parity lives in test_oracles.py."""

from collections import Counter

from ocrs_spark.ops.graphsample import FANOUT, N_SEEDS, sample_two_hop

SF_DIR = "/root/testdata/sf0.001"


def test_fanout_bound_holds_at_both_hops(spark):
    rows = sample_two_hop(spark, SF_DIR).collect()
    assert rows, "sampling produced no support paths"
    # Hop 1: distinct mids per seed <= FANOUT.
    mids = {}
    for r in rows:
        mids.setdefault(r.seed_id, set()).add(r.mid_id)
    assert all(len(v) <= FANOUT for v in mids.values())
    # Hop 2: nbrs per (seed, mid) <= FANOUT.
    c = Counter((r.seed_id, r.mid_id) for r in rows)
    assert max(c.values()) <= FANOUT
    # Batch-size bound: O(seeds * FANOUT^2) regardless of degree.
    assert len(rows) <= N_SEEDS * FANOUT * FANOUT


def test_all_connected_seeds_covered(spark):
    rows = sample_two_hop(spark, SF_DIR).collect()
    seeds = {r.seed_id for r in rows}
    # Every planted-formula seed has out-degree 2 (linkgraph contract),
    # hence undirected neighbors, hence support paths.
    assert seeds == set(range(N_SEEDS))
    assert all(0 <= s < N_SEEDS for s in seeds)


def test_reproducible(spark):
    r1 = [tuple(r) for r in sample_two_hop(spark, SF_DIR).collect()]
    r2 = [tuple(r) for r in sample_two_hop(spark, SF_DIR).collect()]
    assert r1 == r2
