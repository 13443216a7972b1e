"""Link-graph extraction + PageRank semantics (oracle parity is covered
by tests/test_oracles.py; these pin the properties the oracle can't
see: distractor filtering, exact mass conservation, determinism)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ocrs_spark.ops.linkgraph import (
    ITERATIONS,
    _linked_html,
    _targets,
    link_graph_edges,
    pagerank_links,
)

SF = "/root/testdata/sf0.001"


def test_planted_page_contains_only_two_doc_anchors():
    html = _linked_html(11, "hello world", 500)
    t1, t2 = _targets(11, 500)
    assert f'href="/doc/{t1}"' in html and f'href="/doc/{t2}"' in html
    # distractors present: external /doc/ URL and a commented-out anchor
    assert "example.com/doc/999" in html and "<!--" in html


def test_edges_filter_distractors_and_have_out_degree_two(spark):
    edges = link_graph_edges(spark, SF)
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert edges.count() == 2 * n_docs
    degrees = edges.groupBy("src").count()
    assert degrees.filter("count <> 2").count() == 0
    # the external host's target 999 is only an edge if some formula
    # target equals 999; the commented-out /doc/0 must never add a
    # third edge for any src
    by_src = edges.groupBy("src").agg(F.collect_set("dst").alias("dsts"))
    row = by_src.filter("src = 3").collect()[0]
    assert set(row.dsts) == set(_targets(3, n_docs))


def test_pagerank_conserves_mass_exactly(spark):
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    ranks = pagerank_links(spark, SF)
    total = ranks.agg(F.sum("pagerank").alias("s")).collect()[0].s
    # out-degree 2 everywhere + damping 7/8 keeps every quantity a
    # dyadic rational, so the invariant sum(rank) == N holds EXACTLY
    # in IEEE doubles, not approximately
    assert total == float(n_docs)


def test_pagerank_deterministic_across_runs(spark):
    a = {r.doc_id: r.pagerank for r in pagerank_links(spark, SF).collect()}
    b = {r.doc_id: r.pagerank for r in pagerank_links(spark, SF).collect()}
    assert a == b
    assert len(a) == 500
    assert all(v >= 0.125 for v in a.values())  # teleport floor


def test_pagerank_favors_in_degree(spark):
    edges = link_graph_edges(spark, SF)
    indeg = {r.dst: r["count"] for r in edges.groupBy("dst").count().collect()}
    ranks = {r.doc_id: r.pagerank for r in pagerank_links(spark, SF).collect()}
    zero_in = [d for d in ranks if d not in indeg]
    if zero_in:
        hot = max(indeg, key=indeg.get)
        assert ranks[hot] > max(ranks[d] for d in zero_in)
    assert ITERATIONS == 5  # the oracle SQL is unrolled for exactly this


def test_bfs_depths_satisfy_shortest_path_invariants(spark):
    """BFS structural invariants, independent of the SQL oracle: seeds
    sit at depth 0, every deeper node has an in-neighbor exactly one
    level up (tight triangle inequality for unweighted BFS), and no
    edge skips more than one level downward."""
    from ocrs_spark.ops.linkgraph import BFS_SEEDS, crawl_depth_bfs, link_graph_edges

    depths = {
        r["doc_id"]: r["depth"] for r in crawl_depth_bfs(spark, SF).collect()
    }
    edges = [(r["src"], r["dst"]) for r in link_graph_edges(spark, SF).collect()]
    assert all(depths[s] == 0 for s in range(BFS_SEEDS))
    assert max(depths.values()) > 1  # multi-round, not a one-hop fixture
    preds = {}
    for s, d in edges:
        if s in depths and d in depths:
            # an edge can close at most one level of distance
            assert depths[d] <= depths[s] + 1
            preds.setdefault(d, set()).add(depths[s])
    for node, dep in depths.items():
        if dep > 0:
            assert dep - 1 in preds[node]  # a witness predecessor exists


def test_hits_matches_numpy_power_iteration(spark):
    """Spark HITS == a straight numpy power iteration on the same gated
    edge list (integer arithmetic, so equality is exact), and the spam
    gate actually de-regularizes the graph (non-constant scores)."""
    import numpy as np

    from ocrs_spark.ops.linkgraph import (
        HITS_ITERATIONS,
        HITS_SPAM_MOD,
        hits_scores,
        link_graph_edges,
    )

    n = spark.read.parquet(f"{SF}/documents.parquet").count()
    raw = [(r.src, r.dst) for r in link_graph_edges(spark, SF).collect()]
    gated = [(s, d) for s, d in raw if (s + d) % HITS_SPAM_MOD != 0]
    h = np.ones(n, dtype=np.int64)
    a = np.zeros(n, dtype=np.int64)
    for _ in range(HITS_ITERATIONS):
        a = np.zeros(n, dtype=np.int64)
        for s, d in gated:
            a[d] += h[s]
        h = np.zeros(n, dtype=np.int64)
        for s, d in gated:
            h[s] += a[d]
    out = {
        r.doc_id: (r.hub_score, r.authority_score)
        for r in hits_scores(spark, SF).collect()
    }
    assert len(out) == n
    assert all(out[i] == (h[i], a[i]) for i in range(n))
    assert len({v[0] for v in out.values()}) > 1  # hubs differentiated
    assert len({v[1] for v in out.values()}) > 1  # authorities too

    # Why the gate exists: the raw planted graph is exactly 2-in/2-out
    # regular, where un-normalized HITS is provably constant — every
    # iteration multiplies the all-ones vector by the constant row sum.
    ra = np.zeros(n, dtype=np.int64)
    for s, d in raw:
        ra[d] += 1
    assert len(set(ra.tolist())) == 1


def test_link_prediction_ra_exact_and_complete(spark):
    """Every predicted pair is a real non-adjacent wedge pair with the
    exact common-neighbor count and integer RA score; every wedge pair
    in the graph is either adjacent or predicted (completeness)."""
    import itertools
    from collections import defaultdict

    from ocrs_spark.ops.linkgraph import (
        RA_SCALE,
        link_graph_edges,
        link_prediction_ra,
    )

    raw = [(r.src, r.dst) for r in link_graph_edges(spark, SF).collect()]
    und = set()
    for s, d in raw:
        if s != d:
            und.add((s, d))
            und.add((d, s))
    nbrs = defaultdict(set)
    for s, d in und:
        nbrs[s].add(d)
    pred = {
        (r.doc_a, r.doc_b): (r.common_neighbors, r.ra_score_micro)
        for r in link_prediction_ra(spark, SF).collect()
    }
    assert pred and all(a < b for a, b in pred)
    for (a, b), (cn, score) in pred.items():
        assert (a, b) not in und
        common = nbrs[a] & nbrs[b]
        assert len(common) == cn
        assert score == sum(RA_SCALE // len(nbrs[w]) for w in common)
    covered = 0
    for w, ns in nbrs.items():
        for a, b in itertools.combinations(sorted(ns), 2):
            if (a, b) not in und:
                assert (a, b) in pred
                covered += 1
    assert covered > 0
