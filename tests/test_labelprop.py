"""Frozen-frontier label propagation semantics: majority vote, smallest-
label tie-break, seed clamping, hop layering, and unreachable nodes
staying unlabeled. Cross-engine parity lives in test_oracles.py."""

from ocrs_spark.ops.labelprop import N_SEEDS, label_propagation, propagate

SF_DIR = "/root/testdata/sf0.001"


def _graph(spark, edges, seeds):
    und = list({(a, b) for a, b in edges} | {(b, a) for a, b in edges})
    adj = spark.createDataFrame(und, "src bigint, dst bigint")
    s = spark.createDataFrame(
        [(d, l, 0) for d, l in seeds], "doc_id bigint, label string, hops int"
    )
    return adj, s


def test_majority_wins_and_tie_breaks_to_smallest(spark):
    # Node 10 hears two 'good' seeds and one 'spam' seed -> 'good'.
    # Node 11 hears one of each -> tie -> lexicographically smaller 'good'.
    adj, seeds = _graph(
        spark,
        [(0, 10), (1, 10), (2, 10), (0, 11), (2, 11)],
        [(0, "good"), (1, "good"), (2, "spam")],
    )
    out = {r.doc_id: (r.label, r.hops) for r in propagate(adj, seeds).collect()}
    assert out[10] == ("good", 1)
    assert out[11] == ("good", 1)


def test_layered_hops_and_freezing(spark):
    # Chain 0 - 10 - 20: node 20 is reached in round 2 via node 10's
    # round-1 label; node 10's label never re-votes in round 2.
    adj, seeds = _graph(spark, [(0, 10), (10, 20)], [(0, "good")])
    out = {r.doc_id: (r.label, r.hops) for r in propagate(adj, seeds).collect()}
    assert out[0] == ("good", 0)
    assert out[10] == ("good", 1)
    assert out[20] == ("good", 2)


def test_unreachable_stays_unlabeled(spark):
    adj, seeds = _graph(spark, [(0, 10), (30, 40)], [(0, "good")])
    out = {r.doc_id for r in propagate(adj, seeds).collect()}
    assert 30 not in out and 40 not in out


def test_corpus_run_is_layered_and_clamped(spark):
    rows = label_propagation(spark, SF_DIR).collect()
    by_id = {r.doc_id: r for r in rows}
    docs = {
        r.doc_id: r.lang
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    }
    # Seeds present, clamped to their own lang, hops 0.
    for d in range(N_SEEDS):
        assert by_id[d].hops == 0 and by_id[d].label == docs[d]
    # Non-seeds carry hops in {1, 2} and a label drawn from seed langs.
    seed_langs = {docs[d] for d in range(N_SEEDS)}
    non_seeds = [r for r in rows if r.doc_id >= N_SEEDS]
    assert non_seeds, "propagation reached no non-seed nodes"
    assert all(r.hops in (1, 2) and r.label in seed_langs for r in non_seeds)
    # Determinism.
    again = {(r.doc_id, r.label, r.hops) for r in label_propagation(spark, SF_DIR).collect()}
    assert again == {(r.doc_id, r.label, r.hops) for r in rows}
