"""DSIR importance-resampling semantics on a hand-built corpus:
docs stuffed with target-domain tokens must outrank off-domain docs,
the target-seed rule (>= TARGET_MIN_HITS 'spark' tokens) must be
honored, and weights must be finite/deterministic. The corpus-scale
DuckDB parity lives in test_oracles.py."""

import math

from ocrs_spark.ops import dsir
from ocrs_spark.ops.dsir import TARGET_MIN_HITS, _doc_bucket_counts


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )


def test_target_flag_threshold(spark):
    texts = [
        "spark spark spark runs jobs",      # 3 hits -> target
        "spark spark only two mentions",    # 2 hits -> not target
        "nothing relevant here at all",     # 0 hits -> not target
    ]
    db = _doc_bucket_counts(_docs(spark, texts))
    flags = {
        r.doc_id: r.is_target
        for r in db.select("doc_id", "is_target").distinct().collect()
    }
    assert TARGET_MIN_HITS == 3
    assert flags == {0: True, 1: False, 2: False}


def test_in_domain_docs_outrank_off_domain(spark, monkeypatch, tmp_path):
    # Seed docs define the target distribution; a fresh doc that reuses
    # the seeds' vocabulary must score above one that shares nothing.
    seeds = [
        "spark spark spark cluster shuffle partition executor",
        "spark spark spark catalyst tungsten codegen stage",
    ]
    in_domain = "cluster shuffle partition executor catalyst stage"
    off_domain = "banana orchard harvest ripens yellow fruit basket"
    docs = _docs(spark, seeds + [in_domain, off_domain])

    monkeypatch.setattr(
        dsir, "load_tables", lambda _spark, _sf, *_names: (docs,)
    )
    rows = dsir.dsir_importance_sample(spark, str(tmp_path)).collect()
    w = {r.doc_id: r.logw for r in rows}
    assert all(math.isfinite(v) for v in w.values())
    # Seeds themselves are maximally in-domain; the vocabulary-sharing
    # doc (id 2) must beat the disjoint one (id 3).
    assert w[2] > w[3]
    # n_feats = unigrams + bigrams = 2*len - 1 for space-split text.
    feats = {r.doc_id: r.n_feats for r in rows}
    assert feats[2] == 2 * 6 - 1
    assert feats[3] == 2 * 7 - 1


def test_deterministic_across_runs(spark, monkeypatch, tmp_path):
    texts = ["spark spark spark a b c", "d e f g h", "a b c d e"]
    docs = _docs(spark, texts)
    monkeypatch.setattr(
        dsir, "load_tables", lambda _spark, _sf, *_names: (docs,)
    )
    r1 = [tuple(r) for r in dsir.dsir_importance_sample(spark, ".").collect()]
    r2 = [tuple(r) for r in dsir.dsir_importance_sample(spark, ".").collect()]
    assert r1 == r2
