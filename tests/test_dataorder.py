"""Epoch-shuffle manifest semantics: every epoch is a permutation of
the full corpus, different epochs produce different orders, identical
seeds reproduce identical manifests. Cross-engine parity lives in
test_oracles.py."""

from ocrs_spark.ops import dataorder
from ocrs_spark.ops.dataorder import N_EPOCHS, N_SHARDS, epoch_shard_manifests


def _run(spark, monkeypatch, n_docs):
    df = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(n_docs)], ["doc_id", "text"]
    )
    monkeypatch.setattr(dataorder, "load_tables", lambda _s, _d, *_n: (df,))
    return epoch_shard_manifests(spark, ".").collect()


def test_each_epoch_is_a_full_partition(spark, monkeypatch):
    rows = _run(spark, monkeypatch, 200)
    assert len(rows) == N_EPOCHS * N_SHARDS
    for ep in range(N_EPOCHS):
        ep_rows = [r for r in rows if r.epoch == ep]
        assert sum(r.n_docs for r in ep_rows) == 200
        # Uniform key -> no shard grossly imbalanced (binomial noise).
        assert all(20 <= r.n_docs <= 80 for r in ep_rows)


def test_epochs_shuffle_differently(spark, monkeypatch):
    rows = _run(spark, monkeypatch, 200)
    by_epoch = {}
    for r in rows:
        by_epoch.setdefault(r.epoch, []).append(
            (r.shard, r.n_docs, r.first_doc, r.last_doc, r.order_checksum)
        )
    e0 = sorted(by_epoch[0])
    e1 = sorted(by_epoch[1])
    # Same corpus, different epoch salt: the manifests must differ
    # (shard membership and order both move).
    assert e0 != e1


def test_reproducible(spark, monkeypatch):
    r1 = sorted(tuple(r) for r in _run(spark, monkeypatch, 123))
    r2 = sorted(tuple(r) for r in _run(spark, monkeypatch, 123))
    assert r1 == r2
