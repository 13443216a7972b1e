"""Margin-based bitext mining semantics on planted corpora: true
parallel pairs must be recovered as mutual best-margin, and the ratio
margin must discount hub vectors that are merely close to everything.
Cross-engine parity lives in test_oracles.py."""

import numpy as np
import pytest

from ocrs_spark.ops import bitext


def _emb_df(spark, vecs):
    rows = [(i, [float(v) for v in vec], 0) for i, vec in enumerate(vecs)]
    return spark.createDataFrame(rows, ["vec_id", "embedding", "label"])


def _mine(spark, monkeypatch, vecs):
    df = _emb_df(spark, vecs)
    monkeypatch.setattr(
        bitext, "load_tables", lambda _spark, _sf, *_names: (df,)
    )
    return {(r.src_id, r.tgt_id): r for r in
            bitext.bitext_margin_pairs(spark, ".").collect()}


def test_planted_parallel_pairs_are_mutual_best(spark, monkeypatch):
    rng = np.random.default_rng(7)
    base = rng.normal(size=(8, 64))
    vecs = list(base)
    # Plant two parallel pairs: tgt = src + tiny noise.
    # (0,1) and (2,3): even ids are source side, odd are target side.
    vecs[1] = vecs[0] + rng.normal(scale=0.01, size=64)
    vecs[3] = vecs[2] + rng.normal(scale=0.01, size=64)
    out = _mine(spark, monkeypatch, vecs)
    assert (0, 1) in out and (2, 3) in out
    assert out[(0, 1)].cos > 0.99
    # With the selective 8x8 bands random decoys rarely survive as
    # candidates, so an isolated true pair's neighborhood is itself and
    # its margin is exactly 1 — the ratio can only exceed 1 when decoy
    # candidates dilute the penalty average.
    assert out[(0, 1)].margin >= 1.0
    # Mutual-best means each side appears at most once.
    srcs = [s for s, _ in out]
    tgts = [t for _, t in out]
    assert len(srcs) == len(set(srcs)) and len(tgts) == len(set(tgts))


def test_margin_discounts_hub_vectors(spark, monkeypatch):
    rng = np.random.default_rng(11)
    a = rng.normal(size=64)
    b = rng.normal(size=64)
    # Source side: two distinct directions (ids 0, 2) plus noise dims.
    # Target side: their true counterparts (ids 1, 3) and a HUB (id 5)
    # built as the normalized midpoint — closer to both sources than
    # random, but each source's true mate must still win on margin.
    vecs = [
        a,                                       # 0 src
        a + rng.normal(scale=0.02, size=64),     # 1 tgt: mate of 0
        b,                                       # 2 src
        b + rng.normal(scale=0.02, size=64),     # 3 tgt: mate of 2
        rng.normal(size=64),                     # 4 src: decoy
        (a + b) / np.linalg.norm(a + b) * np.linalg.norm(a),  # 5 tgt: hub
    ]
    out = _mine(spark, monkeypatch, vecs)
    assert (0, 1) in out
    assert (2, 3) in out
    # The hub must not displace either true mate.
    assert (0, 5) not in out and (2, 5) not in out


def test_deterministic(spark, monkeypatch):
    # A clustered corpus (shared direction + moderate noise) keeps all
    # cross pairs above the banding's collision threshold, so the
    # candidate set — and therefore the output — is non-empty.
    rng = np.random.default_rng(3)
    base = rng.normal(size=64)
    vecs = [base + rng.normal(scale=0.3, size=64) for _ in range(10)]
    df = _emb_df(spark, vecs)
    monkeypatch.setattr(
        bitext, "load_tables", lambda _spark, _sf, *_names: (df,)
    )
    r1 = sorted(tuple(r) for r in bitext.bitext_margin_pairs(spark, ".").collect())
    r2 = sorted(tuple(r) for r in bitext.bitext_margin_pairs(spark, ".").collect())
    assert r1 == r2 and len(r1) > 0
