"""GD logistic-regression trainer semantics: the distributed loop must
reproduce an independent numpy implementation of the same fixed
hyperparameters, descend the loss, and beat chance on a separable
fixture. Cross-engine parity lives in test_oracles.py."""

import math

import numpy as np
import pytest

from ocrs_spark.ops.logreg import (
    D,
    ITERATIONS,
    LEARNING_RATE,
    train_logreg,
)

SF_DIR = "/root/testdata/sf0.001"


def _numpy_reference(sf_dir):
    import duckdb

    X, y = duckdb.sql(
        f"SELECT embedding, label FROM read_parquet('{sf_dir}/embeddings.parquet')"
    ).fetchnumpy().values()
    X = np.stack([np.asarray(v, np.float64)[:D] for v in X])
    y = (np.asarray(y) < 5).astype(np.float64)
    Xb = np.hstack([X, np.ones((len(y), 1))])
    w = np.zeros(D + 1)
    for _ in range(ITERATIONS):
        p = 1.0 / (1.0 + np.exp(-(Xb @ w)))
        w -= LEARNING_RATE * (Xb.T @ (p - y)) / len(y)
    p = 1.0 / (1.0 + np.exp(-(Xb @ w)))
    loss = float(np.mean(-y * np.log(p) - (1 - y) * np.log(1 - p)))
    acc = float(np.mean((p >= 0.5).astype(np.float64) == y))
    return w, loss, acc


def test_matches_numpy_reference(spark):
    rows = sorted(train_logreg(spark, SF_DIR).collect(), key=lambda r: r.feature_idx)
    w, loss, acc = _numpy_reference(SF_DIR)
    assert [r.feature_idx for r in rows] == list(range(D + 1))
    for r in rows:
        assert r.weight == pytest.approx(round(w[r.feature_idx], 6), abs=2e-6)
        assert r.train_loss == pytest.approx(round(loss, 6), abs=2e-6)
        assert r.accuracy == pytest.approx(round(acc, 6), abs=2e-6)


def test_loss_descends_from_chance(spark):
    rows = train_logreg(spark, SF_DIR).collect()
    # At w=0 the log-loss is exactly ln 2; two GD steps must lower it.
    assert rows[0].train_loss < math.log(2.0)
    # Weights actually moved.
    assert any(abs(r.weight) > 0 for r in rows)


def test_separable_fixture_learns_the_sign(spark, tmp_path):
    # Plant a corpus where x0's sign determines the class: the trained
    # w0 must be strongly negative (y=1 iff label<5 iff x0<0 here).
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(7)
    n = 400
    x0 = rng.normal(0, 1, n).astype(np.float32)
    rest = rng.normal(0, 0.01, (n, 63)).astype(np.float32)
    emb = [np.concatenate(([a], b)).tolist() for a, b in zip(x0, rest)]
    label = np.where(x0 < 0, 1, 9).astype(np.int32)  # label<5 <=> x0<0
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(n), pa.int64()),
                "embedding": pa.array(emb, pa.list_(pa.float32())),
                "label": pa.array(label, pa.int32()),
            }
        ),
        str(tmp_path / "embeddings.parquet"),
    )
    rows = {r.feature_idx: r for r in train_logreg(spark, str(tmp_path)).collect()}
    assert rows[0].weight < -0.5
    assert rows[0].accuracy > 0.9
