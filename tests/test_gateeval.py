"""Cohen's kappa semantics on hand-built contingencies: perfect
agreement -> kappa 1, independence-shaped tables -> kappa ~ 0,
unanimity degenerates to 0 by convention. The corpus-scale cross-
engine check lives in test_oracles.py."""

import pytest

from ocrs_spark.ops import gateeval
from ocrs_spark.ops.gateeval import gate_agreement_kappa


def _patch(monkeypatch, spark, flags):
    """flags: list of (g_keep, e_keep) per doc."""
    g = spark.createDataFrame(
        [(i, bool(a)) for i, (a, _) in enumerate(flags)], ["doc_id", "keep"]
    )
    e = spark.createDataFrame(
        [(i, not bool(b)) for i, (_, b) in enumerate(flags)],
        ["doc_id", "is_gibberish"],
    )
    monkeypatch.setattr(
        gateeval, "gopher_quality_signals", lambda _s, _d: g
    )
    monkeypatch.setattr(gateeval, "char_entropy_gate", lambda _s, _d: e)


def test_perfect_agreement_is_kappa_one(spark, monkeypatch):
    flags = [(1, 1)] * 30 + [(0, 0)] * 20
    _patch(monkeypatch, spark, flags)
    row = gate_agreement_kappa(spark, ".").collect()[0]
    assert row.raw_agreement == 1.0
    assert row.kappa == 1.0
    assert (row.n_both_keep, row.n_both_drop) == (30, 20)


def test_independent_gates_have_zero_kappa(spark, monkeypatch):
    # Exact independence: P(g)=1/2, P(e)=1/2, all four cells 25.
    flags = [(1, 1)] * 25 + [(1, 0)] * 25 + [(0, 1)] * 25 + [(0, 0)] * 25
    _patch(monkeypatch, spark, flags)
    row = gate_agreement_kappa(spark, ".").collect()[0]
    assert row.raw_agreement == 0.5
    assert row.kappa == 0.0


def test_unanimity_degenerates_to_zero(spark, monkeypatch):
    flags = [(1, 1)] * 40  # everyone keeps everything: pe = 1
    _patch(monkeypatch, spark, flags)
    row = gate_agreement_kappa(spark, ".").collect()[0]
    assert row.raw_agreement == 1.0
    assert row.kappa == 0.0


def test_hand_computed_kappa(spark, monkeypatch):
    # Cells: 40/10/5/45 -> po=.85, pe=(50*45+55*50)/100^2=.5 -> k=0.7.
    flags = [(1, 1)] * 40 + [(1, 0)] * 10 + [(0, 1)] * 5 + [(0, 0)] * 45
    _patch(monkeypatch, spark, flags)
    row = gate_agreement_kappa(spark, ".").collect()[0]
    assert row.raw_agreement == 0.85
    assert row.kappa == pytest.approx(0.7, abs=1e-6)
