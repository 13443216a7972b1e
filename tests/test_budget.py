"""Waterfilling epoch allocation on hand-computed corpora: the water
level lambda must cap low-tolerance sources at their epoch cap, give
everyone else exactly lambda, and spend the budget to the token.
Cross-engine parity lives in test_oracles.py."""

import pytest

from ocrs_spark.ops import budget
from ocrs_spark.ops.budget import N_SOURCES, TARGET_EPOCHS, token_budget_epochs


def _run(spark, monkeypatch, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    monkeypatch.setattr(budget, "load_tables", lambda _s, _d, *_n: (df,))
    return {r.source: r for r in token_budget_epochs(spark, ".").collect()}


def test_hand_computed_water_level(spark, monkeypatch):
    # One 10-token doc per source 0..5; caps are [1,2,3,4,1,2].
    # T=60, B=2*60=120. Walking caps ascending, the level crosses 120
    # in the cap-3 segment: lambda = (120-60)/(60-40) = 3.0 exactly.
    assert N_SOURCES == 6 and TARGET_EPOCHS == 2
    texts = [" ".join(f"w{i}x{j}" for j in range(10)) for i in range(6)]
    out = _run(spark, monkeypatch, texts)
    expect = {0: 1.0, 1: 2.0, 2: 3.0, 3: 3.0, 4: 1.0, 5: 2.0}
    got = {s: r.epochs for s, r in out.items()}
    assert got == expect
    # The allocation spends the budget exactly.
    assert sum(r.alloc_tokens for r in out.values()) == pytest.approx(120.0)
    assert all(r.tokens == 10 for r in out.values())


def test_budget_beyond_capacity_caps_everyone(spark, monkeypatch):
    # Sources 0 and 4 only (both cap 1): full capacity = 1 epoch each,
    # far below TARGET_EPOCHS * T -> the clamp kicks in and everyone
    # runs exactly at cap.
    texts_by_source = {0: 8, 4: 12}
    texts = []
    for i in range(6):
        if i in texts_by_source:
            texts.append(" ".join(f"t{i}n{j}" for j in range(texts_by_source[i])))
        else:
            texts.append(None)
    rows = [(i, t) for i, t in enumerate(texts) if t is not None]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    monkeypatch.setattr(budget, "load_tables", lambda _s, _d, *_n: (df,))
    out = {r.source: r for r in token_budget_epochs(spark, ".").collect()}
    assert out[0].epochs == 1.0 and out[4].epochs == 1.0
    assert out[0].alloc_tokens == 8.0 and out[4].alloc_tokens == 12.0


def test_uncapped_when_budget_below_min_cap(spark, monkeypatch):
    # All sources cap >= 1; shrink the corpus so lambda < 1 never
    # happens with TARGET_EPOCHS=2 — instead verify the uniform case:
    # all caps equal (sources 0 and 4, caps 1) with budget clamped to
    # capacity gives epochs == cap uniformly (degenerate water level).
    texts = [
        " ".join(f"a{j}" for j in range(5)),
        None, None, None,
        " ".join(f"b{j}" for j in range(5)),
        None,
    ]
    rows = [(i, t) for i, t in enumerate(texts) if t is not None]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    monkeypatch.setattr(budget, "load_tables", lambda _s, _d, *_n: (df,))
    out = {r.source: r for r in token_budget_epochs(spark, ".").collect()}
    assert set(out) == {0, 4}
    assert all(r.epochs == 1.0 for r in out.values())
