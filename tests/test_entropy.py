"""Char-entropy gate semantics on planted degenerate inputs: padding
spam gates low, key-mash gates high, natural word-soup passes, and the
closed-form uniform case is exact. Parity lives in test_oracles.py."""

import math

from ocrs_spark.ops import entropy
from ocrs_spark.ops.entropy import char_entropy_gate


def _run(spark, monkeypatch, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    monkeypatch.setattr(entropy, "load_tables", lambda _s, _d, *_n: (df,))
    return {r.doc_id: r for r in char_entropy_gate(spark, ".").collect()}


def test_padding_spam_gates_low(spark, monkeypatch):
    out = _run(
        spark,
        monkeypatch,
        ["a" * 200, "the quick brown fox jumps over the lazy dog again and again"],
    )
    assert out[0].char_entropy == 0.0
    assert out[0].top_char_share == 1.0
    assert out[0].is_gibberish
    assert not out[1].is_gibberish
    assert 2.0 < out[1].char_entropy < 4.8


def test_keymash_gates_high(spark, monkeypatch):
    # 150 distinct codepoints once each: H = ln(150) ~ 5.01 > H_MAX.
    mash = "".join(chr(0x21 + i) for i in range(150))
    out = _run(spark, monkeypatch, [mash])
    assert out[0].distinct_chars == 150
    assert out[0].char_entropy == round(math.log(150), 6)
    assert out[0].is_gibberish


def test_uniform_closed_form(spark, monkeypatch):
    # "abab...": two chars, equal counts -> H = ln(2) exactly.
    out = _run(spark, monkeypatch, ["ab" * 40])
    assert out[0].char_entropy == round(math.log(2), 6)
    assert out[0].n_chars == 80
    assert out[0].distinct_chars == 2
    assert out[0].top_char_share == 0.5
    assert out[0].is_gibberish  # ln(2) < 2.0: repeated-pattern spam
