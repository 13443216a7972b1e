"""Content-defined chunking semantics: the defining CDC property is
shift resilience — prepending bytes to a shared passage moves every
offset but leaves downstream chunk hashes identical, so chunk-level
dedup still finds the duplication that fixed-size blocks would miss.
Cross-engine parity lives in test_oracles.py."""

import numpy as np

from ocrs_spark.ops import cdc
from ocrs_spark.ops.cdc import CDC_W, cdc_chunk_dedup


def _run(spark, monkeypatch, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    monkeypatch.setattr(cdc, "load_tables", lambda _s, _d, *_n: (df,))
    return {r.doc_id: r for r in cdc_chunk_dedup(spark, ".").collect()}


def test_shift_resilience(spark, monkeypatch):
    # A long shared passage, and a twin with an inserted prefix: every
    # byte offset differs, yet all interior chunk boundaries (defined
    # by content) realign, so most chunks dedup against the original.
    rng = np.random.default_rng(5)
    shared = "".join(rng.choice(list("abcdefgh ")) for _ in range(400))
    docs = [shared, "PREFIX-INSERTED-" + shared]
    out = _run(spark, monkeypatch, docs)
    # Both docs must report substantial chunk-level duplication: only
    # the head chunk (and possibly the first boundary-straddling one)
    # can differ.
    assert out[0].n_chunks > 5
    assert out[0].dup_chunks >= out[0].n_chunks - 2
    assert out[1].dup_chunks >= out[1].n_chunks - 2
    assert out[0].dup_chunk_frac > 0.5


def test_unique_content_has_no_dup_chunks(spark, monkeypatch):
    rng = np.random.default_rng(9)
    a = "".join(rng.choice(list("abcdefghijklmnop ")) for _ in range(300))
    b = "".join(rng.choice(list("qrstuvwxyz0123 ")) for _ in range(300))
    out = _run(spark, monkeypatch, [a, b])
    assert out[0].dup_chunks == 0 and out[1].dup_chunks == 0
    assert out[0].dup_chunk_frac == 0.0


def test_short_doc_is_one_chunk(spark, monkeypatch):
    short = "tiny"
    assert len(short) < CDC_W
    out = _run(spark, monkeypatch, [short, "another unique doc text here"])
    assert out[0].n_chunks == 1
    assert out[0].dup_chunks == 0


def test_identical_docs_fully_dedup(spark, monkeypatch):
    rng = np.random.default_rng(13)
    t = "".join(rng.choice(list("abcdef gh")) for _ in range(250))
    out = _run(spark, monkeypatch, [t, t])
    assert out[0].n_chunks == out[1].n_chunks
    assert out[0].dup_chunks == out[0].n_chunks
    assert out[0].dup_chunk_frac == 1.0
