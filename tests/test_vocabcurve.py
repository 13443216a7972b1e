"""Contracts for the vocabulary coverage curve (ops/vocabcurve.py):
a pure-Python recompute over the real corpus, plus the defining
minimality property — one fewer token must NOT reach the threshold.
"""

import pyarrow.parquet as pq

from ocrs_spark.ops.vocabcurve import THRESHOLDS, vocab_coverage_curve

SF = "/root/testdata/sf0.001"


def _ranked_counts():
    t = pq.read_table(f"{SF}/documents.parquet", columns=["text"])
    counts = {}
    for txt in t["text"].to_pylist():
        for w in txt.split(" "):
            if w:
                counts[w] = counts.get(w, 0) + 1
    return sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))


def test_curve_matches_python_recompute(spark):
    ranked = _ranked_counts()
    total = sum(c for _, c in ranked)
    rows = {r["coverage_pct"]: r for r in vocab_coverage_curve(spark, SF).collect()}
    assert set(rows) == set(THRESHOLDS)
    for pct in THRESHOLDS:
        cum = 0
        for i, (_, c) in enumerate(ranked, start=1):
            cum += c
            if 100 * cum >= pct * total:
                break
        r = rows[pct]
        assert r["vocab_size"] == i
        assert r["covered_tokens"] == cum
        assert r["total_tokens"] == total
        assert r["vocab_total"] == len(ranked)


def test_vocab_size_is_minimal_and_monotone(spark):
    ranked = _ranked_counts()
    total = sum(c for _, c in ranked)
    rows = sorted(
        vocab_coverage_curve(spark, SF).collect(),
        key=lambda r: r["coverage_pct"],
    )
    prev = 0
    for r in rows:
        k = r["vocab_size"]
        cum_minus_one = sum(c for _, c in ranked[: k - 1])
        assert 100 * cum_minus_one < r["coverage_pct"] * total  # minimal
        assert k >= prev  # higher coverage never needs fewer tokens
        prev = k
