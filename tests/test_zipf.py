"""Zipf power-law fit: closed-form expectations on hand fixtures
(including the tie-midrank contract), degenerate-variance null, and a
plausibility band on the synthetic corpus. Cross-engine parity with
the DuckDB oracle is covered by test_oracles.py like every op."""

from __future__ import annotations

import math

import numpy as np

from ocrs_spark.ops.zipf import zipf_fit_over, zipf_token_fit

SF = "/root/testdata/sf0.001"


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _ols(points):
    """Weighted OLS slope/intercept over (rank, freq, weight) blocks."""
    x = np.log([p[0] for p in points])
    y = np.log([p[1] for p in points])
    m = np.array([p[2] for p in points], dtype=float)
    n, sx, sy = m.sum(), (m * x).sum(), (m * y).sum()
    sxy, sxx = (m * x * y).sum(), (m * x * x).sum()
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return slope, (sy - slope * sx) / n


def test_distinct_frequencies_match_closed_form(spark):
    # counts: a=4, b=2, c=1 -> ranks 1, 2, 3, no ties
    row = zipf_fit_over(_docs(spark, ["a a b", "a a b c"])).collect()[0]
    assert row.vocab_size == 3
    assert row.total_tokens == 7
    assert row.distinct_freqs == 3
    slope, intercept = _ols([(1, 4, 1), (2, 2, 1), (3, 1, 1)])
    assert row.slope == round(slope, 6)
    assert row.intercept == round(intercept, 6)


def test_ties_share_the_midrank(spark):
    # counts: a=2, b=2, c=1 -> the {a, b} block spans ranks 1-2, so both
    # carry midrank 1.5 with weight 2; c sits at rank 3.
    row = zipf_fit_over(_docs(spark, ["a b a b c"])).collect()[0]
    assert row.vocab_size == 3
    assert row.distinct_freqs == 2
    slope, intercept = _ols([(1.5, 2, 2), (3, 1, 1)])
    assert row.slope == round(slope, 6)
    assert row.intercept == round(intercept, 6)


def test_zero_variance_yields_null_slope(spark):
    # every token occurs exactly once -> one block -> no x-variance
    row = zipf_fit_over(_docs(spark, ["a b c"])).collect()[0]
    assert row.vocab_size == 3
    assert row.distinct_freqs == 1
    assert row.slope is None and row.intercept is None


def test_corpus_slope_in_zipf_band(spark):
    # The synthetic corpus draws from a small near-uniform vocabulary
    # (31 tokens at sf0.001), so the tail is shallow — assert the sign
    # and a sane magnitude rather than natural-language -1.
    row = zipf_token_fit(spark, SF).collect()[0]
    assert row.vocab_size > 10
    assert row.slope is not None and -3.0 < row.slope < 0.0
    # intercept = ln f at rank 1; the top token's ln-count bounds it.
    assert row.intercept > 0
    assert math.isfinite(row.intercept)
