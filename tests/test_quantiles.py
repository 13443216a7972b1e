"""Sketch-vs-exact pin for the quantile path (ops/quantiles.py): the
approx_percentile KLL-style sketch must stay within twice its 1/accuracy
rank-error guarantee on the real corpus, so the 100-TB swap-in (sketch
instead of the value-buffering exact aggregate) is evidenced."""

import bisect

from pyspark.sql import functions as F

from ocrs_spark.ops.quantiles import QS, corpus_quantiles

SF = "/root/testdata/sf0.001"
ACCURACY = 100  # deliberately coarse so the test exercises real sketch error


def test_corpus_quantiles_shape_and_monotonicity(spark):
    rows = corpus_quantiles(spark, SF).collect()
    assert len(rows) == 2 * len(QS)
    by_feature = {}
    for r in rows:
        by_feature.setdefault(r.feature, []).append((r.q, r.value))
    for feature, pairs in by_feature.items():
        vals = [v for _, v in sorted(pairs)]
        assert vals == sorted(vals), f"{feature}: quantiles not monotone"


def test_approx_percentile_rank_error_within_guarantee(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    data = sorted(r.n_chars for r in docs.select("n_chars").collect())
    n = len(data)
    approx = docs.agg(
        F.expr(
            f"approx_percentile(n_chars, array({', '.join(map(str, QS))}),"
            f" {ACCURACY})"
        ).alias("v")
    ).collect()[0].v
    for q, a in zip(QS, approx):
        # observed rank of the sketch's answer vs the requested rank
        lo = bisect.bisect_left(data, a)
        hi = bisect.bisect_right(data, a)
        target = q * (n - 1)
        err = min(abs(lo - target), abs(hi - target)) / n
        assert err <= 2.0 / ACCURACY, (
            f"q={q}: rank error {err:.4f} exceeds 2/{ACCURACY}"
        )
