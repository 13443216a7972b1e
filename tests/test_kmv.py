"""KMV sketch internals: the salted two-phase k-min selection must
equal a naive global sort, and the estimator must genuinely estimate
(union larger than the sketch) while staying inside its error bound."""

from __future__ import annotations

from pyspark.sql import functions as F

from ocrs_spark.ops.kmv import (
    K,
    SIDE_A,
    SIDE_B,
    _kmin,
    _side_tokens,
    kmv_crawl_overlap,
)

SF = "/root/testdata/sf0.001"


def test_salted_kmin_equals_global_sort(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    toks = _side_tokens(docs, SIDE_A, "a").unionByName(
        _side_tokens(docs, SIDE_B, "b")
    )
    got = {
        (r["side"], r["tok"]) for r in _kmin(toks, K).collect()
    }
    want = set()
    for side in ("a", "b"):
        rows = (
            toks.filter(F.col("side") == side)
            .orderBy("h", "tok")
            .limit(K)
            .collect()
        )
        want |= {(r["side"], r["tok"]) for r in rows}
    assert got == want and len(want) == 2 * K


def test_estimator_runs_in_estimation_regime(spark):
    """The corpus must be big enough that the sketch is a real sample
    (union >> K), and the within-bound flag must come back TRUE."""
    row = kmv_crawl_overlap(spark, SF).first()
    assert row["n_union"] > 4 * K
    assert 0 < row["n_inter"] < row["n_union"]
    assert row["kmv_within_bound"] is True
