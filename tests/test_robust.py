"""Contracts for robust per-source corpus statistics (ops/robust.py):
a pure-Python rank-trim recompute over the real documents table, the
outlier-resistance property the operator exists for, and the
bound/ordering invariants of the trimmed window.
"""

import pyarrow.parquet as pq

from ocrs_spark.ops.robust import TRIM_DECILE, trimmed_quality_stats

SF = "/root/testdata/sf0.001"


def _expected():
    t = pq.read_table(f"{SF}/documents.parquet", columns=["source", "n_chars"])
    by_src = {}
    for src, n_chars in zip(
        t["source"].to_pylist(), t["n_chars"].to_pylist()
    ):
        by_src.setdefault(src, []).append(n_chars)
    out = {}
    for src, vals in by_src.items():
        vals.sort()
        n = len(vals)
        lo = n // TRIM_DECILE
        kept = vals[lo : n - lo]
        out[src] = (
            n,
            len(kept),
            min(kept),
            max(kept),
            (1000 * sum(kept)) // len(kept),
        )
    return out


def test_trimmed_stats_match_python_recompute(spark):
    exp = _expected()
    rows = trimmed_quality_stats(spark, SF).collect()
    assert len(rows) == len(exp)
    for r in rows:
        assert (
            r["n_docs"],
            r["trimmed_n"],
            r["p10_value"],
            r["p90_value"],
            r["trimmed_mean_milli"],
        ) == exp[r["source"]]


def test_trim_window_bounds(spark):
    # p10 <= trimmed_mean <= p90, and the trim removes exactly
    # floor(n/10) ranks from each side.
    for r in trimmed_quality_stats(spark, SF).collect():
        lo = r["n_docs"] // TRIM_DECILE
        assert r["trimmed_n"] == r["n_docs"] - 2 * lo
        assert 1000 * r["p10_value"] <= r["trimmed_mean_milli"]
        assert r["trimmed_mean_milli"] <= 1000 * r["p90_value"]


def test_trimmed_mean_resists_planted_outliers(spark, tmp_path):
    # The property the metric exists for: megadoc outliers below the
    # trim fraction move the plain mean but NOT the trimmed mean.
    import pyspark.sql.functions as F

    base = [("s", 100 + i) for i in range(40)]
    spiked = base + [("s", 10_000_000)] * 3  # 3/43 < 1/10 of ranks
    sf_a, sf_b = str(tmp_path / "a"), str(tmp_path / "b")
    for sf, rows in ((sf_a, base), (sf_b, spiked)):
        (
            spark.createDataFrame(rows, "source string, n_chars int")
            .withColumn("doc_id", F.concat(F.lit("d"), F.col("n_chars")))
            .write.mode("overwrite")
            .parquet(f"{sf}/documents.parquet")
        )
    a = trimmed_quality_stats(spark, sf_a).collect()[0]
    b = trimmed_quality_stats(spark, sf_b).collect()[0]
    # Base is flat: trimmed mean sits inside the bulk both times.
    assert abs(a["trimmed_mean_milli"] - b["trimmed_mean_milli"]) <= 3000
    # The plain mean over the spiked set is wildly off the bulk.
    plain_b = (sum(x for _, x in spiked) * 1000) // len(spiked)
    assert plain_b > 10 * b["trimmed_mean_milli"]
