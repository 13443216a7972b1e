"""Robust per-source corpus statistics: 10%-trimmed mean and the
P10/P90 value bounds of document length per source — the
outlier-resistant health metric a pipeline tracks per provider (a few
pathological megadocs or empty stubs move a plain mean wildly; the
trimmed mean moves only if the BULK of a source shifts).

Exactness: trimming is defined on rank positions (drop the lowest and
highest floor(n/10) ranks; ties are interchangeable, so the kept
MULTISET is order-rule-independent), and the trimmed mean is exact
integer milli.

Scale: the naive spelling ranks every document inside a
PARTITION BY source window — one task per source at 10^12 docs.
Instead this reuses the compact-histogram construction from
ops/ccnet.py: groupBy(source, value) collapses the corpus to the
per-source VALUE HISTOGRAM (bounded by distinct lengths, not docs),
the cumulative window runs over that tiny table, and each value
group's kept weight is the overlap of its rank interval with the
trim window — pure integer interval arithmetic. No per-source sort of
documents exists anywhere in the plan.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from . import load_tables

TRIM_DECILE = 10  # drop floor(n/10) ranks from each side


def trimmed_quality_stats(spark, sf_dir: str):
    """(source, n_docs, trimmed_n, p10_value, p90_value,
    trimmed_mean_milli) per source."""
    (docs,) = load_tables(spark, sf_dir, "documents")
    hist = docs.groupBy("source", "n_chars").agg(
        F.count("*").cast("long").alias("c")
    )
    w_cum = (
        Window.partitionBy("source")
        .orderBy("n_chars")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.select(
        "source",
        "n_chars",
        "c",
        F.sum("c").over(w_cum).alias("cum"),
        F.sum("c").over(Window.partitionBy("source")).alias("n"),
    ).select(
        "source",
        "n_chars",
        "c",
        "cum",
        (F.col("cum") - F.col("c")).alias("cum_before"),
        "n",
        F.expr(f"n div {TRIM_DECILE}").alias("lo"),
    )
    # kept weight = |[cum_before+1, cum] ∩ [lo+1, n-lo]|
    kept = F.greatest(
        F.lit(0),
        F.least(F.col("cum"), F.col("n") - F.col("lo"))
        - F.greatest(F.col("cum_before"), F.col("lo")),
    )
    return (
        cum.select("source", "n_chars", "n", "lo", kept.alias("kept"))
        .groupBy("source")
        .agg(
            F.min("n").cast("long").alias("n_docs"),
            F.sum("kept").cast("long").alias("trimmed_n"),
            F.min(F.when(F.col("kept") > 0, F.col("n_chars")))
            .cast("long")
            .alias("p10_value"),
            F.max(F.when(F.col("kept") > 0, F.col("n_chars")))
            .cast("long")
            .alias("p90_value"),
            F.expr("(1000 * sum(n_chars * kept)) div sum(kept)")
            .cast("long")
            .alias("trimmed_mean_milli"),
        )
    )


def _oracle_sql() -> str:
    return f"""
WITH r AS (
  SELECT source, n_chars,
         row_number() OVER (PARTITION BY source ORDER BY n_chars) AS rk,
         count(*) OVER (PARTITION BY source) AS n
  FROM documents
),
kept AS (
  SELECT source, n_chars, n
  FROM r
  WHERE rk > n // {TRIM_DECILE} AND rk <= n - n // {TRIM_DECILE}
)
SELECT source,
       CAST(min(n) AS BIGINT) AS n_docs,
       count(*)::BIGINT AS trimmed_n,
       CAST(min(n_chars) AS BIGINT) AS p10_value,
       CAST(max(n_chars) AS BIGINT) AS p90_value,
       CAST((1000 * sum(n_chars)) // count(*) AS BIGINT)
         AS trimmed_mean_milli
FROM kept GROUP BY source
"""


QUERIES = {"trimmed_quality_stats": trimmed_quality_stats}
ORACLES = {"trimmed_quality_stats": _oracle_sql()}
