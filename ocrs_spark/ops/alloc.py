"""Neyman-allocated evaluation sampling design: split a fixed
human-eval / audit budget across corpus strata (sources) proportionally
to N_h * S_h — stratum size times standard deviation — the
minimum-variance allocation for estimating a corpus mean (Neyman 1934).
This is how a 10^12-doc pipeline decides how many documents per source
go to manual quality review: big noisy sources get auditors, small
uniform ones get few.

Exactness: the Neyman weight collapses to ONE integer under a square
root — N_h * S_h = sqrt(N_h * sum(x^2) - (sum x)^2) with population
S_h — and IEEE-754 sqrt is correctly rounded, so the milli-scaled
weight is bit-identical in both engines. Seats are then apportioned by
the largest-remainder (Hamilton) method in pure integer arithmetic:
floor quotas from exact integer division, leftover seats to the
largest integer remainders with a deterministic (remainder desc,
source asc) tie-break. sum(alloc) == BUDGET exactly, always.

Scale: one groupBy over the corpus produces the per-stratum moment
table (|sources| rows); every window below runs over that tiny table.
The corpus-scale work is the word-count shape with map-side combine.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from . import load_tables

BUDGET = 200  # eval samples to allocate across sources


def eval_sample_allocation(spark, sf_dir: str):
    """(source, n_docs, weight_milli, base_alloc, extra, alloc) — one
    row per stratum; sum(alloc) == BUDGET."""
    (docs,) = load_tables(spark, sf_dir, "documents")
    moments = docs.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("s1"),
        F.sum(F.col("n_chars") * F.col("n_chars")).cast("long").alias("s2"),
    )
    w = moments.select(
        "source",
        "n_docs",
        F.floor(
            F.sqrt((F.col("n_docs") * F.col("s2") - F.col("s1") * F.col("s1")))
            * 1000
        )
        .cast("long")
        .alias("weight_milli"),
    )
    tot = Window.partitionBy()
    quota = w.select(
        "source",
        "n_docs",
        "weight_milli",
        F.sum("weight_milli").over(tot).alias("w_total"),
    ).select(
        "source",
        "n_docs",
        "weight_milli",
        F.expr(f"({BUDGET} * weight_milli) div w_total")
        .cast("long")
        .alias("base_alloc"),
        F.expr(f"({BUDGET} * weight_milli) % w_total").alias("rem"),
    )
    leftover = F.lit(BUDGET) - F.sum("base_alloc").over(tot)
    ranked = quota.select(
        "source",
        "n_docs",
        "weight_milli",
        "base_alloc",
        leftover.alias("leftover"),
        F.row_number()
        .over(tot.orderBy(F.col("rem").desc(), F.col("source").asc()))
        .alias("rk"),
    )
    return ranked.select(
        "source",
        "n_docs",
        "weight_milli",
        "base_alloc",
        (F.col("rk") <= F.col("leftover")).cast("long").alias("extra"),
        (F.col("base_alloc") + (F.col("rk") <= F.col("leftover")).cast("long"))
        .cast("long")
        .alias("alloc"),
    )


def _oracle_sql() -> str:
    return f"""
WITH moments AS (
  SELECT source, count(*)::BIGINT AS n_docs,
         sum(n_chars)::BIGINT AS s1,
         sum(n_chars * n_chars)::BIGINT AS s2
  FROM documents GROUP BY source
),
w AS (
  SELECT source, n_docs,
         CAST(floor(sqrt((n_docs * s2 - s1 * s1)::DOUBLE) * 1000) AS BIGINT)
           AS weight_milli
  FROM moments
),
quota AS (
  SELECT source, n_docs, weight_milli,
         ({BUDGET} * weight_milli) // (SELECT sum(weight_milli) FROM w)
           AS base_alloc,
         ({BUDGET} * weight_milli) % (SELECT sum(weight_milli) FROM w)
           AS rem
  FROM w
),
ranked AS (
  SELECT source, n_docs, weight_milli, base_alloc,
         {BUDGET} - (SELECT sum(base_alloc) FROM quota) AS leftover,
         row_number() OVER (ORDER BY rem DESC, source ASC) AS rk
  FROM quota
)
SELECT source, n_docs, weight_milli,
       CAST(base_alloc AS BIGINT) AS base_alloc,
       CAST(CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT) AS extra,
       CAST(base_alloc + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT)
         AS alloc
FROM ranked
"""


QUERIES = {"eval_sample_allocation": eval_sample_allocation}
ORACLES = {"eval_sample_allocation": _oracle_sql()}
