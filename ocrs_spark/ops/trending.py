"""Window-over-window trending tokens — the corpus-monitoring mover
report: which tokens' frequencies jumped between the previous crawl
window and the current one. This is how a production pipeline spots
template floods, spam bursts, and benchmark leakage arriving in a new
batch (the per-token complement to ``drift``'s distribution-level PSI
gate and ``zipf``'s shape gate).

Windows are planted deterministically (doc_id parity = previous /
current crawl). Ratios are exact integer milli units with add-one
smoothing — ratio_milli = (1000 * (c_cur + 1)) div (c_prev + 1) — so
new-token blowups are finite and the oracle is bit-exact. Only tokens
with c_cur >= MIN_CURRENT rank (a 1 -> 3 count is noise, not a trend).

Scale: token counts per window are the word-count shape (explode +
groupBy with map-side combine, conditional sums give both windows in
ONE aggregation — no self-join of the token table); the top-K is
TakeOrdered on (ratio desc, token asc), per-partition top-K merged on
the driver, never a global sort.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from . import load_tables

TOP_K = 25
MIN_CURRENT = 4  # minimum current-window count to rank


def trending_tokens(spark, sf_dir: str):
    """(token, c_prev, c_cur, ratio_milli) — top-K movers into the
    current window."""
    (docs,) = load_tables(spark, sf_dir, "documents")
    counts = (
        docs.select(
            (F.col("doc_id") % 2 == 0).alias("cur"),
            F.explode(
                F.expr("filter(split(text, ' '), w -> w <> '')")
            ).alias("token"),
        )
        .groupBy("token")
        .agg(
            F.sum(F.when(~F.col("cur"), 1).otherwise(0))
            .cast("long")
            .alias("c_prev"),
            F.sum(F.when(F.col("cur"), 1).otherwise(0))
            .cast("long")
            .alias("c_cur"),
        )
    )
    return (
        counts.filter(F.col("c_cur") >= MIN_CURRENT)
        .select(
            "token",
            "c_prev",
            "c_cur",
            F.expr("(1000 * (c_cur + 1)) div (c_prev + 1)")
            .cast("long")
            .alias("ratio_milli"),
        )
        .orderBy(F.col("ratio_milli").desc(), F.col("token").asc())
        .limit(TOP_K)
    )


def _oracle_sql() -> str:
    return f"""
WITH toks AS (
  SELECT doc_id % 2 = 0 AS cur, token FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
  ) WHERE token <> ''
),
counts AS (
  SELECT token,
         SUM(CASE WHEN NOT cur THEN 1 ELSE 0 END)::BIGINT AS c_prev,
         SUM(CASE WHEN cur THEN 1 ELSE 0 END)::BIGINT AS c_cur
  FROM toks GROUP BY token
)
SELECT token, c_prev, c_cur,
       CAST((1000 * (c_cur + 1)) // (c_prev + 1) AS BIGINT) AS ratio_milli
FROM counts
WHERE c_cur >= {MIN_CURRENT}
ORDER BY ratio_milli DESC, token ASC
LIMIT {TOP_K}
"""


QUERIES = {"trending_tokens": trending_tokens}
ORACLES = {"trending_tokens": _oracle_sql()}
