"""Tokenizer-vocabulary coverage curve: the smallest vocabulary size
that covers 50/90/95/99% of corpus token OCCURRENCES — the sizing
decision behind every BPE/unigram tokenizer build (32k vs 64k vs 128k
is exactly a point on this curve), complementing ops/vocab.py's
fixed-K OOV gate and ops/zipf.py's shape gate with the planning
number itself.

Exactness: rank tokens by (count desc, token asc) — a total order —
cumulative-sum the counts, and for each threshold report the minimal
rank whose cumulative count reaches ceil(pct * total / 100) (pure
integer comparison: 100*cum >= pct*total). Ties are broken by the
total order, so both engines agree on every rank.

Scale: corpus-scale work is ONE token-count groupBy; the rank/cumsum
windows run over the VOCABULARY-bounded table (the same justification
as vocab.py's top-K and zipf's per-frequency table — vocabularies are
millions, not trillions). The four thresholds come from one
conditional aggregation over that table; output is 4 rows.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from . import load_tables

THRESHOLDS = (50, 90, 95, 99)


def vocab_coverage_curve(spark, sf_dir: str):
    """(coverage_pct, vocab_size, covered_tokens, total_tokens,
    vocab_total) — vocab_size = minimal #distinct tokens (by frequency
    rank) whose occurrences reach coverage_pct of all occurrences."""
    (docs,) = load_tables(spark, sf_dir, "documents")
    counts = (
        docs.select(
            F.explode(
                F.expr("filter(split(text, ' '), w -> w <> '')")
            ).alias("token")
        )
        .groupBy("token")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    w_rank = Window.orderBy(F.col("cnt").desc(), F.col("token").asc())
    ranked = counts.select(
        "cnt",
        F.row_number().over(w_rank).cast("long").alias("rank"),
        F.sum("cnt")
        .over(w_rank.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long")
        .alias("cum"),
    )
    totals = ranked.agg(
        F.max("cum").cast("long").alias("total"),
        F.max("rank").cast("long").alias("vocab_total"),
    )
    t = F.explode(F.array(*[F.lit(p) for p in THRESHOLDS])).alias(
        "coverage_pct"
    )
    grid = ranked.crossJoin(F.broadcast(totals)).select(
        "rank", "cum", "total", "vocab_total", t
    )
    hit = grid.where(F.expr("100 * cum >= coverage_pct * total"))
    return (
        hit.groupBy("coverage_pct")
        .agg(
            F.min("rank").cast("long").alias("vocab_size"),
            F.min(F.when(F.expr("100 * cum >= coverage_pct * total"),
                         F.col("cum"))).cast("long").alias("covered_tokens"),
            F.max("total").cast("long").alias("total_tokens"),
            F.max("vocab_total").cast("long").alias("vocab_total"),
        )
        .select(
            F.col("coverage_pct").cast("long").alias("coverage_pct"),
            "vocab_size",
            "covered_tokens",
            "total_tokens",
            "vocab_total",
        )
    )


ORACLE_CURVE = f"""
WITH counts AS (
  SELECT token, count(*)::BIGINT AS cnt
  FROM (
    SELECT unnest(list_filter(string_split(text, ' '), w -> w <> ''))
      AS token
    FROM documents
  ) GROUP BY token
),
ranked AS (
  SELECT cnt,
         row_number() OVER (ORDER BY cnt DESC, token ASC) AS rank,
         sum(cnt) OVER (ORDER BY cnt DESC, token ASC
                        ROWS UNBOUNDED PRECEDING)::BIGINT AS cum
  FROM counts
),
tot AS (
  SELECT max(cum)::BIGINT AS total, max(rank)::BIGINT AS vocab_total
  FROM ranked
),
grid AS (
  SELECT r.rank, r.cum, t.total, t.vocab_total, p.coverage_pct
  FROM ranked r, tot t,
       (SELECT unnest([{", ".join(str(p) for p in THRESHOLDS)}])
          AS coverage_pct) p
)
SELECT coverage_pct::BIGINT AS coverage_pct,
       min(rank)::BIGINT AS vocab_size,
       min(CASE WHEN 100 * cum >= coverage_pct * total THEN cum END)
         ::BIGINT AS covered_tokens,
       max(total)::BIGINT AS total_tokens,
       max(vocab_total)::BIGINT AS vocab_total
FROM grid
WHERE 100 * cum >= coverage_pct * total
GROUP BY coverage_pct
"""


QUERIES = {"vocab_coverage_curve": vocab_coverage_curve}
ORACLES = {"vocab_coverage_curve": ORACLE_CURVE}
