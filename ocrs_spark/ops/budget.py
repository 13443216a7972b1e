"""Token-budget epoch allocation across corpus sources — the "data
recipe" computation behind published pretraining mixes (LLaMA's
per-source epoch table, Gopher's mixture weights): given per-source
token counts t_i, per-source repetition caps cap_i (how many epochs a
source tolerates before memorization/quality decay), and a global
training token budget B, choose per-source epoch multipliers

    e_i = min(cap_i, lambda)    with lambda s.t. sum t_i * e_i = B

— classic max-min-fair waterfilling: every source is repeated equally
(lambda) except those that hit their own cap first. The closed form
needs one sort by cap: walking caps ascending, the sources at or below
the water level contribute t_i*cap_i exactly; lambda lives in the
first segment where the running "everyone capped so far + everyone
else at this cap" total crosses B, and solves a linear equation there.

Scale shape: the corpus-sized work is ONE token-count groupBy to the
per-source table (sources are domains/registrars at web scale — at
most millions of rows, usually thousands), then two windows over that
small table (prefix sums in cap order) and a one-row broadcast of the
grand totals. No iteration, no driver-side solve: lambda is a column.

Determinism: t_i, cap_i, B are exact BIGINTs; the segment test
compares exact ints; lambda is ONE IEEE division of two exact ints;
e_i = min(cap_i, lambda) and alloc_i = t_i * e_i are single correctly-
rounded ops — bit-identical cross-engine before the 6-dp rounding.

Sources here are the deterministic doc_id % N_SOURCES buckets with
caps 1 + source % 4 (stand-ins for per-domain quality tiers); the
budget is TARGET_EPOCHS x total corpus tokens, putting lambda strictly
inside the cap range so the row exercises both capped and uncapped
branches."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from . import load_tables

N_SOURCES = 6
TARGET_EPOCHS = 2  # B = TARGET_EPOCHS * total tokens (exact int)


def token_budget_epochs(spark, sf_dir):
    """(source, n_docs, tokens, cap_epochs, epochs, alloc_tokens) —
    the waterfilled data recipe for budget B = TARGET_EPOCHS * T."""
    (docs,) = load_tables(spark, sf_dir, "documents")
    per_src = (
        docs.select(
            (F.col("doc_id") % N_SOURCES).cast("long").alias("source"),
            F.size(F.expr("filter(split(text, ' '), w -> w <> '')"))
            .cast("long")
            .alias("toks"),
        )
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("toks").cast("long").alias("tokens"),
        )
        .withColumn("cap_epochs", (F.lit(1) + F.col("source") % 4).cast("long"))
    )
    # Prefix sums in cap order (ties broken by source id — any total
    # order within a tie yields the same lambda since tied caps enter
    # the water level together).
    w = Window.orderBy("cap_epochs", "source").rowsBetween(
        Window.unboundedPreceding, 0
    )
    tot = per_src.agg(
        F.sum("tokens").cast("long").alias("total_t"),
        F.sum(F.col("tokens") * F.col("cap_epochs")).cast("long").alias("full_cap"),
    )
    staged = (
        per_src.withColumn(
            "cum_capped", F.sum(F.col("tokens") * F.col("cap_epochs")).over(w)
        )
        .withColumn("cum_t", F.sum("tokens").over(w))
        .crossJoin(F.broadcast(tot))
        # A budget beyond what full capping can spend degenerates to
        # "everyone at cap" — clamping keeps the segment row existent.
        .withColumn(
            "budget",
            F.least(
                (F.lit(TARGET_EPOCHS) * F.col("total_t")).cast("long"),
                F.col("full_cap"),
            ),
        )
        # Water level if the budget ran out exactly at this source's
        # cap: everyone before (and this one) fully capped, everyone
        # after at this cap.
        .withColumn(
            "level_total",
            F.col("cum_capped")
            + (F.col("total_t") - F.col("cum_t")) * F.col("cap_epochs"),
        )
    )
    # The segment containing lambda: the FIRST source whose level_total
    # reaches the budget; sources strictly before it are capped.
    seg = (
        staged.filter(F.col("level_total") >= F.col("budget"))
        .orderBy("cap_epochs", "source")
        .limit(1)
        .select(
            (F.col("cum_capped") - F.col("tokens") * F.col("cap_epochs")).alias(
                "solved_base"
            ),
            (F.col("cum_t") - F.col("tokens")).alias("solved_cum"),
            F.col("cap_epochs").alias("seg_cap"),
        )
    )
    solved = staged.crossJoin(F.broadcast(seg)).withColumn(
        "lam",
        # If even full capping can't spend B (no segment would exist,
        # but guard anyway): everyone capped. Otherwise one exact-int
        # division inside the segment.
        (F.col("budget") - F.col("solved_base"))
        / (F.col("total_t") - F.col("solved_cum")),
    )
    return (
        solved.withColumn(
            "epochs",
            F.round(F.least(F.col("cap_epochs").cast("double"), F.col("lam")), 6),
        )
        .withColumn(
            "alloc_tokens",
            F.round(
                F.col("tokens")
                * F.least(F.col("cap_epochs").cast("double"), F.col("lam")),
                6,
            ),
        )
        .select(
            "source", "n_docs", "tokens", "cap_epochs", "epochs", "alloc_tokens"
        )
        .orderBy("source")
    )


ORACLE_BUDGET = f"""
WITH per_src AS (
  SELECT (doc_id % {N_SOURCES})::BIGINT AS source,
         count(*)::BIGINT AS n_docs,
         sum(len(list_filter(string_split(text, ' '), w -> w <> '')))::BIGINT
           AS tokens
  FROM documents GROUP BY 1
),
capped AS (
  SELECT *, (1 + source % 4)::BIGINT AS cap_epochs FROM per_src
),
staged AS (
  SELECT *,
         sum(tokens * cap_epochs) OVER (ORDER BY cap_epochs, source
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_capped,
         sum(tokens) OVER (ORDER BY cap_epochs, source
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_t,
         sum(tokens) OVER () AS total_t,
         least(({TARGET_EPOCHS} * sum(tokens) OVER ())::BIGINT,
               (sum(tokens * cap_epochs) OVER ())::BIGINT) AS budget
  FROM capped
),
lev AS (
  SELECT *, cum_capped + (total_t - cum_t) * cap_epochs AS level_total
  FROM staged
),
seg AS (
  SELECT (cum_capped - tokens * cap_epochs) AS solved_base,
         (cum_t - tokens) AS solved_cum
  FROM lev WHERE level_total >= budget
  ORDER BY cap_epochs, source LIMIT 1
),
solved AS (
  SELECT l.*,
         (l.budget - s.solved_base)::DOUBLE / (l.total_t - s.solved_cum)
           AS lam
  FROM lev l CROSS JOIN seg s
)
SELECT source, n_docs, tokens, cap_epochs,
       round(least(cap_epochs::DOUBLE, lam), 6) AS epochs,
       round(tokens * least(cap_epochs::DOUBLE, lam), 6) AS alloc_tokens
FROM solved ORDER BY source
"""

QUERIES = {"token_budget_epochs": token_budget_epochs}
ORACLES = {"token_budget_epochs": ORACLE_BUDGET}
