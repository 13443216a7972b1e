"""Quality-gate agreement analysis — Cohen's kappa between two
INDEPENDENT filter families (Gopher ratio heuristics vs the
char-entropy gate): the standard data-quality practice before
composing gates into a curation chain. Raw percent agreement is
misleading when both gates pass almost everything (chance agreement
dominates); kappa subtracts the chance term, so a near-zero kappa on
high raw agreement says the gates are redundant coin flips on the
margin, while high kappa says they genuinely rank the same documents
— which decides whether adding the second gate buys coverage or just
latency.

Plan shape: the two per-doc gate frames join on doc_id (one shuffle
each side at corpus scale) into a 2x2 contingency computed by ONE
conditional aggregation; kappa is a short chain of single IEEE ops
over the four exact BIGINT cells — po and pe are each one division,
then one subtraction and one final division — bit-identical
cross-engine before the 6-dp rounding (the budget.py determinism
style)."""

from __future__ import annotations

from pyspark.sql import functions as F

from .entropy import ORACLE_CHAR_ENTROPY, char_entropy_gate
from .gopher import ORACLE_GOPHER, gopher_quality_signals


def gate_agreement_kappa(spark, sf_dir):
    """One row: (n_docs, n_both_keep, n_gopher_only, n_entropy_only,
    n_both_drop, raw_agreement, kappa)."""
    g = gopher_quality_signals(spark, sf_dir).select(
        "doc_id", F.col("keep").alias("g_keep")
    )
    e = char_entropy_gate(spark, sf_dir).select(
        "doc_id", (~F.col("is_gibberish")).alias("e_keep")
    )
    cells = g.join(e, "doc_id").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.when(F.col("g_keep") & F.col("e_keep"), 1).otherwise(0))
        .cast("long")
        .alias("n_both_keep"),
        F.sum(F.when(F.col("g_keep") & ~F.col("e_keep"), 1).otherwise(0))
        .cast("long")
        .alias("n_gopher_only"),
        F.sum(F.when(~F.col("g_keep") & F.col("e_keep"), 1).otherwise(0))
        .cast("long")
        .alias("n_entropy_only"),
        F.sum(F.when(~F.col("g_keep") & ~F.col("e_keep"), 1).otherwise(0))
        .cast("long")
        .alias("n_both_drop"),
    )
    po = (F.col("n_both_keep") + F.col("n_both_drop")) / F.col("n_docs")
    pe = (
        (F.col("n_both_keep") + F.col("n_gopher_only"))
        * (F.col("n_both_keep") + F.col("n_entropy_only"))
        + (F.col("n_entropy_only") + F.col("n_both_drop"))
        * (F.col("n_gopher_only") + F.col("n_both_drop"))
    ) / (F.col("n_docs") * F.col("n_docs"))
    return cells.select(
        "n_docs",
        "n_both_keep",
        "n_gopher_only",
        "n_entropy_only",
        "n_both_drop",
        F.round(po, 6).alias("raw_agreement"),
        # Degenerate unanimity (pe = 1): kappa is conventionally 0.
        F.round(
            F.when(pe == 1.0, F.lit(0.0)).otherwise((po - pe) / (1 - pe)), 6
        ).alias("kappa"),
    )


ORACLE_GATE_KAPPA = f"""
WITH g AS (SELECT doc_id, keep AS g_keep FROM ({ORACLE_GOPHER})),
e AS (SELECT doc_id, NOT is_gibberish AS e_keep FROM ({ORACLE_CHAR_ENTROPY})),
cells AS (
  SELECT count(*)::BIGINT AS n_docs,
         sum(CASE WHEN g_keep AND e_keep THEN 1 ELSE 0 END)::BIGINT AS n_both_keep,
         sum(CASE WHEN g_keep AND NOT e_keep THEN 1 ELSE 0 END)::BIGINT AS n_gopher_only,
         sum(CASE WHEN NOT g_keep AND e_keep THEN 1 ELSE 0 END)::BIGINT AS n_entropy_only,
         sum(CASE WHEN NOT g_keep AND NOT e_keep THEN 1 ELSE 0 END)::BIGINT AS n_both_drop
  FROM g JOIN e USING (doc_id)
)
SELECT n_docs, n_both_keep, n_gopher_only, n_entropy_only, n_both_drop,
       round((n_both_keep + n_both_drop)::DOUBLE / n_docs, 6) AS raw_agreement,
       round(CASE WHEN ((n_both_keep + n_gopher_only) * (n_both_keep + n_entropy_only)
                   + (n_entropy_only + n_both_drop) * (n_gopher_only + n_both_drop))::DOUBLE
                  / (n_docs * n_docs) = 1.0
             THEN 0.0
             ELSE ((n_both_keep + n_both_drop)::DOUBLE / n_docs
                   - ((n_both_keep + n_gopher_only) * (n_both_keep + n_entropy_only)
                      + (n_entropy_only + n_both_drop) * (n_gopher_only + n_both_drop))::DOUBLE
                     / (n_docs * n_docs))
                  / (1 - ((n_both_keep + n_gopher_only) * (n_both_keep + n_entropy_only)
                          + (n_entropy_only + n_both_drop) * (n_gopher_only + n_both_drop))::DOUBLE
                         / (n_docs * n_docs))
             END, 6) AS kappa
FROM cells
"""

QUERIES = {"gate_agreement_kappa": gate_agreement_kappa}
ORACLES = {"gate_agreement_kappa": ORACLE_GATE_KAPPA}
