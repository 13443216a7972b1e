"""TextTiling-style passage segmentation (Hearst 1997): split each
document at topic shifts by scoring the lexical overlap between
adjacent fixed-size token blocks and marking local-minimum gaps as
segment boundaries — the content-AWARE complement to ``chunking``'s
fixed-stride windows (RAG passages that respect topic boundaries
instead of cutting through them).

Simplified-but-exact rule set (integers only, no smoothing): blocks of
BLOCK tokens, a gap at every block boundary, gap score = |distinct
tokens of the left block ∩ distinct tokens of the right block|, and a
boundary at every INTERIOR gap that is a strict local minimum against
its left neighbor and a non-strict one against its right
(score[g] < score[g-1] AND score[g] <= score[g+1] — the asymmetric tie
rule keeps plateaus from double-firing). Documents with fewer than two
full blocks emit no rows; the trailing partial block is ignored (both
choices mirrored in the oracle).

Scale: the entire operator is ONE projection — tokenize, slice,
array_intersect, local-minimum scan, all inside a single transform()
over each row's own arrays, then one posexplode. Zero shuffles, zero
joins; it rides the scan and parallelizes perfectly at any corpus
size.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from . import load_tables

BLOCK = 8  # tokens per block


def text_tiling_segments(spark, sf_dir: str):
    """(doc_id, gap_idx, gap_token_pos, overlap, is_boundary) — one row
    per inter-block gap."""
    (docs,) = load_tables(spark, sf_dir, "documents")
    b = BLOCK
    base = docs.select(
        "doc_id",
        F.expr("filter(split(text, ' '), w -> w <> '')").alias("toks"),
    ).select(
        "doc_id",
        F.expr(f"size(toks) div {b} - 1").alias("n_gaps"),
        F.expr(
            f"transform(sequence(1, greatest(size(toks) div {b} - 1, 0)),"
            f" g -> size(array_intersect("
            f"array_distinct(slice(toks, (g-1)*{b} + 1, {b})),"
            f"array_distinct(slice(toks, g*{b} + 1, {b})))))"
        ).alias("scores"),
    )
    scored = base.filter(F.col("n_gaps") >= 1).select(
        "doc_id",
        "n_gaps",
        "scores",
        F.expr(
            "transform(sequence(1, n_gaps), g -> CASE"
            " WHEN g = 1 OR g = n_gaps THEN false"
            " ELSE element_at(scores, cast(g as int))"
            " < element_at(scores, cast(g - 1 as int))"
            " AND element_at(scores, cast(g as int))"
            " <= element_at(scores, cast(g + 1 as int))"
            " END)"
        ).alias("bounds"),
    )
    return scored.select(
        "doc_id",
        F.posexplode(F.arrays_zip("scores", "bounds")).alias("i", "z"),
    ).select(
        "doc_id",
        (F.col("i") + 1).cast("long").alias("gap_idx"),
        ((F.col("i") + 1) * b).cast("long").alias("gap_token_pos"),
        F.col("z.scores").cast("long").alias("overlap"),
        F.col("z.bounds").alias("is_boundary"),
    )


def _oracle_sql() -> str:
    b = BLOCK
    return f"""
WITH base AS (
  SELECT doc_id,
         list_filter(string_split(text, ' '), w -> w <> '') AS toks
  FROM documents
),
scored AS (
  SELECT doc_id,
         len(toks) // {b} - 1 AS n_gaps,
         [len(list_intersect(
              list_distinct(toks[(g-1)*{b} + 1 : g*{b}]),
              list_distinct(toks[g*{b} + 1 : (g+1)*{b}])))
          for g in range(1, greatest(len(toks) // {b} - 1, 0) + 1)] AS scores
  FROM base
),
gaps AS (
  SELECT doc_id, n_gaps, scores,
         unnest(range(1, n_gaps + 1)) AS g
  FROM scored WHERE n_gaps >= 1
)
SELECT doc_id,
       CAST(g AS BIGINT) AS gap_idx,
       CAST(g * {b} AS BIGINT) AS gap_token_pos,
       CAST(scores[g] AS BIGINT) AS overlap,
       CASE WHEN g = 1 OR g = n_gaps THEN false
            ELSE scores[g] < scores[g-1] AND scores[g] <= scores[g+1]
       END AS is_boundary
FROM gaps
"""


QUERIES = {"text_tiling_segments": text_tiling_segments}
ORACLES = {"text_tiling_segments": _oracle_sql()}
