"""Inverted-index compression planning: exact Elias-gamma size
accounting for every token's delta-encoded posting list — the
storage-engineering pass behind index budgeting (Lucene/PISA-style
postings store doc-id GAPS, not ids; gamma codes a gap g in
2*floor(log2 g) + 1 bits, so rare tokens with huge gaps and stopwords
with gap≈1 compress completely differently, and the planner needs the
per-token numbers before sharding the index).

Exactness: floor(log2 g) + 1 is the BINARY DIGIT COUNT of g, computed
in both engines as the length of the base-2 string (Spark conv(g,10,2),
DuckDB printf('%b', g)) — no floating log anywhere. The first posting's
gap is doc_id + 1 (ids start at 0), keeping every gap >= 1.

Scale: postings are (token, doc_id) rows — the ops/postings.py layout —
and the one window (lag over each token's sorted ids) is the posting
list itself, which IS the compression unit: gamma sizing is inherently
per-list-prefix. A 10^12-doc stopword list would be blocked (size the
blocks independently and sum — gamma is prefix-free so block sums are
exact); the per-token groupBy output is vocabulary-bounded.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from . import load_tables

MIN_POSTINGS = 2  # singleton lists are all raw overhead; below report floor


def posting_compression(spark, sf_dir: str):
    """(token, n_postings, raw_bits, gamma_bits, ratio_milli) — exact
    Elias-gamma size of each token's delta-encoded posting list vs a
    raw 64-bit-per-id layout."""
    (docs,) = load_tables(spark, sf_dir, "documents")
    postings = docs.select(
        "doc_id",
        F.explode(
            F.expr("array_distinct(filter(split(text, ' '), w -> w <> ''))")
        ).alias("token"),
    )
    w = Window.partitionBy("token").orderBy("doc_id")
    gaps = postings.select(
        "token",
        F.coalesce(
            F.col("doc_id") - F.lag("doc_id").over(w), F.col("doc_id") + 1
        ).alias("gap"),
    )
    sized = gaps.select(
        "token",
        # gamma(g) = 2*floor(log2 g) + 1 = 2*digits2(g) - 1
        (2 * F.length(F.conv(F.col("gap").cast("string"), 10, 2)) - 1)
        .cast("long")
        .alias("bits"),
    )
    return (
        sized.groupBy("token")
        .agg(
            F.count("*").cast("long").alias("n_postings"),
            F.sum("bits").cast("long").alias("gamma_bits"),
        )
        .filter(F.col("n_postings") >= MIN_POSTINGS)
        .select(
            "token",
            "n_postings",
            (64 * F.col("n_postings")).cast("long").alias("raw_bits"),
            "gamma_bits",
            F.expr("(1000 * gamma_bits) div (64 * n_postings)")
            .cast("long")
            .alias("ratio_milli"),
        )
    )


def _oracle_sql() -> str:
    return f"""
WITH postings AS (
  SELECT DISTINCT doc_id, token FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
  ) WHERE token <> ''
),
gaps AS (
  SELECT token,
         COALESCE(doc_id - lag(doc_id) OVER (PARTITION BY token ORDER BY doc_id),
                  doc_id + 1) AS gap
  FROM postings
),
sized AS (
  SELECT token, CAST(2 * length(printf('%b', gap)) - 1 AS BIGINT) AS bits
  FROM gaps
),
agg AS (
  SELECT token, count(*)::BIGINT AS n_postings, sum(bits)::BIGINT AS gamma_bits
  FROM sized GROUP BY token
)
SELECT token, n_postings,
       CAST(64 * n_postings AS BIGINT) AS raw_bits,
       gamma_bits,
       CAST((1000 * gamma_bits) // (64 * n_postings) AS BIGINT) AS ratio_milli
FROM agg WHERE n_postings >= {MIN_POSTINGS}
"""


QUERIES = {"posting_compression": posting_compression}
ORACLES = {"posting_compression": _oracle_sql()}
