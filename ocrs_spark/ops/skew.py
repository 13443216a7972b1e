"""Skew-handling operators: salted aggregation and the end-to-end
training-corpus curation pipeline.

Salting: a hot grouping key (one user generating half the events; one
document template repeated millions of times) makes a single reducer the
straggler. The two-phase salted aggregate shuffles on (key, salt) first
— spreading the hot key over SALT_BUCKETS reducers — then combines the
partials. Results are identical to the plain aggregate (the oracle IS
the plain aggregate), only the plan shape changes; at 100 TB the second
shuffle moves SALT_BUCKETS rows per key instead of all rows.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from . import load_tables

SALT_BUCKETS = 16


def salted_event_user_stats(spark, sf_dir):
    """Per-user event stats via two-phase salted aggregation."""
    (events,) = load_tables(spark, sf_dir, "events")
    salted = events.withColumn(
        "salt", F.pmod(F.xxhash64("event_id"), F.lit(SALT_BUCKETS))
    )
    partial = salted.groupBy("user_id", "salt").agg(
        F.count("*").alias("pc"),
        F.sum("value").alias("ps"),
        F.max("value").alias("pm"),
    )
    return partial.groupBy("user_id").agg(
        F.sum("pc").alias("n_events"),
        F.round(F.sum("ps"), 2).alias("sum_value"),
        F.round(F.max("pm"), 2).alias("max_value"),
    )


ORACLE_SALTED = """
SELECT user_id, count(*) AS n_events,
       round(sum(value), 2) AS sum_value,
       round(max(value), 2) AS max_value
FROM events GROUP BY user_id
"""


def curate_training_corpus(spark, sf_dir):
    """End-to-end corpus curation: keep documents that pass the quality
    filter AND are not near-duplicates (drop the lexicographically
    larger side of every LSH-candidate pair with Jaccard >= threshold).
    This is the composition a pre-training data pipeline runs: quality
    scoring -> candidate generation -> verification -> anti-join."""
    from .dedup import ngram_jaccard_pairs
    from .textstats import quality_score

    quality = quality_score(spark, sf_dir).filter(F.col("keep"))
    dup_losers = (
        ngram_jaccard_pairs(spark, sf_dir)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    return (
        quality.join(dup_losers, "doc_id", "left_anti")
        .select("doc_id", "n_tokens", "stopword_ratio")
    )


def _oracle_curate() -> str:
    from .dedup import ORACLE_JACCARD

    # Reuse the jaccard oracle as a subquery for the loser set.
    jaccard = ORACLE_JACCARD.strip()
    return f"""
WITH jp AS ({jaccard}),
losers AS (SELECT DISTINCT doc_b AS doc_id FROM jp),
quality AS (
  SELECT doc_id,
         len(string_split(text, ' ')) AS n_tokens,
         round(len(list_filter(string_split(text, ' '),
                               t -> t IN ('the', 'a', 'of', 'and', 'in')))
               / len(string_split(text, ' ')), 3) AS stopword_ratio
  FROM documents
  WHERE len(string_split(text, ' ')) BETWEEN 10 AND 200
    AND round(len(list_filter(string_split(text, ' '),
                              t -> t IN ('the', 'a', 'of', 'and', 'in')))
              / len(string_split(text, ' ')), 3) > 0.02
)
SELECT q.doc_id, q.n_tokens, q.stopword_ratio
FROM quality q WHERE NOT EXISTS (SELECT 1 FROM losers l WHERE l.doc_id = q.doc_id)
"""


ORACLE_CURATE = _oracle_curate()

QUERIES = {
    "salted_event_user_stats": salted_event_user_stats,
    "curate_training_corpus": curate_training_corpus,
}

ORACLES = {
    "salted_event_user_stats": ORACLE_SALTED,
    "curate_training_corpus": ORACLE_CURATE,
}
