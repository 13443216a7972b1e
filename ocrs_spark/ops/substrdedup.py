"""Exact-substring duplicated-span detection: every W-token window
whose exact token sequence occurs >=2 times corpus-wide is a
duplicated hit; per document the hits are merged into maximal
token-coordinate removal spans. This is the ExactSubstr variant of
Lee et al. 2022 ("Deduplicating Training Data Makes Language Models
Better"), the complement to the fuzzy family here: MinHash/LSH
(dedup.py) finds near-duplicate WHOLE documents, novelty.py scores
corpus-unique shingles, gopher.py measures repetition WITHIN a doc —
this op localizes the exact shared substrings themselves (license
blocks, templated boilerplate, syndicated passages) so a curation
pass can cut the spans instead of dropping whole documents. The
published method uses W=50 over BPE tokens via a suffix array; the
distributed shape below is the standard n-gram reformulation (same
answer for a fixed W): W=5 word-grams keep the row non-vacuous on the
short synthetic corpus.

Plan shape at 100 TB: ONE wide shuffle, keyed on the gram string.
Tokenize + window-slide is an Arrow-batched pandas_udf (pure string
slicing, like dedup.shingles_df); posexplode yields (doc_id, pos,
gram) without a join against a positions table. The duplicated test
"count(*) over (partition by gram) > 1" is a window over the
gram-partitioned exchange — one shuffle total, versus the
aggregate-then-self-join form which re-partitions the same
corpus-scale table twice. Group sizes are bounded by the true
duplication factor of each gram (at W>=50 real-world grams are unique
except genuine duplicates), and Spark's window buffer spills per
partition, so a pathological hot gram degrades to disk, not OOM; a
salting pass is only worth it if profiles show one. Everything after
the hits table is keyed on doc_id — gaps-and-islands interval merge
with two analytic passes and a final agg, all partial-combinable or
per-doc-local. The final left join fans the per-doc result back over
the documents table (broadcast-sized per partition after AQE).

dup_frac is one IEEE division of two exact ints rounded to 6 dp —
bit-equal cross-engine. Documents with fewer than W tokens have no
grams and surface with zero spans, preserved via the left join.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from . import load_tables

WINDOW_W = 5  # tokens per exact-match window


def _grams_udf():
    from pyspark.sql.types import ArrayType, StringType

    @F.pandas_udf(ArrayType(StringType()))
    def _grams(texts: pd.Series) -> pd.Series:
        w = WINDOW_W
        out = []
        for t in texts:
            toks = t.split(" ")
            n = max(len(toks) - (w - 1), 0)
            out.append([" ".join(toks[i : i + w]) for i in range(n)])
        return pd.Series(out)

    return _grams


def duplicated_spans_over(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, dup_spans, dup_tokens, dup_frac) per doc:
    merged maximal token spans covered by >=1 corpus-duplicated
    W-gram window."""
    grams = docs.select(
        "doc_id", F.posexplode(_grams_udf()("text")).alias("pos", "s")
    )
    # One shuffle on the gram: every occurrence of a gram seen >=2
    # times anywhere (same doc or another) is a duplicated hit.
    hits = (
        grams.withColumn(
            "cnt", F.count(F.lit(1)).over(Window.partitionBy("s"))
        )
        .filter(F.col("cnt") > 1)
        .select(
            "doc_id",
            F.col("pos").cast("long").alias("pos"),
            (F.col("pos") + WINDOW_W).cast("long").alias("e"),
        )
    )
    # Gaps-and-islands: a new span starts when this hit's window no
    # longer overlaps (or touches) the furthest end seen so far.
    by_pos = Window.partitionBy("doc_id").orderBy("pos")
    run_max_end = F.max("e").over(
        by_pos.rowsBetween(Window.unboundedPreceding, -1)
    )
    islands = hits.withColumn(
        "ni",
        F.when(F.col("pos") > F.coalesce(run_max_end, F.lit(-1)), 1).otherwise(0),
    ).withColumn(
        "island",
        F.sum("ni").over(by_pos.rowsBetween(Window.unboundedPreceding, 0)),
    )
    spans = islands.groupBy("doc_id", "island").agg(
        F.min("pos").alias("s"), F.max("e").alias("e")
    )
    per_doc = spans.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("dup_spans"),
        F.sum(F.col("e") - F.col("s")).cast("long").alias("dup_tokens"),
    )
    return (
        docs.select(
            "doc_id",
            F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
        )
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce("dup_spans", F.lit(0)).cast("long").alias("dup_spans"),
            F.coalesce("dup_tokens", F.lit(0)).cast("long").alias("dup_tokens"),
            F.round(
                F.coalesce("dup_tokens", F.lit(0)).cast("double")
                / F.col("n_tokens"),
                6,
            ).alias("dup_frac"),
        )
    )


def exact_substring_spans(spark, sf_dir):
    (docs,) = load_tables(spark, sf_dir, "documents")
    return duplicated_spans_over(docs)


# DuckDB 1.0 cannot bind an outer column inside a struct comprehension
# under a lateral unnest, so the gram list is built in a projection
# CTE first and unnested in a plain SELECT.
ORACLE_EXACT_SUBSTRING = f"""
WITH lists AS (
  SELECT doc_id,
         len(string_split(text, ' '))::BIGINT AS n_tokens,
         [{{'p': i - 1,
            's': array_to_string(string_split(text, ' ')[i:i + {WINDOW_W - 1}], ' ')}}
          for i in range(1,
              greatest(len(string_split(text, ' ')) - {WINDOW_W - 1}, 0) + 1)]
           AS grams
  FROM documents
),
g AS (SELECT doc_id, unnest(grams) AS gr FROM lists),
h AS (
  SELECT doc_id, gr['p'] AS pos,
         count(*) OVER (PARTITION BY gr['s']) AS cnt
  FROM g
),
hits AS (SELECT doc_id, pos, pos + {WINDOW_W} AS e FROM h WHERE cnt > 1),
isl AS (
  SELECT doc_id, pos, e,
         CASE WHEN pos > coalesce(max(e) OVER (
                PARTITION BY doc_id ORDER BY pos
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
              THEN 1 ELSE 0 END AS ni
  FROM hits
),
isl2 AS (
  SELECT doc_id, pos, e,
         sum(ni) OVER (PARTITION BY doc_id ORDER BY pos
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS island
  FROM isl
),
spans AS (
  SELECT doc_id, island, min(pos) AS s, max(e) AS e
  FROM isl2 GROUP BY doc_id, island
),
per_doc AS (
  SELECT doc_id, count(*)::BIGINT AS dup_spans,
         sum(e - s)::BIGINT AS dup_tokens
  FROM spans GROUP BY doc_id
)
SELECT l.doc_id, l.n_tokens,
       coalesce(p.dup_spans, 0)::BIGINT AS dup_spans,
       coalesce(p.dup_tokens, 0)::BIGINT AS dup_tokens,
       round(coalesce(p.dup_tokens, 0)::DOUBLE / l.n_tokens, 6) AS dup_frac
FROM lists l LEFT JOIN per_doc p USING (doc_id)
"""

QUERIES = {"exact_substring_spans": exact_substring_spans}
ORACLES = {"exact_substring_spans": ORACLE_EXACT_SUBSTRING}
