"""Cross-document n-gram novelty: for each document, the share of its
distinct word 3-shingles that occur in NO other document. The standard
curation complement to the dedup family — gopher.py measures
repetition WITHIN a doc, dedupgraph clusters whole near-duplicates,
decontam checks against a benchmark corpus; this row scores how much
of a document is corpus-unique prose vs shared boilerplate
(navigation chrome, license blocks, templated spam), the signal
CCNet/RefinedWeb-style pipelines threshold to keep the long tail of
genuinely novel text.

Plan shape at 100 TB: reuse the dedup shingle kernel (Arrow-batched,
byte-identical to the expression form), take distinct (doc_id, s) —
map-side combinable — then ONE groupBy on the shingle key (uniform
hash distribution; no skew) to count containing docs, a sort-merge
join back on the same key (co-partitioned with the groupBy, so AQE
reuses the exchange), and a final doc_id aggregate. No windows, no
driver-side state; every shuffle key is either a shingle hash or
doc_id.

novelty_frac is a single IEEE division of two exact ints — bit-equal
cross-engine — rounded to 6 dp per house style anyway. Docs with
fewer than 3 tokens have no shingles and surface with zero counts and
NULL novelty (no evidence, not "novel"), preserved via left join from
the documents table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import load_tables
from .dedup import _DUCK_SHINGLES, shingles_df


def novelty_over(docs: DataFrame) -> DataFrame:
    """(doc_id, n_distinct_shingles, n_novel, novelty_frac) per doc."""
    sh = shingles_df(docs).distinct()
    df_s = sh.groupBy("s").agg(F.count("*").cast("long").alias("docs_s"))
    per_doc = (
        sh.join(df_s, "s")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_distinct_shingles"),
            F.sum((F.col("docs_s") == 1).cast("long")).alias("n_novel"),
        )
    )
    return docs.select("doc_id").join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_distinct_shingles", F.lit(0)).alias("n_distinct_shingles"),
        F.coalesce("n_novel", F.lit(0)).alias("n_novel"),
        F.round(
            F.col("n_novel").cast("double") / F.col("n_distinct_shingles"), 6
        ).alias("novelty_frac"),
    )


def ngram_novelty(spark, sf_dir):
    (docs,) = load_tables(spark, sf_dir, "documents")
    return novelty_over(docs)


ORACLE_NOVELTY = f"""
WITH sh AS (
  SELECT DISTINCT doc_id, unnest({_DUCK_SHINGLES}) AS s FROM documents
),
df_s AS (SELECT s, count(*)::BIGINT AS docs_s FROM sh GROUP BY s),
per_doc AS (
  SELECT sh.doc_id,
         count(*)::BIGINT AS n_distinct_shingles,
         sum(CASE WHEN df_s.docs_s = 1 THEN 1 ELSE 0 END)::BIGINT AS n_novel
  FROM sh JOIN df_s USING (s)
  GROUP BY sh.doc_id
)
SELECT d.doc_id,
       coalesce(p.n_distinct_shingles, 0) AS n_distinct_shingles,
       coalesce(p.n_novel, 0) AS n_novel,
       round(p.n_novel::DOUBLE / p.n_distinct_shingles, 6) AS novelty_frac
FROM documents d LEFT JOIN per_doc p USING (doc_id)
"""

QUERIES = {"ngram_novelty": ngram_novelty}
ORACLES = {"ngram_novelty": ORACLE_NOVELTY}
