"""End-to-end web-corpus curation: the FineWeb/RefinedWeb-style
filter chain composed from this repo's individual operators —

    Gopher quality gate  ->  bigram-LM perplexity gate  ->
    benchmark decontamination  ->  near-dup cluster survivorship

— emitting, for EVERY document, whether it survives and the first
gate that rejected it (fixed precedence: contaminated > duplicate >
quality > perplexity). Composing the ops is the point: each stage is
already individually oracle-checked; this row proves they agree when
chained, and the combined DuckDB oracle (the four stage oracles as
derived tables joined on doc_id) pins the whole pipeline's output
hash-exactly.

Scale shape: every stage's output is doc_id-keyed, so the composition
is a chain of doc_id equi-joins over already-aggregated (one row per
doc) tables — the joins reuse each stage's final hash partitioning and
add no new corpus-scale shuffle beyond what the stages themselves do.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .decontam import ORACLE_DECONTAM, decontamination
from .dedupgraph import ORACLE_DEDUP_CLUSTERS, dedup_clusters
from .gopher import ORACLE_GOPHER, gopher_quality_signals
from .lmscore import ORACLE_LM, lm_perplexity

PPL_MAX = 33.0  # reject the disfluent tail of the observed 26-37 range


def curate_web_corpus(spark, sf_dir):
    """(doc_id, kept, reason) for every document."""
    q = gopher_quality_signals(spark, sf_dir).select(
        "doc_id", F.col("keep").alias("q_keep")
    )
    lm = lm_perplexity(spark, sf_dir).select("doc_id", "ppl")
    de = decontamination(spark, sf_dir).select("doc_id", "contaminated")
    dd = dedup_clusters(spark, sf_dir).select(
        "doc_id", F.col("keep").alias("canonical")
    )
    j = (
        q.join(lm, "doc_id", "left")
        .join(de, "doc_id")
        .join(dd, "doc_id")
    )
    reason = (
        F.when(F.col("contaminated"), F.lit("contaminated"))
        .when(~F.col("canonical"), F.lit("duplicate"))
        .when(~F.col("q_keep"), F.lit("quality"))
        .when(F.col("ppl") > PPL_MAX, F.lit("perplexity"))
        .otherwise(F.lit("kept"))
    )
    return j.select(
        "doc_id", (reason == "kept").alias("kept"), reason.alias("reason")
    )


ORACLE_CURATION = f"""
WITH q AS (SELECT doc_id, keep AS q_keep FROM ({ORACLE_GOPHER})),
lm AS (SELECT doc_id, ppl FROM ({ORACLE_LM})),
de AS (SELECT doc_id, contaminated FROM ({ORACLE_DECONTAM})),
dd AS (SELECT doc_id, keep AS canonical FROM ({ORACLE_DEDUP_CLUSTERS})),
j AS (
  SELECT q.doc_id, q_keep, ppl, contaminated, canonical
  FROM q
  LEFT JOIN lm USING (doc_id)
  JOIN de USING (doc_id)
  JOIN dd USING (doc_id)
),
r AS (
  SELECT doc_id,
         CASE WHEN contaminated THEN 'contaminated'
              WHEN NOT canonical THEN 'duplicate'
              WHEN NOT q_keep THEN 'quality'
              WHEN ppl > {PPL_MAX} THEN 'perplexity'
              ELSE 'kept' END AS reason
  FROM j
)
SELECT doc_id, (reason = 'kept') AS kept, reason FROM r
"""

QUERIES = {"curate_web_corpus": curate_web_corpus}
ORACLES = {"curate_web_corpus": ORACLE_CURATION}
