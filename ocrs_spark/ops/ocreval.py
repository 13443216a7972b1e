"""Extraction-quality metrics: character error rate (CER) and exact-
match share between hypothesis and reference transcriptions — the
evaluation loop every OCR/extraction deployment runs against its
golden set (the reference repo's own e2e check compares CLI output to
.expected.txt files; this is that comparison as a corpus-scale
operator).

CER uses Levenshtein distance, a JVM builtin in Spark and a native
function in DuckDB (identical classic definition — unit-cost
insert/delete/substitute), so the whole metric is expression-level:
no Python in the loop, one scan, one 1-row aggregate. Both micro-CER
(corpus edit volume / corpus reference volume — length-weighted, the
number OCR papers report) and macro-CER (mean per-doc rate — what a
per-document SLA tracks) come out of the same pass.

The driver row scores PLANTED deterministic corruptions (drop /
substitute / append on doc_id residues) so the metric is exercised on
known-nonzero errors; the real pipeline's woven output scores CER == 0
against the golden media texts by construction, and pytest asserts
exactly that (the metric validating the engine, then the plant
validating the metric).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import load_tables

_REF = "substr(text, 1, 40)"
_HYP = f"""
CASE CAST(doc_id % 4 AS INT)
 WHEN 0 THEN {_REF}
 WHEN 1 THEN substr({_REF}, 2)
 WHEN 2 THEN concat('X', substr({_REF}, 2))
 ELSE concat({_REF}, 'X')
END
"""


def error_rates(pairs: DataFrame) -> DataFrame:
    """(hyp, ref) -> one row of corpus metrics. Reference-empty pairs
    are excluded from macro-CER (rate undefined) but their edits still
    count in micro-CER."""
    scored = pairs.select(
        F.levenshtein("hyp", "ref").cast("long").alias("dist"),
        F.length("ref").cast("long").alias("rlen"),
        (F.col("hyp") == F.col("ref")).cast("long").alias("exact"),
    )
    return scored.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.round(F.sum("exact") / F.count("*"), 4).alias("exact_share"),
        F.round(F.sum("dist") / F.sum("rlen"), 6).alias("cer_micro"),
        F.round(
            F.avg(
                F.when(F.col("rlen") > 0, F.col("dist") / F.col("rlen"))
            ),
            6,
        ).alias("cer_macro"),
    )


def extraction_error_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    (docs,) = load_tables(spark, sf_dir, "documents")
    pairs = docs.select(
        F.expr(_HYP).alias("hyp"), F.expr(_REF).alias("ref")
    )
    return error_rates(pairs)


ORACLE_ERROR_RATES = f"""
WITH pairs AS (
  SELECT {_HYP} AS hyp, {_REF} AS ref FROM documents
),
scored AS (
  SELECT levenshtein(hyp, ref)::BIGINT AS dist,
         length(ref)::BIGINT AS rlen,
         CASE WHEN hyp = ref THEN 1 ELSE 0 END AS exact
  FROM pairs
)
SELECT count(*)::BIGINT AS n_docs,
       round(sum(exact)::DOUBLE / count(*), 4) AS exact_share,
       round(sum(dist)::DOUBLE / sum(rlen), 6) AS cer_micro,
       round(avg(CASE WHEN rlen > 0 THEN dist::DOUBLE / rlen END), 6)
         AS cer_macro
FROM scored
"""


QUERIES = {"extraction_error_rates": extraction_error_rates}
ORACLES = {"extraction_error_rates": ORACLE_ERROR_RATES}
