"""Weighted sampling without replacement — Efraimidis & Spirakis
(2006) A-ES keys, the one-pass distributed algorithm every sampling
stack uses when inclusion probability must follow a weight (sample
training docs proportional to quality, hosts proportional to traffic):
give row i the key u_i^(1/w_i) with u_i uniform in (0,1], take the
top K keys — provably equivalent to sequential weighted draws without
replacement, and embarrassingly parallel because each key is local.

Here u_i is md5-deterministic (the repo's reproducible-randomness
idiom: any engine regenerates the same sample, no RNG state), the
weight is the document's token count, and the key is compared in log
space — ln(u)/w, order-isomorphic to u^(1/w) — so the per-row math is
two single IEEE operations (one libm ln of an exact dyadic rational,
one division) and both engines rank identical doubles.

Plan shape: one narrow projection computes every key locally; the
top-K is orderBy+limit = TakeOrdered (per-partition heads merged on
the driver), so the corpus never globally sorts — the same selection
shape as dsir's resample. At 10^12 rows this is scan + K-heap."""

from __future__ import annotations

from pyspark.sql import functions as F

from . import load_tables

WS_SEED = "ws1"
WS_K = 50


def weighted_sample_docs(spark, sf_dir):
    """(doc_id, weight, log_key): the K-doc weighted sample, heaviest
    keys first — inclusion odds proportional to token count."""
    (docs,) = load_tables(spark, sf_dir, "documents")
    keyed = docs.select(
        "doc_id",
        F.size(F.expr("filter(split(text, ' '), w -> w <> '')"))
        .cast("long")
        .alias("weight"),
        (
            F.conv(
                F.substring(F.md5(F.concat_ws("|", F.lit(WS_SEED), "doc_id")), 1, 8),
                16,
                10,
            ).cast("long")
            + 1
        ).alias("u_num"),  # uniform over {1 .. 2^32}, exact int
    ).select(
        "doc_id",
        "weight",
        F.round(
            F.log(F.col("u_num") / F.lit(4294967296.0)) / F.col("weight"), 6
        ).alias("log_key"),
    )
    return keyed.orderBy(F.desc("log_key"), F.asc("doc_id")).limit(WS_K)


ORACLE_WSAMPLE = f"""
WITH keyed AS (
  SELECT doc_id,
         len(list_filter(string_split(text, ' '), w -> w <> ''))::BIGINT
           AS weight,
         (('0x' || substr(md5('{WS_SEED}' || '|' || doc_id), 1, 8))::BIGINT + 1)
           AS u_num
  FROM documents
)
SELECT doc_id, weight,
       round(ln(u_num / 4294967296.0) / weight, 6) AS log_key
FROM keyed
ORDER BY log_key DESC, doc_id ASC
LIMIT {WS_K}
"""

QUERIES = {"weighted_sample_docs": weighted_sample_docs}
ORACLES = {"weighted_sample_docs": ORACLE_WSAMPLE}
