"""CCNet-style perplexity bucketing (Wenzek et al. 2020): split each
language's documents into head/middle/tail terciles by LM perplexity —
the classic curation signal where "head" (lowest perplexity, most
fluent under the reference LM) feeds high-quality corpora and "tail"
is dropped or down-weighted.

Composes with ops/lmscore.py: the corpus bigram LM scores every
document (avg negative log-prob, kept as exact MILLI-NAT integers once
past the float average — the same round-3 tolerance lm_perplexity
already proves against the oracle), then each language is split into
exact NTILE(3) terciles with a total deterministic order
(nlogp_milli asc, doc_id asc).

Scale: the naive formulation — NTILE over a window PARTITIONed BY
lang — sorts an entire language inside ONE task; at 10^12 documents
with a handful of languages that is the textbook skew killer. Instead
the terciles are computed in two passes that never sort a language in
one place:

1. a compact score histogram groupBy(lang, nlogp_milli) — bounded by
   the distinct milli-scores per language, thousands of rows, so the
   cumulative window over IT is trivially small — yields each score's
   rank offset (cum_before) and the language totals;
2. each document's global rank = cum_before + its row_number within
   its OWN (lang, score) tie group — a window over tie groups only,
   which are tiny — and the NTILE bucket is then pure integer math on
   (rank, n_lang): first ceil(n/3) ranks are head, next
   floor((n+1)/3) are middle, rest tail (exactly SQL NTILE's
   first-buckets-larger split).

The result is bit-identical to NTILE(3) OVER (PARTITION BY lang ORDER
BY nlogp_milli, doc_id) — asserted by the DuckDB oracle — without any
per-language global sort.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from . import load_tables
from .lmscore import ORACLE_LM, lm_perplexity

BUCKETS = ("head", "middle", "tail")


def ccnet_perplexity_buckets(spark, sf_dir: str):
    """(doc_id, lang, n_bigrams, nlogp_milli, bucket) — per-language
    perplexity terciles. Docs with <2 words carry no bigram evidence
    and are excluded (as in lm_perplexity)."""
    (docs,) = load_tables(spark, sf_dir, "documents")
    # r6: landed once — the scored table feeds BOTH the histogram
    # branch and the tie-rank branch; un-checkpointed, the entire
    # bigram-LM scoring subtree (explode + model join) executed twice.
    scored = (
        lm_perplexity(spark, sf_dir)
        .select(
            "doc_id",
            "n_bigrams",
            F.round(F.col("avg_logp") * -1000).cast("long").alias("nlogp_milli"),
        )
        .join(docs.select("doc_id", "lang"), "doc_id")
        .localCheckpoint()
    )

    # Pass 1: compact per-(lang, score) histogram + cumulative offsets.
    hist = scored.groupBy("lang", "nlogp_milli").agg(F.count("*").alias("c"))
    w_cum = (
        Window.partitionBy("lang")
        .orderBy("nlogp_milli")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offsets = hist.select(
        "lang",
        "nlogp_milli",
        (F.sum("c").over(w_cum) - F.col("c")).alias("cum_before"),
        F.sum("c").over(Window.partitionBy("lang")).alias("n_lang"),
    )

    # Pass 2: rank within the tie group only, then integer tercile math.
    w_tie = Window.partitionBy("lang", "nlogp_milli").orderBy("doc_id")
    ranked = scored.withColumn("tie_rank", F.row_number().over(w_tie)).join(
        F.broadcast(offsets), ["lang", "nlogp_milli"]
    )
    rank = F.col("cum_before") + F.col("tie_rank")
    c1 = F.expr("(n_lang + 2) div 3")  # ceil(n/3): NTILE bucket-1 size
    c2 = c1 + F.expr("(n_lang + 1) div 3")  # + bucket-2 size
    bucket = (
        F.when(rank <= c1, F.lit("head"))
        .when(rank <= c2, F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return ranked.select(
        "doc_id", "lang", "n_bigrams", "nlogp_milli", bucket.alias("bucket")
    )


def _oracle_sql() -> str:
    return f"""
WITH lm AS ({ORACLE_LM}),
scored AS (
  SELECT d.doc_id, d.lang, lm.n_bigrams,
         CAST(round(-1000 * lm.avg_logp) AS BIGINT) AS nlogp_milli
  FROM lm JOIN documents d USING (doc_id)
),
t AS (
  SELECT *, NTILE(3) OVER (
           PARTITION BY lang ORDER BY nlogp_milli, doc_id) AS nt
  FROM scored
)
SELECT doc_id, lang, n_bigrams, nlogp_milli,
       CASE nt WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket
FROM t
"""


QUERIES = {"ccnet_perplexity_buckets": ccnet_perplexity_buckets}
ORACLES = {"ccnet_perplexity_buckets": _oracle_sql()}
