"""Data Selection with Importance Resampling (DSIR, Xie et al. 2023):
score every document by how much more likely its hashed n-gram
features are under a target-domain sample than under the raw corpus,
then keep the top-K — the pretraining-data selection stage that sits
between the hard quality filters (gopher.py) and model-based scoring
(lmscore.py's perplexity, nbclassify.py's NB classes). What makes it
distinct from both: the feature space is HASHED into a fixed B
buckets, so the "model" is exactly 2*B counts no matter how large the
vocabulary grows — the published method's trick for scoring trillions
of tokens against a small target set.

Features are unigram + bigram occurrences, hashed md5-prefix mod B
(the same cross-engine int idiom as dedup.py's SimHash). The target
sample here is intrinsic and deterministic: documents mentioning
'spark' at least three times stand in for the in-domain seed set.
Importance weight per doc: sum over feature occurrences of
ln p_target(bucket) - ln p_raw(bucket), with add-one smoothing over
the B buckets. Selection is the top-K by rounded weight with doc_id
tiebreak — deterministic on both engines.

100 TB shape: one explode + one (doc_id, bucket) groupBy for the
feature counts (map-side combinable; bucket keys uniform by md5);
both bucket-distribution tables aggregate to <= B rows and broadcast
back into the scoring join, and the two grand totals ride a one-row
cross join (no driver round-trip). The final top-K is an orderBy +
limit — Spark's TakeOrdered, per-partition heads merged, never a
global sort. Weight sums round to 6 dp: each term is O(1) and docs
carry ~100 features, so cross-engine libm/fold-order noise (~1e-13)
sits far below the rounding grid.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from . import load_tables

N_BUCKETS = 1024
TOP_K = 100
TARGET_MIN_HITS = 3  # docs with >= this many 'spark' tokens are the seed


def _doc_bucket_counts(docs):
    """(doc_id, is_target, bk, c): per-document hashed-feature counts.

    r6: ONE Arrow batch pass (guide §4.2) — the per-gram md5 runs
    through hashlib's C digest and the per-(doc, bucket) counts come
    out of a collections.Counter, so the former gram-level explode +
    groupBy (doc_id, is_target, bk) exchange never materializes.
    Hash inputs are unchanged (md5 hex prefix % N_BUCKETS over the
    same unigrams + space-joined bigrams, empties included — Python
    str.split(' ') and Spark split(text, ' ') agree exactly); the
    oracle sweep pins identity at every SF.
    """
    from collections import Counter

    def _bucket_batches(batches):
        import hashlib

        import pandas as pd

        md5 = hashlib.md5
        for pdf in batches:
            out = {"doc_id": [], "is_target": [], "bk": [], "c": []}
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                ws = text.split(" ")
                is_target = (
                    sum(1 for t in ws if t == "spark") >= TARGET_MIN_HITS
                )
                cnt = Counter(
                    int(md5(g.encode()).hexdigest()[:8], 16) % N_BUCKETS
                    for g in ws
                )
                cnt.update(
                    int(
                        md5((a + " " + b).encode()).hexdigest()[:8], 16
                    )
                    % N_BUCKETS
                    for a, b in zip(ws, ws[1:])
                )
                for bk, c in cnt.items():
                    out["doc_id"].append(doc_id)
                    out["is_target"].append(is_target)
                    out["bk"].append(bk)
                    out["c"].append(c)
            yield pd.DataFrame(out)

    spark = docs.sparkSession
    return (
        docs.select("doc_id", "text")
        .repartition(spark.sparkContext.defaultParallelism)
        .mapInPandas(
            _bucket_batches,
            schema="doc_id bigint, is_target boolean, bk bigint, c bigint",
        )
    )


def dsir_importance_sample(spark, sf_dir):
    """Top-K documents by hashed-feature importance weight:
    (doc_id, n_feats, logw)."""
    (docs,) = load_tables(spark, sf_dir, "documents")
    # Materialized once: the explode+groupBy feature pass feeds both
    # the bucket-distribution aggregate and the scoring join — without
    # the checkpoint each branch re-tokenizes the corpus.
    db = _doc_bucket_counts(docs).localCheckpoint()

    # BOTH bucket distributions in ONE aggregation pass (a target
    # feature is also a raw feature, so the target side is just a
    # conditional sum over the same groups).
    counts = db.groupBy("bk").agg(
        F.sum("c").cast("long").alias("cr"),
        F.sum(F.when(F.col("is_target"), F.col("c")).otherwise(F.lit(0)))
        .cast("long")
        .alias("ct"),
    )
    # Grand totals as a 1-row frame, broadcast into the scoring join.
    totals = counts.agg(
        F.coalesce(F.sum("cr"), F.lit(0)).cast("long").alias("tr"),
        F.coalesce(F.sum("ct"), F.lit(0)).cast("long").alias("tt"),
    )

    scored = (
        db.join(F.broadcast(counts), "bk")
        .crossJoin(F.broadcast(totals))
        .select(
            "doc_id",
            "c",
            (
                F.col("c")
                * (
                    F.log(
                        (F.coalesce("ct", F.lit(0)) + 1).cast("double")
                        / (F.col("tt") + N_BUCKETS)
                    )
                    - F.log(
                        (F.col("cr") + 1).cast("double")
                        / (F.col("tr") + N_BUCKETS)
                    )
                )
            ).alias("contrib"),
        )
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("long").alias("n_feats"),
            F.round(F.sum("contrib"), 6).alias("logw"),
        )
    )
    return scored.orderBy(F.desc("logw"), F.asc("doc_id")).limit(TOP_K)


ORACLE_DSIR = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS ws,
         len(list_filter(string_split(text, ' '), t -> t = 'spark'))
           >= {TARGET_MIN_HITS} AS is_target
  FROM documents
),
feats AS (
  SELECT doc_id, is_target,
         unnest(list_concat(ws,
           [ws[i] || ' ' || ws[i + 1]
            for i in range(1, greatest(len(ws) - 1, 0) + 1)])) AS g
  FROM toks
),
db AS (
  SELECT doc_id, is_target,
         ('0x' || substr(md5(g), 1, 8))::BIGINT % {N_BUCKETS} AS bk,
         count(*)::BIGINT AS c
  FROM feats GROUP BY 1, 2, 3
),
tc AS (SELECT bk, sum(c)::BIGINT AS ct FROM db WHERE is_target GROUP BY bk),
rc AS (SELECT bk, sum(c)::BIGINT AS cr FROM db GROUP BY bk),
tot AS (
  SELECT (SELECT coalesce(sum(ct), 0)::BIGINT FROM tc) AS tt,
         (SELECT coalesce(sum(cr), 0)::BIGINT FROM rc) AS tr
),
scored AS (
  SELECT db.doc_id,
         sum(db.c)::BIGINT AS n_feats,
         round(sum(db.c * (
             ln((coalesce(tc.ct, 0) + 1)::DOUBLE / (tot.tt + {N_BUCKETS}))
           - ln((rc.cr + 1)::DOUBLE / (tot.tr + {N_BUCKETS})))), 6) AS logw
  FROM db
  JOIN rc USING (bk)
  LEFT JOIN tc USING (bk)
  CROSS JOIN tot
  GROUP BY db.doc_id
)
SELECT doc_id, n_feats, logw
FROM scored ORDER BY logw DESC, doc_id ASC LIMIT {TOP_K}
"""

QUERIES = {"dsir_importance_sample": dsir_importance_sample}
ORACLES = {"dsir_importance_sample": ORACLE_DSIR}
