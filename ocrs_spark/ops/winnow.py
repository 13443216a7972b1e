"""Winnowing document fingerprints — Schleimer/Wilkerson/Aiken 2003
(the MOSS algorithm): hash every K-token gram, slide a W-hash window,
and in each window select the minimum hash, breaking ties by the
RIGHTMOST position. The selected (position, hash) pairs, distinct per
document, are the fingerprint set. Two guarantees make this the
standard local fingerprinting scheme: any shared run of at least
W + K - 1 tokens between two documents yields at least one shared
fingerprint (detection), and expected density is 2/(W+1) — output
size is a fixed fraction of input length regardless of content, so
the fingerprint table is ~half the gram stream even in the worst case.

This complements the existing signature family: MinHash (`ops/dedup`)
sketches WHOLE documents, SimHash gives one global vector, ExactSubstr
(`ops/substrdedup`) needs a corpus-wide gram shuffle; winnowing is the
LOCAL scheme — fingerprints carry positions, so downstream matching
can localize the shared region, and selection is per-document with no
corpus-wide state at all.

Scale shape: gram generation is a pure expression stage (split +
explode(sequence) + slice/array_join/md5, all codegen). Selection is
ONE window partitioned by doc_id ordered by gram position with a
forward ROWS frame — a single hash shuffle on doc_id, streaming frame
evaluation, no self-join. ``min(struct(hash, -pos))`` implements
min-hash-then-rightmost lexicographically in one aggregate. The final
distinct is per-doc (same partitioning, map-side partial). Short docs
(fewer than W grams) degrade to one truncated window — the frame
clamps at the partition edge on both engines.

The DuckDB oracle is deliberately a DIFFERENT formulation (window
starts joined to in-range grams, ranked by (hash, pos DESC)) so the
frame arithmetic and tie-break are pinned by independent construction.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

K = 4  # tokens per gram
W = 4  # window of consecutive gram hashes


def winnow_fingerprints_df(docs, text_col: str = "text", id_col: str = "doc_id"):
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    grams = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            toks.alias("toks"),
            F.size(toks).alias("n"),
        )
        .filter(F.col("n") >= K)
        .select(
            "doc_id",
            (F.col("n") - K + 1).alias("n_grams"),
            F.explode(
                F.sequence(F.lit(0).cast("bigint"), (F.col("n") - K).cast("bigint"))
            ).alias("p"),
            F.col("toks"),
        )
        .select(
            "doc_id",
            "n_grams",
            "p",
            F.md5(
                F.array_join(F.slice(F.col("toks"), (F.col("p") + 1).cast("int"), K), " ")
            ).alias("h"),
        )
    )
    frame = Window.partitionBy("doc_id").orderBy("p").rowsBetween(0, W - 1)
    sel = (
        grams.withColumn(
            "m", F.min(F.struct(F.col("h"), (-F.col("p")).alias("np"))).over(frame)
        )
        # valid window starts only; short docs keep the single s=0 window
        .filter(F.col("p") <= F.greatest(F.col("n_grams") - W, F.lit(0)))
        .select(
            "doc_id",
            (-F.col("m.np")).alias("fp_pos"),
            F.col("m.h").alias("fp_hash"),
        )
        .distinct()
    )
    return sel.orderBy("doc_id", "fp_pos", "fp_hash")


def winnow_fingerprints(spark, sf_dir: str):
    """(doc_id, fp_pos, fp_hash): the winnowing fingerprint set of every
    document — distinct selected (position, K-gram md5) pairs."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return winnow_fingerprints_df(docs)


ORACLE_WINNOW = f"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
  FROM documents
), grams AS (
  SELECT doc_id,
         len(t) - {K} + 1 AS n_grams,
         p,
         md5(array_to_string(t[p+1 : p+{K}], ' ')) AS h
  FROM (SELECT doc_id, t FROM toks WHERE len(t) >= {K}),
       UNNEST(generate_series(0, CAST(len(t) - {K} AS BIGINT))) AS u(p)
), starts AS (
  SELECT doc_id, p AS s FROM grams
  WHERE p <= greatest(n_grams - {W}, 0)
), ranked AS (
  SELECT st.doc_id, st.s, g.p, g.h,
         row_number() OVER (
           PARTITION BY st.doc_id, st.s
           ORDER BY g.h, g.p DESC) AS r
  FROM starts st
  JOIN grams g ON g.doc_id = st.doc_id
              AND g.p BETWEEN st.s AND st.s + {W} - 1
)
SELECT DISTINCT doc_id, p AS fp_pos, h AS fp_hash
FROM ranked WHERE r = 1
ORDER BY doc_id, fp_pos, fp_hash
"""

QUERIES = {"winnow_fingerprints": winnow_fingerprints}
ORACLES = {"winnow_fingerprints": ORACLE_WINNOW}
