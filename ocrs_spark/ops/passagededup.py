"""Cross-document passage dedup — CCNet/RefinedWeb-style boilerplate
removal: split every document into fixed-token passages, count how many
DISTINCT documents each exact passage appears in, and drop passages
shared by MIN_DF or more documents (nav bars, license footers, cookie
banners — the stuff that repeats verbatim across a crawl). The kept
passages are reassembled in original order, so the output is a cleaned
corpus plus per-document drop accounting.

This is the complement of the intra-document operators already in the
library: ``chunking`` shapes one document, ``substrdedup`` finds
repeats WITHIN a document, ``dedup`` drops whole near-duplicate
documents — this one removes the passage-level boilerplate that
survives all three (each host's footer appears once per page, so no
whole-document or within-document signal fires).

Scale shape: the passage split is a pure expression stage (regexp
split, ``explode(sequence(...))``, ``slice`` + ``array_join`` — all
whole-stage codegen, zero shuffle). Frequency counting is ONE
groupBy on md5(passage) — keys are content hashes, so the shuffle is
uniform by construction (no host/domain skew: a footer shared by 10^6
pages is one group with a big count, and count(DISTINCT doc) partials
map-side). The join back is hash-to-hash on the same key, and the
final reassembly groups by doc_id, which the explode preserved the
partitioning of. Nothing is collected; no UDFs.

Parity: reference semantics are computed-result parity only (the
reference is an OCR engine; this operator is north-rule corpus
plumbing). The DuckDB oracle independently recomputes the same
passages with 1-based list slicing and ``string_agg ORDER BY``.
"""

from __future__ import annotations

from pyspark.sql import functions as F

SEG = 8  # tokens per non-overlapping passage
MIN_DF = 2  # passages appearing in >= MIN_DF distinct docs are dropped


def passage_dedup_df(docs, text_col: str = "text", id_col: str = "doc_id"):
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n_seg = F.ceil(F.size(toks) / F.lit(float(SEG)))
    segs = docs.select(
        F.col(id_col).alias("doc_id"),
        toks.alias("toks"),
        F.explode(F.sequence(F.lit(0).cast("bigint"), n_seg - 1)).alias(
            "seg_idx"
        ),
    ).select(
        "doc_id",
        "seg_idx",
        F.array_join(
            F.slice(F.col("toks"), (F.col("seg_idx") * SEG + 1).cast("int"), SEG),
            " ",
        ).alias("seg_text"),
    )
    # r6: corpus-wide passage document-frequency as TWO stacked windows
    # over ONE hash-keyed exchange (dense_rank by doc_id, then max —
    # count(DISTINCT doc_id) isn't a window aggregate, but max(dense_
    # rank) over the same partition is exactly it). The former
    # aggregate-then-join-back shape computed the seg explode TWICE
    # (one per plan branch) and paid a third seg-level exchange for the
    # join; the final determinism-only orderBy is dropped too (guide
    # §2.4 — the driver comparator and oracle are order-insensitive).
    from pyspark.sql import Window

    w_rank = Window.partitionBy("h").orderBy("doc_id")
    w_all = Window.partitionBy("h")
    flagged = (
        segs.withColumn("h", F.md5("seg_text"))
        .withColumn("dr", F.dense_rank().over(w_rank))
        .withColumn("seg_df", F.max("dr").over(w_all))
    )
    kept_struct = F.when(
        F.col("seg_df") < MIN_DF, F.struct("seg_idx", "seg_text")
    )
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_segments"),
            F.sum((F.col("seg_df") >= MIN_DF).cast("long")).alias("n_dropped"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(kept_struct)),
                    lambda x: x.seg_text,
                ),
                " ",
            ).alias("kept_text"),
        )
    )


def passage_dedup(spark, sf_dir: str):
    """(doc_id, n_segments, n_dropped, kept_text): every document with
    cross-document boilerplate passages removed."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return passage_dedup_df(docs)


ORACLE_PASSAGE_DEDUP = f"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
  FROM documents
), segs AS (
  SELECT doc_id, k AS seg_idx,
         array_to_string(t[k*{SEG}+1 : k*{SEG}+{SEG}], ' ') AS seg_text
  FROM (SELECT doc_id, t, CAST(ceil(len(t)/{SEG}.0) AS BIGINT) AS n
        FROM toks),
       UNNEST(generate_series(0, n - 1)) AS u(k)
), freq AS (
  SELECT md5(seg_text) AS h, count(DISTINCT doc_id) AS seg_df
  FROM segs GROUP BY 1
)
SELECT s.doc_id,
       count(*) AS n_segments,
       CAST(count(*) FILTER (seg_df >= {MIN_DF}) AS BIGINT) AS n_dropped,
       coalesce(
         string_agg(CASE WHEN seg_df < {MIN_DF} THEN seg_text END,
                    ' ' ORDER BY seg_idx),
         '') AS kept_text
FROM segs s JOIN freq ON md5(s.seg_text) = freq.h
GROUP BY s.doc_id
ORDER BY doc_id
"""

QUERIES = {"passage_dedup": passage_dedup}
ORACLES = {"passage_dedup": ORACLE_PASSAGE_DEDUP}
