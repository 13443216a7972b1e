"""Image-caption mining + alignment scoring over the interleaved corpus
— the CLIP-training-data leg of the pipeline (the reference extracts
text FROM images; a multimodal training corpus additionally needs the
text NEXT TO each image, paired and alignment-filtered).

- ``mine_caption_pairs`` — for every image span, attach the nearest
  text span on each side within the same document (OBELICS-style
  surrounding-text mining over interleaved web documents), and choose
  a single caption: the closer side by span offset, ties to the
  following text (alt-text/captions conventionally trail the image).
  Implemented as two running window frames over (doc_id, offset) —
  ``last(.., ignorenulls)`` over the preceding rows and ``first`` over
  the following rows — so the whole mine costs ONE shuffle on doc_id
  and one sort per document, no self-join, no explode beyond the span
  fan-out. Spans-per-document is bounded by document length, so frames
  never degenerate; a 10^12-document corpus pays exactly one
  hash-partitioned window, the same shape as the reweave stage
  (pipeline.py reweave_documents).

- ``caption_alignment_topk`` — CLIP-score-style alignment ranking:
  embed both sides (deterministically keyed into the embeddings table
  so both engines rebuild identical vectors: caption -> vec_id =
  doc_id % |embeddings| via a broadcast one-row count, image ->
  vec_id parsed from the media ref), exact double-precision cosine
  with the dedup module's fold order (bit-identical engine-to-engine),
  and keep the top-K captions per image. The top-K is TWO-PHASE: a
  per-(image, salt) partial ``row_number() <= K`` prunes each salted
  slice before the global per-image window runs — the global window
  then sees at most SALTS*K rows per image, so one viral image paired
  with 10^8 candidate captions costs SALTS bounded sorts instead of a
  single-reducer straggler (same salting idea as skew.py's two-phase
  aggregate, applied to a windowed top-k). The partial phase keeps a
  superset of every global winner (each winner survives its own
  slice's top-K), so the result is exactly the single-window answer
  the DuckDB oracle computes.

Ordering is on (round(cos, 3) DESC, doc_id ASC): rounding first makes
the boundary deterministic even if the engines' unrounded doubles ever
diverged in the last bit, and the doc_id tiebreak pins ties exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import load_tables
from .similarity import _cos_expr

TOP_K = 5
SALTS = 8


def mine_caption_pairs(docs: DataFrame) -> DataFrame:
    """(doc_id, spans) -> one row per image span with its nearest
    preceding/following text spans and the chosen caption."""
    flat = docs.select("doc_id", F.explode("spans").alias("s")).select(
        "doc_id", "s.kind", "s.text", "s.media_ref", "s.offset"
    )
    base = Window.partitionBy("doc_id").orderBy("offset")
    prev = base.rowsBetween(Window.unboundedPreceding, -1)
    nxt = base.rowsBetween(1, Window.unboundedFollowing)
    txt = F.when(F.col("kind") == "text", F.col("text"))
    toff = F.when(F.col("kind") == "text", F.col("offset"))
    ctx = flat.select(
        "doc_id",
        "kind",
        "media_ref",
        F.col("offset").alias("span_offset"),
        F.last(txt, ignorenulls=True).over(prev).alias("cap_before"),
        F.last(toff, ignorenulls=True).over(prev).alias("off_before"),
        F.first(txt, ignorenulls=True).over(nxt).alias("cap_after"),
        F.first(toff, ignorenulls=True).over(nxt).alias("off_after"),
    )
    dist_before = F.col("span_offset") - F.col("off_before")
    dist_after = F.col("off_after") - F.col("span_offset")
    caption = (
        F.when(F.col("off_after").isNull(), F.col("cap_before"))
        .when(F.col("off_before").isNull(), F.col("cap_after"))
        .when(dist_before < dist_after, F.col("cap_before"))
        .otherwise(F.col("cap_after"))  # ties -> following text
    )
    return (
        ctx.filter(F.col("kind") == "image")
        .select(
            "doc_id",
            "media_ref",
            "span_offset",
            "cap_before",
            "cap_after",
            caption.alias("caption"),
        )
        .filter(F.col("caption").isNotNull())
    )


def caption_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..flagship import interleaved_documents

    return mine_caption_pairs(interleaved_documents(spark, sf_dir))


# The oracle rebuilds the synthetic interleaved spans from the flat
# documents table (same construction as flagship.ORACLE_OCR_IMAGE_SPANS)
# and runs the SAME generic window mine in ANSI SQL — it does not use
# the closed-form layout, so the windowing semantics themselves are
# what's compared. "offset" is a DuckDB keyword; the rebuilt span rows
# call it span_pos.
ORACLE_CAPTION_PAIRS = """
WITH spans AS (
  SELECT doc_id, 'text' AS kind, substr(text, 1, 40) AS text,
         NULL::VARCHAR AS media_ref, 0 AS span_pos FROM documents
  UNION ALL
  SELECT doc_id, 'text', substr(text, 41, 40), NULL, 2 FROM documents
  UNION ALL
  SELECT doc_id, 'image', NULL,
         CASE WHEN doc_id % 5 = 4 THEN 'img-blank'
              ELSE 'img-' || (doc_id % 5)::VARCHAR END, 1 FROM documents
  UNION ALL
  SELECT doc_id, 'image', NULL, 'img-' || ((doc_id + 1) % 4)::VARCHAR, 3
  FROM documents WHERE doc_id % 3 = 0
),
ctx AS (
  SELECT doc_id, kind, media_ref, span_pos,
    last_value(CASE WHEN kind = 'text' THEN text END IGNORE NULLS) OVER (
      PARTITION BY doc_id ORDER BY span_pos
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS cap_before,
    last_value(CASE WHEN kind = 'text' THEN span_pos END IGNORE NULLS) OVER (
      PARTITION BY doc_id ORDER BY span_pos
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS off_before,
    first_value(CASE WHEN kind = 'text' THEN text END IGNORE NULLS) OVER (
      PARTITION BY doc_id ORDER BY span_pos
      ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS cap_after,
    first_value(CASE WHEN kind = 'text' THEN span_pos END IGNORE NULLS) OVER (
      PARTITION BY doc_id ORDER BY span_pos
      ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS off_after
  FROM spans
)
SELECT doc_id, media_ref, span_pos AS span_offset, cap_before, cap_after,
  CASE WHEN off_after IS NULL THEN cap_before
       WHEN off_before IS NULL THEN cap_after
       WHEN span_pos - off_before < off_after - span_pos THEN cap_before
       ELSE cap_after END AS caption
FROM ctx
WHERE kind = 'image'
  AND (cap_before IS NOT NULL OR cap_after IS NOT NULL)
"""



def alignment_topk(pairs: DataFrame, emb: DataFrame, k: int = TOP_K) -> DataFrame:
    """Rank mined (image, caption) pairs by embedding cosine, keep the
    top-k captions per image. ``pairs`` needs (doc_id, media_ref);
    ``emb`` is (vec_id, embedding)."""
    n = emb.select(F.count("*").alias("__n"))
    img_id = (
        F.when(F.col("media_ref") == "img-blank", F.lit(5))
        .otherwise(F.substring("media_ref", 5, 10).cast("int"))
        .cast("bigint")
    )
    keyed = (
        pairs.crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "media_ref",
            (F.col("doc_id") % F.col("__n")).alias("cap_vec"),
            img_id.alias("img_vec"),
        )
    )
    ec = emb.select(F.col("vec_id").alias("cap_vec"), F.col("embedding").alias("ec"))
    ei = emb.select(F.col("vec_id").alias("img_vec"), F.col("embedding").alias("ei"))
    scored = (
        keyed.join(ec, "cap_vec")
        .join(F.broadcast(ei), "img_vec")
        .withColumn("align_cos", F.round(F.expr(_cos_expr("ec", "ei")), 3))
    )
    order = [F.col("align_cos").desc(), F.col("doc_id").asc()]
    partial = Window.partitionBy("media_ref", "__salt").orderBy(*order)
    final = Window.partitionBy("media_ref").orderBy(*order)
    return (
        scored.withColumn("__salt", F.col("doc_id") % SALTS)
        .withColumn("__pr", F.row_number().over(partial))
        .filter(F.col("__pr") <= k)
        .withColumn("cap_rank", F.row_number().over(final))
        .filter(F.col("cap_rank") <= k)
        .select("media_ref", "cap_rank", "doc_id", "align_cos")
    )


def caption_alignment_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    (emb,) = load_tables(spark, sf_dir, "embeddings")
    return alignment_topk(caption_pairs(spark, sf_dir), emb)


ORACLE_CAPTION_ALIGNMENT = f"""
WITH pairs AS ({ORACLE_CAPTION_PAIRS}),
keyed AS (
  SELECT doc_id, media_ref,
         doc_id % (SELECT count(*) FROM embeddings) AS cap_vec,
         CASE WHEN media_ref = 'img-blank' THEN 5
              ELSE substr(media_ref, 5)::INT END AS img_vec
  FROM pairs
),
scored AS (
  SELECT k.doc_id, k.media_ref,
    round(
      list_sum(list_transform(list_zip(ec.embedding, ei.embedding),
                              z -> z[1]::DOUBLE * z[2]::DOUBLE))
      / (sqrt(list_sum(list_transform(ec.embedding, x -> x::DOUBLE * x::DOUBLE)))
         * sqrt(list_sum(list_transform(ei.embedding, x -> x::DOUBLE * x::DOUBLE)))),
    3) AS align_cos
  FROM keyed k
  JOIN embeddings ec ON ec.vec_id = k.cap_vec
  JOIN embeddings ei ON ei.vec_id = k.img_vec
),
ranked AS (
  SELECT media_ref, doc_id, align_cos,
         row_number() OVER (PARTITION BY media_ref
                            ORDER BY align_cos DESC, doc_id ASC) AS cap_rank
  FROM scored
)
SELECT media_ref, cap_rank, doc_id, align_cos FROM ranked WHERE cap_rank <= {TOP_K}
"""


QUERIES = {
    "caption_pairs": caption_pairs,
    "caption_alignment_topk": caption_alignment_topk,
}

ORACLES = {
    "caption_pairs": ORACLE_CAPTION_PAIRS,
    "caption_alignment_topk": ORACLE_CAPTION_ALIGNMENT,
}
