"""Margin-based bitext mining (Artetxe & Schwenk 2019; the
CCMatrix/WikiMatrix pipeline): find cross-corpus sentence pairs whose
cosine similarity stands out RELATIVE to each side's neighborhood,
not in absolute terms — absolute-threshold mining drowns in hubness
(generic sentences close to everything), which is exactly what the
ratio margin cancels:

    margin(x, y) = cos(x, y) / ((avgNN_k(x) + avgNN_k(y)) / 2)

A pair is emitted only if it is MUTUAL best-margin: y is x's argmax
and x is y's. The two "languages" here are the deterministic halves
of the embeddings table (even vec_id = source side, odd = target) —
stand-ins for the two encoder outputs of a real multilingual model.

Scale shape (the published pipeline's own): candidate pairs come from
the banded-LSH generator shared with ann_topk_lsh — a hash join of the
two sides' (band, bucket) tables, NEVER a cross product; both sides
are corpus-scale so neither is broadcast and the join scales like any
bucket-keyed shuffle. Everything downstream is candidates-only: the
k-NN penalty terms are one window + one partial-combinable groupBy per
direction, the mutual-best filter is two more windows over the same
candidate keys. Total: the bucket join plus shuffles keyed on src/tgt
ids — uniform md5-derived keys, no skew amplification.

Cross-engine determinism is engineered, not hoped for: cosines are
snapped to integer milli-units (one round()), the top-k penalty sums
are exact BIGINT sums, and every subsequent step is a SINGLE IEEE
operation (int sum / count, one add, one halving, one division) —
correctly-rounded and bit-identical on Spark and DuckDB, so the 6-dp
margin rounding sits on identical doubles."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from . import load_tables
from .similarity import banded_buckets, duck_banded_buckets, seq_cosine_udf

_seq_cos = seq_cosine_udf()

MARGIN_K = 4  # neighborhood size for the penalty terms
# Selective banding: 8 bands x 8 rows = 256 buckets/band (~0.4% random
# cross-pair candidate rate vs ~25% with the 2-row ANN bands, while a
# true parallel pair at cos 0.99 misses all 8 bands with p ~ 1e-4).
# Plane namespace 500 is disjoint from ANN (100) and near-dup (300).
BX_BANDS = 8
BX_ROWS = 8
BX_PLANE_BASE = 500


def bitext_margin_pairs(spark, sf_dir):
    """(src_id, tgt_id, cos, margin) for mutual best-margin pairs
    between the even (source) and odd (target) halves."""
    (emb,) = load_tables(spark, sf_dir, "embeddings")
    bb = banded_buckets(emb, BX_BANDS, BX_ROWS, BX_PLANE_BASE)
    xb = bb.filter(F.col("vec_id") % 2 == 0).withColumnRenamed("vec_id", "src_id")
    yb = bb.filter(F.col("vec_id") % 2 == 1).withColumnRenamed("vec_id", "tgt_id")
    cand = (
        xb.join(yb, ["band", "bucket"])
        .select("src_id", "tgt_id")
        .distinct()
    )
    x = emb.select(F.col("vec_id").alias("src_id"), F.col("embedding").alias("xe"))
    y = emb.select(F.col("vec_id").alias("tgt_id"), F.col("embedding").alias("ye"))
    # Integer milli-cosine: the one float rounding in the whole chain.
    # Materialized ONCE — the margin needs this table from four plan
    # branches (two rank windows, two penalty joins, the final mutual
    # filter), and without the checkpoint each branch re-runs the
    # bucketing UDF + cosine chain; at cluster scale this is the
    # standard persist-the-candidate-scores step of the published
    # pipeline (the k-NN lists are reused the same way).
    scored = (
        cand.join(x, "src_id")
        .join(y, "tgt_id")
        .select(
            "src_id",
            "tgt_id",
            F.round(_seq_cos("xe", "ye") * 1000, 0)
            .cast("long")
            .alias("cmi"),
        )
        .localCheckpoint()
    )
    wf = Window.partitionBy("src_id").orderBy(F.desc("cmi"), F.asc("tgt_id"))
    wb = Window.partitionBy("tgt_id").orderBy(F.desc("cmi"), F.asc("src_id"))
    ranked = scored.withColumn("rf", F.row_number().over(wf)).withColumn(
        "rb", F.row_number().over(wb)
    )
    fstats = (
        ranked.filter(F.col("rf") <= MARGIN_K)
        .groupBy("src_id")
        .agg(
            (F.sum("cmi") / F.count("*")).alias("favg")
        )
    )
    bstats = (
        ranked.filter(F.col("rb") <= MARGIN_K)
        .groupBy("tgt_id")
        .agg(
            (F.sum("cmi") / F.count("*")).alias("bavg")
        )
    )
    margined = (
        scored.join(fstats, "src_id")
        .join(bstats, "tgt_id")
        .withColumn(
            "margin",
            F.round(
                F.col("cmi") / ((F.col("favg") + F.col("bavg")) / 2), 6
            ),
        )
    )
    wmx = Window.partitionBy("src_id").orderBy(F.desc("margin"), F.asc("tgt_id"))
    wmy = Window.partitionBy("tgt_id").orderBy(F.desc("margin"), F.asc("src_id"))
    return (
        margined.withColumn("mx", F.row_number().over(wmx))
        .withColumn("my", F.row_number().over(wmy))
        .filter((F.col("mx") == 1) & (F.col("my") == 1))
        .select(
            "src_id",
            "tgt_id",
            F.round(F.col("cmi") / 1000.0, 3).alias("cos"),
            "margin",
        )
    )


ORACLE_BITEXT = f"""
WITH bb AS ({duck_banded_buckets(BX_BANDS, BX_ROWS, BX_PLANE_BASE)}),
cand AS (
  SELECT DISTINCT a.vec_id AS src_id, b.vec_id AS tgt_id
  FROM bb a JOIN bb b ON a.band = b.band AND a.bucket = b.bucket
  WHERE a.vec_id % 2 = 0 AND b.vec_id % 2 = 1
),
scored AS (
  SELECT src_id, tgt_id,
         round(
           list_sum(list_transform(list_zip(x.embedding, y.embedding), z -> z[1]::DOUBLE * z[2]::DOUBLE))
           / (sqrt(list_sum(list_transform(x.embedding, v -> v::DOUBLE * v::DOUBLE)))
              * sqrt(list_sum(list_transform(y.embedding, v -> v::DOUBLE * v::DOUBLE))))
           * 1000, 0)::BIGINT AS cmi
  FROM cand
  JOIN embeddings x ON x.vec_id = src_id
  JOIN embeddings y ON y.vec_id = tgt_id
),
ranked AS (
  SELECT *,
         row_number() OVER (PARTITION BY src_id ORDER BY cmi DESC, tgt_id ASC) AS rf,
         row_number() OVER (PARTITION BY tgt_id ORDER BY cmi DESC, src_id ASC) AS rb
  FROM scored
),
fstats AS (
  SELECT src_id, sum(cmi)::BIGINT / count(*)::DOUBLE AS favg
  FROM ranked WHERE rf <= {MARGIN_K} GROUP BY src_id
),
bstats AS (
  SELECT tgt_id, sum(cmi)::BIGINT / count(*)::DOUBLE AS bavg
  FROM ranked WHERE rb <= {MARGIN_K} GROUP BY tgt_id
),
margined AS (
  SELECT s.src_id, s.tgt_id, s.cmi,
         round(s.cmi / ((f.favg + b.bavg) / 2), 6) AS margin
  FROM scored s
  JOIN fstats f USING (src_id)
  JOIN bstats b USING (tgt_id)
),
mutual AS (
  SELECT *,
         row_number() OVER (PARTITION BY src_id ORDER BY margin DESC, tgt_id ASC) AS mx,
         row_number() OVER (PARTITION BY tgt_id ORDER BY margin DESC, src_id ASC) AS my
  FROM margined
)
SELECT src_id, tgt_id, round(cmi / 1000.0, 3) AS cos, margin
FROM mutual WHERE mx = 1 AND my = 1
"""

QUERIES = {"bitext_margin_pairs": bitext_margin_pairs}
ORACLES = {"bitext_margin_pairs": ORACLE_BITEXT}
