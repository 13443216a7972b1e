"""Hard-negative mining for contrastive training: (anchor, positive,
negative) triples where the positive is a verified near-duplicate and
the negatives are the anchor's own LSH-bucket mates that FAIL the
duplicate threshold — the "hard" negatives retrieval-model training
actually wants (random negatives are trivially separable; bucket mates
share projection structure with the anchor, so they are the confusable
ones — the same reason DPR/contrastive pipelines mine negatives from
the retriever's own candidate pool instead of sampling uniformly).

Everything reuses the dedup module's machinery and guarantees: anchors
and positives are the planted cos~0.97 pairs (dedup.planted_embeddings
— deterministic, so the row is non-vacuous on the synthetic corpus),
candidates come from the SAME banded-LSH bucket join the near-dup pass
uses (bucketed, never all-pairs), verification is exact fold-order-
pinned cosine on candidates only, and the per-anchor top-NEG ranking
orders by (rounded cos DESC, vec_id) so the cut is deterministic. A
negative must score BELOW the duplicate threshold — mining never
poisons training with an unlabeled positive.

Scale shape: one bucketing pass over the corpus (Arrow-batched matmul,
shared with the dedup row), one bucket-keyed self-join bounded by
bucket occupancy, cosine on candidates, one small window per anchor
(candidates per anchor are bucket-bounded). No new corpus-sized
shuffles beyond what near-dup detection already pays.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import load_tables
from .dedup import (
    COSINE_THRESHOLD,
    EMB_LSH_BANDS,
    EMB_LSH_ROWS,
    EMB_PLANE_BASE,
    PLANT_N,
    PLANT_OFFSET,
    _DUCK_PERTURB,
    planted_embeddings,
)
from .similarity import _cos_expr, banded_buckets, duck_banded_buckets

NEG_PER_ANCHOR = 2


def hard_negative_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(anchor, positive, negative, neg_cos): per planted near-dup
    pair, the NEG_PER_ANCHOR hardest same-bucket non-duplicates."""
    (emb,) = load_tables(spark, sf_dir, "embeddings")
    aug = planted_embeddings(emb)
    bb = banded_buckets(aug, EMB_LSH_BANDS, EMB_LSH_ROWS, EMB_PLANE_BASE)
    anchors = bb.filter(F.col("vec_id") < PLANT_N).select(
        F.col("vec_id").alias("anchor"), "band", "bucket"
    )
    mates = bb.select(F.col("vec_id").alias("negative"), "band", "bucket")
    cand = (
        anchors.join(mates, ["band", "bucket"])
        .filter(
            (F.col("negative") != F.col("anchor"))
            & (F.col("negative") != F.col("anchor") + PLANT_OFFSET)
        )
        .select("anchor", "negative")
        .distinct()
    )
    ea = aug.select(F.col("vec_id").alias("anchor"), F.col("embedding").alias("ea"))
    en = aug.select(F.col("vec_id").alias("negative"), F.col("embedding").alias("en"))
    scored = (
        cand.join(F.broadcast(ea), "anchor")
        .join(en, "negative")
        .withColumn("neg_cos", F.round(F.expr(_cos_expr("ea", "en")), 3))
        .filter(F.col("neg_cos") < COSINE_THRESHOLD)
    )
    w = Window.partitionBy("anchor").orderBy(
        F.col("neg_cos").desc(), F.col("negative").asc()
    )
    return (
        scored.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= NEG_PER_ANCHOR)
        .select(
            "anchor",
            (F.col("anchor") + PLANT_OFFSET).alias("positive"),
            "negative",
            "neg_cos",
        )
    )


def _oracle() -> str:
    bands_sql = duck_banded_buckets(
        EMB_LSH_BANDS, EMB_LSH_ROWS, EMB_PLANE_BASE, source="aug"
    )
    return f"""
WITH aug AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + {PLANT_OFFSET} AS vec_id, {_DUCK_PERTURB} AS embedding
  FROM embeddings WHERE vec_id < {PLANT_N}
),
bb AS ({bands_sql}),
cand AS (
  SELECT DISTINCT a.vec_id AS anchor, m.vec_id AS negative
  FROM bb a JOIN bb m ON a.band = m.band AND a.bucket = m.bucket
  WHERE a.vec_id < {PLANT_N}
    AND m.vec_id <> a.vec_id
    AND m.vec_id <> a.vec_id + {PLANT_OFFSET}
),
scored AS (
  SELECT anchor, negative,
    round(
      list_sum(list_transform(list_zip(ea.embedding, en.embedding),
                              z -> z[1]::DOUBLE * z[2]::DOUBLE))
      / (sqrt(list_sum(list_transform(ea.embedding, x -> x::DOUBLE * x::DOUBLE)))
         * sqrt(list_sum(list_transform(en.embedding, x -> x::DOUBLE * x::DOUBLE)))),
    3) AS neg_cos
  FROM cand
  JOIN aug ea ON ea.vec_id = anchor
  JOIN aug en ON en.vec_id = negative
),
ranked AS (
  SELECT anchor, negative, neg_cos,
         row_number() OVER (PARTITION BY anchor
                            ORDER BY neg_cos DESC, negative ASC) AS r
  FROM scored WHERE neg_cos < {COSINE_THRESHOLD}
)
SELECT anchor, anchor + {PLANT_OFFSET} AS positive, negative, neg_cos
FROM ranked WHERE r <= {NEG_PER_ANCHOR}
"""


ORACLE_HARD_NEGATIVES = _oracle()

QUERIES = {"hard_negative_triples": hard_negative_triples}
ORACLES = {"hard_negative_triples": ORACLE_HARD_NEGATIVES}
