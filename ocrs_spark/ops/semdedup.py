"""SemDeDup-style semantic deduplication (Abbas et al. 2023,
arXiv:2303.09540): cluster the embedding space, then drop, within each
cluster, every vector that has a semantically-near neighbor with a
smaller id — keeping one representative per near-duplicate group
without ever comparing vectors across clusters.

Scale shape (the paper's own recipe): the quadratic cosine comparison
happens ONLY within a cluster, so total pair cost is sum(|cluster|^2),
bounded by choosing K proportional to corpus size (the paper uses
K=50k clusters for LAION so clusters stay in the thousands). Here the
stages are:

  1. centroid model — first SEM_K vectors (the deterministic "trained"
     model, same convention as ann_ivf_topk); K tiny rows collected,
     exactly how MLlib collects k-means centers.
  2. assignment — ONE narrow literal-expression projection
     (similarity.ivf_assignments): no join, no K-times blowup, stays
     whole-stage-codegen at any corpus size.
  3. within-cluster pairwise — applyInPandas per centroid_id: one
     Arrow batch per cluster, one numpy matmul for the full cosine
     matrix (the paper runs this kernel on GPU; numpy is the CPU
     analogue). The shuffle is a single hash partition on centroid_id.

Numeric-parity note: assignment reuses the expression-form cosine whose
engine parity ann_ivf_topk's oracle already hash-proves. The numpy
kernel decides only the kept/dropped flag, never emits a float, and the
corpus is constructed so the decision margin is huge (planted
near-duplicates sit at cos~0.97, the background spectrum tops out
~0.6, threshold 0.95) — float64 summation-order differences of ~1e-15
cannot flip it.

Like embedding_cosine_pairs, the table is augmented with
dedup.planted_embeddings (cos~0.97 copies of vec_id < PLANT_N) so the
row is non-vacuous: exactly the planted copies must drop.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import functions as F

from . import load_tables
from .dedup import PLANT_N, PLANT_OFFSET, _DUCK_PERTURB, planted_embeddings
from .similarity import _DUCK_COS, ivf_assignments

SEM_K = 8  # clusters; production scales this with corpus size
SEM_TAU = 0.95  # within-cluster near-duplicate threshold


def _cluster_dropped(pdf: pd.DataFrame) -> pd.DataFrame:
    """One cluster -> the vec_ids dropped: those with a smaller-id
    neighbor at cosine >= SEM_TAU. Full cosine matrix via one matmul."""
    ids = pdf["vec_id"].to_numpy()
    order = np.argsort(ids)
    ids = ids[order]
    X = np.asarray(list(pdf["embedding"].iloc[order]), dtype=np.float64)
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    cos = X @ X.T
    # strictly-lower triangle: cos[i, j] with j < i means "i has a
    # smaller-id near neighbor" -> i drops (keep the earliest id).
    lower = np.tril(cos >= SEM_TAU, k=-1)
    return pd.DataFrame({"vec_id": ids[lower.any(axis=1)]})


def semantic_dedup(spark, sf_dir):
    """(vec_id, centroid_id, kept) for every vector in the augmented
    embeddings table."""
    (emb,) = load_tables(spark, sf_dir, "embeddings")
    aug = planted_embeddings(emb)
    cent = aug.filter(F.col("vec_id") < SEM_K).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("ce")
    )
    centroids = sorted((int(r.centroid_id), list(r.ce)) for r in cent.collect())
    assigned = ivf_assignments(
        aug.select(F.col("vec_id").cast("long").alias("vec_id"), "embedding"),
        centroids,
    # The assignment projection (K interpreted cosine folds per row) feeds
    # BOTH the per-cluster dedup branch and the final kept-join, keyed
    # differently — no exchange reuse applies, so without this the most
    # expensive pass in the query runs twice (guide §5: cut lineage when
    # a subtree is consumed by differently-keyed branches).
    ).localCheckpoint(eager=True)
    dropped = assigned.groupBy("centroid_id").applyInPandas(
        lambda _, pdf: _cluster_dropped(pdf), "vec_id long"
    )
    return (
        assigned.join(dropped.withColumn("d", F.lit(1)), "vec_id", "left")
        .select(
            "vec_id",
            "centroid_id",
            F.col("d").isNull().alias("kept"),
        )
    )


ORACLE_SEMDEDUP = f"""
WITH aug AS (
  SELECT vec_id::BIGINT AS vec_id, embedding FROM embeddings
  UNION ALL
  SELECT (vec_id + {PLANT_OFFSET})::BIGINT AS vec_id, {_DUCK_PERTURB} AS embedding
  FROM embeddings WHERE vec_id < {PLANT_N}
),
cent AS (SELECT vec_id AS centroid_id, embedding AS ce FROM aug WHERE vec_id < {SEM_K}),
assigned AS (
  SELECT vec_id, centroid_id::INT AS centroid_id, embedding FROM (
    SELECT a.vec_id, c.centroid_id, a.embedding,
           row_number() OVER (PARTITION BY a.vec_id
                              ORDER BY {_DUCK_COS.format(a='a.embedding', b='c.ce')} DESC,
                                       c.centroid_id ASC) AS arank
    FROM aug a CROSS JOIN cent c
  ) WHERE arank = 1
),
dropped AS (
  SELECT DISTINCT b.vec_id
  FROM assigned a JOIN assigned b
    ON a.centroid_id = b.centroid_id AND a.vec_id < b.vec_id
  WHERE {_DUCK_COS.format(a='a.embedding', b='b.embedding')} >= {SEM_TAU}
)
SELECT a.vec_id, a.centroid_id, (d.vec_id IS NULL) AS kept
FROM assigned a LEFT JOIN dropped d USING (vec_id)
"""

QUERIES = {"semantic_dedup": semantic_dedup}
ORACLES = {"semantic_dedup": ORACLE_SEMDEDUP}
