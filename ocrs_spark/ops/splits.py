"""Leakage-safe train/val/test splits: assign documents to splits by
hashing their near-duplicate CLUSTER id, never the document id.

Hashing doc_ids sprays near-duplicates across splits, so paraphrased
copies of a training document land in the eval set and the benchmark
leaks (the standard failure contamination audits catch after the
fact). Splitting on the dedup-cluster label makes the guarantee
structural: every member of a connected near-dup component shares the
cluster id, hence the hash, hence the split.

Scale shape: cluster labels come from ``dedupgraph.dedup_clusters``
(edge-list connected components, corpus pays joins only on the
candidate-pair graph); the split itself is a pure projection — no
shuffle at all beyond what the cluster labeling already did. The split
hash here is a Knuth multiplicative mix kept inside BIGINT range so
DuckDB reproduces it bit-for-bit (a production run on 10^12 docs would
use xxhash64(cluster_id) — same shape, different mixer; DuckDB lacks
xxhash64, and the oracle's job is to pin the assignment logic).
Fractions are 80/10/10 over the hash's mod-100 buckets, deterministic
and stable under corpus growth: adding documents never moves an
existing cluster's split.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .dedupgraph import ORACLE_DEDUP_CLUSTERS, dedup_clusters

_MULT = 2654435761  # Knuth's multiplicative constant (fits sandbox ids in BIGINT)
_MOD = 2**32
TRAIN_PCT, VAL_PCT = 80, 10


def assign_split(clustered: DataFrame, key: str = "cluster_id") -> DataFrame:
    bucket = ((F.col(key) * F.lit(_MULT)) % F.lit(_MOD)) % 100
    split = (
        F.when(bucket < TRAIN_PCT, F.lit("train"))
        .when(bucket < TRAIN_PCT + VAL_PCT, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return clustered.withColumn("split", split)


def cluster_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, cluster_id, split) — every near-dup cluster wholly in
    one split."""
    return assign_split(dedup_clusters(spark, sf_dir)).select(
        "doc_id", "cluster_id", "split"
    )


ORACLE_CLUSTER_SAFE_SPLIT = f"""
WITH clustered AS ({ORACLE_DEDUP_CLUSTERS})
SELECT doc_id, cluster_id,
  CASE WHEN (cluster_id * {_MULT}) % {_MOD} % 100 < {TRAIN_PCT} THEN 'train'
       WHEN (cluster_id * {_MULT}) % {_MOD} % 100 < {TRAIN_PCT + VAL_PCT} THEN 'val'
       ELSE 'test' END AS split
FROM clustered
"""


QUERIES = {"cluster_safe_split": cluster_safe_split}
ORACLES = {"cluster_safe_split": ORACLE_CLUSTER_SAFE_SPLIT}
