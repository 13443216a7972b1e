"""Reproducible epoch data ordering — the "seeded shuffle" every large
training run needs: each epoch visits every document exactly once in a
pseudo-random order that is a pure function of (seed, epoch, doc_id),
so any worker can recompute its shard's order without coordination,
a resumed run continues from the same permutation, and two runs with
the same seed consume identical batch sequences (the determinism
contract data-loader stacks like Megatron/torchdata document).

Order key = md5(seed || epoch || doc_id) — the same cross-engine hash
idiom as dedup/dsir. Shard = key mod N_SHARDS, position = rank of the
key within the shard. Because the key is uniform, shards are balanced
to binomial noise WITHOUT knowing doc counts, and the within-shard
rank is computed by a window over the shard partition — the global
permutation is never materialized as one sort: at 10^12 docs each
epoch is N_SHARDS independent per-shard sorts, exactly how the
manifests would be written (one file per shard, rows in rank order).

The emitted row is the audit summary a manifest writer would assert
before shipping: per (epoch, shard) the doc count plus the first/last
doc ids in shuffle order, and a checksum over the ordered id sequence
(sum of doc_id * rank — order-sensitive, so two engines agreeing on it
agree on the entire permutation, not just membership)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from . import load_tables

SHUFFLE_SEED = 41
N_EPOCHS = 2
N_SHARDS = 4


def epoch_shard_manifests(spark, sf_dir):
    """(epoch, shard, n_docs, first_doc, last_doc, order_checksum):
    the per-shard audit row of each epoch's deterministic shuffle."""
    (docs,) = load_tables(spark, sf_dir, "documents")
    epochs = spark.range(N_EPOCHS).select(F.col("id").cast("int").alias("epoch"))
    keyed = (
        docs.select("doc_id")
        .crossJoin(F.broadcast(epochs))
        .withColumn(
            "k",
            F.md5(
                F.concat_ws("|", F.lit(SHUFFLE_SEED), F.col("epoch"), F.col("doc_id"))
            ),
        )
        .withColumn(
            "shard",
            (
                F.conv(F.substring("k", 1, 8), 16, 10).cast("long") % N_SHARDS
            ).cast("long"),
        )
    )
    w = Window.partitionBy("epoch", "shard").orderBy("k", "doc_id")
    ranked = keyed.withColumn("rank", F.row_number().over(w).cast("long"))
    return (
        ranked.groupBy("epoch", "shard")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.expr("min_by(doc_id, rank)").alias("first_doc"),
            F.expr("max_by(doc_id, rank)").alias("last_doc"),
            F.sum(F.col("doc_id") * F.col("rank")).cast("long").alias("order_checksum"),
        )
        .orderBy("epoch", "shard")
    )


ORACLE_DATAORDER = f"""
WITH epochs AS (SELECT unnest(range({N_EPOCHS}))::INT AS epoch),
keyed AS (
  SELECT d.doc_id, e.epoch,
         md5({SHUFFLE_SEED} || '|' || e.epoch || '|' || d.doc_id) AS k
  FROM documents d CROSS JOIN epochs e
),
sharded AS (
  SELECT *, ('0x' || substr(k, 1, 8))::BIGINT % {N_SHARDS} AS shard
  FROM keyed
),
ranked AS (
  SELECT *,
         row_number() OVER (PARTITION BY epoch, shard ORDER BY k, doc_id)::BIGINT
           AS rank
  FROM sharded
)
SELECT epoch, shard,
       count(*)::BIGINT AS n_docs,
       min_by(doc_id, rank) AS first_doc,
       max_by(doc_id, rank) AS last_doc,
       sum(doc_id * rank)::BIGINT AS order_checksum
FROM ranked
GROUP BY epoch, shard
ORDER BY epoch, shard
"""

QUERIES = {"epoch_shard_manifests": epoch_shard_manifests}
ORACLES = {"epoch_shard_manifests": ORACLE_DATAORDER}
