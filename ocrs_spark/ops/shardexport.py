"""Training-shard export — the "deliver the curated corpus as N
balanced, deterministically-shuffled shard files" sink stage
(WebDataset / MosaicML-streaming convention: a training job maps
shards to data-loader workers, so shard count, balance, and a manifest
are the delivery contract).

Placement is md5-hash sharding keyed on doc_id (the same engine-parity
hash trick as ops/mixture.py): deterministic under retry and
partitioning, uniform across shards (no hot shard), and it doubles as
the corpus-level shuffle training wants — within-shard order is the
hash too, so consumers reading shards sequentially see a fixed but
de-correlated document order. The op WRITES real parquet (one file per
shard via repartition on shard_id), reads the files back, and emits
the per-shard manifest from the read-back data — so the contract row
proves the sink round-trips, not just that the plan compiles. The
DuckDB oracle recomputes the manifest straight from the documents
table; any loss/duplication in the write path breaks the hash match.

100 TB: one hash-partition exchange (uniform keys by construction),
embarrassingly-parallel file writes, manifest is an O(N_SHARDS) agg.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from . import load_tables

N_SHARDS = 16
_SALT = "shard-v1"
_U32 = 4294967296


def _shard_id(doc_id_col):
    h = F.conv(
        F.substring(F.md5(F.concat(doc_id_col.cast("string"), F.lit(_SALT))), 1, 8),
        16,
        10,
    ).cast("long")
    return (h % N_SHARDS).cast("int")


def _export_dir(spark, sf_dir: str) -> str:
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    return os.path.join(wh, "shard_export", os.path.basename(sf_dir.rstrip("/")))


def write_shards(spark, sf_dir: str) -> str:
    """Write the sharded corpus; returns the export directory."""
    (docs,) = load_tables(spark, sf_dir, "documents")
    out = _export_dir(spark, sf_dir)
    assigned = docs.select(
        "doc_id",
        "text",
        _shard_id(F.col("doc_id")).alias("shard_id"),
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(_SALT))).alias(
            "order_key"
        ),
    )
    (
        assigned.repartition(N_SHARDS, "shard_id")
        .sortWithinPartitions("order_key")
        .write.mode("overwrite")
        .partitionBy("shard_id")
        .parquet(out)
    )
    return out


def export_shards(spark, sf_dir):
    """(shard_id, n_docs, n_tokens, min_doc, max_doc) manifest computed
    from the WRITTEN shard files (write -> read-back -> aggregate)."""
    out = write_shards(spark, sf_dir)
    back = spark.read.parquet(out)
    n_tok = F.size(F.expr("filter(split(text, ' '), w -> w <> '')")).cast("long")
    return (
        back.select("shard_id", "doc_id", n_tok.alias("n"))
        .groupBy(F.col("shard_id").cast("int").alias("shard_id"))
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n").cast("long").alias("n_tokens"),
            F.min("doc_id").cast("long").alias("min_doc"),
            F.max("doc_id").cast("long").alias("max_doc"),
        )
    )


ORACLE_SHARDS = f"""
SELECT
  (('0x' || substr(md5(doc_id::VARCHAR || '{_SALT}'), 1, 8))::BIGINT % {N_SHARDS})::INT
    AS shard_id,
  count(*)::BIGINT AS n_docs,
  sum(len(list_filter(string_split(text, ' '), w -> w <> '')))::BIGINT AS n_tokens,
  min(doc_id)::BIGINT AS min_doc,
  max(doc_id)::BIGINT AS max_doc
FROM documents
GROUP BY 1
"""

QUERIES = {"export_shards": export_shards}
ORACLES = {"export_shards": ORACLE_SHARDS}
