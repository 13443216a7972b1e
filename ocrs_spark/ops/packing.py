"""Sequence packing for training: assign every document a slot in a
fixed-budget token stream via a DISTRIBUTED prefix sum.

Packing concatenates the corpus (in deterministic doc_id order) into
fixed-size context windows; each doc needs its global token offset.
The naive Spark spelling — ``sum() OVER (ORDER BY doc_id)`` with no
PARTITION BY — moves the entire corpus into ONE task (Spark warns
exactly this), a guaranteed 100 TB failure. The scalable shape is the
classic two-phase scan:

1. range-repartition + sort by doc_id (range exchange, parallel),
   pinned with localCheckpoint so both passes see identical partitions;
2. per-partition token subtotals -> driver (one row per partition,
   bounded by parallelism, NOT data size) -> exclusive prefix offsets
   broadcast back;
3. per-partition local cumsum + its partition's offset, in one Arrow
   batch pass.

Output: (doc_id, n_tokens, seq_id, seq_offset) where seq_id is the
context window the doc STARTS in and seq_offset its position there —
docs may straddle windows (standard packing-with-overflow semantics).
The DuckDB oracle is the single-node window cumsum, proving the
distributed scan computes the identical stream layout.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import functions as F

from . import load_tables

CONTEXT_TOKENS = 512


def packed_layout(docs, budget: int = CONTEXT_TOKENS, parts: int = 32):
    toks = docs.select(
        "doc_id",
        F.size(F.expr("filter(split(text, ' '), w -> w <> '')"))
        .cast("long")
        .alias("n_tokens"),
    )
    ordered = (
        toks.repartitionByRange(parts, "doc_id")
        .sortWithinPartitions("doc_id")
        .withColumn("pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    # Pass 1: one subtotal row per partition — the driver sees O(parts)
    # rows regardless of corpus size.
    subtotal_rows = (
        ordered.groupBy("pid").agg(F.sum("n_tokens").alias("t")).collect()
    )
    subtotals = {r["pid"]: r["t"] for r in subtotal_rows}
    offsets = {}
    acc = 0
    for pid in sorted(subtotals):
        offsets[pid] = acc
        acc += subtotals[pid]
    b_off = ordered.sparkSession.sparkContext.broadcast(offsets)

    # Pass 2: local cumsum + broadcast offset. Rows arrive sorted by
    # doc_id within the pinned partition.
    def _scan(batches):
        carry = None
        base = 0.0
        for pdf in batches:
            if carry is None and len(pdf):
                base = b_off.value[int(pdf["pid"].iloc[0])]
                carry = 0
            if not len(pdf):
                continue
            cum = pdf["n_tokens"].cumsum() + base + carry
            carry += int(pdf["n_tokens"].sum())
            start = cum - pdf["n_tokens"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_tokens": pdf["n_tokens"],
                    "seq_id": (start // budget).astype("int64"),
                    "seq_offset": (start % budget).astype("int64"),
                }
            )

    return ordered.mapInPandas(
        _scan, schema="doc_id long, n_tokens long, seq_id long, seq_offset long"
    )


def sequence_packing(spark, sf_dir):
    (docs,) = load_tables(spark, sf_dir, "documents")
    return packed_layout(docs)


ORACLE_PACKING = f"""
WITH n AS (
  SELECT doc_id,
         len(list_filter(string_split(text, ' '), w -> w <> ''))::BIGINT AS n_tokens
  FROM documents
),
c AS (
  SELECT doc_id, n_tokens,
         (sum(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING))::BIGINT
           - n_tokens AS start
  FROM n
)
SELECT doc_id, n_tokens,
       (start // {CONTEXT_TOKENS})::BIGINT AS seq_id,
       (start % {CONTEXT_TOKENS})::BIGINT AS seq_offset
FROM c
"""

QUERIES = {"sequence_packing": sequence_packing}
ORACLES = {"sequence_packing": ORACLE_PACKING}
