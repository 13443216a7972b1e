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
With ``budget=None`` the raw global offsets (doc_id, n_tokens,
g_start) are returned instead, feeding the budget sweep below.
The DuckDB oracle is the single-node window cumsum, proving the
distributed scan computes the identical stream layout.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import functions as F

from . import load_tables

CONTEXT_TOKENS = 512


def packed_layout(docs, budget: int | None = CONTEXT_TOKENS, parts: int = 32):
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
                    "g_start": start.astype("int64"),
                }
            )

    offs = ordered.mapInPandas(
        _scan, schema="doc_id long, n_tokens long, g_start long"
    )
    if budget is None:
        return offs
    return offs.select(
        "doc_id",
        "n_tokens",
        F.expr(f"g_start div {int(budget)}").alias("seq_id"),
        F.expr(f"g_start % {int(budget)}").alias("seq_offset"),
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



# Candidate context budgets for the efficiency sweep. The decision a
# training pipeline actually makes — which sequence length to pack at —
# trades window count against how many documents straddle a window
# boundary (straddled docs lose attention locality or get truncated).
SWEEP_BUDGETS = (256, 512, 1024, 2048)


def packing_efficiency_sweep(spark, sf_dir):
    """Per candidate budget: docs straddling a window boundary, docs
    landing exactly on a window start, window count and last-window
    fill — all derived from ONE distributed prefix-sum pass (the
    corpus-scale work), then a 4x row multiply straight into a
    map-side-combined aggregate. Integer-exact throughout.
    """
    (docs,) = load_tables(spark, sf_dir, "documents")
    offs = packed_layout(docs, budget=None)
    b = F.explode(
        F.array(*[F.lit(x) for x in SWEEP_BUDGETS])
    ).alias("budget")
    rows = offs.select("n_tokens", "g_start", b)
    straddle = (
        (F.col("n_tokens") > 0)
        & (
            F.expr("(g_start + n_tokens - 1) div budget")
            > F.expr("g_start div budget")
        )
    ).cast("long")
    aligned = (F.col("g_start") % F.col("budget") == 0).cast("long")
    agg = rows.groupBy("budget").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.sum(straddle).cast("long").alias("straddled_docs"),
        F.sum(aligned).cast("long").alias("aligned_docs"),
    )
    return agg.select(
        F.col("budget").cast("long").alias("budget"),
        "n_docs",
        "total_tokens",
        "straddled_docs",
        "aligned_docs",
        F.expr("(1000 * straddled_docs) div n_docs").alias(
            "straddle_milli"
        ),
        F.expr("(total_tokens + budget - 1) div budget").alias("n_windows"),
        F.expr(
            "(1000 * (total_tokens - ((total_tokens + budget - 1)"
            " div budget - 1) * budget)) div budget"
        ).alias("last_fill_milli"),
    )


ORACLE_SWEEP = """
WITH n AS (
  SELECT doc_id,
         len(list_filter(string_split(text, ' '), w -> w <> ''))::BIGINT
           AS n_tokens
  FROM documents
),
c AS (
  SELECT doc_id, n_tokens,
         (sum(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING))
           ::BIGINT - n_tokens AS g_start
  FROM n
),
b AS (SELECT unnest([256, 512, 1024, 2048])::BIGINT AS budget),
x AS (
  SELECT b.budget, c.n_tokens, c.g_start,
         CASE WHEN c.n_tokens > 0
                   AND (c.g_start + c.n_tokens - 1) // b.budget
                       > c.g_start // b.budget
              THEN 1 ELSE 0 END AS straddle,
         CASE WHEN c.g_start % b.budget = 0 THEN 1 ELSE 0 END AS aligned
  FROM c CROSS JOIN b
),
a AS (
  SELECT budget,
         count(*)::BIGINT AS n_docs,
         sum(n_tokens)::BIGINT AS total_tokens,
         sum(straddle)::BIGINT AS straddled_docs,
         sum(aligned)::BIGINT AS aligned_docs
  FROM x GROUP BY budget
)
SELECT budget, n_docs, total_tokens, straddled_docs, aligned_docs,
       ((1000 * straddled_docs) // n_docs)::BIGINT AS straddle_milli,
       ((total_tokens + budget - 1) // budget)::BIGINT AS n_windows,
       ((1000 * (total_tokens - ((total_tokens + budget - 1) // budget - 1)
          * budget)) // budget)::BIGINT AS last_fill_milli
FROM a
"""


QUERIES = {
    "sequence_packing": sequence_packing,
    "packing_efficiency_sweep": packing_efficiency_sweep,
}
ORACLES = {
    "sequence_packing": ORACLE_PACKING,
    "packing_efficiency_sweep": ORACLE_SWEEP,
}
