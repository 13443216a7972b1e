"""Canonical-document resolution by pointer jumping: follow
redirect / rel=canonical chains to their terminal target in
O(log chain-length) self-join rounds — the distributed
path-compression pattern (pointer doubling) a crawler uses to collapse
redirect chains over 10^12 URLs, where the naive one-hop-per-round walk
would take as many corpus-scale joins as the LONGEST chain.

Chains are planted deterministically: doc d points to d-1 when
d % CHAIN_MOD is in 1..CHAIN_LEN, so every block of CHAIN_MOD ids
carries a chain of CHAIN_LEN hops ending at the block head (d with
d % CHAIN_MOD == 0) and the remaining ids are already canonical.
Termination is structural (block heads never point anywhere), so the
fixpoint is well-defined.

Each round joins the current pointer table against itself:
next'(d) = next(next(d)) when next(d) is itself redirected, else
next(d). After ceil(log2(CHAIN_LEN)) + 1 rounds every pointer is
terminal — the loop runs a FIXED round count derived from the planted
maximum, checkpointing per round to keep the plan flat (the iterative
shape ops/labelprop.py and ops/logreg.py also use). The join is
doc_id-keyed and uniform; no skew, no window, no collect.

Output also carries the hop distance to the canonical target —
accumulated exactly during doubling (dist' = dist(d) + dist(next(d)))
— which the DuckDB recursive-CTE oracle recomputes hop by hop.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from . import load_tables

CHAIN_MOD = 8  # ids per block
CHAIN_LEN = 5  # planted chain length (hops in the longest chain)


def _rounds() -> int:
    r = 0
    while (1 << r) < CHAIN_LEN:
        r += 1
    # ceil(log2(CHAIN_LEN)) rounds reach the fixpoint: after round k
    # every pointer has advanced min(2^k, chain_dist) hops, and
    # 2^r >= CHAIN_LEN covers the longest planted chain. The former
    # extra "prove the fixpoint" round re-ran a full self-join +
    # checkpoint only to confirm nothing moved — the proof is the
    # inequality above, and the oracle equality pins it every run
    # (r6: 25% fewer rounds, one fewer join+materialize pass).
    return r


def canonical_resolution(spark, sf_dir: str):
    """(doc_id, canonical_id, n_hops) for every document."""
    (docs,) = load_tables(spark, sf_dir, "documents")
    m = F.col("doc_id") % CHAIN_MOD
    ptr = docs.select(
        "doc_id",
        F.when((m >= 1) & (m <= CHAIN_LEN), F.col("doc_id") - 1)
        .otherwise(F.col("doc_id"))
        .alias("nxt"),
        F.when((m >= 1) & (m <= CHAIN_LEN), F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("dist"),
    )
    for _ in range(_rounds()):
        hop = ptr.select(
            F.col("doc_id").alias("h_id"),
            F.col("nxt").alias("h_nxt"),
            F.col("dist").alias("h_dist"),
        )
        # LEFT join: a pointer whose target row is missing from the
        # corpus is treated as terminal instead of dropping the doc
        # (planted ids are contiguous, so this branch is never taken
        # here — asserted by the oracle equality).
        ptr = (
            ptr.join(hop, F.col("nxt") == F.col("h_id"), "left")
            .select(
                "doc_id",
                F.coalesce("h_nxt", "nxt").alias("nxt"),
                (F.col("dist") + F.coalesce("h_dist", F.lit(0))).alias("dist"),
            )
            .localCheckpoint()
        )
    return ptr.select(
        "doc_id",
        F.col("nxt").cast("long").alias("canonical_id"),
        F.col("dist").cast("long").alias("n_hops"),
    )


def _oracle_sql() -> str:
    return f"""
WITH RECURSIVE walk AS (
  SELECT doc_id, doc_id AS cur, 0 AS n_hops
  FROM documents
  UNION ALL
  SELECT doc_id, cur - 1 AS cur, n_hops + 1
  FROM walk
  WHERE cur % {CHAIN_MOD} BETWEEN 1 AND {CHAIN_LEN}
)
SELECT doc_id,
       CAST(cur AS BIGINT) AS canonical_id,
       CAST(n_hops AS BIGINT) AS n_hops
FROM walk
WHERE cur % {CHAIN_MOD} NOT BETWEEN 1 AND {CHAIN_LEN}
"""


QUERIES = {"canonical_resolution": canonical_resolution}
ORACLES = {"canonical_resolution": _oracle_sql()}
