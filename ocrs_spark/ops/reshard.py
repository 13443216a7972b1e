"""Resharding-cost planning: when a corpus grows one shard
(N -> N+1), how many documents MOVE under naive mod-N placement versus
a consistent-hash ring — the infra decision behind any 10^12-doc
partitioned store (mod-N reshuffles ~N/(N+1) of the corpus; the ring
moves ~1/(N+1), which is why storage layers shard by ring).

The ring is SYNTHESIZED AT IMPORT TIME in pure Python (md5 virtual
nodes — no data dependency, positions asserted collision-free) and
embedded as LITERALS in both engines, so the Spark plan and the DuckDB
oracle share the identical ring by construction. The new ring is the
old ring plus the new shard's vnodes — the nesting that makes ring
moves small is visible in the construction.

Scale: assignment is a PURE PROJECTION — per-doc md5 position, then
"smallest vnode boundary >= h (wrap to the ring minimum)" via
array_min(filter(...)) over the literal boundary array — followed by
two broadcast joins against the bounded literal vnode tables and one
2-row aggregate. No corpus shuffle beyond the final digest; a real
resharding planner runs this BEFORE committing to the data movement.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from . import load_tables

N_OLD = 8  # current shard count
N_NEW = 9  # proposed shard count
V_NODES = 32  # virtual nodes per shard
_SALT = "ring-v1"
_SPACE = 1 << 32


def _md5_32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _ring(n_shards: int) -> list[tuple[int, int]]:
    """Sorted (position, owner) vnodes for n_shards — the first
    N_OLD shards' vnodes are IDENTICAL in both rings."""
    nodes = [
        (_md5_32(f"vnode|{_SALT}|{s}|{v}"), s)
        for s in range(n_shards)
        for v in range(V_NODES)
    ]
    assert len({p for p, _ in nodes}) == len(nodes), "vnode collision"
    return sorted(nodes)


RING_OLD = _ring(N_OLD)
RING_NEW = _ring(N_NEW)


def _owner_expr(ring: list[tuple[int, int]], h_col: str) -> str:
    """SQL expression: boundary of the vnode owning h (wrap to the
    ring minimum when h exceeds every boundary)."""
    bounds = ", ".join(str(p) + "L" for p, _ in ring)
    return (
        f"coalesce(array_min(filter(array({bounds}), b -> b >= {h_col})),"
        f" {ring[0][0]}L)"
    )


def reshard_move_plan(spark, sf_dir: str):
    """(strategy, n_docs, moved_docs, moved_milli) for strategy in
    ('mod', 'ring') — the data-movement bill of growing N_OLD ->
    N_NEW shards under each placement scheme."""
    (docs,) = load_tables(spark, sf_dir, "documents")
    h = (
        f"cast(conv(substring(md5(concat(cast(doc_id as string),"
        f" '|{_SALT}')), 1, 8), 16, 10) as bigint)"
    )
    # Two-step projection so the literal-array owner expressions see
    # the hashed column by name.
    hashed = docs.select(F.expr(h).alias("h_inner"))
    based = hashed.select(
        "h_inner",
        F.expr(_owner_expr(RING_OLD, "h_inner")).alias("bnd_old"),
        F.expr(_owner_expr(RING_NEW, "h_inner")).alias("bnd_new"),
    )
    vn_old = spark.createDataFrame(
        [(p, s) for p, s in RING_OLD], "bnd_old long, shard_old long"
    )
    vn_new = spark.createDataFrame(
        [(p, s) for p, s in RING_NEW], "bnd_new long, shard_new long"
    )
    ringed = based.join(F.broadcast(vn_old), "bnd_old").join(
        F.broadcast(vn_new), "bnd_new"
    )
    per_doc = ringed.select(
        (F.col("h_inner") % N_OLD != F.col("h_inner") % N_NEW)
        .cast("long")
        .alias("mod_moved"),
        (F.col("shard_old") != F.col("shard_new"))
        .cast("long")
        .alias("ring_moved"),
    )
    agg = per_doc.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("mod_moved").cast("long").alias("mod_moved"),
        F.sum("ring_moved").cast("long").alias("ring_moved"),
    )
    stacked = agg.selectExpr(
        """stack(2,
             'mod', n_docs, mod_moved,
             'ring', n_docs, ring_moved
           ) as (strategy, n_docs, moved_docs)"""
    )
    return stacked.select(
        "strategy",
        "n_docs",
        "moved_docs",
        F.expr("(1000 * moved_docs) div n_docs").alias("moved_milli"),
    )


def _oracle_sql() -> str:
    def lst(ring):
        return ", ".join(str(p) for p, _ in ring)

    def vals(ring):
        return ", ".join(f"({p}, {s})" for p, s in ring)

    return f"""
WITH hashed AS (
  SELECT ('0x' || substr(md5(doc_id::VARCHAR || '|{_SALT}'), 1, 8))
           ::BIGINT AS h
  FROM documents
),
owned AS (
  SELECT h,
         COALESCE(list_min(list_filter([{lst(RING_OLD)}], b -> b >= h)),
                  {RING_OLD[0][0]}) AS bnd_old,
         COALESCE(list_min(list_filter([{lst(RING_NEW)}], b -> b >= h)),
                  {RING_NEW[0][0]}) AS bnd_new
  FROM hashed
),
vo(bnd_old, shard_old) AS (VALUES {vals(RING_OLD)}),
vn(bnd_new, shard_new) AS (VALUES {vals(RING_NEW)}),
per_doc AS (
  SELECT CASE WHEN h % {N_OLD} <> h % {N_NEW} THEN 1 ELSE 0 END
           AS mod_moved,
         CASE WHEN shard_old <> shard_new THEN 1 ELSE 0 END AS ring_moved
  FROM owned JOIN vo USING (bnd_old) JOIN vn USING (bnd_new)
),
agg AS (
  SELECT count(*)::BIGINT AS n_docs,
         sum(mod_moved)::BIGINT AS mod_moved,
         sum(ring_moved)::BIGINT AS ring_moved
  FROM per_doc
)
SELECT strategy, n_docs, moved_docs,
       ((1000 * moved_docs) // n_docs)::BIGINT AS moved_milli
FROM (
  SELECT 'mod' AS strategy, n_docs, mod_moved AS moved_docs FROM agg
  UNION ALL
  SELECT 'ring', n_docs, ring_moved FROM agg
)
"""


QUERIES = {"reshard_move_plan": reshard_move_plan}
ORACLES = {"reshard_move_plan": _oracle_sql()}
