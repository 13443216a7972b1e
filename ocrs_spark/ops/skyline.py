"""Distributed skyline (Pareto frontier) query: the documents no other
document beats on BOTH axes — corpus curation's multi-objective
shortlist (longest AND highest-scoring; no scalarization weight to
tune), the classic dominance operator relational engines lack.

Exactness argument for the two-phase plan: any globally non-dominated
point is non-dominated within its own partition (a same-partition
dominator would dominate it globally too), so

  global skyline  ⊆  union of per-partition local skylines

— phase 1 computes local skylines in parallel (each an O(n log n)
sort-scan inside one Arrow batch stream), phase 2 re-runs the same
scan over the pruned union. The union is the only data movement: on
real distributions skylines are tiny (O(log^d n) expected points for
independent dims), so phase 2's single-partition pass reads a
driver-sized set, not the corpus. Dominance is the standard weak-
dominance definition (>= on both axes, > on at least one); duplicate
skyline points all survive.

Axes: maximize n_chars and an independent doc_id-keyed integer score
(deterministic, so the frontier is reproducible and non-trivial —
perfectly correlated axes would collapse the skyline to one point).
The DuckDB oracle is the INDEPENDENT quadratic NOT-EXISTS dominance
query, so agreement pins the sort-scan algorithm, not a shared
implementation.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import load_tables

_MULT = 2654435761
_SCORE = f"(doc_id * {_MULT}) % 1000"


def _skyline_scan(batches):
    """2-D skyline of the rows in this partition: sort x desc, keep a
    group's y-max rows when they beat every y seen at larger x."""
    frames = [b for b in batches if len(b)]
    if not frames:
        return
    pdf = pd.concat(frames, ignore_index=True)
    pdf = pdf.sort_values(["x", "y"], ascending=False, kind="mergesort")
    out_idx = []
    best_y = None
    for _, grp in pdf.groupby("x", sort=False):
        gmax = int(grp["y"].iloc[0])
        if best_y is None or gmax > best_y:
            out_idx.extend(grp.index[grp["y"] == gmax].tolist())
            best_y = gmax
    yield pdf.loc[out_idx, ["doc_id", "x", "y"]]


def skyline(points: DataFrame) -> DataFrame:
    """(doc_id, x, y) -> the weak-dominance skyline (maximize both)."""
    schema = "doc_id long, x long, y long"
    local = points.mapInPandas(_skyline_scan, schema=schema)
    # phase 2: same scan over the pruned union in one partition — the
    # input is already skyline-sized, not corpus-sized
    return local.repartition(1).mapInPandas(_skyline_scan, schema=schema)


def doc_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    (docs,) = load_tables(spark, sf_dir, "documents")
    pts = docs.select(
        "doc_id",
        F.col("n_chars").cast("long").alias("x"),
        F.expr(_SCORE).cast("long").alias("y"),
    )
    return skyline(pts)


ORACLE_SKYLINE = f"""
WITH pts AS (
  SELECT doc_id, n_chars::BIGINT AS x, ((doc_id * {_MULT}) % 1000)::BIGINT AS y
  FROM documents
)
SELECT doc_id, x, y FROM pts p
WHERE NOT EXISTS (
  SELECT 1 FROM pts q
  WHERE q.x >= p.x AND q.y >= p.y AND (q.x > p.x OR q.y > p.y)
)
"""


QUERIES = {"doc_skyline": doc_skyline}
ORACLES = {"doc_skyline": ORACLE_SKYLINE}
