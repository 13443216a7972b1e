"""Bounded-fanout 2-hop neighbor sampling — the GraphSAGE/PinSage
mini-batch construction step: for each seed node, sample at most
FANOUT neighbors, then at most FANOUT neighbors of each of those,
yielding the (seed, hop-1, hop-2) support paths a GNN batch trains
on. The whole point at web scale is the BOUND: a celebrity node with
10^8 neighbors contributes FANOUT rows per occurrence, so batch size
is O(seeds * FANOUT^2) regardless of degree skew — the sampling rank
is exactly the skew cap.

Sampling is deterministic (md5 of a hop-tagged edge key), the
published trick for reproducible GNN batches: any worker regenerates
the same support set from (seed, hop) alone, no RNG state shipped.
The graph is the undirected closure of the extracted link graph
(``linkgraph._edges``, materialized once and shared with PageRank/BFS).

Plan shape: per hop, ONE join of the frontier against the adjacency
(both sides hash-shuffled on the node key — at 100 TB the adjacency
is bucketed by src so the join co-locates) and one rank window
partitioned by the frontier key. Row counts never exceed
|frontier| * FANOUT, so hop 2's inputs are already bounded by hop 1's
output — degree skew dies at the first window, not in the join."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .linkgraph import _edges

FANOUT = 3
N_SEEDS = 8  # doc_id < N_SEEDS are the batch seeds


def _undirected(spark, sf_dir):
    e = _edges(spark, sf_dir).select("src", "dst")
    return (
        e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def sample_two_hop(spark, sf_dir):
    """(seed_id, mid_id, nbr_id): every sampled 2-hop support path for
    the first N_SEEDS documents."""
    adj = _undirected(spark, sf_dir)
    h1 = (
        adj.filter(F.col("src") < N_SEEDS)
        .select(F.col("src").alias("seed_id"), F.col("dst").alias("mid_id"))
        .withColumn(
            "rk", F.md5(F.concat_ws("|", F.lit("h1"), "seed_id", "mid_id"))
        )
    )
    w1 = Window.partitionBy("seed_id").orderBy("rk", "mid_id")
    h1 = (
        h1.withColumn("r", F.row_number().over(w1))
        .filter(F.col("r") <= FANOUT)
        .select("seed_id", "mid_id")
    )
    h2 = (
        h1.join(adj, h1.mid_id == adj.src)
        .select("seed_id", "mid_id", F.col("dst").alias("nbr_id"))
        .withColumn(
            "rk",
            F.md5(F.concat_ws("|", F.lit("h2"), "seed_id", "mid_id", "nbr_id")),
        )
    )
    w2 = Window.partitionBy("seed_id", "mid_id").orderBy("rk", "nbr_id")
    return (
        h2.withColumn("r", F.row_number().over(w2))
        .filter(F.col("r") <= FANOUT)
        .select("seed_id", "mid_id", "nbr_id")
        .orderBy("seed_id", "mid_id", "nbr_id")
    )


# The oracle recomputes the planted edge formulas (linkgraph's
# contract: targets (id*7+13) % N and (id*31+17) % N), closes them
# undirected, and applies the same md5-ranked sampling.
ORACLE_GRAPH_SAMPLE = f"""
WITH n AS (SELECT count(*)::BIGINT AS nn FROM documents),
e0 AS (
  SELECT doc_id AS src, (doc_id*7 + 13) % nn AS dst FROM documents, n
  UNION ALL
  SELECT doc_id AS src, (doc_id*31 + 17) % nn AS dst FROM documents, n
),
adj AS (
  SELECT DISTINCT src, dst FROM (
    SELECT src, dst FROM e0 UNION ALL SELECT dst AS src, src AS dst FROM e0
  ) WHERE src <> dst
),
h1r AS (
  SELECT src AS seed_id, dst AS mid_id,
         row_number() OVER (
           PARTITION BY src
           ORDER BY md5('h1' || '|' || src || '|' || dst), dst) AS r
  FROM adj WHERE src < {N_SEEDS}
),
h1 AS (SELECT seed_id, mid_id FROM h1r WHERE r <= {FANOUT}),
h2r AS (
  SELECT h1.seed_id, h1.mid_id, adj.dst AS nbr_id,
         row_number() OVER (
           PARTITION BY h1.seed_id, h1.mid_id
           ORDER BY md5('h2' || '|' || h1.seed_id || '|' || h1.mid_id
                        || '|' || adj.dst), adj.dst) AS r
  FROM h1 JOIN adj ON adj.src = h1.mid_id
)
SELECT seed_id, mid_id, nbr_id FROM h2r WHERE r <= {FANOUT}
ORDER BY seed_id, mid_id, nbr_id
"""

QUERIES = {"graph_sample_two_hop": sample_two_hop}
ORACLES = {"graph_sample_two_hop": ORACLE_GRAPH_SAMPLE}
