"""Frozen-frontier label propagation over the extracted link graph —
the semi-supervised quality-prior spreader: a small set of human-
audited seed pages carries a label (here the document's language, the
deterministic stand-in for a quality/spam verdict), and each round
every still-unlabeled page adopts the MAJORITY label of its already-
labeled neighbors (ties break to the lexicographically smallest
label). Labeled nodes freeze — seeds are clamped and propagated
assignments never flip — so the result is exactly layered committee
voting: hops records the round a node was first reached, like BFS
depth but carrying a label chosen by neighbor vote instead of mere
reachability. (Classic LPA re-votes every node each round and needs
tie randomization; the frozen variant is the deterministic member of
the family, which is what an auditable curation pipeline wants.)

Scale shape: the adjacency is the undirected closure of the extracted
link graph (`linkgraph._edges`, bucketed by src at 100 TB). Each round
is ONE adjacency-vs-frontier hash join, one anti-join against the
labeled set (both on the node key, so they co-locate), one
(node, label) groupBy with map-side partials, and one per-node rank
window — O(E) work per round, labels stay (node, label, hops) rows,
nothing collected. Degree skew caps at the groupBy because votes are
counted, not enumerated.

Oracle: DuckDB recomputes the planted edge formula (linkgraph
contract: targets (id*7+13) % N and (id*31+17) % N), closes it
undirected, and unrolls both voting rounds as chained CTEs.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .linkgraph import _edges

N_SEEDS = 16  # doc_id < N_SEEDS are the audited seed pages
ITERATIONS = 2


def _undirected(spark, sf_dir):
    e = _edges(spark, sf_dir).select("src", "dst")
    return (
        e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def propagate(adj, seeds, iterations: int = ITERATIONS):
    """Spread ``seeds`` (doc_id, label, hops=0) over undirected edge
    list ``adj`` (src, dst) by frozen-frontier majority vote."""
    labels = seeds
    for it in range(1, iterations + 1):
        votes = (
            adj.join(
                labels.select(F.col("doc_id").alias("src"), "label"), "src"
            )
            .select(F.col("dst").alias("doc_id"), "label")
            .join(labels.select("doc_id"), "doc_id", "left_anti")
            .groupBy("doc_id", "label")
            .agg(F.count("*").alias("n_votes"))
        )
        w = Window.partitionBy("doc_id").orderBy(
            F.col("n_votes").desc(), F.col("label").asc()
        )
        picked = (
            votes.withColumn("r", F.row_number().over(w))
            .filter(F.col("r") == 1)
            .select("doc_id", "label", F.lit(it).alias("hops"))
        )
        labels = labels.unionByName(picked)
    return labels.orderBy("doc_id")


def label_propagation(spark, sf_dir: str):
    """(doc_id, label, hops): seed labels spread ITERATIONS rounds by
    frozen-frontier majority vote over the undirected link graph."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    adj = _undirected(spark, sf_dir)
    seeds = docs.filter(F.col("doc_id") < N_SEEDS).select(
        "doc_id", F.col("lang").alias("label"), F.lit(0).alias("hops")
    )
    return propagate(adj, seeds)


def _vote_cte(prev: str, it: int) -> str:
    return f"""
v{it} AS (
  SELECT adj.dst AS doc_id, p.label, count(*) AS n_votes
  FROM adj JOIN {prev} p ON adj.src = p.doc_id
  WHERE adj.dst NOT IN (SELECT doc_id FROM {prev})
  GROUP BY adj.dst, p.label
),
p{it} AS (
  SELECT doc_id, label, {it} AS hops
  FROM (SELECT doc_id, label,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY n_votes DESC, label ASC) AS r
        FROM v{it})
  WHERE r = 1
),
l{it} AS (SELECT * FROM {prev} UNION ALL SELECT * FROM p{it})"""


ORACLE_LABELPROP = f"""
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
l0 AS (
  SELECT doc_id, lang AS label, 0 AS hops FROM documents
  WHERE doc_id < {N_SEEDS}
),{_vote_cte('l0', 1)},{_vote_cte('l1', 2)}
SELECT doc_id, label, hops FROM l{ITERATIONS} ORDER BY doc_id
"""

QUERIES = {"label_propagation": label_propagation}
ORACLES = {"label_propagation": ORACLE_LABELPROP}
