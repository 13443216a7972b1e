"""Duplicate-cluster formation: connected components over the verified
near-duplicate pair graph, picking one canonical survivor per cluster.

Pair generation (MinHash LSH + Jaccard verify, ``dedup.ngram_jaccard_
pairs``) yields an EDGE LIST; an actual corpus dedup must group those
edges into components so each duplicate cluster keeps exactly one
document. This is iterative min-label propagation: every node starts
labeled with its own id, and each round takes the min label over its
neighborhood (plus itself) until no label changes.

Scale shape: the edge table is candidate-pair-sized (orders of
magnitude smaller than the corpus), each round is one join + one
groupBy on doc ids — uniformly-hashed shuffle keys — and the round
count is the component diameter. Near-dup clusters are dense and
shallow (diameter 2-4 even for millions of members), so the loop
terminates in a handful of rounds with an explicit convergence check;
a worst-case cap guards pathological chain graphs, where the
alternating large-star/small-star algorithm (Kiveris et al. 2014,
"Connected Components in MapReduce and Beyond" — O(log^2 n) rounds)
is the drop-in replacement. Per-round ``localCheckpoint`` keeps the
plan flat (the BPE lesson: chained iteration lineage OOMs the plan
stringifier long before the data hurts).

The DuckDB oracle computes the same components with a recursive CTE
(transitive min-reachability) — independent algorithm, same fixpoint.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from . import load_tables
from .dedup import ORACLE_JACCARD, ngram_jaccard_pairs

MAX_ROUNDS = 20


def connected_components(pairs, src: str = "doc_a", dst: str = "doc_b"):
    """(node, component) for every node in the edge list; component id
    is the min node id in the component."""
    edges = (
        pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(pairs.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = edges.select("u").distinct().withColumn("lbl", F.col("u"))
    for _ in range(MAX_ROUNDS):
        neigh_min = (
            edges.join(labels.withColumnRenamed("u", "v"), "v")
            .groupBy("u")
            .agg(F.min("lbl").alias("nlbl"))
        )
        new_labels = (
            labels.join(neigh_min, "u", "left")
            .select(
                "u",
                F.least("lbl", F.coalesce("nlbl", "lbl")).alias("lbl"),
                (F.least("lbl", F.coalesce("nlbl", "lbl")) != F.col("lbl"))
                .cast("int")
                .alias("changed"),
            )
            .localCheckpoint(eager=True)
        )
        changed = new_labels.agg(F.sum("changed")).first()[0]
        labels = new_labels.drop("changed")
        if not changed:
            break
    return labels.select(F.col("u").alias("node"), F.col("lbl").alias("component"))


def dedup_clusters(spark, sf_dir):
    """(doc_id, cluster_id, keep): every document labeled with its
    near-dup component (min doc_id), singletons labeling themselves;
    keep marks the one canonical survivor per cluster."""
    pairs = ngram_jaccard_pairs(spark, sf_dir)
    comps = connected_components(pairs)
    (docs,) = load_tables(spark, sf_dir, "documents")
    out = docs.select("doc_id").join(
        comps.withColumnRenamed("node", "doc_id"), "doc_id", "left"
    )
    cluster = F.coalesce("component", "doc_id")
    return out.select(
        "doc_id",
        cluster.alias("cluster_id"),
        (cluster == F.col("doc_id")).alias("keep"),
    )


ORACLE_DEDUP_CLUSTERS = f"""
WITH RECURSIVE pairs AS (
  SELECT doc_a, doc_b FROM ({ORACLE_JACCARD})
),
edges AS (
  SELECT doc_a AS u, doc_b AS v FROM pairs
  UNION
  SELECT doc_b AS u, doc_a AS v FROM pairs
),
reach(u, v) AS (
  SELECT u, u AS v FROM (SELECT DISTINCT u FROM edges)
  UNION
  SELECT e.u, r.v FROM edges e JOIN reach r ON e.v = r.u
),
labels AS (SELECT u AS doc_id, min(v) AS cluster_id FROM reach GROUP BY u)
SELECT d.doc_id,
       coalesce(l.cluster_id, d.doc_id) AS cluster_id,
       (coalesce(l.cluster_id, d.doc_id) = d.doc_id) AS keep
FROM documents d LEFT JOIN labels l USING (doc_id)
"""

QUERIES = {"dedup_clusters": dedup_clusters}
ORACLES = {"dedup_clusters": ORACLE_DEDUP_CLUSTERS}
