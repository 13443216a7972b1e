"""Distributed triangle counting with degree-ordered orientation — the
canonical bounded-skew graph pattern (Suri & Vassilvitskii 2011,
"Counting Triangles and the Curse of the Last Reducer"): clustering
coefficients drive spam/link-farm detection on web graphs, and the
naive neighborhood join dies on exactly the hub nodes a web graph is
full of.

Orient every undirected edge from the (degree, id)-smaller endpoint to
the larger; then each triangle has exactly ONE node with out-edges to
the other two, so triangles = wedges (pairs of out-neighbors) that
close with an oriented edge. The orientation bounds every node's
out-degree by O(sqrt(m)) — a 10^8-degree hub emits almost no wedges
because its edges all point INTO it — so the wedge join's fan-out is
O(m^1.5) worst case instead of sum(d^2), the curse-of-the-last-reducer
fix. Three hash joins, no per-node adjacency materialization.

The graph is synthesized deterministically from doc ids: ring edges
(i, i+1), chords (i, i+2) — each consecutive triple closes exactly one
triangle — and noise chords (i, i+5) that close nothing, so the count
is exactly n and the extractor must not invent or miss closures. The
DuckDB oracle counts the same graph with the INDEPENDENT symmetric
algorithm (directed 3-cycle join / 6), so agreement pins the
orientation logic, not a shared implementation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import load_tables

_GAPS = (1, 2, 5)


def synth_graph_edges(docs: DataFrame) -> DataFrame:
    """Undirected edge list (a, b), a != b, one row per planted edge."""
    n = docs.select(F.count("*").alias("n"))
    gaps = ", ".join(str(g) for g in _GAPS)
    return (
        docs.crossJoin(F.broadcast(n))
        .select(
            F.col("doc_id").alias("a"),
            F.explode(F.expr(f"transform(array({gaps}), g -> (doc_id + g) % n)")).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
    )


def triangle_count(edges: DataFrame) -> DataFrame:
    """One row: (n_edges, n_wedges, n_triangles) over the undirected
    simple graph induced by ``edges``."""
    # pin the normalized edge list once: und feeds degrees, orientation,
    # and closure — without the checkpoint the synthesis subtree (and its
    # 1-row count broadcast) re-executes in every branch (the dedupgraph
    # lesson)
    und = (
        edges.select(F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = (
        und.select(F.col("u").alias("node"))
        .unionAll(und.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("deg").alias("dv"))
    # orient from (deg, id)-smaller to larger
    oriented = (
        und.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(
                (F.col("du") < F.col("dv"))
                | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))),
                F.struct(F.col("u").alias("s"), F.col("v").alias("t")),
            )
            .otherwise(F.struct(F.col("v").alias("s"), F.col("u").alias("t")))
            .alias("e")
        )
        .select("e.s", "e.t")
    )
    o1 = oriented.select(F.col("s").alias("w_src"), F.col("t").alias("w1"))
    o2 = oriented.select(F.col("s").alias("w_src"), F.col("t").alias("w2"))
    wedges = o1.join(o2, "w_src").filter(F.col("w1") < F.col("w2"))
    # a wedge (w1 < w2) closes iff the undirected edge {w1, w2} exists;
    # und is already normalized u < v, so closure is a plain equi-join
    # (joining against the ORIENTED set would need an OR condition and
    # degenerate to a nested loop)
    tri = wedges.join(
        und.select(F.col("u").alias("w1"), F.col("v").alias("w2")),
        ["w1", "w2"],
        "left_semi",
    )
    return (
        und.agg(F.count("*").cast("long").alias("n_edges"))
        .crossJoin(wedges.agg(F.count("*").cast("long").alias("n_wedges")))
        .crossJoin(tri.agg(F.count("*").cast("long").alias("n_triangles")))
    )


def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    (docs,) = load_tables(spark, sf_dir, "documents")
    return triangle_count(synth_graph_edges(docs))


_GAPS_SQL = ", ".join(str(g) for g in _GAPS)

ORACLE_TRIANGLES = f"""
WITH n AS (SELECT count(*)::BIGINT AS n FROM documents),
raw AS (
  SELECT doc_id AS a, (doc_id + g.g) % n AS b
  FROM documents CROSS JOIN n, unnest([{_GAPS_SQL}]) AS g(g)
),
und AS (
  SELECT DISTINCT least(a, b) AS u, greatest(a, b) AS v
  FROM raw WHERE a <> b
),
sym AS (
  SELECT u AS a, v AS b FROM und UNION ALL SELECT v, u FROM und
),
deg AS (SELECT a AS node, count(*)::BIGINT AS deg FROM sym GROUP BY a),
ori AS (
  SELECT CASE WHEN d1.deg < d2.deg OR (d1.deg = d2.deg AND u < v)
              THEN u ELSE v END AS s,
         CASE WHEN d1.deg < d2.deg OR (d1.deg = d2.deg AND u < v)
              THEN v ELSE u END AS t
  FROM und JOIN deg d1 ON d1.node = u JOIN deg d2 ON d2.node = v
),
wed AS (
  SELECT o1.t AS w1, o2.t AS w2 FROM ori o1 JOIN ori o2 ON o1.s = o2.s
  WHERE o1.t < o2.t
)
SELECT
  (SELECT count(*)::BIGINT FROM und) AS n_edges,
  (SELECT count(*)::BIGINT FROM wed) AS n_wedges,
  -- INDEPENDENT triangle algorithm: directed 3-cycle join / 6
  (SELECT (count(*) / 6)::BIGINT
   FROM sym e1 JOIN sym e2 ON e1.b = e2.a
        JOIN sym e3 ON e2.b = e3.a AND e3.b = e1.a) AS n_triangles
"""


QUERIES = {"graph_triangle_count": graph_triangle_count}
ORACLES = {"graph_triangle_count": ORACLE_TRIANGLES}
