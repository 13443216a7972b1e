"""Contracts for degree-ordered triangle counting (ops/triangles.py):
known closed-form counts, hub-skew robustness, duplicate/self-loop
normalization, and the hash-join-only plan shape.
"""

from pyspark.sql import Row
from pyspark.sql import functions as F

from ocrs_spark.ops.triangles import synth_graph_edges, triangle_count


def _edges(spark, pairs):
    return spark.createDataFrame([Row(a=a, b=b) for a, b in pairs])


def test_known_small_graphs(spark):
    # K3: one triangle
    k3 = triangle_count(_edges(spark, [(0, 1), (1, 2), (2, 0)])).collect()[0]
    assert (k3["n_edges"], k3["n_triangles"]) == (3, 1)
    # K4: 4 triangles, 6 edges
    k4 = triangle_count(
        _edges(spark, [(a, b) for a in range(4) for b in range(a + 1, 4)])
    ).collect()[0]
    assert (k4["n_edges"], k4["n_triangles"]) == (6, 4)
    # star (hub) graph: many wedge candidates at the hub, zero triangles
    star = triangle_count(_edges(spark, [(0, i) for i in range(1, 9)])).collect()[0]
    assert star["n_triangles"] == 0
    # degree ordering points every star edge INTO the hub -> no wedges
    assert star["n_wedges"] == 0


def test_duplicates_and_loops_normalized(spark):
    out = triangle_count(
        _edges(spark, [(0, 1), (1, 0), (1, 1), (1, 2), (2, 0), (0, 2)])
    ).collect()[0]
    assert (out["n_edges"], out["n_triangles"]) == (3, 1)


def test_synth_graph_has_one_triangle_per_node(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    n = docs.count()
    out = triangle_count(synth_graph_edges(docs)).collect()[0]
    # ring + 2-chords: every consecutive triple closes exactly once;
    # the 5-chords close nothing
    assert out["n_triangles"] == n
    assert out["n_edges"] == 3 * n


def test_plan_uses_hash_joins_only(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = (
        triangle_count(synth_graph_edges(docs))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    # the only nested-loop allowed is the broadcast 1-row count(s)
    assert plan.count("BroadcastNestedLoopJoin") <= 3
