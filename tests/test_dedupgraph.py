"""Connected-components dedup clustering: hand fixtures (chain,
triangle, long chain spanning many propagation rounds), and parity
with the recursive-CTE DuckDB oracle (also swept by test_oracles)."""

import duckdb

from ocrs_spark.ops.dedupgraph import (
    ORACLE_DEDUP_CLUSTERS,
    connected_components,
    dedup_clusters,
)

SF = "/root/testdata/sf0.001"


def _cc(spark, edges):
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    return {(r["node"], r["component"]) for r in connected_components(df).collect()}


def test_components_mixed_shapes(spark):
    got = _cc(spark, [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (20, 22)])
    assert got == {
        (1, 1), (2, 1), (3, 1),
        (10, 10), (11, 10),
        (20, 20), (21, 20), (22, 20),
    }


def test_long_chain_converges(spark):
    # 12-node chain: min label needs 11 propagation rounds end-to-end —
    # exercises the convergence loop well past round one
    chain = [(i, i + 1) for i in range(100, 111)]
    got = _cc(spark, chain)
    assert got == {(i, 100) for i in range(100, 112)}


def test_edge_direction_irrelevant(spark):
    # same component regardless of which side the smaller id is on
    assert _cc(spark, [(5, 4), (5, 6)]) == {(4, 4), (5, 4), (6, 4)}


def test_clusters_oracle_parity(spark):
    import sys

    sys.path.insert(0, "tests")
    from test_oracles import _duck_rows, _rowset

    sdf = dedup_clusters(spark, SF).toPandas()
    con = duckdb.connect()
    con.execute(f"create view documents as select * from '{SF}/documents.parquet'")
    ocols, orows = _duck_rows(con.sql(ORACLE_DEDUP_CLUSTERS))
    a, ca = _rowset(
        list(sdf.columns), [tuple(t) for t in sdf.itertuples(index=False, name=None)]
    )
    b, cb = _rowset(ocols, orows)
    assert ca == cb and a == b
    # every cluster keeps exactly one survivor
    per = sdf.groupby("cluster_id")["keep"].sum()
    assert (per == 1).all()
