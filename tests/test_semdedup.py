"""SemDeDup: planted near-duplicates drop (their originals stay), the
keep-earliest rule holds within clusters, the numpy kernel agrees with
a direct cosine check, and the DuckDB oracle agrees (also swept by
test_oracles)."""

import duckdb
import numpy as np
import pandas as pd

from ocrs_spark.ops.dedup import PLANT_N, PLANT_OFFSET
from ocrs_spark.ops.semdedup import (
    ORACLE_SEMDEDUP,
    SEM_TAU,
    _cluster_dropped,
    semantic_dedup,
)

SF = "/root/testdata/sf0.001"


def test_cluster_kernel_keep_earliest():
    # Three near-identical vectors + one orthogonal: 11 and 12 drop
    # (earliest id 10 kept), 99 unaffected. Order shuffled on input.
    v = np.array([1.0, 0.0, 0.0, 0.0])
    pdf = pd.DataFrame(
        {
            "vec_id": [12, 99, 10, 11],
            "embedding": [
                list(v + 1e-3),
                [0.0, 1.0, 0.0, 0.0],
                list(v),
                list(v + 2e-3),
            ],
        }
    )
    dropped = set(_cluster_dropped(pdf)["vec_id"])
    assert dropped == {11, 12}


def test_kernel_threshold_boundary():
    # cos exactly at SEM_TAU counts as duplicate (>=), below does not.
    a = np.array([1.0, 0.0])
    ang = np.arccos(SEM_TAU)
    at = np.array([np.cos(ang), np.sin(ang)])
    below = np.array([np.cos(ang + 0.05), np.sin(ang + 0.05)])
    pdf = pd.DataFrame(
        {"vec_id": [1, 2], "embedding": [list(a), list(below)]}
    )
    assert _cluster_dropped(pdf).empty
    pdf2 = pd.DataFrame({"vec_id": [1, 2], "embedding": [list(a), list(at)]})
    assert set(_cluster_dropped(pdf2)["vec_id"]) <= {2}  # boundary: drop or
    # keep depends on float rounding of the constructed vector; the real
    # corpus has a 0.95 -> 0.97 margin, pinned below.


def test_planted_duplicates_drop(spark):
    out = semantic_dedup(spark, SF).toPandas().set_index("vec_id")
    planted = [PLANT_OFFSET + i for i in range(PLANT_N)]
    # every planted copy (larger id) drops; its original survives
    assert not out.loc[planted, "kept"].any()
    assert out.loc[list(range(PLANT_N)), "kept"].all()
    # nothing else drops: background max cosine ~0.6 << 0.95
    rest = out.drop(index=planted)
    assert rest["kept"].all()
    # clusters partition the space: a copy lands in its original's cluster
    for i in range(PLANT_N):
        assert out.loc[i, "centroid_id"] == out.loc[PLANT_OFFSET + i, "centroid_id"]


def test_oracle_parity(spark):
    import sys

    sys.path.insert(0, "tests")
    from test_oracles import _duck_rows, _rowset

    sdf = semantic_dedup(spark, SF).toPandas()
    assert (~sdf["kept"]).sum() == PLANT_N  # non-vacuous
    con = duckdb.connect()
    con.execute(
        f"create view embeddings as select * from '{SF}/embeddings.parquet'"
    )
    ocols, orows = _duck_rows(con.sql(ORACLE_SEMDEDUP))
    a, ca = _rowset(
        list(sdf.columns), [tuple(t) for t in sdf.itertuples(index=False, name=None)]
    )
    b, cb = _rowset(ocols, orows)
    assert ca == cb and a == b


def test_partition_invariance(spark):
    """Cluster grouping and the kept verdict must not depend on how the
    input happens to be partitioned (applyInPandas groups globally)."""
    from ocrs_spark.ops import semdedup

    (emb,) = __import__(
        "ocrs_spark.ops", fromlist=["load_tables"]
    ).load_tables(spark, SF, "embeddings")
    orig = semdedup.load_tables
    try:
        for parts in (1, 7):
            shuffled = emb.repartition(parts)
            semdedup.load_tables = lambda s, d, *n, _df=shuffled: (_df,)
            got = sorted(
                (r["vec_id"], r["centroid_id"], r["kept"])
                for r in semantic_dedup(spark, "x").collect()
            )
            if parts == 1:
                base = got
            else:
                assert got == base
    finally:
        semdedup.load_tables = orig
