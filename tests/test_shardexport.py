"""Shard export: the write round-trips losslessly (no dup/loss), shards
are balanced, placement is deterministic, one file per shard, and the
manifest matches the DuckDB oracle computed from the source table."""

import glob
import os

import duckdb

from ocrs_spark.ops.shardexport import (
    N_SHARDS,
    ORACLE_SHARDS,
    export_shards,
    write_shards,
)

SF = "/root/testdata/sf0.001"


def test_roundtrip_lossless_and_balanced(spark):
    out = write_shards(spark, SF)
    back = spark.read.parquet(out)
    src = spark.read.parquet(f"{SF}/documents.parquet")
    assert back.count() == src.count()
    assert back.select("doc_id").distinct().count() == src.count()
    sizes = {
        r["shard_id"]: r["n"]
        for r in back.groupBy("shard_id").count().withColumnRenamed("count", "n").collect()
    }
    assert len(sizes) == N_SHARDS
    # md5 placement is uniform: no shard more than 2x the mean at n=500
    mean = sum(sizes.values()) / N_SHARDS
    assert max(sizes.values()) < 2 * mean
    # one parquet file per shard partition (repartition on shard_id)
    for d in glob.glob(os.path.join(out, "shard_id=*")):
        files = [f for f in os.listdir(d) if f.endswith(".parquet")]
        assert len(files) == 1


def test_placement_deterministic(spark):
    a = {r["shard_id"]: (r["n_docs"], r["min_doc"]) for r in export_shards(spark, SF).collect()}
    b = {r["shard_id"]: (r["n_docs"], r["min_doc"]) for r in export_shards(spark, SF).collect()}
    assert a == b


def test_oracle_parity(spark):
    import sys

    sys.path.insert(0, "tests")
    from test_oracles import _duck_rows, _rowset

    sdf = export_shards(spark, SF).toPandas()
    assert len(sdf) == N_SHARDS
    con = duckdb.connect()
    con.execute(f"create view documents as select * from '{SF}/documents.parquet'")
    ocols, orows = _duck_rows(con.sql(ORACLE_SHARDS))
    a, ca = _rowset(
        list(sdf.columns), [tuple(t) for t in sdf.itertuples(index=False, name=None)]
    )
    b, cb = _rowset(ocols, orows)
    assert ca == cb and a == b


def test_manifest_partition_invariant(spark):
    """Hash placement is a pure doc_id function: the manifest is
    identical however the source is partitioned before the write."""
    from ocrs_spark.ops import shardexport

    (docs,) = __import__(
        "ocrs_spark.ops", fromlist=["load_tables"]
    ).load_tables(spark, SF, "documents")
    orig = shardexport.load_tables
    try:
        base = None
        for parts in (1, 5):
            shuffled = docs.repartition(parts)
            shardexport.load_tables = lambda s, d, *n, _df=shuffled: (_df,)
            got = sorted(
                tuple(r) for r in export_shards(spark, SF).collect()
            )
            if base is None:
                base = got
            else:
                assert got == base
    finally:
        shardexport.load_tables = orig
