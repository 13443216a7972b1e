"""Incremental curation: two micro-batch runs over a growing Iceberg
table produce exactly one verdict per doc (no reprocessing), planted
cross-batch and in-batch duplicates flag, eval-source copies flag as
contaminated (precedence), and the order-free batch oracle matches."""

import duckdb

from ocrs_spark.ops.curastream import (
    ORACLE_INCREMENTAL_CURATION,
    PLANT_N,
    PLANT_OFFSET,
    stream_incremental_curation,
)
from ocrs_spark.ops.decontam import EVAL_EVERY

SF = "/root/testdata/sf0.001"


def test_incremental_verdicts(spark):
    out = stream_incremental_curation(spark, SF).toPandas()
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    # exactly one verdict per augmented doc: the second run processed
    # ONLY the second snapshot (offsets checkpointed), no duplicates
    assert len(out) == n_docs + 2 * PLANT_N
    assert out["doc_id"].is_unique

    byid = out.set_index("doc_id")
    max_id = n_docs - 1
    for i in range(PLANT_N):
        # cross-batch copy of doc i: duplicate — unless doc i is an
        # eval-source doc, then contamination takes precedence
        expect = "contaminated" if i % EVAL_EVERY == 0 else "duplicate"
        assert byid.loc[PLANT_OFFSET + i, "reason"] == expect
        # in-batch copy of a tail doc
        t = max_id - i
        expect_t = "contaminated" if t % EVAL_EVERY == 0 else "duplicate"
        assert byid.loc[PLANT_OFFSET + t, "reason"] == expect_t
    # originals are never flagged duplicate (keep-earliest)
    orig = out[out["doc_id"] <= max_id]
    assert not (orig["reason"] == "duplicate").any()


def test_oracle_parity(spark):
    import sys

    sys.path.insert(0, "tests")
    from test_oracles import _duck_rows, _rowset

    sdf = stream_incremental_curation(spark, SF).toPandas()
    con = duckdb.connect()
    con.execute(f"create view documents as select * from '{SF}/documents.parquet'")
    ocols, orows = _duck_rows(con.sql(ORACLE_INCREMENTAL_CURATION))
    a, ca = _rowset(
        list(sdf.columns), [tuple(t) for t in sdf.itertuples(index=False, name=None)]
    )
    b, cb = _rowset(ocols, orows)
    assert ca == cb and a == b
