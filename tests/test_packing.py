"""Distributed sequence packing: hand-computed layout, partition-count
invariance (the two-phase prefix sum must not depend on parallelism),
straddling docs, and oracle parity (also swept by test_oracles)."""

import duckdb

from ocrs_spark.ops.packing import ORACLE_PACKING, packed_layout, sequence_packing

SF = "/root/testdata/sf0.001"


def _layout(spark, toks, budget, parts):
    df = spark.createDataFrame(
        [(i, " ".join(["w"] * n)) for i, n in enumerate(toks)],
        "doc_id long, text string",
    )
    rows = packed_layout(df, budget=budget, parts=parts).collect()
    return sorted((r["doc_id"], r["seq_id"], r["seq_offset"]) for r in rows)


def test_hand_computed_layout(spark):
    # budget 10; docs of 4,5,3,7 tokens -> starts 0,4,9,12
    assert _layout(spark, [4, 5, 3, 7], 10, 2) == [
        (0, 0, 0),
        (1, 0, 4),
        (2, 0, 9),  # straddles into seq 1
        (3, 1, 2),
    ]


def test_partition_count_invariance(spark):
    toks = [(i * 7) % 23 + 1 for i in range(101)]
    base = _layout(spark, toks, 64, 1)
    for parts in (3, 8, 32):
        assert _layout(spark, toks, 64, parts) == base


def test_offsets_continuous(spark):
    pdf = sequence_packing(spark, SF).toPandas().sort_values("doc_id")
    starts = pdf["seq_id"] * 512 + pdf["seq_offset"]
    ends = starts + pdf["n_tokens"]
    assert (starts.values[1:] == ends.values[:-1]).all()
    assert starts.iloc[0] == 0


def test_oracle_parity(spark):
    import sys

    sys.path.insert(0, "tests")
    from test_oracles import _duck_rows, _rowset

    sdf = sequence_packing(spark, SF).toPandas()
    con = duckdb.connect()
    con.execute(f"create view documents as select * from '{SF}/documents.parquet'")
    ocols, orows = _duck_rows(con.sql(ORACLE_PACKING))
    a, ca = _rowset(
        list(sdf.columns), [tuple(t) for t in sdf.itertuples(index=False, name=None)]
    )
    b, cb = _rowset(ocols, orows)
    assert ca == cb and a == b
