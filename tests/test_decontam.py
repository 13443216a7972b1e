"""Decontamination: planted eval-source docs flag themselves, shifted
near-miss windows don't match, cross-doc verbatim contamination is
caught, and the oracle agrees (also swept by test_oracles)."""

import duckdb

from ocrs_spark.ops.decontam import (
    EVAL_EVERY,
    EVAL_SKIP,
    NGRAM_W,
    ORACLE_DECONTAM,
    decontamination,
    doc_grams,
    eval_grams,
)

SF = "/root/testdata/sf0.001"


def _flags(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    import ocrs_spark.ops as ops
    from ocrs_spark.ops import decontam

    orig = ops.load_tables
    try:
        decontam.load_tables = lambda s, d, *n: (df,)
        out = {
            r["doc_id"]: r.asDict()
            for r in decontamination(spark, "x").collect()
        }
    finally:
        decontam.load_tables = orig
    return out


def test_planted_and_crossdoc_contamination(spark):
    words = [f"w{i}" for i in range(20)]
    eval_src = " ".join(words)  # doc 0: eval window = w3..w10
    window = " ".join(words[EVAL_SKIP : EVAL_SKIP + NGRAM_W])
    copycat = "x y " + window + " z"
    shifted = " ".join(words[EVAL_SKIP + 1 : EVAL_SKIP + 1 + NGRAM_W])
    near_miss = "x y " + shifted + " z"
    clean = " ".join(f"q{i}" for i in range(15))
    out = _flags(
        spark,
        [(0, eval_src), (1, copycat), (2, near_miss), (3, clean)],
    )
    assert out[0]["contaminated"]  # eval source flags itself
    assert out[1]["contaminated"] and out[1]["n_evals"] == 1
    assert not out[2]["contaminated"]  # one-token shift: no verbatim 8-gram
    assert not out[3]["contaminated"]
    assert len(out) == 4  # every doc gets a row


def test_short_docs_never_flagged(spark):
    out = _flags(spark, [(0, " ".join(f"w{i}" for i in range(20))), (5, "tiny doc")])
    assert not out[5]["contaminated"]


def test_eval_set_shape(spark):
    (docs,) = __import__("ocrs_spark.ops", fromlist=["load_tables"]).load_tables(
        spark, SF, "documents"
    )
    ev = eval_grams(docs).collect()
    assert all(r["eval_id"] % EVAL_EVERY == 0 for r in ev)
    assert all(len(r["gram"].split(" ")) == NGRAM_W for r in ev)
    dg = doc_grams(docs.limit(3)).collect()
    assert all(len(r["gram"].split(" ")) == NGRAM_W for r in dg)


def test_oracle_parity(spark):
    import sys

    sys.path.insert(0, "tests")
    from test_oracles import _duck_rows, _rowset

    sdf = decontamination(spark, SF).toPandas()
    assert sdf["contaminated"].any()  # planted rows keep it non-vacuous
    con = duckdb.connect()
    con.execute(f"create view documents as select * from '{SF}/documents.parquet'")
    ocols, orows = _duck_rows(con.sql(ORACLE_DECONTAM))
    a, ca = _rowset(
        list(sdf.columns), [tuple(t) for t in sdf.itertuples(index=False, name=None)]
    )
    b, cb = _rowset(ocols, orows)
    assert ca == cb and a == b
