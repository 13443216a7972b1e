"""Naive Bayes classifier: the grouped-count training recovers the
planted class structure, unlabeled docs get classified from full token
evidence, empty docs fall back to 'und', and the DuckDB oracle agrees
(also swept by test_oracles)."""

import duckdb

from ocrs_spark.ops.nbclassify import ORACLE_NB, nb_lang_classifier

SF = "/root/testdata/sf0.001"


def _classify(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    from ocrs_spark.ops import nbclassify, textstats

    orig_nb, orig_ts = nbclassify.load_tables, textstats.load_tables
    try:
        nbclassify.load_tables = lambda s, d, *n: (df,)
        textstats.load_tables = lambda s, d, *n: (df,)
        return {
            r["doc_id"]: r.asDict()
            for r in nb_lang_classifier(spark, "x").collect()
        }
    finally:
        nbclassify.load_tables = orig_nb
        textstats.load_tables = orig_ts


def test_nb_generalizes_past_markers(spark):
    # Docs 0/1 train "dbish" (marker: scan) with satellite word "disk";
    # docs 2/3 train "sparkish" (marker: spark) with satellite "arrow".
    # Doc 4 has NO marker words, only satellites of dbish; doc 5 only
    # satellites of sparkish. The marker heuristic says 'und' for both;
    # NB must classify them from the satellite evidence — the exact
    # sense in which the trained classifier beats the weak labeler.
    rows = [
        (0, "scan disk disk btree"),
        (1, "scan disk btree pages"),
        (2, "spark arrow arrow executor"),
        (3, "spark arrow executor jvm"),
        (4, "disk btree pages disk"),
        (5, "arrow executor jvm arrow"),
        (6, ""),
    ]
    out = _classify(spark, rows)
    assert out[0]["marker_lang"] == "dbish" and out[0]["nb_lang"] == "dbish"
    assert out[2]["marker_lang"] == "sparkish" and out[2]["nb_lang"] == "sparkish"
    assert out[4]["marker_lang"] == "und" and out[4]["nb_lang"] == "dbish"
    assert out[5]["marker_lang"] == "und" and out[5]["nb_lang"] == "sparkish"
    assert out[6]["nb_lang"] == "und" and out[6]["marker_lang"] == "und"
    assert len(out) == 7


def test_nb_corpus_agreement(spark):
    # On the real corpus the NB model sees the marker words too (they
    # dominate the class-conditional counts), so it should agree with
    # its own training labels on a large majority of labeled docs.
    out = nb_lang_classifier(spark, SF).toPandas()
    labeled = out[out["marker_lang"] != "und"]
    assert len(labeled) > 0
    assert labeled["agree"].mean() > 0.7
    assert set(out["nb_lang"]) <= {"dbish", "sparkish", "commonish", "und"}


def test_oracle_parity(spark):
    import sys

    sys.path.insert(0, "tests")
    from test_oracles import _duck_rows, _rowset

    sdf = nb_lang_classifier(spark, SF).toPandas()
    con = duckdb.connect()
    con.execute(f"create view documents as select * from '{SF}/documents.parquet'")
    ocols, orows = _duck_rows(con.sql(ORACLE_NB))
    a, ca = _rowset(
        list(sdf.columns), [tuple(t) for t in sdf.itertuples(index=False, name=None)]
    )
    b, cb = _rowset(ocols, orows)
    assert ca == cb and a == b
