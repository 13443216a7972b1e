"""Composite curation chain: reason precedence, stage agreement with
the individual ops, and composed-oracle parity (also in test_oracles)."""

import duckdb

from ocrs_spark.ops.curation import ORACLE_CURATION, PPL_MAX, curate_web_corpus
from ocrs_spark.ops.decontam import decontamination
from ocrs_spark.ops.dedupgraph import dedup_clusters
from ocrs_spark.ops.gopher import gopher_quality_signals
from ocrs_spark.ops.lmscore import lm_perplexity

SF = "/root/testdata/sf0.001"


def test_reasons_consistent_with_stages(spark):
    cur = {r["doc_id"]: r["reason"] for r in curate_web_corpus(spark, SF).collect()}
    cont = {
        r["doc_id"]
        for r in decontamination(spark, SF).collect()
        if r["contaminated"]
    }
    dup = {r["doc_id"] for r in dedup_clusters(spark, SF).collect() if not r["keep"]}
    lowq = {
        r["doc_id"]
        for r in gopher_quality_signals(spark, SF).collect()
        if not r["keep"]
    }
    ppl = {r["doc_id"]: r["ppl"] for r in lm_perplexity(spark, SF).collect()}

    assert len(cur) == 500
    for d, reason in cur.items():
        if d in cont:
            assert reason == "contaminated"
        elif d in dup:
            assert reason == "duplicate"
        elif d in lowq:
            assert reason == "quality"
        elif ppl.get(d, 0) > PPL_MAX:
            assert reason == "perplexity"
        else:
            assert reason == "kept"
    # the chain must actually exercise multiple gates on this corpus
    assert {"contaminated", "duplicate", "quality", "kept"} <= set(cur.values())


def test_oracle_parity(spark):
    import sys

    sys.path.insert(0, "tests")
    from test_oracles import _duck_rows, _rowset

    sdf = curate_web_corpus(spark, SF).toPandas()
    con = duckdb.connect()
    con.execute(f"create view documents as select * from '{SF}/documents.parquet'")
    ocols, orows = _duck_rows(con.sql(ORACLE_CURATION))
    a, ca = _rowset(
        list(sdf.columns), [tuple(t) for t in sdf.itertuples(index=False, name=None)]
    )
    b, cb = _rowset(ocols, orows)
    assert ca == cb and a == b
