"""PII redaction: hand fixtures for each pattern + planted-corpus
oracle parity (the corpus-wide sweep also runs via test_oracles)."""

import duckdb

from ocrs_spark.ops.pii import ORACLE_PII, pii_redaction, redact

SF = "/root/testdata/sf0.001"


def _redact(spark, text):
    df = spark.createDataFrame([(text,)], "text string")
    return df.select(redact(df.text).alias("r")).first()["r"]


def test_redacts_each_type(spark):
    assert (
        _redact(spark, "mail a.b+c@ex-1.org or 10.0.0.1 or 555-010-1234 now")
        == "mail <EMAIL> or <IP> or <PHONE> now"
    )


def test_leaves_clean_text_alone(spark):
    s = "version 1.2 of the spark job ran 555 times at example.com"
    assert _redact(spark, s) == s


def test_multiple_hits_globally_replaced(spark):
    assert (
        _redact(spark, "a@b.co c@d.io 1.2.3.4 5.6.7.8")
        == "<EMAIL> <EMAIL> <IP> <IP>"
    )


def test_word_boundaries_guard_ip(spark):
    # no \b match inside a longer dotted run than 4 octets: the first
    # four octets match, the tail doesn't re-match without boundaries
    out = _redact(spark, "x 1.2.3.4.5 y")
    assert "<IP>" in out


def test_planted_corpus_parity(spark):
    import sys

    sys.path.insert(0, "tests")
    from test_oracles import _duck_rows, _rowset

    sdf = pii_redaction(spark, SF).toPandas()
    assert int(sdf["n_emails"].sum()) > 0
    assert int(sdf["n_ips"].sum()) > 0
    assert int(sdf["n_phones"].sum()) > 0
    assert not sdf["redacted"].str.contains("@example.com").any()
    con = duckdb.connect()
    con.execute(f"create view documents as select * from '{SF}/documents.parquet'")
    ocols, orows = _duck_rows(con.sql(ORACLE_PII))
    a, ca = _rowset(
        list(sdf.columns), [tuple(t) for t in sdf.itertuples(index=False, name=None)]
    )
    b, cb = _rowset(ocols, orows)
    assert ca == cb and a == b
