"""Crawl planning: anchor extraction ignores distractors/comments and
pairs hrefs with their inner text; the frontier schedules one fetch per
host per wave over robots-allowed URLs only; oracles agree (also swept
by test_oracles)."""

import duckdb

from ocrs_spark.ops.crawlplan import (
    ORACLE_FRONTIER,
    anchor_text_index,
    crawl_frontier,
    _oracle_anchors,
)

SF = "/root/testdata/sf0.001"


def test_anchor_index_shape(spark):
    out = anchor_text_index(spark, SF).toPandas().set_index("doc_id")
    # only the two planted anchor words ever appear — distractor links
    # (nav, external, commented-out) contribute nothing
    seen = set("|".join(out["anchors"]).split("|"))
    assert seen <= {"related", "more"}
    assert out["n_inlinks"].sum() == 2 * 500  # two outlinks per page
    # formula A is a bijection mod 500 (gcd(7,500)=1): every doc has inlinks
    assert len(out) == 500


def test_frontier_politeness(spark):
    out = crawl_frontier(spark, SF).toPandas()
    # within a host, waves are exactly 1..n (one fetch per wave)
    for host, grp in out.groupby("host"):
        waves = sorted(grp["wave"])
        assert waves == list(range(1, len(grp) + 1))
    # disallowed URLs never scheduled: variant 2 (example.com, query keeps
    # ?id=..&ref=home, end-anchored Allow can't match) is absent
    assert not set(out[out["doc_id"] % 5 == 2]["doc_id"])


def test_oracle_parity(spark):
    import sys

    sys.path.insert(0, "tests")
    from test_oracles import _duck_rows, _rowset

    con = duckdb.connect()
    con.execute(f"create view documents as select * from '{SF}/documents.parquet'")
    for fn, sql in (
        (anchor_text_index, _oracle_anchors()),
        (crawl_frontier, ORACLE_FRONTIER),
    ):
        sdf = fn(spark, SF).toPandas()
        assert len(sdf) > 0
        ocols, orows = _duck_rows(con.sql(sql))
        a, ca = _rowset(
            list(sdf.columns),
            [tuple(t) for t in sdf.itertuples(index=False, name=None)],
        )
        b, cb = _rowset(ocols, orows)
        assert ca == cb and a == b
