"""Chunking: window/stride arithmetic, coverage and overlap invariants.
BM25: hand-computed score on a tiny corpus, ranking sanity, and DuckDB
oracle parity for both ops (also swept by test_oracles)."""

import math

import duckdb

from ocrs_spark.ops.retrieval import (
    BM25_K1,
    BM25_B,
    CHUNK_S,
    CHUNK_W,
    ORACLE_BM25,
    ORACLE_CHUNKS,
    bm25_search,
    chunk_documents,
)

SF = "/root/testdata/sf0.001"


def _with_docs(spark, rows, fn):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    from ocrs_spark.ops import retrieval

    orig = retrieval.load_tables
    try:
        retrieval.load_tables = lambda s, d, *n: (df,)
        return fn(spark)
    finally:
        retrieval.load_tables = orig


def test_chunk_shapes(spark):
    long_doc = " ".join(f"t{i}" for i in range(80))  # 80 tokens
    short_doc = "a b c"
    exact_doc = " ".join(f"s{i}" for i in range(CHUNK_W))  # exactly W
    rows = [(1, long_doc), (2, short_doc), (3, exact_doc), (4, "")]
    out = _with_docs(
        spark, rows, lambda s: chunk_documents(s, "x").collect()
    )
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # 80 tokens, W=32, S=24 -> chunks at 0,24,48: ceil((80-32)/24)+1 = 3
    c1 = sorted(by_doc[1], key=lambda r: r["chunk_id"])
    assert [r["chunk_id"] for r in c1] == [0, 1, 2]
    assert c1[0]["chunk_text"].split(" ")[0] == "t0"
    assert c1[1]["chunk_text"].split(" ")[0] == f"t{CHUNK_S}"
    assert c1[0]["n_tokens"] == CHUNK_W and c1[2]["n_tokens"] == 80 - 2 * CHUNK_S
    # overlap: last W-S tokens of chunk 0 == first W-S of chunk 1
    ov = CHUNK_W - CHUNK_S
    assert c1[0]["chunk_text"].split(" ")[-ov:] == c1[1]["chunk_text"].split(" ")[:ov]
    # coverage: concatenating chunks at stride offsets recovers the doc
    rebuilt = c1[0]["chunk_text"].split(" ")
    for c in c1[1:]:
        rebuilt += c["chunk_text"].split(" ")[ov:]
    assert rebuilt == long_doc.split(" ")
    assert len(by_doc[2]) == 1 and by_doc[2][0]["n_tokens"] == 3
    assert len(by_doc[3]) == 1  # exactly W -> single chunk
    assert len(by_doc[4]) == 1 and by_doc[4][0]["n_tokens"] == 0


def test_bm25_hand_computed(spark):
    # 3 docs; query 0 terms: scan/merge/hash. doc 1 has scan twice in a
    # 4-token doc; doc 2 has scan+merge in 6; doc 3 has none.
    rows = [
        (1, "scan scan x y"),
        (2, "scan merge a b c d"),
        (3, "p q r s"),
    ]
    out = _with_docs(spark, rows, lambda s: bm25_search(s, "x").collect())
    got = {
        (r["query_id"], r["doc_id"]): r["score"] for r in out if r["query_id"] == 0
    }
    n = 3
    avgdl = (4 + 6 + 4) / 3  # dl: 4, 6, 4

    def bm25(tf, dl, df):
        idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
        return idf * (tf * (BM25_K1 + 1)) / (
            tf + BM25_K1 * (1 - BM25_B + BM25_B * dl / avgdl)
        )

    exp_d1 = round(bm25(2, 4, 2), 3)  # scan: tf=2, df=2
    exp_d2 = round(bm25(1, 6, 2) + bm25(1, 6, 1), 3)  # scan + merge
    assert got[(0, 1)] == exp_d1
    assert got[(0, 2)] == exp_d2
    assert (0, 3) not in got  # no query terms -> unscored
    ranks = {r["doc_id"]: r["rank"] for r in out if r["query_id"] == 0}
    assert ranks[max(got, key=lambda k: got[k])[1]] == 1


def test_oracle_parity(spark):
    import sys

    sys.path.insert(0, "tests")
    from test_oracles import _duck_rows, _rowset

    con = duckdb.connect()
    con.execute(f"create view documents as select * from '{SF}/documents.parquet'")
    for fn, sql in ((chunk_documents, ORACLE_CHUNKS), (bm25_search, ORACLE_BM25)):
        sdf = fn(spark, SF).toPandas()
        assert len(sdf) > 0
        ocols, orows = _duck_rows(con.sql(sql))
        a, ca = _rowset(
            list(sdf.columns),
            [tuple(t) for t in sdf.itertuples(index=False, name=None)],
        )
        b, cb = _rowset(ocols, orows)
        assert ca == cb and a == b
