"""Positional inverted index + phrase search: hand fixtures pin the
1-based positions, CSV packing, adjacency semantics (incl. the
overlapping self-phrase case), and the no-adjacency exclusion.
DuckDB parity runs in test_oracles.py."""

from __future__ import annotations

from ocrs_spark.ops.postings import (
    PHRASE,
    phrase_match_docs,
    phrase_match_over,
    postings_over,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_postings_positions_and_tf(spark):
    out = {
        (r.token, r.doc_id): (r.tf, r.positions_csv)
        for r in postings_over(_docs(spark, [(0, "a b a")])).collect()
    }
    assert out == {("a", 0): (2, "1,3"), ("b", 0): (1, "2")}


def test_phrase_counts_every_adjacent_pair(spark):
    docs = _docs(spark, [(0, "x y x y"), (1, "y x"), (2, "x z y")])
    got = {
        r.doc_id: r.n_occurrences
        for r in phrase_match_over(docs, "x", "y").collect()
    }
    # doc0: x at 1,3 -> both followed by y; doc1: reversed order only;
    # doc2: x and y present but never adjacent.
    assert got == {0: 2}


def test_self_phrase_counts_overlapping_runs(spark):
    got = {
        r.doc_id: r.n_occurrences
        for r in phrase_match_over(_docs(spark, [(0, "a a a")]), "a", "a").collect()
    }
    assert got == {0: 2}


def test_corpus_phrase_matches_are_positive_and_real(spark):
    sf = "/root/testdata/sf0.001"
    rows = phrase_match_docs(spark, sf).collect()
    assert len(rows) > 0
    assert all(r.n_occurrences >= 1 for r in rows)
    # spot-verify one match against the raw text
    doc_ids = [r.doc_id for r in rows[:1]]
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    text = docs.filter(docs.doc_id == doc_ids[0]).collect()[0].text
    assert f"{PHRASE[0]} {PHRASE[1]}" in text
