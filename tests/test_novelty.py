"""Cross-document shingle novelty: hand fixtures pin the sharing
semantics (corpus-unique vs shared shingles, duplicate-text zeroing,
shingle-less docs surfacing as NULL), plus full-corpus invariants.
DuckDB parity is covered by test_oracles.py."""

from __future__ import annotations

from ocrs_spark.ops.novelty import ngram_novelty, novelty_over

SF = "/root/testdata/sf0.001"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _by_id(df):
    return {r.doc_id: r for r in df.collect()}


def test_shared_shingle_halves_novelty(spark):
    # doc0: {a b c, b c d}; doc1: {a b c, b c x} -> "a b c" is shared,
    # the other shingle of each doc is corpus-unique.
    out = _by_id(novelty_over(_docs(spark, [(0, "a b c d"), (1, "a b c x")])))
    for i in (0, 1):
        assert out[i].n_distinct_shingles == 2
        assert out[i].n_novel == 1
        assert out[i].novelty_frac == 0.5


def test_exact_duplicates_have_zero_novelty(spark):
    out = _by_id(
        novelty_over(_docs(spark, [(0, "p q r s t"), (1, "p q r s t")]))
    )
    for i in (0, 1):
        assert out[i].n_distinct_shingles == 3
        assert out[i].n_novel == 0
        assert out[i].novelty_frac == 0.0


def test_short_docs_surface_with_null_fraction(spark):
    out = _by_id(novelty_over(_docs(spark, [(0, "hi"), (1, "a b c d")])))
    assert out[0].n_distinct_shingles == 0
    assert out[0].n_novel == 0
    assert out[0].novelty_frac is None
    assert out[1].novelty_frac == 1.0


def test_repeated_shingle_within_doc_counts_once(spark):
    # "a b a b a b" -> shingles [a b a, b a b, a b a, b a b]: 2 distinct
    out = _by_id(novelty_over(_docs(spark, [(0, "a b a b a b")])))
    assert out[0].n_distinct_shingles == 2
    assert out[0].n_novel == 2


def test_corpus_invariants(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = ngram_novelty(spark, SF)
    assert out.count() == docs.count()
    rows = out.collect()
    for r in rows:
        assert 0 <= r.n_novel <= r.n_distinct_shingles
        if r.novelty_frac is not None:
            assert 0.0 <= r.novelty_frac <= 1.0
