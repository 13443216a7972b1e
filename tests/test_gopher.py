"""Gopher repetition/quality signals: hand-computed fixtures for each
signal, degenerate-doc edge cases, and oracle parity at sf0.001 (the
full-corpus oracle sweep also runs via tests/test_oracles.py).
"""

import duckdb

from ocrs_spark.ops.gopher import ORACLE_GOPHER, quality_signals

SF = "/root/testdata/sf0.001"


def _signals(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r.asDict() for r in quality_signals(df).collect()}
    return [rows[i] for i in range(len(texts))]


def test_signals_values(spark):
    # 'a b a b a b': 6 words, 2 distinct -> dup_word_frac = 1 - 2/6;
    # bigram 'a b' x3 (len 3), 'b a' x2 -> top2 = 3*3 = 9 over 11 chars;
    # trigrams 'a b a' x2 + 'b a b' x2 (len 5) -> dup3 = 20/11 > 1
    # (overlapping grams — the documented Gopher-signal behavior)
    rep, clean, hashy, single = _signals(
        spark,
        [
            "a b a b a b",
            "one two three four five",
            "# # # # tag",
            "word",
        ],
    )
    assert rep["n_words"] == 6
    assert rep["dup_word_frac"] == round(1 - 2 / 6, 4)
    assert rep["top_bigram_frac"] == round(9 / 11, 4)
    assert rep["dup_trigram_frac"] == round(20 / 11, 4)
    assert not rep["keep"]

    assert clean["dup_word_frac"] == 0.0
    assert clean["alpha_word_frac"] == 1.0
    assert clean["symbol_word_ratio"] == 0.0
    assert clean["dup_trigram_frac"] == 0.0
    assert not clean["keep"]  # fails only the MIN_WORDS floor

    # '# # # # tag': 5 words, 4 '#' chars -> symbol ratio 0.8; only
    # 'tag' is alphabetic -> alpha 0.2
    assert hashy["symbol_word_ratio"] == 0.8
    assert hashy["alpha_word_frac"] == 0.2

    # single word: no grams at all -> zero coverage, not fabricated
    # grams from Spark's descending sequence(1, 0)
    assert single["n_words"] == 1
    assert single["top_bigram_frac"] == 0.0
    assert single["dup_trigram_frac"] == 0.0


def test_ellipsis_counts_nonoverlapping(spark):
    # '.....' = one '...' left-to-right (replace-delta semantics), so
    # 6 dots = exactly 2
    (r,) = _signals(spark, ["wait...... what"])
    assert r["symbol_word_ratio"] == round((6 / 3) / 2, 3)


def test_keep_mix_on_corpus(spark):
    from ocrs_spark.ops.gopher import gopher_quality_signals

    pdf = gopher_quality_signals(spark, SF).toPandas()
    assert len(pdf) == 500
    kept = int(pdf["keep"].sum())
    assert 0 < kept < 500  # thresholds split the corpus, not rubber-stamp it


def test_oracle_parity_sf0001(spark):
    import sys

    sys.path.insert(0, "tests")
    from test_oracles import _duck_rows, _rowset

    from ocrs_spark.ops.gopher import gopher_quality_signals

    sdf = gopher_quality_signals(spark, SF).toPandas()
    con = duckdb.connect()
    con.execute(
        f"create view documents as select * from '{SF}/documents.parquet'"
    )
    ocols, orows = _duck_rows(con.sql(ORACLE_GOPHER))
    a, ca = _rowset(list(sdf.columns), [tuple(t) for t in sdf.itertuples(index=False, name=None)])
    b, cb = _rowset(ocols, orows)
    assert ca == cb
    assert a == b
