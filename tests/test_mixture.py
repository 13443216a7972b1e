"""Mixture sampling: weight semantics (floor copies + hashed
fractional), determinism, rate accuracy on the corpus, and oracle
parity (also swept by test_oracles)."""

import duckdb

from ocrs_spark.ops.mixture import (
    MIX_WEIGHTS,
    ORACLE_MIXTURE,
    corpus_mixture,
    mixture_copies,
)

SF = "/root/testdata/sf0.001"


def _rows(spark, data, weights):
    df = spark.createDataFrame(data, "doc_id long, lang string")
    return sorted(
        (r["doc_id"], r["copy"]) for r in mixture_copies(df, weights).collect()
    )


def test_integer_weights_are_exact_copy_counts(spark):
    data = [(i, "x") for i in range(20)]
    assert _rows(spark, data, {"x": 2.0}) == sorted(
        [(i, c) for i in range(20) for c in (1, 2)]
    )
    assert _rows(spark, data, {"x": 1.0}) == [(i, 1) for i in range(20)]


def test_zero_and_unknown_strata_drop(spark):
    data = [(1, "x"), (2, "y")]
    assert _rows(spark, data, {"x": 0.0}) == []


def test_deterministic_across_runs(spark):
    data = [(i, "x") for i in range(200)]
    a = _rows(spark, data, {"x": 0.5})
    b = _rows(spark, data, {"x": 0.5})
    assert a == b
    assert 60 <= len(a) <= 140  # hashed keep-rate near 0.5


def test_fractional_upsample_bounds(spark):
    # w=1.5: every doc appears 1 or 2 times, never 0 or 3
    data = [(i, "x") for i in range(100)]
    rows = _rows(spark, data, {"x": 1.5})
    per = {}
    for d, _ in rows:
        per[d] = per.get(d, 0) + 1
    assert set(per) == set(range(100))
    assert set(per.values()) <= {1, 2}
    assert 110 <= len(rows) <= 190


def test_corpus_rates_and_oracle_parity(spark):
    import sys

    sys.path.insert(0, "tests")
    from test_oracles import _duck_rows, _rowset

    sdf = corpus_mixture(spark, SF).toPandas()
    con = duckdb.connect()
    con.execute(f"create view documents as select * from '{SF}/documents.parquet'")
    ocols, orows = _duck_rows(con.sql(ORACLE_MIXTURE))
    a, ca = _rowset(
        list(sdf.columns), [tuple(t) for t in sdf.itertuples(index=False, name=None)]
    )
    b, cb = _rowset(ocols, orows)
    assert ca == cb and a == b

    n_in = con.sql("select lang, count(*) n from documents group by 1").df()
    n_in = dict(zip(n_in["lang"], n_in["n"]))
    out = sdf.groupby("lang")["copy"].count().to_dict()
    for lang, w in MIX_WEIGHTS.items():
        rate = out.get(lang, 0) / n_in[lang]
        assert abs(rate - w) < 0.45, (lang, rate, w)
