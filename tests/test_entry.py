"""Driver-contract tests: entry() smoke + the flagship OCR oracle pairs
(the ops oracle pairs are covered exhaustively in test_oracles.py)."""

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"


def test_entry_contract_shapes():
    q = entry_mod.queries()
    o = entry_mod.oracle_sql()
    # The driver sweep records at most 50 rows; the contract is
    # consolidated to exactly 50 so every entry gets a hard
    # CORRECTNESS row every round (folded variants stay pytest-only).
    assert len(q) == 50
    assert set(o) - set(q) == set()
    # Every query has a DuckDB oracle — no rows-only entries left.
    # Oracle-less entries are allowed by the driver contract only for
    # genuinely non-SQL-expressible ops (rows-only check); keep the
    # list explicit so a missing oracle is a decision, not an accident.
    assert set(q) - set(o) == set()  # every contract row is oracled


def test_entry_runs_and_returns_rows(spark):
    df = entry_mod.entry(spark)
    assert df.schema.simpleString().startswith("struct<doc_id:bigint,spans:array<struct<")
    rows = df.limit(5).collect()
    assert len(rows) > 0


@pytest.mark.parametrize(
    "name",
    [
        "ocr_image_span_texts",
        "ocr_text_span_parity",
        "ocr_interleaved_pipeline",
        "extraction_quarantine",
        "extraction_metrics_run",
        "stream_ocr_interleaved",
    ],
)
def test_flagship_ocr_oracles(spark, name):
    # Same dtype-sensitive pandas-path compare as test_oracles (the
    # driver canonicalizes through pandas, where e.g. DuckDB HUGEINT
    # degrades to float64 — fetchall() would hide that).
    import os
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from test_oracles import _duck_rows, _rowset

    df = entry_mod.queries()[name](spark, SF_DIR)
    got_rows, got_cols = _rowset(df.columns, [tuple(r) for r in df.collect()])
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'")
    duck_cols, raw = _duck_rows(con.sql(entry_mod.oracle_sql()[name]))
    want_rows, want_cols = _rowset(duck_cols, raw)
    assert got_cols == want_cols
    assert got_rows == want_rows
    assert len(got_rows) > 0
