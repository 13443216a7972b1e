"""Driver-gate mirror: run every queries() entry on Spark AND its DuckDB
oracle on the same parquet tables, compare row sets order-insensitively
(columns sorted by name, values normalized) — the same bar the driver's
CORRECTNESS check applies at sf0.01. Runs at sf0.001 for speed.

Crucially this fetches the oracle via ``duckdb .df()`` (pandas), NOT
``fetchall()``: the driver canonicalizes through pandas, where DuckDB's
HUGEINT degrades to float64 — ``fetchall()`` hides that whole bug class by
coercing to Python ints (the round-1/2 ``events_sessionize`` red row was
exactly this).  Value normalization is dtype-sensitive: an int 3 and a
float 3.0 are DIFFERENT, matching the driver's value-hash behavior.
"""

import math

import duckdb
import numpy as np
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def _norm(v):
    """Normalize one cell to a (type-tag, value) pair.

    The type tag keeps int-vs-float distinct — Python's ``3 == 3.0`` would
    otherwise mask dtype drift that the driver's hash-based compare flags.
    """
    if isinstance(v, np.generic):
        v = v.item()
    if v is None or v is pd.NaT:
        # Spark collect() renders a NULL timestamp as None; DuckDB's
        # pandas path renders it as NaT — one null token for both.
        return ("null", None)
    if isinstance(v, pd.Timestamp):
        v = v.to_pydatetime()
    if isinstance(v, float):
        if math.isnan(v):
            # pandas renders SQL NULL as NaN; fold both to one null token.
            return ("null", None)
        # Engines may render -0.0 vs 0.0 differently after rounding.
        return ("f", round(v + 0.0, 9) + 0.0)
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, bytearray):
        return ("y", bytes(v))
    if isinstance(v, bytes):
        return ("y", v)
    return (type(v).__name__, v)


def _rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        tuple(_norm(r[i]) for i in order) for r in rows
    ), [cols[i] for i in order]


def _duck_rows(rel):
    """Fetch a DuckDB relation the way the driver does: through pandas."""
    pdf = rel.df()
    cols = list(pdf.columns)
    rows = [tuple(rec) for rec in pdf.itertuples(index=False, name=None)]
    return cols, rows


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _pairs():
    from ocrs_spark.ops import all_oracles, all_queries

    queries, oracles = all_queries(), all_oracles()
    return [(name, queries[name], oracles.get(name)) for name in sorted(queries)]


@pytest.mark.parametrize("name,query,oracle", _pairs(), ids=lambda p: p if isinstance(p, str) else "")
def test_query_matches_oracle(spark, duck, name, query, oracle):
    df = query(spark, SF_DIR)
    spark_rows = [tuple(r) for r in df.collect()]
    spark_cols = df.columns
    if oracle is None:
        assert len(spark_rows) >= 0  # rows-only check (non-SQL-expressible op)
        return
    duck_cols, raw_rows = _duck_rows(duck.sql(oracle))
    duck_rows, duck_cols_sorted = _rowset(duck_cols, raw_rows)
    got_rows, got_cols_sorted = _rowset(spark_cols, spark_rows)
    assert got_cols_sorted == duck_cols_sorted, f"{name}: column mismatch"
    assert len(got_rows) == len(duck_rows), (
        f"{name}: row count {len(got_rows)} != oracle {len(duck_rows)}"
    )
    mismatches = [
        (a, b) for a, b in zip(got_rows, duck_rows) if a != b
    ]
    assert not mismatches, f"{name}: {len(mismatches)} row mismatches; first: {mismatches[:2]}"
