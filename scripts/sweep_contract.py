#!/usr/bin/env python
"""Driver-gate rehearsal: run EVERY __spark_entry__ contract row on
Spark AND its DuckDB oracle at sf0.01 (the driver's scale), compare
with the dtype-sensitive canonicalizer from tests/test_oracles.py, and
print one summary line per row plus a final verdict. Usage:

    python scripts/sweep_contract.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import duckdb

    from test_oracles import TABLES, _duck_rows, _rowset

    from __spark_entry__ import oracle_sql, queries
    from ocrs_spark.session import get_spark

    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    q, o = queries(), oracle_sql()
    bad = []
    for name in q:
        t0 = time.time()
        try:
            df = q[name](spark, sf_dir)
            srows, scols = _rowset(df.columns, [tuple(r) for r in df.collect()])
            dcols, draw = _duck_rows(con.sql(o[name]))
            drows, dcols_s = _rowset(dcols, draw)
            ok = scols == dcols_s and srows == drows
            status = "OK" if ok else "MISMATCH"
            if not ok:
                bad.append(name)
            print(
                f"{status:8s} {name:40s} rows={len(srows):6d} "
                f"({time.time() - t0:.1f}s)",
                flush=True,
            )
        except Exception as exc:  # noqa: BLE001 — report and continue
            bad.append(name)
            print(f"ERROR    {name:40s} {exc}", flush=True)
    print(f"\n{len(q) - len(bad)}/{len(q)} green" + (f"; FAILED: {bad}" if bad else ""))
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
