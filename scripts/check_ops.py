#!/usr/bin/env python
"""Oracle-check specific ops at an arbitrary scale factor (r6 tooling).

    python scripts/check_ops.py --sf /root/testdata/sf0.1 name1 name2 ...
    python scripts/check_ops.py name1            # default sf0.01

Same dtype-sensitive canonicalizer as tests/test_oracles.py; ops without
an oracle are run (must not raise) and reported rows-only.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def main() -> int:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.01"
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--sf":
            sf_dir = args[i + 1]; i += 2
        else:
            names.append(args[i]); i += 1
    import duckdb

    from test_oracles import TABLES, _duck_rows, _rowset

    from ocrs_spark.ops import all_oracles, all_queries
    from ocrs_spark.session import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    q, o = all_queries(), all_oracles()
    bad = []
    for name in names:
        t0 = time.time()
        try:
            df = q[name](spark, sf_dir)
            srows, scols = _rowset(df.columns, [tuple(r) for r in df.collect()])
            if name not in o:
                print(f"ROWSONLY {name:40s} rows={len(srows):6d} ({time.time()-t0:.1f}s)", flush=True)
                continue
            dcols, draw = _duck_rows(con.sql(o[name]))
            drows, dcols_s = _rowset(dcols, draw)
            ok = scols == dcols_s and srows == drows
            if not ok:
                bad.append(name)
            print(
                f"{'OK' if ok else 'MISMATCH':8s} {name:40s} rows={len(srows):6d} "
                f"({time.time()-t0:.1f}s)",
                flush=True,
            )
        except Exception as exc:  # noqa: BLE001
            bad.append(name)
            print(f"ERROR    {name:40s} {exc}", flush=True)
    print(("ALL GREEN" if not bad else f"FAILED: {bad}"), flush=True)
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
