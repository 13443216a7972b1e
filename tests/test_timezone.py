"""Timezone-independence regression guard: every epoch/window emitted
by the event-time queries must be identical under a hostile session
timezone (the round-1 events_sessionize hash mismatch was a
timestamp_ntz -> zoned-cast drift that only showed on non-UTC hosts).
spark.sql.session.timeZone is runtime-mutable, so the same session is
flipped to America/New_York and back around each query."""

import duckdb
import pytest

from ocrs_spark.ops.relational import ORACLES, QUERIES

SF_DIR = "/root/testdata/sf0.001"
TZ_QUERIES = ["events_sessionize", "events_tumbling_window", "events_metrics_agg"]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{SF_DIR}/events.parquet'")
    return con


@pytest.mark.parametrize("name", TZ_QUERIES)
def test_event_queries_are_timezone_independent(spark, duck, name):
    import math

    def norm(v):
        if isinstance(v, float):
            return "nan" if math.isnan(v) else round(v + 0.0, 9) + 0.0
        return v

    def rowset(cols, rows):
        order = sorted(range(len(cols)), key=lambda i: cols[i])
        return sorted(tuple(norm(r[i]) for i in order) for r in rows)

    rel = duck.sql(ORACLES[name])
    want = rowset(rel.columns, rel.fetchall())
    original = spark.conf.get("spark.sql.session.timeZone")
    try:
        for tz in ("America/New_York", "Asia/Tokyo"):
            spark.conf.set("spark.sql.session.timeZone", tz)
            df = QUERIES[name](spark, SF_DIR)
            got = rowset(df.columns, [tuple(r) for r in df.collect()])
            assert got == want, f"{name} drifts under session tz {tz}"
    finally:
        spark.conf.set("spark.sql.session.timeZone", original)
