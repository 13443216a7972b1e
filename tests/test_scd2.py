"""SCD2 history build: hand fixtures pin the change-detection and
interval-closing semantics (consecutive duplicates collapse,
same-timestamp ties break on event_id, exactly one open version per
user, intervals tile without gaps). DuckDB parity runs in
test_oracles.py like every op."""

from __future__ import annotations

from datetime import datetime

from ocrs_spark.ops.scd2 import scd2_over, scd2_user_type_history

SF = "/root/testdata/sf0.001"
SCHEMA = "event_id long, ts timestamp, user_id long, event_type string"


def _ev(spark, rows):
    return spark.createDataFrame(
        [(i, datetime(2024, 1, d), u, t) for i, (d, u, t) in enumerate(rows)],
        SCHEMA,
    )


def _hist(df):
    return sorted(
        ((r.user_id, r.event_type, r.valid_from.day,
          r.valid_to.day if r.valid_to else None, r.is_current)
         for r in df.collect())
    )


def test_consecutive_duplicates_collapse(spark):
    # user 1 observes: a a b a -> versions a[1,3) b[3,4) a[4,None)
    df = scd2_over(_ev(spark, [(1, 1, "a"), (2, 1, "a"), (3, 1, "b"), (4, 1, "a")]))
    assert _hist(df) == [
        (1, "a", 1, 3, False),
        (1, "a", 4, None, True),
        (1, "b", 3, 4, False),
    ]


def test_single_observation_is_current(spark):
    df = scd2_over(_ev(spark, [(5, 7, "x")]))
    assert _hist(df) == [(7, "x", 5, None, True)]


def test_same_timestamp_ties_break_on_event_id(spark):
    # two observations at the same ts: event_id order decides which is
    # "later", so the surviving current version is the higher event_id.
    rows = [(0, datetime(2024, 1, 1), 9, "a"), (1, datetime(2024, 1, 1), 9, "b")]
    df = scd2_over(spark.createDataFrame(rows, SCHEMA))
    got = {(r.event_type, r.is_current) for r in df.collect()}
    assert got == {("a", False), ("b", True)}


def test_corpus_invariants(spark):
    out = scd2_user_type_history(spark, SF).collect()
    by_user = {}
    for r in out:
        by_user.setdefault(r.user_id, []).append(r)
    for user, rows in by_user.items():
        rows.sort(key=lambda r: r.valid_from)
        assert sum(r.is_current for r in rows) == 1
        assert rows[-1].is_current and rows[-1].valid_to is None
        for a, b in zip(rows, rows[1:]):
            assert a.valid_to == b.valid_from  # tiling, no gaps
            assert a.event_type != b.event_type  # real changes only
