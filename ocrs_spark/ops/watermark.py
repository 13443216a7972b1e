"""Watermark-delay tuning from measured event-time DISORDER: how late
can an event be, relative to the max event time already ingested when
it arrives? The P95/P99/max of that lateness distribution IS the
number a Structured Streaming job should pass to ``withWatermark`` —
too small drops real events (ops/streamrows' late-data row shows
exactly that), too large holds state forever. This op measures it
from the ledger instead of guessing.

Arrival order simulates a real ingest: the corpus ledger is written
in event-time order, so a deterministic md5 jitter (±2 h per event — wide enough to reorder a ledger whose events sit tens of minutes apart)
perturbs it into the out-of-order arrival stream a collector actually
sees — lateness of event e = max(ts of events arriving before e) -
ts(e), clamped at 0, is nonzero exactly where the jitter reorders. The
running max over arrival order is a corpus-wide associative scan — the
SAME two-phase shape as ops/packing's distributed prefix SUM, with max
as the monoid: range-repartition by event_id (pinned), per-partition
maxima to the driver (one row per partition), exclusive prefix maxima
broadcast back, one Arrow pass for the local scan. No corpus-wide
window, no single-task sort.

Quantiles are exact rank positions over the (lateness -> count)
HISTOGRAM (bounded by distinct lateness seconds, not events — the
ccnet/robust small-table trick): P50/P95/P99 value = the smallest
lateness whose cumulative count reaches ceil(p*n/100).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Window
from pyspark.sql import functions as F

from . import load_tables
from .relational import ntz_epoch_seconds

PCTS = (50, 95, 99)


def _lateness(events, parts: int = 32):
    jitter = (
        "cast(conv(substring(md5(cast(event_id as string)), 1, 8), 16, 10)"
        " as bigint) % 14401 - 7200"
    )
    ordered = (
        events.select(
            "event_id", ntz_epoch_seconds("ts").cast("long").alias("es")
        )
        .withColumn("arr", F.col("es") + F.expr(jitter))
        .repartitionByRange(parts, "arr", "event_id")
        .sortWithinPartitions("arr", "event_id")
        .withColumn("pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    sub = ordered.groupBy("pid").agg(F.max("es").alias("m")).collect()
    maxima = {r["pid"]: r["m"] for r in sub}
    prefix = {}
    acc = None
    for pid in sorted(maxima):
        prefix[pid] = acc
        acc = maxima[pid] if acc is None else max(acc, maxima[pid])
    b_pre = ordered.sparkSession.sparkContext.broadcast(prefix)

    def scan(batches):
        # r6: vectorized scan (guide §4.2) — lateness of event i is
        # max(0, prefix_max_exclusive(i) - es(i)); np.maximum.accumulate
        # gives the inclusive prefix max, shifted one right with the
        # cross-batch carry seeded from the broadcast partition prefix
        # (sentinel -2^62 = "no predecessor", clamps to 0 like the
        # former None branch).
        import numpy as np

        sentinel = -(2**62)
        run = None
        base_loaded = False
        for pdf in batches:
            if not len(pdf):
                continue
            if not base_loaded:
                run = b_pre.value[int(pdf["pid"].iloc[0])]
                base_loaded = True
            arr = pdf["es"].to_numpy(np.int64)
            cm = np.maximum.accumulate(arr)
            carry = sentinel if run is None else run
            prev = np.concatenate(([carry], cm[:-1]))
            np.maximum.accumulate(prev, out=prev)
            late = np.clip(prev - arr, 0, None)
            run = int(max(carry, cm[-1]))
            yield pd.DataFrame(
                {"lateness_s": pd.Series(late, dtype="int64")}
            )

    return ordered.mapInPandas(scan, schema="lateness_s long")


def watermark_disorder_stats(spark, sf_dir: str):
    """(pct, lateness_s, n_events, max_lateness_s) — exact rank
    quantiles of the ingest-disorder distribution; pct 50/95/99."""
    (events,) = load_tables(spark, sf_dir, "events")
    late = _lateness(events)
    hist = late.groupBy("lateness_s").agg(
        F.count("*").cast("long").alias("c")
    )
    w_cum = Window.orderBy("lateness_s").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = hist.select(
        "lateness_s",
        F.sum("c").over(w_cum).cast("long").alias("cum"),
    )
    tot = cum.agg(
        F.max("cum").cast("long").alias("n_events"),
        F.max("lateness_s").cast("long").alias("max_lateness_s"),
    )
    p = F.explode(F.array(*[F.lit(x) for x in PCTS])).alias("pct")
    grid = cum.crossJoin(F.broadcast(tot)).select(
        "lateness_s", "cum", "n_events", "max_lateness_s", p
    )
    return (
        grid.where(F.expr("100 * cum >= pct * n_events"))
        .groupBy("pct")
        .agg(
            F.min("lateness_s").cast("long").alias("lateness_s"),
            F.max("n_events").cast("long").alias("n_events"),
            F.max("max_lateness_s").cast("long").alias("max_lateness_s"),
        )
        .select(
            F.col("pct").cast("long").alias("pct"),
            "lateness_s",
            "n_events",
            "max_lateness_s",
        )
    )


ORACLE_WATERMARK = f"""
WITH o AS (
  SELECT event_id, floor(epoch(ts))::BIGINT AS es,
         floor(epoch(ts))::BIGINT
           + ('0x' || substr(md5(event_id::VARCHAR), 1, 8))::BIGINT % 14401
           - 7200 AS arr
  FROM events
),
scan AS (
  SELECT es,
         max(es) OVER (ORDER BY arr, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS prev_max
  FROM o
),
late AS (
  SELECT CASE WHEN prev_max IS NULL OR prev_max <= es THEN 0
              ELSE prev_max - es END::BIGINT AS lateness_s
  FROM scan
),
hist AS (
  SELECT lateness_s, count(*)::BIGINT AS c FROM late GROUP BY lateness_s
),
cum AS (
  SELECT lateness_s,
         sum(c) OVER (ORDER BY lateness_s ROWS UNBOUNDED PRECEDING)
           ::BIGINT AS cum
  FROM hist
),
tot AS (
  SELECT max(cum)::BIGINT AS n_events,
         max(lateness_s)::BIGINT AS max_lateness_s
  FROM cum
),
grid AS (
  SELECT c.lateness_s, c.cum, t.n_events, t.max_lateness_s, p.pct
  FROM cum c, tot t,
       (SELECT unnest([{", ".join(str(x) for x in PCTS)}]) AS pct) p
)
SELECT pct::BIGINT AS pct,
       min(lateness_s)::BIGINT AS lateness_s,
       max(n_events)::BIGINT AS n_events,
       max(max_lateness_s)::BIGINT AS max_lateness_s
FROM grid
WHERE 100 * cum >= pct * n_events
GROUP BY pct
"""


QUERIES = {"watermark_disorder_stats": watermark_disorder_stats}
ORACLES = {"watermark_disorder_stats": ORACLE_WATERMARK}
