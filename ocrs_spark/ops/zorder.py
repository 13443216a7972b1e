"""Z-order (Morton) layout planning: multi-dimensional clustering for
scan pruning, with a measured files-skipped comparison against a
linear sort — the data-layout decision that dominates 100-TB scan cost
(Delta OPTIMIZE ZORDER / Iceberg sort-order rewrites exist precisely
for this; a table range-clustered on one column prunes nothing for
queries filtering the other).

Both dimensions are min/max-normalized to 16 bits with PURE INTEGER
arithmetic ((v - min) * 65535 div (max - min) — no float rounding to
drift cross-engine), bit-interleaved into a 32-bit Morton value by an
unrolled 16-term shift/mask expression (identical algebra in Spark and
DuckDB), and bucketed into NFILES equal z-ranges. The op then replays
a 2-D box predicate against per-file (min, max) stats — exactly the
file-skipping test a table format's manifest pruning performs — for
BOTH layouts: z-order files and a linear (x-sorted) layout. The
z-order row touching fewer files than the linear row IS the measured
claim; rows_matched is identical by construction (layout never changes
the answer, only the I/O).

Scale shape: normalization bounds are a 1-row broadcast aggregate;
z-value and file id are codegen expressions; the stats table is one
groupBy(file) of O(NFILES) groups. Materializing the layout for real
is ``repartitionByRange(zfile)`` into the existing sorted-compaction
sink (icebergops) — this op is the planner + the evidence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import load_tables
from .relational import ntz_epoch_seconds

NFILES = 16
BITS = 16
# box predicate: second quarter of the normalized space on both dims
BOX_LO, BOX_HI = 16384, 32767


def _interleave_spark(x: str, y: str) -> str:
    terms = []
    for k in range(BITS):
        terms.append(f"shiftleft((shiftright({x}, {k}) & 1), {2 * k + 1})")
        terms.append(f"shiftleft((shiftright({y}, {k}) & 1), {2 * k})")
    return " + ".join(terms)


def _interleave_duck(x: str, y: str) -> str:
    terms = []
    for k in range(BITS):
        terms.append(f"((({x} >> {k}) & 1) << {2 * k + 1})")
        terms.append(f"((({y} >> {k}) & 1) << {2 * k})")
    return " + ".join(terms)


def _norm16(v: str, lo: str, hi: str) -> str:
    """Integer 16-bit min/max normalization (div, not float /)."""
    return f"CAST((({v}) - ({lo})) * 65535 AS BIGINT) div (CASE WHEN ({hi}) > ({lo}) THEN ({hi}) - ({lo}) ELSE 1 END)"


def zorder_pruning_stats(events: DataFrame) -> DataFrame:
    """(layout, files_total, files_touched, rows_matched) for the
    z-order vs linear layout under the fixed box predicate."""
    base = events.select(
        F.col("user_id").cast("long").alias("x"),
        ntz_epoch_seconds("ts").cast("long").alias("y"),
    )
    bounds = base.agg(
        F.min("x").alias("xlo"),
        F.max("x").alias("xhi"),
        F.min("y").alias("ylo"),
        F.max("y").alias("yhi"),
    )
    nx = _norm16("x", "xlo", "xhi")
    ny = _norm16("y", "ylo", "yhi")
    z = _interleave_spark("x16", "y16")
    placed = (
        base.crossJoin(F.broadcast(bounds))
        .select(
            F.expr(nx).alias("x16"),
            F.expr(ny).alias("y16"),
        )
        .select(
            "x16",
            "y16",
            F.expr(f"CAST(({z}) * {NFILES} AS BIGINT) div 4294967296").alias("zfile"),
            F.expr(f"CAST(x16 * {NFILES} AS BIGINT) div 65536").alias("lfile"),
        )
        # placed feeds four branches (z stats, linear stats, matched
        # rows); pin it once or the scan + 32-term interleave re-execute
        # per branch (the dedupgraph/triangles lesson)
        .localCheckpoint(eager=True)
    )

    inbox = (
        (F.col("x16") >= BOX_LO)
        & (F.col("x16") <= BOX_HI)
        & (F.col("y16") >= BOX_LO)
        & (F.col("y16") <= BOX_HI)
    )

    def _stats(file_col: str, layout: str) -> DataFrame:
        per_file = placed.groupBy(file_col).agg(
            F.min("x16").alias("mnx"),
            F.max("x16").alias("mxx"),
            F.min("y16").alias("mny"),
            F.max("y16").alias("mxy"),
        )
        touched = (
            (F.col("mnx") <= BOX_HI)
            & (F.col("mxx") >= BOX_LO)
            & (F.col("mny") <= BOX_HI)
            & (F.col("mxy") >= BOX_LO)
        )
        return per_file.agg(
            F.count("*").cast("long").alias("files_total"),
            F.sum(touched.cast("long")).cast("long").alias("files_touched"),
        ).select(F.lit(layout).alias("layout"), "files_total", "files_touched")

    matched = placed.agg(F.sum(inbox.cast("long")).cast("long").alias("rows_matched"))
    return (
        _stats("zfile", "zorder")
        .unionByName(_stats("lfile", "linear"))
        .crossJoin(F.broadcast(matched))
    )


def zorder_layout_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = load_tables(spark, sf_dir, "events")
    return zorder_pruning_stats(events)


_DUCK_Z = _interleave_duck("x16", "y16")


def _duck_norm(v: str, lo: str, hi: str) -> str:
    return f"(({v}) - ({lo})) * 65535 // (CASE WHEN ({hi}) > ({lo}) THEN ({hi}) - ({lo}) ELSE 1 END)"


ORACLE_ZORDER = f"""
WITH base AS (
  SELECT user_id::BIGINT AS x, floor(epoch(ts))::BIGINT AS y FROM events
),
bounds AS (
  SELECT min(x) AS xlo, max(x) AS xhi, min(y) AS ylo, max(y) AS yhi FROM base
),
n AS (
  SELECT {_duck_norm('x', 'xlo', 'xhi')} AS x16,
         {_duck_norm('y', 'ylo', 'yhi')} AS y16
  FROM base CROSS JOIN bounds
),
placed AS (
  SELECT x16, y16,
         ({_DUCK_Z}) * {NFILES} // 4294967296 AS zfile,
         x16 * {NFILES} // 65536 AS lfile
  FROM n
),
matched AS (
  SELECT count(*) FILTER (WHERE x16 BETWEEN {BOX_LO} AND {BOX_HI}
                            AND y16 BETWEEN {BOX_LO} AND {BOX_HI})::BIGINT
           AS rows_matched
  FROM placed
),
zstats AS (
  SELECT zfile, min(x16) mnx, max(x16) mxx, min(y16) mny, max(y16) mxy
  FROM placed GROUP BY zfile
),
lstats AS (
  SELECT lfile, min(x16) mnx, max(x16) mxx, min(y16) mny, max(y16) mxy
  FROM placed GROUP BY lfile
)
SELECT 'zorder' AS layout, count(*)::BIGINT AS files_total,
       sum(CASE WHEN mnx <= {BOX_HI} AND mxx >= {BOX_LO}
                 AND mny <= {BOX_HI} AND mxy >= {BOX_LO} THEN 1 ELSE 0 END)::BIGINT
         AS files_touched,
       (SELECT rows_matched FROM matched) AS rows_matched
FROM zstats
UNION ALL
SELECT 'linear', count(*)::BIGINT,
       sum(CASE WHEN mnx <= {BOX_HI} AND mxx >= {BOX_LO}
                 AND mny <= {BOX_HI} AND mxy >= {BOX_LO} THEN 1 ELSE 0 END)::BIGINT,
       (SELECT rows_matched FROM matched)
FROM lstats
"""


QUERIES = {"zorder_layout_pruning": zorder_layout_pruning}
ORACLES = {"zorder_layout_pruning": ORACLE_ZORDER}
