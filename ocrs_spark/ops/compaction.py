"""Small-file compaction planning — the metadata-only pass behind
Iceberg's RewriteDataFiles binpack / Delta OPTIMIZE: given a manifest
of data files, group undersized files into rewrite tasks of roughly
TARGET_BYTES each, per table partition, so a 10^12-doc table whose
streaming ingest produced millions of KB-scale files is rewritten into
~target-sized ones.

The file manifest is synthesized deterministically from the documents
table (file per doc, size planted from the md5 integer family every
sampling module here uses) — the stand-in for reading Iceberg's real
`files` metadata table, which ops/icebergops.py exercises for the
scan-side equivalents.

Packing rule: offset-range packing, the same rule Spark's
FilePartition planner and AQE coalescing use — order files by (size
desc, file_id), accumulate a running byte offset per partition, and
assign bin = floor(preceding_bytes / target). Unlike first-fit-
decreasing, this is pure window arithmetic (no sequential state), so
it is expressible in both engines bit-identically, and its bins are
within one file of target size — the accepted trade for a fully
parallel planner.

Scale: everything here is over the FILE MANIFEST, not the data — the
manifest is millions of rows at 10^12 docs, and the only window is
partitioned by the table partition key (source) ordered within it.
A real compaction job would then rewrite each bin's files in one task;
the plan itself never touches file contents.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from . import load_tables

TARGET_BYTES = 128 * 1024  # rewrite-task target size
_SALT = "|fsz"
SIZE_MOD = 65536  # planted file size: 1 KiB + hash % 64 KiB


def file_manifest(docs):
    """(source, file_id, size_bytes) — one synthetic data file per doc."""
    return docs.select(
        "source",
        F.col("doc_id").alias("file_id"),
        (
            F.lit(1024)
            + F.expr(
                f"cast(conv(substring(md5(concat(cast(doc_id as string),"
                f" '{_SALT}')), 1, 8), 16, 10) as bigint) % {SIZE_MOD}"
            )
        )
        .cast("long")
        .alias("size_bytes"),
    )


def compaction_plan(spark, sf_dir: str):
    """(source, bin, n_files, total_bytes, max_file_bytes) — one row
    per planned rewrite task."""
    (docs,) = load_tables(spark, sf_dir, "documents")
    files = file_manifest(docs)
    w = (
        Window.partitionBy("source")
        .orderBy(F.col("size_bytes").desc(), F.col("file_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # preceding_bytes = running sum minus own size; integer div bins it
    binned = files.select(
        "source",
        "file_id",
        "size_bytes",
        F.floor(
            (F.sum("size_bytes").over(w) - F.col("size_bytes")) / TARGET_BYTES
        )
        .cast("long")
        .alias("bin"),
    )
    return binned.groupBy("source", "bin").agg(
        F.count("*").cast("long").alias("n_files"),
        F.sum("size_bytes").cast("long").alias("total_bytes"),
        F.max("size_bytes").cast("long").alias("max_file_bytes"),
    )


def _oracle_sql() -> str:
    return f"""
WITH files AS (
  SELECT source, doc_id AS file_id,
         CAST(1024 + ('0x' || substr(md5(doc_id::VARCHAR || '{_SALT}'), 1, 8))::BIGINT
              % {SIZE_MOD} AS BIGINT) AS size_bytes
  FROM documents
),
binned AS (
  SELECT source, file_id, size_bytes,
         CAST((SUM(size_bytes) OVER (
                 PARTITION BY source
                 ORDER BY size_bytes DESC, file_id ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               - size_bytes) // {TARGET_BYTES} AS BIGINT) AS bin
  FROM files
)
SELECT source, bin,
       COUNT(*)::BIGINT AS n_files,
       SUM(size_bytes)::BIGINT AS total_bytes,
       MAX(size_bytes)::BIGINT AS max_file_bytes
FROM binned
GROUP BY source, bin
"""


QUERIES = {"compaction_plan": compaction_plan}
ORACLES = {"compaction_plan": _oracle_sql()}
