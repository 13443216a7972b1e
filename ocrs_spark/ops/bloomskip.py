"""Bloom-filter data skipping: per-file bloom bitmaps for equality
predicates where min/max zone maps prune NOTHING — the second half of
the storage-layout story (zorder.py measures min/max pruning for range
boxes; this measures bloom pruning for point lookups on scattered
keys, the case Parquet bloom filters exist for).

The synthetic key is a multiplicative hash of doc_id forced ODD, so
any EVEN probe is provably absent — the bloom's whole point — and
mid-domain keys scatter across every file, so min/max skipping
degenerates to touching ALL files for them (measured and committed as
the baseline).

The bitmap is RELATIONAL, which is what makes it scale: 4032 bits per
file stored as (file, word) rows of 63-bit BIGINT words (bit 63 stays
clear — a set sign bit overflows DuckDB's signed shift and flips
Spark's long negative). Construction is explode(K positions per key)
-> groupBy(file, word) -> bit_or: one shuffle of key-sized rows into
an O(NFILES x WORDS) mask table, mergeable by construction (bit_or is
associative-commutative — the same property Parquet relies on to
union row-group blooms). Widening the filter is a constant change, not
a schema change, so the false-positive rate is engineered (~0.2% at
sf0.1 occupancy) instead of saturating like a single-word toy bloom
would. Probing replays each probe's K positions against the mask
table with a left join on (file, word) and requires ALL K bits set;
false positives are measured (present probes also report true row
counts), false negatives are impossible.

Cross-engine exactness: positions come from the md5-hex-prefix integer
hash (the mixture.py parity construction); masks are BIGINT bit_or in
both engines; the oracle rebuilds every word bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import load_tables
from .mixture import salted_hash_sql

NFILES = 16
K_HASHES = 3
WORD_BITS = 63
N_WORDS = 64
BLOOM_BITS = WORD_BITS * N_WORDS  # 4032
_MULT = 2654435761
_DOM = 2**30

# probe set: 3 planted-present keys (docs 0, 7, 42) + 3 provably-absent
# even keys (one low, one mid-domain, one high)
_PRESENT_DOCS = (0, 7, 42)
_ABSENT_KEYS = (2, 2**29, 2**30)


def _key_of(d: str) -> str:
    return f"(({d}) * {_MULT}) % {_DOM} * 2 + 1"


def _pos_spark(key: str, j: int) -> str:
    return f"{salted_hash_sql(key, f'|b{j}')} % {BLOOM_BITS}"


def _pos_duck(key: str, j: int) -> str:
    return f"('0x' || substr(md5({key}::VARCHAR || '|b{j}'), 1, 8))::BIGINT % {BLOOM_BITS}"


def bloom_file_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(probe_key, rows_found, present, minmax_files_touched,
    bloom_files_touched) per probe."""
    (docs,) = load_tables(spark, sf_dir, "documents")
    n = docs.agg(F.count("*").alias("n"))
    rows = docs.crossJoin(F.broadcast(n)).select(
        F.expr(_key_of("doc_id")).alias("k"),
        F.expr(f"CAST(doc_id * {NFILES} AS BIGINT) div n").alias("f"),
    )
    pos_arr = ", ".join(_pos_spark("k", j) for j in range(K_HASHES))
    bits = rows.select(
        "f", F.explode(F.expr(f"array({pos_arr})")).alias("pos")
    ).select(
        "f",
        (F.col("pos") / WORD_BITS).cast("long").alias("word"),
        (F.col("pos") % WORD_BITS).cast("int").alias("bit"),
    )
    masks = (
        bits.select("f", "word", F.expr("shiftleft(CAST(1 AS BIGINT), bit)").alias("m"))
        .groupBy("f", "word")
        .agg(F.expr("bit_or(m)").alias("mask"))
    )
    ranges = rows.groupBy("f").agg(F.min("k").alias("mn"), F.max("k").alias("mx"))

    present_sql = ", ".join(_key_of(str(d)) for d in _PRESENT_DOCS)
    absent_sql = ", ".join(str(kk) for kk in _ABSENT_KEYS)
    probe = spark.sql(f"SELECT explode(array({present_sql}, {absent_sql})) AS probe_key")
    ppos_arr = ", ".join(_pos_spark("probe_key", j) for j in range(K_HASHES))
    ppos = probe.select(
        "probe_key", F.explode(F.expr(f"array({ppos_arr})")).alias("pos")
    ).select(
        "probe_key",
        (F.col("pos") / WORD_BITS).cast("long").alias("word"),
        (F.col("pos") % WORD_BITS).cast("int").alias("bit"),
    )
    # probe x file x position grid, left-joined against the mask table:
    # a missing (f, word) row means no key ever touched that word
    grid = ppos.crossJoin(F.broadcast(ranges))
    checked = grid.join(F.broadcast(masks), ["f", "word"], "left").select(
        "probe_key",
        "f",
        "mn",
        "mx",
        F.coalesce(
            F.expr("(shiftright(mask, bit) & CAST(1 AS BIGINT)) = 1"), F.lit(False)
        )
        .cast("long")
        .alias("hit"),
    )
    per_file = checked.groupBy("probe_key", "f", "mn", "mx").agg(
        (F.sum("hit") == K_HASHES).cast("long").alias("bl_hit")
    )
    agg = per_file.groupBy("probe_key").agg(
        F.sum(
            ((F.col("mn") <= F.col("probe_key")) & (F.col("probe_key") <= F.col("mx")))
            .cast("long")
        )
        .cast("long")
        .alias("minmax_files_touched"),
        F.sum("bl_hit").cast("long").alias("bloom_files_touched"),
    )
    found = (
        rows.groupBy("k")
        .agg(F.count("*").cast("long").alias("rows_found"))
        .withColumnRenamed("k", "probe_key")
    )
    return agg.join(found, "probe_key", "left").select(
        "probe_key",
        F.coalesce("rows_found", F.lit(0)).cast("long").alias("rows_found"),
        (F.coalesce("rows_found", F.lit(0)) > 0).alias("present"),
        "minmax_files_touched",
        "bloom_files_touched",
    )


def _duck_pos_rows(src: str, key: str) -> str:
    sels = [
        f"SELECT {key} AS probe_key, ({_pos_duck(key, j)}) // {WORD_BITS} AS word,"
        f" ({_pos_duck(key, j)}) % {WORD_BITS} AS bit FROM {src}"
        for j in range(K_HASHES)
    ]
    return " UNION ALL ".join(sels)


ORACLE_BLOOM_SKIP = f"""
WITH n AS (SELECT count(*)::BIGINT AS n FROM documents),
rows_t AS (
  SELECT {_key_of('doc_id')} AS k, (doc_id * {NFILES}) // n AS f
  FROM documents CROSS JOIN n
),
bits AS (
  {" UNION ALL ".join(
      f"SELECT f, ({_pos_duck('k', j)}) // {WORD_BITS} AS word,"
      f" ({_pos_duck('k', j)}) % {WORD_BITS} AS bit FROM rows_t"
      for j in range(K_HASHES)
  )}
),
masks AS (
  SELECT f, word, bit_or(1::BIGINT << bit::INT) AS mask
  FROM bits GROUP BY f, word
),
ranges AS (SELECT f, min(k) AS mn, max(k) AS mx FROM rows_t GROUP BY f),
probe AS (
  SELECT unnest([{", ".join(_key_of(str(d)) for d in _PRESENT_DOCS)},
                 {", ".join(str(kk) for kk in _ABSENT_KEYS)}]) AS probe_key
),
ppos AS ({_duck_pos_rows("probe", "probe_key")}),
grid AS (SELECT * FROM ppos CROSS JOIN ranges),
checked AS (
  SELECT g.probe_key, g.f, g.mn, g.mx,
         CASE WHEN m.mask IS NOT NULL
               AND ((m.mask >> g.bit::INT) & 1::BIGINT) = 1
              THEN 1 ELSE 0 END AS hit
  FROM grid g LEFT JOIN masks m ON m.f = g.f AND m.word = g.word
),
per_file AS (
  SELECT probe_key, f, mn, mx,
         CASE WHEN sum(hit) = {K_HASHES} THEN 1 ELSE 0 END AS bl_hit
  FROM checked GROUP BY probe_key, f, mn, mx
),
agg AS (
  SELECT probe_key,
         sum(CASE WHEN mn <= probe_key AND probe_key <= mx THEN 1 ELSE 0 END)::BIGINT
           AS minmax_files_touched,
         sum(bl_hit)::BIGINT AS bloom_files_touched
  FROM per_file GROUP BY probe_key
),
found AS (SELECT k AS probe_key, count(*)::BIGINT AS rows_found FROM rows_t GROUP BY k)
SELECT a.probe_key,
       coalesce(f.rows_found, 0)::BIGINT AS rows_found,
       (coalesce(f.rows_found, 0) > 0) AS present,
       a.minmax_files_touched,
       a.bloom_files_touched
FROM agg a LEFT JOIN found f USING (probe_key)
"""


QUERIES = {"bloom_file_skipping": bloom_file_skipping}
ORACLES = {"bloom_file_skipping": ORACLE_BLOOM_SKIP}
