"""Temperature-based multilingual sampling with EXACT per-language
quotas — the mixture-design step multilingual LLM corpora run before
training (upsample the tail, downsample the head: p_l ~ (n_l/N)^alpha,
the XLM-R recipe at alpha=0.5).

Two parts, each with the scale-honest shape:

- Quotas: one groupBy(lang) gives exact counts (languages are few);
  quota_l = min(n_l, floor(TARGET * sqrt(n_l) / sum_m sqrt(n_m))).
  The denominator is folded in SORTED-LANG order on the driver and the
  DuckDB oracle pins the same order with ``sum(... ORDER BY lang)`` —
  sqrt/mul/div are correctly-rounded IEEE ops, so the only
  cross-engine hazard is fold order, and pinning it makes the floor()
  boundary bit-deterministic (same trick as dedup's fixed-fold
  cosine).

- Selection: keep exactly the quota_l documents with the smallest
  doc-keyed md5 hash per language — reproducible under retries and
  engine-independent, unlike rand(). The naive spelling,
  ``row_number() OVER (PARTITION BY lang ...)``, drags each language
  into ONE task — and languages are few and huge, the worst possible
  window key at 10^12 docs. Instead: range-repartition by
  (lang, hash, doc_id), count each partition's per-language rows (the
  driver sees O(parts x langs) rows), prefix-sum those counts into
  per-(partition, lang) global-rank offsets, broadcast, and let each
  partition keep its rows whose offset-adjusted rank clears the
  quota. One range exchange, bounded driver state, no hot reducer —
  the grouped generalization of packing.py's two-phase scan, emitting
  the exact global rank so the oracle's row_number must agree row for
  row.
"""

from __future__ import annotations

import math

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import load_tables
from .mixture import salted_hash_long

TARGET_DOCS = 300
PARTS = 32
_SALT = "|quota"


def _hash_col(doc_id_col):
    return salted_hash_long(doc_id_col, _SALT)


def temperature_quotas(counts: dict[str, int], target: int = TARGET_DOCS) -> dict[str, int]:
    """Exact quotas from exact counts; sorted-lang fold order pinned."""
    denom = 0.0
    for lang in sorted(counts):
        denom += math.sqrt(float(counts[lang]))
    return {
        lang: min(n, int(math.floor(target * math.sqrt(float(n)) / denom)))
        for lang, n in counts.items()
    }


def quota_sample(
    docs: DataFrame, target: int = TARGET_DOCS, parts: int = PARTS
) -> DataFrame:
    """(doc_id, lang, samp_rank): exactly quota_l docs per language,
    the ones with the smallest doc-keyed hash; samp_rank is the global
    within-language rank (1-based)."""
    count_rows = docs.groupBy("lang").agg(F.count("*").alias("n")).collect()
    quotas = temperature_quotas({r["lang"]: r["n"] for r in count_rows}, target)

    keyed = docs.select("doc_id", "lang", _hash_col(F.col("doc_id")).alias("hkey"))
    ordered = (
        keyed.repartitionByRange(parts, "lang", "hkey", "doc_id")
        .sortWithinPartitions("lang", "hkey", "doc_id")
        .withColumn("pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    sub = ordered.groupBy("pid", "lang").agg(F.count("*").alias("c")).collect()
    # offset[(pid, lang)] = rows of lang in partitions before pid
    per_lang_running: dict[str, int] = {}
    offsets: dict[tuple[int, str], int] = {}
    for r in sorted(sub, key=lambda r: (r["pid"], r["lang"])):
        offsets[(r["pid"], r["lang"])] = per_lang_running.get(r["lang"], 0)
        per_lang_running[r["lang"]] = (
            per_lang_running.get(r["lang"], 0) + r["c"]
        )
    sc = docs.sparkSession.sparkContext
    b_off = sc.broadcast(offsets)
    b_q = sc.broadcast(quotas)

    def _take(batches):
        taken: dict[str, int] = {}
        pid = None
        for pdf in batches:
            if not len(pdf):
                continue
            if pid is None:
                pid = int(pdf["pid"].iloc[0])
            # rows arrive sorted by (lang, hkey, doc_id); lang segments
            # are contiguous, so a grouped cumcount is the local rank
            local = pdf.groupby("lang", sort=False).cumcount()
            base = pdf["lang"].map(
                lambda l: b_off.value.get((pid, l), 0) + taken.get(l, 0)
            )
            rank = (local + base + 1).astype("int64")
            quota = pdf["lang"].map(lambda l: b_q.value.get(l, 0)).astype("int64")
            keep = rank <= quota
            for lang, cnt in pdf["lang"].value_counts().items():
                taken[lang] = taken.get(lang, 0) + int(cnt)
            out = pdf.loc[keep, ["doc_id", "lang"]].copy()
            out["samp_rank"] = rank[keep]
            yield pd.DataFrame(out)

    return ordered.mapInPandas(
        _take, schema="doc_id long, lang string, samp_rank long"
    )


def temperature_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    (docs,) = load_tables(spark, sf_dir, "documents")
    return quota_sample(docs)


ORACLE_TEMPERATURE_SAMPLE = f"""
WITH c AS (
  SELECT lang, count(*)::BIGINT AS n FROM documents GROUP BY lang
),
t AS (SELECT sum(sqrt(n::DOUBLE) ORDER BY lang) AS s FROM c),
q AS (
  SELECT lang,
         least(n, floor({TARGET_DOCS} * sqrt(n::DOUBLE) / s)::BIGINT) AS quota
  FROM c CROSS JOIN t
),
h AS (
  SELECT doc_id, lang,
         ('0x' || substr(md5(doc_id::VARCHAR || '{_SALT}'), 1, 8))::BIGINT AS hkey
  FROM documents
),
r AS (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY lang ORDER BY hkey, doc_id)::BIGINT
           AS samp_rank
  FROM h
)
SELECT r.doc_id, r.lang, r.samp_rank
FROM r JOIN q USING (lang)
WHERE samp_rank <= quota
"""


QUERIES = {"temperature_sample": temperature_sample}
ORACLES = {"temperature_sample": ORACLE_TEMPERATURE_SAMPLE}
