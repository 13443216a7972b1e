"""Cross-source contamination matrix: which PAIRS of providers share
verbatim passages — the mirror/syndication diagnostic a curation
pipeline runs before trusting per-source quality stats (a "new"
source that is 80% passage-identical to one you already ingest adds
duplication, not diversity; CCNet-style pipelines discover mirrors
exactly this way).

Passages are ops/passagededup's fixed-token segments (same SEG, same
split), reduced to DISTINCT (passage-hash, source) pairs — within-
source repetition must NOT inflate cross-source counts — and the
matrix is the self-join of that distinct set on the hash with
source_a < source_b, counted per pair plus a milli overlap share
against the smaller side's distinct-passage inventory.

Scale: the heavy reduction is one groupBy to DISTINCT (hash, source)
— content-hash keys, uniform shuffle. The self-join joins that
REDUCED set on hash; a passage shared by k sources contributes
C(k,2) rows with k bounded by the source count, not the corpus. The
per-source inventory is a |sources|-row broadcast. Output is at most
|sources|^2 rows.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from . import load_tables
from .passagededup import SEG


def _distinct_source_passages(docs):
    toks = F.split(F.trim(F.col("text")), r"\s+")
    n_seg = F.ceil(F.size(toks) / F.lit(float(SEG)))
    segs = docs.select(
        "source",
        toks.alias("toks"),
        F.explode(
            F.sequence(F.lit(0).cast("bigint"), n_seg - 1)
        ).alias("seg_idx"),
    ).select(
        "source",
        F.md5(
            F.array_join(
                F.slice(
                    F.col("toks"),
                    (F.col("seg_idx") * SEG + 1).cast("int"),
                    SEG,
                ),
                " ",
            )
        ).alias("h"),
    )
    return segs.distinct()


def source_overlap_matrix(spark, sf_dir: str):
    """(source_a, source_b, shared_passages, a_passages, b_passages,
    overlap_milli) for every source pair sharing at least one verbatim
    passage; overlap_milli is against the smaller inventory."""
    (docs,) = load_tables(spark, sf_dir, "documents")
    # r6: land the distinct passage table once — it feeds THREE plan
    # branches (inventory, both self-join sides); un-checkpointed, the
    # tokenize + explode + md5 + distinct subtree ran three times (the
    # setjoin/bitext materialize-the-token-table idiom).
    sp = _distinct_source_passages(docs).localCheckpoint()
    inv = sp.groupBy("source").agg(
        F.count("*").cast("long").alias("n_passages")
    )
    a = sp.alias("a")
    b = sp.alias("b")
    pairs = (
        a.join(b, F.col("a.h") == F.col("b.h"))
        .where(F.col("a.source") < F.col("b.source"))
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(F.count("*").cast("long").alias("shared_passages"))
    )
    ia = inv.select(
        F.col("source").alias("source_a"),
        F.col("n_passages").alias("a_passages"),
    )
    ib = inv.select(
        F.col("source").alias("source_b"),
        F.col("n_passages").alias("b_passages"),
    )
    return (
        pairs.join(F.broadcast(ia), "source_a")
        .join(F.broadcast(ib), "source_b")
        .select(
            "source_a",
            "source_b",
            "shared_passages",
            "a_passages",
            "b_passages",
            F.expr(
                "(1000 * shared_passages) div least(a_passages, b_passages)"
            ).alias("overlap_milli"),
        )
    )


ORACLE_MIRRORS = f"""
WITH toks AS (
  SELECT source, regexp_split_to_array(trim(text), '\\s+') AS t
  FROM documents
),
segs AS (
  SELECT DISTINCT source,
         md5(array_to_string(t[(j * {SEG} + 1):(j * {SEG} + {SEG})], ' '))
           AS h
  FROM toks,
       unnest(range(CAST(ceil(len(t) / {SEG}.0) AS BIGINT))) AS u(j)
),
inv AS (
  SELECT source, count(*)::BIGINT AS n_passages FROM segs GROUP BY source
),
pairs AS (
  SELECT a.source AS source_a, b.source AS source_b,
         count(*)::BIGINT AS shared_passages
  FROM segs a JOIN segs b ON a.h = b.h AND a.source < b.source
  GROUP BY 1, 2
)
SELECT p.source_a, p.source_b, p.shared_passages,
       ia.n_passages::BIGINT AS a_passages,
       ib.n_passages::BIGINT AS b_passages,
       ((1000 * p.shared_passages)
        // least(ia.n_passages, ib.n_passages))::BIGINT AS overlap_milli
FROM pairs p
JOIN inv ia ON ia.source = p.source_a
JOIN inv ib ON ib.source = p.source_b
"""


QUERIES = {"source_overlap_matrix": source_overlap_matrix}
ORACLES = {"source_overlap_matrix": ORACLE_MIRRORS}
