"""KMV (k-minimum-values) sketch intersection between two crawl
snapshots.

HLL sketches (ops/hllrollup.py) answer mergeable distinct COUNTS, but a
curation pipeline comparing two crawls also needs distinct-set OVERLAP
— "how much of yesterday's shingle set does today's crawl share?" — and
HLL cannot intersect. The KMV estimator can: keep the K smallest
(md5-) hash values of each side's distinct word 3-shingles; the union sketch is
the K smallest of the merged set, Jaccard ≈ |both sides ∩ union
sketch| / K, and the intersection size ≈ J x union estimate, where the
union estimate is (K-1) / max_normalized_hash (Beyer et al. 2007,
SIGMOD — "On Synopses for Distinct-Value Estimation Under Multiset
Operations").

Scale path: per-side distinct tokens, then the K smallest via the SAME
two-phase salted top-k the caption ranker uses — a per-(side, salt)
partial row_number() <= K prunes each salted slice to K rows before the
final per-side top-K, so no single reducer ever sees more than
SALTS x K rows even with two hot sides and 10^9 distinct tokens. The
sketches themselves (2K rows) merge driver-side like any bounded model.

The driver row returns the EXACT intersection/union/Jaccard (SQL
INTERSECT oracle) plus a ``kmv_within_bound`` flag asserting the sketch
estimate lies within 4/sqrt(K) relative error — the oracle pins the
flag TRUE, so a broken estimator (not merely an unlucky draw; md5 makes
the draw deterministic) goes red.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

K = 256  # sketch size; relative error ~ 1/sqrt(K) ≈ 6.25%
SALTS = 8
REL_BOUND = 4.0 / (K**0.5)  # generous: |est - exact| / exact < 0.25
# Side membership: two overlapping crawl samples of the corpus.
SIDE_A = "doc_id % 3 != 0"
SIDE_B = "doc_id % 2 != 0"
_HEX_DIGITS = 15  # 60 bits of the md5 prefix, exact in a double


def _side_tokens(docs, pred: str, side: str):
    from .dedup import shingles_df

    return (
        shingles_df(docs.filter(pred))
        .select(F.col("s").alias("tok"))
        .dropDuplicates(["tok"])
        .select(
            F.lit(side).alias("side"),
            F.col("tok"),
            # normalized hash in [0, 1): md5 prefix as a 60-bit integer
            (
                F.conv(F.substring(F.md5("tok"), 1, _HEX_DIGITS), 16, 10)
                .cast("double")
                / F.lit(float(16**_HEX_DIGITS))
            ).alias("h"),
        )
    )


def _kmin(df, k: int):
    """Two-phase salted per-side k-smallest-hash selection."""
    partial = Window.partitionBy("side", "__salt").orderBy("h", "tok")
    final = Window.partitionBy("side").orderBy("h", "tok")
    return (
        df.withColumn("__salt", F.pmod(F.xxhash64("tok"), F.lit(SALTS)))
        .withColumn("__pr", F.row_number().over(partial))
        .filter(F.col("__pr") <= k)
        .withColumn("__r", F.row_number().over(final))
        .filter(F.col("__r") <= k)
        .select("side", "tok", "h")
    )


def kmv_crawl_overlap(spark, sf_dir: str):
    """One row: exact distinct-token intersection/union/Jaccard of the
    two crawl samples plus the KMV-within-bound flag."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # r6: ONE shingle pass + ONE distinct-aggregation for both sides.
    # The former shape ran shingles_df + distinct per side (two scans,
    # two corpus-wide exchanges) and then merged two per-side K-row
    # sketches; but top-K(A ∪ B) == top-K(top-K(A) ∪ top-K(B)), and a
    # token of A∩B in the global top-K is necessarily in BOTH per-side
    # top-Ks (A ⊆ A∪B bounds its rank), so the union sketch and its
    # n_both can be read directly off one (token -> in_a, in_b) table.
    # Same md5 hash, same (h, tok) tie order, identical estimator
    # inputs — guide §2.3/§2.4: fewer passes, fewer shuffles.
    from .dedup import shingles_df

    merged = (
        shingles_df(docs.filter(f"({SIDE_A}) OR ({SIDE_B})"))
        .select(
            F.col("s").alias("tok"),
            F.expr(SIDE_A).cast("int").alias("ia"),
            F.expr(SIDE_B).cast("int").alias("ib"),
        )
        .groupBy("tok")
        .agg(F.max("ia").alias("in_a"), F.max("ib").alias("in_b"))
        .withColumn(
            "h",
            F.conv(F.substring(F.md5("tok"), 1, _HEX_DIGITS), 16, 10)
            .cast("double")
            / F.lit(float(16**_HEX_DIGITS)),
        )
        .localCheckpoint()
    )
    # Union sketch: K globally smallest hashes, salted two-phase.
    partial = Window.partitionBy("__salt").orderBy("h", "tok")
    final = Window.orderBy("h", "tok")
    union_k = (
        merged.withColumn("__salt", F.pmod(F.xxhash64("tok"), F.lit(SALTS)))
        .withColumn("__pr", F.row_number().over(partial))
        .filter(F.col("__pr") <= K)
        .withColumn("__r", F.row_number().over(final))
        .filter(F.col("__r") <= K)
    )
    # K bounded rows: the single-partition window above is a sketch
    # merge, not a data-scale sort.
    stats = union_k.agg(
        F.max("h").alias("kth"),
        F.sum((F.col("in_a") + F.col("in_b") == 2).cast("int")).alias("n_both"),
        F.count("*").alias("n_rows"),
    ).first()
    if stats["n_rows"] < K:
        # degenerate case: the union is smaller than the sketch, so
        # the sketch IS the set -- exact by construction
        union_est = float(stats["n_rows"])
        jaccard_est = stats["n_both"] / stats["n_rows"]
    else:
        union_est = (K - 1) / stats["kth"]
        jaccard_est = stats["n_both"] / K
    inter_est = jaccard_est * union_est

    # Exact intersection/union off the same checkpointed table — the
    # former full-outer join of two freshly recomputed distinct sets
    # (two more corpus scans + a join-width exchange) is now one
    # bounded aggregate.
    exact = merged.agg(
        F.sum((F.col("in_a") + F.col("in_b") == 2).cast("int")).alias(
            "n_inter"
        ),
        F.count("*").alias("n_union"),
    ).first()
    n_inter, n_union = int(exact["n_inter"]), int(exact["n_union"])
    within = (
        abs(inter_est - n_inter) / n_inter < REL_BOUND
        and abs(union_est - n_union) / n_union < REL_BOUND
    )
    return spark.createDataFrame(
        [
            (
                n_inter,
                n_union,
                round(n_inter / n_union, 6),
                bool(within),
            )
        ],
        "n_inter bigint, n_union bigint, jaccard double, kmv_within_bound boolean",
    )


from .dedup import _DUCK_SHINGLES  # noqa: E402

ORACLE_KMV_OVERLAP = f"""
WITH a AS (
  SELECT DISTINCT unnest({_DUCK_SHINGLES}) AS tok
  FROM documents WHERE {SIDE_A}
), b AS (
  SELECT DISTINCT unnest({_DUCK_SHINGLES}) AS tok
  FROM documents WHERE {SIDE_B}
), i AS (SELECT count(*) AS n FROM (SELECT tok FROM a INTERSECT SELECT tok FROM b)),
u AS (SELECT count(*) AS n FROM (SELECT tok FROM a UNION SELECT tok FROM b))
SELECT i.n::BIGINT AS n_inter, u.n::BIGINT AS n_union,
       round(i.n / u.n, 6) AS jaccard, TRUE AS kmv_within_bound
FROM i, u
"""


QUERIES = {
    "kmv_crawl_overlap": kmv_crawl_overlap,
}

ORACLES = {
    "kmv_crawl_overlap": ORACLE_KMV_OVERLAP,
}
