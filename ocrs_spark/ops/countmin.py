"""Count-Min sketch token-frequency estimation — the mergeable-sketch
complement to ``ops/heavyhitters.py``'s Misra-Gries: MG answers "which
tokens are frequent", CM answers "how frequent is ANY token" in O(d*w)
space, and two CM sketches from different corpus shards merge by
cell-wise addition (the property that matters at 1000 executors: every
partition sketches locally, the reduce is one tiny elementwise sum —
here that merge IS the map-side partial aggregation of groupBy).

Determinism discipline: the d row-hash functions are the repo's
engine-portable md5 hash (``mixture.salted_hash_long``) with per-row
salts, so sketch cells — and therefore every estimate — are
bit-identical on both engines, and the oracle recomputes the ENTIRE
sketch in SQL. The one-sided CM guarantee (estimate >= true count,
always) is pinned per token in the output, not just asserted in
tests: ``overestimate`` is estimate - exact, non-negative by
construction on both engines.

Scale: one explode+groupBy(token) for exact counts (the word-count
shape), then the sketch is d tiny groupBy(bucket) aggregations over
the ALREADY-aggregated (token, cnt) table — vocabulary-sized, not
corpus-sized — and the estimate join broadcasts d*w tiny cells.
At 100 TB the exact-count side is the expensive leg you'd drop in
production (the sketch replaces it); it exists here because the
operator's CONTRACT is estimate-vs-exact per token.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from . import load_tables
from .mixture import salted_hash_long

CM_DEPTH = 4  # d independent hash rows
CM_WIDTH = 8  # w buckets per row — deliberately NARROW for the synthetic
              # corpus (~31 distinct tokens): collisions are guaranteed, so
              # the min-over-rows genuinely resolves overestimates instead of
              # the sketch being a vacuous perfect hash. Production sizing is
              # w = ceil(e/eps); the machinery is width-independent.
_SALT = "|cm"


def _token_counts(docs):
    return (
        docs.select(
            F.explode(
                F.expr("filter(split(text, ' '), w -> w <> '')")
            ).alias("token")
        )
        .groupBy("token")
        .agg(F.count("*").cast("long").alias("exact_cnt"))
    )


def countmin_token_freq(spark, sf_dir: str):
    """(token, exact_cnt, cm_estimate, overestimate): the Count-Min
    point query for every corpus token next to its exact count."""
    (docs,) = load_tables(spark, sf_dir, "documents")
    tok = _token_counts(docs).localCheckpoint(eager=True)
    est = None
    for r in range(CM_DEPTH):
        bucket = (
            salted_hash_long(F.col("token"), f"{_SALT}{r}") % CM_WIDTH
        ).alias("bucket")
        sketch_row = (
            tok.select(bucket, "exact_cnt")
            .groupBy("bucket")
            .agg(F.sum("exact_cnt").cast("long").alias(f"cell_{r}"))
        )
        tok = tok.withColumn(f"b_{r}", bucket).join(
            F.broadcast(sketch_row.withColumnRenamed("bucket", f"b_{r}")),
            f"b_{r}",
        )
        col = F.col(f"cell_{r}")
        est = col if est is None else F.least(est, col)
    return tok.select(
        "token",
        "exact_cnt",
        est.cast("long").alias("cm_estimate"),
        (est - F.col("exact_cnt")).cast("long").alias("overestimate"),
    )


def _oracle_sql() -> str:
    def bucket(r: int) -> str:
        return (
            f"('0x' || substr(md5(token || '{_SALT}{r}'), 1, 8))::BIGINT"
            f" % {CM_WIDTH}"
        )

    rows = ", ".join(
        f"s{r} AS (SELECT {bucket(r)} AS b, CAST(SUM(exact_cnt) AS BIGINT)"
        f" AS cell FROM tok GROUP BY 1)"
        for r in range(CM_DEPTH)
    )
    joins = " ".join(
        f"JOIN s{r} ON s{r}.b = {bucket(r)}" for r in range(CM_DEPTH)
    )
    least = "LEAST(" + ", ".join(f"s{r}.cell" for r in range(CM_DEPTH)) + ")"
    return f"""
WITH tok AS (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS exact_cnt FROM (
    SELECT unnest(string_split(text, ' ')) AS token FROM documents
  ) WHERE token <> '' GROUP BY token
), {rows}
SELECT token, exact_cnt,
       CAST({least} AS BIGINT) AS cm_estimate,
       CAST({least} - exact_cnt AS BIGINT) AS overestimate
FROM tok {joins}
"""


QUERIES = {"countmin_token_freq": countmin_token_freq}
ORACLES = {"countmin_token_freq": _oracle_sql()}
