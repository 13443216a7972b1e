"""DoReMi-style domain reweighting (Xie et al. 2023, "DoReMi:
Optimizing Data Mixtures Speeds Up Language Model Pretraining") —
the mixture-WEIGHT LEARNER that sits upstream of ``ops/mixture.py``'s
mixture SAMPLER: domains whose proxy-model loss exceeds the reference
model's get their sampling weight multiplicatively boosted, so the
final corpus over-samples the domains the model still finds hard.

Spark-first shape: the 10^12-document corpus is touched exactly ONCE —
a single groupBy(domain) with map-side partial sums reduces it to one
row per domain (a handful). Every subsequent multiplicative-weights
round runs on that tiny aggregate; the final budget allocation is a
broadcast of a one-row total. Nothing iterative ever rescans the data.

Exact-arithmetic discipline (the repo-wide oracle rule): DoReMi's
update is w <- w * exp(eta * excess); exp() is transcendental and the
last ulp may differ across engines, so we use the linearized
mirror-descent update w <- w * (1 + eta * excess) in integer MILLI
units with floor division — bit-identical on both engines, and
first-order equal to the exponentiated update for the small
per-round steps DoReMi actually takes. Per-doc excess loss is
clamped at 0 (DoReMi clips negative excess: domains the proxy already
beats the reference on get no boost, but are not suppressed below
their base weight by noise).

The per-doc "proxy loss" is the deterministic planted stand-in the
whole module family uses (``classeval`` plants its scorer the same
way): a per-language base loss + an md5-derived noise term, integer
milli-nats, so the operator under test is the distributed reweighting
machinery, not a real language model the sandbox cannot run.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from . import load_tables
from .mixture import salted_hash_long

# Planted per-language proxy-model loss base (milli-nats/token): the
# proxy finds zh hardest, en easiest — mirroring the real-world shape
# where low-resource domains carry higher excess loss.
BASE_LOSS = {"en": 800, "de": 900, "fr": 1000, "es": 1100, "zh": 1400}
REF_LOSS_MILLI = 1000  # flat reference-model loss
NOISE_MOD = 400  # md5-derived per-doc noise in [0, 400)
_SALT = "|doremi"

ETA_DIV = 4  # eta = 1/4: update factor = 1000 + mean_excess // 4 (milli)
ROUNDS = 3
TOTAL_BUDGET = 100_000  # documents to allocate across domains


def _proxy_excess(docs):
    """(lang, excess) — per-doc clamped excess loss, all integer."""
    base = F.coalesce(
        *[
            F.when(F.col("lang") == k, F.lit(v))
            for k, v in sorted(BASE_LOSS.items())
        ],
        F.lit(REF_LOSS_MILLI),
    )
    loss = base + salted_hash_long(F.col("doc_id"), _SALT) % NOISE_MOD
    return docs.select(
        "lang", F.greatest(loss - REF_LOSS_MILLI, F.lit(0)).alias("excess")
    )


def domain_reweight_mw(spark, sf_dir: str):
    """Per-domain: corpus stats, the ROUNDS-step multiplicative-weights
    trajectory (integer milli), and the final document allocation out
    of TOTAL_BUDGET — floor division, so the allocation never
    over-commits the budget."""
    (docs,) = load_tables(spark, sf_dir, "documents")
    per_dom = (
        _proxy_excess(docs)
        .groupBy("lang")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("excess").cast("long").alias("excess_sum"),
        )
        .withColumn(
            "mean_excess_milli",
            F.expr("excess_sum div n_docs").cast("long"),
        )
    )
    # w <- (w * (1000 + eta*excess)) div 1000 per round, all integer —
    # built as one nested expression (the oracle unrolls identically)
    w_expr = "1000"
    for _ in range(ROUNDS):
        w_expr = (
            f"(({w_expr}) * (1000 + (mean_excess_milli div {ETA_DIV}))) div 1000"
        )
    weighted = per_dom.withColumn("weight_milli", F.expr(w_expr).cast("long"))
    total = weighted.agg(
        F.sum("weight_milli").cast("long").alias("w_total")
    )
    return (
        weighted.crossJoin(F.broadcast(total))
        .select(
            "lang",
            "n_docs",
            "mean_excess_milli",
            "weight_milli",
            F.expr(f"({TOTAL_BUDGET} * weight_milli) div w_total")
            .cast("long")
            .alias("alloc_docs"),
            F.round(F.col("weight_milli") / F.col("w_total"), 6).alias(
                "weight_share"
            ),
        )
    )


def _oracle_sql() -> str:
    base_case = "CASE " + " ".join(
        f"WHEN lang = '{k}' THEN {v}" for k, v in sorted(BASE_LOSS.items())
    ) + f" ELSE {REF_LOSS_MILLI} END"
    w_expr = "1000"
    for _ in range(ROUNDS):
        w_expr = (
            f"(({w_expr}) * (1000 + (mean_excess_milli // {ETA_DIV}))) // 1000"
        )
    return f"""
WITH ex AS (
  SELECT lang,
         GREATEST({base_case}
           + ('0x' || substr(md5(doc_id::VARCHAR || '{_SALT}'), 1, 8))::BIGINT
             % {NOISE_MOD}
           - {REF_LOSS_MILLI}, 0) AS excess
  FROM documents
),
per_dom AS (
  SELECT lang,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(excess) AS BIGINT) AS excess_sum
  FROM ex GROUP BY lang
),
w AS (
  SELECT lang, n_docs,
         CAST(excess_sum // n_docs AS BIGINT) AS mean_excess_milli
  FROM per_dom
),
weighted AS (
  SELECT *, CAST({w_expr} AS BIGINT) AS weight_milli FROM w
),
tot AS (SELECT CAST(SUM(weight_milli) AS BIGINT) AS w_total FROM weighted)
SELECT lang, n_docs, mean_excess_milli, weight_milli,
       CAST(({TOTAL_BUDGET} * weight_milli) // w_total AS BIGINT) AS alloc_docs,
       round(weight_milli / (w_total * 1.0), 6) AS weight_share
FROM weighted CROSS JOIN tot
"""


QUERIES = {"domain_reweight_mw": domain_reweight_mw}
ORACLES = {"domain_reweight_mw": _oracle_sql()}
