"""Deterministic corpus mixture sampling: per-stratum down/upsampling.

Training-data pipelines mix sources at target weights ("2.5 epochs of
zh, 0.25 of es, ..."). Weight w produces floor(w) guaranteed copies of
every doc plus one more with probability frac(w) — except the
randomness is a doc_id-keyed md5 hash, NOT rand(): the sample is
reproducible run-to-run, engine-to-engine, and under any partitioning
or retry (a rand()-based sample changes under task replay — incorrect
at scale where stragglers re-execute). Copies materialize through
``explode(sequence(...))``, so upsampling is row generation inside the
scan, no join.

Everything is codegen expressions over one corpus scan; no shuffle at
all — the op is embarrassingly parallel, the strongest possible
scale shape. The DuckDB oracle evaluates the identical hash-derived
uniform, so the hash check proves every kept (doc, copy) row matches.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from . import load_tables

# Per-language target weights (epochs): >1 upsamples, <1 downsamples.
MIX_WEIGHTS = {"en": 0.9, "de": 1.0, "fr": 0.5, "es": 0.25, "zh": 2.5}
_SALT = "|mix"
_U32 = 4294967296.0


def salted_hash_long(key_col, salt: str):
    """THE cross-engine parity hash: first 8 md5 hex chars of
    (key || salt) as a BIGINT — DuckDB twin:
    ('0x' || substr(md5(key::VARCHAR || salt), 1, 8))::BIGINT.
    Every module that needs an engine-reproducible pseudo-random key
    (mixture, quota, bloomskip) uses this one spelling."""
    return F.conv(
        F.substring(F.md5(F.concat(key_col.cast("string"), F.lit(salt))), 1, 8),
        16,
        10,
    ).cast("long")


def salted_hash_sql(key: str, salt: str) -> str:
    """The same hash as a Spark SQL expression string (for callers that
    compose it inside larger expr() strings)."""
    return (
        f"CAST(conv(substring(md5(concat(CAST({key} AS STRING), '{salt}')), 1, 8),"
        f" 16, 10) AS BIGINT)"
    )


def _uniform(doc_id_col):
    """Deterministic uniform in [0, 1) keyed on doc_id."""
    return salted_hash_long(doc_id_col, _SALT) / F.lit(_U32)


def mixture_copies(docs, weights=None, stratum: str = "lang"):
    """(doc_id, stratum, copy 1..n) under the weight table."""
    weights = MIX_WEIGHTS if weights is None else weights
    w = None
    for k, v in sorted(weights.items()):
        w = F.when(F.col(stratum) == k, F.lit(float(v))) if w is None else w.when(
            F.col(stratum) == k, F.lit(float(v))
        )
    w = w.otherwise(F.lit(0.0))
    u = _uniform(F.col("doc_id"))
    n = (F.floor(w) + F.when(u < w - F.floor(w), 1).otherwise(0)).cast("int")
    return (
        docs.select("doc_id", F.col(stratum), n.alias("n"))
        .filter(F.col("n") > 0)
        .select(
            "doc_id",
            stratum,
            F.explode(F.expr("sequence(CAST(1 AS BIGINT), CAST(n AS BIGINT))")).alias(
                "copy"
            ),
        )
    )


def corpus_mixture(spark, sf_dir):
    (docs,) = load_tables(spark, sf_dir, "documents")
    return mixture_copies(docs)


def _oracle() -> str:
    case = " ".join(
        f"WHEN '{k}' THEN {float(v)}::DOUBLE" for k, v in sorted(MIX_WEIGHTS.items())
    )
    return f"""
WITH m AS (
  SELECT doc_id, lang,
         ('0x' || substr(md5(doc_id::VARCHAR || '{_SALT}'), 1, 8))::BIGINT
           / {_U32} AS u,
         CASE lang {case} ELSE 0.0::DOUBLE END AS w
  FROM documents
),
c AS (
  SELECT doc_id, lang,
         (floor(w)::INT + CASE WHEN u < w - floor(w) THEN 1 ELSE 0 END) AS n
  FROM m
)
SELECT doc_id, lang, unnest(range(1, n + 1))::BIGINT AS copy
FROM c WHERE n > 0
"""


ORACLE_MIXTURE = _oracle()

QUERIES = {"corpus_mixture": corpus_mixture}
ORACLES = {"corpus_mixture": ORACLE_MIXTURE}
