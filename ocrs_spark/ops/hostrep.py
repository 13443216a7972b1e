"""Host-reputation rollup: per-host / per-registered-domain / per-TLD
corpus statistics in ONE pass via ROLLUP grouping sets — the
aggregation web-corpus curation runs before host-level decisions
(UT1-style blocklists, C4's host filters, per-domain quality priors
all consume exactly this table).

A naive implementation runs three groupBys (host, domain, tld) — three
scans of a 10^12-document corpus. ROLLUP(tld, domain, host) computes
the whole hierarchy in one scan: Catalyst plans a single Expand node
(each row fans out to its 4 grouping sets) feeding one partial+final
hash aggregate, so the corpus is read once and the shuffle carries
only pre-combined partial rows (group cardinality is hosts+domains+
tlds+1, tiny next to the corpus). The grand-total row is kept — it is
the corpus-wide prior the per-host scores get shrunk toward.

Hosts are synthesized deterministically from doc_id arithmetic
(7 subdomains x 5 registered names x 3 TLDs = 105 hosts under 15
registered domains) so the DuckDB oracle rebuilds the identical
hierarchy; level disambiguation uses GROUPING() bits, identical in
Spark and DuckDB (Spark's grouping_id() bit order is Spark-specific,
so the bitmask is assembled explicitly from per-column GROUPING()).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import load_tables

_SUBS = ("www", "cdn", "m", "blog", "shop", "news", "static")
_NAMES = ("alpha", "beta", "gamma", "delta", "epsilon")
_TLDS = ("com", "net", "org")


def _pick(options, expr: str) -> str:
    whens = " ".join(
        f"WHEN {i} THEN '{w}'" for i, w in enumerate(options)
    )
    return f"CASE CAST(({expr}) % {len(options)} AS INT) {whens} END"


_SUB = _pick(_SUBS, "doc_id")
_NAME = _pick(_NAMES, "doc_id // 7")
_TLD = _pick(_TLDS, "doc_id // 35")


def synth_hosted_docs(docs: DataFrame) -> DataFrame:
    """(doc_id, lang, n_chars, tld, domain, host) with a deterministic
    105-host hierarchy."""
    # Spark SQL uses div for integer division in expr; rebuild _NAME/_TLD
    name = _pick(_NAMES, "doc_id div 7")
    tld = _pick(_TLDS, "doc_id div 35")
    return docs.select(
        "doc_id",
        "lang",
        "n_chars",
        F.expr(tld).alias("tld"),
        F.concat(F.expr(name), F.lit("."), F.expr(tld)).alias("domain"),
        F.concat(
            F.expr(_SUB), F.lit("."), F.expr(name), F.lit("."), F.expr(tld)
        ).alias("host"),
    )


def reputation_rollup(hosted: DataFrame) -> DataFrame:
    lvl = (
        F.grouping("tld") * 4 + F.grouping("domain") * 2 + F.grouping("host")
    ).cast("int")
    return (
        hosted.rollup("tld", "domain", "host")
        .agg(
            lvl.alias("lvl"),
            F.count("*").cast("long").alias("n_docs"),
            F.round(F.avg("n_chars"), 4).alias("avg_chars"),
            F.round(
                F.sum(F.when(F.col("lang") == "en", 1).otherwise(0))
                / F.count("*"),
                4,
            ).alias("en_share"),
        )
        .select("lvl", "tld", "domain", "host", "n_docs", "avg_chars", "en_share")
    )


def host_reputation_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    (docs,) = load_tables(spark, sf_dir, "documents")
    return reputation_rollup(synth_hosted_docs(docs))


ORACLE_HOST_REPUTATION = f"""
WITH hosted AS (
  SELECT doc_id, lang, n_chars,
         {_TLD} AS tld,
         {_NAME} || '.' || {_TLD} AS domain,
         {_SUB} || '.' || {_NAME} || '.' || {_TLD} AS host
  FROM documents
)
SELECT
  (GROUPING(tld) * 4 + GROUPING(domain) * 2 + GROUPING(host))::INT AS lvl,
  tld, domain, host,
  count(*)::BIGINT AS n_docs,
  round(avg(n_chars), 4) AS avg_chars,
  round(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)::DOUBLE / count(*), 4)
    AS en_share
FROM hosted
GROUP BY ROLLUP (tld, domain, host)
"""


QUERIES = {"host_reputation_rollup": host_reputation_rollup}
ORACLES = {"host_reputation_rollup": ORACLE_HOST_REPUTATION}
