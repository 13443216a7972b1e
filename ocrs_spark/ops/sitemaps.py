"""Sitemap ingest + recrawl scheduling — the crawl-side complement to
``ops/crawlplan.py``'s link-frontier: a polite crawler re-fetches a
page when the site's sitemap advertises a ``<lastmod>`` NEWER than the
crawler's own last-fetch timestamp (sitemaps.org protocol), instead of
blind-recrawling everything on a timer.

Round-trip discipline (the ``ops/linkgraph.py`` pattern): the corpus
SYNTHESIZES one sitemap XML document per host — a groupBy(host) with
``array_sort(collect_list(...))`` so the document is deterministic —
and the operator must then actually PARSE the markup back out
(``regexp_extract_all`` over ``<loc>``/``<lastmod>``, positional
``arrays_zip`` pairing, distractor tags ignored) to agree with the
oracle, which recomputes the expected rows closed-form from the
planting formulas and never sees the XML.

Scale: both legs are single-shuffle. The build is one groupBy(host)
(at web scale a host's sitemap set is sharded by the 50k-URL protocol
limit into a sitemap index — same layout, one more explode); the parse
is explode + expressions (whole-stage codegen, no Python); the
recrawl decision is one equi-join against the fetch ledger on the
normalized URL. ISO dates compare correctly as strings, so the due
test never touches engine-specific date arithmetic.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from . import load_tables

N_HOSTS = 16
EPOCH = "2025-01-01"
MOD_DAYS = 90  # lastmod = EPOCH + (doc_id % MOD_DAYS) days
CRAWL_MUL = 7  # last_crawled = EPOCH + (doc_id*7 % MOD_DAYS) days


def _planted(docs):
    """(doc_id, host, url, lastmod, last_crawled) — the planting
    formulas, shared by the sitemap builder and the fetch ledger."""
    host = F.concat(F.lit("host"), F.col("doc_id") % N_HOSTS, F.lit(".example.com"))
    return docs.select(
        "doc_id",
        host.alias("host"),
        F.concat(F.lit("https://"), host, F.lit("/doc/"), F.col("doc_id")).alias("url"),
        F.date_format(
            F.date_add(F.lit(EPOCH).cast("date"), (F.col("doc_id") % MOD_DAYS).cast("int")),
            "yyyy-MM-dd",
        ).alias("lastmod"),
        F.date_format(
            F.date_add(
                F.lit(EPOCH).cast("date"),
                ((F.col("doc_id") * CRAWL_MUL) % MOD_DAYS).cast("int"),
            ),
            "yyyy-MM-dd",
        ).alias("last_crawled"),
    )


def sitemap_xml_per_host(docs):
    """(host, xml): one sitemaps.org urlset per host, entries sorted,
    with ``<changefreq>`` distractor tags the parser must skip."""
    entry = F.concat(
        F.lit("<url><loc>"),
        F.col("url"),
        F.lit("</loc><changefreq>daily</changefreq><lastmod>"),
        F.col("lastmod"),
        F.lit("</lastmod></url>"),
    )
    return (
        _planted(docs)
        .select("host", entry.alias("entry"))
        .groupBy("host")
        .agg(
            F.concat(
                F.lit('<?xml version="1.0"?><urlset '
                      'xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'),
                F.array_join(F.array_sort(F.collect_list("entry")), ""),
                F.lit("</urlset>"),
            ).alias("xml")
        )
    )


def sitemap_recrawl(spark, sf_dir: str):
    """Parse every host's sitemap back into (url, lastmod) rows and
    join the crawler's fetch ledger: ``due`` iff the advertised
    lastmod is strictly newer than the last fetch."""
    (docs,) = load_tables(spark, sf_dir, "documents")
    maps = sitemap_xml_per_host(docs)
    parsed = (
        maps.select(
            "host",
            F.explode(
                F.arrays_zip(
                    F.expr(r"regexp_extract_all(xml, '<loc>([^<]*)</loc>', 1)"),
                    F.expr(
                        r"regexp_extract_all(xml, '<lastmod>([^<]*)</lastmod>', 1)"
                    ),
                )
            ).alias("e"),
        )
        .select("host", F.col("e.0").alias("url"), F.col("e.1").alias("lastmod"))
    )
    ledger = _planted(docs).select("url", "last_crawled")
    return parsed.join(ledger, "url").select(
        "url",
        "host",
        "lastmod",
        "last_crawled",
        (F.col("lastmod") > F.col("last_crawled")).alias("due"),
    )


def _oracle_sql() -> str:
    return f"""
WITH u AS (
  SELECT doc_id,
         'host' || (doc_id % {N_HOSTS}) || '.example.com' AS host,
         'https://host' || (doc_id % {N_HOSTS}) || '.example.com/doc/' || doc_id AS url,
         strftime(DATE '{EPOCH}' + CAST(doc_id % {MOD_DAYS} AS INT), '%Y-%m-%d') AS lastmod,
         strftime(DATE '{EPOCH}' + CAST((doc_id * {CRAWL_MUL}) % {MOD_DAYS} AS INT), '%Y-%m-%d') AS last_crawled
  FROM documents
)
SELECT url, host, lastmod, last_crawled, (lastmod > last_crawled) AS due FROM u
"""


QUERIES = {"sitemap_recrawl": sitemap_recrawl}
ORACLES = {"sitemap_recrawl": _oracle_sql()}
