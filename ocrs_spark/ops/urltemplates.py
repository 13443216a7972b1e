"""URL template mining + trap scoring — the crawl-planning layer above
urlnorm's per-URL canonicalization: collapse normalized URLs into
structural TEMPLATES (digit runs -> {N}, long hex runs -> {H}) and
score each (host, template) by how often its pages carry duplicate
content. Crawlers use exactly this to find calendar traps, session-id
mints, and pagination mirrors: a template minting thousands of URLs
whose bodies hash identically is a trap to deprioritize in the
frontier (complements ops/crawlplan.py's politeness budgeting), and a
template with distinct content per URL is a real content family.

The corpus is urlnorm's deterministic five-variant synthetic URL per
document (one source of truth for URL rows across the suite), joined
back to each document's text for the content hash.

Plan shape: skeletonization is one regexp projection fused into the
scan (whole-stage codegen, no Python); the only shuffle is the
(host, template) groupBy whose distinct-content count is Spark's
two-phase partial-distinct aggregate — at 10^12 URLs this is a
word-count-shaped job. dup_rate is one IEEE division of two exact
ints, rounded 6dp."""

from __future__ import annotations

from pyspark.sql import functions as F

from . import load_tables
from .urlnorm import _SYNTH_URL, host_expr, normalize_url_expr

# Digit runs first, then 8+-char hex runs (post-digit so pure-digit
# runs keep {N}); both engines run the same two-pass replacement.
_SKELETON = (
    "regexp_replace(regexp_replace({u}, '[0-9]+', '{{N}}'),"
    " '[a-f]{{8,}}', '{{H}}')"
)


def url_template_stats(spark, sf_dir):
    """(host, template, n_urls, n_distinct_texts, dup_rate): per URL
    template, how many URLs it mints and how much of its content is
    duplicated."""
    (docs,) = load_tables(spark, sf_dir, "documents")
    urls = docs.select(
        "doc_id",
        F.md5("text").alias("th"),
        F.expr(_SYNTH_URL).alias("raw"),
    ).select(
        "doc_id",
        "th",
        F.expr(normalize_url_expr("raw")).alias("u"),
        F.expr(host_expr("raw")).alias("host"),
    )
    skel = urls.select(
        "host",
        F.expr(_SKELETON.format(u="u")).alias("template"),
        "th",
    )
    return (
        skel.groupBy("host", "template")
        .agg(
            F.count("*").cast("long").alias("n_urls"),
            F.countDistinct("th").cast("long").alias("n_distinct_texts"),
        )
        .withColumn(
            "dup_rate",
            F.round(
                (F.col("n_urls") - F.col("n_distinct_texts"))
                / F.col("n_urls"),
                6,
            ),
        )
        .orderBy("host", "template")
    )


# The oracle starts from the CLOSED-FORM canonical URL per variant
# (the same independence urlnorm's own oracle uses), so the Spark
# side's full normalize + skeletonize chain is pinned end-to-end.
ORACLE_URL_TEMPLATES = """
WITH norm AS (
  SELECT doc_id, md5(text) AS th,
    CASE CAST(doc_id % 5 AS INT)
     WHEN 0 THEN 'http://example.com/doc/' || doc_id
     WHEN 1 THEN 'https://cdn.example.com/assets/' || doc_id
     WHEN 2 THEN 'http://example.com/doc/' || doc_id || '?id=' || doc_id || '&ref=home'
     WHEN 3 THEN 'https://example.com/doc/' || doc_id
     ELSE 'http://mirror.example.com:8080/doc/' || doc_id || '?a=1&b=2'
    END AS u,
    CASE CAST(doc_id % 5 AS INT)
     WHEN 0 THEN 'example.com'
     WHEN 1 THEN 'cdn.example.com'
     WHEN 2 THEN 'example.com'
     WHEN 3 THEN 'example.com'
     ELSE 'mirror.example.com'
    END AS host
  FROM documents
),
skel AS (
  SELECT host,
         regexp_replace(regexp_replace(u, '[0-9]+', '{N}', 'g'),
                        '[a-f]{8,}', '{H}', 'g') AS template,
         th
  FROM norm
)
SELECT host, template,
       count(*)::BIGINT AS n_urls,
       count(DISTINCT th)::BIGINT AS n_distinct_texts,
       round((count(*) - count(DISTINCT th))::DOUBLE / count(*), 6)
         AS dup_rate
FROM skel
GROUP BY host, template
ORDER BY host, template
"""

QUERIES = {"url_template_stats": url_template_stats}
ORACLES = {"url_template_stats": ORACLE_URL_TEMPLATES}
