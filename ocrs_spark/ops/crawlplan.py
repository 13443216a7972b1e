"""Crawl-planning operators over the web-graph corpus:

- ``anchor_text_index`` — aggregate incoming anchor text per target
  page (the classic webgraph signal: anchor text describes the TARGET,
  feeding ranking and page-quality priors for curation). Extraction
  pairs each ``/doc/<id>`` href with its anchor's inner text via two
  same-pattern ``regexp_extract_all`` passes zipped together — still
  one expression-only scan — then one groupBy dst.

- ``crawl_frontier`` — politeness-scheduled fetch plan: robots-allowed
  URLs only (composes ops/robotsops), one fetch per host per wave
  (``row_number`` over host partitions), so wave k is the set of URLs
  a crawler may fetch in parallel round k without hitting any host
  twice. Per-host windows parallelize across hosts; a hot host's long
  tail IS the politeness constraint, not a skew bug — the planner
  makes that cost visible instead of hiding it.

Both oracles are closed-form: anchors come from the linked corpus's
arithmetic target formulas with their literal anchor words, the
frontier from the robots oracle — so the Spark side must really parse
markup / really evaluate robots rules to agree.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .linkgraph import _A, _B, _linked_corpus
from .robotsops import ORACLE_ROBOTS_ALLOWED, robots_allowed

_ANCHOR_RE = r'<a[^>]*href="/doc/(\\d+)"[^>]*>([^<]*)</a>'


def anchor_text_index(spark, sf_dir):
    """(doc_id, n_inlinks, anchors): inlink count and sorted distinct
    anchor texts per linked-to document."""
    pages = _linked_corpus(spark, sf_dir)
    stripped = "regexp_replace(html, '(?s)<!--.*?-->', ' ')"
    pairs = F.expr(
        f"zip_with(regexp_extract_all({stripped}, '{_ANCHOR_RE}', 1),"
        f" regexp_extract_all({stripped}, '{_ANCHOR_RE}', 2),"
        f" (x, y) -> named_struct('dst', x, 'anchor', y))"
    )
    return (
        pages.select(F.explode(pairs).alias("p"))
        .select(
            F.col("p.dst").cast("bigint").alias("doc_id"),
            F.col("p.anchor").alias("anchor"),
        )
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_inlinks"),
            F.array_join(F.sort_array(F.collect_set("anchor")), "|").alias(
                "anchors"
            ),
        )
    )


def crawl_frontier(spark, sf_dir):
    """(doc_id, host, wave): robots-allowed URLs scheduled one fetch
    per host per wave."""
    allowed = robots_allowed(spark, sf_dir).filter(F.col("allowed"))
    w = Window.partitionBy("host").orderBy("doc_id")
    return allowed.select("doc_id", "host").withColumn(
        "wave", F.row_number().over(w).cast("long")
    )


def _oracle_anchors() -> str:
    n = "(SELECT COUNT(*) FROM documents)"
    return f"""
WITH e AS (
  SELECT (doc_id*{_A[0]} + {_A[1]}) % {n} AS doc_id, 'related' AS anchor
  FROM documents
  UNION ALL
  SELECT (doc_id*{_B[0]} + {_B[1]}) % {n} AS doc_id, 'more' AS anchor
  FROM documents
)
SELECT doc_id, count(*)::BIGINT AS n_inlinks,
       string_agg(DISTINCT anchor, '|' ORDER BY anchor) AS anchors
FROM e GROUP BY doc_id
"""


ORACLE_FRONTIER = f"""
WITH a AS ({ORACLE_ROBOTS_ALLOWED})
SELECT doc_id, host,
       (row_number() OVER (PARTITION BY host ORDER BY doc_id))::BIGINT AS wave
FROM a WHERE allowed
"""

QUERIES = {
    "anchor_text_index": anchor_text_index,
    "crawl_frontier": crawl_frontier,
}
ORACLES = {
    "anchor_text_index": _oracle_anchors(),
    "crawl_frontier": ORACLE_FRONTIER,
}
