"""URL normalization — the crawl-curation primitive that makes URL-keyed
dedup and link-graph joins work: the same resource crawled as
``HTTP://Example.COM:80/a?utm_source=feed#frag`` and
``http://example.com/a`` must key identically.

Rules (the RFC 3986 §6 normalizations that are safe without fetching,
plus tracking-param stripping):

- scheme and host lowercased (case-insensitive per spec),
- default ports dropped (``:80`` for http, ``:443`` for https);
  non-default ports kept,
- fragment stripped (never sent to the server),
- tracking params removed (``utm_*``, ``fbclid``, ``gclid``),
- remaining query params sorted (order-insensitive on virtually all
  servers; makes param order canonical for hashing),
- one trailing slash stripped from non-root paths.

Entirely Catalyst expressions (regexp_extract + array filter/sort/join
— single scan, whole-stage codegen, no Python), so at 100 TB it fuses
into whatever scan feeds it. The corpus synthesizes five deterministic
messiness variants per doc_id; the oracle states the expected canonical
form closed-form, so the Spark side must actually perform each rule to
agree.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from . import load_tables

# one messy raw URL per document, variant by doc_id % 5
_SYNTH_URL = """
CASE CAST(doc_id % 5 AS INT)
 WHEN 0 THEN concat('HTTP://Example.COM:80/doc/', doc_id, '?utm_source=feed#frag')
 WHEN 1 THEN concat('https://CDN.Example.com:443/assets/', doc_id, '/')
 WHEN 2 THEN concat('http://example.com/doc/', doc_id,
                    '?id=', doc_id, '&utm_campaign=c&ref=home')
 WHEN 3 THEN concat('https://example.com/doc/', doc_id, '#section-2')
 ELSE concat('http://Mirror.example.com:8080/doc/', doc_id, '?b=2&a=1')
END
"""

_TRACKING = "p LIKE 'utm_%' OR p LIKE 'fbclid=%' OR p LIKE 'gclid=%'"


def normalize_url_expr(col: str) -> str:
    """SQL expression string: canonical form of the URL in ``col``."""
    scheme = f"lower(regexp_extract({col}, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))"
    authority = f"regexp_extract({col}, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)"
    host = f"lower(regexp_extract({authority}, '^([^:]*)', 1))"
    port = f"regexp_extract({authority}, ':([0-9]+)$', 1)"
    keep_port = (
        f"({port} != '' AND NOT (({scheme} = 'http' AND {port} = '80') "
        f"OR ({scheme} = 'https' AND {port} = '443')))"
    )
    path = f"regexp_extract({col}, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1)"
    path_norm = (
        f"CASE WHEN {path} != '/' AND {path} LIKE '%/' "
        f"THEN substring({path}, 1, length({path}) - 1) ELSE {path} END"
    )
    query = f"regexp_extract({col}, '\\\\?([^#]*)', 1)"
    params = (
        f"filter(split({query}, '&'), p -> p != '' AND NOT ({_TRACKING}))"
    )
    query_norm = f"array_join(array_sort({params}), '&')"
    return (
        f"concat({scheme}, '://', {host}, "
        f"IF({keep_port}, concat(':', {port}), ''), {path_norm}, "
        f"IF({query_norm} != '', concat('?', {query_norm}), ''))"
    )


def host_expr(col: str) -> str:
    """SQL expression string: lowercased host of the URL in ``col``."""
    authority = f"regexp_extract({col}, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)"
    return f"lower(regexp_extract({authority}, '^([^:]*)', 1))"


def normalize_url(df, url_col: str = "url"):
    """(.., url) -> (.., normalized_url, host). Pure expressions."""
    return df.withColumn(
        "normalized_url", F.expr(normalize_url_expr(url_col))
    ).withColumn("host", F.expr(host_expr(url_col)))


def url_normalized(spark, sf_dir: str):
    """Normalize the synthesized messy-URL corpus; the oracle is the
    closed-form canonical URL per variant."""
    (docs,) = load_tables(spark, sf_dir, "documents")
    raw = docs.select("doc_id", F.expr(_SYNTH_URL).alias("url"))
    return normalize_url(raw).select("doc_id", "normalized_url", "host")


ORACLE_URL_NORMALIZED = """
SELECT doc_id,
  CASE CAST(doc_id % 5 AS INT)
   WHEN 0 THEN 'http://example.com/doc/' || doc_id
   WHEN 1 THEN 'https://cdn.example.com/assets/' || doc_id
   WHEN 2 THEN 'http://example.com/doc/' || doc_id || '?id=' || doc_id || '&ref=home'
   WHEN 3 THEN 'https://example.com/doc/' || doc_id
   ELSE 'http://mirror.example.com:8080/doc/' || doc_id || '?a=1&b=2'
  END AS normalized_url,
  CASE CAST(doc_id % 5 AS INT)
   WHEN 0 THEN 'example.com'
   WHEN 1 THEN 'cdn.example.com'
   WHEN 2 THEN 'example.com'
   WHEN 3 THEN 'example.com'
   ELSE 'mirror.example.com'
  END AS host
FROM documents
"""


QUERIES = {"url_normalized": url_normalized}
ORACLES = {"url_normalized": ORACLE_URL_NORMALIZED}
