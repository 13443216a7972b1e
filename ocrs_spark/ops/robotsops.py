"""Crawl-compliance filtering: evaluate every document URL against its
host's robots.txt (RFC 9309 engine in ``ocrs_spark.robots``).

Shape at scale: the robots table is one row per host — thousands of
rows against billions of URLs — so it broadcast-joins onto the URL
stream; matching runs in an Arrow batch UDF with an lru parse cache
keyed on the robots body, making parse cost O(distinct hosts) per
executor and match cost O(urls x rules-per-host). No shuffle anywhere.

The synthetic scenario exercises the three hard matching rules with a
closed-form oracle:

- ``example.com``: ``Disallow: /doc/`` vs the LONGER ``Allow: /doc/*2$``
  — wildcard + end-anchor + longest-match-wins: only doc_ids ending in
  2 are allowed,
- ``cdn.example.com``: a specific ``ocrs-bot`` group (deny) shadows a
  permissive ``*`` group — group selection by agent specificity,
- ``mirror.example.com``: the specific group names a DIFFERENT bot;
  ocrs-bot falls through to the permissive ``*`` group.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import functions as F

from .urlnorm import url_normalized

AGENT = "ocrs-bot"

ROBOTS_BY_HOST = {
    "example.com": (
        "# corpus host\n"
        "User-agent: *\n"
        "Disallow: /doc/\n"
        "Allow: /doc/*2$\n"
    ),
    "cdn.example.com": (
        "User-agent: ocrs-bot\n"
        "Disallow: /assets/\n"
        "\n"
        "User-agent: *\n"
        "Allow: /\n"
    ),
    "mirror.example.com": (
        "User-agent: other-bot\n"
        "Disallow: /\n"
        "\n"
        "User-agent: *\n"
        "Allow: /\n"
    ),
}


def robots_table(spark):
    return spark.createDataFrame(
        sorted(ROBOTS_BY_HOST.items()), "host string, robots_txt string"
    )


def _eval_batches(batches):
    from ..robots import is_allowed

    for pdf in batches:
        paths = pdf["normalized_url"].str.replace(
            r"^[a-z]+://[^/]*", "", regex=True
        )
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "host": pdf["host"],
                "allowed": [
                    bool(is_allowed(r, AGENT, p))
                    for r, p in zip(pdf["robots_txt"], paths)
                ],
            }
        )


def robots_allowed(spark, sf_dir: str):
    """(doc_id, host, allowed) for every document URL, via a broadcast
    join of the per-host robots table onto the normalized URL stream."""
    urls = url_normalized(spark, sf_dir)
    joined = urls.join(F.broadcast(robots_table(spark)), "host", "left")
    out = joined.mapInPandas(
        _eval_batches, schema="doc_id bigint, host string, allowed boolean"
    )
    return out.select("doc_id", "host", "allowed")


# closed form: variants 0/3 live on example.com under /doc/<id> — the
# end-anchored Allow /doc/*2$ beats Disallow /doc/ exactly when the
# match target ends in 2. Matching runs against path PLUS query (the
# behavior of Google's reference parser), so variant 2 — whose
# normalized URL keeps ?id=..&ref=home — can never satisfy the $ anchor
# and is always disallowed. Variant 1 is the cdn host whose ocrs-bot
# group denies /assets/; variant 4 is the mirror host whose specific
# group names another bot, so ocrs-bot falls through to the open *.
ORACLE_ROBOTS_ALLOWED = """
SELECT doc_id,
  CASE CAST(doc_id % 5 AS INT)
   WHEN 1 THEN 'cdn.example.com'
   WHEN 4 THEN 'mirror.example.com'
   ELSE 'example.com'
  END AS host,
  CASE CAST(doc_id % 5 AS INT)
   WHEN 1 THEN FALSE
   WHEN 2 THEN FALSE
   WHEN 4 THEN TRUE
   ELSE (doc_id % 10 = 2)
  END AS allowed
FROM documents
"""


QUERIES = {"robots_allowed": robots_allowed}
ORACLES = {"robots_allowed": ORACLE_ROBOTS_ALLOWED}
