"""URL-pattern parallel-document pairing — the structural bitext miner
that predates embedding methods (STRAND, Resnik & Smith 2003; how the
WMT crawls seed candidate pairs): two URLs that differ ONLY in their
language path segment ("/en/article/42" vs "/fr/article/42") almost
certainly hold translations of the same page. This is the cheap
high-precision candidate generator upstream of ``ops/bitext.py``'s
margin-based scorer: URL pairing proposes, margin scoring disposes.

The Spark side must actually PARSE the language segment and the
language-independent article path out of the URL string (regexp
expressions — the planted corpus derives each doc's URL from its
``lang`` column and a shared article id), then self-join English
pages against non-English pages on the stripped path. The oracle
rebuilds both sides closed-form from the table columns and never
sees a URL string.

Scale: one equi-join on article_path whose key multiplicity is
bounded by the number of languages a site publishes (single digits)
— no skew, no explosion; the English side is the smaller filtered
branch and broadcasts when it fits. Everything else is codegen
expressions fused into the scan.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from . import load_tables

ARTICLE_GROUP = 5  # article id = doc_id div 5: consecutive docs share
                   # an article across whatever languages they carry
PIVOT_LANG = "en"


def _planted_urls(docs):
    return docs.select(
        "doc_id",
        "lang",
        F.concat(
            F.lit("https://site.example/"),
            F.col("lang"),
            F.lit("/article/"),
            F.expr(f"doc_id div {ARTICLE_GROUP}"),
        ).alias("url"),
    )


def url_parallel_pairs(spark, sf_dir: str):
    """(article_path, en_doc, other_doc, other_lang) — candidate
    translation pairs: an English page joined to every same-article
    page in another language, keyed on the language-stripped path."""
    (docs,) = load_tables(spark, sf_dir, "documents")
    parsed = _planted_urls(docs).select(
        "doc_id",
        F.regexp_extract("url", r"^https://[^/]+/([a-z]{2})/", 1).alias(
            "url_lang"
        ),
        F.regexp_replace(
            "url", r"^(https://[^/]+)/[a-z]{2}/", r"$1/"
        ).alias("article_path"),
    )
    en = parsed.filter(F.col("url_lang") == PIVOT_LANG).select(
        F.col("article_path"), F.col("doc_id").alias("en_doc")
    )
    other = parsed.filter(F.col("url_lang") != PIVOT_LANG).select(
        F.col("article_path"),
        F.col("doc_id").alias("other_doc"),
        F.col("url_lang").alias("other_lang"),
    )
    return en.join(other, "article_path").select(
        "article_path", "en_doc", "other_doc", "other_lang"
    )


def _oracle_sql() -> str:
    return f"""
WITH parsed AS (
  SELECT doc_id, lang,
         'https://site.example/article/' || (doc_id // {ARTICLE_GROUP})
           AS article_path
  FROM documents
)
SELECT e.article_path, e.doc_id AS en_doc,
       o.doc_id AS other_doc, o.lang AS other_lang
FROM parsed e JOIN parsed o ON o.article_path = e.article_path
WHERE e.lang = '{PIVOT_LANG}' AND o.lang <> '{PIVOT_LANG}'
"""


QUERIES = {"url_parallel_pairs": url_parallel_pairs}
ORACLES = {"url_parallel_pairs": _oracle_sql()}
