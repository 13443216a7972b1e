"""Percolation: match a registry of STORED conjunctive queries against
every document — the reverse of search, and the shape alerting /
saved-search / routing systems run at ingest (Elasticsearch's
percolator, Google's standing-query alerters).

Queries are synthesized deterministically from the corpus itself (no
external data): the top 2*N_QUERIES tokens by document frequency with
a total tie-break (df desc, token asc) pair up as N_QUERIES two-term
AND queries — high-df terms keep every query non-vacuous at any SF.

Semantics: document d matches query q iff EVERY term of q occurs in d
(conjunctive containment). Proven by counting: distinct matched terms
per (doc, query) == the query's term count.

Scale: the query registry is BOUNDED (a saved-search table, thousands
of rows at most), so it broadcasts into the exploded token stream —
the corpus-scale work is one explode + per-doc distinct + broadcast
hash join + two counted groupBys. No posting-list materialization, no
self-join; a doc's cost is proportional to its matched terms only.
The per-query output row carries match counts + id bounds, never the
match list itself.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from . import load_tables

N_QUERIES = 20  # stored queries; 2 terms each


def _doc_token_arrays(docs):
    # Conjunctive matching is per distinct term: dedup tokens per doc
    # BEFORE the join so a repeated term can't double-count. Kept as
    # doc-granular ARRAYS (not exploded) so the caller can checkpoint
    # one compact row per doc and explode twice for free.
    return docs.select(
        "doc_id",
        F.array_distinct(F.expr("filter(split(text, ' '), w -> w <> '')")).alias(
            "toks"
        ),
    )


def _doc_distinct_tokens(docs):
    return _explode_tokens(_doc_token_arrays(docs))


def _explode_tokens(arrays):
    return arrays.select(
        "doc_id", F.explode_outer("toks").alias("token")
    ).where(F.col("token").isNotNull())


def _query_registry(docs):
    """(qid, term) — N_QUERIES two-term AND queries from the top-2N
    document-frequency tokens, totally ordered (df desc, token asc).
    The top-2N select is a TakeOrdered over the token-df aggregate and
    the result is COLLECTED (bounded by the registry size, never the
    corpus — the same bounded-model shape as the IVF centroids), so
    the corpus-scale df aggregate runs exactly once however many
    branches consume the registry."""
    return _registry_from_tokens(docs.sparkSession, _doc_distinct_tokens(docs))


def _registry_from_tokens(spark, toks):
    top = (
        toks.groupBy("token")
        .agg(F.count("*").cast("long").alias("df"))
        .orderBy(F.col("df").desc(), F.col("token").asc())
        .limit(2 * N_QUERIES)
        .collect()
    )
    # Only FULL pairs form queries: a corpus with an odd distinct-token
    # count (or fewer than 2*N_QUERIES tokens) must not leave a
    # dangling one-term query that can never satisfy the 2-term
    # conjunction.
    n_pairs = len(top) // 2
    rows = [
        (r // 2, rec["token"])
        for r, rec in enumerate(top[: 2 * n_pairs])
    ]
    return spark.createDataFrame(rows, "qid long, token string")


def percolate_matches(spark, sf_dir: str):
    """(qid, term_a, term_b, n_matched, min_doc, max_doc) per stored
    query — the alerting digest a standing-query system emits per
    ingest batch."""
    (docs,) = load_tables(spark, sf_dir, "documents")
    # The tokenize+dedup pass feeds TWO jobs — the registry collect and
    # the match join — which exchange reuse can never span. Checkpoint
    # the doc-granular token arrays once; both consumers explode from
    # the materialized rows (guide §5).
    arrays = _doc_token_arrays(docs).localCheckpoint(eager=True)
    toks = _explode_tokens(arrays)
    registry = _registry_from_tokens(spark, toks)
    hits = toks.join(F.broadcast(registry), "token")
    per_doc_q = hits.groupBy("doc_id", "qid").agg(
        F.count("*").cast("long").alias("n_terms_hit")
    )
    matched = per_doc_q.where(F.col("n_terms_hit") == 2)
    per_q = matched.groupBy("qid").agg(
        F.count("*").cast("long").alias("n_matched"),
        F.min("doc_id").cast("long").alias("min_doc"),
        F.max("doc_id").cast("long").alias("max_doc"),
    )
    terms = registry.groupBy("qid").agg(
        F.min("token").alias("term_a"), F.max("token").alias("term_b")
    )
    # Zero-match queries still get a row (n_matched = 0, id bounds -1):
    # an alerting registry reports silence explicitly, and the -1
    # sentinel keeps the bound columns non-null (dtype-stable across
    # engines' pandas bridges).
    out = terms.join(per_q, "qid", "left")
    return out.select(
        "qid",
        "term_a",
        "term_b",
        F.coalesce("n_matched", F.lit(0)).cast("long").alias("n_matched"),
        F.coalesce("min_doc", F.lit(-1)).cast("long").alias("min_doc"),
        F.coalesce("max_doc", F.lit(-1)).cast("long").alias("max_doc"),
    )


ORACLE_PERCOLATE = f"""
WITH tok AS (
  SELECT DISTINCT doc_id, unnest(
           list_filter(string_split(text, ' '), w -> w <> '')
         ) AS token
  FROM documents
),
dfc AS (
  SELECT token, count(*)::BIGINT AS df FROM tok GROUP BY token
),
ranked AS (
  SELECT token,
         row_number() OVER (ORDER BY df DESC, token ASC) - 1 AS r
  FROM dfc
  ORDER BY df DESC, token ASC
  LIMIT {2 * N_QUERIES}
),
reg AS (
  SELECT (r // 2)::BIGINT AS qid, token FROM ranked
  WHERE r < 2 * ((SELECT count(*) FROM ranked) // 2)
),
hits AS (
  SELECT t.doc_id, g.qid, count(*)::BIGINT AS n_terms_hit
  FROM tok t JOIN reg g USING (token)
  GROUP BY t.doc_id, g.qid
),
matched AS (SELECT * FROM hits WHERE n_terms_hit = 2),
per_q AS (
  SELECT qid, count(*)::BIGINT AS n_matched,
         min(doc_id)::BIGINT AS min_doc, max(doc_id)::BIGINT AS max_doc
  FROM matched GROUP BY qid
),
terms AS (
  SELECT qid, min(token) AS term_a, max(token) AS term_b
  FROM reg GROUP BY qid
)
SELECT t.qid, t.term_a, t.term_b,
       COALESCE(p.n_matched, 0)::BIGINT AS n_matched,
       COALESCE(p.min_doc, -1)::BIGINT AS min_doc,
       COALESCE(p.max_doc, -1)::BIGINT AS max_doc
FROM terms t LEFT JOIN per_q p USING (qid)
"""


QUERIES = {"percolate_matches": percolate_matches}
ORACLES = {"percolate_matches": ORACLE_PERCOLATE}
