"""Positional inverted-index construction + exact phrase search — the
index-build sink behind every search/RAG stack (bm25_search computes
tf/df transiently inside one query; this op MATERIALIZES the index,
and the phrase query proves the positions are real by consuming them).

Layout is deliberately relational, one row per (token, doc): at
10^12 documents a stop-word's posting list is billions of entries —
representable as rows partitioned by token hash, NOT as one
collect_list array row (which would concentrate a hot token's entire
posting list in a single struct). Within-doc positions ARE bounded
(document length), so they pack into one sorted CSV cell per posting
— the classic block layout. The build is one posexplode + one
(token, doc_id) groupBy with map-side combine; nothing shuffles
positions twice.

Phrase search: for phrase "w1 w2", a doc matches where some position
p of w1 has p+1 among w2's positions — set intersection of two
per-doc position arrays. The token predicate is applied BELOW the
aggregate (right after the explode), so the corpus-scale shuffle
carries only the two query tokens' occurrences — the plan-side
equivalent of fetching two posting lists from the index. Positions
are 1-based in both engines (Spark posexplode + 1 vs DuckDB
generate_subscripts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import load_tables

_TOKS = "filter(split(text, ' '), w -> w <> '')"

# Fixed showpiece phrase: the synthetic corpus's most frequent bigram.
PHRASE = ("order", "fast")


def _positions(docs: DataFrame) -> DataFrame:
    """(doc_id, token, pos) with 1-based positions over the filtered
    token sequence."""
    return docs.select(
        "doc_id", F.posexplode(F.expr(_TOKS)).alias("pos0", "token")
    ).select("doc_id", "token", (F.col("pos0") + 1).alias("pos"))


def postings_over(docs: DataFrame) -> DataFrame:
    """(token, doc_id, tf, positions_csv) posting rows."""
    return (
        _positions(docs)
        .groupBy("token", "doc_id")
        .agg(
            F.count("*").cast("long").alias("tf"),
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list("pos")),
                    lambda p: p.cast("string"),
                ),
                ",",
            ).alias("positions_csv"),
        )
    )


def inverted_postings(spark, sf_dir):
    (docs,) = load_tables(spark, sf_dir, "documents")
    return postings_over(docs)


def phrase_match_over(docs: DataFrame, w1: str, w2: str) -> DataFrame:
    """(doc_id, n_occurrences) for the exact phrase "w1 w2"."""
    pos = _positions(docs).filter(F.col("token").isin(w1, w2))
    lists = pos.groupBy("doc_id", "token").agg(
        F.sort_array(F.collect_list("pos")).alias("ps")
    )
    a = lists.filter(F.col("token") == w1).select("doc_id", F.col("ps").alias("pa"))
    b = lists.filter(F.col("token") == w2).select("doc_id", F.col("ps").alias("pb"))
    n = F.size(
        F.array_intersect(
            F.transform(F.col("pa"), lambda p: p + F.lit(1)), F.col("pb")
        )
    )
    return (
        a.join(b, "doc_id")
        .select("doc_id", n.cast("long").alias("n_occurrences"))
        .filter(F.col("n_occurrences") > 0)
    )


def phrase_match_docs(spark, sf_dir):
    (docs,) = load_tables(spark, sf_dir, "documents")
    return phrase_match_over(docs, *PHRASE)


_DUCK_POSITIONS = """
  SELECT doc_id, unnest(ws) AS token, generate_subscripts(ws, 1) AS pos
  FROM (SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS ws
        FROM documents)
"""

ORACLE_POSTINGS = f"""
WITH tokp AS ({_DUCK_POSITIONS})
SELECT token, doc_id, count(*)::BIGINT AS tf,
       array_to_string(list(pos ORDER BY pos), ',') AS positions_csv
FROM tokp GROUP BY token, doc_id
"""

ORACLE_PHRASE = f"""
WITH tokp AS ({_DUCK_POSITIONS}),
lists AS (
  SELECT doc_id, token, list(pos ORDER BY pos) AS ps
  FROM tokp WHERE token IN ('{PHRASE[0]}', '{PHRASE[1]}')
  GROUP BY doc_id, token
),
m AS (
  SELECT a.doc_id,
         len(list_intersect([p + 1 FOR p IN a.ps], b.ps))::BIGINT
           AS n_occurrences
  FROM lists a JOIN lists b USING (doc_id)
  WHERE a.token = '{PHRASE[0]}' AND b.token = '{PHRASE[1]}'
)
SELECT doc_id, n_occurrences FROM m WHERE n_occurrences > 0
"""

QUERIES = {
    "inverted_postings": inverted_postings,
    "phrase_match_docs": phrase_match_docs,
}
ORACLES = {
    "inverted_postings": ORACLE_POSTINGS,
    "phrase_match_docs": ORACLE_PHRASE,
}
