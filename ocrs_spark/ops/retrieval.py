"""Retrieval-side corpus ops: fixed-window document chunking (the
RAG/embedding-prep "split every document into overlapping token
windows" stage) and BM25 keyword retrieval (Robertson/Sparck-Jones
probabilistic ranking, the lexical-search baseline every corpus
tooling stack ships next to its ANN index).

Chunking is a pure per-row projection — tokens, integer chunk-count
arithmetic, one explode — so it rides the scan with no shuffle at all.

BM25 exploits that scoring only ever needs statistics for the QUERY
terms: document length is a projection (size of the token array, no
explode), and term frequencies come from one explode filtered to the
query vocabulary before any shuffle, so the grouped state is
O(matching docs x query terms), not O(corpus vocabulary). Query terms,
their document frequencies, and the corpus stats (N, avgdl) are all
tiny broadcast sides. At 100 TB this is exactly an inverted-index
probe: one filtered scan + small-key aggregations.

Numeric parity: idf/avgdl/tf-norms derive from integer counts through
identical expression trees, so they are bit-equal across engines;
per-(query, doc) scores sum <= |query| such terms and are rounded to 3
decimals on both sides before output.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from . import load_tables

CHUNK_W = 32  # window tokens
CHUNK_S = 24  # stride (overlap = W - S = 8)

BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOPK = 10
# (query_id, terms): deterministic lexical queries over the corpus vocab.
BM25_QUERIES = (
    (0, ("scan", "merge", "hash")),
    (1, ("spark", "query", "sort")),
    (2, ("customer", "filter")),
)

_WS = "filter(split(text, ' '), w -> w <> '')"


def chunk_documents(spark, sf_dir):
    """(doc_id, chunk_id, chunk_text, n_tokens): overlapping token
    windows of CHUNK_W tokens every CHUNK_S; short docs yield one
    chunk; the last window is allowed to run short rather than be
    re-anchored, so chunk starts are a pure function of length."""
    (docs,) = load_tables(spark, sf_dir, "documents")
    nc = (
        f"case when size({_WS}) <= {CHUNK_W} then 1 "
        f"else (size({_WS}) - {CHUNK_W} + {CHUNK_S} - 1) div {CHUNK_S} + 1 end"
    )
    chunks = (
        f"transform(sequence(0, {nc} - 1), j -> named_struct("
        f"'chunk_id', j, "
        f"'chunk_text', array_join(slice({_WS}, j * {CHUNK_S} + 1, {CHUNK_W}), ' '), "
        f"'n_tokens', size(slice({_WS}, j * {CHUNK_S} + 1, {CHUNK_W}))))"
    )
    return docs.select("doc_id", F.explode(F.expr(chunks)).alias("c")).select(
        "doc_id",
        F.col("c.chunk_id").cast("int").alias("chunk_id"),
        F.col("c.chunk_text").alias("chunk_text"),
        F.col("c.n_tokens").cast("long").alias("n_tokens"),
    )


def bm25_search(spark, sf_dir):
    """(query_id, doc_id, rank, score): BM25 top-K documents per query."""
    (docs,) = load_tables(spark, sf_dir, "documents")
    base = docs.select("doc_id", F.expr(_WS).alias("ws")).select(
        "doc_id", "ws", F.size("ws").cast("long").alias("dl")
    )
    stats = base.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )
    qrows = [(qid, t) for qid, terms in BM25_QUERIES for t in terms]
    qterms = spark.createDataFrame(qrows, "query_id int, token string")
    all_terms = sorted({t for _, terms in BM25_QUERIES for t in terms})
    tf = (
        base.select("doc_id", "dl", F.explode("ws").alias("token"))
        .filter(F.col("token").isin(all_terms))
        .groupBy("doc_id", "dl", "token")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    dft = tf.groupBy("token").agg(F.count("*").cast("long").alias("df"))
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    tfn = (F.col("tf") * (BM25_K1 + 1)) / (
        F.col("tf")
        + BM25_K1 * (1 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
    )
    scored = (
        tf.join(F.broadcast(qterms), "token")
        .join(F.broadcast(dft), "token")
        .crossJoin(F.broadcast(stats))
        .select("query_id", "doc_id", (idf * tfn).alias("s"))
        .groupBy("query_id", "doc_id")
        .agg(F.round(F.sum("s"), 3).alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= BM25_TOPK)
        .select("query_id", "doc_id", F.col("rank").cast("int").alias("rank"), "score")
    )


_DUCK_WS = "list_filter(string_split(text, ' '), w -> w <> '')"

ORACLE_CHUNKS = f"""
WITH w AS (
  SELECT doc_id, {_DUCK_WS} AS ws,
         CASE WHEN len({_DUCK_WS}) <= {CHUNK_W} THEN 1
              ELSE (len({_DUCK_WS}) - {CHUNK_W} + {CHUNK_S} - 1) // {CHUNK_S} + 1
         END AS nc
  FROM documents
)
SELECT doc_id,
       j::INT AS chunk_id,
       array_to_string(ws[j * {CHUNK_S} + 1 : j * {CHUNK_S} + {CHUNK_W}], ' ') AS chunk_text,
       len(ws[j * {CHUNK_S} + 1 : j * {CHUNK_S} + {CHUNK_W}])::BIGINT AS n_tokens
FROM w, unnest(range(0, nc)) AS t(j)
"""

_Q_VALUES = ", ".join(
    f"({qid}, '{t}')" for qid, terms in BM25_QUERIES for t in terms
)
_ALL_TERMS = ", ".join(
    f"'{t}'" for t in sorted({t for _, terms in BM25_QUERIES for t in terms})
)

ORACLE_BM25 = f"""
WITH base AS (
  SELECT doc_id, {_DUCK_WS} AS ws, len({_DUCK_WS})::BIGINT AS dl FROM documents
),
stats AS (SELECT count(*)::BIGINT AS n_docs, avg(dl) AS avgdl FROM base),
q(query_id, token) AS (VALUES {_Q_VALUES}),
tf AS (
  SELECT doc_id, dl, token, count(*)::BIGINT AS tf
  FROM (SELECT doc_id, dl, unnest(ws) AS token FROM base)
  WHERE token IN ({_ALL_TERMS})
  GROUP BY doc_id, dl, token
),
dft AS (SELECT token, count(*)::BIGINT AS df FROM tf GROUP BY token),
scored AS (
  SELECT q.query_id, tf.doc_id,
         round(sum(
           ln((s.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0)
           * (tf.tf * ({BM25_K1} + 1))
           / (tf.tf + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * tf.dl / s.avgdl))
         ), 3) AS score
  FROM tf
  JOIN q USING (token)
  JOIN dft d USING (token)
  CROSS JOIN stats s
  GROUP BY q.query_id, tf.doc_id
)
SELECT query_id::INT AS query_id, doc_id, rank::INT AS rank, score
FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY score DESC, doc_id ASC) AS rank
      FROM scored)
WHERE rank <= {BM25_TOPK}
"""

QUERIES = {"chunk_documents": chunk_documents, "bm25_search": bm25_search}
ORACLES = {"chunk_documents": ORACLE_CHUNKS, "bm25_search": ORACLE_BM25}
