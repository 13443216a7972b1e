"""Graded retrieval quality: nDCG@K of the semantic ranking against
term-derived relevance labels — the standard offline eval a retrieval
stack runs before swapping rankers (RBO in ops/hybrid.py measures how
much two rankers AGREE; nDCG measures whether a ranker puts the
RELEVANT things first).

Relevance is induced deterministically from the corpus itself: a
document's grade for a query is the number of DISTINCT query terms it
contains (0..|terms|) — cheap, engine-reproducible, and genuinely
correlated with the lexical signal, so scoring the SEMANTIC ranking
against it is a real cross-signal evaluation, not a tautology.

Shape: grading is one filtered explode over the corpus (query-vocab
filter BEFORE the shuffle, the bm25 trick), the ideal ordering (IDCG)
is a per-query top-K window over only the rel>0 docs, and the ranking
join is (queries x K)-sized. DCG = sum (2^rel - 1)/log2(rank+1);
2^rel is exact integer, log2 of small integers is correctly rounded in
both engines, and the <=K-term sum rounds to 6 far above any last-ulp
noise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import load_tables
from .hybrid import TOP_K, semantic_search
from .retrieval import BM25_QUERIES

_WS = "filter(split(text, ' '), w -> w <> '')"


def _relevance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(query_id, doc_id, rel): distinct query terms present per doc,
    rel > 0 rows only."""
    (docs,) = load_tables(spark, sf_dir, "documents")
    qrows = [(qid, t) for qid, terms in BM25_QUERIES for t in terms]
    qterms = spark.createDataFrame(qrows, "query_id int, token string")
    all_terms = sorted({t for _, terms in BM25_QUERIES for t in terms})
    hits = (
        docs.select("doc_id", F.explode(F.array_distinct(F.expr(_WS))).alias("token"))
        .filter(F.col("token").isin(all_terms))
        .join(F.broadcast(qterms), "token")
        .groupBy("query_id", "doc_id")
        .agg(F.count("*").cast("int").alias("rel"))
    )
    return hits


def _gain(rel: str, rank: str) -> str:
    return f"(pow(2, {rel}) - 1) / log2({rank} + 1)"


def semantic_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(query_id, dcg, idcg, ndcg): nDCG@K of the semantic top-K."""
    rel = _relevance(spark, sf_dir)
    ranked = semantic_search(spark, sf_dir).withColumnRenamed("doc_id", "doc_id")
    dcg = (
        ranked.join(rel, ["query_id", "doc_id"], "left")
        .select(
            "query_id",
            F.expr(_gain("coalesce(rel, 0)", "rank")).alias("g"),
        )
        .groupBy("query_id")
        .agg(F.round(F.sum("g"), 6).alias("dcg"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("rel").desc(), F.col("doc_id").asc()
    )
    idcg = (
        rel.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", F.expr(_gain("rel", "rank")).alias("g"))
        .groupBy("query_id")
        .agg(F.round(F.sum("g"), 6).alias("idcg"))
    )
    return (
        dcg.join(idcg, "query_id")
        .select(
            "query_id",
            "dcg",
            "idcg",
            F.when(F.col("idcg") > 0, F.round(F.col("dcg") / F.col("idcg"), 6)).alias(
                "ndcg"
            ),
        )
    )


_Q_VALUES = ", ".join(
    f"({qid}, '{t}')" for qid, terms in BM25_QUERIES for t in terms
)
_ALL_TERMS = ", ".join(
    f"'{t}'" for t in sorted({t for _, terms in BM25_QUERIES for t in terms})
)
_N_Q = len(BM25_QUERIES)

ORACLE_NDCG = f"""
WITH qterms(query_id, token) AS (VALUES {_Q_VALUES}),
hits AS (
  SELECT query_id, doc_id, count(*)::INT AS rel
  FROM (
    SELECT DISTINCT doc_id, unnest(list_filter(string_split(text, ' '), w -> w <> '')) AS token
    FROM documents
  ) t
  JOIN qterms USING (token)
  WHERE token IN ({_ALL_TERMS})
  GROUP BY query_id, doc_id
),
sem_scored AS (
  SELECT q.vec_id AS query_id, e.vec_id AS doc_id,
         list_sum(list_transform(list_zip(e.embedding, q.embedding),
                                 z -> z[1]::DOUBLE * z[2]::DOUBLE))
         / (sqrt(list_sum(list_transform(e.embedding, x -> x::DOUBLE * x::DOUBLE)))
            * sqrt(list_sum(list_transform(q.embedding, x -> x::DOUBLE * x::DOUBLE))))
           AS cos
  FROM embeddings e CROSS JOIN embeddings q
  WHERE q.vec_id < {_N_Q}
),
sem AS (
  SELECT query_id, doc_id,
         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, doc_id ASC)
           AS rank
  FROM sem_scored
  QUALIFY rank <= {TOP_K}
),
dcg AS (
  SELECT s.query_id,
         round(sum((pow(2, coalesce(h.rel, 0)) - 1) / log2(s.rank + 1)), 6) AS dcg
  FROM sem s LEFT JOIN hits h ON h.query_id = s.query_id AND h.doc_id = s.doc_id
  GROUP BY s.query_id
),
ideal AS (
  SELECT query_id, rel,
         row_number() OVER (PARTITION BY query_id ORDER BY rel DESC, doc_id ASC)
           AS rank
  FROM hits
  QUALIFY rank <= {TOP_K}
),
idcg AS (
  SELECT query_id, round(sum((pow(2, rel) - 1) / log2(rank + 1)), 6) AS idcg
  FROM ideal GROUP BY query_id
)
SELECT d.query_id, d.dcg, i.idcg,
       CASE WHEN i.idcg > 0 THEN round(d.dcg / i.idcg, 6) END AS ndcg
FROM dcg d JOIN idcg i USING (query_id)
"""


QUERIES = {"semantic_ndcg": semantic_ndcg}
ORACLES = {"semantic_ndcg": ORACLE_NDCG}
