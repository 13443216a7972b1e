"""Hybrid retrieval: reciprocal rank fusion (RRF) of the BM25 lexical
ranking and the embedding-cosine semantic ranking — the fusion step
every production RAG stack runs over its keyword + vector indexes
(Cormack et al. SIGIR 2009: RRF(d) = sum over retrievers of
1/(K + rank_r(d)), K=60, robust to incomparable score scales because
it only consumes RANKS).

Scale shape: both input rankings are already top-K-per-query tables
(BM25 = filtered-scan inverted-index probe, semantic = broadcast-query
cosine top-k), so the fusion is a full-outer equi-join of two
(queries x K)-sized tables plus one rank window — driver-trivial here,
and at 10^6 queries still just a join on (query_id, doc_id) with
map-side-combinable inputs. The RRF arithmetic is sums of exact
dyadic-free rationals 1/(K + r) computed identically on both engines
(two correctly-rounded divisions and one add — no fold-order exposure),
rounded to 6.

The semantic leg keys query_id into the embeddings table (query 0..2 =
vec_id 0..2 — the same ids the BM25_QUERIES carry), so the two
retrievers genuinely disagree and the fused list differs from both:
pytest pins a case where a doc outside either top-3 wins on fusion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import load_tables
from .retrieval import BM25_QUERIES, ORACLE_BM25, bm25_search
from .similarity import _cos_expr

RRF_K = 60
TOP_K = 10
_N_Q = len(BM25_QUERIES)



def semantic_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(query_id, doc_id, rank): cosine top-K of the embeddings table
    against query vectors vec_id < len(BM25_QUERIES)."""
    (emb,) = load_tables(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < _N_Q).select(
        F.col("vec_id").cast("int").alias("query_id"), F.col("embedding").alias("qe")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("doc_id").asc()
    )
    return (
        emb.crossJoin(F.broadcast(q))
        .select("query_id", F.col("vec_id").alias("doc_id"), F.expr(_cos_expr("embedding", "qe")).alias("cos"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "doc_id", F.col("rank").cast("int").alias("rank"))
    )


def hybrid_rrf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(query_id, doc_id, fused_rank, rrf_score): RRF fusion of BM25
    and semantic top-K lists."""
    lex = bm25_search(spark, sf_dir).select(
        "query_id", "doc_id", F.col("rank").alias("lex_rank")
    )
    sem = semantic_search(spark, sf_dir).select(
        "query_id", "doc_id", F.col("rank").alias("sem_rank")
    )
    fused = (
        lex.join(sem, ["query_id", "doc_id"], "full_outer")
        .withColumn(
            "rrf_score",
            F.round(
                F.coalesce(1.0 / (RRF_K + F.col("lex_rank")), F.lit(0.0))
                + F.coalesce(1.0 / (RRF_K + F.col("sem_rank")), F.lit(0.0)),
                6,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("rrf_score").desc(), F.col("doc_id").asc()
    )
    return (
        fused.withColumn("fused_rank", F.row_number().over(w))
        .filter(F.col("fused_rank") <= TOP_K)
        .select(
            "query_id",
            "doc_id",
            F.col("fused_rank").cast("int").alias("fused_rank"),
            "rrf_score",
        )
    )


ORACLE_HYBRID_RRF = f"""
WITH lex AS (
  SELECT query_id, doc_id, rank AS lex_rank FROM ({ORACLE_BM25})
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
           AS sem_rank
  FROM sem_scored
  QUALIFY sem_rank <= {TOP_K}
),
fused AS (
  SELECT query_id, doc_id,
         round(coalesce(1.0 / ({RRF_K} + lex_rank), 0)
               + coalesce(1.0 / ({RRF_K} + sem_rank), 0), 6) AS rrf_score
  FROM lex FULL OUTER JOIN sem USING (query_id, doc_id)
)
SELECT query_id, doc_id,
       row_number() OVER (PARTITION BY query_id
                          ORDER BY rrf_score DESC, doc_id ASC)::INT AS fused_rank,
       rrf_score
FROM fused
QUALIFY fused_rank <= {TOP_K}
"""


# --- Rank-biased overlap (Webber et al., TOIS 2010) between the two
# retrievers: how much do the lexical and semantic rankings agree, with
# top-weighted emphasis (p=0.9)? Truncated RBO@K decomposes PER DOC:
# a doc in both lists contributes (1-p) * sum_{d=max(r1,r2)}^{K}
# p^(d-1)/d — a function of its max rank only — so the whole metric is
# one equi-join of the two top-K tables plus a groupBy(query): no
# prefix re-materialization at any depth. The K weights are computed
# once in Python and inlined as IDENTICAL double literals in the Spark
# expression and the DuckDB SQL, so both engines sum the same exact
# doubles in a <=K-term fold (rounded to 6 far above any fold noise).

RBO_P = 0.9


def _rbo_weights(k: int = TOP_K, p: float = RBO_P) -> list:
    """weight[m-1] = (1-p) * sum_{d=m}^{k} p^(d-1)/d."""
    tail = 0.0
    out = [0.0] * k
    for d in range(k, 0, -1):
        tail += p ** (d - 1) / d
        out[d - 1] = (1 - p) * tail
    return out


def ranking_agreement_rbo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(query_id, rbo): truncated RBO@K between BM25 and semantic."""
    w = _rbo_weights()
    # r6: landed once — the lexical top-K feeds BOTH the overlap join
    # and the all-queries frame; un-checkpointed, the whole BM25
    # subtree (tokenize + tf/idf joins + rank window) executed twice.
    lex = (
        bm25_search(spark, sf_dir)
        .select("query_id", "doc_id", F.col("rank").alias("r1"))
        .localCheckpoint()
    )
    sem = semantic_search(spark, sf_dir).select(
        "query_id", "doc_id", F.col("rank").alias("r2")
    )
    cases = " ".join(
        f"WHEN {m + 1} THEN cast({w[m]!r} as double)" for m in range(TOP_K)
    )
    contrib = F.expr(f"CASE greatest(r1, r2) {cases} ELSE 0.0 END")
    overlap = (
        lex.join(sem, ["query_id", "doc_id"])
        .select("query_id", contrib.alias("c"))
        .groupBy("query_id")
        .agg(F.round(F.sum("c"), 6).alias("rbo"))
    )
    # a query whose lists share no documents has RBO 0, not a missing row
    all_q = lex.select("query_id").distinct()
    return all_q.join(overlap, "query_id", "left").select(
        "query_id", F.coalesce("rbo", F.lit(0.0)).alias("rbo")
    )


def _rbo_oracle() -> str:
    w = _rbo_weights()
    cases = " ".join(f"WHEN {m + 1} THEN {w[m]!r}" for m in range(TOP_K))
    return f"""
WITH lex AS (
  SELECT query_id, doc_id, rank AS r1 FROM ({ORACLE_BM25})
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
           AS r2
  FROM sem_scored
  QUALIFY r2 <= {TOP_K}
)
, overlap AS (
  SELECT query_id,
         round(sum(CASE greatest(r1, r2) {cases} ELSE 0.0 END), 6) AS rbo
  FROM lex JOIN sem USING (query_id, doc_id)
  GROUP BY query_id
)
SELECT q.query_id, coalesce(o.rbo, 0.0) AS rbo
FROM (SELECT DISTINCT query_id FROM lex) q
LEFT JOIN overlap o USING (query_id)
"""


ORACLE_RBO = _rbo_oracle()

QUERIES = {
    "hybrid_rrf_search": hybrid_rrf_search,
    "ranking_agreement_rbo": ranking_agreement_rbo,
}
ORACLES = {
    "hybrid_rrf_search": ORACLE_HYBRID_RRF,
    "ranking_agreement_rbo": ORACLE_RBO,
}
