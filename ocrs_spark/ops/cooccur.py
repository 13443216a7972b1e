"""PMI collocation mining: corpus-level pointwise mutual information
over adjacent word pairs — the classic distributed corpus-analytics
job (phrase detection a la word2vec's phrase pass, stopword-pair
diagnostics, tokenizer-merge candidates).

PMI(a,b) = ln( (c_ab / B) / ((c_a / T) * (c_b / T)) ) with c_ab the
adjacent-bigram count, c_a/c_b unigram counts, B/T the corpus bigram/
token totals. Bigrams below MIN_COUNT are dropped (PMI is unstable on
rare pairs — the standard floor), and the result is the global top-K
by (rounded PMI, pair) — a total order, so the cut is deterministic.

Scale shape: two explode+groupBy passes (bigrams, unigrams) with
map-side partial combine on uniformly-hashed word keys; the unigram
table is vocabulary-bounded (Zipf) and broadcasts into the bigram
table, so the only corpus-sized shuffle is the bigram count itself;
totals ride along as 1-row broadcast cross joins (no driver
round-trip). The global top-K is Spark's TakeOrderedAndProject —
per-partition heaps merged on the driver, never a full sort. ln() and
round(4) are safe cross-engine at these magnitudes (the lmscore
precedent: fold-order noise is far below the rounding).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import load_tables

MIN_COUNT = 5
TOP_K = 50

_TOKENS = "filter(split(text, ' '), w -> w <> '')"


def pmi_top_collocations(
    docs: DataFrame, min_count: int = MIN_COUNT, k: int = TOP_K
) -> DataFrame:
    toks = docs.select(F.explode(F.expr(_TOKENS)).alias("w"))
    uni = toks.groupBy("w").agg(F.count("*").cast("long").alias("c"))
    tot_t = uni.agg(F.sum("c").alias("t_total"))

    # pair adjacent tokens via zip_with over two slices: the token array
    # is referenced a constant number of times per row — element_at(T,
    # i+2) inside a transform lambda would re-evaluate the whole
    # split+filter once PER TOKEN (Catalyst doesn't hoist common
    # subexpressions out of lambda bodies), an O(tokens^2) scan
    bi = docs.select(
        F.explode(
            F.expr(
                f"zip_with(slice({_TOKENS}, 1, greatest(size({_TOKENS}) - 1, 0)),"
                f" slice({_TOKENS}, 2, greatest(size({_TOKENS}) - 1, 0)),"
                f" (x, y) -> named_struct('a', x, 'b', y))"
            )
        ).alias("p")
    ).select("p.a", "p.b")
    bic = bi.groupBy("a", "b").agg(F.count("*").cast("long").alias("c_ab"))
    tot_b = bic.agg(F.sum("c_ab").alias("b_total"))

    ua = uni.select(F.col("w").alias("a"), F.col("c").alias("c_a"))
    ub = uni.select(F.col("w").alias("b"), F.col("c").alias("c_b"))
    scored = (
        bic.filter(F.col("c_ab") >= min_count)
        .join(F.broadcast(ua), "a")
        .join(F.broadcast(ub), "b")
        .crossJoin(F.broadcast(tot_b))
        .crossJoin(F.broadcast(tot_t))
        .select(
            "a",
            "b",
            "c_ab",
            F.round(
                F.log(
                    (F.col("c_ab") / F.col("b_total"))
                    / ((F.col("c_a") / F.col("t_total")) * (F.col("c_b") / F.col("t_total")))
                ),
                4,
            ).alias("pmi"),
        )
    )
    return scored.orderBy(
        F.col("pmi").desc(), F.col("a").asc(), F.col("b").asc()
    ).limit(k)


def pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    (docs,) = load_tables(spark, sf_dir, "documents")
    return pmi_top_collocations(docs)


_DUCK_TOKENS = "list_filter(string_split(text, ' '), w -> w <> '')"

ORACLE_PMI = f"""
WITH toks AS (
  SELECT unnest({_DUCK_TOKENS}) AS w FROM documents
),
uni AS (SELECT w, count(*)::BIGINT AS c FROM toks GROUP BY w),
tt AS (SELECT sum(c)::BIGINT AS t_total FROM uni),
bi AS (
  SELECT t[i] AS a, t[i + 1] AS b
  FROM (SELECT {_DUCK_TOKENS} AS t FROM documents),
       unnest(range(1, greatest(len(t), 1))) AS r(i)
),
bic AS (SELECT a, b, count(*)::BIGINT AS c_ab FROM bi GROUP BY a, b),
bt AS (SELECT sum(c_ab)::BIGINT AS b_total FROM bic)
SELECT a, b, c_ab,
       round(ln((c_ab::DOUBLE / b_total)
                / ((ua.c::DOUBLE / t_total) * (ub.c::DOUBLE / t_total))), 4)
         AS pmi
FROM bic
JOIN uni ua ON ua.w = a
JOIN uni ub ON ub.w = b
CROSS JOIN bt CROSS JOIN tt
WHERE c_ab >= {MIN_COUNT}
ORDER BY pmi DESC, a ASC, b ASC
LIMIT {TOP_K}
"""


QUERIES = {"pmi_collocations": pmi_collocations}
ORACLES = {"pmi_collocations": ORACLE_PMI}
