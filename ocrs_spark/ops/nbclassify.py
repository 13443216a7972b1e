"""Distributed multinomial Naive Bayes document classifier — the
fastText/CCNet-style "train a cheap classifier on weak labels, score
the whole corpus" pipeline stage (CCNet uses exactly this family to
pick in-domain text; GPT-3's WebText quality filter is the same shape
with logistic regression).

Training IS one aggregation pass: the model is nothing but grouped
token counts — per-class token totals (likelihoods), per-class doc
counts (priors), and the vocabulary size (Laplace smoothing) — so the
"fit" is a groupBy over the exploded corpus and never leaves the
cluster. Scoring joins each document's tokens against the (small,
vocabulary-sized, broadcast) likelihood table and sums log-probs per
(doc, class). No driver-side model collection at all: priors and V
flow through the plan as one-row/three-row broadcast joins.

Weak labels come from the marker-lexicon language ID
(textstats.lang_id_markers): docs with at least one marker hit are the
training set; the NB model then classifies EVERY doc from its full
token distribution — including the 'und' docs the heuristic could not
label. Output emits only the argmax class, never a float score: class
log-likelihood sums differ by O(1) per informative token, so the
argmax is stable under float64 summation-order noise (~1e-13), which
is what makes the row hash-comparable across engines.

100 TB shape: explode + two groupBys (uniform token keys), the
likelihood/prior sides are vocabulary-sized broadcasts, and the final
per-doc argmax is a doc_id-partitioned window — no corpus-scale
shuffle beyond the token groupBys a word-count already pays.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from . import load_tables
from .textstats import ORACLE_LANG_ID, lang_id_markers


def nb_lang_classifier(spark, sf_dir):
    """(doc_id, nb_lang, marker_lang, agree) for every document."""
    (docs,) = load_tables(spark, sf_dir, "documents")
    labels = lang_id_markers(spark, sf_dir).select(
        "doc_id", F.col("pred_lang").alias("marker_lang")
    )
    ws = F.expr("filter(split(text, ' '), w -> w <> '')")
    tok = docs.select("doc_id", F.explode(ws).alias("token"))
    train = tok.join(
        labels.filter(F.col("marker_lang") != "und"), "doc_id"
    ).select(F.col("marker_lang").alias("lang"), "doc_id", "token")

    cls = train.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_c"),
        F.countDistinct("doc_id").cast("long").alias("docs_c"),
    )
    tot = cls.agg(F.sum("docs_c").cast("long").alias("total_docs"))
    voc = train.agg(F.countDistinct("token").cast("long").alias("v"))
    # 3 rows x (prior, unseen-token default): the entire "model" header.
    cls3 = (
        cls.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(voc))
        .select(
            "lang",
            F.log(F.col("docs_c").cast("double") / F.col("total_docs")).alias(
                "logprior"
            ),
            F.log(F.lit(1.0) / (F.col("n_c") + F.col("v")).cast("double")).alias(
                "logdefault"
            ),
            "n_c",
            "v",
        )
    )
    lik = (
        train.groupBy("lang", "token")
        .agg(F.count("*").cast("long").alias("cnt"))
        .join(cls3.select("lang", "n_c", "v"), "lang")
        .select(
            "lang",
            "token",
            F.log(
                (F.col("cnt") + 1).cast("double")
                / (F.col("n_c") + F.col("v")).cast("double")
            ).alias("loglik"),
        )
    )
    scored = (
        tok.crossJoin(F.broadcast(cls3.select("lang", "logprior", "logdefault")))
        .join(F.broadcast(lik), ["lang", "token"], "left")
        .groupBy("doc_id", "lang", "logprior")
        .agg(F.sum(F.coalesce("loglik", "logdefault")).alias("s"))
        .select("doc_id", "lang", (F.col("logprior") + F.col("s")).alias("score"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("lang"))
    best = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("lang").alias("nb"))
    )
    # Docs with no tokens never enter `tok`; they classify as 'und',
    # matching the marker heuristic's no-evidence verdict.
    return labels.join(best, "doc_id", "left").select(
        "doc_id",
        F.coalesce("nb", F.lit("und")).alias("nb_lang"),
        "marker_lang",
        (F.coalesce("nb", F.lit("und")) == F.col("marker_lang")).alias("agree"),
    )


ORACLE_NB = f"""
WITH lab AS (SELECT doc_id, pred_lang AS marker_lang FROM ({ORACLE_LANG_ID})),
w AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws
      FROM documents),
tok AS (SELECT doc_id, unnest(ws) AS token FROM w),
train AS (
  SELECT l.marker_lang AS lang, t.doc_id, t.token
  FROM tok t JOIN lab l USING (doc_id) WHERE l.marker_lang <> 'und'
),
cls AS (SELECT lang, count(*)::BIGINT AS n_c,
               count(DISTINCT doc_id)::BIGINT AS docs_c
        FROM train GROUP BY lang),
tot AS (SELECT sum(docs_c)::BIGINT AS total_docs FROM cls),
voc AS (SELECT count(DISTINCT token)::BIGINT AS v FROM train),
cls3 AS (
  SELECT lang,
         ln(docs_c::DOUBLE / total_docs::DOUBLE) AS logprior,
         ln(1.0 / (n_c + v)::DOUBLE) AS logdefault,
         n_c, v
  FROM cls CROSS JOIN tot CROSS JOIN voc
),
lik AS (
  SELECT g.lang, g.token,
         ln((g.cnt + 1)::DOUBLE / (c.n_c + c.v)::DOUBLE) AS loglik
  FROM (SELECT lang, token, count(*)::BIGINT AS cnt
        FROM train GROUP BY lang, token) g
  JOIN cls3 c USING (lang)
),
scored AS (
  SELECT t.doc_id, c.lang,
         c.logprior + sum(coalesce(k.loglik, c.logdefault)) AS score
  FROM tok t CROSS JOIN cls3 c
  LEFT JOIN lik k ON k.lang = c.lang AND k.token = t.token
  GROUP BY t.doc_id, c.lang, c.logprior
),
best AS (
  SELECT doc_id, lang FROM (
    SELECT doc_id, lang,
           row_number() OVER (PARTITION BY doc_id
                              ORDER BY score DESC, lang ASC) AS rn
    FROM scored
  ) WHERE rn = 1
)
SELECT l.doc_id,
       coalesce(b.lang, 'und') AS nb_lang,
       l.marker_lang,
       (coalesce(b.lang, 'und') = l.marker_lang) AS agree
FROM lab l LEFT JOIN best b USING (doc_id)
"""

QUERIES = {"nb_lang_classifier": nb_lang_classifier}
ORACLES = {"nb_lang_classifier": ORACLE_NB}
