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
likelihood table pivoted to ONE row per token with a column per class
so the corpus-side join happens once (no |classes|-times row blowup
before the shuffle), and the per-doc argmax is a column-wise
expression over the per-class sums — no window, no extra exchange
beyond the token groupBys a word-count already pays.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from . import load_tables
from .textstats import LEXICONS, ORACLE_LANG_ID, lang_id_markers


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
    # One corpus-side join instead of a |classes|-times row blowup: the
    # likelihood table pivots to one row per token with a column per
    # class, so the scan's exploded tokens are joined ONCE (broadcast)
    # and each class score is a separate sum over the same rows — 3x
    # less shuffle input at any corpus size. Class membership is static
    # (LEXICONS keys), so the wide schema is known at plan build.
    langs = sorted(LEXICONS)
    lik_wide = lik.groupBy("token").pivot("lang", langs).agg(F.first("loglik"))
    # The model header (one row: per-class prior + unseen-token default)
    # also stays in the plan — a 1-row broadcast cross join, no collect.
    hdr_wide = cls3.groupBy().pivot("lang", langs).agg(
        F.first("logprior").alias("p"), F.first("logdefault").alias("d")
    )
    joined = (
        tok.join(F.broadcast(lik_wide), "token", "left")
        .crossJoin(F.broadcast(hdr_wide))
    )
    sums = joined.groupBy("doc_id").agg(
        *[
            F.sum(F.coalesce(F.col(l), F.col(f"{l}_d"))).alias(f"s_{l}")
            for l in langs
        ],
        *[F.first(f"{l}_p").alias(f"p_{l}") for l in langs],
    )
    # argmax with smallest-lang tie-break: max over (score, -index).
    terms = ", ".join(
        f"named_struct('score', s_{l} + p_{l}, 'negidx', {-i})"
        for i, l in enumerate(langs)
    )
    pick = F.expr(f"-array_max(array({terms})).negidx").cast("int")
    nb_expr = F.when(pick == 0, F.lit(langs[0]))
    for i, l in enumerate(langs[1:], start=1):
        nb_expr = nb_expr.when(pick == i, F.lit(l))
    best = sums.select("doc_id", nb_expr.alias("nb"))
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
