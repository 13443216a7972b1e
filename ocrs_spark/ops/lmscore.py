"""N-gram language-model perplexity scoring — the KenLM-style quality
filter (CCNet, Wenzek et al. 2020): score each document's fluency
under a word-bigram model with additive smoothing, trained on the
corpus itself in one distributed pass.

Training IS aggregation: the bigram table is an explode + groupBy
(map-side partial combine), LHS totals roll up from it, and the vocab
size is a one-row aggregate broadcast back via a 1-row cross join
(Catalyst broadcasts it — no driver round-trip in the plan). Scoring
joins each document's bigrams against the probability table — a
shuffle join on uniformly-distributed word keys — then averages log
probabilities per doc. Every step is DataFrame expressions; at 100 TB
the model table is vocabulary-bounded (Zipf), so the scoring join's
build side stays small enough for broadcast in practice.

Perplexity = exp(-mean ln P(b|a)), P(b|a) = (C(a,b)+a)/(C(a)+a*V),
additive a=0.5. Docs with fewer than two words carry no bigram
evidence and are excluded (both engines agree). Results round to 3
decimals — float sums across different fold orders agree far beyond
that precision at these document lengths.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from . import load_tables

ALPHA = 0.5


def _doc_bigrams(docs):
    ws = F.expr("filter(split(text, ' '), w -> w <> '')")
    return (
        docs.select("doc_id", ws.alias("ws"))
        .filter(F.size("ws") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(ws) - 1),"
                    " i -> struct(ws[i-1] AS a, ws[i] AS b))"
                )
            ).alias("p"),
        )
        .select("doc_id", "p.a", "p.b")
    )


def lm_perplexity(spark, sf_dir):
    """(doc_id, n_bigrams, avg_logp, ppl) under the corpus bigram LM."""
    (docs,) = load_tables(spark, sf_dir, "documents")
    bg = _doc_bigrams(docs)

    counts = bg.groupBy("a", "b").agg(F.count("*").alias("cab"))
    lhs = counts.groupBy("a").agg(F.sum("cab").alias("ca"))
    vocab = docs.select(
        F.explode(F.expr("filter(split(text, ' '), w -> w <> '')")).alias("w")
    ).agg(F.countDistinct("w").alias("v"))

    model = (
        counts.join(lhs, "a")
        .crossJoin(F.broadcast(vocab))
        .select(
            "a",
            "b",
            F.log((F.col("cab") + ALPHA) / (F.col("ca") + ALPHA * F.col("v"))).alias(
                "logp"
            ),
        )
    )
    return (
        bg.join(model, ["a", "b"])
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            F.avg("logp").alias("m"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            F.round("m", 3).alias("avg_logp"),
            F.round(F.exp(-F.col("m")), 3).alias("ppl"),
        )
    )


ORACLE_LM = f"""
WITH w AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws
  FROM documents
),
bg AS (
  SELECT doc_id,
         unnest([ws[i] for i in range(1, greatest(len(ws) - 1, 0) + 1)]) AS a,
         unnest([ws[i + 1] for i in range(1, greatest(len(ws) - 1, 0) + 1)]) AS b
  FROM w WHERE len(ws) >= 2
),
counts AS (SELECT a, b, count(*) AS cab FROM bg GROUP BY 1, 2),
lhs AS (SELECT a, sum(cab) AS ca FROM counts GROUP BY 1),
vocab AS (SELECT count(DISTINCT x.w) AS v
          FROM (SELECT unnest(ws) AS w FROM w) x),
model AS (
  SELECT counts.a, counts.b,
         ln((cab + {ALPHA}) / (ca + {ALPHA} * v)) AS logp
  FROM counts JOIN lhs USING (a) CROSS JOIN vocab
)
SELECT doc_id,
       count(*)::BIGINT AS n_bigrams,
       round(avg(logp), 3) AS avg_logp,
       round(exp(-avg(logp)), 3) AS ppl
FROM bg JOIN model USING (a, b)
GROUP BY doc_id
"""

QUERIES = {"lm_perplexity": lm_perplexity}
ORACLES = {"lm_perplexity": ORACLE_LM}
