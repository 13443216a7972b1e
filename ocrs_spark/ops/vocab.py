"""Vocabulary OOV-coverage gate: per-document out-of-vocabulary rate
against a frozen top-K corpus vocabulary — the tokenizer-fit signal a
multilingual pipeline watches per source (a source whose documents are
mostly OOV against the training vocabulary will tokenize into byte
fallbacks and waste context window; UniMax/NLLB-style pipelines gate
or re-weight on exactly this).

Two-phase, both exact: (1) the frozen vocabulary = top VOCAB_K tokens
by corpus frequency with a DETERMINISTIC total tie-break (count desc,
token asc — ties are real at small scale and an undefined order would
make the whole operator nondeterministic); (2) one broadcast
left-join of the exploded token stream against the vocabulary, one
groupBy(doc) for per-doc totals. Rates are integer milli units via
floor division.

Scale: the vocabulary is bounded (VOCAB_K rows) — the classic
collect-a-bounded-model shape; the token stream never shuffles except
for the per-doc groupBy, which is the word-count shape with map-side
combine. At 100 TB the top-K select is TakeOrdered (per-partition
top-K merged on the driver), not a global sort.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from . import load_tables

VOCAB_K = 20  # frozen vocabulary size: below the ~31-token corpus
              # vocabulary, so OOV tokens actually exist


def corpus_vocabulary(docs):
    """Top-K (token, rank) by frequency, total deterministic order."""
    counts = (
        docs.select(
            F.explode(
                F.expr("filter(split(text, ' '), w -> w <> '')")
            ).alias("token")
        )
        .groupBy("token")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    return counts.orderBy(
        F.col("cnt").desc(), F.col("token").asc()
    ).limit(VOCAB_K)


def vocab_oov_rate(spark, sf_dir: str):
    """(doc_id, n_tokens, n_oov, oov_milli) — per-document OOV rate
    against the frozen top-K vocabulary."""
    (docs,) = load_tables(spark, sf_dir, "documents")
    vocab = corpus_vocabulary(docs).select(
        "token", F.lit(1).alias("in_vocab")
    )
    toks = docs.select(
        "doc_id",
        F.explode(
            F.expr("filter(split(text, ' '), w -> w <> '')")
        ).alias("token"),
    )
    joined = toks.join(F.broadcast(vocab), "token", "left")
    per_doc = joined.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_tokens"),
        F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_oov"),
    )
    return per_doc.select(
        "doc_id",
        "n_tokens",
        "n_oov",
        F.expr("(1000 * n_oov) div n_tokens").cast("long").alias("oov_milli"),
    )


def _oracle_sql() -> str:
    return f"""
WITH toks AS (
  SELECT doc_id, token FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
  ) WHERE token <> ''
),
vocab AS (
  SELECT token FROM (
    SELECT token, COUNT(*) AS cnt FROM toks GROUP BY token
  ) ORDER BY cnt DESC, token ASC LIMIT {VOCAB_K}
),
per_doc AS (
  SELECT t.doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_tokens,
         CAST(SUM(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov
  FROM toks t LEFT JOIN vocab v ON v.token = t.token
  GROUP BY t.doc_id
)
SELECT doc_id, n_tokens, n_oov,
       CAST((1000 * n_oov) // n_tokens AS BIGINT) AS oov_milli
FROM per_doc
"""


QUERIES = {"vocab_oov_rate": vocab_oov_rate}
ORACLES = {"vocab_oov_rate": _oracle_sql()}
