"""Benchmark decontamination: flag training documents that overlap a
held-out evaluation set by verbatim token n-grams (the GPT-3 appendix
/ FLAN rule: any shared 8-13-gram marks the doc contaminated).

Shape: the eval set is tiny relative to the corpus, so its n-gram
table BROADCASTS; the corpus side explodes each doc's token 8-grams
(expression-level, map-side) and the contamination check is a
broadcast semi-join — no corpus-scale shuffle at all. The per-doc
rollup then aggregates only the HITS (tiny), and the final left join
back to doc_ids rides the scan. This is the 100 TB shape: cost is one
corpus scan + one broadcast.

The eval set here is deterministic: every doc_id % 97 == 0 document
contributes its token window [3, 3+W) — so contamination is planted
by construction (those docs must flag themselves) while near-miss
windows (shifted by one token) must NOT match, which the tests pin.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from . import load_tables

NGRAM_W = 8
EVAL_EVERY = 97
EVAL_SKIP = 3  # token offset of the eval window within its source doc


def eval_grams(docs):
    """(eval_id, gram): the held-out set's n-grams."""
    ws = F.expr("filter(split(text, ' '), w -> w <> '')")
    return (
        docs.filter(F.col("doc_id") % EVAL_EVERY == 0)
        .select("doc_id", ws.alias("ws"))
        .filter(F.size("ws") >= EVAL_SKIP + NGRAM_W)
        .select(
            F.col("doc_id").alias("eval_id"),
            F.expr(
                f"concat_ws(' ', slice(ws, {EVAL_SKIP + 1}, {NGRAM_W}))"
            ).alias("gram"),
        )
    )


def doc_grams(docs, w: int = NGRAM_W):
    ws = F.expr("filter(split(text, ' '), x -> x <> '')")
    return (
        docs.select("doc_id", ws.alias("ws"))
        .filter(F.size("ws") >= w)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(1, size(ws) - {w - 1}),"
                    f" i -> concat_ws(' ', slice(ws, i, {w})))"
                )
            ).alias("gram"),
        )
    )


def decontamination(spark, sf_dir):
    """(doc_id, n_hits, n_evals, contaminated) for every document."""
    (docs,) = load_tables(spark, sf_dir, "documents")
    ev = eval_grams(docs)
    hits = (
        doc_grams(docs)
        .join(F.broadcast(ev), "gram")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_hits"),
            F.countDistinct("eval_id").cast("long").alias("n_evals"),
        )
    )
    return (
        docs.select("doc_id")
        # hits holds only contaminated docs — a vanishing fraction of the
        # corpus — so the rollup join back broadcasts it rather than
        # shuffling every doc_id into a sort-merge join.
        .join(F.broadcast(hits), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
            F.coalesce("n_evals", F.lit(0)).alias("n_evals"),
            (F.coalesce("n_hits", F.lit(0)) > 0).alias("contaminated"),
        )
    )


ORACLE_DECONTAM = f"""
WITH w AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws
  FROM documents
),
ev AS (
  SELECT doc_id AS eval_id,
         array_to_string(ws[{EVAL_SKIP + 1}:{EVAL_SKIP + NGRAM_W}], ' ') AS gram
  FROM w
  WHERE doc_id % {EVAL_EVERY} = 0 AND len(ws) >= {EVAL_SKIP + NGRAM_W}
),
dg AS (
  SELECT doc_id,
         unnest([array_to_string(ws[i:i + {NGRAM_W - 1}], ' ')
                 for i in range(1, greatest(len(ws) - {NGRAM_W - 1}, 0) + 1)]) AS gram
  FROM w WHERE len(ws) >= {NGRAM_W}
),
hits AS (
  SELECT dg.doc_id,
         count(*)::BIGINT AS n_hits,
         count(DISTINCT ev.eval_id)::BIGINT AS n_evals
  FROM dg JOIN ev USING (gram)
  GROUP BY dg.doc_id
)
SELECT d.doc_id,
       coalesce(h.n_hits, 0) AS n_hits,
       coalesce(h.n_evals, 0) AS n_evals,
       (coalesce(h.n_hits, 0) > 0) AS contaminated
FROM (SELECT doc_id FROM documents) d
LEFT JOIN hits h USING (doc_id)
"""

QUERIES = {"decontamination": decontamination}
ORACLES = {"decontamination": ORACLE_DECONTAM}
