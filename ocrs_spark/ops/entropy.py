"""Character-entropy gibberish gate — the information-theoretic
quality signal the CCNet/RefinedWeb family applies alongside ratio
heuristics (gopher.py) and LM perplexity (lmscore.py): natural text
in any alphabetic language sits in a narrow char-unigram entropy band
(~2-4.5 nats); binary-ish blobs and key-mash pages sit high with a
flat histogram, while repeated-padding and single-char spam sit low
with one dominating character. Distinct from both neighbors: no
lexicon, no trained model — the gate works on scripts the marker
lexicons don't know.

Entropy is computed in the zipf.py determinism style: with per-doc
char counts c_i and total n,

    H = ln(n) - (1/n) * sum_i c_i * ln(c_i)

so every ln() argument is an EXACT integer — both engines evaluate
identical libm calls — and the only cross-engine freedom is the fold
order of ~|alphabet| O(1) terms (~1e-14 noise, far below the 6-dp
rounding grid; the cooccur/zipf precedent).

Plan shape (r6): ZERO data-scale shuffles — the whole histogram is one
vectorized np.unique per document inside a single Arrow batch pass
(guide §4.2: hand batches to native code), emitting one bounded stats
row per doc. The former shape (char-position explode -> groupBy
(doc_id, char) -> groupBy doc_id) exchanged the corpus at CHARACTER
granularity twice; an intermediate pure-JVM higher-order-function
version removed the shuffles but paid interpreted per-element lambda
evaluation (measured 2.2 s -> 1.2 s -> 0.6 s at sf0.1 across the
three shapes). Only the text column crosses the Python boundary."""

from __future__ import annotations

from pyspark.sql import functions as F

from . import load_tables

H_MIN = 2.0  # below: repeated-padding / single-char spam
H_MAX = 4.8  # above: key-mash / binary-ish payloads


def char_entropy_gate(spark, sf_dir):
    """(doc_id, n_chars, distinct_chars, char_entropy, top_char_share,
    is_gibberish) for every document."""
    (docs,) = load_tables(spark, sf_dir, "documents")

    # Docs with empty/NULL text produced no exploded rows before and
    # produce none in the oracle; keep that row set exactly. The
    # histogram itself is one vectorized np.unique per document
    # (code-point exact via utf-32), so per-doc stats come out of a
    # single Arrow pass; counts are exact integers, and clnc sums in
    # sorted-code-point order (same fold order as a sorted-run pass;
    # the ~1e-14 fold noise sits far below the 6-dp rounding grid).
    def _hist_batches(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            out = {
                "doc_id": [],
                "n_chars": [],
                "distinct_chars": [],
                "clnc": [],
                "top_c": [],
            }
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                if not text:
                    continue
                cps = np.frombuffer(
                    text.encode("utf-32-le"), dtype=np.uint32
                )
                counts = np.unique(cps, return_counts=True)[1]
                out["doc_id"].append(doc_id)
                out["n_chars"].append(cps.size)
                out["distinct_chars"].append(counts.size)
                out["clnc"].append(float((counts * np.log(counts)).sum()))
                out["top_c"].append(int(counts.max()))
            yield pd.DataFrame(out)

    per_doc = (
        docs.select("doc_id", "text")
        .repartition(spark.sparkContext.defaultParallelism)
        .mapInPandas(
            _hist_batches,
            schema=(
                "doc_id bigint, n_chars bigint, distinct_chars bigint,"
                " clnc double, top_c bigint"
            ),
        )
    )
    h = F.log(F.col("n_chars").cast("double")) - F.col("clnc") / F.col("n_chars")
    return per_doc.select(
        "doc_id",
        "n_chars",
        "distinct_chars",
        F.round(h, 6).alias("char_entropy"),
        F.round(F.col("top_c") / F.col("n_chars"), 6).alias("top_char_share"),
        ((h < H_MIN) | (h > H_MAX)).alias("is_gibberish"),
    )


ORACLE_CHAR_ENTROPY = f"""
WITH chars AS (
  SELECT doc_id, unnest([text[i] for i in range(1, length(text) + 1)]) AS ch
  FROM documents
),
counts AS (
  SELECT doc_id, ch, count(*)::BIGINT AS c FROM chars GROUP BY doc_id, ch
),
per_doc AS (
  SELECT doc_id,
         sum(c)::BIGINT AS n_chars,
         count(*)::BIGINT AS distinct_chars,
         sum(c * ln(c::DOUBLE)) AS clnc,
         max(c)::BIGINT AS top_c
  FROM counts GROUP BY doc_id
)
SELECT doc_id, n_chars, distinct_chars,
       round(ln(n_chars::DOUBLE) - clnc / n_chars, 6) AS char_entropy,
       round(top_c::DOUBLE / n_chars, 6) AS top_char_share,
       ((ln(n_chars::DOUBLE) - clnc / n_chars) < {H_MIN}
        OR (ln(n_chars::DOUBLE) - clnc / n_chars) > {H_MAX}) AS is_gibberish
FROM per_doc
"""

QUERIES = {"char_entropy_gate": char_entropy_gate}
ORACLES = {"char_entropy_gate": ORACLE_CHAR_ENTROPY}
