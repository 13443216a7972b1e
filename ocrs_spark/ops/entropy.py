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

Plan shape: one position explode to chars that immediately groupBys
to (doc_id, char) counts — map-side combinable, keys uniform — then a
per-doc rollup. Exactly word-count-shaped; nothing wider than the
(doc, char) table ever shuffles. Char extraction uses the cdc.py
sequence+substring idiom (whole-stage codegen; identical 1-based
semantics in DuckDB)."""

from __future__ import annotations

from pyspark.sql import functions as F

from . import load_tables

H_MIN = 2.0  # below: repeated-padding / single-char spam
H_MAX = 4.8  # above: key-mash / binary-ish payloads


def char_entropy_gate(spark, sf_dir):
    """(doc_id, n_chars, distinct_chars, char_entropy, top_char_share,
    is_gibberish) for every document."""
    (docs,) = load_tables(spark, sf_dir, "documents")
    chars = docs.select(
        "doc_id",
        F.explode(
            F.expr("transform(sequence(1, length(text)), i -> substring(text, i, 1))")
        ).alias("ch"),
    )
    counts = chars.groupBy("doc_id", "ch").agg(
        F.count("*").cast("long").alias("c")
    )
    per_doc = counts.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_chars"),
        F.count("*").cast("long").alias("distinct_chars"),
        F.sum(F.col("c") * F.log(F.col("c").cast("double"))).alias("clnc"),
        F.max("c").cast("long").alias("top_c"),
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
