"""Gopher/C4-style repetition & quality filter signals.

The standard pre-training corpus filters from public papers — Gopher
(Rae et al. 2021, "Scaling Language Models", Appendix A1.1) and C4
(Raffel et al. 2020) — re-expressed Spark-first:

- duplicate-word fraction (1 - distinct/total words),
- top-bigram character coverage (chars in the single most frequent
  word 2-gram / doc chars — Gopher's "top n-gram fraction"),
- duplicate-trigram character coverage (chars in 3-grams occurring
  twice or more / doc chars — Gopher's "duplicate n-gram fraction";
  overlaps counted, so the signal can exceed 1.0 on degenerate docs),
- alphabetic-word fraction and symbol-to-word ratio ('#'/'...' per
  word, C4/Gopher symbol rules),
- a composite ``keep`` flag (thresholds scaled to this corpus's
  short synthetic docs; the paper's 50-word floor would veto most of
  the test corpus, which would make the flag untestable).

Scale shape: doc-level signals are pure Catalyst expressions (one
scan, whole-stage codegen). The n-gram coverage needs one explode +
two-level aggregation — partial map-side combine on (doc_id, n, gram)
then a per-doc rollup, followed by a doc_id equi-join back to the
expression stats. Both sides of that join are hash-partitioned on
doc_id by their aggregations, so at 100 TB the join reuses the agg
shuffle instead of adding one. No Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from . import load_tables

# Threshold constants (Gopher-derived, corpus-scaled — see module doc).
MIN_WORDS = 20
MAX_DUP_WORD_FRAC = 0.55
MAX_TOP_BIGRAM_FRAC = 0.10
MAX_DUP_TRIGRAM_FRAC = 0.05
MIN_ALPHA_WORD_FRAC = 0.80
MAX_SYMBOL_WORD_RATIO = 0.10

# Non-empty word split. The guarded transforms avoid Spark's
# descending-sequence trap: sequence(1, 0) yields [1, 0], not [] —
# an unguarded gram expression would fabricate grams on 1-word docs.
_WS = "filter(split(text, ' '), w -> w <> '')"
_GRAMS = f"""
concat(
  CASE WHEN size(ws) >= 2
       THEN transform(sequence(1, size(ws) - 1),
                      i -> struct(2 AS n, concat_ws(' ', ws[i-1], ws[i]) AS g))
       ELSE array() END,
  CASE WHEN size(ws) >= 3
       THEN transform(sequence(1, size(ws) - 2),
                      i -> struct(3 AS n, concat_ws(' ', ws[i-1], ws[i], ws[i+1]) AS g))
       ELSE array() END
)
"""


def gopher_quality_signals(spark, sf_dir):
    """Per-doc repetition/quality signals + composite keep flag."""
    (docs,) = load_tables(spark, sf_dir, "documents")
    # Spread the small parquet scan over the cores before the Arrow
    # pass (micro-batch callers skip this — their input is already
    # partitioned by the stream).
    return quality_signals(
        docs.select("doc_id", "text").repartition(
            spark.sparkContext.defaultParallelism
        )
    )


def quality_signals(docs):
    """Signals over any (doc_id, text) DataFrame.

    r6: all raw counters come out of ONE Arrow batch pass (guide §4.2)
    — n-gram coverage is a collections.Counter per document instead of
    the former gram-level explode -> groupBy (doc_id, n, gram) ->
    groupBy doc_id -> join-back chain (two corpus-granularity
    exchanges plus a join), and the per-word regex runs compiled in C
    instead of an interpreted rlike lambda per word. Every counter is
    an exact integer (n_sym's /3 is exact: the delta is divisible by
    3), so the rounded signals and keep flag are bit-identical to the
    expression form — the oracle sweep pins it at every SF.
    """
    import re
    from collections import Counter

    alpha_re = re.compile(r"[A-Za-z]")

    def _signal_batches(batches):
        import pandas as pd

        for pdf in batches:
            out = {
                "doc_id": [],
                "nc": [],
                "n_words": [],
                "n_distinct": [],
                "n_alpha": [],
                "n_sym": [],
                "top2_chars": [],
                "dup3_chars": [],
            }
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                ws = [w for w in text.split(" ") if w != ""]
                c2 = Counter(zip(ws, ws[1:]))
                c3 = Counter(zip(ws, ws[1:], ws[2:]))
                top2 = max(
                    (c * (len(a) + len(b) + 1) for (a, b), c in c2.items()),
                    default=None,
                )
                dup3 = sum(
                    c * (len(a) + len(b) + len(g) + 2)
                    for (a, b, g), c in c3.items()
                    if c >= 2
                )
                out["doc_id"].append(doc_id)
                out["nc"].append(len(text))
                out["n_words"].append(len(ws))
                out["n_distinct"].append(len(set(ws)))
                out["n_alpha"].append(
                    sum(1 for w in ws if alpha_re.search(w))
                )
                out["n_sym"].append(
                    float(text.count("#") + text.count("..."))
                )
                out["top2_chars"].append(top2)
                out["dup3_chars"].append(dup3 if c3 else None)
            yield pd.DataFrame(out)

    j = docs.select("doc_id", "text").mapInPandas(
        _signal_batches,
        schema=(
            "doc_id bigint, nc bigint, n_words bigint, n_distinct bigint,"
            " n_alpha bigint, n_sym double, top2_chars bigint,"
            " dup3_chars bigint"
        ),
    )
    dup_word_frac = F.round(1 - F.col("n_distinct") / F.col("n_words"), 4)
    alpha_frac = F.round(F.col("n_alpha") / F.col("n_words"), 3)
    sym_ratio = F.round(F.col("n_sym") / F.col("n_words"), 3)
    top2_frac = F.round(F.coalesce(F.col("top2_chars"), F.lit(0)) / F.col("nc"), 4)
    dup3_frac = F.round(F.coalesce(F.col("dup3_chars"), F.lit(0)) / F.col("nc"), 4)
    out = j.select(
        "doc_id",
        "n_words",
        dup_word_frac.alias("dup_word_frac"),
        alpha_frac.alias("alpha_word_frac"),
        sym_ratio.alias("symbol_word_ratio"),
        top2_frac.alias("top_bigram_frac"),
        dup3_frac.alias("dup_trigram_frac"),
    )
    # keep is defined over the ROUNDED signals so the flag is exactly
    # reproducible by any engine that agrees on the rounded columns.
    return out.withColumn(
        "keep",
        (F.col("n_words") >= MIN_WORDS)
        & (F.col("dup_word_frac") <= MAX_DUP_WORD_FRAC)
        & (F.col("alpha_word_frac") >= MIN_ALPHA_WORD_FRAC)
        & (F.col("symbol_word_ratio") < MAX_SYMBOL_WORD_RATIO)
        & (F.col("top_bigram_frac") < MAX_TOP_BIGRAM_FRAC)
        & (F.col("dup_trigram_frac") < MAX_DUP_TRIGRAM_FRAC),
    )


ORACLE_GOPHER = f"""
WITH w AS (
  SELECT doc_id, length(text) AS nc, text,
         list_filter(string_split(text, ' '), x -> x <> '') AS ws
  FROM documents
),
g2 AS (SELECT doc_id,
              unnest([ws[i] || ' ' || ws[i+1]
                      for i in range(1, greatest(len(ws) - 1, 0) + 1)]) AS g
       FROM w),
c2 AS (SELECT doc_id, g, count(*) AS c FROM g2 GROUP BY 1, 2),
s2 AS (SELECT doc_id, max(c * length(g)) AS top2_chars FROM c2 GROUP BY 1),
g3 AS (SELECT doc_id,
              unnest([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                      for i in range(1, greatest(len(ws) - 2, 0) + 1)]) AS g
       FROM w),
c3 AS (SELECT doc_id, g, count(*) AS c FROM g3 GROUP BY 1, 2),
s3 AS (SELECT doc_id,
              sum(CASE WHEN c >= 2 THEN c * length(g) ELSE 0 END) AS dup3_chars
       FROM c3 GROUP BY 1),
sig AS (
  SELECT w.doc_id,
         len(ws)::BIGINT AS n_words,
         round(1 - len(list_distinct(ws)) / len(ws), 4) AS dup_word_frac,
         round(len(list_filter(ws, x -> regexp_matches(x, '[A-Za-z]')))
               / len(ws), 3) AS alpha_word_frac,
         round(((length(text) - length(replace(text, '#', '')))
                + (length(text) - length(replace(text, '...', ''))) / 3)
               / len(ws), 3) AS symbol_word_ratio,
         round(coalesce(s2.top2_chars, 0) / w.nc, 4) AS top_bigram_frac,
         round(coalesce(s3.dup3_chars, 0) / w.nc, 4) AS dup_trigram_frac
  FROM w LEFT JOIN s2 USING (doc_id) LEFT JOIN s3 USING (doc_id)
)
SELECT *,
       (n_words >= {MIN_WORDS}
        AND dup_word_frac <= {MAX_DUP_WORD_FRAC}
        AND alpha_word_frac >= {MIN_ALPHA_WORD_FRAC}
        AND symbol_word_ratio < {MAX_SYMBOL_WORD_RATIO}
        AND top_bigram_frac < {MAX_TOP_BIGRAM_FRAC}
        AND dup_trigram_frac < {MAX_DUP_TRIGRAM_FRAC}) AS keep
FROM sig
"""

QUERIES = {"gopher_quality_signals": gopher_quality_signals}
ORACLES = {"gopher_quality_signals": ORACLE_GOPHER}
