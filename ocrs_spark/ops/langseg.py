"""Per-line language segmentation of mixed-language documents — the
mC4/CCNet curation step that splits a document into maximal runs of
consecutive same-language lines, so a page with an English body and a
French comment thread yields one clean segment per language instead of
one polluted "mixed" doc (per-line langid + contiguous merge is
exactly how mC4 built its language shards).

Corpus planting (the ``ops/linkgraph.py`` round-trip discipline): each
document expands to a deterministic set of lines whose language
rotates by a closed-form formula; the Spark side must actually
CLASSIFY every line (the ``textstats`` marker-count heuristic — one
codegen'd regexp_count per lexicon, no Python) and then merge runs
with the gaps-and-islands pattern (lag + running sum over a per-doc
window). The oracle recomputes the expected segments from the
planting formula alone — it never sees the line text — so agreement
proves the classifier AND the window algebra.

Scale: one ``explode(sequence(...))`` (row generation inside the
scan), one window partitioned by doc_id (per-doc line counts are
bounded, so no skewed key), one groupBy(doc, segment). Everything is
whole-stage-codegen expressions.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from . import load_tables
from .textstats import LEXICONS

# line i of doc d has language LANGS[(d + i*i) % 3]; docs have
# (d % 5) + 3 lines, so segment boundaries vary per document
LANGS = ("sparkish", "commonish", "und")
_LINE_TEXT = {
    "sparkish": "spark shuffle partition query row",
    "commonish": "the small slow of a",
    "und": "zzz qqq 123",
}


def _planted_lines(docs):
    lang_pick = (F.col("doc_id") + F.col("line_no") * F.col("line_no")) % 3
    text = (
        F.when(lang_pick == 0, F.lit(_LINE_TEXT["sparkish"]))
        .when(lang_pick == 1, F.lit(_LINE_TEXT["commonish"]))
        .otherwise(F.lit(_LINE_TEXT["und"]))
    )
    return (
        docs.select(
            "doc_id",
            F.explode(
                F.sequence(F.lit(0), (F.col("doc_id") % 5 + 2).cast("int"))
            ).alias("i"),
        )
        .select("doc_id", F.col("i").cast("long").alias("line_no"))
        .select("doc_id", "line_no", text.alias("line"))
    )


def _classify(line_col):
    """Marker-count language of one line — greatest-hits with the
    lexicon-name tie-break, 'und' when nothing matches (same contract
    as ``textstats.lang_id_markers``, applied per line)."""
    padded = F.concat(F.lit(" "), line_col, F.lit(" "))
    counts = {
        name: F.regexp_count(
            padded, F.lit(" (?:" + "|".join(words) + ")(?= )")
        )
        for name, words in sorted(LEXICONS.items())
    }
    best = F.greatest(*counts.values())
    pred = F.when(best == 0, F.lit("und"))
    for name in sorted(LEXICONS):
        pred = pred.when(counts[name] == best, F.lit(name))
    return pred


def line_lang_segments(spark, sf_dir: str):
    """(doc_id, seg_idx, lang, n_lines, start_line, end_line) —
    maximal same-language line runs per document."""
    (docs,) = load_tables(spark, sf_dir, "documents")
    lines = _planted_lines(docs).withColumn("lang", _classify(F.col("line")))
    w = Window.partitionBy("doc_id").orderBy("line_no")
    seg = (
        lines.withColumn(
            "brk",
            F.when(
                F.col("lang") == F.lag("lang").over(w), F.lit(0)
            ).otherwise(F.lit(1)),
        )
        .withColumn("seg_idx", F.sum("brk").over(w).cast("long") - 1)
    )
    return seg.groupBy("doc_id", "seg_idx", "lang").agg(
        F.count("*").cast("long").alias("n_lines"),
        F.min("line_no").alias("start_line"),
        F.max("line_no").alias("end_line"),
    )


def _oracle_sql() -> str:
    return """
WITH lines AS (
  SELECT doc_id, CAST(i AS BIGINT) AS line_no,
         CASE CAST((doc_id + i * i) % 3 AS INT)
           WHEN 0 THEN 'sparkish' WHEN 1 THEN 'commonish' ELSE 'und'
         END AS lang
  FROM (
    SELECT doc_id, unnest(range(0, (doc_id % 5 + 3)::BIGINT)) AS i
    FROM documents
  )
),
marked AS (
  SELECT *,
         CASE WHEN lang = lag(lang) OVER (PARTITION BY doc_id ORDER BY line_no)
              THEN 0 ELSE 1 END AS brk
  FROM lines
),
segs AS (
  SELECT *,
         CAST(SUM(brk) OVER (PARTITION BY doc_id ORDER BY line_no
                             ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT) AS seg_idx
  FROM marked
)
SELECT doc_id, seg_idx, lang,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(MIN(line_no) AS BIGINT) AS start_line,
       CAST(MAX(line_no) AS BIGINT) AS end_line
FROM segs GROUP BY doc_id, seg_idx, lang
"""


QUERIES = {"line_lang_segments": line_lang_segments}
ORACLES = {"line_lang_segments": _oracle_sql()}
