"""Filter-model evaluation: exact distributed ROC-AUC and a
precision/recall curve — the measurement leg of every quality-filter /
language-ID / contamination classifier in a training-data pipeline
(you don't deploy a corpus filter without its AUC and its operating
points).

- ``roc_auc`` — EXACT tie-corrected ROC-AUC via the Mann-Whitney
  rank-sum identity: group once by score to (score, n_pos, n_neg),
  then AUC = sum(pos * (cum_neg_below + neg/2)) / (P*N). The naive
  Spark spelling of the cumulative term — ``sum() OVER (ORDER BY
  score)`` with no PARTITION BY — drags every distinct score into ONE
  task, the same 100-TB failure packing.py documents; here the
  exclusive prefix sum over score groups runs as the classic two-phase
  scan (range-repartition by score, per-partition subtotals -> driver
  sees O(parts) rows -> broadcast offsets -> local cumsum), so a
  continuous-score model with ~|corpus| distinct scores still
  evaluates with bounded per-task state. Ties are exact, not
  approximated: a tied (pos, neg) block contributes pos*neg/2, the
  trapezoid the ROC curve actually traces through a tie.

- ``pr_curve`` — precision/recall/F1 at fixed literal thresholds.
  The corpus pays ONE groupBy(score); the threshold sweep runs on that
  aggregate (thresholds x score-groups), so adding operating points
  never rescans the data.

The evaluated "model" is a deterministic planted scorer (label =
lang='en'; integer score = signal + doc_id-derived noise, overlapping
class distributions, heavy ties): the synthetic corpus carries no real
linguistic signal, so the operator under test is the distributed
evaluation machinery, and integer scores keep both engines bit-exact
up to the final rounded ratios.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import load_tables

PREFIX_PARTS = 32
THRESHOLDS = (0, 100, 200, 300, 400, 500, 600, 700, 800)

_SPARK_SCORE = (
    "cast((case when lang = 'en' then 2 else 0 end + doc_id % 7) * 100"
    " + doc_id % 97 as bigint)"
)
_DUCK_SCORE = (
    "((CASE WHEN lang = 'en' THEN 2 ELSE 0 END + doc_id % 7) * 100"
    " + doc_id % 97)::BIGINT"
)


def planted_scores(docs: DataFrame) -> DataFrame:
    """(doc_id, label, score): label = lang='en', integer score with
    class-dependent shift + deterministic noise so the ROC is
    non-degenerate and tie-rich."""
    return docs.select(
        "doc_id",
        F.when(F.col("lang") == "en", F.lit(1)).otherwise(F.lit(0)).alias("label"),
        F.expr(_SPARK_SCORE).alias("score"),
    )


def _score_groups(scored: DataFrame) -> DataFrame:
    return scored.groupBy("score").agg(
        F.sum("label").cast("long").alias("pos"),
        F.sum(1 - F.col("label")).cast("long").alias("neg"),
    )


def _with_exclusive_cumneg(groups: DataFrame, parts: int = PREFIX_PARTS) -> DataFrame:
    """Attach the exclusive prefix sum of ``neg`` in ascending score
    order — two-phase scan, never a single-task global window."""
    ordered = (
        groups.repartitionByRange(parts, "score")
        .sortWithinPartitions("score")
        .withColumn("pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    subtotal_rows = ordered.groupBy("pid").agg(F.sum("neg").alias("t")).collect()
    subtotals = {r["pid"]: r["t"] for r in subtotal_rows}
    offsets, acc = {}, 0
    for pid in sorted(subtotals):
        offsets[pid] = acc
        acc += subtotals[pid]
    b_off = ordered.sparkSession.sparkContext.broadcast(offsets)

    def _scan(batches):
        base = None
        carry = 0
        for pdf in batches:
            if not len(pdf):
                continue
            if base is None:
                base = int(b_off.value[int(pdf["pid"].iloc[0])])
            cum = pdf["neg"].cumsum() + base + carry
            carry += int(pdf["neg"].sum())
            yield pd.DataFrame(
                {
                    "score": pdf["score"],
                    "pos": pdf["pos"],
                    "neg": pdf["neg"],
                    "cumneg": (cum - pdf["neg"]).astype("int64"),
                }
            )

    return ordered.mapInPandas(
        _scan, schema="score long, pos long, neg long, cumneg long"
    )


def roc_auc(scored: DataFrame) -> DataFrame:
    """One row: (auc, n_pos, n_neg). Exact tie-corrected AUC."""
    c = _with_exclusive_cumneg(_score_groups(scored))
    totals = c.agg(
        F.sum(F.col("pos") * (F.col("cumneg") + F.col("neg") / 2.0)).alias("u"),
        F.sum("pos").alias("n_pos"),
        F.sum("neg").alias("n_neg"),
    )
    return totals.select(
        F.when(
            (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
            F.round(F.col("u") / (F.col("n_pos") * F.col("n_neg")), 6),
        ).alias("auc"),
        "n_pos",
        "n_neg",
    )


def pr_curve(scored: DataFrame, thresholds=THRESHOLDS) -> DataFrame:
    """(threshold, tp, fp, fn, precision, recall, f1) — predicted
    positive iff score >= threshold. Runs on the score aggregate."""
    g = _score_groups(scored)
    th = scored.sparkSession.createDataFrame(
        [(int(t),) for t in thresholds], "threshold bigint"
    )
    tot = g.agg(
        F.sum("pos").alias("p_all"), F.sum("neg").alias("n_all")
    )
    swept = (
        g.crossJoin(F.broadcast(th))
        .groupBy("threshold")
        .agg(
            F.sum(F.when(F.col("score") >= F.col("threshold"), F.col("pos")).otherwise(0))
            .cast("long")
            .alias("tp"),
            F.sum(F.when(F.col("score") >= F.col("threshold"), F.col("neg")).otherwise(0))
            .cast("long")
            .alias("fp"),
        )
        .crossJoin(F.broadcast(tot))
        .withColumn("fn", (F.col("p_all") - F.col("tp")).cast("long"))
    )
    prec = F.when(F.col("tp") + F.col("fp") > 0, F.col("tp") / (F.col("tp") + F.col("fp")))
    rec = F.when(F.col("p_all") > 0, F.col("tp") / F.col("p_all"))
    f1 = F.when(
        (F.col("tp") + F.col("fp") > 0) & (F.col("p_all") > 0) & (F.col("tp") > 0),
        2 * (prec * rec) / (prec + rec),
    ).otherwise(F.when((F.col("tp") + F.col("fp") > 0) & (F.col("p_all") > 0), F.lit(0.0)))
    return swept.select(
        "threshold",
        "tp",
        "fp",
        "fn",
        F.round(prec, 6).alias("precision"),
        F.round(rec, 6).alias("recall"),
        F.round(f1, 6).alias("f1"),
    )


def filter_model_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    (docs,) = load_tables(spark, sf_dir, "documents")
    return roc_auc(planted_scores(docs))


def filter_model_pr_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    (docs,) = load_tables(spark, sf_dir, "documents")
    return pr_curve(planted_scores(docs))


_DUCK_SCORED = f"""
  SELECT doc_id,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS label,
         {_DUCK_SCORE} AS score
  FROM documents
"""

ORACLE_AUC = f"""
WITH s AS ({_DUCK_SCORED}),
g AS (
  SELECT score, sum(label)::BIGINT AS pos, sum(1 - label)::BIGINT AS neg
  FROM s GROUP BY score
),
c AS (
  SELECT *, (sum(neg) OVER (ORDER BY score ROWS UNBOUNDED PRECEDING) - neg)::BIGINT AS cumneg
  FROM g
)
SELECT
  CASE WHEN sum(pos) > 0 AND sum(neg) > 0
       THEN round(sum(pos * (cumneg + neg / 2.0)) / (sum(pos)::DOUBLE * sum(neg)::DOUBLE), 6)
  END AS auc,
  sum(pos)::BIGINT AS n_pos,
  sum(neg)::BIGINT AS n_neg
FROM c
"""

_TH_VALUES = ", ".join(f"({t})" for t in THRESHOLDS)

ORACLE_PR_CURVE = f"""
WITH s AS ({_DUCK_SCORED}),
g AS (
  SELECT score, sum(label)::BIGINT AS pos, sum(1 - label)::BIGINT AS neg
  FROM s GROUP BY score
),
th(threshold) AS (VALUES {_TH_VALUES}),
swept AS (
  SELECT th.threshold::BIGINT AS threshold,
         sum(CASE WHEN g.score >= th.threshold THEN g.pos ELSE 0 END)::BIGINT AS tp,
         sum(CASE WHEN g.score >= th.threshold THEN g.neg ELSE 0 END)::BIGINT AS fp
  FROM g CROSS JOIN th GROUP BY th.threshold
),
tot AS (SELECT sum(pos)::BIGINT AS p_all FROM g)
SELECT threshold, tp, fp, (p_all - tp)::BIGINT AS fn,
  round(CASE WHEN tp + fp > 0 THEN tp::DOUBLE / (tp + fp) END, 6) AS precision,
  round(CASE WHEN p_all > 0 THEN tp::DOUBLE / p_all END, 6) AS recall,
  round(CASE WHEN tp + fp > 0 AND p_all > 0 THEN
          CASE WHEN tp > 0 THEN
            2 * (tp::DOUBLE / (tp + fp)) * (tp::DOUBLE / p_all)
              / (tp::DOUBLE / (tp + fp) + tp::DOUBLE / p_all)
          ELSE 0.0 END
        END, 6) AS f1
FROM swept CROSS JOIN tot
"""


CAL_BIN_WIDTH = 100  # milli-probability units per calibration bin


def calibration_bins(scored: DataFrame) -> DataFrame:
    """Reliability-diagram bins + Brier components for a filter model
    whose score is a milli-probability (score/1000 = predicted P of
    the positive class) — the third leg of filter evaluation after
    AUC (ranking) and PR (operating points): a filter can rank
    perfectly and still be mis-calibrated, which breaks any pipeline
    that THRESHOLDS on the probability (quality gates do).

    Per bin (score div 100): n, positives, the exact integer score
    sum, and the bin's exact integer Brier sum — sum((score -
    1000*label)^2) in milli^2 units, fold-order exact — plus the
    derived confidence/accuracy/|gap| ratios rounded once at the end.
    ECE = sum(n * gap) / N is one trivial reduction over these <=10
    rows (tests compute it); the corpus pays ONE groupBy, and the
    whole plan is expression-level aggregation — no window, no
    Python."""
    g = scored.groupBy(F.expr(f"score div {CAL_BIN_WIDTH}").alias("bin")).agg(
        F.count("*").cast("long").alias("n"),
        F.sum("label").cast("long").alias("pos"),
        F.sum("score").cast("long").alias("score_sum"),
        F.sum(
            (F.col("score") - 1000 * F.col("label"))
            * (F.col("score") - 1000 * F.col("label"))
        )
        .cast("long")
        .alias("brier_micro_sum"),
    )
    conf = F.col("score_sum") / (F.col("n") * 1000.0)
    acc = F.col("pos") / F.col("n")
    return g.select(
        "bin",
        "n",
        "pos",
        "score_sum",
        "brier_micro_sum",
        F.round(conf, 6).alias("confidence"),
        F.round(acc, 6).alias("accuracy"),
        F.round(F.abs(conf - acc), 6).alias("gap"),
    )


def filter_model_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    (docs,) = load_tables(spark, sf_dir, "documents")
    return calibration_bins(planted_scores(docs))


ORACLE_CALIBRATION = f"""
WITH s AS ({_DUCK_SCORED}),
g AS (
  SELECT score // {CAL_BIN_WIDTH} AS bin,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(label) AS BIGINT) AS pos,
         CAST(SUM(score) AS BIGINT) AS score_sum,
         CAST(SUM((score - 1000 * label) * (score - 1000 * label)) AS BIGINT)
           AS brier_micro_sum
  FROM s GROUP BY 1
)
SELECT bin, n, pos, score_sum, brier_micro_sum,
  round(score_sum / (n * 1000.0), 6) AS confidence,
  round(pos::DOUBLE / n, 6) AS accuracy,
  round(abs(score_sum / (n * 1000.0) - pos::DOUBLE / n), 6) AS gap
FROM g
"""


QUERIES = {
    "filter_model_auc": filter_model_auc,
    "filter_model_pr_curve": filter_model_pr_curve,
    "filter_model_calibration": filter_model_calibration,
}

ORACLES = {
    "filter_model_auc": ORACLE_AUC,
    "filter_model_pr_curve": ORACLE_PR_CURVE,
    "filter_model_calibration": ORACLE_CALIBRATION,
}
