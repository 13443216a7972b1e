"""Distribution quantiles for corpus monitoring — exact oracle path +
the mergeable-sketch path that actually runs at 100 TB.

``corpus_quantiles`` computes exact continuous-interpolation percentiles
of two monitored features (document length, event value) with Spark's
distributed ``percentile`` aggregate, unpivoted to one row per
(feature, quantile). The DuckDB oracle recomputes them with
``quantile_cont`` — two independent exact implementations must agree to
six decimal places, which pins the interpolation convention ((n-1)*p
linear) as well as the values.

At 100 TB the exact aggregate is the wrong tool (it buffers per-group
values); the production path is ``approx_percentile`` — Spark's
KLL-style mergeable sketch with a rank-error guarantee of 1/accuracy,
map-side combinable like any other partial aggregate. The sketch is
pinned in ``tests/test_quantiles.py`` the same way profiling pins HLL:
its observed RANK error on real data must stay within twice the
guarantee, so swapping the exact aggregate for the sketch at scale is
an evidenced move, not a hope.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import load_tables

QS = [0.1, 0.25, 0.5, 0.75, 0.9, 0.99]
_QARR = ", ".join(str(q) for q in QS)


def _exact_feature(df: DataFrame, feature: str, col: str) -> DataFrame:
    agg = df.agg(
        F.expr(f"percentile({col}, array({_QARR}))").alias("v")
    ).select(
        F.lit(feature).alias("feature"),
        F.explode(
            F.arrays_zip(
                F.expr(f"array({_QARR})").alias("q"), F.col("v").alias("value")
            )
        ).alias("z"),
    )
    return agg.select(
        "feature",
        # the array literal parses as decimal; the oracle emits double
        F.col("z.q").cast("double").alias("q"),
        F.round(F.col("z.value"), 6).alias("value"),
    )


def corpus_quantiles(spark, sf_dir: str) -> DataFrame:
    """(feature, q, value): exact percentiles of document length and
    event value — one partial-aggregating scan per table, 12 rows out."""
    docs, events = load_tables(spark, sf_dir, "documents", "events")
    return _exact_feature(docs, "doc_n_chars", "n_chars").unionByName(
        _exact_feature(events, "event_value", "value")
    )


ORACLE_QUANTILES = f"""
WITH d AS (SELECT quantile_cont(n_chars, [{_QARR}]) AS v FROM documents),
e AS (SELECT quantile_cont(value, [{_QARR}]) AS v FROM events)
SELECT 'doc_n_chars' AS feature, unnest([{_QARR}]) AS q,
       ROUND(unnest(v), 6) AS value FROM d
UNION ALL
SELECT 'event_value' AS feature, unnest([{_QARR}]) AS q,
       ROUND(unnest(v), 6) AS value FROM e
"""

QUERIES = {"corpus_quantiles": corpus_quantiles}
ORACLES = {"corpus_quantiles": ORACLE_QUANTILES}
