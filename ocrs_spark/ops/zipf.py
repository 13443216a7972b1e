"""Corpus Zipf fit: the power-law exponent of the token frequency
distribution, a one-row corpus-health gate (natural text sits near
slope -1; spam floods, boilerplate, and tokenizer bugs all bend the
tail, so curation pipelines watch this number per ingest batch the
same way they watch PSI drift).

Fit: ordinary least squares of ln(frequency) on ln(rank). The naive
plan ranks every vocabulary entry (a global row_number over 10^8 rows
at corpus scale — a single-task sort, exactly the window this library
refuses to ship). Instead ties share a MIDRANK: every token with the
same count c gets the average rank of its tie block. That is both the
statistically standard treatment of ties AND the key to scale: within
a block, ln(rank) and ln(freq) are constants, so each block
contributes closed-form terms (m_c * x_c, m_c * x_c * y_c, ...) and
the whole regression collapses to aggregates over the PER-FREQUENCY
table — whose size is bounded by the number of distinct counts,
O(sqrt(total_tokens)) by the pigeonhole bound (1+2+...+k <= N), i.e. a
few thousand rows for a 10^12-token corpus. The only window in the
plan runs over that provably-tiny table; the big data pays one
uniform-key token groupBy, the same shuffle a word count pays.

Float parity with the DuckDB oracle follows the cooccur.py precedent:
every ln() argument is an exact integer or half-integer computed
identically in both engines, the final sums span only the tiny block
table, and outputs round to 6 dp — fold-order noise (~1e-13 relative)
is far below the rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from . import load_tables

# Tokenization shared with textstats/nbclassify: split on single
# spaces, drop empties.
_TOKS = "filter(split(text, ' '), w -> w <> '')"


def zipf_fit_over(docs: DataFrame) -> DataFrame:
    """One row: (vocab_size, total_tokens, distinct_freqs, slope,
    intercept) for the word-frequency power law ln f = a + s * ln r."""
    tok = docs.select(F.explode(F.expr(_TOKS)).alias("token"))
    freq = tok.groupBy("token").agg(F.count("*").cast("long").alias("cnt"))
    # Tie blocks: one row per distinct frequency. Tiny by pigeonhole.
    blocks = freq.groupBy("cnt").agg(F.count("*").cast("long").alias("m"))
    w = Window.orderBy(F.desc("cnt")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    ranked = blocks.select(
        "cnt",
        "m",
        F.coalesce(F.sum("m").over(w), F.lit(0)).alias("off"),
    ).select(
        "cnt",
        "m",
        # midrank of the tie block: offset + (m + 1) / 2
        (F.col("off") + (F.col("m") + 1) / 2.0).alias("r"),
    )
    x = F.log(F.col("r"))
    y = F.log(F.col("cnt").cast("double"))
    m = F.col("m").cast("double")
    sums = ranked.agg(
        F.sum("m").cast("long").alias("n"),
        F.sum(m * x).alias("sx"),
        F.sum(m * y).alias("sy"),
        F.sum(m * x * y).alias("sxy"),
        F.sum(m * x * x).alias("sxx"),
        F.count("*").cast("long").alias("distinct_freqs"),
        F.sum(F.col("m") * F.col("cnt")).cast("long").alias("total_tokens"),
    )
    nd = F.col("n").cast("double")
    denom = nd * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = (nd * F.col("sxy") - F.col("sx") * F.col("sy")) / denom
    # With a single tie block there is no x-variance: denom is 0 up to
    # float fold noise, so gate on the EXACT block count, not on the
    # float — both engines agree on the integer.
    fit = F.col("distinct_freqs") >= 2
    return sums.select(
        F.col("n").alias("vocab_size"),
        "total_tokens",
        "distinct_freqs",
        F.when(fit, F.round(slope, 6)).alias("slope"),
        F.when(
            fit,
            F.round((F.col("sy") - slope * F.col("sx")) / nd, 6),
        ).alias("intercept"),
    )


def zipf_token_fit(spark, sf_dir):
    (docs,) = load_tables(spark, sf_dir, "documents")
    return zipf_fit_over(docs)


ORACLE_ZIPF = """
WITH tok AS (
  SELECT unnest(list_filter(string_split(text, ' '), w -> w <> '')) AS token
  FROM documents
),
freq AS (SELECT token, count(*)::BIGINT AS cnt FROM tok GROUP BY token),
blocks AS (SELECT cnt, count(*)::BIGINT AS m FROM freq GROUP BY cnt),
ranked AS (
  SELECT cnt, m,
         coalesce(sum(m) OVER (ORDER BY cnt DESC
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING), 0) + (m + 1) / 2.0 AS r
  FROM blocks
),
sums AS (
  SELECT sum(m)::BIGINT AS n,
         sum(m * ln(r)) AS sx,
         sum(m * ln(cnt::DOUBLE)) AS sy,
         sum(m * ln(r) * ln(cnt::DOUBLE)) AS sxy,
         sum(m * ln(r) * ln(r)) AS sxx,
         count(*)::BIGINT AS distinct_freqs,
         sum(m * cnt)::BIGINT AS total_tokens
  FROM ranked
)
SELECT n AS vocab_size, total_tokens, distinct_freqs,
       CASE WHEN distinct_freqs >= 2 THEN
         round((n::DOUBLE * sxy - sx * sy) / (n::DOUBLE * sxx - sx * sx), 6)
       END AS slope,
       CASE WHEN distinct_freqs >= 2 THEN
         round((sy - ((n::DOUBLE * sxy - sx * sy)
                      / (n::DOUBLE * sxx - sx * sx)) * sx) / n::DOUBLE, 6)
       END AS intercept
FROM sums
"""

QUERIES = {"zipf_token_fit": zipf_token_fit}
ORACLES = {"zipf_token_fit": ORACLE_ZIPF}
