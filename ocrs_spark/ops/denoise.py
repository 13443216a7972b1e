"""T5-style span-corruption training samples from the documents corpus.

The denoising objective behind T5/UL2 turns every document into an
(input, target) pair: ~1/8 of tokens are masked, CONTIGUOUS masked runs
collapse to one ``<extra_id_n>`` sentinel in the input, and the target
replays each sentinel followed by the tokens it hid. Building these
pairs is a corpus-scale batch job in real training pipelines — exactly
the shape this engine is for.

Determinism instead of RNG: a token is masked iff the first hex digit
of ``md5(doc_id || ':' || pos)`` is 0 or 1 (rate 2/16 = 1/8). md5 is
bit-identical in Spark and DuckDB, so the DuckDB oracle reproduces the
EXACT masking, run structure, and sentinel numbering — the same trick
the dedup rows use for content hashes, applied to sampling.

Plan shape (all hash-partitioned on doc_id, so the explode -> window ->
re-aggregate chain is ONE shuffle family, AQE-coalesced): posexplode
tokens, lag() to find run starts, a running sum for 0-based sentinel
ids, then one groupBy(doc_id) rebuilding both strings from
(pos, piece) structs via array_sort — collect_list drops the null
pieces (run continuations in the input; unmasked tokens in the target)
before the sort, so nothing quadratic happens per document. At 100 TB
the per-doc state is bounded by document length; no global sort, no
driver participation.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

MASK_HEX = ("0", "1")  # first md5 hex digit -> mask rate 2/16 = 1/8


def span_corruption_samples(spark, sf_dir: str):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    tok = docs.select(
        "doc_id",
        F.posexplode(F.split("text", " ")).alias("pos", "tok"),
    )
    digest = F.md5(
        F.concat_ws(
            ":", F.col("doc_id").cast("string"), F.col("pos").cast("string")
        )
    )
    tok = tok.withColumn("mask", F.substring(digest, 1, 1).isin(*MASK_HEX))
    w = Window.partitionBy("doc_id").orderBy("pos")
    run_start = F.col("mask") & ~F.lag("mask", 1, False).over(w)
    tok = tok.withColumn("run_start", run_start).withColumn(
        "sentinel",
        F.sum(F.col("run_start").cast("int")).over(w) - F.lit(1),
    )
    ext = F.concat(
        F.lit("<extra_id_"), F.col("sentinel").cast("string"), F.lit(">")
    )
    pieces = tok.select(
        "doc_id",
        "pos",
        F.when(~F.col("mask"), F.col("tok"))
        .when(F.col("run_start"), ext)
        .alias("inp"),
        F.when(
            F.col("mask") & F.col("run_start"),
            F.concat(ext, F.lit(" "), F.col("tok")),
        )
        .when(F.col("mask"), F.col("tok"))
        .alias("tgt"),
    )

    def _joined(col: str):
        structs = F.when(
            F.col(col).isNotNull(), F.struct("pos", F.col(col).alias("piece"))
        )
        return F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(structs)), lambda x: x["piece"]
            ),
        )

    return pieces.groupBy("doc_id").agg(
        _joined("inp").alias("input"), _joined("tgt").alias("target")
    )


ORACLE_SPAN_CORRUPTION = """
WITH tok AS (
  SELECT doc_id,
         unnest(string_split(text, ' ')) AS tok,
         (generate_subscripts(string_split(text, ' '), 1) - 1)::BIGINT AS pos
  FROM documents
), m AS (
  SELECT *,
         substr(md5(doc_id::VARCHAR || ':' || pos::VARCHAR), 1, 1)
           IN ('0', '1') AS mask
  FROM tok
), rs AS (
  SELECT *,
         (mask AND NOT coalesce(
            lag(mask) OVER (PARTITION BY doc_id ORDER BY pos), FALSE)
         ) AS run_start
  FROM m
), r AS (
  SELECT *,
         SUM(CASE WHEN run_start THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY pos
                 ROWS UNBOUNDED PRECEDING) - 1 AS sentinel
  FROM rs
), pieces AS (
  SELECT doc_id, pos,
         CASE WHEN NOT mask THEN tok
              WHEN run_start THEN '<extra_id_' || sentinel::VARCHAR || '>'
         END AS inp,
         CASE WHEN mask AND run_start
                THEN '<extra_id_' || sentinel::VARCHAR || '> ' || tok
              WHEN mask THEN tok
         END AS tgt
  FROM r
)
SELECT doc_id,
       coalesce(string_agg(inp, ' ' ORDER BY pos)
                FILTER (WHERE inp IS NOT NULL), '') AS input,
       coalesce(string_agg(tgt, ' ' ORDER BY pos)
                FILTER (WHERE tgt IS NOT NULL), '') AS target
FROM pieces
GROUP BY doc_id
"""


QUERIES = {
    "span_corruption_samples": span_corruption_samples,
}

ORACLES = {
    "span_corruption_samples": ORACLE_SPAN_CORRUPTION,
}
