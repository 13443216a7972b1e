"""Sliding-window document chunking — fixed-token windows with stride.

Pretraining and retrieval pipelines shape long documents into
fixed-size token windows with overlap (HF ``return_overflowing_tokens``
semantics): window k covers tokens [k*STRIDE, k*STRIDE + CHUNK), and
windows are emitted for k in [0, n_chunks) with

    n_chunks = 1 + ceil(max(n_tokens - CHUNK, 0) / STRIDE)

so every token is covered, consecutive windows overlap by
CHUNK - STRIDE, and the final window may be short. Tokens are
whitespace tokens (the corpus-wide convention of ``textstats``).

Scale shape: pure expression stage — regexp split, arithmetic window
count, ``explode(sequence(...))``, ``slice`` + ``array_join`` — all
whole-stage codegen, no shuffle at all (chunking is embarrassingly
row-local; the output lands partitioned exactly like the input, which
is what a downstream tokenize-and-pack stage wants). Fan-out is bounded
by n_tokens/STRIDE per row, so there is no skew amplification beyond
the document-length skew already present in the corpus.

The DuckDB oracle recomputes the same windows with
``generate_series`` + 1-based list slicing — independent implementation
of the same convention, so boundary arithmetic (short finals, the
single-window short-doc case) is pinned value-by-value.
"""

from __future__ import annotations

from pyspark.sql import functions as F

CHUNK = 64
STRIDE = 48


def chunk_windows_df(docs, text_col: str = "text", id_col: str = "doc_id"):
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n_chunks = F.ceil(
        (F.greatest(F.size(toks) - CHUNK, F.lit(0))) / F.lit(float(STRIDE))
    ) + F.lit(1)
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        toks.alias("toks"),
        F.explode(F.sequence(F.lit(0).cast("bigint"), n_chunks - 1)).alias(
            "chunk_idx"
        ),
    )
    chunk = F.slice(
        F.col("toks"), (F.col("chunk_idx") * STRIDE + 1).cast("int"), CHUNK
    )
    return base.select(
        "doc_id",
        "chunk_idx",
        F.size(chunk).cast("bigint").alias("n_chunk_tokens"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )


def chunk_windows(spark, sf_dir: str):
    """(doc_id, chunk_idx, n_chunk_tokens, chunk_text): every document
    reshaped into CHUNK-token windows at STRIDE spacing."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return chunk_windows_df(docs)


ORACLE_CHUNKS = f"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
  FROM documents
), sized AS (
  SELECT doc_id, t,
         1 + CAST(ceil(greatest(len(t) - {CHUNK}, 0) / {STRIDE}.0) AS BIGINT)
           AS n_chunks
  FROM toks
)
SELECT doc_id,
       k AS chunk_idx,
       CAST(len(t[k*{STRIDE}+1 : k*{STRIDE}+{CHUNK}]) AS BIGINT)
         AS n_chunk_tokens,
       array_to_string(t[k*{STRIDE}+1 : k*{STRIDE}+{CHUNK}], ' ')
         AS chunk_text
FROM sized, UNNEST(generate_series(0, n_chunks - 1)) AS u(k)
"""

QUERIES = {"chunk_windows": chunk_windows}
ORACLES = {"chunk_windows": ORACLE_CHUNKS}
