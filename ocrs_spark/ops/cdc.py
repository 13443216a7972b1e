"""Content-defined chunking dedup (the LBFS/FastCDC family): split
every document at positions where a W-char windowed fingerprint hits
``hash % D == 0``, hash each variable-size chunk, and measure how much
of each document is made of corpus-duplicated chunks. This is the
storage-layer complement to the token-level dedup family: substrdedup
localizes duplicated W-gram SPANS, CDC measures what a chunk-store
(backup dedup, CAS blob store, training-shard delta encoding) would
actually deduplicate — boundaries move WITH content, so an insertion
near the head of a shared passage shifts every byte offset yet leaves
all downstream chunk hashes identical (the whole point of CDC vs
fixed-size blocks).

This is the clamp-free LBFS boundary rule: a position is a boundary
iff its window fingerprint divides, independent of every other
position. The published FastCDC adds min/max chunk-length clamps,
which make the split SEQUENTIAL (each boundary depends on the
previous accept) — that variant belongs in an Arrow-batched
mapInPandas leg; the positional rule keeps the whole operator in
engine-native expressions with an exact cross-engine oracle, and its
expected chunk size is the same D.

Plan shape at 100 TB: one explode to O(doc_len) window positions that
immediately filters to ~1/D boundary rows (the filter sits directly
on the generate, so nothing corpus-length-sized is ever shuffled),
one join back to documents keyed on doc_id to cut chunk substrings,
one groupBy on the chunk hash (uniform md5 keys) for corpus-wide
counts, and one per-doc rollup. The md5-prefix fingerprint stands in
for LBFS's Rabin polynomial — same role, engine-parity-exact (the
cross-engine int idiom shared with dsir.py/dedup.py)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from . import load_tables

CDC_W = 8   # fingerprint window (chars)
CDC_D = 16  # divisor: expected chunk size ~= D chars


def cdc_chunk_dedup(spark, sf_dir):
    """(doc_id, n_chunks, dup_chunks, dup_chunk_frac) per document:
    chunks whose hash occurs >= 2 times corpus-wide count as
    duplicated."""
    (docs,) = load_tables(spark, sf_dir, "documents")
    # r6: boundary detection + chunk hashing run in ONE Arrow-batched
    # pass (guide §4.2). The former shape exploded a row per character
    # position and evaluated the window md5 through the interpreted
    # JVM expression path, then paid union -> DISTINCT -> per-doc
    # lag() window -> join-back-to-documents (four corpus-granularity
    # exchanges) to cut chunks; hashlib's C md5 over the same windows
    # is ~5x cheaper per call (measured 3.1 s -> 0.9 s at sf0.1), and
    # nothing leaves the row until the ~n/D chunk hashes explode for
    # the corpus-wide duplication count. Hash inputs are unchanged:
    # char-indexed windows/chunks, UTF-8 bytes into md5 — the oracle
    # sweep pins byte-identity at every SF.
    # Window end positions (1-based): i in [W, n]; a position is a
    # boundary iff the window fingerprint divides. Every doc gets a
    # terminal boundary at n so the tail always forms a chunk.
    def _chunk_batches(batches):
        import hashlib

        import pandas as pd

        md5 = hashlib.md5
        for pdf in batches:
            doc_ids: list = []
            hashes: list = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                n = len(text)
                prev = 0
                for i in range(CDC_W, n + 1):
                    if (
                        int(md5(text[i - CDC_W : i].encode()).hexdigest()[:8], 16)
                        % CDC_D
                        == 0
                    ):
                        doc_ids.append(doc_id)
                        hashes.append(md5(text[prev:i].encode()).hexdigest())
                        prev = i
                if prev != n or n == 0:
                    doc_ids.append(doc_id)
                    hashes.append(md5(text[prev:n].encode()).hexdigest())
            yield pd.DataFrame({"doc_id": doc_ids, "h": hashes})

    chunks = (
        docs.select("doc_id", "text")
        .repartition(spark.sparkContext.defaultParallelism)
        .mapInPandas(_chunk_batches, schema="doc_id bigint, h string")
    )
    # Corpus-wide duplication test as ONE window over the hash-keyed
    # exchange (the substrdedup idiom) — an aggregate-then-self-join
    # would re-run the whole boundary/substring chain for each side
    # and shuffle the corpus-scale chunk table twice.
    per_doc = (
        chunks.withColumn(
            "cnt", F.count(F.lit(1)).over(Window.partitionBy("h"))
        )
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_chunks"),
            F.sum(F.when(F.col("cnt") > 1, 1).otherwise(0))
            .cast("long")
            .alias("dup_chunks"),
        )
        .withColumn(
            "dup_chunk_frac",
            F.round(F.col("dup_chunks") / F.col("n_chunks"), 6),
        )
    )
    # Every doc has >= 1 chunk (the terminal boundary), so the rollup
    # already covers all documents — no left-join resurrection needed.
    return per_doc.select("doc_id", "n_chunks", "dup_chunks", "dup_chunk_frac")


ORACLE_CDC = f"""
WITH pos AS (
  SELECT doc_id, unnest([i for i in range({CDC_W},
           greatest(length(text), {CDC_W - 1}) + 1)]) AS i
  FROM documents
  WHERE length(text) >= {CDC_W}
),
hits AS (
  SELECT p.doc_id, p.i::BIGINT AS b
  FROM pos p JOIN documents d USING (doc_id)
  WHERE ('0x' || substr(md5(substr(d.text, p.i - {CDC_W} + 1, {CDC_W})), 1, 8))::BIGINT
        % {CDC_D} = 0
),
bounds AS (
  SELECT DISTINCT doc_id, b FROM (
    SELECT doc_id, b FROM hits
    UNION ALL
    SELECT doc_id, length(text)::BIGINT AS b FROM documents
  )
),
chunks AS (
  SELECT bd.doc_id,
         md5(substr(d.text,
                    (coalesce(lag(bd.b) OVER (PARTITION BY bd.doc_id ORDER BY bd.b), 0) + 1)::INT,
                    (bd.b - coalesce(lag(bd.b) OVER (PARTITION BY bd.doc_id ORDER BY bd.b), 0))::INT))
           AS h
  FROM bounds bd JOIN documents d USING (doc_id)
),
counted AS (
  SELECT doc_id, count(*) OVER (PARTITION BY h) AS cnt FROM chunks
)
SELECT doc_id,
       count(*)::BIGINT AS n_chunks,
       sum(CASE WHEN cnt > 1 THEN 1 ELSE 0 END)::BIGINT AS dup_chunks,
       round(sum(CASE WHEN cnt > 1 THEN 1 ELSE 0 END)::DOUBLE / count(*), 6)
         AS dup_chunk_frac
FROM counted
GROUP BY doc_id
"""

QUERIES = {"cdc_chunk_dedup": cdc_chunk_dedup}
ORACLES = {"cdc_chunk_dedup": ORACLE_CDC}
