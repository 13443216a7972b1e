"""PII detection and redaction over the document corpus.

Standard training-data hygiene (the C4/RefinedWeb-style scrub):
find emails, IPv4 addresses, and phone-shaped digit runs, count them
per document, and rewrite the text with typed placeholder tokens.
Everything is Catalyst ``regexp_count``/``regexp_replace`` — JVM-side,
whole-stage codegen, zero Python in the row path, so the op is a pure
scan at 100 TB. Patterns stay inside the RE2-compatible subset (no
lookarounds, no backrefs) so the DuckDB oracle runs the IDENTICAL
regexes; replacement order (email -> ip -> phone) is fixed and the
patterns cannot overlap each other's replacements.

The synthetic corpus contains no natural PII, which would make the op
vacuously green — so BOTH engines plant deterministic PII into the
same documents first (doc_id-derived, the ``planted_embeddings`` house
pattern): every 7th doc gains an email, every 11th an IP, every 13th a
phone number. The hash check then proves detection AND redaction byte
for byte.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from . import load_tables

EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
IPV4_RE = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
PHONE_RE = "\\b\\+?[0-9]{3}-[0-9]{3}-[0-9]{4}\\b"


def planted_pii(docs):
    """Deterministically append PII to a doc_id-derived subset."""
    email = F.concat(
        F.lit(" contact user"), F.col("doc_id").cast("string"), F.lit("@example.com")
    )
    ip = F.concat(
        F.lit(" from 192.168."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit("."),
        (F.col("doc_id") % 100).cast("string"),
    )
    phone = F.concat(
        F.lit(" call 555-010-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    text = F.col("text")
    text = F.when(F.col("doc_id") % 7 == 0, F.concat(text, email)).otherwise(text)
    text = F.when(F.col("doc_id") % 11 == 0, F.concat(text, ip)).otherwise(text)
    text = F.when(F.col("doc_id") % 13 == 0, F.concat(text, phone)).otherwise(text)
    return docs.select("doc_id", text.alias("text"))


def redact(text_col):
    """Typed-placeholder rewrite, fixed order."""
    out = F.regexp_replace(text_col, EMAIL_RE, "<EMAIL>")
    out = F.regexp_replace(out, IPV4_RE, "<IP>")
    out = F.regexp_replace(out, PHONE_RE, "<PHONE>")
    return out


def pii_redaction(spark, sf_dir):
    """(doc_id, n_emails, n_ips, n_phones, redacted) over the planted
    corpus: per-type counts + the fully redacted text."""
    (docs,) = load_tables(spark, sf_dir, "documents")
    planted = planted_pii(docs)
    t = F.col("text")
    return planted.select(
        "doc_id",
        F.regexp_count(t, F.lit(EMAIL_RE)).cast("long").alias("n_emails"),
        F.regexp_count(t, F.lit(IPV4_RE)).cast("long").alias("n_ips"),
        F.regexp_count(t, F.lit(PHONE_RE)).cast("long").alias("n_phones"),
        redact(t).alias("redacted"),
    )


ORACLE_PII = f"""
WITH planted AS (
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 7 = 0
                 THEN ' contact user' || doc_id || '@example.com' ELSE '' END
         || CASE WHEN doc_id % 11 = 0
                 THEN ' from 192.168.' || (doc_id % 256) || '.' || (doc_id % 100)
                 ELSE '' END
         || CASE WHEN doc_id % 13 = 0
                 THEN ' call 555-010-' || lpad((doc_id % 10000)::VARCHAR, 4, '0')
                 ELSE '' END AS text
  FROM documents
)
SELECT doc_id,
       len(regexp_extract_all(text, '{EMAIL_RE}'))::BIGINT AS n_emails,
       len(regexp_extract_all(text, '{IPV4_RE}'))::BIGINT AS n_ips,
       len(regexp_extract_all(text, '{PHONE_RE}'))::BIGINT AS n_phones,
       regexp_replace(
         regexp_replace(
           regexp_replace(text, '{EMAIL_RE}', '<EMAIL>', 'g'),
           '{IPV4_RE}', '<IP>', 'g'),
         '{PHONE_RE}', '<PHONE>', 'g') AS redacted
FROM planted
"""

QUERIES = {"pii_redaction": pii_redaction}
ORACLES = {"pii_redaction": ORACLE_PII}
