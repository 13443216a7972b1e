"""Text analysis operators: language-ID (marker-lexicon heuristic),
quality scoring, token counting (whitespace + BPE-ish regex), and
document fingerprinting (bottom-k shingle sketch).

All expressions are Catalyst built-ins (no Python UDFs): these run
JVM-side inside whole-stage codegen, which is what makes them viable
over a 100 TB corpus.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from . import load_tables

# Marker lexicons for the pseudo-language classifier (the corpus text is
# synthetic; the point is the classification plumbing, not linguistics).
LEXICONS = {
    "dbish": ("scan", "join", "filter", "sort", "hash", "merge"),
    "sparkish": ("spark", "batch", "row", "query", "shuffle", "partition"),
    "commonish": ("the", "small", "slow", "fast", "a", "of"),
}

TOKEN_REGEX = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

_FINGERPRINT_K = 4

_DUCK_SHINGLES = (
    "[string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1] || ' ' ||"
    " string_split(text, ' ')[i+2]"
    " for i in range(1, greatest(len(string_split(text, ' ')) - 2, 0) + 1)]"
)


def _in_list(words) -> str:
    return ", ".join(f"'{w}'" for w in words)


def _marker_count(words):
    """Count tokens of split(text, ' ') that equal one of ``words``,
    multiplicity included, as ONE codegen'd regexp_count — Catalyst
    evaluates higher-order ``filter(split(...), t -> t IN ...)`` lambdas
    interpreted per token, a per-token interpreter tax at corpus scale.
    The text is space-padded so every token has a literal leading space
    to consume and a trailing one to LOOK AHEAD at (not consume) — the
    middle space in 'a a' is both the first token's right boundary and
    the second's left, so consuming it would undercount adjacent hits.
    Words are plain [a-z]+ so no regex-escaping is needed.
    """
    alts = "|".join(words)
    padded = F.concat(F.lit(" "), F.col("text"), F.lit(" "))
    return F.regexp_count(padded, F.lit(f" (?:{alts})(?= )")).cast("long")


def lang_id_markers(spark, sf_dir):
    """Marker-count language ID: count lexicon hits per doc, classify by
    max count with deterministic tie-break (lexicon name order)."""
    (docs,) = load_tables(spark, sf_dir, "documents")
    df = docs
    names = sorted(LEXICONS)
    for name in names:
        df = df.withColumn(f"c_{name}", _marker_count(LEXICONS[name]))
    best = F.greatest(*[F.col(f"c_{n}") for n in names])
    pred = F.when(best == 0, F.lit("und"))
    for n in names:
        pred = pred.when(F.col(f"c_{n}") == best, F.lit(n))
    return df.select(
        "doc_id", pred.alias("pred_lang"), best.alias("marker_hits")
    )


def _duck_lang_sql() -> str:
    names = sorted(LEXICONS)
    counts = ", ".join(
        f"len(list_filter(string_split(text, ' '), t -> t IN ({_in_list(LEXICONS[n])}))) AS c_{n}"
        for n in names
    )
    best = f"greatest({', '.join('c_' + n for n in names)})"
    case = "CASE WHEN best = 0 THEN 'und' " + " ".join(
        f"WHEN c_{n} = best THEN '{n}'" for n in names
    ) + " END"
    return f"""
WITH counts AS (SELECT doc_id, {counts} FROM documents),
scored AS (SELECT *, {best} AS best FROM counts)
SELECT doc_id, {case} AS pred_lang, best AS marker_hits FROM scored
"""


ORACLE_LANG_ID = _duck_lang_sql()

_STOPWORDS = ("the", "a", "of", "and", "in")


def quality_score(spark, sf_dir):
    """Heuristic quality features: char/token counts, mean token length,
    stopword ratio, and a keep/drop flag — the standard pre-training
    corpus filter shape."""
    (docs,) = load_tables(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    n_tokens = F.size(toks).cast("long")
    n_chars = F.length("text").cast("long")
    n_stop = _marker_count(_STOPWORDS)
    mean_tok = F.round(
        F.length(F.regexp_replace("text", " ", "")) / n_tokens, 3
    )
    stop_ratio = F.round(n_stop / n_tokens, 3)
    return docs.select(
        "doc_id",
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        mean_tok.alias("mean_token_len"),
        stop_ratio.alias("stopword_ratio"),
        ((n_tokens >= 10) & (n_tokens <= 200) & (stop_ratio > 0.02)).alias("keep"),
    )


ORACLE_QUALITY = f"""
SELECT doc_id,
       length(text) AS n_chars,
       len(string_split(text, ' ')) AS n_tokens,
       round(length(replace(text, ' ', '')) / len(string_split(text, ' ')), 3) AS mean_token_len,
       round(len(list_filter(string_split(text, ' '), t -> t IN ({_in_list(_STOPWORDS)})))
             / len(string_split(text, ' ')), 3) AS stopword_ratio,
       (len(string_split(text, ' ')) BETWEEN 10 AND 200
        AND round(len(list_filter(string_split(text, ' '), t -> t IN ({_in_list(_STOPWORDS)})))
                  / len(string_split(text, ' ')), 3) > 0.02) AS keep
FROM documents
"""


def token_counts(spark, sf_dir):
    """Whitespace token count + BPE-ish regex token count (letters runs,
    digit runs, single punctuation)."""
    (docs,) = load_tables(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), "\\s+")).cast("long").alias("ws_tokens"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(TOKEN_REGEX), F.lit(0)))
        .cast("long")
        .alias("re_tokens"),
    )


ORACLE_TOKEN_COUNTS = f"""
SELECT doc_id,
       len(regexp_split_to_array(trim(text), '\\s+')) AS ws_tokens,
       len(regexp_extract_all(text, '{TOKEN_REGEX}')) AS re_tokens
FROM documents
"""


def doc_fingerprint(spark, sf_dir):
    """Bottom-k sketch fingerprint: the 4 lexicographically-smallest md5s
    of the doc's distinct word 3-shingles, pipe-joined. Equal
    fingerprints => near-identical prefixes of the shingle hash order —
    a compact dedup/lineage key. Computed by the single-pass Arrow
    signature kernel (see dedup._signatures_udf; doc_fingerprint_agg is
    the aggregate-form parity reference)."""
    from .dedup import _narrow_docs, _signatures_udf

    sig = _signatures_udf(simhash=False)
    return (
        _narrow_docs(spark, sf_dir)
        .select(
            "doc_id", sig("text").getField("fingerprint").alias("fingerprint")
        )
        .filter(F.col("fingerprint").isNotNull())
    )


def doc_fingerprint_agg(spark, sf_dir):
    """Explode/groupBy fingerprint: the semantically-canonical parity
    reference for the Arrow kernel. Pays an exploded per-shingle
    shuffle the narrow form avoids."""
    from .dedup import shingles_df

    (docs,) = load_tables(spark, sf_dir, "documents")
    sh = shingles_df(docs).select("doc_id", F.md5("s").alias("h")).distinct()
    return sh.groupBy("doc_id").agg(
        F.array_join(
            F.slice(F.array_sort(F.collect_set("h")), 1, _FINGERPRINT_K), "|"
        ).alias("fingerprint")
    )


ORACLE_FINGERPRINT = f"""
WITH sh AS (
  SELECT DISTINCT doc_id, md5(unnest({_DUCK_SHINGLES})) AS h FROM documents
),
ranked AS (
  SELECT doc_id, h, row_number() OVER (PARTITION BY doc_id ORDER BY h) AS rn FROM sh
)
SELECT doc_id, string_agg(h, '|' ORDER BY h) AS fingerprint
FROM ranked WHERE rn <= {_FINGERPRINT_K} GROUP BY doc_id
"""



def text_profile(spark, sf_dir):
    """One-scan per-document text profile: language ID, quality
    features, and both token counts fused into a single narrow
    projection. This is the driver-contract consolidation of
    ``lang_id_markers`` / ``quality_score`` / ``token_counts`` (each
    still exposed and oracle-tested individually in pytest) — and one
    pass over the corpus instead of three is also the plan a 100-TB
    profiling job wants."""
    (docs,) = load_tables(spark, sf_dir, "documents")
    names = sorted(LEXICONS)
    df = docs
    for name in names:
        df = df.withColumn(f"c_{name}", _marker_count(LEXICONS[name]))
    best = F.greatest(*[F.col(f"c_{n}") for n in names])
    pred = F.when(best == 0, F.lit("und"))
    for n in names:
        pred = pred.when(F.col(f"c_{n}") == best, F.lit(n))
    toks = F.split(F.col("text"), " ")
    n_tokens = F.size(toks).cast("long")
    n_chars = F.length("text").cast("long")
    n_stop = _marker_count(_STOPWORDS)
    mean_tok = F.round(
        F.length(F.regexp_replace("text", " ", "")) / n_tokens, 3
    )
    stop_ratio = F.round(n_stop / n_tokens, 3)
    return df.select(
        "doc_id",
        pred.alias("pred_lang"),
        best.alias("marker_hits"),
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        mean_tok.alias("mean_token_len"),
        stop_ratio.alias("stopword_ratio"),
        ((n_tokens >= 10) & (n_tokens <= 200) & (stop_ratio > 0.02)).alias("keep"),
        F.size(F.split(F.trim(F.col("text")), "\\s+")).cast("long").alias("ws_tokens"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(TOKEN_REGEX), F.lit(0)))
        .cast("long")
        .alias("re_tokens"),
    )


def _duck_profile_sql() -> str:
    names = sorted(LEXICONS)
    counts = ", ".join(
        f"len(list_filter(string_split(text, ' '), t -> t IN ({_in_list(LEXICONS[n])}))) AS c_{n}"
        for n in names
    )
    best = f"greatest({', '.join('c_' + n for n in names)})"
    case = "CASE WHEN best = 0 THEN 'und' " + " ".join(
        f"WHEN c_{n} = best THEN '{n}'" for n in names
    ) + " END"
    stop = (
        f"len(list_filter(string_split(text, ' '), t -> t IN ({_in_list(_STOPWORDS)})))"
    )
    return f"""
WITH counts AS (SELECT doc_id, text, {counts} FROM documents),
scored AS (SELECT *, {best} AS best FROM counts)
SELECT doc_id, {case} AS pred_lang, best AS marker_hits,
       length(text) AS n_chars,
       len(string_split(text, ' ')) AS n_tokens,
       round(length(replace(text, ' ', '')) / len(string_split(text, ' ')), 3) AS mean_token_len,
       round({stop} / len(string_split(text, ' ')), 3) AS stopword_ratio,
       (len(string_split(text, ' ')) BETWEEN 10 AND 200
        AND round({stop} / len(string_split(text, ' ')), 3) > 0.02) AS keep,
       len(regexp_split_to_array(trim(text), '\\s+')) AS ws_tokens,
       len(regexp_extract_all(text, '{TOKEN_REGEX}')) AS re_tokens
FROM scored
"""


ORACLE_TEXT_PROFILE = _duck_profile_sql()


def tfidf_top_terms(spark, sf_dir):
    """Top-3 terms per document by TF-IDF (tf * ln(N / df), rounded to
    6): the classic training-corpus keyword/feature extraction op. All
    Catalyst built-ins — explode, two grouped aggregates, a broadcast
    1-row corpus count, and a per-document window (partitioned by
    doc_id, so no global funnel at scale)."""
    from pyspark.sql import Window

    (docs,) = load_tables(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("tok")
    )
    tf = toks.groupBy("doc_id", "tok").agg(F.count("*").alias("tf"))
    df = toks.groupBy("tok").agg(F.countDistinct("doc_id").alias("df"))
    n = docs.agg(F.count("*").alias("n"))
    scored = (
        tf.join(df, "tok")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "tfidf", F.round(F.col("tf") * F.log(F.col("n") / F.col("df")), 6)
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("tok"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 3)
        .select("doc_id", F.col("tok").alias("term"), "rank", "tfidf")
    )


ORACLE_TFIDF = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
),
tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY 1, 2),
df AS (SELECT tok, count(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
n AS (SELECT count(*) AS n FROM documents),
scored AS (
  SELECT doc_id, tok, round(tf * ln(n / df), 6) AS tfidf
  FROM tf JOIN df USING (tok) CROSS JOIN n
)
SELECT doc_id, tok AS term, rank, tfidf
FROM (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, tok ASC) AS rank
      FROM scored)
WHERE rank <= 3
"""


# ---------------------------------------------------------------------------
# Unicode text cleaning: NFC normalization + control/format-char strip +
# whitespace collapse — the first pass of any multilingual training-data
# pipeline (mojibake-adjacent NFD sequences, zero-width joiners, stray
# control bytes all break tokenizer and dedup keys). The corpus plants
# four deterministic messiness variants; variant 0's oracle applies
# DuckDB's OWN nfc_normalize (ICU) against Python's unicodedata NFC, so
# two independent Unicode implementations must agree on the composed
# form. Arrow-batched pandas UDF per document, no shuffle.

_MESSY_TEXT = (
    "CASE CAST(doc_id % 4 AS INT) "
    # NFD suffix: 'Cafe' + COMBINING ACUTE (U+0301) must compose
    "WHEN 0 THEN concat(text, ' Cafe\u0301') "
    # control char (BEL) + zero-width space prefix: stripped
    "WHEN 1 THEN concat('\u0007\u200b', text) "
    # doubled spaces: collapsed
    "WHEN 2 THEN regexp_replace(text, ' ', '  ') "
    # tab/space padding + trailing zero-width joiner: trimmed + stripped
    "ELSE concat('\t ', text, ' \u200d') END"
)


def _clean_series(s):
    import re as _re
    import unicodedata as _ud

    def one(t: str) -> str:
        t = _ud.normalize("NFC", t)
        t = "".join(
            ch
            for ch in t
            if ch in " \t\n" or _ud.category(ch) not in ("Cc", "Cf")
        )
        return _re.sub(r"[ \t\n]+", " ", t).strip()

    return s.map(one)


def text_clean(spark, sf_dir):
    from pyspark.sql.functions import pandas_udf

    (docs,) = load_tables(spark, sf_dir, "documents")
    clean = pandas_udf(_clean_series, "string")
    return docs.select(
        "doc_id",
        clean(F.expr(_MESSY_TEXT)).alias("clean_text"),
    )


ORACLE_TEXT_CLEAN = """
SELECT doc_id,
  CASE CAST(doc_id % 4 AS INT)
   WHEN 0 THEN nfc_normalize(text || ' Cafe' || chr(769))
   ELSE text
  END AS clean_text
FROM documents
"""


QUERIES = {
    "lang_id_markers": lang_id_markers,
    "text_clean": text_clean,
    "quality_score": quality_score,
    "token_counts": token_counts,
    "text_profile": text_profile,
    "doc_fingerprint": doc_fingerprint,
    "doc_fingerprint_agg": doc_fingerprint_agg,
    "tfidf_top_terms": tfidf_top_terms,
}

ORACLES = {
    "lang_id_markers": ORACLE_LANG_ID,
    "quality_score": ORACLE_QUALITY,
    "token_counts": ORACLE_TOKEN_COUNTS,
    "text_profile": ORACLE_TEXT_PROFILE,
    "doc_fingerprint": ORACLE_FINGERPRINT,
    "doc_fingerprint_agg": ORACLE_FINGERPRINT,
    "tfidf_top_terms": ORACLE_TFIDF,
}
