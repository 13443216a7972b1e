"""Subtitle (SRT) parsing + frame-to-cue alignment — the video-text
pairing stage of a multimodal training pipeline: every sampled video
frame needs the caption text on screen at its timestamp.

Each document synthesizes a real SRT transcript (cue index line,
``HH:MM:SS,mmm --> HH:MM:SS,mmm`` time line with SRT's comma decimal
separator, text line, blank separator) ENTIRELY IN ENGINE EXPRESSIONS
from an integer rule, then PARSES IT BACK with regexp field extraction
and exact ms arithmetic — both engines round-trip the same text, and a
pytest contract re-parses the Spark-built SRT with an independent
Python parser so a format+parse bug that cancels itself inside one
engine still gets caught.

Alignment: frame f of the doc's video (ops/video.py timing rule:
t_ms = f * usec_per_frame // 1000) matches cue j iff
start_ms <= t < end_ms. Cues are non-overlapping by construction, so
aligned-frame counting needs no distinct.

Scale: everything is per-document — the SRT build/parse is ONE
projection (transform/filter/aggregate over the doc's own cue array,
zero shuffles, zero joins), and the frame-cue alignment stays inside
the same projection by counting matches per frame with a nested
exists() instead of exploding a frames x cues join. The only shuffle
anywhere is none at all: the op is scan -> project.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from . import load_tables
from .video import _USEC

# Cue timing sized to the video ops' frame clock (33-42 ms/frame,
# 4-15 frames => ~0.1-0.6 s of footage): cues every 60 ms, 45 ms long,
# with a per-doc phase — so some frames land inside cues and some in
# the gaps, keeping the alignment non-vacuous in BOTH directions.
CUE_LEN_MS = 45
CUE_GAP_MS = 60


def srt_frame_alignment(spark, sf_dir: str):
    """(doc_id, n_cues, first_cue_ms, last_cue_end_ms, n_frames,
    aligned_frames) — cue fields recovered by PARSING the built SRT
    text, never from the generating rule."""
    (docs,) = load_tables(spark, sf_dir, "documents")
    fmt = (
        "format_string('%02d:%02d:%02d,%03d', CAST({t} div 3600000 AS INT),"
        " CAST(({t} div 60000) % 60 AS INT), CAST(({t} div 1000) % 60 AS INT),"
        " CAST({t} % 1000 AS INT))"
    )
    start = f"(CAST(j AS BIGINT) * {CUE_GAP_MS} + (doc_id % 7) * 10)"
    end = f"({start} + {CUE_LEN_MS})"
    built = docs.select(
        "doc_id",
        F.expr(
            f"""array_join(transform(
                  sequence(0, CAST(3 + doc_id % 4 AS INT) - 1),
                  j -> concat(CAST(j + 1 AS STRING), '\n',
                              {fmt.format(t=start)}, ' --> ',
                              {fmt.format(t=end)}, '\n',
                              'cue ', CAST(doc_id AS STRING), ' ',
                              CAST(j AS STRING), '\n')
                ), '\n')"""
        ).alias("srt"),
    )
    ts2ms = (
        "(CAST(regexp_extract({line}, '^(\\\\d+):(\\\\d+):(\\\\d+),(\\\\d+)"
        " --> ', 1) AS BIGINT) * 3600000"
        " + CAST(regexp_extract({line}, '^(\\\\d+):(\\\\d+):(\\\\d+),(\\\\d+)"
        " --> ', 2) AS BIGINT) * 60000"
        " + CAST(regexp_extract({line}, '^(\\\\d+):(\\\\d+):(\\\\d+),(\\\\d+)"
        " --> ', 3) AS BIGINT) * 1000"
        " + CAST(regexp_extract({line}, '^(\\\\d+):(\\\\d+):(\\\\d+),(\\\\d+)"
        " --> ', 4) AS BIGINT))"
    )
    te2ms = (
        "(CAST(regexp_extract({line}, ' --> (\\\\d+):(\\\\d+):(\\\\d+),"
        "(\\\\d+)$', 1) AS BIGINT) * 3600000"
        " + CAST(regexp_extract({line}, ' --> (\\\\d+):(\\\\d+):(\\\\d+),"
        "(\\\\d+)$', 2) AS BIGINT) * 60000"
        " + CAST(regexp_extract({line}, ' --> (\\\\d+):(\\\\d+):(\\\\d+),"
        "(\\\\d+)$', 3) AS BIGINT) * 1000"
        " + CAST(regexp_extract({line}, ' --> (\\\\d+):(\\\\d+):(\\\\d+),"
        "(\\\\d+)$', 4) AS BIGINT))"
    )
    tline = "split(b, '\n')[1]"
    parsed = built.select(
        "doc_id",
        F.expr(
            f"""transform(
                  filter(split(srt, '\n\n'), b -> b <> ''),
                  b -> named_struct(
                    'start_ms', {ts2ms.format(line=tline)},
                    'end_ms', {te2ms.format(line=tline)})
                )"""
        ).alias("cues"),
    )
    usec = (
        f"(CASE doc_id % 3 WHEN 0 THEN {_USEC[0]} WHEN 1 THEN {_USEC[1]}"
        f" ELSE {_USEC[2]} END)"
    )
    return parsed.select(
        "doc_id",
        F.expr("size(cues)").cast("long").alias("n_cues"),
        F.expr("cues[0].start_ms").cast("long").alias("first_cue_ms"),
        F.expr("cues[size(cues) - 1].end_ms")
        .cast("long")
        .alias("last_cue_end_ms"),
        F.expr("CAST(4 + doc_id % 12 AS BIGINT)").alias("n_frames"),
        F.expr(
            f"""size(filter(
                  sequence(0, CAST(4 + doc_id % 12 AS INT) - 1),
                  f -> exists(cues, c ->
                         c.start_ms <= CAST(f AS BIGINT) * {usec} div 1000
                         AND CAST(f AS BIGINT) * {usec} div 1000
                             < c.end_ms)
                ))"""
        )
        .cast("long")
        .alias("aligned_frames"),
    )


def _oracle_sql() -> str:
    # DuckDB list comprehensions have no let-bindings: the time-line
    # expression (2nd line of each cue block) is inlined everywhere.
    fmt = (
        "printf('%02d:%02d:%02d,%03d', ({t}) // 3600000,"
        " (({t}) // 60000) % 60, (({t}) // 1000) % 60, ({t}) % 1000)"
    )
    start = f"(j * {CUE_GAP_MS} + (doc_id % 7) * 10)"
    end = f"({start} + {CUE_LEN_MS})"
    tl = "string_split(b, chr(10))[2]"
    ts = (
        f"(regexp_extract({tl}, '^(\\d+):(\\d+):(\\d+),(\\d+) --> ', 1)"
        "::BIGINT * 3600000"
        f" + regexp_extract({tl}, '^(\\d+):(\\d+):(\\d+),(\\d+) --> ', 2)"
        "::BIGINT * 60000"
        f" + regexp_extract({tl}, '^(\\d+):(\\d+):(\\d+),(\\d+) --> ', 3)"
        "::BIGINT * 1000"
        f" + regexp_extract({tl}, '^(\\d+):(\\d+):(\\d+),(\\d+) --> ', 4)"
        "::BIGINT)"
    )
    te = (
        f"(regexp_extract({tl}, ' --> (\\d+):(\\d+):(\\d+),(\\d+)$', 1)"
        "::BIGINT * 3600000"
        f" + regexp_extract({tl}, ' --> (\\d+):(\\d+):(\\d+),(\\d+)$', 2)"
        "::BIGINT * 60000"
        f" + regexp_extract({tl}, ' --> (\\d+):(\\d+):(\\d+),(\\d+)$', 3)"
        "::BIGINT * 1000"
        f" + regexp_extract({tl}, ' --> (\\d+):(\\d+):(\\d+),(\\d+)$', 4)"
        "::BIGINT)"
    )
    usec = (
        f"(CASE doc_id % 3 WHEN 0 THEN {_USEC[0]} WHEN 1 THEN {_USEC[1]}"
        f" ELSE {_USEC[2]} END)"
    )
    return f"""
WITH built AS (
  SELECT doc_id,
         list_aggregate(
           [ (j + 1)::VARCHAR || chr(10) || {fmt.format(t=start)}
             || ' --> ' || {fmt.format(t=end)} || chr(10)
             || 'cue ' || doc_id::VARCHAR || ' ' || j::VARCHAR || chr(10)
             FOR j IN range(3 + doc_id % 4) ],
           'string_agg', chr(10)) AS srt
  FROM documents
),
parsed AS (
  SELECT doc_id,
         [ struct_pack(start_ms := {ts}, end_ms := {te})
           FOR b IN list_filter(string_split(srt, chr(10) || chr(10)),
                                b -> b <> '') ] AS cues
  FROM built
)
SELECT doc_id,
       len(cues)::BIGINT AS n_cues,
       cues[1].start_ms::BIGINT AS first_cue_ms,
       cues[len(cues)].end_ms::BIGINT AS last_cue_end_ms,
       (4 + doc_id % 12)::BIGINT AS n_frames,
       len(list_filter(range(4 + doc_id % 12),
           f -> len(list_filter(cues,
                  c -> c.start_ms <= f * {usec} // 1000
                       AND f * {usec} // 1000 < c.end_ms)) > 0))
         ::BIGINT AS aligned_frames
FROM parsed
"""


QUERIES = {"srt_frame_alignment": srt_frame_alignment}
ORACLES = {"srt_frame_alignment": _oracle_sql()}
