"""Contracts for SRT parsing + frame alignment (ops/subtitles.py):
an INDEPENDENT Python SRT parser re-parses the Spark-built transcript
text (so a format+parse bug cancelling inside one engine still gets
caught), plus a from-scratch alignment recompute and the boundary
semantics of the [start, end) cue interval.
"""

import re

import pyspark.sql.functions as F

from ocrs_spark.ops.subtitles import (
    CUE_GAP_MS,
    CUE_LEN_MS,
    srt_frame_alignment,
)
from ocrs_spark.ops.video import _USEC, _n_frames, _usec_per_frame
from ocrs_spark.ops import load_tables

SF = "/root/testdata/sf0.001"

_TIME = re.compile(
    r"^(\d\d):(\d\d):(\d\d),(\d\d\d) --> (\d\d):(\d\d):(\d\d),(\d\d\d)$"
)


def _parse_srt(text):
    """Independent parser: strict two-digit/three-digit SRT fields."""
    cues = []
    for block in [b for b in text.split("\n\n") if b]:
        lines = block.split("\n")
        m = _TIME.match(lines[1])
        assert m, f"bad time line: {lines[1]!r}"
        g = [int(x) for x in m.groups()]
        cues.append(
            (
                ((g[0] * 60 + g[1]) * 60 + g[2]) * 1000 + g[3],
                ((g[4] * 60 + g[5]) * 60 + g[6]) * 1000 + g[7],
            )
        )
        assert int(lines[0]) == len(cues)  # 1-based cue index line
    return cues


def _built_srt(spark):
    # Reach the intermediate SRT text the op builds: rebuild it with
    # the same expression the op uses (srt_frame_alignment only
    # returns the digest), via a tiny projection over documents.
    (docs,) = load_tables(spark, SF, "documents")
    fmt = (
        "format_string('%02d:%02d:%02d,%03d', CAST({t} div 3600000 AS INT),"
        " CAST(({t} div 60000) % 60 AS INT), CAST(({t} div 1000) % 60 AS INT),"
        " CAST({t} % 1000 AS INT))"
    )
    start = f"(CAST(j AS BIGINT) * {CUE_GAP_MS} + (doc_id % 7) * 10)"
    end = f"({start} + {CUE_LEN_MS})"
    return {
        r["doc_id"]: r["srt"]
        for r in docs.select(
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
        ).collect()
    }


def test_alignment_matches_independent_srt_parse(spark):
    srts = _built_srt(spark)
    rows = srt_frame_alignment(spark, SF).collect()
    assert len(rows) == len(srts)
    for r in rows:
        d = r["doc_id"]
        cues = _parse_srt(srts[d])
        assert r["n_cues"] == len(cues) == 3 + d % 4
        assert r["first_cue_ms"] == cues[0][0]
        assert r["last_cue_end_ms"] == cues[-1][1]
        usec = _usec_per_frame(d)
        n = _n_frames(d)
        assert r["n_frames"] == n
        aligned = sum(
            any(s <= (f * usec) // 1000 < e for s, e in cues)
            for f in range(n)
        )
        assert r["aligned_frames"] == aligned


def test_cue_interval_is_half_open_and_gaps_exist(spark):
    # [start, end): a frame exactly at end_ms is NOT aligned; the
    # 45-in-60 duty cycle leaves real gaps, so across the corpus the
    # aligned fraction is strictly between 0 and 1.
    assert CUE_LEN_MS < CUE_GAP_MS
    rows = srt_frame_alignment(spark, SF).collect()
    total = sum(r["n_frames"] for r in rows)
    aligned = sum(r["aligned_frames"] for r in rows)
    assert 0 < aligned < total
