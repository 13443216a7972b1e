"""Span-corruption semantics beyond the SQL oracle: the structural
invariants of the denoising objective (run collapse, sentinel
numbering, lossless reconstruction)."""

from __future__ import annotations

import re

from ocrs_spark.ops.denoise import span_corruption_samples

SF = "/root/testdata/sf0.001"

_SENT = re.compile(r"<extra_id_(\d+)>")


def _rows(spark):
    return {
        r["doc_id"]: (r["input"], r["target"])
        for r in span_corruption_samples(spark, SF).collect()
    }


def test_round_trip_reconstructs_original_text(spark):
    """Splicing each target span back over its sentinel must reproduce
    the original document exactly — the property that makes the pair a
    valid denoising sample."""
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }
    pairs = _rows(spark)
    assert set(pairs) == set(docs)
    for doc_id, (inp, tgt) in pairs.items():
        spans = {}
        parts = _SENT.split(tgt)  # ['', id0, toks0, id1, toks1, ...]
        for i in range(1, len(parts), 2):
            spans[int(parts[i])] = parts[i + 1].strip()

        def _fill(m):
            return spans[int(m.group(1))]

        rebuilt = " ".join(_SENT.sub(_fill, inp).split())
        assert rebuilt == docs[doc_id], doc_id


def test_sentinels_are_dense_and_ordered(spark):
    """Input sentinels must be 0..k-1 in order (one per masked run) and
    the target must replay exactly the same set, in the same order."""
    saw_multi = False
    for inp, tgt in _rows(spark).values():
        ids_in = [int(x) for x in _SENT.findall(inp)]
        ids_tgt = [int(x) for x in _SENT.findall(tgt)]
        assert ids_in == list(range(len(ids_in)))
        assert ids_tgt == ids_in
        saw_multi = saw_multi or len(ids_in) > 1
    assert saw_multi  # the corpus genuinely exercises multiple runs


def test_runs_collapse_and_rate_is_plausible(spark):
    """Adjacent masked tokens share one sentinel (target spans may hold
    several tokens) and the overall mask rate sits near the designed
    1/8."""
    pairs = _rows(spark).values()
    multi_token_span = any(
        len(parts.strip().split()) > 1
        for _, tgt in pairs
        for parts in _SENT.split(tgt)[2::2]
    )
    assert multi_token_span  # at least one run of length >= 2 collapsed
    masked = sum(
        len(s.split()) for _, t in pairs for s in _SENT.split(t)[2::2] if s.strip()
    )
    total = masked + sum(
        len([w for w in _SENT.sub(" ", i).split()]) for i, _ in pairs
    )
    assert 0.08 < masked / total < 0.17  # 1/8 within sampling noise
