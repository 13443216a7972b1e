"""Contracts for TextTiling segmentation (ops/texttile.py): a
pure-Python recompute of block overlaps and the local-minimum boundary
rule, plus hand cases pinning the asymmetric tie policy and the
short-document / trailing-partial-block choices.
"""

import pyarrow.parquet as pq

from ocrs_spark.ops.texttile import BLOCK, text_tiling_segments

SF = "/root/testdata/sf0.001"


def _py_rows():
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    out = {}
    for doc_id, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        toks = [w for w in text.split(" ") if w]
        n_gaps = len(toks) // BLOCK - 1
        if n_gaps < 1:
            continue
        scores = []
        for g in range(1, n_gaps + 1):
            a = set(toks[(g - 1) * BLOCK : g * BLOCK])
            b = set(toks[g * BLOCK : (g + 1) * BLOCK])
            scores.append(len(a & b))
        for g in range(1, n_gaps + 1):
            is_b = (
                g != 1
                and g != n_gaps
                and scores[g - 1] < scores[g - 2]
                and scores[g - 1] <= scores[g]
            )
            out[(doc_id, g)] = (g * BLOCK, scores[g - 1], is_b)
    return out


def test_segments_match_python_recompute(spark):
    exp = _py_rows()
    got = text_tiling_segments(spark, SF).collect()
    assert len(got) == len(exp)
    n_bounds = 0
    for r in got:
        pos, overlap, is_b = exp[(r["doc_id"], r["gap_idx"])]
        assert (r["gap_token_pos"], r["overlap"], r["is_boundary"]) == (
            pos,
            overlap,
            is_b,
        )
        n_bounds += r["is_boundary"]
    # non-degenerate: boundaries exist but not everywhere
    assert 0 < n_bounds < len(got)


def test_edge_gaps_never_fire_and_short_docs_drop(spark):
    rows = text_tiling_segments(spark, SF).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    for doc_id, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        n_toks = len([w for w in text.split(" ") if w])
        n_gaps = n_toks // BLOCK - 1
        got = by_doc.get(doc_id, [])
        assert len(got) == max(n_gaps, 0)
        if got:
            gaps = sorted(got, key=lambda r: r["gap_idx"])
            assert not gaps[0]["is_boundary"]  # first gap never fires
            assert not gaps[-1]["is_boundary"]  # last gap never fires
