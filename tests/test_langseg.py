"""Contracts for per-line language segmentation (ops/langseg.py):
segments exactly tile each document's line range, runs are maximal
(adjacent segments always change language), and the classifier output
matches a pure-Python recompute of the planting formula.
"""

from ocrs_spark.ops.langseg import LANGS, line_lang_segments

SF = "/root/testdata/sf0.001"


def _segments(spark):
    rows = line_lang_segments(spark, SF).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for segs in by_doc.values():
        segs.sort(key=lambda r: r["seg_idx"])
    return by_doc


def test_segments_tile_each_document(spark):
    docs = {
        r["doc_id"]
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id")
        .collect()
    }
    by_doc = _segments(spark)
    assert set(by_doc) == docs
    for doc_id, segs in by_doc.items():
        n_lines = doc_id % 5 + 3
        assert segs[0]["start_line"] == 0
        assert segs[-1]["end_line"] == n_lines - 1
        for i, s in enumerate(segs):
            assert s["seg_idx"] == i
            assert s["n_lines"] == s["end_line"] - s["start_line"] + 1
            if i:
                prev = segs[i - 1]
                assert s["start_line"] == prev["end_line"] + 1
                # maximality: a segment boundary always changes language
                assert s["lang"] != prev["lang"]


def test_classifier_matches_planting_formula(spark):
    by_doc = _segments(spark)
    for doc_id, segs in by_doc.items():
        expected = [
            LANGS[(doc_id + i * i) % 3] for i in range(doc_id % 5 + 3)
        ]
        got = []
        for s in segs:
            got.extend([s["lang"]] * s["n_lines"])
        assert got == expected
    # multi-segment docs exist (the fixture is non-degenerate)
    assert any(len(segs) > 2 for segs in by_doc.values())
