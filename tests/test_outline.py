"""Contracts for heading-outline extraction (ops/outline.py): the
parser really ignores commented-out sections and aside headings, the
h1-reset sentinel works on multi-h1 markup, and paragraph counts
match the planting formula.
"""

from pyspark.sql import functions as F

from ocrs_spark.ops.outline import _outline_html, heading_outline

SF = "/root/testdata/sf0.001"


def test_fixture_contains_traps():
    html = _outline_html(7)
    assert "<!-- <h2>Commented section</h2><p>ghost para</p> -->" in html
    assert "<h3>Related</h3>" in html


def test_outline_matches_formula(spark):
    rows = heading_outline(spark, SF).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    docs = {
        r["doc_id"]
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id")
        .collect()
    }
    assert set(by_doc) == docs
    for doc_id, rs in by_doc.items():
        rs.sort(key=lambda r: r["para_idx"])
        exp = []
        for s in range(1, doc_id % 3 + 2):
            for p in range(1, (doc_id + s) % 2 + 2):
                exp.append((f"Doc {doc_id}", f"Section {s}", f"para {s} {p}"))
        got = [(r["h1"], r["h2"], r["text"]) for r in rs]
        assert got == exp
        assert [r["para_idx"] for r in rs] == list(range(1, len(exp) + 1))
        # traps never leak
        assert all("ghost" not in r["text"] for r in rs)
        assert all(r["h2"] != "Commented section" for r in rs)
        assert all(r["h2"] != "Related" for r in rs)


def test_new_h1_resets_h2_context(spark):
    """Hand markup with two h1 parts: the paragraph after the second
    h1 but before any h2 must have a NULL h2, not the stale one."""
    from ocrs_spark.ops import outline as mod

    html = (
        "<html><body><h1>Part one</h1><h2>A</h2><p>one</p>"
        "<h1>Part two</h1><p>intro</p><h2>B</h2><p>two</p></body></html>"
    )
    pages = spark.createDataFrame([(1, html)], mod.OUTLINE_SCHEMA)
    orig = mod._outline_corpus
    mod._outline_corpus = lambda *_: pages
    try:
        rows = sorted(
            heading_outline(spark, SF + "_handcase").collect(),
            key=lambda r: r["para_idx"],
        )
    finally:
        mod._outline_corpus = orig
    got = [(r["h1"], r["h2"], r["text"]) for r in rows]
    assert got == [
        ("Part one", "A", "one"),
        ("Part two", None, "intro"),
        ("Part two", "B", "two"),
    ]
