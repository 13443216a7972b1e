"""Contracts for HTML table extraction (ops/tables.py): grids are
rectangular and complete, header flags follow the th/td distinction,
traps (commented tables) never leak, and a hand case with attributes
and a trailing distractor parses exactly.
"""

from ocrs_spark.ops.tables import _table_html, html_table_cells

SF = "/root/testdata/sf0.001"


def test_fixture_contains_traps():
    html = _table_html(5)
    assert "<!-- <table><tr><td>ghost</td></tr></table> -->" in html
    assert 'data-col="1"' in html  # attributes force non-literal matching


def test_grid_matches_formula(spark):
    rows = html_table_cells(spark, SF).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, rs in by_doc.items():
        nr, nc = doc_id % 3 + 2, doc_id % 2 + 2
        assert len(rs) == (nr + 1) * nc
        grid = {(r["row_idx"], r["col_idx"]): r for r in rs}
        assert set(grid) == {
            (ri, ci) for ri in range(nr + 1) for ci in range(nc)
        }
        for (ri, ci), cell in grid.items():
            if ri == 0:
                assert cell["is_header"] and cell["cell"] == f"h {ci + 1}"
            else:
                assert not cell["is_header"]
                assert cell["cell"] == f"v {ri} {ci + 1}"
        assert all("ghost" not in r["cell"] for r in rs)


def test_hand_case_attributes_and_mixed_rows(spark):
    from ocrs_spark.ops import tables as mod

    html = (
        '<table><tr id="x"><th>A</th><th>B</th></tr>'
        "<!-- <tr><td>no</td></tr> -->"
        '<tr><td colspan="1">1</td><td>2</td></tr></table>'
    )
    pages = spark.createDataFrame([(9, html)], mod.TABLE_SCHEMA)
    orig = mod._table_corpus
    mod._table_corpus = lambda *_: pages
    try:
        rows = sorted(
            html_table_cells(spark, SF + "_hand").collect(),
            key=lambda r: (r["row_idx"], r["col_idx"]),
        )
    finally:
        mod._table_corpus = orig
    got = [
        (r["row_idx"], r["col_idx"], r["cell"], r["is_header"]) for r in rows
    ]
    assert got == [
        (0, 0, "A", True),
        (0, 1, "B", True),
        (1, 0, "1", False),
        (1, 1, "2", False),
    ]


def test_markdown_linearization(spark):
    from ocrs_spark.ops.tables import table_markdown

    got = {
        r["doc_id"]: r["markdown"]
        for r in table_markdown(spark, SF).collect()
    }
    for doc_id in (0, 5, 11):
        nr, nc = doc_id % 3 + 2, doc_id % 2 + 2
        lines = got[doc_id].split("\n")
        assert len(lines) == nr + 2  # header + separator + body rows
        assert lines[0] == "| " + " | ".join(f"h {c}" for c in range(1, nc + 1)) + " |"
        assert lines[1] == "| " + " | ".join(["---"] * nc) + " |"
        for r in range(1, nr + 1):
            assert lines[r + 1] == (
                "| " + " | ".join(f"v {r} {c}" for c in range(1, nc + 1)) + " |"
            )
    # every doc produced a table
    n = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert len(got) == n
