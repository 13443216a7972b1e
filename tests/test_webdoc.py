"""Main-content extraction and passage-level dedup: generic-operator
behavior on handcrafted inputs the synthetic corpus never produces, and
the exact-recovery contract over the synthesized boilerplate corpus."""

import pandas as pd

from ocrs_spark.ops.webdoc import (
    PASSAGE_PLANT_ID_OFFSET,
    html_docs,
    main_content,
    repeated_passages,
)


def _extract(spark, pages: list[str]) -> list[str]:
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(pages)), "html": pages})
    )
    rows = main_content(df).orderBy("doc_id").collect()
    return [r["main_text"] for r in rows]


def test_main_content_strips_nav_sidebar_footer(spark):
    page = (
        '<html><head><title>A Page</title></head><body>'
        '<nav><a href="/">Home</a> <a href="/a">About</a> <a href="/c">Contact</a></nav>'
        '<div class="main"><p>the quick brown fox jumps over the lazy dog</p></div>'
        '<aside><a href="/1">related story one</a> <a href="/2">related story two</a></aside>'
        '<footer><a href="/t">Terms of service</a> <a href="/p">Privacy policy page</a> c</footer>'
        '</body></html>'
    )
    assert _extract(spark, [page]) == [
        "the quick brown fox jumps over the lazy dog"
    ]


def test_main_content_joins_paragraphs_in_order(spark):
    page = (
        "<body><p>first paragraph has five words</p>"
        "<p>second paragraph also has five</p></body>"
    )
    assert _extract(spark, [page]) == [
        "first paragraph has five words second paragraph also has five"
    ]


def test_main_content_keeps_inline_links_in_prose(spark):
    # A real paragraph containing a link is content, not boilerplate:
    # char-based link density stays under the bar.
    page = (
        '<body><p>read the <a href="/x">full report</a> for more detail'
        " on the findings</p>"
        '<ul><a href="/1">one</a> <a href="/2">two</a> <a href="/3">three</a>'
        ' <a href="/4">four</a> <a href="/5">five more links</a></ul></body>'
    )
    assert _extract(spark, [page]) == [
        "read the full report for more detail on the findings"
    ]


def test_main_content_empty_page(spark):
    assert _extract(spark, ["<html><body></body></html>"]) == [""]


def test_synthesized_corpus_recovers_exact_text(spark):
    # All three template variants must round-trip bit-exact (the DuckDB
    # oracle asserts the same at sf0.01; this pins it at sf0.001 too).
    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet").select("doc_id", "text")
    got = main_content(html_docs(spark, sf)).orderBy("doc_id").collect()
    want = docs.orderBy("doc_id").collect()
    assert len(got) == len(want) > 0
    for g, w in zip(got, want):
        assert (g["doc_id"], g["main_text"]) == (w["doc_id"], w["text"])


def _passages(spark, texts: list[str], w: int, stride: int):
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )
    return {
        r["passage_hash"]: (r["n_docs"], r["n_occurrences"], r["min_doc_id"])
        for r in repeated_passages(df, w=w, stride=stride).collect()
    }


def test_repeated_passages_cross_document(spark):
    shared = "a b c d"
    out = _passages(
        spark,
        [f"{shared} x y z", f"{shared} p q r", "u v w a b c"],
        w=4,
        stride=1,
    )
    # Window 'a b c d' occurs at position 1 in docs 0 and 1 only.
    assert (2, 2, 0) in out.values()
    # No window repeats across three docs.
    assert all(n_docs == 2 for (n_docs, _, _) in out.values())


def test_repeated_passages_counts_within_doc_occurrences(spark):
    # The same window twice in one doc plus once in another: 2 distinct
    # docs, 3 occurrences.
    out = _passages(spark, ["a b a b a b", "z a b a b"], w=4, stride=1)
    assert (2, 3, 0) in out.values() or (2, 2, 0) in out.values()
    assert out  # non-empty: 'a b a b' spans both docs


def test_repeated_passages_short_docs_yield_nothing(spark):
    assert _passages(spark, ["a b", "a b"], w=12, stride=5) == {}


def test_passage_plant_ids_disjoint(spark):
    from ocrs_spark.ops.webdoc import repeated_passage_spans

    rows = repeated_passage_spans(spark, "/root/testdata/sf0.001").collect()
    assert rows, "planted duplicates must make the row non-vacuous"
    # Every repeated passage pairs an original doc with its plant, so
    # min_doc_id is always a real (sub-offset) id.
    assert all(r["min_doc_id"] < PASSAGE_PLANT_ID_OFFSET for r in rows)
