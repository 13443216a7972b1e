"""DOM-tree main-content extraction: generic behavior on handcrafted
pages the extractor has never seen — the cases a tag-regex block
splitter cannot handle (nested anchors, attributes containing '>',
wordy link-free boilerplate, malformed nesting) — plus the Spark
operator's exact-identity recovery on the hard synthetic corpus."""

from ocrs_spark.dom import (
    extract_main_content,
    keep_block,
    parse_html,
    text_blocks,
)

ARTICLE = "the quick brown fox jumps over the lazy dog today"


def test_keeps_plain_paragraph():
    assert extract_main_content(f"<html><body><p>{ARTICLE}</p></body></html>") == ARTICLE


def test_drops_structural_boilerplate_tags():
    html = (
        "<body><nav><a href='/'>Home page link</a> more navigation words here</nav>"
        f"<p>{ARTICLE}</p>"
        "<footer>five words of footer text here</footer>"
        "<aside>five words of aside text here</aside>"
        "<header>five words of header text here</header></body>"
    )
    assert extract_main_content(html) == ARTICLE


def test_drops_wordy_linkfree_hinted_blocks():
    # Enough words and zero links: link-density rules keep these; only
    # the class/id hints catch them.
    html = (
        f"<body><p>{ARTICLE}</p>"
        "<div class='comments'><p>I completely disagree with every word of this</p></div>"
        "<div id='copyright-notice'>All material provided without warranty of any kind</div>"
        "<div class='newsletter'>Sign up for our weekly digest of stories</div></body>"
    )
    assert extract_main_content(html) == ARTICLE


def test_counts_anchor_text_through_nesting():
    # Anchor text wrapped in <span>/<em> still counts as link text, so
    # the link-list stays boilerplate even though no text is a direct
    # child of <a>.
    html = (
        "<body><div><a href='/a'><span>first related story</span></a> "
        "<a href='/b'><em>second related story</em></a> "
        "<a href='/c'><span>third related story</span></a></div>"
        f"<p>{ARTICLE}</p></body>"
    )
    assert extract_main_content(html) == ARTICLE


def test_attribute_containing_gt_is_safe():
    html = f"<body><div data-note=\"x > y\" class=\"content\"><p>{ARTICLE}</p></div></body>"
    assert extract_main_content(html) == ARTICLE


def test_inline_links_in_prose_survive():
    html = (
        "<body><p>read the longer report at "
        "<a href='/r'>this page</a> for all of the remaining details</p></body>"
    )
    out = extract_main_content(html)
    assert out == "read the longer report at this page for all of the remaining details"


def test_script_style_title_text_never_leaks():
    html = (
        "<head><title>Page Title Words</title><style>p { color: red; }</style></head>"
        f"<body><script>var x = 'injected words here now';</script><p>{ARTICLE}</p></body>"
    )
    assert extract_main_content(html) == ARTICLE


def test_nested_blocks_keep_document_order():
    html = (
        "<body><article><div><p>first paragraph has five words</p></div>"
        "<section><p>second paragraph also has words</p></section></article></body>"
    )
    assert extract_main_content(html) == (
        "first paragraph has five words second paragraph also has words"
    )


def test_short_blocks_dropped():
    html = f"<body><p>too short</p><p>{ARTICLE}</p><div>tiny</div></body>"
    assert extract_main_content(html) == ARTICLE


def test_malformed_nesting_is_tolerated():
    # Unclosed <p>, stray </div>: the tolerant builder must not lose
    # the content or crash.
    html = f"<body></div><p>{ARTICLE}<p>another paragraph of five words</body>"
    out = extract_main_content(html)
    assert ARTICLE in out and "another paragraph of five words" in out


def test_negative_flag_inherited_by_descendant_blocks():
    blocks = text_blocks(
        parse_html(
            "<div class='sidebar'><p>wordy paragraph inside a sidebar container here</p></div>"
        )
    )
    assert blocks and all(b.negative for b in blocks)
    assert not any(keep_block(b) for b in blocks)


def test_whitespace_collapsed_inside_blocks():
    html = "<body><p>the   quick\n\tbrown    fox jumps</p></body>"
    assert extract_main_content(html) == "the quick brown fox jumps"


def test_spark_dom_corpus_exact_recovery(spark):
    from ocrs_spark.ops.webdoc import dom_main_content

    sf = "/root/testdata/sf0.001"
    got = {r.doc_id: r.main_text for r in dom_main_content(spark, sf).collect()}
    want = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{sf}/documents.parquet").collect()
    }
    assert got == want


def test_extract_metadata_full_head():
    from ocrs_spark.dom import extract_metadata

    html = (
        '<html lang="fr"><head><title>My  Title</title>'
        '<meta name="description" content="a summary here">'
        '<meta property="og:title" content="OG Title">'
        '<meta property="og:description" content="OG Desc">'
        '<meta property="article:published_time" content="2024-03-04">'
        '<link rel="canonical" href="https://x.org/a">'
        '<script type="application/ld+json">'
        '{"@type": "NewsArticle", "headline": "H"}</script>'
        "</head><body><p>body text</p></body></html>"
    )
    m = extract_metadata(html)
    assert m["title"] == "My Title"  # whitespace collapsed
    assert m["lang"] == "fr"
    assert m["description"] == "a summary here"
    assert m["og_title"] == "OG Title"
    assert m["og_description"] == "OG Desc"
    assert m["published"] == "2024-03-04"
    assert m["canonical_url"] == "https://x.org/a"
    assert m["jsonld_type"] == "NewsArticle"
    assert m["jsonld_headline"] == "H"


def test_extract_metadata_tolerates_junk():
    from ocrs_spark.dom import extract_metadata

    # malformed JSON-LD, list-form JSON-LD, missing fields, rel lists
    m = extract_metadata(
        '<html><head><script type="application/ld+json">{not json'
        "</script></head></html>"
    )
    assert m["jsonld_type"] is None and m["title"] is None

    m = extract_metadata(
        '<html><head><script type="application/ld+json">'
        '[{"@type": "Article"}]</script>'
        '<link rel="alternate canonical" href="/c"></head></html>'
    )
    assert m["jsonld_type"] == "Article"
    assert m["canonical_url"] == "/c"

    # first occurrence wins; later duplicates ignored
    m = extract_metadata(
        "<html><head><title>first</title><title>second</title></head></html>"
    )
    assert m["title"] == "first"

    # no head at all
    m = extract_metadata("<p>just a paragraph</p>")
    assert all(v is None for v in m.values())


def test_metadata_head_never_leaks_into_main_content():
    from ocrs_spark.dom import extract_main_content
    from ocrs_spark.ops.webdoc import _rich_html

    html = _rich_html(7, "the quick brown fox jumps over the lazy dog", "en")
    main = extract_main_content(html)
    assert main == "the quick brown fox jumps over the lazy dog"
    assert "corpus.example" not in main and "ld+json" not in main
