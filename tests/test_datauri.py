"""Contracts for inline data-URI extraction (ops/datauri.py): the
regexp must match only base64 image data URIs (not http src, not
non-image data URIs), quotes both single and double; the embedded
PNG caption must survive base64 + HTML; decode goes through the real
dispatcher.
"""

import numpy as np

from ocrs_spark.ops.datauri import _DATA_URI, _page, data_uri_images

SF = "/root/testdata/sf0.001"


def test_regexp_selects_exactly_the_image_uris():
    html = _page(5)
    found = _DATA_URI.findall(html)
    assert [m for m, _ in found] == ["image/png", "image/gif"]
    # distractors present but unmatched
    assert "https://cdn.example/fetched.png" in html
    assert "data:text/plain" in html


def test_both_quote_styles_match():
    assert _DATA_URI.search('src="data:image/png;base64,AAAA"')
    assert _DATA_URI.search("src='data:image/gif;base64,AAAA'")
    assert not _DATA_URI.search('href="data:image/png;base64,AAAA"')


def test_extraction_through_dispatcher(spark):
    rows = data_uri_images(spark, SF).collect()
    assert len(rows) == 500
    for r in rows[:40]:
        d = r["doc_id"]
        assert r["n_uris"] == 2
        assert (r["png_w"], r["png_h"]) == (4 + d % 3, 3)
        assert r["png_caption"] == f"img {d} cap {d % 10}"
        assert r["gif_w"] == 6 + d % 4
        assert r["gif_fill"] == (d * 29) % 256
