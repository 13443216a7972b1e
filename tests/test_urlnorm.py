"""URL normalization over handcrafted URLs the synth corpus never
produces — proves each rule, not just the planted variants."""

from ocrs_spark.ops.urlnorm import normalize_url


def _norm(spark, urls):
    df = spark.createDataFrame([(i, u) for i, u in enumerate(urls)], "i int, url string")
    out = normalize_url(df).orderBy("i").collect()
    return [(r["normalized_url"], r["host"]) for r in out]


def test_normalization_rules(spark):
    got = _norm(
        spark,
        [
            # case + default port + fragment + tracking param
            "HTTPS://WWW.Site.ORG:443/Path/To/Page?utm_medium=email#x",
            # non-default port survives; params sorted; path case kept
            "http://a.example:8443/API/v1?z=1&a=2",
            # root path: trailing slash kept (it IS the path)
            "http://example.com/",
            # only tracking params -> no '?' at all
            "http://example.com/p?gclid=abc&utm_source=x&fbclid=1",
            # trailing slash stripped once, not recursively
            "http://example.com/a//",
            # a param NAMED like but not matching the tracking prefixes
            "http://example.com/p?auto=1&butm_x=2",
        ],
    )
    assert got[0] == ("https://www.site.org/Path/To/Page", "www.site.org")
    assert got[1] == ("http://a.example:8443/API/v1?a=2&z=1", "a.example")
    assert got[2] == ("http://example.com/", "example.com")
    assert got[3] == ("http://example.com/p", "example.com")
    assert got[4] == ("http://example.com/a/", "example.com")
    assert got[5] == ("http://example.com/p?auto=1&butm_x=2", "example.com")


def test_normalization_idempotent(spark):
    urls = [
        "HTTP://Example.COM:80/doc/7?utm_source=feed#frag",
        "http://mirror.example.com:8080/doc/9?b=2&a=1",
        "https://cdn.example.com/assets/3/",
    ]
    once = [u for u, _h in _norm(spark, urls)]
    twice = [u for u, _h in _norm(spark, once)]
    assert once == twice


def test_text_clean_rules(spark):
    """Handcrafted messy strings through the cleaning kernel (not the
    planted corpus variants): NFD composition, control/format strip,
    whitespace collapse, and newline handling."""
    from ocrs_spark.ops.textstats import _clean_series
    import pandas as pd

    got = list(
        _clean_series(
            pd.Series(
                [
                    "Cafe\u0301 au lait",          # NFD -> composed
                    "a\u0007\u0008bc",              # controls stripped
                    "x\u200by\u200dz\ufeffw",       # format chars stripped
                    "  a \t b \n\n c  ",            # whitespace collapsed
                    "ya\u0308 NFD umlaut",          # combining diaeresis
                ]
            )
        )
    )
    assert got[0] == "Caf\u00e9 au lait"
    assert got[1] == "abc"
    assert got[2] == "xyzw"
    assert got[3] == "a b c"
    assert got[4] == "y\u00e4 NFD umlaut"
