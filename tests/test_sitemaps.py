"""Contracts for sitemap ingest + recrawl scheduling (ops/sitemaps.py):
the XML round-trip is real (valid urlset markup, distractors ignored,
parse inverts build), and the due rule matches a pure-Python recompute.
"""

import datetime

from ocrs_spark.ops.sitemaps import (
    CRAWL_MUL,
    EPOCH,
    MOD_DAYS,
    N_HOSTS,
    sitemap_recrawl,
    sitemap_xml_per_host,
)

SF = "/root/testdata/sf0.001"


def test_sitemap_xml_shape(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    n = docs.count()
    maps = sitemap_xml_per_host(docs).collect()
    assert len(maps) == N_HOSTS
    total_entries = 0
    for r in maps:
        xml = r["xml"]
        assert xml.startswith('<?xml version="1.0"?><urlset ')
        assert xml.endswith("</urlset>")
        assert xml.count("<loc>") == xml.count("<lastmod>")
        assert "<changefreq>daily</changefreq>" in xml  # distractor present
        assert r["host"] in xml
        total_entries += xml.count("<url><loc>")
    assert total_entries == n  # every document advertised exactly once


def test_recrawl_matches_python_recompute(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    ids = [r["doc_id"] for r in docs.select("doc_id").collect()]
    epoch = datetime.date.fromisoformat(EPOCH)
    exp = {}
    for d in ids:
        url = f"https://host{d % N_HOSTS}.example.com/doc/{d}"
        lastmod = (epoch + datetime.timedelta(days=d % MOD_DAYS)).isoformat()
        crawled = (
            epoch + datetime.timedelta(days=(d * CRAWL_MUL) % MOD_DAYS)
        ).isoformat()
        exp[url] = (lastmod, crawled, lastmod > crawled)
    got = {
        r["url"]: (r["lastmod"], r["last_crawled"], r["due"])
        for r in sitemap_recrawl(spark, SF).collect()
    }
    assert got == exp
    dues = [v[2] for v in got.values()]
    assert any(dues) and not all(dues)  # the schedule is non-degenerate
