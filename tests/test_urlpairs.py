"""Contracts for URL-pattern parallel pairing (ops/urlpairs.py): the
parse really strips the language segment, pairs match a pure-Python
recompute, and the pairing is English-pivoted and language-disjoint.
"""

from collections import defaultdict

from ocrs_spark.ops.urlpairs import (
    ARTICLE_GROUP,
    PIVOT_LANG,
    url_parallel_pairs,
)

SF = "/root/testdata/sf0.001"


def test_pairs_match_python_recompute(spark):
    docs = [
        (r["doc_id"], r["lang"])
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "lang")
        .collect()
    ]
    by_article = defaultdict(lambda: ([], []))
    for d, lang in docs:
        en, other = by_article[d // ARTICLE_GROUP]
        (en if lang == PIVOT_LANG else other).append((d, lang))
    exp = set()
    for aid, (en, other) in by_article.items():
        path = f"https://site.example/article/{aid}"
        for e, _ in en:
            for o, ol in other:
                exp.add((path, e, o, ol))
    got = {
        (r["article_path"], r["en_doc"], r["other_doc"], r["other_lang"])
        for r in url_parallel_pairs(spark, SF).collect()
    }
    assert got == exp
    assert got  # non-vacuous
    # pivot discipline: never pairs en with en
    assert all(ol != PIVOT_LANG for _, _, _, ol in got)
    # multiple target languages actually appear
    assert len({ol for _, _, _, ol in got}) > 1
