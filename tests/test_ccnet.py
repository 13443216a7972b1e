"""Contracts for CCNet perplexity bucketing (ops/ccnet.py): the
two-pass histogram/tie-rank construction must equal a literal NTILE(3)
recomputed in Python from the (already oracle-verified) lm_perplexity
scores, and the per-language bucket sizes must follow NTILE's
first-buckets-larger split exactly.
"""

from collections import defaultdict

import pyarrow.parquet as pq

from ocrs_spark.ops.ccnet import ccnet_perplexity_buckets
from ocrs_spark.ops.lmscore import lm_perplexity

SF = "/root/testdata/sf0.001"


def _py_buckets(spark):
    langs = {}
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "lang"])
    lang_of = dict(zip(t["doc_id"].to_pylist(), t["lang"].to_pylist()))
    scored = [
        (r["doc_id"], lang_of[r["doc_id"]], round(-1000 * r["avg_logp"]))
        for r in lm_perplexity(spark, SF).collect()
    ]
    by_lang = defaultdict(list)
    for doc_id, lang, milli in scored:
        by_lang[lang].append((milli, doc_id))
    exp = {}
    for lang, rows in by_lang.items():
        rows.sort()
        n = len(rows)
        c1 = n // 3 + (1 if n % 3 >= 1 else 0)
        c2 = c1 + n // 3 + (1 if n % 3 >= 2 else 0)
        for i, (milli, doc_id) in enumerate(rows, start=1):
            exp[doc_id] = (
                lang,
                milli,
                "head" if i <= c1 else "middle" if i <= c2 else "tail",
            )
        langs[lang] = (n, c1, c2)
    return exp, langs


def test_buckets_match_python_ntile(spark):
    exp, _ = _py_buckets(spark)
    got = ccnet_perplexity_buckets(spark, SF).collect()
    assert len(got) == len(exp)
    for r in got:
        lang, milli, bucket = exp[r["doc_id"]]
        assert (r["lang"], r["nlogp_milli"], r["bucket"]) == (lang, milli, bucket)


def test_bucket_sizes_follow_ntile_split(spark):
    _, langs = _py_buckets(spark)
    rows = ccnet_perplexity_buckets(spark, SF).collect()
    counts = defaultdict(lambda: defaultdict(int))
    for r in rows:
        counts[r["lang"]][r["bucket"]] += 1
    for lang, (n, c1, c2) in langs.items():
        got = counts[lang]
        assert got["head"] == c1
        assert got["middle"] == c2 - c1
        assert got["tail"] == n - c2
        # every language has all three buckets populated at this SF
        assert min(got["head"], got["middle"], got["tail"]) > 0
