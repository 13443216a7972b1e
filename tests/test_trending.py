"""Contracts for trending tokens (ops/trending.py): pure-Python
recompute of the window counts, smoothed ratios, and the deterministic
(ratio desc, token asc) top-K cut.
"""

from collections import Counter

import pyarrow.parquet as pq

from ocrs_spark.ops.trending import MIN_CURRENT, TOP_K, trending_tokens

SF = "/root/testdata/sf0.001"


def _py_top():
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    prev, cur = Counter(), Counter()
    for doc_id, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        (cur if doc_id % 2 == 0 else prev).update(
            w for w in text.split(" ") if w
        )
    rows = [
        (tok, prev[tok], c, (1000 * (c + 1)) // (prev[tok] + 1))
        for tok, c in cur.items()
        if c >= MIN_CURRENT
    ]
    rows.sort(key=lambda r: (-r[3], r[0]))
    return rows[:TOP_K]


def test_trending_matches_python_recompute(spark):
    exp = _py_top()
    got = trending_tokens(spark, SF).collect()
    assert [
        (r["token"], r["c_prev"], r["c_cur"], r["ratio_milli"]) for r in got
    ] == exp


def test_trending_is_non_degenerate(spark):
    rows = trending_tokens(spark, SF).collect()
    assert len(rows) == TOP_K
    ratios = [r["ratio_milli"] for r in rows]
    assert ratios == sorted(ratios, reverse=True)
    # movers exist: the top ratio strictly exceeds parity (1000)
    assert ratios[0] > 1000
