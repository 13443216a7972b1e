"""Anchor-text aggregation semantics (oracle parity is covered by
tests/test_oracles.py; these pin what the oracle can't see: nofollow /
distractor filtering, that the anchor TEXT is read from markup, the
tie-break rule, and the all-expression plan shape)."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from ocrs_spark.ops.anchortext import (
    VOCAB,
    _anchored_html,
    _anchors,
    anchor_edges,
    anchor_text_docs,
)

SF = "/root/testdata/sf0.001"


def test_planted_page_markup_shape():
    html = _anchored_html(11, "hello world", 500)
    (t1, a1, f1), (t2, a2, f2), (t3, a3, f3) = _anchors(11, 500)
    assert f'<a href="/doc/{t1}">{a1}</a>' in html
    assert f'<a href="/doc/{t2}" class="rel">{a2}</a>' in html
    assert f'rel="nofollow">{a3}</a>' in html
    assert (f1, f2, f3) == (True, True, False)
    # distractors: offsite /doc/ URL, commented-out anchor, non-doc navs
    assert "other.example/doc/4" in html and "<!--" in html


def test_edges_drop_nofollow_and_distractors(spark):
    n = spark.read.parquet(f"{SF}/documents.parquet").count()
    from ocrs_spark.ops.anchortext import _anchored_corpus

    edges = anchor_edges(_anchored_corpus(spark, SF))
    rows = edges.collect()
    # exactly the two followed links per source, with the markup's text
    assert len(rows) == 2 * n
    got = {}
    for r in rows:
        got.setdefault(r.src, set()).add((r.dst, r.anchor))
    for src in (0, 3, 7):
        expect = {(t, a) for t, a, followed in _anchors(src, n) if followed}
        assert got[src] == expect


def test_aggregation_matches_python_recompute(spark):
    n = spark.read.parquet(f"{SF}/documents.parquet").count()
    inlinks: Counter = Counter()
    anchors: dict[int, Counter] = {}
    for src in range(n):
        for dst, a, followed in _anchors(src, n):
            if followed:
                inlinks[dst] += 1
                anchors.setdefault(dst, Counter())[a] += 1
    out = {r.doc_id: r for r in anchor_text_docs(spark, SF).collect()}
    assert set(out) == set(inlinks)
    for dst, r in out.items():
        cnt = anchors[dst]
        assert r.n_inlinks == inlinks[dst]
        assert r.n_unique_anchors == len(cnt)
        assert r.anchor_doc == " ".join(sorted(cnt))
        # modal anchor, ties -> lexically largest
        best = max(cnt.items(), key=lambda kv: (kv[1], kv[0]))[0]
        assert r.top_anchor == best, (dst, dict(cnt), r.top_anchor)
        assert r.top_anchor in VOCAB


def test_plan_is_pure_expression(spark):
    plan = anchor_text_docs(spark, SF)._jdf.queryExecution().executedPlan().toString()
    # extraction + both aggregation levels stay JVM-side: no Python
    # eval stages anywhere in the executed plan
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "FlatMapsInPandas" not in plan and "MapInPandas" not in plan
    # two-level fold: partial aggregation before the final dst shuffle
    assert "HashAggregate" in plan
