"""URL template trap-scoring semantics: a template minting URLs with
identical bodies must score dup_rate -> 1 (a crawler trap), one with
distinct content must score 0, and the skeletonization must collapse
all numeric variation. Cross-engine parity lives in test_oracles.py."""

from ocrs_spark.ops import urltemplates
from ocrs_spark.ops.urltemplates import url_template_stats


def _run(spark, monkeypatch, rows):
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    monkeypatch.setattr(
        urltemplates, "load_tables", lambda _s, _d, *_n: (df,)
    )
    return {
        (r.host, r.template): r
        for r in url_template_stats(spark, ".").collect()
    }


def test_trap_template_scores_high_distinct_scores_zero(spark, monkeypatch):
    # Variant 0 (doc_id % 5 == 0) docs all carry the SAME body — the
    # session-id-mint trap; variant 1 docs are all distinct.
    rows = []
    for i in range(0, 50, 5):
        rows.append((i, "identical trap page body"))      # variant 0
        rows.append((i + 1, f"unique article number {i}"))  # variant 1
    out = _run(spark, monkeypatch, rows)
    trap = out[("example.com", "http://example.com/doc/{N}")]
    real = out[("cdn.example.com", "https://cdn.example.com/assets/{N}")]
    assert trap.n_urls == 10 and trap.n_distinct_texts == 1
    assert trap.dup_rate == 0.9
    assert real.n_urls == 10 and real.n_distinct_texts == 10
    assert real.dup_rate == 0.0


def test_numeric_variation_collapses_to_one_template(spark, monkeypatch):
    # Variant 2 URLs embed doc_id twice (path + query): every one must
    # collapse to a single {N}-template despite distinct ids.
    rows = [(i, f"text {i}") for i in range(2, 100, 5)]
    out = _run(spark, monkeypatch, rows)
    v2 = [k for k in out if "?id={N}&ref=home" in k[1]]
    assert len(v2) == 1
    assert out[v2[0]].n_urls == len(rows)
    assert out[v2[0]].template == "http://example.com/doc/{N}?id={N}&ref=home"
