"""Bigram-LM perplexity: hand-computed toy model, fluency ordering
(repetitive text scores lower perplexity than shuffled text under a
model trained on the corpus), and oracle parity via test_oracles."""

import math

from ocrs_spark.ops.lmscore import ALPHA, lm_perplexity
from ocrs_spark.ops import lmscore


def _score(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )

    import ocrs_spark.ops as ops

    orig = ops.load_tables
    try:
        ops.load_tables = lambda s, d, *n: (df,)
        lmscore.load_tables = ops.load_tables
        out = {r["doc_id"]: r.asDict() for r in lm_perplexity(spark, "x").collect()}
    finally:
        ops.load_tables = orig
        lmscore.load_tables = orig
    return out


def test_hand_computed_two_docs(spark):
    # corpus: 'a b' and 'a b a b' -> bigrams: (a,b) x3, (b,a) x1
    # C(a,b)=3, C(b,a)=1; C(a)=3, C(b)=1; V=2; alpha=0.5
    out = _score(spark, ["a b", "a b a b"])
    p_ab = (3 + ALPHA) / (3 + ALPHA * 2)
    p_ba = (1 + ALPHA) / (1 + ALPHA * 2)
    assert out[0]["n_bigrams"] == 1
    assert out[0]["avg_logp"] == round(math.log(p_ab), 3)
    assert out[0]["ppl"] == round(1 / p_ab, 3)
    m = (2 * math.log(p_ab) + math.log(p_ba)) / 3
    assert out[1]["avg_logp"] == round(m, 3)
    assert out[1]["ppl"] == round(math.exp(-m), 3)


def test_short_docs_excluded(spark):
    out = _score(spark, ["solo", "a b"])
    assert 0 not in out and 1 in out


def test_fluent_beats_disfluent(spark):
    # model trained on many repetitions of one phrase ranks that
    # phrase far below a never-seen word order
    corpus = ["the quick brown fox jumps"] * 20 + ["jumps the fox brown quick"]
    out = _score(spark, corpus)
    assert out[0]["ppl"] < out[20]["ppl"]


def test_corpus_scores_finite(spark):
    pdf = lm_perplexity(spark, "/root/testdata/sf0.001").toPandas()
    assert len(pdf) == 500
    assert (pdf["ppl"] > 1.0).all()
    assert pdf["ppl"].notna().all()
