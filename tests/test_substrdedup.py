"""Exact-substring duplicated-span semantics on hand-built corpora:
window detection, island merging, and the zero cases — the oracle
mirror in test_oracles.py covers the corpus-scale parity."""

from ocrs_spark.ops.substrdedup import WINDOW_W, duplicated_spans_over


def _run(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    rows = duplicated_spans_over(df).collect()
    return {r.doc_id: r for r in rows}


def test_cross_doc_duplicate_span(spark):
    # Docs 0 and 1 share an exact 7-token run ("a b c d e f g"):
    # windows at positions 0,1,2 (doc 0) / 1,2,3 (doc 1) all duplicated,
    # merging into ONE span covering the 7 shared tokens in each doc.
    assert WINDOW_W == 5
    shared = "a b c d e f g"
    out = _run(
        spark,
        [
            shared + " unique0 tail0 tok0",
            "lead1 " + shared + " tail1",
            "totally different words here nothing repeats at all",
        ],
    )
    assert (out[0].dup_spans, out[0].dup_tokens) == (1, 7)
    assert (out[1].dup_spans, out[1].dup_tokens) == (1, 7)
    assert (out[2].dup_spans, out[2].dup_tokens) == (0, 0)
    assert out[2].dup_frac == 0.0


def test_two_disjoint_spans_stay_separate(spark):
    # Two shared 5-gram runs separated by a unique gap token in doc 0:
    # must surface as TWO spans, 5 tokens each.
    run1 = "p q r s t"
    run2 = "v w x y z"
    out = _run(
        spark,
        [
            run1 + " gap0 " + run2,
            run1 + " other filler words " + run2,
        ],
    )
    assert (out[0].dup_spans, out[0].dup_tokens) == (2, 10)
    assert (out[1].dup_spans, out[1].dup_tokens) == (2, 10)


def test_within_doc_repeat_counts(spark):
    # The SAME doc repeating its own 5-gram is a duplicate too
    # (corpus-wide count >= 2, Lee et al. semantics): both occurrences
    # are flagged.
    run = "m n o p q"
    out = _run(spark, [run + " mid " + run, "unrelated text here ok ok ok"])
    assert (out[0].dup_spans, out[0].dup_tokens) == (2, 10)
    assert out[0].n_tokens == 11
    assert out[0].dup_frac == round(10 / 11, 6)


def test_short_docs_have_no_windows(spark):
    out = _run(spark, ["one two three four", "one two three four"])
    # Identical docs but < W tokens: no windows, nothing flagged.
    assert all(
        (r.dup_spans, r.dup_tokens, r.dup_frac) == (0, 0, 0.0)
        for r in out.values()
    )
