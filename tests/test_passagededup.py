"""Cross-document passage dedup semantics: boilerplate shared across
documents is dropped everywhere it appears, unique passages survive in
order, and the accounting columns reconcile. Cross-engine parity lives
in test_oracles.py."""

from pyspark.sql import functions as F

from ocrs_spark.ops.passagededup import MIN_DF, SEG, passage_dedup, passage_dedup_df

SF_DIR = "/root/testdata/sf0.001"


def _mk(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_shared_passage_dropped_everywhere(spark):
    footer = " ".join(f"f{i}" for i in range(SEG))
    rows = [
        (0, "a b c d e f g h " + footer),
        (1, "p q r s t u v w " + footer),
        (2, "only unique words live here now ok"),
    ]
    out = {r.doc_id: r for r in passage_dedup_df(_mk(spark, rows)).collect()}
    assert out[0].kept_text == "a b c d e f g h"
    assert out[1].kept_text == "p q r s t u v w"
    assert out[0].n_dropped == 1 and out[1].n_dropped == 1
    assert out[2].n_dropped == 0
    assert out[2].kept_text == rows[2][1]


def test_kept_passages_preserve_order(spark):
    shared = " ".join(f"s{i}" for i in range(SEG))
    a = " ".join(f"a{i}" for i in range(SEG))
    b = " ".join(f"b{i}" for i in range(SEG))
    rows = [
        (0, f"{a} {shared} {b}"),
        (1, shared),
    ]
    out = {r.doc_id: r for r in passage_dedup_df(_mk(spark, rows)).collect()}
    # The middle passage drops; the flanks rejoin in original order.
    assert out[0].kept_text == f"{a} {b}"
    assert out[0].n_segments == 3 and out[0].n_dropped == 1
    # A document that was ALL boilerplate comes back empty, not absent.
    assert out[1].kept_text == "" and out[1].n_dropped == 1


def test_accounting_reconciles_on_corpus(spark):
    res = passage_dedup(spark, SF_DIR)
    rows = res.collect()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    assert len(rows) == docs.count()
    # Non-vacuous: the synthetic corpus repeats phrases across docs.
    assert sum(r.n_dropped for r in rows) > 0
    for r in rows:
        assert 0 <= r.n_dropped <= r.n_segments
        n_kept_tokens = len(r.kept_text.split()) if r.kept_text else 0
        # Every kept passage has <= SEG tokens; dropped ones are gone.
        assert n_kept_tokens <= (r.n_segments - r.n_dropped) * SEG


def test_plan_is_single_hash_agg_chain(spark):
    plan = passage_dedup(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    # No driver-side artifacts: the whole operator is scan -> explode ->
    # hash agg -> shuffle join -> hash agg.
    assert "Generate" in plan  # explode stayed expression-level
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
