"""Sliding-window chunking semantics (oracle parity in test_oracles):
boundary arithmetic on hand-sized docs, coverage/overlap invariants,
and the zero-shuffle expression-only plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from ocrs_spark.ops.chunking import CHUNK, STRIDE, chunk_windows, chunk_windows_df

SF = "/root/testdata/sf0.001"


def _doc(n: int) -> str:
    return " ".join(f"t{i}" for i in range(n))


def test_window_boundaries_hand_computed(spark):
    docs = spark.createDataFrame(
        [(1, _doc(10)), (2, _doc(64)), (3, _doc(100)), (4, _doc(113))],
        "doc_id bigint, text string",
    )
    out = chunk_windows_df(docs).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    # short doc and exact-one-window doc: single chunk, full text
    assert [c.n_chunk_tokens for c in by_doc[1]] == [10]
    assert [c.n_chunk_tokens for c in by_doc[2]] == [64]
    # 100 tokens: [0:64], [48:100] -> 64 + 52
    assert [(c.chunk_idx, c.n_chunk_tokens) for c in sorted(by_doc[3], key=lambda c: c.chunk_idx)] == [(0, 64), (1, 52)]
    # 113 tokens: [0:64], [48:112], [96:113] -> 64, 64, 17
    assert [(c.chunk_idx, c.n_chunk_tokens) for c in sorted(by_doc[4], key=lambda c: c.chunk_idx)] == [(0, 64), (1, 64), (2, 17)]
    # window k starts at token k*STRIDE: check doc 3 chunk 1 content
    c1 = [c for c in by_doc[3] if c.chunk_idx == 1][0]
    assert c1.chunk_text.split(" ")[0] == f"t{STRIDE}"
    assert c1.chunk_text.split(" ")[-1] == "t99"


def test_every_token_covered_and_overlap(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    chunks = chunk_windows(spark, SF)
    n_tok = docs.select(
        "doc_id", F.size(F.split(F.trim("text"), r"\s+")).alias("n")
    )
    cov = (
        chunks.groupBy("doc_id")
        .agg(
            F.max(F.col("chunk_idx") * STRIDE + F.col("n_chunk_tokens")).alias(
                "covered"
            ),
            F.count(F.lit(1)).alias("n_chunks"),
        )
        .join(n_tok, "doc_id")
    )
    bad = cov.where("covered <> n").count()
    assert bad == 0  # the windows jointly cover every token exactly
    # full consecutive windows overlap by CHUNK - STRIDE
    assert CHUNK - STRIDE == 16


def test_plan_is_expression_only_no_shuffle(spark):
    plan = (
        chunk_windows(spark, SF)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan  # row-local: no shuffle at all
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Generate" in plan  # the explode stays JVM-side
