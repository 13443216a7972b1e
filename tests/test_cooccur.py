"""Contracts for PMI collocation mining (ops/cooccur.py): hand-computed
PMI on a tiny corpus, the min-count floor, deterministic tie order,
and the TakeOrderedAndProject top-k plan (never a full global sort).
"""

import math

from pyspark.sql import Row

from ocrs_spark.ops.cooccur import pmi_top_collocations


def _docs(spark, texts):
    return spark.createDataFrame([Row(doc_id=i, text=t) for i, t in enumerate(texts)])


def test_pmi_hand_case(spark):
    # corpus: "x y" twice and "p q" once -> tokens T=6, bigrams B=3
    # c_xy=2, c_x=c_y=2: PMI = ln((2/3)/((2/6)*(2/6))) = ln(6)
    docs = _docs(spark, ["x y", "x y", "p q"])
    out = {(r["a"], r["b"]): r for r in pmi_top_collocations(docs, min_count=2, k=10).collect()}
    assert set(out) == {("x", "y")}  # p q falls below min_count=2
    row = out[("x", "y")]
    assert row["c_ab"] == 2
    assert row["pmi"] == round(math.log(6.0), 4)


def test_pmi_tie_order_is_deterministic(spark):
    # two pairs with identical statistics -> identical PMI; order by (a, b)
    docs = _docs(spark, ["a b", "a b", "c d", "c d"])
    rows = pmi_top_collocations(docs, min_count=2, k=10).collect()
    assert [(r["a"], r["b"]) for r in rows] == [("a", "b"), ("c", "d")]
    assert rows[0]["pmi"] == rows[1]["pmi"]


def test_topk_plan_avoids_global_sort(spark):
    docs = _docs(spark, ["a b c d e f g h"] * 4)
    plan = (
        pmi_top_collocations(docs, min_count=1, k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
    # the unigram side broadcasts into the bigram counts
    assert "BroadcastHashJoin" in plan
