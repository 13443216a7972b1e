"""Contracts for heavy-hitter detection (ops/heavyhitters.py): the MG
candidate superset guarantee on skewed data, the sketch size bound,
and two-pass equality with the naive exact groupBy.
"""

from pyspark.sql import Row
from pyspark.sql import functions as F

from ocrs_spark.ops.heavyhitters import _mg_partition, heavy_hitter_tokens, mg_candidates

SF = "/root/testdata/sf0.001"


def _zipf_tokens(spark, n_each):
    rows = []
    for w, n in n_each.items():
        rows += [Row(w=w)] * n
    return spark.createDataFrame(rows).repartition(7)


def test_candidates_are_a_superset_of_true_heavies(spark):
    # 'hot' has 400/1000 tokens; threshold N/k with k=5 is 200
    dist = {"hot": 400, "warm": 250, **{f"cold{i}": 10 for i in range(35)}}
    toks = _zipf_tokens(spark, dist)
    n = sum(dist.values())
    k = 5
    cand = {r["w"] for r in mg_candidates(toks, k).collect()}
    true_heavy = {w for w, c in dist.items() if c * k >= n}
    assert true_heavy  # non-vacuous
    assert true_heavy.issubset(cand)


def test_sketch_size_is_bounded(spark):
    import pandas as pd

    k = 8
    pdf = pd.DataFrame({"w": [f"t{i % 500}" for i in range(5000)]})
    out = list(_mg_partition(k)([pdf]))[0]
    # k counters + the decrement ledger row
    assert len(out) <= k + 1
    assert (out["d"] > 0).any()  # 500 distinct into 8 counters decremented


def test_two_pass_matches_naive_exact(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    toks = docs.select(
        F.explode(F.expr("filter(split(text, ' '), w -> w <> '')")).alias("w")
    )
    n = toks.count()
    k = 200
    naive = {
        (r["w"], r["cnt"])
        for r in toks.groupBy("w")
        .agg(F.count("*").cast("long").alias("cnt"))
        .filter(F.col("cnt") * k > n)
        .collect()
    }
    got = {
        (r["token"], r["cnt"]) for r in heavy_hitter_tokens(spark, SF, k).collect()
    }
    assert naive  # non-vacuous on the synthetic vocabulary
    assert got == naive
