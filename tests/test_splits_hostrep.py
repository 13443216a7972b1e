"""Contracts for leakage-safe splits (ops/splits.py) and the
host-reputation rollup (ops/hostrep.py): the structural no-straddle
guarantee, split stability under corpus growth, rollup level algebra,
and the one-scan Expand plan shape.
"""

from pyspark.sql import Row
from pyspark.sql import functions as F

from ocrs_spark.ops.dedup import ngram_jaccard_pairs
from ocrs_spark.ops.hostrep import reputation_rollup, synth_hosted_docs
from ocrs_spark.ops.splits import assign_split, cluster_safe_split

SF = "/root/testdata/sf0.001"


def test_no_near_dup_pair_straddles_splits(spark):
    split = cluster_safe_split(spark, SF).select("doc_id", "split")
    pairs = ngram_jaccard_pairs(spark, SF).select("doc_a", "doc_b")
    straddle = (
        pairs.join(split.withColumnRenamed("doc_id", "doc_a"), "doc_a")
        .withColumnRenamed("split", "split_a")
        .join(split.withColumnRenamed("doc_id", "doc_b"), "doc_b")
        .filter(F.col("split_a") != F.col("split"))
    )
    assert pairs.count() > 0  # non-vacuous: the pair graph exists
    assert straddle.count() == 0


def test_split_covers_corpus_with_sane_fractions(spark):
    split = cluster_safe_split(spark, SF)
    by = {r["split"]: r["n"] for r in split.groupBy("split").agg(F.count("*").alias("n")).collect()}
    total = sum(by.values())
    assert total == 500
    # 80/10/10 target with hash noise at 500 docs: generous bounds
    assert by["train"] / total > 0.6
    assert 0 < by.get("val", 0) < total * 0.3
    assert 0 < by.get("test", 0) < total * 0.3


def test_split_stable_under_growth(spark):
    base = spark.createDataFrame(
        [Row(doc_id=i, cluster_id=i % 17) for i in range(100)]
    )
    grown = spark.createDataFrame(
        [Row(doc_id=i, cluster_id=i % 17) for i in range(250)]
    )
    a = {r["doc_id"]: r["split"] for r in assign_split(base).collect()}
    b = {r["doc_id"]: r["split"] for r in assign_split(grown).collect()}
    assert all(b[k] == v for k, v in a.items())


def test_rollup_levels_are_consistent(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = reputation_rollup(synth_hosted_docs(docs)).collect()
    by_lvl = {}
    for r in out:
        by_lvl.setdefault(r["lvl"], []).append(r)
    # ROLLUP(tld, domain, host) -> exactly 4 grouping sets
    assert sorted(by_lvl) == [0, 1, 3, 7]
    grand = by_lvl[7]
    assert len(grand) == 1 and grand[0]["n_docs"] == 500
    # every level's doc counts sum to the corpus
    for lvl in (0, 1, 3):
        assert sum(r["n_docs"] for r in by_lvl[lvl]) == 500
    # hierarchy cardinality: 3 TLDs, 15 domains, <= 105 hosts
    assert len(by_lvl[3]) == 3
    assert len(by_lvl[1]) == 15
    assert len(by_lvl[0]) <= 105
    # host rows carry the full path; tld rows only the tld
    assert all(r["host"] and r["domain"] and r["tld"] for r in by_lvl[0])
    assert all(r["host"] is None and r["domain"] is None and r["tld"] for r in by_lvl[3])


def test_rollup_plan_is_one_scan_with_expand(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = (
        reputation_rollup(synth_hosted_docs(docs))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Expand" in plan  # the grouping-set fan-out node
    assert plan.count("FileScan parquet") == 1  # hierarchy in ONE pass
