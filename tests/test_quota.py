"""Contracts for temperature-quota sampling (ops/quota.py): quota
arithmetic, exact per-language sample sizes, temperature flattening
(tail languages gain share), and partitioning-independence of the
grouped order-statistics selection.
"""

from pyspark.sql import functions as F

from ocrs_spark.ops.quota import quota_sample, temperature_quotas

SF = "/root/testdata/sf0.001"


def test_quota_math_hand_case():
    # counts 400/100: sqrt -> 20/10, denom 30; target 90 -> 60/30
    assert temperature_quotas({"a": 400, "b": 100}, target=90) == {"a": 60, "b": 30}
    # quota never exceeds the stratum size
    assert temperature_quotas({"a": 4, "b": 10000}, target=5000)["a"] == 4


def test_exact_quota_counts(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    counts = {
        r["lang"]: r["n"]
        for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    quotas = temperature_quotas(counts)
    got = {
        r["lang"]: r["n"]
        for r in quota_sample(docs)
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == {l: q for l, q in quotas.items() if q > 0}


def test_temperature_flattens_the_distribution(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    counts = {
        r["lang"]: r["n"]
        for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    total = sum(counts.values())
    quotas = temperature_quotas(counts)
    qtotal = sum(quotas.values())
    head = max(counts, key=counts.get)
    tail = min(counts, key=counts.get)
    # sqrt-temperature: the head language loses share, the tail gains
    assert quotas[head] / qtotal < counts[head] / total
    assert quotas[tail] / qtotal > counts[tail] / total


def test_selection_is_partitioning_independent(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    a = sorted(map(tuple, quota_sample(docs, parts=4).collect()))
    b = sorted(map(tuple, quota_sample(docs, parts=17).collect()))
    assert a == b


def test_ranks_are_dense_per_language(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = quota_sample(docs)
    agg = out.groupBy("lang").agg(
        F.count("*").alias("n"),
        F.min("samp_rank").alias("lo"),
        F.max("samp_rank").alias("hi"),
        F.countDistinct("samp_rank").alias("d"),
    )
    for r in agg.collect():
        assert r["lo"] == 1 and r["hi"] == r["n"] and r["d"] == r["n"]
