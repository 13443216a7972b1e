"""Contracts for join-size estimation (ops/joinsize.py): the
histogram-product prediction must equal the ACTUAL join cardinality
(run the real join once, in the test only), hot keys must be the true
argmax keys, and the totals must be consistent.
"""

from ocrs_spark.ops import load_tables
from ocrs_spark.ops.joinsize import TOP_K, join_size_estimate

SF = "/root/testdata/sf0.001"


def test_prediction_equals_actual_join_count(spark):
    rows = join_size_estimate(spark, SF).collect()
    predicted = rows[0]["predicted_rows"]
    orders, lineitem = load_tables(spark, SF, "orders", "lineitem")
    actual = orders.join(
        lineitem, orders.o_orderkey == lineitem.l_orderkey
    ).count()
    assert predicted == actual


def test_hot_keys_are_true_maxima(spark):
    rows = join_size_estimate(spark, SF).collect()
    assert len(rows) == TOP_K
    orders, lineitem = load_tables(spark, SF, "orders", "lineitem")
    per_key = {
        r["key"]: r["cnt"]
        for r in lineitem.groupBy(
            lineitem.l_orderkey.alias("key")
        ).count().withColumnRenamed("count", "cnt").collect()
    }
    o_keys = {
        r["key"]: r["cnt"]
        for r in orders.groupBy(
            orders.o_orderkey.alias("key")
        ).count().withColumnRenamed("count", "cnt").collect()
    }
    products = sorted(
        (
            (o_keys[k] * c, -k)
            for k, c in per_key.items()
            if k in o_keys
        ),
        reverse=True,
    )
    floor_kth = products[TOP_K - 1][0]
    for r in rows:
        assert r["out_rows"] == o_keys[r["key"]] * per_key[r["key"]]
        assert r["out_rows"] >= floor_kth
        assert r["left_rows"] == o_keys[r["key"]]
        assert r["right_rows"] == per_key[r["key"]]
