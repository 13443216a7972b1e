"""Contracts for the shuffle-skew advisor (ops/skewadvisor.py):
hand-built skew metrics, the no-skew baseline, and the salt factor
actually capping the hot key's share.
"""

from pyspark.sql import Row

from ocrs_spark.ops.skewadvisor import PARTS, key_skew_report


def _df(spark, counts):
    rows = []
    i = 0
    for key, n in counts.items():
        for _ in range(n):
            rows.append(Row(k=key, i=i))
            i += 1
    return spark.createDataFrame(rows)


def test_hand_metrics(spark):
    out = key_skew_report(_df(spark, {"hot": 60, "a": 20, "b": 20}), "k", "t.k").collect()[0]
    assert out["n_keys"] == 3 and out["total_rows"] == 100
    assert out["max_key_rows"] == 60 and out["top_share"] == 0.6
    # salt 60 rows into ceil(60*32/100) = 20 shards -> ~3 rows/shard
    assert out["salt_factor"] == 20
    # with the recommended salt, the hot key's largest shard holds
    # ~max/salt rows <= total/PARTS (+1 for remainder)
    assert (out["max_key_rows"] + out["salt_factor"] - 1) // out["salt_factor"] <= (
        out["total_rows"] // PARTS + 1
    )


def test_uniform_keys_need_no_salt(spark):
    out = key_skew_report(_df(spark, {f"k{i}": 5 for i in range(64)}), "k", "t.k").collect()[0]
    assert out["salt_factor"] == 1
    assert out["top_share"] == round(5 / 320, 6)
    assert out["p99_over_mean"] == 1.0  # all counts equal
