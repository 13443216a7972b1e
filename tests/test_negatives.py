"""Contracts for hard-negative mining (ops/negatives.py): every planted
anchor gets triples, negatives are genuinely hard (well above random
cosine) yet below the duplicate threshold, the positive never leaks
into the negative slots, and the per-anchor cut is bounded.
"""

from pyspark.sql import functions as F

from ocrs_spark.ops.dedup import COSINE_THRESHOLD, PLANT_N, PLANT_OFFSET
from ocrs_spark.ops.negatives import NEG_PER_ANCHOR, hard_negative_triples

SF = "/root/testdata/sf0.001"


def test_triples_shape_and_bounds(spark):
    rows = hard_negative_triples(spark, SF).collect()
    per_anchor = {}
    for r in rows:
        per_anchor.setdefault(r["anchor"], []).append(r)
    # every planted anchor is represented, each with <= NEG_PER_ANCHOR
    assert set(per_anchor) == set(range(PLANT_N))
    for a, rs in per_anchor.items():
        assert len(rs) <= NEG_PER_ANCHOR
        for r in rs:
            assert r["positive"] == a + PLANT_OFFSET
            assert r["negative"] not in (a, r["positive"])
            # below the duplicate threshold: never a mislabeled positive
            assert r["neg_cos"] < COSINE_THRESHOLD


def test_negatives_are_hard_not_random(spark):
    rows = hard_negative_triples(spark, SF).collect()
    # bucket-mates share projection structure: cosines sit far above the
    # isotropic-random expectation (~0 for 64-dim)
    assert min(r["neg_cos"] for r in rows) > 0.1


def test_deterministic(spark):
    a = sorted(map(tuple, hard_negative_triples(spark, SF).collect()))
    b = sorted(map(tuple, hard_negative_triples(spark, SF).collect()))
    assert a == b and len(a) > 0
