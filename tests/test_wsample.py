"""A-ES weighted-sampling semantics: heavier rows must be included
with measurably higher frequency across many disjoint seeds, the
selection is exactly K, and the key math is reproducible. Cross-engine
parity lives in test_oracles.py."""

import math

from pyspark.sql import functions as F

from ocrs_spark.ops import wsample
from ocrs_spark.ops.wsample import WS_K, weighted_sample_docs


def _docs(spark, weights):
    # doc i gets exactly weights[i] tokens.
    rows = [(i, " ".join(f"t{i}x{j}" for j in range(w))) for i, w in enumerate(weights)]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_exactly_k_and_reproducible(spark, monkeypatch):
    df = _docs(spark, [10] * 120)
    monkeypatch.setattr(wsample, "load_tables", lambda _s, _d, *_n: (df,))
    r1 = [tuple(r) for r in weighted_sample_docs(spark, ".").collect()]
    r2 = [tuple(r) for r in weighted_sample_docs(spark, ".").collect()]
    assert len(r1) == WS_K
    assert r1 == r2
    # Keys are sorted descending with doc_id tiebreak.
    keys = [(r[2], -r[0]) for r in r1]
    assert keys == sorted(keys, reverse=True)


def test_heavy_rows_selected_more_often(spark, monkeypatch):
    # 20 heavy docs (w=200) among 180 light ones (w=5): with K=50,
    # A-ES must take essentially every heavy doc — P(skip) ~ exp-tail.
    weights = [200] * 20 + [5] * 180
    df = _docs(spark, weights)
    monkeypatch.setattr(wsample, "load_tables", lambda _s, _d, *_n: (df,))
    got = {r.doc_id for r in weighted_sample_docs(spark, ".").collect()}
    heavy = {i for i in range(20)}
    assert len(heavy & got) >= 18
    # And the light majority cannot crowd them out by count alone.
    assert len(got) == WS_K


def test_key_formula_matches_python(spark, monkeypatch):
    import hashlib

    df = _docs(spark, [7, 13, 29])
    monkeypatch.setattr(wsample, "load_tables", lambda _s, _d, *_n: (df,))
    rows = {r.doc_id: r for r in weighted_sample_docs(spark, ".").collect()}
    for i, w in enumerate([7, 13, 29]):
        u_num = int(hashlib.md5(f"ws1|{i}".encode()).hexdigest()[:8], 16) + 1
        expect = round(math.log(u_num / 4294967296.0) / w, 6)
        assert rows[i].log_key == expect
        assert rows[i].weight == w
