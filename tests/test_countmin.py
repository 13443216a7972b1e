"""Contracts for the Count-Min sketch (ops/countmin.py): a full
pure-Python sketch recompute, the one-sided error guarantee, the
epsilon-N width bound, and non-vacuity (collisions actually happen at
the configured width).
"""

import hashlib
from collections import Counter

import pyarrow.parquet as pq

from ocrs_spark.ops.countmin import (
    CM_DEPTH,
    CM_WIDTH,
    _SALT,
    countmin_token_freq,
)

SF = "/root/testdata/sf0.001"


def _bucket(token: str, r: int) -> int:
    h = hashlib.md5(f"{token}{_SALT}{r}".encode()).hexdigest()[:8]
    return int(h, 16) % CM_WIDTH


def _expected():
    texts = pq.read_table(f"{SF}/documents.parquet", columns=["text"])[
        "text"
    ].to_pylist()
    exact = Counter(t for x in texts for t in x.split(" ") if t)
    cells = [[0] * CM_WIDTH for _ in range(CM_DEPTH)]
    for tok, c in exact.items():
        for r in range(CM_DEPTH):
            cells[r][_bucket(tok, r)] += c
    return exact, {
        tok: min(cells[r][_bucket(tok, r)] for r in range(CM_DEPTH))
        for tok in exact
    }


def test_sketch_matches_python_recompute(spark):
    exact, est = _expected()
    got = {
        r["token"]: (r["exact_cnt"], r["cm_estimate"], r["overestimate"])
        for r in countmin_token_freq(spark, SF).collect()
    }
    assert set(got) == set(exact)
    for tok in exact:
        assert got[tok] == (
            exact[tok],
            est[tok],
            est[tok] - exact[tok],
        )


def test_cm_guarantees(spark):
    rows = countmin_token_freq(spark, SF).collect()
    n_total = sum(r["exact_cnt"] for r in rows)
    # one-sided error: never underestimates
    assert all(r["overestimate"] >= 0 for r in rows)
    # each row's cells sum to N, so any estimate is bounded by N
    assert all(r["cm_estimate"] <= n_total for r in rows)
    # non-vacuous at the configured width: collisions exist
    assert any(r["overestimate"] > 0 for r in rows)
    # and the min-over-rows genuinely resolves SOME token exactly
    # or near-exactly (the sketch is not all-noise either)
    assert min(r["overestimate"] for r in rows) < n_total // CM_WIDTH
