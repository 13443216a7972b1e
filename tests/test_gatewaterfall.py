"""Contracts for the quality-gate waterfall (ops/gatewaterfall.py):
a pure-Python recompute of the cascade, conservation identities
(marginals + survivors telescope), and marginal <= solo.
"""

import hashlib

import pyarrow.parquet as pq

from ocrs_spark.ops.gatewaterfall import (
    LANG_ALLOW,
    MIN_CHARS,
    NOISE_MOD,
    SOURCE_BLOCK,
    _SALT,
    gate_waterfall,
)

SF = "/root/testdata/sf0.001"


def _py_gates(row):
    doc_id, lang, source, n_chars = row
    h = int(hashlib.md5(f"{doc_id}{_SALT}".encode()).hexdigest()[:8], 16)
    return (
        n_chars >= MIN_CHARS,
        lang in LANG_ALLOW,
        source not in SOURCE_BLOCK,
        h % NOISE_MOD != 0,
    )


def _expected():
    t = pq.read_table(
        f"{SF}/documents.parquet",
        columns=["doc_id", "lang", "source", "n_chars"],
    )
    rows = list(
        zip(
            t["doc_id"].to_pylist(),
            t["lang"].to_pylist(),
            t["source"].to_pylist(),
            t["n_chars"].to_pylist(),
        )
    )
    marg, solo, after = [0] * 4, [0] * 4, [0] * 4
    for r in rows:
        g = _py_gates(r)
        for i in range(4):
            if not g[i]:
                solo[i] += 1
            if all(g[:i]) and not g[i]:
                marg[i] += 1
            if all(g[: i + 1]):
                after[i] += 1
    return len(rows), marg, solo, after


def test_waterfall_matches_python_recompute(spark):
    n, marg, solo, after = _expected()
    got = sorted(gate_waterfall(spark, SF).collect(), key=lambda r: r["order_idx"])
    assert [r["gate"] for r in got] == ["length", "lang", "source", "neardup"]
    assert [r["n_marginal"] for r in got] == marg
    assert [r["n_solo"] for r in got] == solo
    assert [r["survivors_after"] for r in got] == after


def test_waterfall_identities(spark):
    rows = sorted(gate_waterfall(spark, SF).collect(), key=lambda r: r["order_idx"])
    n = 500
    prev = n
    for r in rows:
        # telescoping: survivors_after = previous survivors - marginal
        assert r["survivors_after"] == prev - r["n_marginal"]
        prev = r["survivors_after"]
        # a gate's marginal rejections never exceed its solo firings
        assert 0 <= r["n_marginal"] <= r["n_solo"]
    # the cascade is non-degenerate: every gate fires somewhere,
    # and at least one gate's marginal is strictly below its solo
    assert all(r["n_solo"] > 0 for r in rows)
    assert any(r["n_marginal"] < r["n_solo"] for r in rows)
    assert rows[-1]["survivors_after"] > 0
