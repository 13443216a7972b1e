"""Contracts for LSH banding calibration (ops/lshcal.py). The configs
(1x8, 2x4, 4x2, 8x1) form a refinement chain — each coarser config's
bands are unions of the finer one's — so candidate sets must NEST, and
the measured counts must follow: candidates and recall non-decreasing
in n_bands, hits bounded by candidates and truth, and the 1-band
config's candidates exactly the identical-full-signature pairs.
"""

from collections import defaultdict

from ocrs_spark.ops.dedup import MINHASH_K, _minhash_signature_df
from ocrs_spark.ops.lshcal import CONFIGS, _candidates, lsh_band_calibration

SF = "/root/testdata/sf0.001"


def test_calibration_counts_nest_and_bound(spark):
    rows = {r["n_bands"]: r for r in lsh_band_calibration(spark, SF).collect()}
    assert sorted(rows) == sorted(CONFIGS)
    prev_cand = prev_hits = -1
    for b in sorted(CONFIGS):
        r = rows[b]
        assert r["rows_per_band"] == MINHASH_K // b
        assert 0 <= r["n_hits"] <= min(r["n_candidates"], r["n_true"])
        # refinement chain: more bands never loses a candidate or a hit
        assert r["n_candidates"] >= prev_cand
        assert r["n_hits"] >= prev_hits
        prev_cand, prev_hits = r["n_candidates"], r["n_hits"]
        if r["n_candidates"] > 0:
            assert r["precision_milli"] == (1000 * r["n_hits"]) // r["n_candidates"]
        assert r["recall_milli"] == (1000 * r["n_hits"]) // r["n_true"]
    # non-vacuous on this corpus: the chain actually trades precision
    # for recall (strictest config misses truth; loosest floods)
    assert rows[min(CONFIGS)]["recall_milli"] < 1000
    assert rows[max(CONFIGS)]["precision_milli"] < rows[min(CONFIGS)]["precision_milli"]


def test_candidate_sets_nest_pairwise(spark):
    sig = _minhash_signature_df(spark, SF).localCheckpoint()
    sets = {
        b: {(r["doc_a"], r["doc_b"]) for r in _candidates(sig, b).collect()}
        for b in CONFIGS
    }
    for lo, hi in zip(sorted(CONFIGS), sorted(CONFIGS)[1:]):
        assert sets[lo] <= sets[hi]


def test_one_band_candidates_are_identical_signatures(spark):
    sig_rows = _minhash_signature_df(spark, SF).collect()
    by_sig = defaultdict(list)
    for r in sig_rows:
        by_sig[tuple(r[f"s{k}"] for k in range(MINHASH_K))].append(r["doc_id"])
    expected = set()
    for docs in by_sig.values():
        docs.sort()
        for i in range(len(docs)):
            for j in range(i + 1, len(docs)):
                expected.add((docs[i], docs[j]))
    sig = _minhash_signature_df(spark, SF)
    got = {(r["doc_a"], r["doc_b"]) for r in _candidates(sig, 1).collect()}
    assert got == expected
