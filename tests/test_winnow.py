"""Winnowing fingerprint semantics: the MOSS guarantees (window
coverage, detection of shared runs >= W+K-1 tokens, density bound),
rightmost tie-breaking, and short-doc degradation. Cross-engine parity
lives in test_oracles.py."""

import hashlib

from ocrs_spark.ops.winnow import K, W, winnow_fingerprints, winnow_fingerprints_df

SF_DIR = "/root/testdata/sf0.001"


def _mk(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _py_winnow(text):
    """Independent reference implementation (direct MOSS definition)."""
    toks = text.split()
    grams = [
        hashlib.md5(" ".join(toks[p : p + K]).encode()).hexdigest()
        for p in range(len(toks) - K + 1)
    ]
    if not grams:
        return set()
    out = set()
    last_start = max(len(grams) - W, 0)
    for s in range(last_start + 1):
        win = grams[s : s + W]
        best = min(win)
        # rightmost occurrence of the min hash
        pos = s + max(i for i, h in enumerate(win) if h == best)
        out.add((pos, best))
    return out


def test_matches_direct_python_definition(spark):
    texts = [
        "the quick brown fox jumps over the lazy dog again and again",
        "a a a a a a",
        "one two three four",  # exactly K tokens -> one gram, one window
        "short doc",  # fewer than K tokens -> no fingerprints
    ]
    rows = [(i, t) for i, t in enumerate(texts)]
    got = {}
    for r in winnow_fingerprints_df(_mk(spark, rows)).collect():
        got.setdefault(r.doc_id, set()).add((r.fp_pos, r.fp_hash))
    for i, t in enumerate(texts):
        assert got.get(i, set()) == _py_winnow(t), f"doc {i}"


def test_shared_run_yields_shared_fingerprint(spark):
    # MOSS theorem: a shared token run of length >= W + K - 1 guarantees
    # at least one shared fingerprint hash.
    shared = " ".join(f"s{i}" for i in range(W + K - 1))
    rows = [
        (0, "alpha beta gamma delta " + shared + " omega psi chi phi"),
        (1, "uno dos tres cuatro cinco " + shared + " seis siete"),
    ]
    fps = {}
    for r in winnow_fingerprints_df(_mk(spark, rows)).collect():
        fps.setdefault(r.doc_id, set()).add(r.fp_hash)
    assert fps[0] & fps[1], "shared run produced no shared fingerprint"


def test_rightmost_tiebreak(spark):
    # All grams identical -> every window selects its RIGHTMOST position.
    rows = [(0, "a a a a a a")]  # 6 tokens, 3 grams, starts {0: frame 0-2}
    got = [(r.fp_pos, r.fp_hash) for r in winnow_fingerprints_df(_mk(spark, rows)).collect()]
    assert len(got) == 1 and got[0][0] == 2


def test_density_and_coverage_on_corpus(spark):
    res = winnow_fingerprints(spark, SF_DIR).collect()
    assert res
    per_doc = {}
    for r in res:
        per_doc.setdefault(r.doc_id, []).append(r.fp_pos)
    docs = {
        r.doc_id: len(r.text.split())
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    }
    for d, positions in per_doc.items():
        n_grams = docs[d] - K + 1
        n_starts = max(n_grams - W, 0) + 1
        # never more fingerprints than windows, never fewer than 1
        assert 1 <= len(positions) <= n_starts
        # coverage: every window start has a selected pos within its frame
        ps = sorted(set(positions))
        for s in range(n_starts):
            assert any(s <= p <= s + W - 1 for p in ps), (d, s)
