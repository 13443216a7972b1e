"""Prefix-filtering completeness: the exact join must return EVERY
pair clearing the threshold (verified against a brute-force all-pairs
ground truth computed in Python) — the property that makes it the
exactness anchor for the MinHash path. Parity lives in test_oracles."""

import random

from ocrs_spark.ops import setjoin
from ocrs_spark.ops.setjoin import SIM_T, exact_jaccard_join


def _shingles(text):
    toks = text.split(" ")
    return {" ".join(toks[i : i + 3]) for i in range(max(len(toks) - 2, 0))}


def _brute_pairs(texts):
    sets = {i: _shingles(t) for i, t in enumerate(texts)}
    out = set()
    for a in sets:
        for b in sets:
            if a < b and sets[a] and sets[b]:
                ni = len(sets[a] & sets[b])
                j = round(ni / (len(sets[a]) + len(sets[b]) - ni), 4)
                if j >= SIM_T:
                    out.add((a, b))
    return out


def _run(spark, monkeypatch, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    monkeypatch.setattr(setjoin, "load_tables", lambda _s, _d, *_n: (df,))
    return {(r.doc_a, r.doc_b) for r in exact_jaccard_join(spark, ".").collect()}


def test_completeness_vs_bruteforce(spark, monkeypatch):
    # Random word-soup corpus with planted near-dup families: the
    # prefix-filtered join must find exactly the brute-force pair set.
    rng = random.Random(17)
    vocab = [f"w{i}" for i in range(60)]
    base = [" ".join(rng.choices(vocab, k=30)) for _ in range(12)]
    texts = list(base)
    # Near-dups: copy with one word changed (J well above 0.5) and a
    # tail appended (J near but above 0.5 for 30-token docs).
    for i in (0, 3, 7):
        toks = base[i].split(" ")
        toks[5] = "CHANGED"
        texts.append(" ".join(toks))
    expected = _brute_pairs(texts)
    assert expected, "fixture must plant at least one qualifying pair"
    got = _run(spark, monkeypatch, texts)
    assert got == expected


def test_subthreshold_pairs_excluded(spark, monkeypatch):
    # Two docs sharing only a 5-token run out of ~30: J << 0.5.
    shared = "s1 s2 s3 s4 s5"
    a = shared + " " + " ".join(f"a{i}" for i in range(25))
    b = shared + " " + " ".join(f"b{i}" for i in range(25))
    got = _run(spark, monkeypatch, [a, b])
    assert got == set()
