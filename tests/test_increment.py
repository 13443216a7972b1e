"""Contracts for incremental near-dup detection (ops/increment.py): a
full pure-Python recompute (minhash banding, candidate generation
against the frozen index + within-batch, integer-exact shingle-Jaccard
verify, verdict precedence), plus the keep-earliest and precedence
invariants.
"""

import hashlib
from collections import defaultdict

import pyarrow.parquet as pq

from ocrs_spark.ops.dedup import LSH_BANDS, MINHASH_K
from ocrs_spark.ops.increment import DELTA_MOD, incremental_neardup

SF = "/root/testdata/sf0.001"


def _md5(s):
    return hashlib.md5(s.encode()).hexdigest()


def _py_verdicts():
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    shingles, sigs = {}, {}
    for doc_id, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        toks = text.split(" ")
        sh = {" ".join(toks[i : i + 3]) for i in range(max(len(toks) - 2, 0))}
        shingles[doc_id] = sh
        if sh:
            sigs[doc_id] = [
                min(_md5(f"{s}#{k}") for s in sh) for k in range(MINHASH_K)
            ]
    rows = MINHASH_K // LSH_BANDS
    buckets = defaultdict(set)
    for doc_id, sig in sigs.items():
        for b in range(LSH_BANDS):
            key = (b, _md5("".join(sig[b * rows + r] for r in range(rows))))
            buckets[key].add(doc_id)
    cand = set()  # (delta_doc, other, src)
    for docs in buckets.values():
        for d in docs:
            if d % DELTA_MOD != 0:
                continue
            for o in docs:
                if o % DELTA_MOD != 0:
                    cand.add((d, o, "corpus"))
                elif o < d:
                    cand.add((d, o, "batch"))
    counts = defaultdict(lambda: [0, 0])
    for d, o, src in cand:
        a, b = shingles[d], shingles[o]
        ni = len(a & b)
        if 3 * ni >= len(a) + len(b):  # J >= 1/2, exact integers
            counts[d][0 if src == "corpus" else 1] += 1
    out = {}
    for doc_id in t["doc_id"].to_pylist():
        if doc_id % DELTA_MOD != 0:
            continue
        ncm, nbm = counts.get(doc_id, (0, 0))
        verdict = (
            "dup_of_corpus" if ncm > 0 else "dup_in_batch" if nbm > 0 else "novel"
        )
        out[doc_id] = (ncm, nbm, verdict)
    return out


def test_verdicts_match_python_recompute(spark):
    exp = _py_verdicts()
    got = incremental_neardup(spark, SF).collect()
    assert len(got) == len(exp)
    for r in got:
        assert (
            r["n_corpus_matches"],
            r["n_batch_matches"],
            r["verdict"],
        ) == exp[r["doc_id"]]


def test_precedence_and_batch_coverage(spark):
    rows = incremental_neardup(spark, SF).collect()
    by_verdict = defaultdict(int)
    for r in rows:
        by_verdict[r["verdict"]] += 1
        # precedence: any corpus match forces dup_of_corpus even if
        # batch matches also exist
        if r["n_corpus_matches"] > 0:
            assert r["verdict"] == "dup_of_corpus"
        elif r["n_batch_matches"] > 0:
            assert r["verdict"] == "dup_in_batch"
        else:
            assert r["verdict"] == "novel"
        assert r["doc_id"] % DELTA_MOD == 0
    # every batch doc got exactly one row, and all three verdicts occur
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id"])
    n_delta = sum(1 for d in t["doc_id"].to_pylist() if d % DELTA_MOD == 0)
    assert len(rows) == n_delta
    assert set(by_verdict) == {"dup_of_corpus", "dup_in_batch", "novel"}
