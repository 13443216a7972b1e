"""Contracts for posting-list gamma sizing (ops/postingsize.py): a
pure-Python recompute of gaps and Elias-gamma bit counts, plus the
structural guarantees — gamma beats raw on dense lists, digit-count
formula matches int.bit_length, and the stopword-vs-rare-token spread
is actually visible.
"""

from collections import defaultdict

import pyarrow.parquet as pq

from ocrs_spark.ops.postingsize import MIN_POSTINGS, posting_compression

SF = "/root/testdata/sf0.001"


def _py_rows():
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    lists = defaultdict(list)
    for doc_id, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        for tok in set(w for w in text.split(" ") if w):
            lists[tok].append(doc_id)
    out = {}
    for tok, ids in lists.items():
        if len(ids) < MIN_POSTINGS:
            continue
        ids.sort()
        gaps = [ids[0] + 1] + [b - a for a, b in zip(ids, ids[1:])]
        gamma = sum(2 * g.bit_length() - 1 for g in gaps)
        out[tok] = (
            len(ids),
            64 * len(ids),
            gamma,
            (1000 * gamma) // (64 * len(ids)),
        )
    return out


def test_sizes_match_python_recompute(spark):
    exp = _py_rows()
    got = posting_compression(spark, SF).collect()
    assert len(got) == len(exp)
    for r in got:
        assert (
            r["n_postings"],
            r["raw_bits"],
            r["gamma_bits"],
            r["ratio_milli"],
        ) == exp[r["token"]]


def test_compression_structure(spark):
    rows = posting_compression(spark, SF).collect()
    ratios = {r["token"]: r["ratio_milli"] for r in rows}
    # dense (stopword-like) lists compress below raw; the corpus-wide
    # spread between best and worst list is real
    assert min(ratios.values()) < 1000
    assert max(ratios.values()) > min(ratios.values())
    for r in rows:
        assert r["gamma_bits"] >= r["n_postings"]  # >= 1 bit per gap
        assert r["raw_bits"] == 64 * r["n_postings"]
