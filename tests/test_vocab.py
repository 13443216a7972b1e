"""Contracts for vocabulary OOV coverage (ops/vocab.py): a pure-Python
recompute of the frozen top-K vocabulary (with the deterministic
tie-break) and the per-document OOV rate over it.
"""

from collections import Counter

import pyarrow.parquet as pq

from ocrs_spark.ops.vocab import VOCAB_K, corpus_vocabulary, vocab_oov_rate

SF = "/root/testdata/sf0.001"


def _docs():
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    return list(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))


def _py_vocab(docs):
    c = Counter()
    for _, text in docs:
        c.update(w for w in text.split(" ") if w)
    # count desc, token asc — the module's total deterministic order
    ranked = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))
    return {tok for tok, _ in ranked[:VOCAB_K]}


def test_vocabulary_matches_python_recompute(spark):
    docs = _docs()
    exp = _py_vocab(docs)
    from ocrs_spark.ops import load_tables

    (d,) = load_tables(spark, SF, "documents")
    got = {r["token"] for r in corpus_vocabulary(d).collect()}
    assert got == exp


def test_oov_rate_matches_python_recompute(spark):
    docs = _docs()
    vocab = _py_vocab(docs)
    exp = {}
    for doc_id, text in docs:
        toks = [w for w in text.split(" ") if w]
        oov = sum(1 for w in toks if w not in vocab)
        exp[doc_id] = (len(toks), oov, (1000 * oov) // len(toks))
    got = vocab_oov_rate(spark, SF).collect()
    assert len(got) == len(exp)
    for r in got:
        assert (r["n_tokens"], r["n_oov"], r["oov_milli"]) == exp[r["doc_id"]]
    # non-degenerate: OOV tokens exist (VOCAB_K is below the corpus
    # vocabulary size), but the vocabulary still covers most tokens
    n_oov = sum(r["n_oov"] for r in got)
    n_tok = sum(r["n_tokens"] for r in got)
    assert 0 < n_oov < n_tok
