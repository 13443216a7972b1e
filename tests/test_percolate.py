"""Contracts for percolation / stored-query matching
(ops/percolate.py): a full pure-Python recompute — registry synthesis
(df ranking with total tie-break) and conjunctive containment — plus
the semantic invariants of AND matching.
"""

import pyarrow.parquet as pq

from ocrs_spark.ops.percolate import N_QUERIES, percolate_matches

SF = "/root/testdata/sf0.001"


def _doc_token_sets():
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    return {
        d: {w for w in txt.split(" ") if w}
        for d, txt in zip(t["doc_id"].to_pylist(), t["text"].to_pylist())
    }


def _expected():
    docs = _doc_token_sets()
    df = {}
    for toks in docs.values():
        for w in toks:
            df[w] = df.get(w, 0) + 1
    ranked = sorted(df, key=lambda w: (-df[w], w))[: 2 * N_QUERIES]
    out = {}
    for qid in range(len(ranked) // 2):
        a, b = ranked[2 * qid], ranked[2 * qid + 1]
        matched = [d for d, toks in docs.items() if a in toks and b in toks]
        out[qid] = {
            "term_a": min(a, b),
            "term_b": max(a, b),
            "n_matched": len(matched),
            "min_doc": min(matched) if matched else -1,
            "max_doc": max(matched) if matched else -1,
        }
    return out


def test_percolate_matches_python_recompute(spark):
    exp = _expected()
    rows = percolate_matches(spark, SF).collect()
    assert len(rows) == len(exp)
    for r in rows:
        e = exp[r["qid"]]
        for k, v in e.items():
            assert r[k] == v, (r["qid"], k, r[k], v)


def test_conjunction_is_no_wider_than_either_term(spark):
    # AND-match count can never exceed the df of either term, and the
    # top-ranked query (two highest-df terms) must actually fire —
    # non-vacuity of the synthesized registry.
    docs = _doc_token_sets()
    rows = {r["qid"]: r for r in percolate_matches(spark, SF).collect()}
    for r in rows.values():
        df_a = sum(r["term_a"] in toks for toks in docs.values())
        df_b = sum(r["term_b"] in toks for toks in docs.values())
        assert r["n_matched"] <= min(df_a, df_b)
        if r["n_matched"] == 0:
            assert r["min_doc"] == -1 and r["max_doc"] == -1
    assert rows[0]["n_matched"] > 0
