"""Contracts for the cross-source contamination matrix
(ops/mirrors.py): a pure-Python recompute, the within-source
invariance property (repeating a passage INSIDE one source must not
change any pair count), and planted-mirror detection.
"""

import hashlib

import pyarrow.parquet as pq
import pyspark.sql.functions as F

from ocrs_spark.ops.mirrors import source_overlap_matrix
from ocrs_spark.ops.passagededup import SEG

SF = "/root/testdata/sf0.001"


def _py_source_passages():
    t = pq.read_table(f"{SF}/documents.parquet", columns=["source", "text"])
    out: dict[str, set] = {}
    for src, txt in zip(t["source"].to_pylist(), t["text"].to_pylist()):
        toks = txt.strip().split()
        for j in range(0, len(toks), SEG):
            seg = " ".join(toks[j : j + SEG])
            out.setdefault(src, set()).add(
                hashlib.md5(seg.encode()).hexdigest()
            )
    return out

def test_matrix_matches_python_recompute(spark):
    inv = _py_source_passages()
    rows = source_overlap_matrix(spark, SF).collect()
    exp = {}
    srcs = sorted(inv)
    for i, a in enumerate(srcs):
        for b in srcs[i + 1 :]:
            shared = len(inv[a] & inv[b])
            if shared:
                exp[(a, b)] = shared
    assert len(rows) == len(exp)
    for r in rows:
        key = (r["source_a"], r["source_b"])
        assert r["shared_passages"] == exp[key]
        assert r["a_passages"] == len(inv[key[0]])
        assert r["b_passages"] == len(inv[key[1]])
        small = min(len(inv[key[0]]), len(inv[key[1]]))
        assert r["overlap_milli"] == (1000 * r["shared_passages"]) // small


def test_planted_mirror_dominates(spark, tmp_path):
    # Two sources sharing most text must surface with high overlap;
    # a third disjoint source must not pair with them.
    rows = []
    for i in range(6):
        body = f"alpha beta gamma delta epsilon zeta eta theta block{i} "
        rows.append((100 + i, "mirror_a", body * 4))
        rows.append((200 + i, "mirror_b", body * 4))
        rows.append((300 + i, "clean", f"unique{i} " * 40))
    sf = str(tmp_path / "m")
    (
        spark.createDataFrame(rows, "doc_id long, source string, text string")
        .withColumn("lang", F.lit("en"))
        .withColumn("n_chars", F.length("text"))
        .write.mode("overwrite")
        .parquet(f"{sf}/documents.parquet")
    )
    got = {
        (r["source_a"], r["source_b"]): r
        for r in source_overlap_matrix(spark, sf).collect()
    }
    assert ("mirror_a", "mirror_b") in got
    assert got[("mirror_a", "mirror_b")]["overlap_milli"] >= 900
    assert not any("clean" in k for k in got)
