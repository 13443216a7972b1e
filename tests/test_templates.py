"""Contracts for template-skeleton detection (ops/templates.py): a
pure-Python skeleton recompute (independent regexp+md5), family-size
consistency, and both flag directions exercised.
"""

import hashlib
import re

import pyarrow.parquet as pq

from ocrs_spark.ops.templates import TEMPLATE_MIN_POP, template_skeletons

SF = "/root/testdata/sf0.001"


def _py_skeleton(doc_id, source, text):
    html = (
        "<html><head><title>t</title></head><body>"
        + "<div>" * (1 + len(source) % 3)
        + "<nav>"
        + "<a>x</a>" * (2 + doc_id % 2 + (doc_id + 7 if doc_id % 125 == 0 else 0))
        + f"</nav><main><p>{text}</p></main>"
        + "</div>" * (1 + len(source) % 3)
        + "<footer><span>f</span></footer></body></html>"
    )
    return hashlib.md5(re.sub(r">[^<]*<", "><", html).encode()).hexdigest()


def test_skeletons_match_python_recompute(spark):
    t = pq.read_table(
        f"{SF}/documents.parquet", columns=["doc_id", "source", "text"]
    )
    exp = {
        d: _py_skeleton(d, s, x)
        for d, s, x in zip(
            t["doc_id"].to_pylist(),
            t["source"].to_pylist(),
            t["text"].to_pylist(),
        )
    }
    fam: dict[str, int] = {}
    for sk in exp.values():
        fam[sk] = fam.get(sk, 0) + 1
    rows = template_skeletons(spark, SF).collect()
    assert len(rows) == len(exp)
    for r in rows:
        assert r["skeleton_md5"] == exp[r["doc_id"]]
        assert r["template_population"] == fam[r["skeleton_md5"]]
        assert r["is_template"] == (
            fam[r["skeleton_md5"]] >= TEMPLATE_MIN_POP
        )


def test_both_flag_directions_exist(spark):
    rows = template_skeletons(spark, SF).collect()
    flags = {r["is_template"] for r in rows}
    assert flags == {True, False}
    # the singletons are exactly the doc_id % 125 == 0 one-offs
    for r in rows:
        if not r["is_template"]:
            assert r["doc_id"] % 125 == 0
            assert r["template_population"] == 1
