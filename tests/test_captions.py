"""Handcrafted-fixture contracts for caption mining + alignment ranking
(ops/captions.py): nearest-text selection on each side, tie-to-following,
edge images with one or zero text neighbors, storage-order independence,
and the salted two-phase top-k matching the single-window answer.
"""

from pyspark.sql import Row, Window
from pyspark.sql import functions as F

from ocrs_spark.ops.captions import TOP_K, alignment_topk, mine_caption_pairs


def _doc(doc_id, spans):
    return Row(
        doc_id=doc_id,
        spans=[
            Row(kind=k, text=t, media_ref=m, offset=o) for (k, t, m, o) in spans
        ],
    )


def _docs(spark, rows):
    return spark.createDataFrame(
        rows,
        "doc_id bigint, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>",
    )


def test_mine_semantics(spark):
    docs = _docs(
        spark,
        [
            # text img text: tie -> following text
            _doc(1, [("text", "A", None, 0), ("image", None, "m1", 1), ("text", "B", None, 2)]),
            # image-first: only following text exists
            _doc(2, [("image", None, "m2", 0), ("text", "C", None, 1)]),
            # trailing image: only preceding text exists
            _doc(3, [("text", "D", None, 0), ("image", None, "m3", 1)]),
            # closer preceding text wins over farther following text
            _doc(
                4,
                [
                    ("text", "E", None, 4),
                    ("image", None, "m4", 5),
                    ("text", "F", None, 9),
                ],
            ),
            # two adjacent images share the surrounding texts
            _doc(
                5,
                [
                    ("text", "G", None, 0),
                    ("image", None, "m5a", 1),
                    ("image", None, "m5b", 2),
                    ("text", "H", None, 3),
                ],
            ),
            # no text at all: the image row is dropped
            _doc(6, [("image", None, "m6", 0)]),
            # text-only doc: contributes nothing
            _doc(7, [("text", "I", None, 0)]),
        ],
    )
    got = {
        r["media_ref"]: (r["cap_before"], r["cap_after"], r["caption"])
        for r in mine_caption_pairs(docs).collect()
    }
    assert got == {
        "m1": ("A", "B", "B"),
        "m2": (None, "C", "C"),
        "m3": ("D", None, "D"),
        "m4": ("E", "F", "E"),
        "m5a": ("G", "H", "G"),  # before at dist 1 beats after at dist 2
        "m5b": ("G", "H", "H"),  # after at dist 1 beats before at dist 2
    }
    assert "m6" not in got


def test_mine_ignores_storage_order(spark):
    spans = [
        ("text", "A", None, 0),
        ("image", None, "x", 1),
        ("text", "B", None, 2),
    ]
    fwd = mine_caption_pairs(_docs(spark, [_doc(1, spans)])).collect()
    rev = mine_caption_pairs(_docs(spark, [_doc(1, spans[::-1])])).collect()
    assert [tuple(r) for r in fwd] == [tuple(r) for r in rev]


def _skewed_pairs(spark, n=97):
    # one viral image with n candidate captions, one image with fewer than K
    rows = [Row(doc_id=i, media_ref="img-0") for i in range(n)]
    rows += [Row(doc_id=i, media_ref="img-1") for i in range(3)]
    return spark.createDataFrame(rows)


def _emb(spark, n=13, dim=4):
    # deterministic non-isotropic embeddings so cosines are distinct-ish
    rows = [
        Row(vec_id=i, embedding=[float((i * 7 + j * 3) % 11 + 1) for j in range(dim)])
        for i in range(n)
    ]
    return spark.createDataFrame(rows).select(
        "vec_id", F.col("embedding").cast("array<float>").alias("embedding")
    )


def test_salted_topk_matches_single_window(spark):
    pairs, emb = _skewed_pairs(spark), _emb(spark)
    got = alignment_topk(pairs, emb, k=TOP_K)

    # naive single-window reference on the same scored rows
    n = emb.count()
    img_id = F.when(F.col("media_ref") == "img-blank", F.lit(5)).otherwise(
        F.substring("media_ref", 5, 10).cast("int")
    )
    ec = emb.select(F.col("vec_id").alias("cap_vec"), F.col("embedding").alias("ec"))
    ei = emb.select(F.col("vec_id").alias("img_vec"), F.col("embedding").alias("ei"))
    dot = (
        "aggregate(zip_with(ec, ei, (x, y) -> cast(x AS double) * cast(y AS double)),"
        " cast(0 AS double), (acc, v) -> acc + v)"
    )
    na = "sqrt(aggregate(ec, cast(0 AS double), (acc, x) -> acc + cast(x AS double) * cast(x AS double)))"
    nb = "sqrt(aggregate(ei, cast(0 AS double), (acc, x) -> acc + cast(x AS double) * cast(x AS double)))"
    scored = (
        pairs.select(
            "doc_id",
            "media_ref",
            (F.col("doc_id") % n).alias("cap_vec"),
            img_id.cast("bigint").alias("img_vec"),
        )
        .join(ec, "cap_vec")
        .join(ei, "img_vec")
        .withColumn("align_cos", F.round(F.expr(f"({dot}) / (({na}) * ({nb}))"), 3))
    )
    w = Window.partitionBy("media_ref").orderBy(
        F.col("align_cos").desc(), F.col("doc_id").asc()
    )
    want = (
        scored.withColumn("cap_rank", F.row_number().over(w))
        .filter(F.col("cap_rank") <= TOP_K)
        .select("media_ref", "cap_rank", "doc_id", "align_cos")
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    # the under-K image keeps all of its rows
    assert got.filter(F.col("media_ref") == "img-1").count() == 3


def test_topk_plan_shape(spark):
    pairs, emb = _skewed_pairs(spark), _emb(spark)
    plan = alignment_topk(pairs, emb)._jdf.queryExecution().executedPlan().toString()
    # no unbounded cartesian: the only nested-loop node allowed is the
    # broadcast of the one-row |embeddings| count
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1
    # two windows (partial salted + final) — the skew-bounding phase exists
    assert plan.count("Window") >= 2
