"""Contracts for extraction-quality metrics (ops/ocreval.py): CER
hand-math, micro-vs-macro weighting, empty-reference handling, and the
real pipeline scoring CER == 0 against its golden media texts.
"""

from pyspark.sql import Row
from pyspark.sql import functions as F

from ocrs_spark.flagship import MEDIA_TEXT, flagship_ocr
from ocrs_spark.ops.ocreval import error_rates


def _pairs(spark, rows):
    return spark.createDataFrame([Row(hyp=h, ref=r) for h, r in rows])


def test_cer_hand_math(spark):
    # dists: 0, 1 (sub), 2 (two inserts); rlens: 4, 4, 2
    out = error_rates(
        _pairs(spark, [("abcd", "abcd"), ("abcx", "abcd"), ("xxab", "ab")])
    ).collect()[0]
    assert out["n_docs"] == 3
    assert out["exact_share"] == round(1 / 3, 4)
    assert out["cer_micro"] == 0.3  # (0+1+2)/(4+4+2)
    assert out["cer_macro"] == round((0 + 0.25 + 1.0) / 3, 6)


def test_micro_weights_by_length_macro_does_not(spark):
    # long perfect doc + short wrong doc: micro small, macro large
    out = error_rates(
        _pairs(spark, [("a" * 99, "a" * 99), ("x", "y")])
    ).collect()[0]
    assert out["cer_micro"] == 0.01
    assert out["cer_macro"] == 0.5


def test_empty_reference_excluded_from_macro(spark):
    out = error_rates(_pairs(spark, [("x", ""), ("ab", "ab")])).collect()[0]
    # macro averages only the rlen>0 pair; micro counts the insertion
    assert out["cer_macro"] == 0.0
    assert out["cer_micro"] == 0.5  # 1 edit / 2 ref chars


def test_real_pipeline_scores_zero_cer(spark):
    woven = flagship_ocr(spark, "/root/testdata/sf0.001")
    golden = spark.createDataFrame(
        [Row(media_ref=k, ref=v) for k, v in MEDIA_TEXT.items()]
    )
    pairs = (
        woven.select(F.explode("spans").alias("s"))
        .filter(F.col("s.kind") == "image")
        .select(F.col("s.media_ref").alias("media_ref"), F.col("s.text").alias("hyp"))
        .join(golden, "media_ref")
        .select("hyp", "ref")
    )
    out = error_rates(pairs).collect()[0]
    assert out["exact_share"] == 1.0
    assert out["cer_micro"] == 0.0
