"""Contracts for bloom-filter data skipping (ops/bloomskip.py): no
false negatives ever, measured pruning beating min/max on scattered
keys, absent-probe rejection, and bounded mask-table size.
"""

from pyspark.sql import functions as F

from ocrs_spark.ops.bloomskip import (
    K_HASHES,
    N_WORDS,
    NFILES,
    bloom_file_skipping,
)

SF = "/root/testdata/sf0.01"


def test_no_false_negatives_and_pruning_beats_minmax(spark):
    out = {r["probe_key"]: r for r in bloom_file_skipping(spark, SF).collect()}
    present = [r for r in out.values() if r["present"]]
    absent = [r for r in out.values() if not r["present"]]
    assert len(present) == 3 and len(absent) == 3
    # a present key's file is never skipped
    assert all(r["bloom_files_touched"] >= 1 for r in present)
    # bloom never touches more files than the zone map admits globally
    assert all(r["bloom_files_touched"] <= NFILES for r in out.values())
    # the measured claim: for mid-domain probes minmax touches ALL
    # files while the bloom touches at most a small false-positive set
    mid = [r for r in out.values() if r["minmax_files_touched"] == NFILES]
    assert mid  # non-vacuous
    assert all(r["bloom_files_touched"] < NFILES // 2 for r in mid)
    # even probes are provably absent: rows_found == 0
    assert all(r["rows_found"] == 0 for r in absent)


def test_mask_table_is_bounded(spark):
    # rebuild the mask table the op builds and check its size bound
    from ocrs_spark.ops import load_tables
    from ocrs_spark.ops.bloomskip import _key_of, _pos_spark, WORD_BITS

    (docs,) = load_tables(spark, SF, "documents")
    n = docs.count()
    rows = docs.select(
        F.expr(_key_of("doc_id")).alias("k"),
        F.expr(f"CAST(doc_id * {NFILES} AS BIGINT) div {n}").alias("f"),
    )
    pos_arr = ", ".join(_pos_spark("k", j) for j in range(K_HASHES))
    masks = (
        rows.select("f", F.explode(F.expr(f"array({pos_arr})")).alias("pos"))
        .select("f", (F.col("pos") / WORD_BITS).cast("long").alias("word"))
        .distinct()
    )
    assert masks.count() <= NFILES * N_WORDS
