"""Resume/checkpoint tests: kill after a partial commit, re-run, assert
no duplicate work and an identical final table (SURVEY.md §5 test plan)."""

import pytest

from pyspark.sql import functions as F

from ocrs_spark.checkpoint import DocumentCheckpoint, run_checkpointed
from ocrs_spark.fixtures import corpus_to_spark, generate_corpus


@pytest.fixture(scope="module")
def frames(spark):
    docs, media, expected = corpus_to_spark(spark, generate_corpus(n_docs=20, seed=11))
    return docs.cache(), media.cache(), expected.cache()


def spans_as_tuples(df):
    rows = df.select("doc_id", "spans").collect()
    return {
        r["doc_id"]: [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r["spans"]]
        for r in rows
    }


def test_partial_commit_then_resume(spark, frames, tmp_path_factory):
    docs, media, expected = frames
    ckpt = DocumentCheckpoint(str(tmp_path_factory.mktemp("ckpt")))

    # "Killed" first run: only half the documents were processed and
    # committed before the crash.
    first_half = docs.filter(F.pmod(F.xxhash64("doc_id"), F.lit(2)) == 0)
    snap1 = run_checkpointed(first_half, media, ckpt)
    assert snap1 is not None and snap1["snapshot_id"] == 1
    n_first = ckpt.committed_doc_ids(spark).count()
    assert 0 < n_first < docs.count()

    # Restart over the FULL input: pruning must skip committed docs.
    snap2 = run_checkpointed(docs, media, ckpt)
    assert snap2 is not None and snap2["snapshot_id"] == 2
    assert snap2["metrics"]["docs"] <= docs.count() - n_first

    # Final table: every doc exactly once, spans equal to expected.
    result = ckpt.read_result(spark)
    assert result.count() == docs.count()
    assert result.groupBy("doc_id").count().filter("count > 1").count() == 0
    assert spans_as_tuples(result) == spans_as_tuples(expected)

    # Idempotent third run: nothing left to do, no new snapshot.
    assert run_checkpointed(docs, media, ckpt) is None
    assert len(ckpt.snapshots()) == 2

    # Time travel: as of snapshot 1 the table is exactly the first
    # committed batch.
    old = ckpt.read_result(spark, as_of_snapshot=1)
    assert old.count() == n_first
    assert spans_as_tuples(old).keys() < spans_as_tuples(result).keys()


def test_scheme_root_routes_through_hadoop_fs(spark, frames, tmp_path_factory):
    """A scheme-qualified checkpoint root (here file://, standing in for
    hdfs://s3a://) must route manifest/metrics I/O through the Hadoop
    FileSystem API and behave identically to a local root — on a real
    cluster this is what makes snapshots visible across drivers."""
    docs, media, expected = frames
    local = tmp_path_factory.mktemp("ckpt_fs")
    ckpt = DocumentCheckpoint(f"file://{local}/table", spark=spark)

    first_half = docs.filter(F.pmod(F.xxhash64("doc_id"), F.lit(2)) == 0)
    snap1 = run_checkpointed(first_half, media, ckpt)
    assert snap1 is not None and snap1["snapshot_id"] == 1
    snap2 = run_checkpointed(docs, media, ckpt)
    assert snap2 is not None and snap2["snapshot_id"] == 2
    assert run_checkpointed(docs, media, ckpt) is None

    result = ckpt.read_result(spark)
    assert result.count() == docs.count()
    assert spans_as_tuples(result) == spans_as_tuples(expected)
    # The manifest physically exists where the URI points.
    assert (local / "table" / "manifest.json").exists()


def test_commit_visibility_is_atomic(spark, frames, tmp_path_factory):
    docs, media, _ = frames
    ckpt = DocumentCheckpoint(str(tmp_path_factory.mktemp("ckpt2")))
    # Before any manifest flip: no committed docs even if data dirs exist.
    assert ckpt.committed_doc_ids(spark).count() == 0
    with pytest.raises(ValueError, match="no committed snapshots"):
        ckpt.read_result(spark)
