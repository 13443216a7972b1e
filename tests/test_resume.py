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
    # The versioned manifests physically exist where the URI points.
    assert (local / "table" / "manifest-1.json").exists()
    assert (local / "table" / "manifest-2.json").exists()


def test_commit_visibility_is_atomic(spark, frames, tmp_path_factory):
    docs, media, _ = frames
    ckpt = DocumentCheckpoint(str(tmp_path_factory.mktemp("ckpt2")))
    # Before any manifest flip: no committed docs even if data dirs exist.
    assert ckpt.committed_doc_ids(spark).count() == 0
    with pytest.raises(ValueError, match="no committed snapshots"):
        ckpt.read_result(spark)


def test_concurrent_commit_race_drops_no_snapshot(spark, frames, tmp_path_factory):
    """Two committers racing for the same manifest version: the loser must
    detect the collision via the exclusive-create CAS, rebase on the
    winner's manifest, and retry — both snapshots end up visible, the live
    manifest is never deleted at any point."""
    import json

    docs, media, _ = frames
    root = tmp_path_factory.mktemp("ckpt_race")
    ckpt_a = DocumentCheckpoint(str(root))
    ckpt_b = DocumentCheckpoint(str(root))

    half_a = docs.filter(F.pmod(F.xxhash64("doc_id"), F.lit(2)) == 0)
    half_b = docs.filter(F.pmod(F.xxhash64("doc_id"), F.lit(2)) == 1)
    snap1 = run_checkpointed(half_a, media, ckpt_a)

    # Simulate the race: B publishes manifest-2 between A's manifest read
    # and A's publish attempt, by pre-creating the version A wants. The
    # stolen snapshot re-points at run 1's data so the table stays readable.
    fs = ckpt_a._fs(spark)
    _, snaps = ckpt_a._current_manifest(fs)
    stolen = {
        "snapshot_id": 2,
        "run_id": snap1["run_id"],
        "committed_at": 0.0,
        "metrics": {},
    }
    assert ckpt_b._publish_manifest(fs, 2, snaps + [stolen], "raced0000000")
    # A's next commit must lose version 2, rebase, and win version 3.
    snap = run_checkpointed(half_b, media, ckpt_a)
    assert snap is not None and snap["snapshot_id"] == 3
    assert [s["snapshot_id"] for s in ckpt_a.snapshots()] == [1, 2, 3]
    # No intermediate state ever had zero manifests on disk.
    names = {p.name for p in root.iterdir()}
    assert {"manifest-1.json", "manifest-2.json", "manifest-3.json"} <= names
    # Losing tmp files are cleaned up.
    assert not [n for n in names if n.endswith(".tmp")]
    # Readers take the highest version.
    top = json.loads((root / "manifest-3.json").read_text())
    assert len(top["snapshots"]) == 3


def test_legacy_single_manifest_reads_as_version_zero(spark, frames, tmp_path_factory):
    """A pre-versioning table (bare manifest.json) stays readable, and the
    first new commit publishes manifest-1 on top of it."""
    import json

    docs, media, _ = frames
    root = tmp_path_factory.mktemp("ckpt_legacy")
    ckpt = DocumentCheckpoint(str(root))
    half = docs.filter(F.pmod(F.xxhash64("doc_id"), F.lit(2)) == 0)
    snap1 = run_checkpointed(half, media, ckpt)
    # Rewrite the table into the legacy layout: single manifest.json.
    (root / "manifest.json").write_text(
        (root / "manifest-1.json").read_text()
    )
    (root / "manifest-1.json").unlink()
    assert [s["snapshot_id"] for s in ckpt.snapshots()] == [1]
    snap2 = run_checkpointed(docs, media, ckpt)
    assert snap2 is not None and snap2["snapshot_id"] == 2
    assert (root / "manifest-1.json").exists()
    assert ckpt.read_result(spark).count() == docs.count()


def test_compaction_preserves_table_and_resume(spark, frames, tmp_path_factory):
    """compact() rewrites N committed runs into one snapshot: the table
    contents and resume pruning are unchanged, superseded run dirs are
    removed, and the manifest history is replaced by a single visible
    snapshot (rewrite_data_files + expire_snapshots semantics)."""
    docs, media, expected = frames
    root = tmp_path_factory.mktemp("ckpt_compact")
    ckpt = DocumentCheckpoint(str(root))
    run_checkpointed(docs.filter(F.pmod(F.xxhash64("doc_id"), F.lit(2)) == 0), media, ckpt)
    run_checkpointed(docs, media, ckpt)
    before = spans_as_tuples(ckpt.read_result(spark))
    assert len(ckpt.snapshots()) == 2
    assert len(list((root / "data").iterdir())) == 2

    snap = ckpt.compact(spark)
    assert snap["metrics"]["compacted_runs"] == 2
    assert [s["run_id"] for s in ckpt.snapshots()] == [snap["run_id"]]
    assert len(list((root / "data").iterdir())) == 1
    assert len(list((root / "ledger").iterdir())) == 1
    assert spans_as_tuples(ckpt.read_result(spark)) == before
    # Resume over the compacted table: nothing left to do.
    assert run_checkpointed(docs, media, ckpt) is None
    # Idempotent on a single-snapshot table.
    assert ckpt.compact(spark)["run_id"] == snap["run_id"]
