"""Checkpointed, resumable OCR runs (SURVEY.md §2.6: resume/lineage).

Iceberg-style snapshot semantics on plain parquet (no Iceberg runtime
jar in this sandbox; the layout mirrors Iceberg's table/snapshot/manifest
split so swapping in real Iceberg is a sink change, not a redesign):

    <root>/
      data/<run_id>/part-*.parquet      committed result spans per run
      ledger/<run_id>/part-*.parquet    committed doc_ids per run (lineage)
      metrics/<run_id>.json             per-run extraction metrics
      manifest-<n>.json                 ordered snapshot list, version n
                                        (readers take the highest n; a run
                                        is visible iff its snapshot entry
                                        is in the current manifest)

Resume = LEFT ANTI JOIN of incoming documents against the committed
ledger, so a killed run restarts from the last committed snapshot and
never re-processes or duplicates a document.

The checkpoint root may be any Hadoop-supported URI (``hdfs://``,
``s3a://``, ``file://``, ...): the parquet data/ledger writes always go
through Spark, and the manifest/metrics I/O is routed through the
Hadoop FileSystem API whenever the root carries a scheme, so a cluster
of drivers sees one shared manifest (a bare local path keeps plain
POSIX I/O).

Commit visibility is a versioned-manifest compare-and-swap (the Iceberg
HadoopTableOperations pattern): a committer reads the current highest
``manifest-<n>.json``, writes the successor list to a uniquely-named
temp file, and publishes it as ``manifest-<n+1>.json`` via an
exclusive-create primitive (``os.link`` on POSIX, no-overwrite rename
on HDFS) that FAILS if the version already exists. The live manifest is
never deleted or overwritten, so a crash at any point leaves the table
readable at the previous snapshot, and two concurrent committers racing
for the same version — one wins, the loser re-reads and retries on the
next version number, so no snapshot is silently dropped. On S3A rename
is copy+delete and create is not exclusive, so with concurrent
committers prefer an HDFS/ABFS root (or an Iceberg catalog); a
single-writer S3 pipeline is still safe. A legacy ``manifest.json``
(pre-versioning layout) is read as the version-0 baseline.
"""

from __future__ import annotations

import json
import os
import re
import time
import uuid

from pyspark.sql import DataFrame, SparkSession

from .pipeline import (
    explode_spans,
    extraction_metrics,
    ocr_image_spans,
    reweave,
)

MANIFEST = "manifest.json"  # legacy single-file layout, read as version 0
_MANIFEST_RE = re.compile(r"^manifest-(\d+)\.json$")


def _manifest_name(version: int) -> str:
    return f"manifest-{version}.json"


class _PosixIO:
    """Manifest/metrics I/O for bare local paths."""

    def mkdirs(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def read_text(self, path: str) -> str:
        with open(path) as f:
            return f.read()

    def write_text(self, path: str, text: str) -> None:
        with open(path, "w") as f:
            f.write(text)

    def list_names(self, path: str) -> list[str]:
        try:
            return os.listdir(path)
        except FileNotFoundError:
            return []

    def delete(self, path: str) -> None:
        try:
            os.remove(path)
        except FileNotFoundError:
            pass

    def delete_dir(self, path: str) -> None:
        import shutil

        shutil.rmtree(path, ignore_errors=True)

    def publish_exclusive(self, src: str, dst: str) -> bool:
        """Atomically publish src as dst iff dst does not exist.

        ``os.link`` is an atomic create-if-absent on POSIX — two racing
        committers cannot both succeed, and dst appears fully written.
        """
        try:
            os.link(src, dst)
        except FileExistsError:
            return False
        os.unlink(src)
        return True


class _HadoopIO:
    """Manifest/metrics I/O through the JVM Hadoop FileSystem, so
    scheme-qualified roots (hdfs://, s3a://, file://, ...) resolve to
    the shared filesystem every driver sees — not a mangled local path
    on whichever machine happens to run the driver."""

    def __init__(self, spark: SparkSession, root: str):
        self._jvm = spark._jvm
        conf = spark._jsc.hadoopConfiguration()
        self._fs = self._jvm.org.apache.hadoop.fs.Path(root).getFileSystem(conf)

    def _p(self, path: str):
        return self._jvm.org.apache.hadoop.fs.Path(path)

    def mkdirs(self, path: str) -> None:
        self._fs.mkdirs(self._p(path))

    def exists(self, path: str) -> bool:
        return bool(self._fs.exists(self._p(path)))

    def read_text(self, path: str) -> str:
        stream = self._fs.open(self._p(path))
        try:
            out = self._jvm.java.io.ByteArrayOutputStream()
            self._jvm.org.apache.hadoop.io.IOUtils.copyBytes(stream, out, 4096, False)
            return bytes(out.toByteArray()).decode("utf-8")
        finally:
            stream.close()

    def write_text(self, path: str, text: str) -> None:
        stream = self._fs.create(self._p(path), True)
        try:
            stream.write(bytearray(text.encode("utf-8")))
        finally:
            stream.close()

    def list_names(self, path: str) -> list[str]:
        if not self.exists(path):
            return []
        return [
            str(st.getPath().getName())
            for st in self._fs.listStatus(self._p(path))
        ]

    def delete(self, path: str) -> None:
        self._fs.delete(self._p(path), False)

    def delete_dir(self, path: str) -> None:
        self._fs.delete(self._p(path), True)

    def publish_exclusive(self, src: str, dst: str) -> bool:
        """Publish src as dst iff dst does not exist.

        HDFS ``rename`` (FileSystem API, no OVERWRITE option) returns
        false when dst exists — the atomic no-clobber primitive Iceberg's
        HadoopTableOperations builds its version commit on. The live
        manifest is never deleted, so readers always see a manifest.
        """
        if self._fs.exists(self._p(dst)):
            return False
        return bool(self._fs.rename(self._p(src), self._p(dst)))


def _has_scheme(root: str) -> bool:
    return "://" in root or root.startswith("file:/")


class DocumentCheckpoint:
    def __init__(self, root: str, spark: SparkSession | None = None):
        self.root = root.rstrip("/")
        self._spark = spark
        self._io = None
        if not _has_scheme(self.root):
            self._io = _PosixIO()
            self._io.mkdirs(self.root)

    def _fs(self, spark: SparkSession | None = None):
        if self._io is None:
            s = spark or self._spark or SparkSession.getActiveSession()
            if s is None:
                raise ValueError(
                    f"checkpoint root {self.root!r} needs a SparkSession for "
                    "Hadoop FileSystem access; pass spark= to DocumentCheckpoint"
                )
            self._io = _HadoopIO(s, self.root)
            self._io.mkdirs(self.root)
        return self._io

    def _join(self, *parts: str) -> str:
        return "/".join((self.root, *parts))

    # ------------------------------------------------------------- state

    def _current_manifest(self, fs) -> tuple[int, list[dict]]:
        """(version, snapshots) of the highest manifest-<n>.json; a legacy
        manifest.json (pre-versioning layout) reads as version 0."""
        versions = sorted(
            int(m.group(1))
            for name in fs.list_names(self.root)
            if (m := _MANIFEST_RE.match(name))
        )
        if versions:
            v = versions[-1]
            text = fs.read_text(self._join(_manifest_name(v)))
            return v, json.loads(text)["snapshots"]
        legacy = self._join(MANIFEST)
        if fs.exists(legacy):
            return 0, json.loads(fs.read_text(legacy))["snapshots"]
        return 0, []

    def snapshots(self, spark: SparkSession | None = None) -> list[dict]:
        _, snaps = self._current_manifest(self._fs(spark))
        return snaps

    def _publish_manifest(
        self, fs, version: int, snapshots: list[dict], run_id: str
    ) -> bool:
        """CAS-publish manifest version ``version``; False = lost the race."""
        tmp = self._join(f".{_manifest_name(version)}.{run_id}.tmp")
        fs.write_text(tmp, json.dumps({"snapshots": snapshots}, indent=2))
        if fs.publish_exclusive(tmp, self._join(_manifest_name(version))):
            return True
        fs.delete(tmp)
        return False

    # ------------------------------------------------------------ reads

    def committed_doc_ids(self, spark: SparkSession) -> DataFrame:
        paths = [self._join("ledger", s["run_id"]) for s in self.snapshots(spark)]
        if not paths:
            return spark.createDataFrame([], schema="doc_id string")
        return spark.read.parquet(*paths).select("doc_id").distinct()

    def read_result(
        self, spark: SparkSession, as_of_snapshot: int | None = None
    ) -> DataFrame:
        """The committed table; ``as_of_snapshot`` time-travels to the
        state as of that snapshot id (manifest order is commit order,
        so a prefix of the snapshot list IS the historical table —
        Iceberg's snapshot-id read, on the same layout)."""
        snaps = self.snapshots(spark)
        if as_of_snapshot is not None:
            snaps = [s for s in snaps if s["snapshot_id"] <= as_of_snapshot]
        paths = [self._join("data", s["run_id"]) for s in snaps]
        if not paths:
            raise ValueError("no committed snapshots")
        return spark.read.parquet(*paths)

    def prune(self, documents: DataFrame) -> DataFrame:
        """Drop documents already committed (anti-join resume pruning)."""
        done = self.committed_doc_ids(documents.sparkSession)
        return documents.join(done, "doc_id", "left_anti")

    # ----------------------------------------------------------- commits

    def commit(self, result: DataFrame, metrics: dict | None = None) -> dict:
        """Write a result batch + ledger, then flip the manifest.

        Data and ledger land under a fresh run_id directory first; the
        snapshot only becomes visible when the manifest rename succeeds,
        so a kill mid-commit leaves the table at the previous snapshot.
        """
        spark = result.sparkSession
        fs = self._fs(spark)
        run_id = uuid.uuid4().hex[:12]
        data_path = self._join("data", run_id)
        ledger_path = self._join("ledger", run_id)
        result.write.parquet(data_path)
        spark.read.parquet(data_path).select("doc_id").distinct().write.parquet(
            ledger_path
        )
        if metrics is not None:
            fs.mkdirs(self._join("metrics"))
            fs.write_text(self._join("metrics", f"{run_id}.json"), json.dumps(metrics))
        for _ in range(32):
            version, snapshots = self._current_manifest(fs)
            snapshot = {
                "snapshot_id": len(snapshots) + 1,
                "run_id": run_id,
                "committed_at": time.time(),
                "metrics": metrics or {},
            }
            # Exclusive-create on the successor version: if a concurrent
            # committer published manifest-<version+1> first, re-read and
            # rebase this snapshot on theirs — no snapshot is dropped.
            if self._publish_manifest(fs, version + 1, snapshots + [snapshot], run_id):
                return snapshot
        raise IOError(
            f"checkpoint commit lost {32} consecutive manifest races at {self.root}"
        )


    # ------------------------------------------------------- maintenance

    def compact(self, spark: SparkSession) -> dict:
        """Rewrite the committed table into ONE data/ledger run and
        publish a single-snapshot manifest (the Iceberg
        rewrite_data_files + expire_snapshots maintenance pair): at
        corpus scale an append-per-run table accretes many small runs,
        and both read_result (one scan per run) and resume pruning (one
        ledger scan per run) degrade. Readers are never disrupted — the
        rewrite lands under a fresh run_id first and becomes visible
        via the same CAS manifest publish as commit(); a concurrent
        commit that wins the version race simply makes this compaction
        retry on top of the newly committed state. The superseded run
        directories are removed only after the new manifest is live
        (crash in between leaks directories but never loses data)."""
        fs = self._fs(spark)
        for _ in range(8):
            version, snapshots = self._current_manifest(fs)
            if len(snapshots) <= 1:
                return snapshots[0] if snapshots else {}
            old_runs = [s["run_id"] for s in snapshots]
            run_id = uuid.uuid4().hex[:12]
            data_path = self._join("data", run_id)
            ledger_path = self._join("ledger", run_id)
            self.read_result(spark).write.parquet(data_path)
            spark.read.parquet(data_path).select(
                "doc_id"
            ).distinct().write.parquet(ledger_path)
            snapshot = {
                "snapshot_id": len(snapshots) + 1,
                "run_id": run_id,
                "committed_at": time.time(),
                "metrics": {"compacted_runs": len(old_runs)},
            }
            if self._publish_manifest(fs, version + 1, [snapshot], run_id):
                for rid in old_runs:
                    fs.delete_dir(self._join("data", rid))
                    fs.delete_dir(self._join("ledger", rid))
                return snapshot
            # Lost the race to a concurrent commit: drop our rewrite and
            # retry over the new state.
            fs.delete_dir(data_path)
            fs.delete_dir(ledger_path)
        raise IOError(f"compaction lost 8 consecutive manifest races at {self.root}")


def run_checkpointed(
    documents: DataFrame,
    media: DataFrame,
    checkpoint: DocumentCheckpoint,
    engine_conf: dict | None = None,
    partitions: int | None = None,
) -> dict | None:
    """One resumable pipeline run: prune committed docs, OCR + reweave
    the remainder, commit as a new snapshot. Returns the snapshot dict,
    or None if there was nothing left to do."""
    engine_conf = engine_conf or {"kind": "fake"}
    todo = checkpoint.prune(documents)
    if todo.isEmpty():
        return None
    spans = explode_spans(todo)
    # Cache the OCR results: both the committed reweave and the metrics
    # aggregate consume them, and re-running model inference is the
    # dominant cost.
    results = ocr_image_spans(spans, media, engine_conf, partitions=partitions).cache()
    try:
        woven = reweave(spans, results)
        metrics_row = extraction_metrics(results).collect()[0]
        return checkpoint.commit(woven, metrics=metrics_row.asDict())
    finally:
        results.unpersist()
