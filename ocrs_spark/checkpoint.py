"""Checkpointed, resumable OCR runs (SURVEY.md §2.6: resume/lineage).

Iceberg-style snapshot semantics on plain parquet (no Iceberg runtime
jar in this sandbox; the layout mirrors Iceberg's table/snapshot/manifest
split so swapping in real Iceberg is a sink change, not a redesign):

    <root>/
      data/<run_id>/part-*.parquet      committed result spans per run
      ledger/<run_id>/part-*.parquet    committed doc_ids per run (lineage)
      metrics/<run_id>.json             per-run extraction metrics
      manifest.json                     ordered snapshot list (atomic
                                        rename; a run is visible iff its
                                        snapshot entry is in the manifest)

Resume = LEFT ANTI JOIN of incoming documents against the committed
ledger, so a killed run restarts from the last committed snapshot and
never re-processes or duplicates a document.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession

from .pipeline import (
    explode_spans,
    extraction_metrics,
    ocr_image_spans,
    reweave,
)

MANIFEST = "manifest.json"


class DocumentCheckpoint:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    # ------------------------------------------------------------- state

    def _manifest_path(self) -> str:
        return os.path.join(self.root, MANIFEST)

    def snapshots(self) -> list[dict]:
        path = self._manifest_path()
        if not os.path.exists(path):
            return []
        with open(path) as f:
            return json.load(f)["snapshots"]

    def _write_manifest(self, snapshots: list[dict]) -> None:
        tmp = self._manifest_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"snapshots": snapshots}, f, indent=2)
        os.replace(tmp, self._manifest_path())  # atomic visibility flip

    # ------------------------------------------------------------ reads

    def committed_doc_ids(self, spark: SparkSession) -> DataFrame:
        paths = [
            os.path.join(self.root, "ledger", s["run_id"]) for s in self.snapshots()
        ]
        if not paths:
            return spark.createDataFrame([], schema="doc_id string")
        return spark.read.parquet(*paths).select("doc_id").distinct()

    def read_result(self, spark: SparkSession) -> DataFrame:
        paths = [os.path.join(self.root, "data", s["run_id"]) for s in self.snapshots()]
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
        run_id = uuid.uuid4().hex[:12]
        data_path = os.path.join(self.root, "data", run_id)
        ledger_path = os.path.join(self.root, "ledger", run_id)
        result.write.parquet(data_path)
        result.sparkSession.read.parquet(data_path).select("doc_id").distinct().write.parquet(
            ledger_path
        )
        if metrics is not None:
            os.makedirs(os.path.join(self.root, "metrics"), exist_ok=True)
            with open(os.path.join(self.root, "metrics", f"{run_id}.json"), "w") as f:
                json.dump(metrics, f)
        snapshots = self.snapshots()
        snapshot = {
            "snapshot_id": len(snapshots) + 1,
            "run_id": run_id,
            "committed_at": time.time(),
            "metrics": metrics or {},
        }
        self._write_manifest(snapshots + [snapshot])
        return snapshot


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
