"""Driver-checkable rows for the Structured Streaming operators.

``stream_sessionize_closed`` actually RUNS the stateful
``applyInPandasWithState`` sessionizer (ocrs_spark.streaming, the
streaming counterpart of the reference's batch orchestration — see
SURVEY.md §2.6) as an availableNow stream over the events table, then
exposes the emitted closed sessions as a plain DataFrame. Its oracle is
the batch sessionization restricted to closed sessions (every session
except each user's trailing one, which stays open in streaming state),
so the driver's value-hash compare covers the custom stateful operator
end-to-end instead of pytest-only.
"""

from __future__ import annotations

from .relational import SESSIONS_CTE

# (applicationId, sf_dir) -> memory-sink table name of a completed run.
_DONE: dict = {}


def stream_sessionize_closed(spark, sf_dir):
    """Closed sessions emitted by the streaming sessionizer
    (user_id, session_start, session_end, n_events, sum_value)."""
    import tempfile
    import uuid

    from ocrs_spark.streaming import stream_sessionize_events

    key = (spark.sparkContext.applicationId, sf_dir)
    name = _DONE.get(key)
    if name is None:
        name = "closed_sessions_" + uuid.uuid4().hex[:8]
        base = tempfile.mkdtemp(prefix="ocrs_stream_sess_")
        # The file stream source requires a directory; stage the table.
        events_dir = f"{base}/events"
        spark.read.parquet(f"{sf_dir}/events.parquet").write.parquet(events_dir)
        stream_sessionize_events(spark, events_dir, f"{base}/ckpt", name)
        _DONE[key] = name
    return spark.table(name)


ORACLE_STREAM_SESSIONIZE = f"""
WITH {SESSIONS_CTE}
SELECT user_id, session_start, session_end, n_events, sum_value
FROM (
  SELECT *, max(session_idx) OVER (PARTITION BY user_id) AS last_idx
  FROM session_aggs
)
WHERE session_idx < last_idx
"""


QUERIES = {
    "stream_sessionize_closed": stream_sessionize_closed,
}

ORACLES = {
    "stream_sessionize_closed": ORACLE_STREAM_SESSIONIZE,
}
