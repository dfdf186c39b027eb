"""Persist-handle registry.

Several operators ``persist()`` an intermediate frame that both sides of a
self-join consume (without it Spark recomputes the sketch/UDF subtree per
side — measured 2× cost). Spark only drops those blocks when the Python
object is garbage-collected, which in a long-running service is
cache-pressure debt. Operators therefore register every persist here and
callers release the handles once the job's outputs are materialized:

    from ai_data_matching_spark.cache import release_persisted
    result_df.write.parquet(...)       # materialize outputs first
    release_persisted()                # then drop operator caches

``release_persisted`` is idempotent and safe to call between jobs that
share a session; tests assert the storage registry is empty afterwards.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_PERSISTED: list[DataFrame] = []


def persist_tracked(df: DataFrame) -> DataFrame:
    """persist() a frame and register the handle for later release."""
    df.persist()
    _PERSISTED.append(df)
    return df


def release_persisted() -> int:
    """Unpersist every registered frame (blocking=False); returns count."""
    n = 0
    while _PERSISTED:
        df = _PERSISTED.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass  # session already stopped — nothing to release
    return n
