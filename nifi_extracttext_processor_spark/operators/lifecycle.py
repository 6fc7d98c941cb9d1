"""Persist/cache lifecycle tracking for long-running sessions.

Operators that persist intermediates (e.g. minhash_lsh_pairs' shingle
table) register them here instead of leaking them into the block
manager. A long-running 100 TB session calls release_all() between
jobs; short jobs can ignore it (session teardown frees everything).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_LIVE: list[DataFrame] = []


def track_persist(df: DataFrame, storage_level=None) -> DataFrame:
    """Persist `df` and register it for later release."""
    if storage_level is not None:
        df.persist(storage_level)
    else:
        df.persist()
    _LIVE.append(df)
    return df


def live_count() -> int:
    return len(_LIVE)


def release_all(blocking: bool = False) -> int:
    """Unpersist every tracked DataFrame; returns how many were freed."""
    n = 0
    while _LIVE:
        df = _LIVE.pop()
        try:
            df.unpersist(blocking)
            n += 1
        except Exception:
            pass  # session already stopped — nothing to free
    return n
