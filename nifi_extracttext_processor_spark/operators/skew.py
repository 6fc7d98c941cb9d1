"""Skew-handling utilities for 100 TB joins.

AQE's skew-join splitting (enabled in session.get_spark) handles most
cases at runtime; `salted_join` is the explicit form for the worst
shape — a shuffle join against a modest-but-not-broadcastable table
where a handful of hot keys would otherwise pin single tasks: the big
side is salted deterministically, the small side replicated once per
salt, so each hot key fans out over `n_salts` tasks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__graft_salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str | list[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join with the big side's hot keys spread across n_salts tasks.

    Semantically identical to big.join(small, on, how) for inner/left
    joins. Cost: the small side is duplicated n_salts× (still far
    smaller than one straggler task scanning a hot key's entire
    partition). The salt is derived from xxhash64 of the whole row —
    deterministic, no RNG state."""
    keys = [on] if isinstance(on, str) else list(on)
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salted_big = big.withColumn(
        _SALT, F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]),
                      F.lit(n_salts)).cast("int"))
    salted_small = small.withColumn(
        _SALT, F.explode(F.array(*[F.lit(s) for s in range(n_salts)])))
    return (salted_big.join(salted_small, keys + [_SALT], how)
            .drop(_SALT))
