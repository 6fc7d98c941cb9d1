"""Deterministic weighted sampling without replacement (Efraimidis &
Spirakis 2006) — "take the best-looking 1M docs, biased by quality
weight, reproducibly". The corpus-curation complement to
corpus.sample_by_hash (uniform, rate-based): here inclusion
probability is proportional to a per-row WEIGHT (a quality score,
token count, dsir log-weight turned positive), and the draw is a
fixed-size top-k, not a rate.

Construction: each row gets key = ln(u) / w with u a deterministic
md5/xxhash uniform in (0,1) from (id, seed); the k rows with the
LARGEST key are the sample. This is exactly the Efraimidis-Spirakis
reservoir order (u^(1/w) maximization, log-transformed so huge
weights can't overflow), so the result is a true weighted sample
without replacement — and a pure function of (ids, weights, seed):
reruns, other clusters, and the DuckDB twin pick the SAME rows.

Scale shape: one narrow projection computes keys; the global cut is
TakeOrderedAndProject (per-partition top-k, k-sized driver merge —
no global sort, no single-task funnel); the grouped variant is one
keyed window over (group, key) — shuffle carries rows once, bounded
per group. Rows with NULL or non-positive weight are EXCLUDED by
contract (E-S is undefined there; a zero-weight row must never
appear).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_U32_DENOM = float(1 << 32)


def _es_key(id_col: str, weight_col: str, seed: int, md5: bool):
    if md5:
        h = F.conv(F.substring(
            F.md5(F.concat(F.col(id_col).cast("string"),
                           F.lit(f"#{seed}"))), 1, 8), 16, 10) \
            .cast("long")
    else:
        h = F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)),
                   F.lit(1 << 32))
    u = (h.cast("double") + 0.5) / F.lit(_U32_DENOM)  # (0, 1)
    return F.log(u) / F.col(weight_col).cast("double")


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    seed: int = 0,
    md5: bool = False,
) -> DataFrame:
    """The k-row E-S weighted sample (all input columns, original
    names). Deterministic; ties (impossible off a hash collision)
    break on id."""
    if k < 1:
        raise ValueError("k must be >= 1")
    key = _es_key(id_col, weight_col, seed, md5)
    return (df.filter(F.col(weight_col).isNotNull()
                      & (F.col(weight_col) > 0))
            .withColumn("__esk", key)
            .orderBy(F.desc("__esk"), F.asc(id_col))
            .limit(k)
            .drop("__esk"))


def weighted_sample_grouped(
    df: DataFrame,
    k: int,
    weight_col: str,
    group_by: "list[str]",
    id_col: str = "doc_id",
    seed: int = 0,
    md5: bool = False,
) -> DataFrame:
    """k rows PER GROUP (stratified E-S): one keyed window, shuffle
    bounded by the group partitioning."""
    if k < 1:
        raise ValueError("k must be >= 1")
    if not group_by:
        raise ValueError("group_by must be non-empty (use "
                         "weighted_sample)")
    key = _es_key(id_col, weight_col, seed, md5)
    w = Window.partitionBy(*group_by).orderBy(
        F.desc("__esk"), F.asc(id_col))
    return (df.filter(F.col(weight_col).isNotNull()
                      & (F.col(weight_col) > 0))
            .withColumn("__esk", key)
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= k)
            .drop("__esk", "__rn"))


def _es_key_sql(id_col: str, weight_expr: str, seed: int) -> str:
    h = (f"('0x' || substr(md5(CAST({id_col} AS VARCHAR) || "
         f"'#{seed}'), 1, 8))::BIGINT")
    return (f"ln((({h})::DOUBLE + 0.5) / {_U32_DENOM!r}) "
            f"/ CAST({weight_expr} AS DOUBLE)")


def weighted_sample_sql(
    table: str,
    k: int,
    weight_expr: str,
    id_col: str = "doc_id",
    seed: int = 0,
    select: str = "*",
) -> str:
    """DuckDB twin of weighted_sample(md5=True): identical u, key,
    cut, and (key desc, id) order."""
    key = _es_key_sql(id_col, weight_expr, seed)
    return f"""
SELECT {select} FROM {table}
WHERE ({weight_expr}) IS NOT NULL AND ({weight_expr}) > 0
ORDER BY {key} DESC, {id_col} ASC
LIMIT {int(k)}
"""


def weighted_sample_grouped_sql(
    table: str,
    k: int,
    weight_expr: str,
    group_by: "list[str]",
    id_col: str = "doc_id",
    seed: int = 0,
    select: str = "* EXCLUDE (__rn)",
) -> str:
    """DuckDB twin of weighted_sample_grouped(md5=True)."""
    key = _es_key_sql(id_col, weight_expr, seed)
    gb = ", ".join(group_by)
    return f"""
SELECT {select} FROM (
  SELECT *, row_number() OVER (
      PARTITION BY {gb} ORDER BY {key} DESC, {id_col} ASC) AS __rn
  FROM {table}
  WHERE ({weight_expr}) IS NOT NULL AND ({weight_expr}) > 0
) WHERE __rn <= {int(k)}
"""
