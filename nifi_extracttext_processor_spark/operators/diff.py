"""Keyed snapshot diffing — "what changed between yesterday's table
and today's?", the audit/CDC primitive beside operators/scd.py's
history build (scd answers "what was true at time T"; this answers
"what did this refresh do"). Output feeds incremental downstreams
(process only `added`+`changed`), data-quality alarms (a refresh
that `removed` 30% of rows is a broken upstream, not a diff), and
regression reports.

`diff_snapshots(old, new, key_cols, compare_cols)` emits one row per
key present in either side, tagged:

    added     key only in new
    removed   key only in old
    changed   key in both, any compared column differs (null-safe)
    unchanged key in both, all compared columns equal (included only
              with include_unchanged=True — at 100 TB the unchanged
              mass is the bulk and usually unwanted)

plus each compared column twice (`old_<c>`, `new_<c>`).

Scale shape: ONE full-outer hash join on the key columns — the
theoretical floor for a keyed diff (both sides must meet once); the
change flag and per-column pairs are narrow projections on top.
Columns compare null-safely (eqNullSafe) so NULL→NULL is unchanged
and NULL↔value is a change. With `hash_compare=True` the change
flag uses a per-column md5+null-flag digest (fixed-width tokens, so
neither NULL-vs-value nor embedded separator bytes can alias) folded
into one md5, instead of N pairwise comparisons — same verdicts up
to md5 collision, one expression, the wide-table (hundreds of
columns) form.

Determinism / oracle: pure set logic over a full-outer join — the
DuckDB twin (diff_snapshots_sql) replays verdicts and values
exactly. Duplicate keys on either side are a CONTRACT VIOLATION
(a keyed diff over non-keys is meaningless): guarded by an optional
fail-closed assert_unique_keys."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

def _row_hash(cols: "list[str]", prefix: str = ""):
    """Unambiguous row digest: each column contributes a fixed-width
    33-char token — a 0/1 null flag + md5 of the value ('' when NULL,
    distinguished from a real '' by the flag) — so NULL can never
    collide with any real value and no data byte can shift a column
    boundary. Residual contract: md5 collisions only (~2^-64 per
    pair)."""
    parts = []
    for c in cols:
        v = F.col(prefix + c)
        parts.append(F.concat(
            F.when(v.isNull(), F.lit("1")).otherwise(F.lit("0")),
            F.md5(F.coalesce(v.cast("string"), F.lit("")))))
    return F.md5(F.concat(*parts))


def diff_snapshots(
    old: DataFrame,
    new: DataFrame,
    key_cols: "list[str] | tuple[str, ...]",
    compare_cols: "list[str] | tuple[str, ...] | None" = None,
    include_unchanged: bool = False,
    hash_compare: bool = False,
    assert_unique_keys: bool = False,
) -> DataFrame:
    """(key..., change_type, old_<c>..., new_<c>...) — see module
    docstring. `compare_cols=None` compares every shared non-key
    column."""
    keys = list(key_cols)
    if not keys:
        raise ValueError("diff_snapshots needs key columns")
    if compare_cols is None:
        compare_cols = [c for c in old.columns
                        if c in set(new.columns) and c not in keys]
    comps = list(compare_cols)
    if not comps:
        raise ValueError("no columns to compare")
    for c in comps:
        if c not in old.columns or c not in new.columns:
            raise ValueError(f"compare column {c!r} missing from a "
                             "side")
    if assert_unique_keys:
        for side, df in (("old", old), ("new", new)):
            dup = (df.groupBy(*keys).count()
                   .filter(F.col("count") > 1).limit(1).collect())
            if dup:
                raise ValueError(
                    f"duplicate key in {side} snapshot: "
                    f"{tuple(dup[0][k] for k in keys)}")
    o = old.select(*keys,
                   *[F.col(c).alias(f"old_{c}") for c in comps],
                   F.lit(True).alias("__in_old"))
    n = new.select(*keys,
                   *[F.col(c).alias(f"new_{c}") for c in comps],
                   F.lit(True).alias("__in_new"))
    j = o.join(n, keys, "full_outer")
    if hash_compare:
        same = _row_hash([f"old_{c}" for c in comps]).eqNullSafe(
            _row_hash([f"new_{c}" for c in comps]))
    else:
        same = None
        for c in comps:
            eq = F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
            same = eq if same is None else (same & eq)
    change = (F.when(F.col("__in_old").isNull(), F.lit("added"))
              .when(F.col("__in_new").isNull(), F.lit("removed"))
              .when(same, F.lit("unchanged"))
              .otherwise(F.lit("changed")))
    out = j.select(*keys, change.alias("change_type"),
                   *[F.col(f"old_{c}") for c in comps],
                   *[F.col(f"new_{c}") for c in comps])
    if not include_unchanged:
        out = out.filter(F.col("change_type") != "unchanged")
    return out


def diff_summary(diff: DataFrame) -> DataFrame:
    """(change_type, n) — the one-line health report of a refresh
    (a tiny map-side-combinable agg over the diff)."""
    return (diff.groupBy("change_type")
            .agg(F.count("*").alias("n"))
            .orderBy("change_type"))


def diff_snapshots_sql(
    old_table: str,
    new_table: str,
    key_cols: "list[str] | tuple[str, ...]",
    compare_cols: "list[str] | tuple[str, ...]",
    include_unchanged: bool = False,
) -> str:
    """DuckDB twin of diff_snapshots (pairwise null-safe form)."""
    keys = list(key_cols)
    comps = list(compare_cols)
    kj = " AND ".join(f"o.{k} = n.{k}" for k in keys)
    ksel = ", ".join(f"coalesce(o.{k}, n.{k}) AS {k}" for k in keys)
    same = " AND ".join(
        f"o.{c} IS NOT DISTINCT FROM n.{c}" for c in comps)
    osel = ", ".join(f"o.{c} AS old_{c}" for c in comps)
    nsel = ", ".join(f"n.{c} AS new_{c}" for c in comps)
    unfil = "" if include_unchanged else \
        "WHERE change_type <> 'unchanged'"
    return f"""
SELECT * FROM (
  SELECT {ksel},
         CASE WHEN o.__in_old IS NULL THEN 'added'
              WHEN n.__in_new IS NULL THEN 'removed'
              WHEN {same} THEN 'unchanged'
              ELSE 'changed' END AS change_type,
         {osel}, {nsel}
  FROM (SELECT *, TRUE AS __in_old FROM {old_table}) o
  FULL OUTER JOIN (SELECT *, TRUE AS __in_new FROM {new_table}) n
    ON {kj}
) {unfil}
"""


# ---------------------------------------------------------------------------
# Order-independent table checksum — the migration/replication parity
# primitive: after copying 100 TB between clusters (or engines), did
# EVERY row arrive intact? Comparing tables row-by-row needs a full
# co-located join; comparing checksums needs one map-side-combinable
# agg per side. The checksum is the exact integer SUM of a per-row
# 32-bit md5 digest (the hash_compare null-flagged per-column form, so
# NULL/value and separator ambiguities cannot alias) — addition is
# commutative, so row order, partitioning, and engine never matter,
# and the sum stays exact in decimal/int128 (no float, no modular
# wrap to hide a double-error). Collision contract: two tables
# differing in exactly one row pair collide with ~2^-32 probability
# per check (md5 truncation) — fine for an integrity alarm, not for
# an adversarial setting.
# ---------------------------------------------------------------------------

def table_checksum(
    df: DataFrame,
    cols: "list[str] | None" = None,
    group_by: "list[str] | None" = None,
) -> DataFrame:
    """(group..., n_rows, checksum) — checksum = Σ u32(md5(row digest))
    over `cols` (default: all non-group columns, name-sorted so both
    engines agree on the column order)."""
    gb = list(group_by or [])
    if cols is None:
        cols = sorted(c for c in df.columns if c not in gb)
    if not cols:
        raise ValueError("no columns to checksum")
    u32 = F.conv(F.substring(_row_hash(list(cols)), 1, 8), 16, 10) \
        .cast("long")
    return (df.groupBy(*gb)
            .agg(F.count("*").alias("n_rows"),
                 # exact decimal sum, surfaced as a STRING: the value
                 # is a digest, and pandas/arrow bridges turn int128
                 # into lossy float64 otherwise
                 F.sum(u32.cast("decimal(38,0)")).cast("string")
                 .alias("checksum")))


def table_checksum_sql(
    table: str,
    cols: "list[str]",
    group_by: "list[str] | None" = None,
) -> str:
    """DuckDB twin: identical per-column null-flag+md5 digest, u32
    truncation, and exact integer sum."""
    gb = list(group_by or [])
    parts = " || ".join(
        f"(CASE WHEN {c} IS NULL THEN '1' ELSE '0' END || "
        f"md5(coalesce(CAST({c} AS VARCHAR), '')))"
        for c in cols)
    u32 = f"('0x' || substr(md5({parts}), 1, 8))::BIGINT"
    gsel = (", ".join(gb) + ", ") if gb else ""
    gkey = ("GROUP BY " + ", ".join(gb)) if gb else ""
    return (f"SELECT {gsel}count(*) AS n_rows, "
            f"CAST(sum({u32}) AS VARCHAR) AS checksum "
            f"FROM {table} {gkey}")
