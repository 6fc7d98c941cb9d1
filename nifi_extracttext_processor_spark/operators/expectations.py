"""Declarative data-quality expectations — the admission gate a
production table needs before anything downstream trusts it (the
pipeline-side counterpart of profile.py, which DESCRIBES a table;
this one JUDGES it against a contract): null checks, ranges,
accepted value sets, regex shape, uniqueness, and referential
integrity, each reported as (rule, n_rows, n_violations, passed).

Scale shape — the whole point of the design: every per-row rule
compiles to ONE conditional-sum column inside a SINGLE aggregate, so
checking 50 rules costs one table scan with map-side partial
aggregation (never one job per rule); uniqueness rides the same agg
as count vs count_distinct. The per-rule rows come from unpivoting
the 1-row aggregate (stack — groups-sized, free). Referential
integrity is its own operator (it genuinely needs the dimension):
a broadcast-able left-anti count.

Exactness: violation counts are integer sums — trivially
engine-exact; `passed` is n_violations = 0. NULL semantics are per
rule and documented on each constructor (a NULL in a range check is
NOT a range violation — it is a not_null violation; rules compose
instead of double-counting)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sqlutil import sql_lit

_KINDS = ("not_null", "between", "in_set", "regex", "unique")


def expect_not_null(col: str) -> tuple:
    """Violation: the value IS NULL."""
    return ("not_null", col)


def expect_between(col: str, lo: float, hi: float) -> tuple:
    """Violation: a NON-NULL value outside [lo, hi] (inclusive).
    NULLs are expect_not_null's business."""
    return ("between", col, float(lo), float(hi))


def expect_in_set(col: str, values: "list") -> tuple:
    """Violation: a non-NULL value outside the accepted set."""
    if not values:
        raise ValueError("values must be non-empty")
    return ("in_set", col, tuple(values))


def expect_regex(col: str, pattern: str) -> tuple:
    """Violation: a non-NULL value not fully matching `pattern`
    (anchored: the whole value must match)."""
    return ("regex", col, pattern)


def expect_unique(col: str) -> tuple:
    """Violation count: non-NULL duplicates — count(col) minus
    count(DISTINCT col). NULLs are not values, so they neither
    collide nor count."""
    return ("unique", col)


def _rule_name(rule: tuple) -> str:
    kind, col = rule[0], rule[1]
    if kind == "between":
        return f"between({col}, {rule[2]:g}, {rule[3]:g})"
    if kind == "in_set":
        return f"in_set({col}, {len(rule[2])} values)"
    if kind == "regex":
        return f"regex({col})"
    return f"{kind}({col})"


def check_expectations(df: DataFrame, rules: "list[tuple]") -> DataFrame:
    """(rule, n_rows, n_violations, passed) — one row per rule, ONE
    scan for all of them. Rule order is preserved in the output (the
    report reads like the contract)."""
    if not rules:
        raise ValueError("rules must be non-empty")
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, rule in enumerate(rules):
        kind, col = rule[0], rule[1]
        c = F.col(col)
        if kind == "not_null":
            bad = c.isNull().cast("long")
        elif kind == "between":
            bad = (c.isNotNull()
                   & ((c < F.lit(rule[2])) | (c > F.lit(rule[3])))
                   ).cast("long")
        elif kind == "in_set":
            bad = (c.isNotNull() & ~c.isin(list(rule[2]))).cast("long")
        elif kind == "regex":
            bad = (c.isNotNull()
                   & ~c.cast("string").rlike(f"^(?:{rule[2]})$")
                   ).cast("long")
        elif kind == "unique":
            # count minus distinct, assembled after the agg
            aggs.append(F.count(c).alias(f"__cnt{i}"))
            aggs.append(F.count_distinct(c).alias(f"__dst{i}"))
            continue
        else:
            raise ValueError(f"unknown rule kind {kind!r}")
        aggs.append(F.sum(bad).alias(f"__v{i}"))
    one = df.agg(*aggs)
    pairs = []
    for i, rule in enumerate(rules):
        name = F.lit(_rule_name(rule))
        if rule[0] == "unique":
            v = F.col(f"__cnt{i}") - F.col(f"__dst{i}")
        else:
            v = F.col(f"__v{i}")
        pairs.append(F.struct(F.lit(i).alias("ord"), name.alias("rule"),
                              v.alias("v")))
    exploded = one.select(
        F.col("__n"), F.explode(F.array(*pairs)).alias("r"))
    return (exploded.select(
        F.col("r.ord").alias("__ord"),
        F.col("r.rule").alias("rule"),
        F.col("__n").alias("n_rows"),
        F.col("r.v").alias("n_violations"),
        (F.col("r.v") == 0).alias("passed"))
        .orderBy("__ord").drop("__ord"))


def check_expectations_sql(table: str, rules: "list[tuple]") -> str:
    """DuckDB twin of check_expectations (same one-scan conditional
    sums, same rule names and order)."""
    if not rules:
        raise ValueError("rules must be non-empty")
    aggs = ["count(*) AS n"]
    sel = []
    for i, rule in enumerate(rules):
        kind, col = rule[0], rule[1]
        if kind == "not_null":
            aggs.append(f"sum(CAST({col} IS NULL AS BIGINT)) AS v{i}")
        elif kind == "between":
            aggs.append(
                f"sum(CAST({col} IS NOT NULL AND ({col} < {rule[2]!r} "
                f"OR {col} > {rule[3]!r}) AS BIGINT)) AS v{i}")
        elif kind == "in_set":
            vals = ", ".join(sql_lit(v) for v in rule[2])
            aggs.append(
                f"sum(CAST({col} IS NOT NULL AND {col} NOT IN ({vals})"
                f" AS BIGINT)) AS v{i}")
        elif kind == "regex":
            aggs.append(
                f"sum(CAST({col} IS NOT NULL AND NOT "
                f"regexp_full_match(CAST({col} AS VARCHAR), "
                f"{sql_lit(rule[2])}) AS BIGINT)) AS v{i}")
        elif kind == "unique":
            aggs.append(f"count({col}) - count(DISTINCT {col}) AS v{i}")
        else:
            raise ValueError(f"unknown rule kind {kind!r}")
        sel.append(
            f"SELECT {i} AS ord, {sql_lit(_rule_name(rule))} AS rule, "
            f"n AS n_rows, CAST(v{i} AS BIGINT) AS n_violations, "
            f"v{i} = 0 AS passed "
            f"FROM one")
    body = " UNION ALL ".join(sel)
    return (f"WITH one AS (SELECT {', '.join(aggs)} FROM {table}) "
            f"SELECT rule, n_rows, n_violations, passed "
            f"FROM ({body}) ORDER BY ord")


def check_referential(
    df: DataFrame,
    col: str,
    dim: DataFrame,
    dim_col: str,
) -> DataFrame:
    """(rule, n_rows, n_violations, passed) for the foreign-key
    expectation df.col ⊆ dim.dim_col (NULL keys are not references —
    expect_not_null covers them). Broadcast-able left-anti count:
    the dimension's distinct keys move, the fact table never does."""
    keys = dim.select(F.col(dim_col).alias("__k")).distinct()
    fact = df.filter(F.col(col).isNotNull())
    miss = fact.join(F.broadcast(keys),
                     fact[col] == F.col("__k"), "left_anti")
    tot = fact.agg(F.count(F.lit(1)).alias("n_rows"))
    bad = miss.agg(F.count(F.lit(1)).alias("n_violations"))
    return tot.crossJoin(bad).select(
        F.lit(f"referential({col})").alias("rule"),
        "n_rows", "n_violations",
        (F.col("n_violations") == 0).alias("passed"))


def check_referential_sql(
    table: str,
    col: str,
    dim_table: str,
    dim_col: str,
) -> str:
    """DuckDB twin of check_referential."""
    return f"""
SELECT {sql_lit(f"referential({col})")} AS rule,
       count(*) AS n_rows,
       CAST(sum(CAST({col} NOT IN (SELECT {dim_col}
                                   FROM {dim_table}
                                   WHERE {dim_col} IS NOT NULL)
                     AS BIGINT)) AS BIGINT) AS n_violations,
       sum(CAST({col} NOT IN (SELECT {dim_col} FROM {dim_table}
                              WHERE {dim_col} IS NOT NULL)
                AS BIGINT)) = 0 AS passed
FROM {table} WHERE {col} IS NOT NULL
"""
