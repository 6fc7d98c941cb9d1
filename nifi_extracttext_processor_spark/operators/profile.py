"""Table profiling: per-column null/distinct/range statistics in ONE
scan — the data-quality health check a 100 TB ingestion runs before
(and after) every pipeline stage.

The whole profile is a single aggregation pass: every column's
count/nulls/distinct/min/max are expressions in ONE agg (Catalyst
computes them all in the same partial-aggregate traversal), and the
1-row result unpivots to one row per column via `stack` — so profile
cost is one scan regardless of column count, never a per-column job.

Exact count(DISTINCT) across many columns expands [1]; default is
therefore approx_count_distinct (HLL++, mergeable, single-pass),
with `exact=True` as the DuckDB-replayable oracle mode for driver
parity at test scale.

[1] each exact distinct adds an Expand + distinct-agg; at profile
    time the approx sketch is what every production profiler
    (Deequ-style) uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from .rounding import dround


from .guards import DEFAULT_MAX_DISTINCT, guard_max_distinct

# atomic types whose min/max are well-defined and portably comparable
# (df.dtypes SQL spellings)
_ORDERED_TYPES = {
    "tinyint", "smallint", "int", "bigint", "float", "double",
    "decimal", "string", "date", "timestamp", "timestamp_ntz",
    "boolean",
}


def profile_table(
    df: DataFrame,
    cols: list[str] | None = None,
    exact: bool = False,
) -> DataFrame:
    """One row per column: (column, dtype, n_rows, n_nulls, null_frac,
    n_distinct, min_value, max_value) — min/max cast to string so
    heterogeneous columns share one schema; non-orderable columns
    (arrays, maps, structs) profile nulls/distinct only (min/max
    NULL). `exact` switches HLL++ distinct counts to exact
    count(DISTINCT) — the oracle-replayable mode."""
    cols = list(cols) if cols is not None else list(df.columns)
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"unknown columns {missing}")
    if not cols:
        raise ValueError("no columns to profile")

    nd = (F.count_distinct if exact
          else F.approx_count_distinct)
    aggs = [F.count(F.lit(1)).alias("__n")]
    dtypes = dict(df.dtypes)
    for c in cols:
        base = dtypes[c].split("(")[0]
        ordered = base in _ORDERED_TYPES
        aggs.append(F.count(F.col(c)).alias(f"__nn_{c}"))
        aggs.append(nd(F.col(c)).alias(f"__nd_{c}"))
        if ordered:
            aggs.append(F.min(F.col(c)).cast("string")
                        .alias(f"__min_{c}"))
            aggs.append(F.max(F.col(c)).cast("string")
                        .alias(f"__max_{c}"))
        else:
            aggs.append(F.lit(None).cast("string").alias(f"__min_{c}"))
            aggs.append(F.lit(None).cast("string").alias(f"__max_{c}"))
    one = df.agg(*aggs)

    def q(s: str) -> str:
        return "'" + s.replace("'", "\\'") + "'"

    parts = []
    for c in cols:
        parts.append(", ".join([
            q(c), q(dtypes[c]), "__n", f"`__nn_{c}`", f"`__nd_{c}`",
            f"`__min_{c}`", f"`__max_{c}`"]))
    stacked = one.select(F.expr(
        f"stack({len(cols)}, {', '.join(parts)}) AS "
        "(column, dtype, n_rows, n_notnull, n_distinct, "
        "min_value, max_value)"))
    return stacked.select(
        "column", "dtype",
        F.col("n_rows").cast("long").alias("n_rows"),
        (F.col("n_rows") - F.col("n_notnull")).cast("long")
        .alias("n_nulls"),
        dround((F.col("n_rows") - F.col("n_notnull"))
                / F.col("n_rows"), 4).alias("null_frac"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
        "min_value", "max_value")


def profile_table_sql(
    table: str,
    cols: list[tuple[str, str]],
) -> str:
    """DuckDB twin of profile_table(exact=True): same single-agg +
    unpivot shape, same string casts and rounding. `cols` is
    [(name, spark_dtype_string), ...] — the dtype literal Spark
    reports, supplied by the caller (the two engines' catalogs name
    types differently, and the profile row carries Spark's)."""
    if not cols:
        raise ValueError("no columns to profile")
    aggs = ["count(*) AS __n"]
    for c, _ in cols:
        aggs += [f"count({c}) AS __nn_{c}",
                 f"count(DISTINCT {c}) AS __nd_{c}",
                 f"CAST(min({c}) AS VARCHAR) AS __min_{c}",
                 f"CAST(max({c}) AS VARCHAR) AS __max_{c}"]
    selects = []
    for c, dtype in cols:
        selects.append(f"""
SELECT '{c}' AS column, '{dtype}' AS dtype,
       CAST(__n AS BIGINT) AS n_rows,
       CAST(__n - __nn_{c} AS BIGINT) AS n_nulls,
       round((__n - __nn_{c}) / CAST(__n AS DOUBLE), 4) AS null_frac,
       CAST(__nd_{c} AS BIGINT) AS n_distinct,
       __min_{c} AS min_value, __max_{c} AS max_value
FROM _one""")
    return (f"WITH _one AS (SELECT {', '.join(aggs)} FROM {table})"
            + " UNION ALL ".join(selects))


# ---------------------------------------------------------------------------
# mergeable distinct sketches — incremental cardinality across batches
# ---------------------------------------------------------------------------

def build_distinct_sketch(
    df: DataFrame,
    col: str,
    by: str | None = None,
    lg_k: int = 12,
) -> DataFrame:
    """Per-group mergeable HLL sketch of `col`'s distinct values
    (Spark's native Datasketches hll_sketch_agg; lg_k=12 ≈ 1.6 KB /
    ~2.5% rel err). Persist these per batch/day/shard and UNION +
    merge later — distinct counts over any time range without ever
    rescanning the data, the incremental twin of profile_table's
    n_distinct column. Returns (by?, sketch binary, n_rows)."""
    keys = [by] if by else []
    return (df.groupBy(*keys)
            .agg(F.hll_sketch_agg(F.col(col), F.lit(lg_k))
                 .alias("sketch"),
                 F.count(F.col(col)).alias("n_rows")))


def merge_distinct_sketches(
    sketches: DataFrame,
    by: str | None = None,
) -> DataFrame:
    """Merge sketch rows (across batches, shards, days) and estimate:
    (by?, n_distinct_est, n_rows). Merging is associative and lossless
    w.r.t. the sketch guarantee, so estimates over ANY union of saved
    sketches cost only the sketch bytes."""
    keys = [by] if by else []
    merged = (sketches.groupBy(*keys)
              .agg(F.hll_union_agg("sketch").alias("sketch"),
                   F.sum("n_rows").alias("n_rows")))
    return merged.select(
        *keys,
        F.hll_sketch_estimate("sketch").cast("long")
        .alias("n_distinct_est"),
        F.col("n_rows").cast("long"))


# ---------------------------------------------------------------------------
# expectations gate — the Deequ-style data-quality check
# ---------------------------------------------------------------------------

def check_expectations(
    df: DataFrame,
    rules: "dict[str, dict[str, float | str]]",
    exact: bool = False,
) -> tuple[bool, DataFrame]:
    """Evaluate per-column data-quality rules against profile_table
    output in ONE scan. `rules` maps column -> checks, where a check
    is any of:
      max_null_frac: float    null fraction must not exceed this
      min_distinct:  int      at least this many distinct values
      min_value / max_value:  str — lexicographic/cast-string bound
                              on the column's observed min/max
                              (matches profile_table's string casts)
    Returns (all_passed, failures_df) with one row per violated check
    (column, check, expected, observed). The gate a 100 TB ingestion
    runs between pipeline stages — cheap enough (one scan) to run
    every batch."""
    prof = {r["column"]: r for r in
            profile_table(df, cols=list(rules), exact=exact).collect()}
    failures: list[tuple[str, str, str, str]] = []
    for col, checks in rules.items():
        p = prof[col]
        for check, want in checks.items():
            if check == "max_null_frac":
                if p["null_frac"] > float(want):
                    failures.append((col, check, str(want),
                                     str(p["null_frac"])))
            elif check == "min_distinct":
                if p["n_distinct"] < int(want):
                    failures.append((col, check, str(want),
                                     str(p["n_distinct"])))
            elif check == "min_value":
                if p["min_value"] is None or p["min_value"] < str(want):
                    failures.append((col, check, str(want),
                                     str(p["min_value"])))
            elif check == "max_value":
                if p["max_value"] is None or p["max_value"] > str(want):
                    failures.append((col, check, str(want),
                                     str(p["max_value"])))
            else:
                raise ValueError(f"unknown check {check!r}")
    spark = df.sparkSession
    fdf = spark.createDataFrame(
        failures or [],
        "column string, check string, expected string, observed string")
    return (not failures), fdf


# ---------------------------------------------------------------------------
# quantile profiles — distribution shape, not just range
# ---------------------------------------------------------------------------

_NUMERIC_TYPES = {"tinyint", "smallint", "int", "bigint", "float",
                  "double", "decimal"}


def profile_quantiles(
    df: DataFrame,
    cols: list[str],
    probs: "tuple[float, ...]" = (0.25, 0.5, 0.75, 0.9, 0.99),
    exact: bool = False,
    accuracy: int = 10000,
) -> DataFrame:
    """Per-column quantiles in ONE scan: (column, prob, quantile).

    Default = approx_percentile (Greenwald-Khanna sketch: mergeable,
    single-pass, error bounded by 1/accuracy) — the only sane mode at
    100 TB, same posture as the HLL distinct counts above. `exact=
    True` switches to the interpolating exact percentile (sort-based
    per column — test-scale only) whose semantics DuckDB's
    quantile_cont replays exactly, so the oracle gate covers the
    unpivot plumbing and the interpolation arithmetic."""
    if not cols:
        raise ValueError("no columns to profile")
    dtypes = dict(df.dtypes)
    bad = [c for c in cols
           if c not in dtypes
           or dtypes[c].split("(")[0] not in _NUMERIC_TYPES]
    if bad:
        raise ValueError(f"non-numeric or unknown columns {bad}")
    if not probs or any(not 0.0 <= p <= 1.0 for p in probs):
        raise ValueError("probs must be within [0, 1]")
    parr = F.array(*[F.lit(float(p)) for p in probs])
    fn = "percentile" if exact else "approx_percentile"
    aggs = []
    for c in cols:
        args = f"`{c}`, array({', '.join(repr(float(p)) for p in probs)})"
        if not exact:
            args += f", {int(accuracy)}"
        # approx_percentile over an integral column yields
        # ARRAY<BIGINT>; cast so stack sees one type across columns
        aggs.append(F.expr(f"{fn}({args})").cast("array<double>")
                    .alias(f"__q_{c}"))
    one = df.agg(*aggs)
    stacked = one.select(F.expr(
        "stack(" + str(len(cols)) + ", "
        + ", ".join(f"'{c}', `__q_{c}`" for c in cols)
        + ") AS (column, __qs)"))
    return (stacked
            .select("column",
                    F.posexplode(F.arrays_zip(
                        parr.alias("p"), F.col("__qs").alias("q"))))
            .select("column",
                    F.col("col.p").alias("prob"),
                    dround(F.col("col.q").cast("double"), 6)
                    .alias("quantile"))
            .orderBy("column", "prob"))


def profile_quantiles_sql(
    table: str,
    cols: list[str],
    probs: "tuple[float, ...]" = (0.25, 0.5, 0.75, 0.9, 0.99),
) -> str:
    """DuckDB twin of profile_quantiles(exact=True): quantile_cont
    interpolation matches Spark's exact percentile."""
    selects = []
    for c in cols:
        for p in probs:
            selects.append(
                f"SELECT '{c}' AS column, "
                f"CAST({float(p)!r} AS DOUBLE) AS prob, "
                f"round(quantile_cont({c}, {float(p)!r}), 6) "
                f"AS quantile FROM {table}")
    return (" UNION ALL ".join(selects)
            + ' ORDER BY "column", prob')


def key_skew_report(
    df: DataFrame,
    keys: "list[str]",
    k: int = 20,
    round_dp: int = 4,
) -> DataFrame:
    """Join/shuffle-key skew diagnostic — the measurement BEFORE a
    salting/AQE decision: at 100 TB a single hot key turns one reducer
    into the job's critical path, and the fix (salt factor, broadcast
    threshold, AQE skew-join) should be sized from data, not folklore.
    One row per top-k key by frequency: (rank, key..., n, frac of all
    rows, skew = n / mean-rows-per-key). skew >> shuffle-partition
    count means even perfect hash spreading leaves that key's reducer
    hot — salt by roughly ceil(skew / P) or broadcast the other side.

    Scale shape: ONE map-side-combinable count agg (shuffle carries
    distinct keys); the global mean is a 1-row broadcast; the cut is
    TakeOrderedAndProject (per-partition top-k, no global sort). NULL
    key values group as their own observable bucket — NULL-heavy keys
    are the single most common real-world skew. Ties break (n desc,
    key asc) — deterministic, twin-replayed."""
    if k < 1:
        raise ValueError("k must be >= 1")
    if not keys:
        raise ValueError("keys must be non-empty")
    counts = df.groupBy(*keys).agg(F.count("*").alias("n"))
    tot = counts.agg(F.sum("n").alias("__rows"),
                     F.count("*").alias("__keys"))
    enriched = counts.crossJoin(F.broadcast(tot)).select(
        *keys, "n",
        dround(F.col("n") / F.col("__rows"), round_dp).alias("frac"),
        dround(F.col("n").cast("double")
                / (F.col("__rows").cast("double")
                   / F.col("__keys").cast("double")),
                round_dp).alias("skew"))
    ordered = enriched.orderBy(
        F.desc("n"), *[F.asc_nulls_first(c) for c in keys]).limit(k)
    from pyspark.sql import Window
    w = Window.orderBy(F.desc("n"),
                       *[F.asc_nulls_first(c) for c in keys])
    return ordered.withColumn(
        "rank", F.row_number().over(w).cast("long")) \
        .select("rank", *keys, "n", "frac", "skew")


def key_skew_report_sql(
    table: str,
    keys: "list[str]",
    k: int = 20,
    round_dp: int = 4,
) -> str:
    """DuckDB twin of key_skew_report (same counts, mean, ties, cut)."""
    kcols = ", ".join(keys)
    order = "n DESC, " + ", ".join(f"{c} ASC NULLS FIRST"
                                   for c in keys)
    return f"""
WITH counts AS (
  SELECT {kcols}, count(*) AS n FROM {table} GROUP BY {kcols}
),
tot AS (SELECT sum(n) AS rows_, count(*) AS keys_ FROM counts)
SELECT row_number() OVER (ORDER BY {order})::BIGINT AS rank,
       {kcols}, n,
       round(n / rows_, {round_dp}) AS frac,
       round(n::DOUBLE / (rows_::DOUBLE / keys_::DOUBLE),
             {round_dp}) AS skew
FROM counts CROSS JOIN tot
ORDER BY {order}
LIMIT {int(k)}
"""


def value_concentration(
    df: DataFrame,
    value_col: str,
    entity_col: str | None = None,
    top_fracs: "tuple[float, ...]" = (0.01, 0.1),
    group_by: "list[str] | None" = None,
    round_dp: int = 4,
    max_distinct: "int | None" = DEFAULT_MAX_DISTINCT,
) -> DataFrame:
    """(group..., n, gini, top_1pct_share, top_10pct_share, ...) —
    how concentrated a value is across entities: the whale readout
    ("the top 1% of users carry 62% of revenue") that decides whether
    mean-based metrics are even meaningful, and the inequality
    companion to key_skew_report's join-key view. `entity_col` first
    collapses rows to per-entity exact-grid sums (per-user revenue);
    None treats each row as an entity.

        gini = 2·Σᵢ i·x₍ᵢ₎ / (n·Σx) − (n+1)/n     (x ascending)

    Exactness: the ranked sum uses the Mann-Whitney 2x-midrank trick
    over the DISTINCT-VALUE aggregate — for a tied block, Σ ranks =
    c·(2·left + c + 1)/2, so 2·Σᵢ i·x₍ᵢ₎ accumulates as exact
    decimal(grid value × integer rank-sum); the shuffle carries
    distinct values, never entities. Top-q shares take the HIGHEST
    ceil(q·n) entities by value (block-split exactly at the
    boundary, partial blocks pro-rated by the grid value). Negative
    values are legal (gini is then unnormalized — documented); NULLs
    excluded. n < 2 emits NULL gini.

    METRIC CONTRACT (r15): the 1e-6 grid distinct-value collapse
    feeds an ordered cumulative window; `max_distinct` gates it
    through guards.guard_max_distinct so an unbounded raw-float
    domain fails loud before the single-task sort (`None` opts
    out)."""
    gb = list(group_by or [])
    v = F.col(value_col).cast("double")
    base = df.filter(v.isNotNull())
    if entity_col is not None:
        ent = (base.groupBy(*gb, F.col(entity_col).alias("__e"))
               .agg(F.sum(F.round(v * 1e6).cast("decimal(38,0)"))
                    .alias("__xq")))
    else:
        ent = base.select(*gb, F.round(v * 1e6)
                          .cast("decimal(38,0)").alias("__xq"))
    per_v = (ent.groupBy(*gb, "__xq")
             .agg(F.count("*").alias("__c")))
    per_v = guard_max_distinct(per_v, gb, max_distinct,
                               "value_concentration")
    wtot = Window.partitionBy(*gb) if gb else Window.partitionBy()
    wprev = (wtot.orderBy("__xq")
             .rowsBetween(Window.unboundedPreceding, -1))
    left = F.coalesce(F.sum("__c").over(wprev), F.lit(0))
    # Σ ranks within the tied block, times 2 (exact integers)
    ranksum2 = F.col("__c") * (2 * left + F.col("__c") + 1)
    # 2·Σ i·x over the block = xq · ranksum2 (decimal-exact)
    term = F.col("__xq") * ranksum2.cast("decimal(38,0)")
    # suffix count/sum for the top-q shares (descending from here)
    wnext = (wtot.orderBy("__xq")
             .rowsBetween(1, Window.unboundedFollowing))
    above_c = F.coalesce(F.sum("__c").over(wnext), F.lit(0))
    enriched = per_v.select(
        *gb, "__xq", "__c",
        term.alias("__t2"), above_c.alias("__ac"))
    agg = enriched.groupBy(*gb).agg(
        F.sum("__c").alias("n"),
        F.sum(F.col("__xq") * F.col("__c").cast("decimal(38,0)"))
        .alias("__sx"),
        F.sum("__t2").alias("__st2"),
        F.collect_list(F.struct("__xq", "__c", "__ac"))
        .alias("__blocks"))
    nn = F.col("n").cast("double")
    sx = F.col("__sx").cast("double")
    gini = F.when(
        (F.col("n") >= 2) & (F.col("__sx") != 0),
        F.col("__st2").cast("double") / (nn * sx)
        - (nn + F.lit(1.0)) / nn)
    cols = [*gb, "n", dround(gini, round_dp).alias("gini")]
    for q in top_fracs:
        qf = float(q)
        k = F.ceil(F.lit(qf) * nn).cast("long")  # top-k entities
        # share = (sum of the k highest) / total: fold the blocks,
        # taking whole blocks above the cut and pro-rating the
        # boundary block by (k - count above it) × its grid value
        take = F.expr(
            f"""aggregate(__blocks, CAST(0.0 AS DOUBLE),
              (acc, b) -> acc + CASE
                WHEN b.__ac >= {{k}} THEN CAST(0.0 AS DOUBLE)
                WHEN b.__ac + b.__c <= {{k}}
                  THEN CAST(b.__xq AS DOUBLE) * b.__c
                ELSE CAST(b.__xq AS DOUBLE) * ({{k}} - b.__ac)
              END)""".replace("{k}", "CAST(ceil("
                              + repr(qf) + " * n) AS BIGINT)"))
        share = F.when(F.col("__sx") != 0,
                       take / F.lit(1e6) / (sx / F.lit(1e6)))
        name = f"top_{qf * 100:g}pct_share"
        cols.append(dround(share, round_dp).alias(name))
    out = agg.select(*cols)
    return out.orderBy(*gb) if gb else out


def value_concentration_sql(
    table: str,
    value_expr: str,
    entity_col: str | None = None,
    top_fracs: "tuple[float, ...]" = (0.01, 0.1),
    group_by: "list[str] | None" = None,
    round_dp: int = 4,
) -> str:
    """DuckDB twin of value_concentration (same distinct-value
    2x-rank-sum gini, same block-split top shares)."""
    gb = list(group_by or [])
    gsel = (", ".join(gb) + ", ") if gb else ""
    part = ("PARTITION BY " + ", ".join(gb)) if gb else ""
    gkey = ("GROUP BY " + ", ".join(gb)) if gb else ""
    order = ("ORDER BY " + ", ".join(gb)) if gb else ""
    if entity_col is not None:
        ent = (f"SELECT {gsel}sum(CAST(round(CAST({value_expr} AS "
               f"DOUBLE) * 1e6) AS HUGEINT)) AS xq FROM {table} "
               f"WHERE {value_expr} IS NOT NULL "
               f"GROUP BY {', '.join([*gb, entity_col])}")
    else:
        ent = (f"SELECT {gsel}CAST(round(CAST({value_expr} AS DOUBLE)"
               f" * 1e6) AS HUGEINT) AS xq FROM {table} "
               f"WHERE {value_expr} IS NOT NULL")
    shares = []
    for q in top_fracs:
        qf = float(q)
        name = f"top_{qf * 100:g}pct_share"
        shares.append(f"""
       round(CASE WHEN sx != 0 THEN
         list_reduce(list_prepend(0.0::DOUBLE,
           list_transform(blocks, b -> CASE
             WHEN b.ac >= CAST(ceil({qf!r} * n) AS BIGINT)
               THEN 0.0::DOUBLE
             WHEN b.ac + b.c <= CAST(ceil({qf!r} * n) AS BIGINT)
               THEN b.xq::DOUBLE * b.c
             ELSE b.xq::DOUBLE
                  * (CAST(ceil({qf!r} * n) AS BIGINT) - b.ac)
           END)), (a, x) -> a + x)
         / 1e6 / (sx::DOUBLE / 1e6) END, {round_dp}) AS {name}""")
    return f"""
WITH ent AS ({ent}),
per_v AS (
  SELECT {gsel}xq, count(*) AS c FROM ent GROUP BY {gsel}xq
),
ranked AS (
  SELECT {gsel}xq, c,
         coalesce(sum(c) OVER ({part} ORDER BY xq
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS lft,
         coalesce(sum(c) OVER ({part} ORDER BY xq
             ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING), 0)
           AS ac
  FROM per_v
),
agg AS (
  SELECT {gsel}CAST(sum(c) AS BIGINT) AS n,
         sum(xq * c::HUGEINT) AS sx,
         sum(xq * (c * (2 * lft + c + 1))::HUGEINT) AS st2,
         list({{'xq': xq, 'c': c, 'ac': ac}} ORDER BY xq) AS blocks
  FROM ranked {gkey}
)
SELECT {gsel}n,
       round(CASE WHEN n >= 2 AND sx != 0 THEN
         st2::DOUBLE / (n::DOUBLE * sx::DOUBLE)
         - (n::DOUBLE + 1.0) / n::DOUBLE END, {round_dp}) AS gini,
       {', '.join(shares)}
FROM agg
{order}
"""


def join_fanout_report(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    round_dp: int = 4,
) -> DataFrame:
    """One-row pre-join diagnostic: (n_left, n_right, n_left_keys,
    n_right_keys, n_matched_keys, max_left_dup, max_right_dup,
    est_join_rows, fanout) — "is this join safe to run": the
    estimated output cardinality (Σ over matched keys of
    left_count × right_count — EXACT, not an estimate, but computed
    from two key-level aggregates instead of running the join) and
    the worst per-key duplication on each side. fanout =
    est_join_rows / n_left (how much the join inflates the fact
    side); a fanout ≫ 1 with max dups on BOTH sides is the
    many-to-many blow-up this report exists to catch before it
    happens. NULL keys never match (reported out of the key counts).

    Cost: one count-agg per side (shuffle carries distinct keys) +
    a keys-sized join — orders cheaper than the join it vets."""
    lk = (left.filter(F.col(left_key).isNotNull())
          .groupBy(F.col(left_key).alias("__k"))
          .agg(F.count("*").alias("__lc")))
    rk = (right.filter(F.col(right_key).isNotNull())
          .groupBy(F.col(right_key).alias("__k"))
          .agg(F.count("*").alias("__rc")))
    m = lk.join(rk, "__k")
    # widen BEFORE the multiply: this operator exists to flag fanout
    # blowups, i.e. exactly the regime where an int64 sum(lc*rc)
    # wraps silently; decimal(38,0) accumulates the true count, the
    # presentation cast below stays long (NULL past 9.2e18 — a
    # visible "too big", never a wrapped plausible number)
    mstats = m.agg(
        F.count("*").alias("n_matched_keys"),
        F.coalesce(F.sum(F.col("__lc").cast("decimal(38,0)")
                         * F.col("__rc").cast("decimal(38,0)")),
                   F.lit(0).cast("decimal(38,0)"))
        .alias("__ejr"))
    lstats = lk.agg(F.sum("__lc").alias("n_left"),
                    F.count("*").alias("n_left_keys"),
                    F.max("__lc").alias("max_left_dup"))
    rstats = rk.agg(F.sum("__rc").alias("n_right"),
                    F.count("*").alias("n_right_keys"),
                    F.max("__rc").alias("max_right_dup"))
    out = lstats.crossJoin(rstats).crossJoin(mstats)
    return out.select(
        "n_left", "n_right", "n_left_keys", "n_right_keys",
        "n_matched_keys", "max_left_dup", "max_right_dup",
        F.col("__ejr").cast("long").alias("est_join_rows"),
        dround(F.col("__ejr").cast("double")
                / F.col("n_left").cast("double"), round_dp)
        .alias("fanout"))


def join_fanout_report_sql(
    left_table: str,
    right_table: str,
    left_key: str,
    right_key: str,
    round_dp: int = 4,
) -> str:
    """DuckDB twin of join_fanout_report."""
    return f"""
WITH lk AS (
  SELECT {left_key} AS k, count(*) AS lc FROM {left_table}
  WHERE {left_key} IS NOT NULL GROUP BY {left_key}
),
rk AS (
  SELECT {right_key} AS k, count(*) AS rc FROM {right_table}
  WHERE {right_key} IS NOT NULL GROUP BY {right_key}
),
m AS (
  -- keep the exact HUGEINT internally; the BIGINT presentation is
  -- TRY_CAST (NULL past 9.2e18, matching Spark's decimal->long
  -- cast) and fanout divides the EXACT value, like Spark's
  -- full-decimal numerator — a raising CAST here would make the
  -- twin error in exactly the blow-up regime the operator flags
  SELECT count(*) AS n_matched_keys,
         coalesce(sum(CAST(lc AS HUGEINT) * rc), 0) AS ejr
  FROM lk JOIN rk USING (k)
),
ls AS (SELECT CAST(sum(lc) AS BIGINT) AS n_left,
              count(*) AS n_left_keys,
              max(lc) AS max_left_dup FROM lk),
rs AS (SELECT CAST(sum(rc) AS BIGINT) AS n_right,
              count(*) AS n_right_keys,
              max(rc) AS max_right_dup FROM rk)
SELECT n_left, n_right, n_left_keys, n_right_keys, n_matched_keys,
       max_left_dup, max_right_dup,
       TRY_CAST(ejr AS BIGINT) AS est_join_rows,
       round(ejr::DOUBLE / n_left::DOUBLE, {round_dp})
         AS fanout
FROM ls CROSS JOIN rs CROSS JOIN m
"""


# Benford first-digit probabilities log10(1 + 1/d), embedded as repr()
# literals (the _POIS_CDF convention) so both engines compare against
# the identical constants — no log10 at query time.
BENFORD_P = (
    0.30102999566398120, 0.17609125905568124, 0.12493873660829993,
    0.09691001300805642, 0.07918124604762482, 0.06694678963061322,
    0.05799194697768673, 0.05115252244738129, 0.04575749056067514,
)


def benford_test(
    df: DataFrame,
    value_col: str,
    group_by: "list[str] | None" = None,
    chi2_alpha: float = 15.507,
    round_dp: int = 4,
) -> DataFrame:
    """(group..., n, d1..d9 counts, chi2, suspicious) — Benford's-law
    first-significant-digit test: organically-generated magnitudes
    (transactions, populations, file sizes) follow
    P(d) = log10(1 + 1/d); fabricated or truncated data usually
    doesn't — the classic forensic/data-quality screen for a value
    column. chi2 compares observed digit counts to the embedded
    Benford constants (8 df; default critical value 15.507 = χ²₈ at
    p=0.05, caller-overridable — the transcendental-free significance
    convention the abtest family uses).

    First significant digit via STRING arithmetic — the digits of the
    decimal rendering, no log10: abs value formatted at full
    precision, first char in '1'..'9' (exact both engines for the
    1e-6-grid magnitudes this engine works on). Zero/NULL values are
    excluded (no first significant digit). One conditional-sum agg;
    the chi2 closes over the 9 embedded constants in digit order."""
    gb = list(group_by or [])
    v = F.col(value_col).cast("double")
    # decimal rendering without scientific notation: format at 6 dp
    # (the grid), strip sign/dot/zeros, take the first digit 1-9
    s = F.regexp_replace(
        F.format_number(F.abs(v), 6), ",", "")
    digit = F.regexp_extract(s, r"([1-9])", 1)
    base = (df.filter(v.isNotNull() & (v != 0))
            .select(*gb, digit.alias("__d"))
            .filter(F.col("__d") != ""))
    aggs = [F.count("*").alias("n")]
    for d in range(1, 10):
        aggs.append(F.sum((F.col("__d") == str(d)).cast("long"))
                    .alias(f"d{d}"))
    agg = base.groupBy(*gb).agg(*aggs)
    n = F.col("n").cast("double")
    chi2 = None
    for d, p in enumerate(BENFORD_P, start=1):
        e = n * F.lit(p)
        t = ((F.col(f"d{d}").cast("double") - e)
             * (F.col(f"d{d}").cast("double") - e) / e)
        chi2 = t if chi2 is None else chi2 + t
    chi2r = dround(chi2, round_dp)
    out = agg.select(
        *gb, "n", *[f"d{d}" for d in range(1, 10)],
        chi2r.alias("chi2"),
        F.coalesce(chi2r >= F.lit(float(chi2_alpha)), F.lit(False))
        .alias("suspicious"))
    return out.orderBy(*gb) if gb else out


def benford_test_sql(
    table: str,
    value_expr: str,
    group_by: "list[str] | None" = None,
    chi2_alpha: float = 15.507,
    round_dp: int = 4,
) -> str:
    """DuckDB twin of benford_test (same string-derived first digit,
    same embedded constants, same left-to-right chi2 chain)."""
    gb = list(group_by or [])
    gsel = (", ".join(gb) + ", ") if gb else ""
    gkey = ("GROUP BY " + ", ".join(gb)) if gb else ""
    order = ("ORDER BY " + ", ".join(gb)) if gb else ""
    digit = (f"regexp_extract(replace(format('{{:.6f}}', "
             f"abs(CAST({value_expr} AS DOUBLE))), ',', ''), "
             f"'([1-9])', 1)")
    dsum = ", ".join(
        f"CAST(sum(CAST(d = '{d}' AS BIGINT)) AS BIGINT) AS d{d}"
        for d in range(1, 10))
    chi2 = " + ".join(
        f"(d{d}::DOUBLE - n::DOUBLE * {p!r})"
        f" * (d{d}::DOUBLE - n::DOUBLE * {p!r})"
        f" / (n::DOUBLE * {p!r})"
        for d, p in enumerate(BENFORD_P, start=1))
    return f"""
WITH base AS (
  SELECT {gsel}{digit} AS d
  FROM {table}
  WHERE {value_expr} IS NOT NULL AND {value_expr} != 0
),
agg AS (
  SELECT {gsel}count(*) AS n, {dsum}
  FROM base WHERE d != '' {gkey}
)
SELECT {gsel}n, {', '.join(f'd{d}' for d in range(1, 10))},
       round({chi2}, {round_dp}) AS chi2,
       coalesce(round({chi2}, {round_dp}) >= {float(chi2_alpha)!r},
                FALSE) AS suspicious
FROM agg
{order}
"""


def metric_decomposition(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    dims: "list[str]",
    split: str,
    round_dp: int = 4,
) -> DataFrame:
    """(dimension, dim_value, value_before, value_after, delta,
    share_of_change) — root-cause readout for "the metric moved
    period-over-period; WHICH segment moved it": the value sum before
    vs on/after `split` (an ISO date string), broken down by every
    dimension in `dims`, each segment's delta as a share of that
    dimension's total change.

    Execution shape: ONE scan — rows melt to (dim_name, dim_value)
    pairs via an inline array (len(dims)× row fan-out of two narrow
    string columns, no second pass over the table), then one
    map-side-combinable groupBy with conditional sums. The share
    window runs over the already-collapsed segment table (bounded by
    total distinct dim values). NULL dim values group as the
    '∅' segment so a null-heavy dimension is visible, not dropped."""
    if not dims:
        raise ValueError("dims must name at least one column")
    pairs = F.array(*[
        F.struct(F.lit(d).alias("dimension"),
                 F.coalesce(F.col(d).cast("string"), F.lit("∅"))
                 .alias("dim_value"))
        for d in dims])
    v = F.col(value_col).cast("double")
    after = (F.col(ts_col) >= F.to_timestamp(F.lit(split))) \
        .cast("int")
    melted = (df.filter(v.isNotNull())
              .select(v.alias("__v"), after.alias("__a"),
                      F.explode(pairs).alias("__p"))
              .select("__v", "__a", "__p.dimension", "__p.dim_value"))
    agg = (melted.groupBy("dimension", "dim_value")
           .agg(F.sum(F.col("__v") * (1 - F.col("__a")))
                .alias("vb"),
                F.sum(F.col("__v") * F.col("__a")).alias("va")))
    delta = F.col("va") - F.col("vb")
    w = Window.partitionBy("dimension")
    tot = F.sum(delta).over(w)
    return agg.select(
        "dimension", "dim_value",
        dround(F.col("vb"), round_dp).alias("value_before"),
        dround(F.col("va"), round_dp).alias("value_after"),
        (dround(delta, round_dp) + F.lit(0.0)).alias("delta"),
        (dround(F.when(F.abs(tot) > 0, delta / tot), round_dp)
         + F.lit(0.0)).alias("share_of_change"))


def metric_decomposition_sql(
    table: str,
    ts_col: str,
    value_col: str,
    dims: "list[str]",
    split: str,
    round_dp: int = 4,
) -> str:
    """DuckDB twin of metric_decomposition (UNION ALL per dimension
    over one base CTE — the twin states semantics; the Spark side
    owns the single-scan melt)."""
    if not dims:
        raise ValueError("dims must name at least one column")
    from ..sqlutil import sql_lit
    arms = []
    for d in dims:
        arms.append(f"""
  SELECT {sql_lit(d)} AS dimension,
         coalesce(CAST({d} AS VARCHAR), '∅') AS dim_value,
         sum(v * (1 - a)) AS vb, sum(v * a) AS va
  FROM base GROUP BY 2""")
    union = " UNION ALL ".join(arms)
    return f"""
WITH base AS (
  SELECT CAST({value_col} AS DOUBLE) AS v,
         CAST({ts_col} >= CAST({sql_lit(split)} AS TIMESTAMP) AS INT)
           AS a,
         * FROM {table} WHERE {value_col} IS NOT NULL
),
seg AS ({union})
SELECT dimension, dim_value,
       round(vb, {round_dp}) AS value_before,
       round(va, {round_dp}) AS value_after,
       round(va - vb, {round_dp}) + 0.0 AS delta,
       round(CASE WHEN abs(sum(va - vb) OVER (PARTITION BY dimension))
                       > 0
                  THEN (va - vb)
                       / sum(va - vb) OVER (PARTITION BY dimension)
             END, {round_dp}) + 0.0 AS share_of_change
FROM seg
"""


def topk_turnover(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    value_col: str,
    split: str,
    k: int = 10,
    round_dp: int = 4,
) -> DataFrame:
    """(k_requested, k_before, k_after, n_common, jaccard_k,
    n_entered, n_exited, avg_rank_shift) — leaderboard churn across a
    split date: the top-k keys by value sum before vs on/after
    `split`, how much the two lists overlap (jaccard over the union
    of the two top-k sets), how many keys entered/exited, and the
    mean |rank delta| over the keys present in both lists. The
    "did our top queries/products actually change week-over-week"
    readout beside metric_decomposition (which says WHO moved the
    total; this says whether the HEAD of the distribution rotated).

    Ranking is deterministic ACROSS ENGINES: per-key value sums are
    exact 1e-6-grid decimals (a float sum's association order could
    flip a rank — rounding can't repair a discrete top-k cut), then
    descending with key-ascending tie break, spelled identically in
    the twin. Scale shape: one map-side agg to (period, key) sums,
    two bounded top-k windows, then arithmetic over ≤2k rows."""
    if k < 1:
        raise ValueError("k must be >= 1")
    from pyspark.sql import Window
    after = (F.col(ts_col) >= F.to_timestamp(F.lit(split))) \
        .cast("int")
    v = F.col(value_col).cast("double")
    per = (df.filter(v.isNotNull() & F.col(key_col).isNotNull())
           .groupBy(after.alias("__p"), F.col(key_col).alias("__k"))
           .agg(F.sum(F.round(v * 1e6).cast("decimal(38,0)"))
                .alias("__v")))
    w = Window.partitionBy("__p").orderBy(F.col("__v").desc(),
                                          F.col("__k").asc())
    top = (per.withColumn("__r", F.row_number().over(w))
           .filter(F.col("__r") <= k))
    a = (top.filter(F.col("__p") == 0)
         .select(F.col("__k").alias("key"),
                 F.col("__r").alias("ra")))
    b = (top.filter(F.col("__p") == 1)
         .select(F.col("__k").alias("key"),
                 F.col("__r").alias("rb")))
    j = a.join(b, "key", "full_outer")
    return j.agg(
        F.lit(int(k)).alias("k_requested"),
        F.count("ra").alias("k_before"),
        F.count("rb").alias("k_after"),
        F.sum((F.col("ra").isNotNull() & F.col("rb").isNotNull())
              .cast("long")).alias("n_common"),
        dround(F.try_divide(
            F.sum((F.col("ra").isNotNull() & F.col("rb").isNotNull())
                  .cast("long")).cast("double"),
            F.count("*").cast("double")), round_dp)
        .alias("jaccard_k"),
        F.sum((F.col("ra").isNull() & F.col("rb").isNotNull())
              .cast("long")).alias("n_entered"),
        F.sum((F.col("ra").isNotNull() & F.col("rb").isNull())
              .cast("long")).alias("n_exited"),
        dround(F.try_divide(
            F.sum(F.when(F.col("ra").isNotNull()
                         & F.col("rb").isNotNull(),
                         F.abs(F.col("ra") - F.col("rb")))),
            F.sum((F.col("ra").isNotNull() & F.col("rb").isNotNull())
                  .cast("long")).cast("double")), round_dp)
        .alias("avg_rank_shift"))


def topk_turnover_sql(
    table: str,
    ts_col: str,
    key_col: str,
    value_col: str,
    split: str,
    k: int = 10,
    round_dp: int = 4,
) -> str:
    """DuckDB twin of topk_turnover (same deterministic tie order,
    same full-outer overlap arithmetic)."""
    if k < 1:
        raise ValueError("k must be >= 1")
    from ..sqlutil import sql_lit
    return f"""
WITH per AS (
  SELECT CAST({ts_col} >= CAST({sql_lit(split)} AS TIMESTAMP) AS INT)
           AS p,
         {key_col} AS key,
         sum(CAST(round(CAST({value_col} AS DOUBLE) * 1e6)
                  AS HUGEINT)) AS v
  FROM {table}
  WHERE {value_col} IS NOT NULL AND {key_col} IS NOT NULL
  GROUP BY 1, 2
),
top AS (
  SELECT * FROM (
    SELECT p, key, v,
           row_number() OVER (PARTITION BY p
                              ORDER BY v DESC, key ASC) AS r
    FROM per
  ) WHERE r <= {int(k)}
),
j AS (
  SELECT coalesce(a.key, b.key) AS key, a.r AS ra, b.r AS rb
  FROM (SELECT key, r FROM top WHERE p = 0) a
  FULL OUTER JOIN (SELECT key, r FROM top WHERE p = 1) b
    ON a.key = b.key
)
SELECT {int(k)} AS k_requested,
       count(ra) AS k_before, count(rb) AS k_after,
       CAST(sum(CAST(ra IS NOT NULL AND rb IS NOT NULL AS BIGINT))
            AS BIGINT) AS n_common,
       round(CAST(sum(CAST(ra IS NOT NULL AND rb IS NOT NULL
                           AS BIGINT)) AS DOUBLE)
             / nullif(CAST(count(*) AS DOUBLE), 0), {round_dp})
         AS jaccard_k,
       CAST(sum(CAST(ra IS NULL AND rb IS NOT NULL AS BIGINT))
            AS BIGINT) AS n_entered,
       CAST(sum(CAST(ra IS NOT NULL AND rb IS NULL AS BIGINT))
            AS BIGINT) AS n_exited,
       round(sum(CASE WHEN ra IS NOT NULL AND rb IS NOT NULL
                      THEN abs(ra - rb) END)
             / nullif(CAST(sum(CAST(ra IS NOT NULL AND rb IS NOT NULL
                                    AS BIGINT)) AS DOUBLE), 0),
             {round_dp}) AS avg_rank_shift
FROM j
"""


def theil_decomposition(
    df: DataFrame,
    value_col: str,
    dim_col: str,
    round_dp: int = 6,
) -> DataFrame:
    """(n_groups, n_entities, mean_value, theil_total, theil_within,
    theil_between, between_share) — Theil T inequality index
    (Theil 1967) with its EXACT additive decomposition
    T = T_within + T_between over the `dim_col` partition: the
    property Gini lacks (value_concentration's Gini says HOW unequal;
    this says WHERE the inequality lives — inside segments or
    between their means).

        T       = (Σ x·ln x)/(N·μ) − ln μ          (entities x > 0)
        T_g     = (Σ_g x·ln x)/(n_g·μ_g) − ln μ_g
        within  = Σ_g s_g·T_g,  between = Σ_g s_g·ln(μ_g/μ),
        s_g     = n_g·μ_g / (N·μ)   (value share)

    Zero/negative/NULL values are excluded (ln domain — the standard
    Theil convention), counted nowhere. Scale shape: ONE map-side
    aggregate to (dim, n, Σx, Σx·ln x) rows; every cross-group float
    reduction is a dim-ordered left fold (the ab_post_stratified
    discipline), so both engines associate identically; ln runs on
    data in the entity pass (rounded outputs, the kn_perplexity
    precedent)."""
    v = F.col(value_col).cast("double")
    base = df.filter(v.isNotNull() & (v > 0)) \
        .select(F.coalesce(F.col(dim_col).cast("string"),
                           F.lit("∅")).alias("__g"),
                v.alias("__x"))
    per_g = (base.groupBy("__g")
             .agg(F.count("*").alias("n"),
                  F.sum("__x").alias("sx"),
                  F.sum(F.col("__x") * F.log(F.col("__x")))
                  .alias("sxl")))
    term = F.struct(F.col("__g"), F.col("n").cast("double")
                    .alias("nd"), F.col("sx"), F.col("sxl"))
    # single-field folds for the totals (the documented DuckDB
    # list_reduce constraint keeps the twin single-field; the Spark
    # side mirrors so the association chains match term-for-term)
    one = (per_g.withColumn("__term", term)
           .agg(F.count("*").alias("n_groups"),
                F.sum("n").alias("n_entities"),
                F.expr("aggregate(array_sort(collect_list(__term)),"
                       " CAST(0.0 AS DOUBLE),"
                       " (acc, x) -> acc + x.sx)").alias("tsx"),
                F.expr("aggregate(array_sort(collect_list(__term)),"
                       " CAST(0.0 AS DOUBLE),"
                       " (acc, x) -> acc + x.sxl)").alias("tsxl"),
                F.expr("array_sort(collect_list(__term))")
                .alias("gs")))
    nd = F.col("n_entities").cast("double")
    mu = F.col("tsx") / nd
    t_total = F.col("tsxl") / (nd * mu) - F.log(mu)
    # within/between: dim-ordered folds over the bounded group list,
    # every subexpression spelled once and reused by both engines
    within = F.expr(
        "aggregate(gs, CAST(0.0 AS DOUBLE), (acc, g) -> acc"
        " + (g.sx / tsx)"
        "   * (g.sxl / (g.nd * (g.sx / g.nd)) - ln(g.sx / g.nd)))")
    between = F.expr(
        "aggregate(gs, CAST(0.0 AS DOUBLE), (acc, g) -> acc"
        " + (g.sx / tsx) * ln((g.sx / g.nd)"
        " / (tsx / CAST(n_entities AS DOUBLE))))")
    # Degenerate-input guard (ADVICE r12): with zero surviving groups
    # the Spark fold over the empty gs array would return its 0.0
    # seed while the DuckDB twin's list_reduce over an empty list
    # yields NULL — gate both folds on n_groups > 0 so the engines
    # agree that fully-degenerate input (all values NULL/non-positive)
    # has NO defined decomposition.
    has_groups = F.col("n_groups") > 0
    return one.select(
        "n_groups",
        F.col("n_entities").cast("long").alias("n_entities"),
        dround(mu, round_dp).alias("mean_value"),
        (dround(t_total, round_dp) + F.lit(0.0)).alias("theil_total"),
        (dround(F.when(has_groups, within), round_dp)
         + F.lit(0.0)).alias("theil_within"),
        (dround(F.when(has_groups, between), round_dp)
         + F.lit(0.0)).alias("theil_between"),
        dround(F.when(t_total > 0, between / t_total), round_dp)
        .alias("between_share"))


def theil_decomposition_sql(
    table: str,
    value_col: str,
    dim_col: str,
    round_dp: int = 6,
) -> str:
    """DuckDB twin of theil_decomposition (same per-group sufficient
    sums, same dim-ordered single-field list_reduce folds — the
    multi-field struct fold is avoided on both sides for the
    documented DuckDB 1.0.0 reason; sx and sxl fold separately)."""
    v = f"CAST({value_col} AS DOUBLE)"
    return f"""
WITH base AS (
  SELECT coalesce(CAST({dim_col} AS VARCHAR), '∅') AS g,
         {v} AS x
  FROM {table} WHERE {value_col} IS NOT NULL AND {v} > 0
),
per_g AS (
  SELECT g, count(*) AS n, sum(x) AS sx, sum(x * ln(x)) AS sxl
  FROM base GROUP BY g
),
one AS (
  SELECT count(*) AS n_groups, sum(n) AS n_entities,
         list_reduce(list(sx ORDER BY g), (a, b) -> a + b) AS tsx,
         list_reduce(list(sxl ORDER BY g), (a, b) -> a + b) AS tsxl,
         list({{'g': g, 'nd': CAST(n AS DOUBLE), 'sx': sx,
                'sxl': sxl}} ORDER BY g) AS gs
  FROM per_g
),
calc AS (
  SELECT *,
         CAST(n_entities AS DOUBLE) AS nd,
         tsx / CAST(n_entities AS DOUBLE) AS mu
  FROM one
)
SELECT n_groups,
       CAST(n_entities AS BIGINT) AS n_entities,
       round(mu, {round_dp}) AS mean_value,
       round(tsxl / (nd * mu) - ln(mu), {round_dp}) + 0.0
         AS theil_total,
       round(list_reduce(
         list_transform(gs, g -> (g.sx / tsx)
           * (g.sxl / (g.nd * (g.sx / g.nd)) - ln(g.sx / g.nd))),
         (a, b) -> a + b), {round_dp}) + 0.0 AS theil_within,
       round(list_reduce(
         list_transform(gs, g -> (g.sx / tsx)
           * ln((g.sx / g.nd) / (tsx / nd))),
         (a, b) -> a + b), {round_dp}) + 0.0 AS theil_between,
       round(CASE WHEN tsxl / (nd * mu) - ln(mu) > 0
                  THEN list_reduce(
                    list_transform(gs, g -> (g.sx / tsx)
                      * ln((g.sx / g.nd) / (tsx / nd))),
                    (a, b) -> a + b)
                    / (tsxl / (nd * mu) - ln(mu)) END, {round_dp})
         AS between_share
FROM calc
"""
