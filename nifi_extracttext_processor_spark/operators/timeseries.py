"""Regular-grid time-series repair: per-key time spine + gap fill
(zero / LOCF / linear interpolation) — the resample-and-fill step
every metrics pipeline runs between raw events and models or
dashboards (pandas `resample().interpolate()`, TimescaleDB
`time_bucket_gapfill`, InfluxDB `fill()`).

Input contract: ONE row per (key, bucket) — i.e. the caller has
already bucket-aggregated (a plain groupBy; this module deliberately
does not wrap it). `gap_fill` then:

  1. derives each key's observed [min, max] bucket range (one
     partial-aggregatable groupBy),
  2. explodes the per-key spine (`sequence` of epoch seconds — the
     only row-generating stage, bounded by `max_buckets_per_key`
     with a fail-closed raise_error: a single rogue key spanning
     decades at 1 s step would otherwise detonate a billion-element
     array inside one task),
  3. left-joins observations onto the spine (keyed shuffle),
  4. fills per column: "zero" (coalesce to a constant), "locf"
     (last non-null over the key's time order), "linear"
     (interpolate between the straddling observations, round-6).

Because the spine is bounded by each key's OWN observed min/max
(no extrapolation), every gap is interior: LOCF always has a
predecessor and linear always has both neighbours — no edge-null
semantics to special-case, in either engine.

Cost at scale: one groupBy on the keys, one explode proportional to
the OUTPUT row count, one keyed join, one window (single sort serves
both the backward and forward fills). Skew note: a key's whole
window sorts in one task — for a key × years × 1 s step regime,
pre-split the time axis like sessionize_bucketed does; the guard
makes that failure mode loud instead of mysterious.

DuckDB twin (gap_fill_sql): range()/unnest spine, the same
last_value/first_value IGNORE NULLS fills, make_timestamp buckets —
replays value-exactly including the round-6 interpolation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from .rounding import dround


_MODES = ("zero", "locf", "linear")


def gap_fill(
    df: DataFrame,
    ts_col: str,
    key_cols: list[str] | tuple[str, ...],
    step: int,
    fill: dict[str, str],
    max_buckets_per_key: int = 10_000_000,
) -> DataFrame:
    """Insert missing (key, bucket) rows on a `step`-second grid
    between each key's first and last observed bucket and fill the
    columns named in `fill` ({column: "zero"|"locf"|"linear"}).
    Returns (*key_cols, ts_col, *fill-columns); buckets already
    observed keep their values. `ts_col` values must lie ON the grid
    (be bucket starts); linear output is round-6 double."""
    keys = list(key_cols)
    if not keys:
        raise ValueError("gap_fill needs at least one key column")
    if step <= 0:
        raise ValueError("step must be positive seconds")
    bad = {m for m in fill.values()} - set(_MODES)
    if bad:
        raise ValueError(f"unknown fill mode(s) {sorted(bad)}; "
                         f"pick from {_MODES}")
    vals = list(fill)
    from .sessions import epoch_seconds
    d = df.select(*keys, epoch_seconds(df, ts_col).alias("__e"),
                  *[F.col(c) for c in vals])
    rng = d.groupBy(*keys).agg(F.min("__e").alias("__lo"),
                               F.max("__e").alias("__hi"))
    n = ((F.col("__hi") - F.col("__lo")) / step + 1).cast("long")
    # the guard is folded INTO the sequence's lower bound (a pruned
    # side-channel column would be optimized away and never evaluate)
    lo_guarded = F.when(
        n > max_buckets_per_key,
        F.raise_error(F.concat(
            F.lit(f"gap_fill: key would emit more than "
                  f"{max_buckets_per_key} buckets at step={step}s "
                  f"(range "),
            F.col("__lo"), F.lit(".."), F.col("__hi"),
            F.lit("); pre-split the time axis or raise "
                  "max_buckets_per_key"))).cast("long")
    ).otherwise(F.col("__lo"))
    spine = rng.select(*keys, F.explode(
        F.sequence(lo_guarded, F.col("__hi"), F.lit(step))).alias("__e"))
    out = spine.join(d, keys + ["__e"], "left")
    w = Window.partitionBy(*keys).orderBy("__e")
    wf = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    cols = []
    for c in vals:
        mode = fill[c]
        if mode == "zero":
            cols.append(F.coalesce(F.col(c), F.lit(0)).alias(c))
        elif mode == "locf":
            cols.append(F.last(c, ignorenulls=True).over(w).alias(c))
        else:  # linear
            v = F.col(c).cast("double")
            pv = F.last(F.when(v.isNotNull(), v), True).over(w)
            pt = F.last(F.when(v.isNotNull(), F.col("__e")),
                        True).over(w)
            nv = F.first(F.when(v.isNotNull(), v), True).over(wf)
            nt = F.first(F.when(v.isNotNull(), F.col("__e")),
                         True).over(wf)
            interp = pv + (nv - pv) * (F.col("__e") - pt) / (nt - pt)
            cols.append(dround(F.when(v.isNotNull(), v)
                                .otherwise(interp), 6).alias(c))
    return out.select(*keys,
                      F.timestamp_seconds("__e").alias(ts_col),
                      *cols)


def gap_fill_sql(
    table: str,
    ts_col: str,
    key_cols: list[str] | tuple[str, ...],
    step: int,
    fill: dict[str, str],
) -> str:
    """DuckDB twin of gap_fill (same spine, same fills, same round-6
    interpolation; buckets come back as TIMESTAMP via
    make_timestamp)."""
    keys = ", ".join(key_cols)
    vals = list(fill)
    vsel = ", ".join(vals)
    outs = []
    for c in vals:
        mode = fill[c]
        if mode == "zero":
            outs.append(f"coalesce({c}, 0) AS {c}")
        elif mode == "locf":
            outs.append(
                f"last_value({c} IGNORE NULLS) OVER w_b AS {c}")
        else:
            pv = f"last_value({c}::DOUBLE IGNORE NULLS) OVER w_b"
            pt = (f"last_value(CASE WHEN {c} IS NOT NULL THEN e END "
                  f"IGNORE NULLS) OVER w_b")
            nv = f"first_value({c}::DOUBLE IGNORE NULLS) OVER w_f"
            nt = (f"first_value(CASE WHEN {c} IS NOT NULL THEN e END "
                  f"IGNORE NULLS) OVER w_f")
            outs.append(
                f"round(CASE WHEN {c} IS NOT NULL THEN {c}::DOUBLE "
                f"ELSE ({pv}) + (({nv}) - ({pv})) * (e - ({pt})) "
                f"/ (({nt}) - ({pt})) END, 6) AS {c}")
    osel = ", ".join(outs)
    return f"""
WITH b AS (
  SELECT {keys}, (epoch({ts_col}))::BIGINT AS e, {vsel} FROM {table}
),
r AS (
  SELECT {keys}, min(e) AS lo, max(e) AS hi FROM b GROUP BY {keys}
),
s AS (
  SELECT {keys}, unnest(range(lo, hi + 1, {step})) AS e FROM r
),
j AS (
  SELECT s.*, {', '.join(f'b.{c}' for c in vals)}
  FROM s LEFT JOIN b USING ({keys}, e)
)
SELECT {keys}, make_timestamp(e * 1000000) AS {ts_col}, {osel}
FROM j
WINDOW
  w_b AS (PARTITION BY {keys} ORDER BY e
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
  w_f AS (PARTITION BY {keys} ORDER BY e
          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
"""


def detect_anomalies_rolling(
    df: DataFrame,
    ts_col: str,
    key_cols: list[str] | tuple[str, ...],
    value_col: str,
    n: int,
    threshold: float = 3.0,
    min_periods: int | None = None,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Trailing-window z-score anomaly detection per key: each point
    is standardized against the mean/stddev of the `n` rows strictly
    BEFORE it (the point never contaminates its own reference — a
    10σ spike would otherwise inflate the window stddev and halve
    its own score). The pointwise complement to detect_changepoints:
    CUSUM finds sustained LEVEL shifts, this flags individual
    outliers against recent local behaviour.

    Output: (*key_cols, [tiebreak_col], ts_col, value_col,
    roll_mean, roll_std, zscore, is_anomaly). `zscore` is NULL (and
    `is_anomaly` false) during warm-up (< `min_periods` non-null
    predecessors, default n), when the trailing stddev is 0 (a
    constant reference cannot standardize — the CUSUM σ=0 posture),
    and for NULL values. Population stddev + round-6 so the DuckDB
    twin replays bit-for-bit. Pass `tiebreak_col` when timestamps
    can repeat within a key (a ROWS frame over a tied sort is
    otherwise order-ambiguous between engines).

    Cost at scale: ONE keyed sort serves every frame — all four
    rolling aggregates share the identical (PARTITION BY keys ORDER
    BY ts ROWS n PRECEDING..1 PRECEDING) window, so Catalyst plans a
    single Window node after one Exchange+Sort; no join, no second
    pass, output rows = input rows. Skew note: one key sorts in one
    task — pre-split the time axis for a single-key firehose."""
    keys = list(key_cols)
    if not keys:
        raise ValueError("detect_anomalies_rolling needs a key column")
    if n < 2:
        raise ValueError("window n must be >= 2")
    mp = n if min_periods is None else min_periods
    if not 2 <= mp <= n:
        raise ValueError("min_periods must be in [2, n]")
    order = [ts_col] + ([tiebreak_col] if tiebreak_col else [])
    w = (Window.partitionBy(*keys).orderBy(*order)
         .rowsBetween(-n, -1))
    v = F.col(value_col).cast("double")
    cnt = F.count(value_col).over(w)
    mean = F.avg(value_col).over(w)
    sd = F.stddev_pop(value_col).over(w)
    z = F.when((cnt >= mp) & (sd > 0) & v.isNotNull(),
               dround((v - mean) / sd, 6) + F.lit(0.0))
    tb = [tiebreak_col] if tiebreak_col else []
    return df.select(
        *keys, *tb, ts_col, value_col,
        F.when(cnt >= mp, dround(mean, 6)).alias("roll_mean"),
        F.when(cnt >= mp, dround(sd, 6)).alias("roll_std"),
        z.alias("zscore"),
        F.coalesce(F.abs(z) > threshold, F.lit(False))
        .alias("is_anomaly"))


def detect_anomalies_rolling_sql(
    table: str,
    ts_col: str,
    key_cols: list[str] | tuple[str, ...],
    value_col: str,
    n: int,
    threshold: float = 3.0,
    min_periods: int | None = None,
    tiebreak_col: str | None = None,
) -> str:
    """DuckDB twin of detect_anomalies_rolling (same strictly-prior
    ROWS frame, population stddev, round-6, warm-up/zero-σ NULLs)."""
    keys = ", ".join(key_cols)
    mp = n if min_periods is None else min_periods
    order = ts_col + (f", {tiebreak_col}" if tiebreak_col else "")
    tb_sel = f"{tiebreak_col}, " if tiebreak_col else ""
    return f"""
WITH r AS (
  SELECT {keys}, {tb_sel}{ts_col}, {value_col},
         count({value_col}) OVER w AS c,
         avg({value_col}) OVER w AS m,
         stddev_pop({value_col}) OVER w AS sd
  FROM {table}
  WINDOW w AS (PARTITION BY {keys} ORDER BY {order}
               ROWS BETWEEN {n} PRECEDING AND 1 PRECEDING)
)
SELECT {keys}, {tb_sel}{ts_col}, {value_col},
       CASE WHEN c >= {mp} THEN round(m, 6) END AS roll_mean,
       CASE WHEN c >= {mp} THEN round(sd, 6) END AS roll_std,
       CASE WHEN c >= {mp} AND sd > 0 AND {value_col} IS NOT NULL
            THEN round(({value_col}::DOUBLE - m) / sd, 6)
       END + 0.0 AS zscore,
       coalesce(abs(CASE WHEN c >= {mp} AND sd > 0
                              AND {value_col} IS NOT NULL
                         THEN round(({value_col}::DOUBLE - m) / sd, 6)
                    END) > {threshold}, false) AS is_anomaly
FROM r
"""


def detect_anomalies_mad(
    df: DataFrame,
    key_cols: list[str] | tuple[str, ...],
    value_col: str,
    threshold: float = 3.5,
    exact: bool = True,
    accuracy: int = 10_000,
) -> DataFrame:
    """Robust per-key outlier detection via the modified z-score
    (Iglewicz & Hoaglin 1993): M = 0.6745·(x − median) / MAD, where
    MAD = median(|x − median|). Median/MAD shrug off the very
    outliers they are hunting — a mean/stddev z-score lets one
    10⁶-valued row inflate σ until nothing (including itself)
    clears the threshold; the breakdown point of the median is 50%.
    The batch whole-distribution complement to the rolling detector.

    Output: (*input columns, mad_z, is_anomaly). `mad_z` is NULL
    (not flagged) when MAD = 0 (≥half the key's mass sits on one
    value — the σ=0 posture) or the value is NULL.

    Two aggregation passes by necessity (MAD is a median OF
    deviations from a median — not one-pass decomposable), but both
    stats frames are ≤ #keys rows and join back BROADCAST: the data
    never shuffles, each pass is a scan + tiny agg. `exact=True`
    uses Spark's interpolating `percentile` (replayed exactly by
    DuckDB's quantile_cont — the profile_quantiles precedent);
    `exact=False` swaps in the mergeable Greenwald-Khanna
    approx_percentile for the 100 TB path (no oracle twin — sketch
    internals differ across engines)."""
    keys = list(key_cols)
    if not keys:
        raise ValueError("detect_anomalies_mad needs a key column")
    v = F.col(value_col).cast("double")
    if exact:
        med_agg = F.expr(f"percentile({value_col}, 0.5)")
    else:
        med_agg = F.expr(
            f"approx_percentile({value_col}, 0.5, {accuracy})")
    med = df.groupBy(*keys).agg(med_agg.alias("__med"))
    d = df.join(F.broadcast(med), keys)
    dev = F.abs(v - F.col("__med"))
    if exact:
        mad_agg = F.expr("percentile(__dev, 0.5)")
    else:
        mad_agg = F.expr(f"approx_percentile(__dev, 0.5, {accuracy})")
    mad = (d.select(*keys, dev.alias("__dev"))
           .groupBy(*keys).agg(mad_agg.alias("__mad")))
    out = d.join(F.broadcast(mad), keys)
    mz = F.when((F.col("__mad") > 0) & v.isNotNull(),
                dround(0.6745 * (v - F.col("__med"))
                        / F.col("__mad"), 6))
    return (out.withColumn("mad_z", mz)
            .withColumn("is_anomaly",
                        F.coalesce(F.abs(mz) > threshold,
                                   F.lit(False)))
            .drop("__med", "__mad"))


def detect_anomalies_mad_sql(
    table: str,
    key_cols: list[str] | tuple[str, ...],
    value_col: str,
    threshold: float = 3.5,
) -> str:
    """DuckDB twin of detect_anomalies_mad (exact path only:
    quantile_cont ≡ Spark's interpolating percentile, round-6)."""
    keys = ", ".join(key_cols)
    return f"""
WITH med AS (
  SELECT {keys}, quantile_cont({value_col}, 0.5) AS md
  FROM {table} GROUP BY {keys}
),
j AS (
  SELECT t.*, med.md FROM {table} t JOIN med USING ({keys})
),
mad AS (
  SELECT {keys},
         quantile_cont(abs({value_col}::DOUBLE - md), 0.5) AS mad
  FROM j GROUP BY {keys}
),
s AS (
  SELECT j.*, mad.mad FROM j JOIN mad USING ({keys})
)
SELECT * EXCLUDE (md, mad),
       CASE WHEN mad > 0 AND {value_col} IS NOT NULL
            THEN round(0.6745 * ({value_col}::DOUBLE - md) / mad, 6)
       END AS mad_z,
       coalesce(abs(CASE WHEN mad > 0 AND {value_col} IS NOT NULL
                         THEN round(0.6745 * ({value_col}::DOUBLE - md)
                                    / mad, 6)
                    END) > {threshold}, false) AS is_anomaly
FROM s
"""


def detect_changepoints(
    df: DataFrame,
    ts_col: str,
    key_cols: list[str] | tuple[str, ...],
    value_col: str,
    threshold: float = 5.0,
    drift: float = 0.5,
    tiebreak_col: str | None = None,
    baseline_n: int | None = None,
) -> DataFrame:
    """Two-sided CUSUM change detection (Page 1954) per key over a
    time-ordered series: flags the points where the standardized
    cumulative deviation from the key's mean exceeds `threshold`
    (in σ units; `drift` is the usual slack that absorbs noise).

    The textbook recursion S⁺ᵢ = max(0, S⁺ᵢ₋₁ + dᵢ) looks
    iterative, but max-0-clamped cumulation equals
    Cᵢ − min(0, minⱼ≤ᵢ Cⱼ) over the running sum Cᵢ = Σdⱼ — the
    min must include the EMPTY prefix C₀ = 0 (hence the min(0, ·)),
    or a series that deviates from its reference from the very first
    row under-reports by the first sample's deviation. So the whole
    chart is TWO ordinary window functions over one sort, no UDF,
    no fold: Catalyst and the DuckDB twin replay it exactly
    (round-6), and a pure-Python textbook-recursion oracle test
    pins the identity.

    Output: (*key_cols, ts_col, value_col, cusum_pos, cusum_neg,
    is_change). Reference μ/σ default to the key's own FULL-series
    moments (offline CUSUM — note a step series then deviates from
    the global mean on BOTH sides from t=0, which is the correct
    reading of that reference); pass `baseline_n` to take the
    reference from each key's first n points instead (the
    monitoring setup: quiet during the baseline, fire after the
    shift). Population σ (stddev_pop) so both engines agree.
    Keys with σ = 0 (constant series) flag nothing. Pass
    `tiebreak_col` when timestamps can repeat within a key — a ROWS
    running sum over a tied sort is otherwise order-ambiguous and
    the twin may disagree."""
    keys = list(key_cols)
    if not keys:
        raise ValueError("detect_changepoints needs a key column")
    # r16: reference mu/sd from EXACT-integer sufficient statistics
    # on the 1e6 grid (the pettitt/cusum discipline). avg/stddev_pop
    # over raw doubles accumulate in engine-specific partial-agg
    # order; the resulting ulp noise in mu/sd straddled a round-6
    # presentation boundary at sf1 (3.57751 vs 3.57752 — caught by
    # the 10x-scale battery). With (n, Σyq, Σyq²) exact on both
    # engines, the closing mu/sd/z chain is the identical IEEE
    # sequence and the running sums consume identical doubles.
    yq = F.round(F.col(value_col).cast("double")
                 * 1e6).cast("decimal(38,0)")
    base = df.withColumn("__yq", yq)
    ref = base
    if baseline_n is not None:
        if baseline_n < 2:
            raise ValueError("baseline_n must be >= 2")
        worder = [ts_col] + ([tiebreak_col] if tiebreak_col else [])
        wrn = Window.partitionBy(*keys).orderBy(*worder)
        ref = (base.withColumn("__rn", F.row_number().over(wrn))
               .filter(F.col("__rn") <= baseline_n))
    stats = (ref.groupBy(*keys)
             .agg(F.count(F.col("__yq")).alias("__n"),
                  F.sum("__yq").alias("__s1"),
                  F.sum(F.col("__yq") * F.col("__yq")).alias("__s2")))
    d = base.join(stats, keys)
    nd = F.col("__n").cast("double")
    varnum = (F.col("__n").cast("decimal(38,0)") * F.col("__s2")
              - F.col("__s1") * F.col("__s1"))
    mu6 = F.col("__s1").cast("double") / nd
    sd6 = F.sqrt(varnum.cast("double")) / nd
    z = F.when(varnum > 0,
               (F.col("__yq").cast("double") - mu6) / sd6
               ).otherwise(F.lit(0.0))
    order = [ts_col] + ([tiebreak_col] if tiebreak_col else [])
    w = (Window.partitionBy(*keys).orderBy(*order)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    # two projections: window functions cannot nest, so the running
    # sums materialize as columns before the running min/max over
    # them (same sort both times — one Window node after Catalyst
    # collapses the projections)
    tb = [tiebreak_col] if tiebreak_col else []
    # r16: cumulate on the exact 1e-6 z-grid, not on doubles. A
    # double running sum is engine-order-sensitive (Spark streams the
    # frame sequentially, DuckDB may tree-combine) and the drift
    # GROWS with series length — at sf1 (~400k rows/key) the two
    # engines' cusum_neg diverged by 1e-5. Integer accumulation is
    # exact and associative, so the chart is bit-stable at ANY
    # length; each z carries <= 5e-7 quantization, which is noise at
    # the sigma scale the threshold reads.
    driftq = int(round(float(drift) * 1e6))
    zq = F.round(z * 1e6).cast("decimal(38,0)")
    dq = F.lit(driftq).cast("decimal(38,0)")
    zero = F.lit(0).cast("decimal(38,0)")
    cums = d.select(*keys, ts_col, value_col, *tb,
                    F.sum(zq - dq).over(w).alias("__cp"),
                    F.sum(zq + dq).over(w).alias("__cn"))
    # include the empty prefix C0 = 0 in the running extremum:
    # S+ = C - min(0, min C), S- = max(0, max C) - C
    pos = dround(
        (F.col("__cp") - F.least(F.min("__cp").over(w), zero))
        .cast("double") / 1e6, 6)
    neg = dround(
        (F.greatest(F.max("__cn").over(w), zero) - F.col("__cn"))
        .cast("double") / 1e6, 6)
    return (cums.select(*keys, ts_col, value_col,
                        pos.alias("cusum_pos"), neg.alias("cusum_neg"))
            .withColumn("is_change",
                        (F.col("cusum_pos") > threshold)
                        | (F.col("cusum_neg") > threshold)))


def detect_changepoints_sql(
    table: str,
    ts_col: str,
    key_cols: list[str] | tuple[str, ...],
    value_col: str,
    threshold: float = 5.0,
    drift: float = 0.5,
    tiebreak_col: str | None = None,
    baseline_n: int | None = None,
) -> str:
    """DuckDB twin of detect_changepoints (same windows, same
    round-6, same exact-integer (n, Σyq, Σyq²) reference on the 1e6
    grid — see the operator's r16 note; a raw-double stddev_pop
    accumulates in engine-specific order)."""
    driftq = int(round(float(drift) * 1e6))
    keys = ", ".join(key_cols)
    order = ts_col + (f", {tiebreak_col}" if tiebreak_col else "")
    tb_sel = f" {tiebreak_col}," if tiebreak_col else ""
    if baseline_n is None:
        ref = "b"
    else:
        ref = (f"(SELECT * FROM (SELECT *, row_number() OVER "
               f"(PARTITION BY {keys} ORDER BY {order}) AS __rn "
               f"FROM b) WHERE __rn <= {baseline_n})")
    return f"""
WITH b AS (
  SELECT *, CAST(round(CAST({value_col} AS DOUBLE) * 1e6) AS HUGEINT)
              AS __yq
  FROM {table}
),
st AS (
  SELECT {keys}, count(__yq) AS n,
         sum(__yq) AS s1, sum(__yq * __yq) AS s2
  FROM {ref} GROUP BY {keys}
),
s AS (
  SELECT t.*, st.n, st.s1, st.s2
  FROM b t JOIN st USING ({keys})
),
z AS (
  SELECT {keys}, {ts_col}, {value_col},{tb_sel}
         CASE WHEN (n * s2 - s1 * s1) > 0
              THEN (CAST(__yq AS DOUBLE)
                    - CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                   / (sqrt(CAST(n * s2 - s1 * s1 AS DOUBLE))
                      / CAST(n AS DOUBLE))
              ELSE 0.0 END AS zv
  FROM s
),
-- r16: cumulate EXACT integers on the 1e-6 z-grid (see operator
-- note) — a double running sum tree-combines here but streams in
-- Spark, diverging at long series
cs AS (
  SELECT {keys}, {ts_col}, {value_col},{tb_sel}
         sum(CAST(round(zv * 1e6) AS HUGEINT) - {driftq}) OVER w
           AS cp,
         sum(CAST(round(zv * 1e6) AS HUGEINT) + {driftq}) OVER w
           AS cn
  FROM z
  WINDOW w AS (PARTITION BY {keys} ORDER BY {order}
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
c AS (
  SELECT {keys}, {ts_col}, {value_col}, cp, cn,
         min(cp) OVER w AS mincp,
         max(cn) OVER w AS maxcn
  FROM cs
  WINDOW w AS (PARTITION BY {keys} ORDER BY {order}
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT {keys}, {ts_col}, {value_col},
       round(CAST(cp - least(mincp, 0) AS DOUBLE) / 1e6, 6)
         AS cusum_pos,
       round(CAST(greatest(maxcn, 0) - cn AS DOUBLE) / 1e6, 6)
         AS cusum_neg,
       (round(CAST(cp - least(mincp, 0) AS DOUBLE) / 1e6, 6)
          > {threshold}
        OR round(CAST(greatest(maxcn, 0) - cn AS DOUBLE) / 1e6, 6)
          > {threshold})
         AS is_change
FROM c
"""



_DECAY_BITS = 24  # bucket ages above 2^24 decay to exactly 0.0


def _decay_constants(factor: float) -> "list[float]":
    """factor^(2^m) for m in [0, _DECAY_BITS) by repeated squaring —
    computed ONCE in Python and embedded as literals, so both engines
    consume identical doubles and never call pow()."""
    out, c = [], float(factor)
    for _ in range(_DECAY_BITS):
        out.append(c)
        c = c * c
    return out


def decayed_agg(
    df: DataFrame,
    as_of: str,
    half_life: str = "7 days",
    bucket_seconds: int = 3600,
    ts_col: str = "ts",
    value_col: str | None = None,
    group_by: "list[str] | None" = None,
    round_dp: int = 4,
) -> DataFrame:
    """Exponentially time-decayed aggregates — the trending-score
    primitive (recency-weighted popularity: an event h half-lives ago
    counts 2^-h): per group, decayed_count = Σ w and, with
    `value_col`, decayed_sum = Σ v·w, where w = factor^age_buckets,
    age quantized to whole `bucket_seconds` buckets (default hourly)
    and factor = 0.5^(bucket/half_life).

    `as_of` is an EXPLICIT literal timestamp (determinism: a
    wall-clock now() would make reruns disagree); rows after as_of or
    with NULL ts are excluded (the future doesn't trend yet).

    Cross-engine exactness — two measures, both found necessary live:
    (1) the weight NEVER calls pow() at runtime (JVM StrictMath and
    libm pow disagree in the last ulp, which drifts a 10^4-term sum
    across round-4 boundaries): factor^b is a fixed left-associated
    product of Python-embedded literals factor^(2^m) over b's set
    bits — IEEE multiplication is exactly specified, so both engines
    produce bit-identical weights; ages ≥ 2^24 buckets weigh exactly
    0.0. (2) each term is quantized to a 1e-6 integer grid and summed
    as exact integers, so summation ORDER cannot move the total.
    One map-side-combinable agg; the weight is a narrow per-row
    expression."""
    gb = list(group_by or [])
    if bucket_seconds < 1:
        raise ValueError("bucket_seconds must be >= 1")
    t0 = F.to_timestamp(F.lit(as_of))
    hl_s = (F.unix_timestamp(t0 + F.expr(f"INTERVAL {half_life}"))
            - F.unix_timestamp(t0))
    # factor needs the half-life in seconds as a Python number: parse
    # via the engine once? No — half_life is a SQL interval string;
    # evaluate its seconds in Python by parsing the simple "N unit"
    # grammar so the factor literal is engine-independent.
    n, unit = half_life.split()
    mult = {"second": 1, "seconds": 1, "minute": 60, "minutes": 60,
            "hour": 3600, "hours": 3600, "day": 86400,
            "days": 86400, "week": 604800, "weeks": 604800}
    if unit.lower() not in mult:
        raise ValueError(f"unsupported half_life unit {unit!r}")
    hl_seconds = float(n) * mult[unit.lower()]
    factor = 0.5 ** (bucket_seconds / hl_seconds)
    consts = _decay_constants(factor)
    del hl_s

    b = F.floor((F.unix_timestamp(t0)
                 - F.unix_timestamp(F.col(ts_col)))
                / F.lit(int(bucket_seconds))).cast("long")
    w = F.lit(1.0)
    for m, c in enumerate(consts):
        w = w * F.when(F.shiftright(b, m).bitwiseAND(1) == 1,
                       F.lit(c)).otherwise(F.lit(1.0))
    w = F.when(b >= F.lit(1 << _DECAY_BITS), F.lit(0.0)).otherwise(w)
    base = df.filter(F.col(ts_col).isNotNull()
                     & (F.col(ts_col) <= t0))

    def q6(term):
        return F.round(term * F.lit(1e6)).cast("decimal(38,0)")

    aggs = [dround(F.sum(q6(w)).cast("double") / F.lit(1e6),
                    round_dp).alias("decayed_count")]
    if value_col is not None:
        aggs.append(dround(
            F.sum(q6(F.col(value_col).cast("double") * w))
            .cast("double") / F.lit(1e6),
            round_dp).alias("decayed_sum"))
    return base.groupBy(*gb).agg(*aggs)


def decayed_agg_sql(
    table: str,
    as_of: str,
    half_life: str = "7 days",
    bucket_seconds: int = 3600,
    ts_col: str = "ts",
    value_col: str | None = None,
    group_by: "list[str] | None" = None,
    round_dp: int = 4,
) -> str:
    """DuckDB twin of decayed_agg: the SAME embedded literal
    constants, the same left-associated bit-product, the same 1e-6
    integer quantization."""
    gb = list(group_by or [])
    gsel = (", ".join(gb) + ", ") if gb else ""
    gkey = ("GROUP BY " + ", ".join(gb)) if gb else ""
    n, unit = half_life.split()
    mult = {"second": 1, "seconds": 1, "minute": 60, "minutes": 60,
            "hour": 3600, "hours": 3600, "day": 86400,
            "days": 86400, "week": 604800, "weeks": 604800}
    hl_seconds = float(n) * mult[unit.lower()]
    factor = 0.5 ** (bucket_seconds / hl_seconds)
    consts = _decay_constants(factor)
    t0 = f"TIMESTAMP '{as_of}'"
    # floor(epoch(ts)): Spark's unix_timestamp truncates fractional
    # seconds, DuckDB's epoch() keeps them — without the floor, rows
    # with sub-second timestamps near an hour boundary land in
    # different buckets per engine (found live at sf0.01)
    b = (f"CAST(floor((floor(epoch({t0})) - floor(epoch({ts_col}))) "
         f"/ {int(bucket_seconds)}) AS BIGINT)")
    # ::DOUBLE on every literal: DuckDB parses bare decimals as
    # DECIMAL and a 24-deep decimal multiplication chain overflows
    # the max scale
    prod = "1.0::DOUBLE"
    for m, c in enumerate(consts):
        prod = (f"({prod} * CASE WHEN (({b} >> {m}) & 1) = 1 "
                f"THEN {c!r}::DOUBLE ELSE 1.0::DOUBLE END)")
    w = (f"CASE WHEN {b} >= {1 << _DECAY_BITS} THEN 0.0 "
         f"ELSE {prod} END")
    mets = [f"round(sum(CAST(round({w} * 1e6) AS HUGEINT))::DOUBLE "
            f"/ 1e6, {round_dp}) AS decayed_count"]
    if value_col is not None:
        mets.append(
            f"round(sum(CAST(round(CAST({value_col} AS DOUBLE) "
            f"* {w} * 1e6) AS HUGEINT))::DOUBLE / 1e6, {round_dp}) "
            "AS decayed_sum")
    return (f"SELECT {gsel}{', '.join(mets)} FROM {table} "
            f"WHERE {ts_col} IS NOT NULL AND {ts_col} <= {t0} "
            f"{gkey}")


def detect_anomalies_seasonal(
    df: DataFrame,
    ts_col: str,
    key_cols: "list[str] | tuple[str, ...]",
    value_col: str,
    threshold: float = 3.0,
    min_periods: int = 4,
    round_dp: int = 4,
) -> DataFrame:
    """Seasonal-baseline anomaly detection — the fourth temporal
    detector beside rolling (trailing window), MAD (robust global)
    and CUSUM (sustained shift): each point is standardized against
    the mean/stddev of OTHER observations in the same
    (key, day-of-week, hour-of-day) cell, so a Tuesday-3am spike is
    judged against Tuesday-3am history, not against the weekly
    average (the diurnal/weekly pattern that makes plain z-scores
    fire every rush hour). Leave-one-out: the point's own value is
    excluded from its cell's baseline (n−1 stats via the sum/sumsq
    identity), so a single huge spike cannot mask itself. Cells with
    fewer than `min_periods` OTHER observations or zero variance emit
    NULL z and are never flagged.

    Scale shape: one map-side-combinable agg to (key, dow, hour)
    cells (≤ keys·168 rows) + one broadcast-joinable merge back —
    data rows never shuffle; leave-one-out is pure arithmetic on the
    cell sums. DuckDB twin replays dayofweek/hour, the identity, and
    rounding exactly."""
    keys = list(key_cols)
    if min_periods < 2:
        raise ValueError("min_periods must be >= 2")
    v = F.col(value_col).cast("double")
    dow = F.dayofweek(F.col(ts_col))
    hod = F.hour(F.col(ts_col))
    base = (df.filter(F.col(ts_col).isNotNull() & v.isNotNull())
            .withColumn("__dow", dow).withColumn("__hod", hod))
    cells = (base.groupBy(*keys, "__dow", "__hod")
             .agg(F.count("*").alias("__n"),
                  F.sum(v).alias("__s"),
                  F.sum(v * v).alias("__ss")))
    j = base.join(F.broadcast(cells), keys + ["__dow", "__hod"])
    n1 = F.col("__n") - 1
    # try_divide: singleton cells (n1 = 0) would raise under ANSI
    # division; NULL is the correct "no baseline" answer
    mean_loo = F.try_divide(F.col("__s") - v, n1)
    # unbiased variance of the OTHER n-1 points:
    # ss' = ss - v^2; var = (ss' - (n-1)*mean^2) / (n-2)
    var_loo = F.try_divide(
        F.col("__ss") - v * v - n1 * mean_loo * mean_loo, n1 - 1)
    sd = F.sqrt(var_loo)
    z = F.when((n1 >= F.lit(int(min_periods))) & (sd > 0),
               (v - mean_loo) / sd)
    return (j.select(*keys, ts_col, value_col,
                     (dround(z, round_dp) + F.lit(0.0)).alias("z"),
                     F.coalesce(F.abs(dround(z, round_dp))
                                >= F.lit(float(threshold)),
                                F.lit(False)).alias("is_anomaly")))


def detect_anomalies_seasonal_sql(
    table: str,
    ts_col: str,
    key_cols: "list[str] | tuple[str, ...]",
    value_col: str,
    threshold: float = 3.0,
    min_periods: int = 4,
    round_dp: int = 4,
) -> str:
    """DuckDB twin of detect_anomalies_seasonal. Note dayofweek
    conventions differ: Spark dayofweek() is 1=Sunday..7=Saturday,
    DuckDB dayofweek() is 0=Sunday..6 — the twin adds 1."""
    keys = ", ".join(key_cols)
    v = f"CAST({value_col} AS DOUBLE)"
    return f"""
WITH base AS (
  SELECT {keys}, {ts_col}, {value_col}, {v} AS v,
         dayofweek({ts_col}) + 1 AS dw, hour({ts_col}) AS hd
  FROM {table}
  WHERE {ts_col} IS NOT NULL AND {value_col} IS NOT NULL
),
cells AS (
  SELECT {keys}, dw, hd, count(*) AS n, sum(v) AS s,
         sum(v * v) AS ss
  FROM base GROUP BY {keys}, dw, hd
),
j AS (
  SELECT b.*, c.n, c.s, c.ss,
         (c.s - b.v) / (c.n - 1) AS m1,
         (c.ss - b.v * b.v
          - (c.n - 1) * ((c.s - b.v) / (c.n - 1))
            * ((c.s - b.v) / (c.n - 1))) / (c.n - 2) AS var1
  FROM base b JOIN cells c USING ({keys}, dw, hd)
)
SELECT {keys}, {ts_col}, {value_col},
       round(CASE WHEN n - 1 >= {int(min_periods)}
                   AND sqrt(var1) > 0
                  THEN (v - m1) / sqrt(var1) END, {round_dp})
         + 0.0 AS z,
       coalesce(abs(round(CASE WHEN n - 1 >= {int(min_periods)}
                           AND sqrt(var1) > 0
                          THEN (v - m1) / sqrt(var1) END,
                    {round_dp})) >= {float(threshold)!r}, FALSE)
         AS is_anomaly
FROM j
"""


def ses_forecast(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    group_by: "list[str] | None" = None,
    alpha: float = 0.3,
    round_dp: int = 4,
) -> DataFrame:
    """(group..., n_periods, last_day, last_y, forecast) — simple
    exponential smoothing (Brown 1956) over the per-day metric sum:
    level_1 = y_1, level_t = α·y_t + (1−α)·level_{t−1}; the emitted
    `forecast` (= final level) is the one-step-ahead prediction for
    the next day.

    Execution shape (the events_km_survival discipline): one
    map-side-combinable groupBy collapses rows to one (group, day)
    tuple — the shuffle carries distinct DAYS, never events; the fold
    then runs over that bounded daily series via Catalyst's
    `aggregate()` higher-order function, seeded with y_1 so it
    left-associates exactly like DuckDB's `list_reduce` (which seeds
    from the first list element). α and 1−α are repr-embedded Python
    doubles, identical in both engines; IEEE ·/+ make the fold
    bit-identical before the final round. DAY-GRAIN CONTRACT: the
    series per group is bounded (~10^3 rows for years of data), so
    collect_list stays small no matter the input size."""
    if not (0 < alpha < 1):
        raise ValueError("alpha must be in (0, 1)")
    gb = list(group_by or [])
    a = repr(float(alpha))
    b = repr(1.0 - float(alpha))
    daily = (df.filter(F.col(value_col).isNotNull())
             .groupBy(*gb, F.to_date(F.col(ts_col)).cast("string")
                      .alias("__d"))
             .agg(F.sum(F.col(value_col).cast("double"))
                  .alias("__y")))
    ser = (daily.groupBy(*gb)
           .agg(F.expr("array_sort(collect_list(struct(__d, __y)))")
                .alias("__s")))
    ys = "transform(__s, x -> x.__y)"
    level = (f"aggregate(slice({ys}, 2, size(__s) - 1), "
             f"CAST(element_at({ys}, 1) AS DOUBLE), "
             f"(acc, x) -> {a} * x + {b} * acc)")
    return ser.select(
        *gb,
        F.expr("size(__s)").cast("long").alias("n_periods"),
        F.expr("element_at(__s, -1).__d").alias("last_day"),
        dround(F.expr("element_at(__s, -1).__y"), round_dp)
        .alias("last_y"),
        dround(F.expr(level), round_dp).alias("forecast"))


def ses_forecast_sql(
    table: str,
    ts_col: str,
    value_col: str,
    group_by: "list[str] | None" = None,
    alpha: float = 0.3,
    round_dp: int = 4,
) -> str:
    """DuckDB twin of ses_forecast (list(y ORDER BY day) +
    list_reduce, which seeds from the first element exactly like the
    Spark side's explicit y_1 seed; identical repr-embedded α)."""
    if not (0 < alpha < 1):
        raise ValueError("alpha must be in (0, 1)")
    gb = list(group_by or [])
    gsel = (", ".join(gb) + ", ") if gb else ""
    gkey = ("GROUP BY " + ", ".join(gb)) if gb else ""
    a = repr(float(alpha))
    b = repr(1.0 - float(alpha))
    return f"""
WITH daily AS (
  SELECT {gsel}strftime({ts_col}, '%Y-%m-%d') AS d,
         sum(CAST({value_col} AS DOUBLE)) AS y
  FROM {table} WHERE {value_col} IS NOT NULL
  GROUP BY {gsel.rstrip(', ') + (',' if gb else '')} strftime({ts_col}, '%Y-%m-%d')
),
ser AS (
  SELECT {gsel}
         list(y ORDER BY d) AS ys,
         max(d) AS last_day,
         count(*) AS n_periods
  FROM daily
  {gkey}
)
SELECT {gsel}n_periods,
       last_day,
       round(ys[len(ys)], {round_dp}) AS last_y,
       round(list_reduce(ys, (acc, x) -> {a} * x + {b} * acc),
             {round_dp}) AS forecast
FROM ser
"""


def lead_lag_corr(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    key_col: str,
    key_a: str,
    key_b: str,
    max_lag: int = 7,
    round_dp: int = 4,
) -> DataFrame:
    """(lag, n_days, corr) — lead/lag cross-correlation between two
    daily series: Pearson corr of series A's day-d sum against series
    B's day-(d+lag) sum, for every lag in [-max_lag, max_lag]. A
    positive-lag peak reads "A leads B by `lag` days".

    Execution shape: rows collapse to one (key, day) tuple FIRST (the
    shuffle carries distinct days, never events); the lag fan-out and
    self-join then run over two bounded daily tables (~10^3 rows for
    years), so the 2L+1 copies are arithmetic on already-tiny data.
    Correlation from integer-free sufficient sums with the n·Σxy form,
    expression-ordered identically in the DuckDB twin."""
    if max_lag < 1:
        raise ValueError("max_lag must be >= 1")
    daily = (df.filter(F.col(key_col).isin(key_a, key_b)
                       & F.col(value_col).isNotNull())
             .groupBy(F.col(key_col).alias("__k"),
                      F.to_date(F.col(ts_col)).alias("__d"))
             .agg(F.sum(F.col(value_col).cast("double"))
                  .alias("__y")))
    a = (daily.filter(F.col("__k") == key_a)
         .select(F.col("__d").alias("da"), F.col("__y").alias("ya")))
    b = (daily.filter(F.col("__k") == key_b)
         .select(F.col("__d").alias("db"), F.col("__y").alias("yb")))
    lags = F.explode(F.sequence(F.lit(-int(max_lag)),
                                F.lit(int(max_lag)))).alias("lag")
    al = a.select("da", "ya", lags)
    j = al.join(b, F.expr("date_add(da, lag) = db"))
    agg = j.groupBy("lag").agg(
        F.count("*").alias("n_days"),
        F.sum("ya").alias("sx"), F.sum("yb").alias("sy"),
        F.sum(F.col("ya") * F.col("ya")).alias("sxx"),
        F.sum(F.col("yb") * F.col("yb")).alias("syy"),
        F.sum(F.col("ya") * F.col("yb")).alias("sxy"))
    n = F.col("n_days").cast("double")
    num = n * F.col("sxy") - F.col("sx") * F.col("sy")
    dx = n * F.col("sxx") - F.col("sx") * F.col("sx")
    dy = n * F.col("syy") - F.col("sy") * F.col("sy")
    den = F.sqrt(dx * dy)
    return (agg.select(
        "lag", "n_days",
        (dround(F.when(den > 0, num / den), round_dp)
         + F.lit(0.0)).alias("corr"))
        .orderBy("lag"))


def lead_lag_corr_sql(
    table: str,
    ts_col: str,
    value_col: str,
    key_col: str,
    key_a: str,
    key_b: str,
    max_lag: int = 7,
    round_dp: int = 4,
) -> str:
    """DuckDB twin of lead_lag_corr (same daily sums, same lag join,
    same n·Σxy correlation expression order)."""
    if max_lag < 1:
        raise ValueError("max_lag must be >= 1")
    from ..sqlutil import sql_lit
    return f"""
WITH daily AS (
  SELECT {key_col} AS k, CAST(date_trunc('day', {ts_col}) AS DATE)
           AS d,
         sum(CAST({value_col} AS DOUBLE)) AS y
  FROM {table}
  WHERE {key_col} IN ({sql_lit(key_a)}, {sql_lit(key_b)})
    AND {value_col} IS NOT NULL
  GROUP BY 1, 2
),
lags AS (SELECT CAST(unnest(range(-{int(max_lag)},
                                    {int(max_lag)} + 1))
                  AS INTEGER) AS lag),
j AS (
  SELECT lags.lag, a.y AS ya, b.y AS yb
  FROM daily a CROSS JOIN lags
  JOIN daily b ON b.k = {sql_lit(key_b)}
              AND b.d = a.d + lags.lag * INTERVAL 1 DAY
  WHERE a.k = {sql_lit(key_a)}
),
agg AS (
  SELECT lag, count(*) AS n_days,
         sum(ya) AS sx, sum(yb) AS sy,
         sum(ya * ya) AS sxx, sum(yb * yb) AS syy,
         sum(ya * yb) AS sxy
  FROM j GROUP BY lag
)
SELECT lag, n_days,
       round(CASE WHEN sqrt((CAST(n_days AS DOUBLE) * sxx - sx * sx)
                            * (CAST(n_days AS DOUBLE) * syy
                               - sy * sy)) > 0
                  THEN (CAST(n_days AS DOUBLE) * sxy - sx * sy)
                       / sqrt((CAST(n_days AS DOUBLE) * sxx - sx * sx)
                              * (CAST(n_days AS DOUBLE) * syy
                                 - sy * sy)) END, {round_dp})
         + 0.0 AS corr
FROM agg
ORDER BY lag
"""


def holt_forecast(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    group_by: "list[str] | None" = None,
    alpha: float = 0.3,
    beta: float = 0.1,
    horizon: int = 1,
    round_dp: int = 4,
) -> DataFrame:
    """(group..., n_periods, last_day, last_y, level, trend,
    forecast) — Holt's linear-trend double exponential smoothing
    (Holt 1957) over the per-day metric sum; `forecast` is the
    `horizon`-step-ahead prediction level + horizon·trend. The
    trend-aware sibling of ses_forecast (which a trending series
    systematically lags).

    Fold contract (both engines replay bit-for-bit): accumulator
    struct {l, b} seeded {y₁, y₂−y₁} and folded from y₂ — processing
    y₂ against that seed lands exactly on the standard init
    (l₂=y₂, b₂=y₂−y₁), so no special-cased second element; a
    single-day series emits level=y₁, trend=0. α, β, 1−α, 1−β are
    repr-embedded; the l' expression inside b' is written
    identically in both engines. Same day-grain bounded-series
    contract as ses_forecast."""
    if not (0 < alpha < 1) or not (0 < beta < 1):
        raise ValueError("alpha and beta must be in (0, 1)")
    if horizon < 1:
        raise ValueError("horizon must be >= 1")
    gb = list(group_by or [])
    a = repr(float(alpha))
    na = repr(1.0 - float(alpha))
    b = repr(float(beta))
    nb = repr(1.0 - float(beta))
    daily = (df.filter(F.col(value_col).isNotNull())
             .groupBy(*gb, F.to_date(F.col(ts_col)).cast("string")
                      .alias("__d"))
             .agg(F.sum(F.col(value_col).cast("double"))
                  .alias("__y")))
    ser = (daily.groupBy(*gb)
           .agg(F.expr("array_sort(collect_list(struct(__d, __y)))")
                .alias("__s")))
    ys = "transform(__s, x -> x.__y)"
    lp = f"{a} * x + {na} * (acc.l + acc.b)"
    fold = (
        f"CASE WHEN size(__s) = 1 THEN "
        f"named_struct('l', CAST(element_at({ys}, 1) AS DOUBLE), "
        f"             'b', CAST(0.0 AS DOUBLE)) "
        f"ELSE aggregate(slice({ys}, 2, size(__s) - 1), "
        f"named_struct('l', CAST(element_at({ys}, 1) AS DOUBLE), "
        f"             'b', CAST(element_at({ys}, 2) "
        f"                       - element_at({ys}, 1) AS DOUBLE)), "
        f"(acc, x) -> named_struct("
        f"  'l', {lp}, "
        f"  'b', {b} * (({lp}) - acc.l) + {nb} * acc.b)) END")
    st = F.expr(fold)
    return ser.select(
        *gb,
        F.expr("size(__s)").cast("long").alias("n_periods"),
        F.expr("element_at(__s, -1).__d").alias("last_day"),
        dround(F.expr("element_at(__s, -1).__y"), round_dp)
        .alias("last_y"),
        dround(st["l"], round_dp).alias("level"),
        (dround(st["b"], round_dp) + F.lit(0.0)).alias("trend"),
        dround(st["l"] + F.lit(float(horizon)) * st["b"], round_dp)
        .alias("forecast"))


def holt_forecast_sql(
    table: str,
    ts_col: str,
    value_col: str,
    group_by: "list[str] | None" = None,
    alpha: float = 0.3,
    beta: float = 0.1,
    horizon: int = 1,
    round_dp: int = 4,
) -> str:
    """DuckDB twin of holt_forecast. NOT a list_reduce fold: DuckDB
    1.0.0 mis-evaluates multi-field struct recurrences inside
    list_reduce (probed live: an accumulator field read in a later
    field's expression can see a freshly-computed value mid-step),
    so the twin steps the same l/b recurrence through a recursive
    CTE keyed by the per-group day index — arithmetic
    expression-identical to the Spark fold, one state row per
    (group, day), the final state joined back at i = n_periods."""
    if not (0 < alpha < 1) or not (0 < beta < 1):
        raise ValueError("alpha and beta must be in (0, 1)")
    if horizon < 1:
        raise ValueError("horizon must be >= 1")
    gb = list(group_by or [])
    gsel = (", ".join(gb) + ", ") if gb else ""
    gkey = ("GROUP BY " + ", ".join(gb)) if gb else ""
    a = repr(float(alpha))
    na = repr(1.0 - float(alpha))
    b = repr(float(beta))
    nb = repr(1.0 - float(beta))
    d1sel = "".join(f"d1.{g}, " for g in gb)
    ssel = "".join(f"s.{g}, " for g in gb)
    fsel = "".join(f"f.{g}, " for g in gb)
    on12 = " AND ".join([f"d2.{g} = d1.{g}" for g in gb]
                        + ["d2.i = 2"])
    onrec = " AND ".join([f"dd.{g} = s.{g}" for g in gb]
                         + ["dd.i = s.i + 1"])
    onn = " AND ".join([f"n.{g} = s.{g}" for g in gb]
                       + ["s.i = n.n_periods"])
    onlast = " AND ".join([f"d3.{g} = f.{g}" for g in gb]
                          + ["d3.i = f.n_periods"])
    part = f"PARTITION BY {', '.join(gb)} " if gb else ""
    lp = f"{a} * dd.y + {na} * (s.l + s.b)"
    return f"""
WITH RECURSIVE daily AS (
  SELECT {gsel}strftime({ts_col}, '%Y-%m-%d') AS d,
         sum(CAST({value_col} AS DOUBLE)) AS y
  FROM {table} WHERE {value_col} IS NOT NULL
  GROUP BY {gsel.rstrip(', ') + (',' if gb else '')} strftime({ts_col}, '%Y-%m-%d')
),
idx AS (
  SELECT *, row_number() OVER ({part}ORDER BY d) AS i FROM daily
),
n AS (
  SELECT {gsel}count(*) AS n_periods, max(d) AS last_day
  FROM daily {gkey}
),
step AS (
  SELECT {d1sel}1 AS i, CAST(d1.y AS DOUBLE) AS l,
         CAST(coalesce(d2.y - d1.y, 0.0) AS DOUBLE) AS b
  FROM idx d1 LEFT JOIN idx d2 ON {on12}
  WHERE d1.i = 1
  UNION ALL
  SELECT {ssel}s.i + 1,
         {lp},
         {b} * (({lp}) - s.l) + {nb} * s.b
  FROM step s JOIN idx dd ON {onrec}
),
fin AS (
  SELECT {ssel}n.n_periods, n.last_day, s.l, s.b
  FROM step s JOIN n ON {onn}
)
SELECT {fsel}CAST(f.n_periods AS BIGINT) AS n_periods, f.last_day,
       round(d3.y, {round_dp}) AS last_y,
       round(f.l, {round_dp}) AS level,
       round(f.b, {round_dp}) + 0.0 AS trend,
       round(f.l + {float(horizon)!r} * f.b, {round_dp}) AS forecast
FROM fin f JOIN idx d3 ON {onlast}
"""


def forecast_backtest(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    group_by: "list[str] | None" = None,
    season: int = 7,
    round_dp: int = 4,
) -> DataFrame:
    """(group..., n_days, n_naive, n_seasonal, mae_naive,
    mae_seasonal, mase) — forecasting-method backtest over the daily
    metric sum: mean absolute error of the naive-1 forecast
    (ŷ_t = y_{t−1}, scored from day 2) vs the seasonal-naive
    forecast (ŷ_t = y_{t−season}, scored from day season+1), and
    their ratio MASE = mae_seasonal / mae_naive (Hyndman & Koehler
    2006's scale-free skill score — < 1 means the seasonal pattern
    carries real signal). The evidence layer under ses/holt_forecast:
    which baseline is this series' forecast actually beating?

    Day-INDEX lags over the observed-days series (a calendar gap
    shifts the index — the standard backtest convention), under the
    bounded daily-table contract of ses_forecast. Each |err| is
    computed expression-identically in both engines; the per-group
    |err| sums run over the tiny daily table and outputs are rounded
    at round_dp (the established float-sum acceptance, re-checked by
    the parity battery at both SFs)."""
    if season < 2:
        raise ValueError("season must be >= 2 (use 1-step naive "
                         "as the baseline)")
    gb = list(group_by or [])
    daily = (df.filter(F.col(value_col).isNotNull())
             .groupBy(*gb, F.to_date(F.col(ts_col)).cast("string")
                      .alias("__d"))
             .agg(F.sum(F.col(value_col).cast("double"))
                  .alias("__y")))
    w = (Window.partitionBy(*gb).orderBy("__d") if gb
         else Window.partitionBy().orderBy("__d"))
    lagged = daily.select(
        *gb, "__d", "__y",
        F.lag("__y", 1).over(w).alias("__p1"),
        F.lag("__y", season).over(w).alias("__ps"))
    e1 = F.abs(F.col("__y") - F.col("__p1"))
    es = F.abs(F.col("__y") - F.col("__ps"))
    agg = (lagged.groupBy(*gb)
           .agg(F.count("*").alias("n_days"),
                F.count("__p1").alias("n_naive"),
                F.count("__ps").alias("n_seasonal"),
                F.sum(e1).alias("s1"),
                F.sum(es).alias("ss")))
    mae1 = F.try_divide(F.col("s1"),
                        F.col("n_naive").cast("double"))
    maes = F.try_divide(F.col("ss"),
                        F.col("n_seasonal").cast("double"))
    return agg.select(
        *gb, "n_days", "n_naive", "n_seasonal",
        dround(mae1, round_dp).alias("mae_naive"),
        dround(maes, round_dp).alias("mae_seasonal"),
        dround(F.when(mae1 > 0, maes / mae1), round_dp)
        .alias("mase"))


def forecast_backtest_sql(
    table: str,
    ts_col: str,
    value_col: str,
    group_by: "list[str] | None" = None,
    season: int = 7,
    round_dp: int = 4,
) -> str:
    """DuckDB twin of forecast_backtest (same day-index lags, same
    |err| expressions, same try_divide guards)."""
    if season < 2:
        raise ValueError("season must be >= 2")
    gb = list(group_by or [])
    gsel = (", ".join(gb) + ", ") if gb else ""
    gkey = ("GROUP BY " + ", ".join(gb)) if gb else ""
    part = f"PARTITION BY {', '.join(gb)} " if gb else ""
    return f"""
WITH daily AS (
  SELECT {gsel}strftime({ts_col}, '%Y-%m-%d') AS d,
         sum(CAST({value_col} AS DOUBLE)) AS y
  FROM {table} WHERE {value_col} IS NOT NULL
  GROUP BY {gsel.rstrip(', ') + (',' if gb else '')} strftime({ts_col}, '%Y-%m-%d')
),
lagged AS (
  SELECT {gsel}d, y,
         lag(y, 1) OVER ({part}ORDER BY d) AS p1,
         lag(y, {int(season)}) OVER ({part}ORDER BY d) AS ps
  FROM daily
),
agg AS (
  SELECT {gsel}count(*) AS n_days, count(p1) AS n_naive,
         count(ps) AS n_seasonal,
         sum(abs(y - p1)) AS s1, sum(abs(y - ps)) AS ss
  FROM lagged
  {gkey}
)
SELECT {gsel}n_days, n_naive, n_seasonal,
       round(s1 / nullif(CAST(n_naive AS DOUBLE), 0), {round_dp})
         AS mae_naive,
       round(ss / nullif(CAST(n_seasonal AS DOUBLE), 0), {round_dp})
         AS mae_seasonal,
       round(CASE WHEN s1 / nullif(CAST(n_naive AS DOUBLE), 0) > 0
                  THEN (ss / nullif(CAST(n_seasonal AS DOUBLE), 0))
                       / (s1 / nullif(CAST(n_naive AS DOUBLE), 0))
             END, {round_dp}) AS mase
FROM agg
"""


def robust_trend(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    group_by: "list[str] | None" = None,
    z_alpha: float = 1.959963984540054,
    round_dp: int = 6,
) -> DataFrame:
    """(group..., n_days, n_pairs, mk_s, mk_z, trend, sen_slope) —
    the distribution-free trend pair over the daily metric sum:
    Mann–Kendall S (Mann 1945; Kendall 1975 — DETECTS a monotone
    trend: Σ over day pairs of sign(y_j − y_i), tie-corrected
    variance, ±1 continuity-corrected z) and the Theil–Sen slope
    (Theil 1950; Sen 1968 — ESTIMATES it: the median of all pairwise
    per-day slopes, robust to the outliers an OLS line chases).
    `trend` ∈ up/down/none at the z_alpha cut; NULL mk_z when the
    variance is zero (all days tied). Groups with fewer than 2
    distinct days have zero pairs and are ABSENT from the output
    (the pair join has nothing to emit for them — same in the
    DuckDB twin), not emitted with NULLs.

    Determinism: daily sums quantize to the 1e-6 grid as exact
    decimals FIRST, so every sign and slope is an exact rational —
    a float daily sum's association order could flip a sign(Δ) tie
    across engines, and S is a discrete statistic rounding cannot
    repair (the topk_turnover lesson applied to signs). The pair
    join is day-bounded: C(n, 2) rows per group over the ≤10³-day
    series (the ses_forecast contract), never event-scale. Median =
    middle element(s) of the sorted slope array, no interpolation
    ambiguity; slopes use calendar datediff so gap days count."""
    gb = list(group_by or [])
    daily = (df.filter(F.col(value_col).isNotNull())
             .groupBy(*gb, F.to_date(F.col(ts_col)).alias("__d"))
             .agg(F.sum(F.round(F.col(value_col).cast("double")
                                * 1e6).cast("decimal(38,0)"))
                  .alias("__yq")))
    a = daily.select(*gb, F.col("__d").alias("da"),
                     F.col("__yq").alias("ya"))
    b = daily.select(*gb, F.col("__d").alias("db"),
                     F.col("__yq").alias("yb"))
    pairs = (a.join(b, gb) if gb else a.crossJoin(b)) \
        .filter(F.col("da") < F.col("db"))
    sgn = F.signum((F.col("yb") - F.col("ya")).cast("double")) \
        .cast("long")
    slope = ((F.col("yb") - F.col("ya")).cast("double") / F.lit(1e6)
             / F.datediff(F.col("db"), F.col("da")).cast("double"))
    pagg = (pairs
            .select(*gb, sgn.alias("__sgn"), slope.alias("__sl"))
            .groupBy(*gb)
            .agg(F.count("*").alias("n_pairs"),
                 F.sum("__sgn").alias("mk_s"),
                 F.expr("array_sort(collect_list(__sl))")
                 .alias("__sls")))
    # tie groups over the daily values (exact decimals)
    ties = (daily.groupBy(*gb, "__yq")
            .agg(F.count("*").alias("t"))
            .groupBy(*gb)
            .agg(F.sum("t").alias("n_days"),
                 F.sum(F.col("t") * (F.col("t") - 1)
                       * (2 * F.col("t") + 5)).alias("tie_term")))
    j = pagg.join(ties, gb) if gb else pagg.crossJoin(ties)
    n = F.col("n_days").cast("double")
    var_s = (n * (n - 1) * (2 * n + 5)
             - F.col("tie_term").cast("double")) / F.lit(18.0)
    s = F.col("mk_s").cast("double")
    z = F.when(
        var_s > 0,
        F.when(F.col("mk_s") > 0, (s - 1) / F.sqrt(var_s))
        .when(F.col("mk_s") < 0, (s + 1) / F.sqrt(var_s))
        .otherwise(F.lit(0.0)))
    zr = dround(z, round_dp) + F.lit(0.0)
    m = F.size("__sls")
    sen = F.when(
        m > 0,
        F.when(m % 2 == 1,
               F.expr("element_at(__sls, CAST((size(__sls) + 1) "
                      "div 2 AS INT))"))
        .otherwise((F.expr("element_at(__sls, "
                           "CAST(size(__sls) div 2 AS INT))")
                    + F.expr("element_at(__sls, CAST(size(__sls) "
                             "div 2 + 1 AS INT))"))
                   / F.lit(2.0)))
    return j.select(
        *gb,
        F.col("n_days").cast("long").alias("n_days"),
        "n_pairs", "mk_s",
        zr.alias("mk_z"),
        F.when(zr >= F.lit(float(z_alpha)), F.lit("up"))
        .when(zr <= F.lit(-float(z_alpha)), F.lit("down"))
        .when(zr.isNotNull(), F.lit("none")).alias("trend"),
        (dround(sen, round_dp) + F.lit(0.0)).alias("sen_slope"))


def robust_trend_sql(
    table: str,
    ts_col: str,
    value_col: str,
    group_by: "list[str] | None" = None,
    z_alpha: float = 1.959963984540054,
    round_dp: int = 6,
) -> str:
    """DuckDB twin of robust_trend (same exact-grid daily decimals,
    same pair signs/slopes, same tie-corrected variance and sorted-
    array median)."""
    gb = list(group_by or [])
    gsel = (", ".join(gb) + ", ") if gb else ""
    gkey = ("GROUP BY " + ", ".join(gb)) if gb else ""
    asel = "".join(f"a.{g}, " for g in gb)
    on = (" AND ".join(f"a.{g} = b.{g}" for g in gb)
          + (" AND " if gb else "")) + "a.d < b.d"
    jon = (" AND ".join(f"p.{g} = t.{g}" for g in gb)
           if gb else "TRUE")
    psel = "".join(f"p.{g}, " for g in gb)
    za = repr(float(z_alpha))
    return f"""
WITH daily AS (
  SELECT {gsel}CAST(date_trunc('day', {ts_col}) AS DATE) AS d,
         sum(CAST(round(CAST({value_col} AS DOUBLE) * 1e6)
                  AS HUGEINT)) AS yq
  FROM {table} WHERE {value_col} IS NOT NULL
  GROUP BY {gsel.rstrip(', ') + (',' if gb else '')} CAST(date_trunc('day', {ts_col}) AS DATE)
),
pairs AS (
  SELECT {asel}
         CAST(sign(CAST(b.yq - a.yq AS DOUBLE)) AS BIGINT) AS sgn,
         CAST(b.yq - a.yq AS DOUBLE) / 1e6
           / CAST(b.d - a.d AS DOUBLE) AS sl
  FROM daily a JOIN daily b ON {on}
),
pagg AS (
  SELECT {gsel}count(*) AS n_pairs,
         CAST(sum(sgn) AS BIGINT) AS mk_s,
         list_sort(list(sl)) AS sls
  FROM pairs
  {gkey}
),
ties AS (
  SELECT {gsel}sum(t) AS n_days,
         sum(t * (t - 1) * (2 * t + 5)) AS tie_term
  FROM (SELECT {gsel}yq, count(*) AS t FROM daily
        GROUP BY {gsel.rstrip(', ') + (',' if gb else '')} yq)
  {gkey}
),
j AS (
  SELECT {psel}p.n_pairs, p.mk_s, p.sls, t.n_days, t.tie_term
  FROM pagg p JOIN ties t ON {jon}
),
calc AS (
  SELECT *,
         (CAST(n_days AS DOUBLE) * (CAST(n_days AS DOUBLE) - 1)
          * (2 * CAST(n_days AS DOUBLE) + 5)
          - CAST(tie_term AS DOUBLE)) / 18.0 AS var_s,
         CAST(mk_s AS DOUBLE) AS sd,
         len(sls) AS m
  FROM j
),
zc AS (
  SELECT *,
         CASE WHEN var_s > 0 THEN
           CASE WHEN mk_s > 0 THEN (sd - 1) / sqrt(var_s)
                WHEN mk_s < 0 THEN (sd + 1) / sqrt(var_s)
                ELSE 0.0 END END AS z,
         CASE WHEN m > 0 THEN
           CASE WHEN m % 2 = 1 THEN sls[(m + 1) // 2]
                ELSE (sls[m // 2] + sls[m // 2 + 1]) / 2.0 END
         END AS sen
  FROM calc
)
SELECT {gsel}
       CAST(n_days AS BIGINT) AS n_days, n_pairs, mk_s,
       round(z, {round_dp}) + 0.0 AS mk_z,
       CASE WHEN round(z, {round_dp}) >= {za} THEN 'up'
            WHEN round(z, {round_dp}) <= -{za} THEN 'down'
            WHEN round(z, {round_dp}) IS NOT NULL THEN 'none'
       END AS trend,
       round(sen, {round_dp}) + 0.0 AS sen_slope
FROM zc
"""


# critical constant for the Pettitt bound at two-sided alpha=0.05:
# -ln(alpha/2) embedded as a literal so neither engine runs a
# transcendental at query time (the abtest z_alpha convention)
_PETTITT_NEG_LN_HALF_ALPHA = {0.05: 3.6888794541139363,
                              0.01: 5.298317366548036,
                              0.10: 2.995732273553991}


def pettitt_test(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    group_by: "list[str] | None" = None,
    alpha: float = 0.05,
) -> DataFrame:
    """(group..., n_days, k_stat, changepoint_day, significant) —
    the Pettitt (1979) nonparametric changepoint test over the daily
    metric sum: a rank-based single-changepoint detector that needs
    no distributional assumption (the CUSUM family's robust sibling,
    exactly as Mann-Kendall is OLS-trend's). U_t = Σ_{i<=t, j>t}
    sign(x_i − x_j); K = max_t |U_t| over the interior split points;
    the changepoint is the last day of the pre-change segment
    (earliest day on K-ties — deterministic). Significance uses the
    standard approximation p ≈ 2·exp(−6K²/(n³+n²)) INVERTED against
    an embedded −ln(α/2) literal: significant ⇔ 6K² ≥ C·(n³+n²), so
    the query runs no transcendental and every emitted quantity is
    an exact INTEGER (the one statistic family where full bit-
    exactness is free).

    Scale shape: day-grain collapse FIRST (quantized exact-decimal
    sums, the robust_trend discipline), then V_t = (#days below) −
    (#days above) from ONE value-ordered rank window (tie-aware:
    V = 2·rank + ties − n − 2) and U_t = the day-ordered prefix sum
    of V — O(n log n) over the ≤10³-day table, never the events."""
    if alpha not in _PETTITT_NEG_LN_HALF_ALPHA:
        raise ValueError(
            f"alpha must be one of "
            f"{sorted(_PETTITT_NEG_LN_HALF_ALPHA)}")
    c = _PETTITT_NEG_LN_HALF_ALPHA[alpha]
    gb = list(group_by or [])
    daily = (df.filter(F.col(value_col).isNotNull())
             .groupBy(*gb, F.to_date(F.col(ts_col)).alias("d"))
             .agg(F.sum(F.round(F.col(value_col).cast("double")
                                * 1e6).cast("decimal(38,0)"))
                  .alias("yq")))
    wg = Window.partitionBy(*gb) if gb else Window.partitionBy()
    wv = wg.orderBy("yq")
    wday = (wg.orderBy("d")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    n = F.count("*").over(wg)
    ties = F.count("*").over(wg.orderBy("yq")
                             .rangeBetween(0, 0))
    v = (F.lit(2) * F.rank().over(wv) + ties - n - F.lit(2)) \
        .cast("long")
    u = F.sum(v).over(wday)
    scored = (daily
              .withColumn("__n", n.cast("long"))
              .withColumn("__u", u)
              .withColumn("__rn", F.row_number().over(wg.orderBy("d")))
              .filter(F.col("__rn") < F.col("__n")))
    best = (scored
            .groupBy(*gb)
            .agg(F.max(F.abs(F.col("__u"))).cast("long")
                 .alias("k_stat"),
                 F.max("__n").alias("__n"),
                 F.min(F.struct(F.abs(F.col("__u")).alias("a"),
                                F.col("d"))).alias("__dummy"),
                 F.max(F.struct(F.abs(F.col("__u")).alias("a"),
                                (F.lit(0) - F.unix_date(F.col("d")))
                                .alias("negd"))).alias("__best"))
            .drop("__dummy"))
    # the argmax day: max over (|U|, -epoch_day) picks the LARGEST
    # |U| and, on ties, the EARLIEST day — one aggregate, no rescan
    nn = F.col("__n").cast("double")
    sig = (F.lit(6.0) * F.col("k_stat").cast("double")
           * F.col("k_stat").cast("double")
           >= F.lit(c) * (nn * nn * nn + nn * nn))
    return best.select(
        *gb,
        F.col("__n").alias("n_days"),
        F.col("k_stat").alias("k_stat"),
        F.date_from_unix_date(F.lit(0)
                              - F.col("__best.negd"))
        .alias("changepoint_day"),
        F.coalesce(sig, F.lit(False)).alias("significant"))


def pettitt_test_sql(
    table: str,
    ts_col: str = "ts",
    value_col: str = "value",
    group_by: "list[str] | None" = None,
    alpha: float = 0.05,
) -> str:
    """DuckDB twin of pettitt_test (same day-grain exact-decimal
    collapse, same tie-aware rank identity, same integer prefix
    sums, same inverted-bound significance — every emitted quantity
    is an exact integer/date, so parity is unconditional)."""
    if alpha not in _PETTITT_NEG_LN_HALF_ALPHA:
        raise ValueError(
            f"alpha must be one of "
            f"{sorted(_PETTITT_NEG_LN_HALF_ALPHA)}")
    c = _PETTITT_NEG_LN_HALF_ALPHA[alpha]
    gb = list(group_by or [])
    gsel = (", ".join(gb) + ", ") if gb else ""
    gkey = ("GROUP BY " + ", ".join(gb)) if gb else ""
    part = ("PARTITION BY " + ", ".join(gb)) if gb else ""
    return f"""
WITH daily AS (
  SELECT {gsel}CAST(date_trunc('day', {ts_col}) AS DATE) AS d,
         sum(CAST(round(CAST({value_col} AS DOUBLE) * 1e6)
                  AS HUGEINT)) AS yq
  FROM {table} WHERE {value_col} IS NOT NULL
  GROUP BY {gsel}CAST(date_trunc('day', {ts_col}) AS DATE)
),
ranked AS (
  SELECT {gsel}d,
         CAST(count(*) OVER ({part}) AS BIGINT) AS n,
         CAST(2 * rank() OVER ({part} ORDER BY yq)
              + count(*) OVER ({part} ORDER BY yq
                               RANGE BETWEEN CURRENT ROW
                               AND CURRENT ROW)
              - count(*) OVER ({part}) - 2 AS BIGINT) AS v
  FROM daily
),
scored AS (
  SELECT {gsel}d, n,
         CAST(sum(v) OVER ({part} ORDER BY d
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) AS BIGINT) AS u,
         row_number() OVER ({part} ORDER BY d) AS rn
  FROM ranked
),
interior AS (
  SELECT {gsel}d, n, abs(u) AS au FROM scored WHERE rn < n
),
best AS (
  SELECT {gsel}CAST(max(au) AS BIGINT) AS k_stat,
         max(n) AS n_days,
         arg_min(d, -au * 1000000000
                    + CAST(d - DATE '1970-01-01' AS BIGINT))
           AS changepoint_day
  FROM interior {gkey}
)
SELECT {gsel}n_days, k_stat, changepoint_day,
       coalesce(6.0 * k_stat::DOUBLE * k_stat::DOUBLE
                >= {c!r} * (n_days::DOUBLE * n_days::DOUBLE
                            * n_days::DOUBLE
                            + n_days::DOUBLE * n_days::DOUBLE),
                FALSE) AS significant
FROM best
"""


# Brownian-bridge sup critical values b(alpha): P(sup|B0(t)| > b) =
# 2 Sigma_k (-1)^{k+1} exp(-2 k^2 b^2) — the same table the KS test
# uses; embedded as literals so the query runs no transcendental.
_CUSUM_CRIT = {0.05: 1.3581015157406195,
               0.01: 1.6276236115189502,
               0.10: 1.2238478702170825}


def cusum_changepoint(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    group_by: "list[str] | None" = None,
    alpha: float = 0.05,
    round_dp: int = 4,
) -> DataFrame:
    """(group..., n_days, cusum_max, changepoint_day, stat,
    significant) — the offline CUSUM mean-shift test over the daily
    metric sum (Page 1954 / the Brownian-bridge sup form): the
    PARAMETRIC sibling of pettitt_test, sensitive to mean level
    shifts where Pettitt's rank statistic is sensitive to general
    distributional shifts. S_t = Σ_{i<=t}(x_i − x̄); the changepoint
    is argmax_t |S_t| (earliest day on ties); the statistic
    standardizes by the series sd:

        stat = max_t |S_t| / (σ̂ · sqrt(n)),   reject ⇔ stat ≥ b(α)

    with b(α) the Brownian-bridge sup quantile (embedded literal —
    no transcendental at query time).

    Exactness (the pettitt discipline): day sums are exact-decimal
    1e6-quantized integers, so n·S_t = n·prefix − t·total is an
    EXACT INTEGER — the argmax, tie-break, and max are unconditional,
    and the two closing divisions + sqrt are ONE spelled double
    chain both engines replay. Scale shape: day-grain collapse
    first; one day-ordered integer prefix window over the bounded
    day table; one aggregate. NULL stat when the series is constant
    (σ̂ = 0). Groups with a SINGLE observed day have no interior
    prefix point (the t < n filter empties them) and are ABSENT
    from the output — not a NULL row (both engines agree); callers
    joining this section back to a group roster should left-join."""
    if alpha not in _CUSUM_CRIT:
        raise ValueError(f"alpha must be one of {sorted(_CUSUM_CRIT)}")
    b = _CUSUM_CRIT[alpha]
    gb = list(group_by or [])
    daily = (df.filter(F.col(value_col).isNotNull())
             .groupBy(*gb, F.to_date(F.col(ts_col)).alias("d"))
             .agg(F.sum(F.round(F.col(value_col).cast("double")
                                * 1e6).cast("decimal(38,0)"))
                  .alias("yq")))
    wg = Window.partitionBy(*gb) if gb else Window.partitionBy()
    wday = (wg.orderBy("d")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    n = F.count("*").over(wg)
    tot = F.sum("yq").over(wg)
    ssq = F.sum(F.col("yq") * F.col("yq")).over(wg)
    pref = F.sum("yq").over(wday)
    rn = F.row_number().over(wg.orderBy("d"))
    # n*S_t, exact decimal integer
    ns = n.cast("decimal(38,0)") * pref - rn.cast("decimal(38,0)") * tot
    scored = (daily
              .withColumn("__n", n.cast("long"))
              .withColumn("__tot", tot)
              .withColumn("__ssq", ssq)
              .withColumn("__ns", ns)
              .withColumn("__rn", rn)
              .filter(F.col("__rn") < F.col("__n")))
    absns = F.abs(F.col("__ns"))
    best = (scored
            .groupBy(*gb)
            .agg(F.max(absns).alias("__m6"),
                 F.max("__n").alias("__n"),
                 F.max("__tot").alias("__tot"),
                 F.max("__ssq").alias("__ssq"),
                 F.max(F.struct(absns.alias("a"),
                                (F.lit(0) - F.unix_date(F.col("d")))
                                .alias("negd"))).alias("__best")))
    nn = F.col("__n").cast("double")
    m6 = F.col("__m6").cast("double")
    # sd of day sums in quantized units: one spelled chain
    var6 = ((F.col("__n").cast("decimal(38,0)") * F.col("__ssq")
             - F.col("__tot") * F.col("__tot")).cast("double")
            / (nn * (nn - F.lit(1.0))))
    stat = F.when((F.col("__n") >= 2) & (var6 > 0),
                  dround((m6 / nn) / (F.sqrt(var6) * F.sqrt(nn)),
                          round_dp))
    return best.select(
        *gb,
        F.col("__n").alias("n_days"),
        dround(m6 / (nn * F.lit(1e6)), round_dp).alias("cusum_max"),
        F.date_from_unix_date(F.lit(0) - F.col("__best.negd"))
        .alias("changepoint_day"),
        stat.alias("stat"),
        F.coalesce(stat >= F.lit(float(b)), F.lit(False))
        .alias("significant"))


def cusum_changepoint_sql(
    table: str,
    ts_col: str = "ts",
    value_col: str = "value",
    group_by: "list[str] | None" = None,
    alpha: float = 0.05,
    round_dp: int = 4,
) -> str:
    """DuckDB twin of cusum_changepoint (same exact-decimal day
    collapse, same integer n·S_t prefix identity, same argmax
    tie-break, same closing double chain)."""
    if alpha not in _CUSUM_CRIT:
        raise ValueError(f"alpha must be one of {sorted(_CUSUM_CRIT)}")
    b = _CUSUM_CRIT[alpha]
    gb = list(group_by or [])
    gsel = (", ".join(gb) + ", ") if gb else ""
    gkey = ("GROUP BY " + ", ".join(gb)) if gb else ""
    part = ("PARTITION BY " + ", ".join(gb)) if gb else ""
    return f"""
WITH daily AS (
  SELECT {gsel}CAST({ts_col} AS DATE) AS d,
         CAST(sum(CAST(round(CAST({value_col} AS DOUBLE) * 1e6)
                       AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS yq
  FROM {table}
  WHERE {value_col} IS NOT NULL
  GROUP BY {gsel}CAST({ts_col} AS DATE)
),
scored AS (
  SELECT {gsel}d,
         count(*) OVER ({part}) AS n,
         sum(yq) OVER ({part}) AS tot,
         sum(yq * yq) OVER ({part}) AS ssq,
         CAST(count(*) OVER ({part}) AS DECIMAL(38,0))
           * sum(yq) OVER ({part} ORDER BY d
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         - CAST(row_number() OVER ({part} ORDER BY d)
                AS DECIMAL(38,0)) * sum(yq) OVER ({part}) AS ns,
         row_number() OVER ({part} ORDER BY d) AS rn
  FROM daily
),
best AS (
  SELECT {gsel}CAST(max(n) AS BIGINT) AS n_days,
         max(abs(ns)) AS m6,
         max(tot) AS tot, max(ssq) AS ssq,
         max(struct_pack(a := abs(ns),
                         negd := 0 - date_diff('day',
                                               DATE '1970-01-01', d)))
           AS best
  FROM scored WHERE rn < n {gkey}
)
SELECT {gsel}n_days,
       round(m6::DOUBLE / (n_days::DOUBLE * 1e6), {round_dp})
         AS cusum_max,
       DATE '1970-01-01' + CAST(0 - best.negd AS INT)
         AS changepoint_day,
       round(CASE WHEN n_days >= 2
                  AND (CAST(n_days AS DECIMAL(38,0)) * ssq
                       - tot * tot)::DOUBLE
                      / (n_days::DOUBLE * (n_days::DOUBLE - 1.0)) > 0
             THEN (m6::DOUBLE / n_days::DOUBLE)
                  / (sqrt((CAST(n_days AS DECIMAL(38,0)) * ssq
                           - tot * tot)::DOUBLE
                          / (n_days::DOUBLE
                             * (n_days::DOUBLE - 1.0)))
                     * sqrt(n_days::DOUBLE)) END, {round_dp}) AS stat,
       coalesce(round(CASE WHEN n_days >= 2
                  AND (CAST(n_days AS DECIMAL(38,0)) * ssq
                       - tot * tot)::DOUBLE
                      / (n_days::DOUBLE * (n_days::DOUBLE - 1.0)) > 0
             THEN (m6::DOUBLE / n_days::DOUBLE)
                  / (sqrt((CAST(n_days AS DECIMAL(38,0)) * ssq
                           - tot * tot)::DOUBLE
                          / (n_days::DOUBLE
                             * (n_days::DOUBLE - 1.0)))
                     * sqrt(n_days::DOUBLE)) END, {round_dp})
                >= {b!r}, FALSE) AS significant
FROM best
"""


def seasonal_decompose(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    period: int = 7,
    group_by: "list[str] | None" = None,
    round_dp: int = 4,
) -> DataFrame:
    """(group..., d, value, trend, seasonal, resid) — classical
    additive seasonal decomposition of the daily metric sum
    (the moving-average method every stats text opens with; the
    descriptive companion to ses/holt which FORECAST but never
    explain): trend = centered `period`-day moving average (exact
    decimal window sum, ONE division — NULL on the first/last
    ⌊period/2⌋ days where the window is incomplete), seasonal =
    per-position mean of the detrended series re-centered to sum 0,
    resid = value − trend − seasonal. `period` must be ODD (an even
    period needs half-weighted ends — a different spelled chain;
    callers wanting weekly grain use 7).

    SEQUENCE-BASED positions (ADVICE r14): the seasonal index is
    assigned by row_number over OBSERVED days mod `period`, not by
    calendar day-of-period — the textbook formulation for a regular
    series, and both engines agree — but on a GAPPY daily series a
    missing day shifts the phase of every subsequent day, so
    "weekly" indices no longer mean calendar weekdays. Likewise the
    moving-average window spans `period` observed ROWS, which are
    only `period` consecutive days when the series is gap-free.
    Callers with gaps must densify first (events_gap_fill / an
    explicit calendar spine) or accept sequence semantics.

    Exactness: day sums quantize to exact 1e-6 decimals; the moving
    window SUM is an integer-decimal aggregate (association-free) so
    the trend is ONE IEEE division; the seasonal means and their
    re-centering fold in day / position order over bounded collected
    lists (never a windowed double running sum). Scale shape:
    day-grain collapse first, every window keyed by the group —
    bounded day tables end-to-end."""
    if period < 3 or period % 2 == 0:
        raise ValueError("period must be odd and >= 3")
    h = period // 2
    gb = list(group_by or [])
    daily = (df.filter(F.col(value_col).isNotNull())
             .groupBy(*gb, F.to_date(F.col(ts_col)).alias("d"))
             .agg(F.sum(F.round(F.col(value_col).cast("double")
                                * 1e6).cast("decimal(38,0)"))
                  .alias("yq")))
    wg = Window.partitionBy(*gb) if gb else Window.partitionBy()
    wmv = wg.orderBy("d").rowsBetween(-h, h)
    trend6 = F.when(
        F.count("*").over(wmv) == period,
        F.sum("yq").over(wmv).cast("double") / F.lit(float(period)))
    rn = F.row_number().over(wg.orderBy("d"))
    daily = (daily.withColumn("__t6", trend6)
             .withColumn("__pos", F.pmod(rn - 1, F.lit(period))))
    det = F.col("yq").cast("double") - F.col("__t6")
    # per-position mean of the detrended series, day-ordered fold
    cellpos = F.struct(F.col("d").alias("d"), det.alias("x"))
    pos_means = (daily.filter(F.col("__t6").isNotNull())
                 .withColumn("__c", cellpos)
                 .groupBy(*gb, "__pos")
                 .agg(F.count("*").alias("m"),
                      F.expr("aggregate(array_sort(collect_list(__c)),"
                             " CAST(0.0 AS DOUBLE),"
                             " (a, x) -> a + x.x)").alias("sx")))
    pos_means = pos_means.withColumn(
        "s_raw", F.col("sx") / F.col("m").cast("double"))
    # re-center the indices to sum 0 (position-ordered fold)
    cellidx = F.struct(F.col("__pos").alias("p"),
                       F.col("s_raw").alias("s"))
    centers = (pos_means.withColumn("__i", cellidx)
               .groupBy(*gb)
               .agg(F.count("*").alias("np"),
                    F.expr("aggregate(array_sort(collect_list(__i)),"
                           " CAST(0.0 AS DOUBLE),"
                           " (a, x) -> a + x.s)").alias("ss")))
    centers = centers.select(
        *gb, (F.col("ss") / F.col("np").cast("double")).alias("__mu"))
    seas = (pos_means.join(centers, gb) if gb
            else pos_means.join(F.broadcast(centers), F.lit(True)))
    seas = seas.select(*gb, "__pos",
                       (F.col("s_raw") - F.col("__mu")).alias("__s"))
    out = daily.join(seas, [*gb, "__pos"], "left")
    val = F.col("yq").cast("double") / F.lit(1e6)
    trend = F.col("__t6") / F.lit(1e6)
    seasonal = F.when(F.col("__t6").isNotNull(),
                      F.col("__s") / F.lit(1e6))
    resid = F.when(F.col("__t6").isNotNull(),
                   (F.col("yq").cast("double") - F.col("__t6")
                    - F.col("__s")) / F.lit(1e6))
    return (out.select(*gb, "d",
                       dround(val, round_dp).alias("value"),
                       dround(trend, round_dp).alias("trend"),
                       (dround(seasonal, round_dp) + F.lit(0.0)).alias("seasonal"),
                       (dround(resid, round_dp) + F.lit(0.0)).alias("resid"))
            .orderBy(*gb, "d"))


def seasonal_decompose_sql(
    table: str,
    ts_col: str = "ts",
    value_col: str = "value",
    period: int = 7,
    group_by: "list[str] | None" = None,
    round_dp: int = 4,
) -> str:
    """DuckDB twin of seasonal_decompose (same exact-decimal day
    collapse, same full-window-only centered MA, same day- and
    position-ordered folds, same closing chains)."""
    if period < 3 or period % 2 == 0:
        raise ValueError("period must be odd and >= 3")
    h = period // 2
    gb = list(group_by or [])
    gsel = (", ".join(gb) + ", ") if gb else ""
    gkey = ("GROUP BY " + ", ".join(gb)) if gb else ""
    part = ("PARTITION BY " + ", ".join(gb)) if gb else ""
    jkeys = " AND ".join(f"a.{k} = b.{k}" for k in gb) if gb \
        else "TRUE"
    asel = (", ".join(f"a.{k}" for k in gb) + ", ") if gb else ""
    return f"""
WITH daily AS (
  SELECT {gsel}CAST({ts_col} AS DATE) AS d,
         CAST(sum(CAST(round(CAST({value_col} AS DOUBLE) * 1e6)
                       AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS yq
  FROM {table}
  WHERE {value_col} IS NOT NULL
  GROUP BY {gsel}CAST({ts_col} AS DATE)
),
trended AS (
  SELECT {gsel}d, yq,
         CASE WHEN count(*) OVER ({part} ORDER BY d
                  ROWS BETWEEN {h} PRECEDING AND {h} FOLLOWING)
                  = {period}
              THEN (sum(yq) OVER ({part} ORDER BY d
                  ROWS BETWEEN {h} PRECEDING AND {h} FOLLOWING)
                   )::DOUBLE / {float(period)!r} END AS t6,
         (row_number() OVER ({part} ORDER BY d) - 1) % {period}
           AS pos
  FROM daily
),
pos_means AS (
  SELECT {gsel}pos, count(*) AS m,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list(yq::DOUBLE - t6 ORDER BY d)),
             (a, x) -> a + x) AS sx
  FROM trended WHERE t6 IS NOT NULL
  GROUP BY {gsel}pos
),
centers AS (
  SELECT {gsel}
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list(sx / m::DOUBLE ORDER BY pos)),
             (a, x) -> a + x) / count(*)::DOUBLE AS mu
  FROM pos_means {gkey}
),
seas AS (
  SELECT {asel}a.pos,
         a.sx / a.m::DOUBLE - b.mu AS s
  FROM pos_means a JOIN centers b ON {jkeys}
)
SELECT {asel.replace('a.', 't.') if gb else ''}t.d,
       round(t.yq::DOUBLE / 1e6, {round_dp}) AS value,
       round(t.t6 / 1e6, {round_dp}) AS trend,
       round(CASE WHEN t.t6 IS NOT NULL THEN s.s / 1e6 END,
             {round_dp}) + 0.0 AS seasonal,
       round(CASE WHEN t.t6 IS NOT NULL
             THEN (t.yq::DOUBLE - t.t6 - s.s) / 1e6 END,
             {round_dp}) + 0.0 AS resid
FROM trended t LEFT JOIN seas s
  ON {jkeys.replace('a.', 't.').replace('b.', 's.')}
     {" AND " if gb else " AND "}t.pos = s.pos
ORDER BY {gsel.replace(', ', ', ') if not gb else ", ".join("t." + k for k in gb) + ", "}t.d
"""


def durbin_watson(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    group_by: "list[str] | None" = None,
    round_dp: int = 4,
) -> DataFrame:
    """(group..., n_days, dw) — the Durbin-Watson first-order
    autocorrelation statistic over the daily metric sum (Durbin &
    Watson 1950): DW = Σ(e_t − e_{t−1})² / Σ e_t² with e the
    mean-removed series — ~2 means uncorrelated residuals, →0
    positive autocorrelation (trend/level structure the mean missed),
    →4 negative (oscillation). The residual-diagnostics companion to
    seasonal_decompose / the forecast family: run it on what the
    model left behind.

    Exactness: day sums quantize to exact 1e-6 decimals; the
    numerator Σ(y_t − y_{t−1})² cancels the mean exactly and is an
    EXACT DECIMAL INTEGER (one day-ordered lag window); the
    denominator Σ(y_t − ȳ)² = (n·Σy² − T²)/n is an exact rational;
    ONE closing division chain. NULL dw when n < 2 or the series is
    constant."""
    gb = list(group_by or [])
    daily = (df.filter(F.col(value_col).isNotNull())
             .groupBy(*gb, F.to_date(F.col(ts_col)).alias("d"))
             .agg(F.sum(F.round(F.col(value_col).cast("double")
                                * 1e6).cast("decimal(38,0)"))
                  .alias("yq")))
    wg = Window.partitionBy(*gb) if gb else Window.partitionBy()
    prev = F.lag("yq").over(wg.orderBy("d"))
    diff = F.col("yq") - prev
    scored = daily.withColumn("__d2", diff * diff)
    agg = (scored.groupBy(*gb)
           .agg(F.count("*").alias("n_days"),
                F.sum("yq").alias("__t"),
                F.sum(F.col("yq") * F.col("yq")).alias("__ssq"),
                F.sum("__d2").alias("__num")))
    nn = F.col("n_days").cast("double")
    den = (F.col("n_days").cast("decimal(38,0)") * F.col("__ssq")
           - F.col("__t") * F.col("__t")).cast("double") / nn
    dw = F.when((F.col("n_days") >= 2) & (den > 0),
                dround(F.col("__num").cast("double") / den,
                        round_dp))
    return agg.select(*gb,
                      F.col("n_days").cast("long").alias("n_days"),
                      dw.alias("dw"))


def durbin_watson_sql(
    table: str,
    ts_col: str = "ts",
    value_col: str = "value",
    group_by: "list[str] | None" = None,
    round_dp: int = 4,
) -> str:
    """DuckDB twin of durbin_watson (same exact-decimal day
    collapse, same lag-squared integer numerator, same rational
    denominator and closing chain)."""
    gb = list(group_by or [])
    gsel = (", ".join(gb) + ", ") if gb else ""
    gkey = ("GROUP BY " + ", ".join(gb)) if gb else ""
    part = ("PARTITION BY " + ", ".join(gb)) if gb else ""
    return f"""
WITH daily AS (
  SELECT {gsel}CAST({ts_col} AS DATE) AS d,
         CAST(sum(CAST(round(CAST({value_col} AS DOUBLE) * 1e6)
                       AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS yq
  FROM {table}
  WHERE {value_col} IS NOT NULL
  GROUP BY {gsel}CAST({ts_col} AS DATE)
),
scored AS (
  SELECT {gsel}yq,
         (yq - lag(yq) OVER ({part} ORDER BY d))
         * (yq - lag(yq) OVER ({part} ORDER BY d)) AS d2
  FROM daily
),
agg AS (
  SELECT {gsel}CAST(count(*) AS BIGINT) AS n_days,
         CAST(sum(yq) AS DECIMAL(38,0)) AS t,
         CAST(sum(yq * yq) AS DECIMAL(38,0)) AS ssq,
         CAST(sum(d2) AS DECIMAL(38,0)) AS num
  FROM scored {gkey}
)
SELECT {gsel}n_days,
       round(CASE WHEN n_days >= 2 AND
                  (CAST(n_days AS DECIMAL(38,0)) * ssq
                   - t * t)::DOUBLE / n_days::DOUBLE > 0
             THEN num::DOUBLE
                  / ((CAST(n_days AS DECIMAL(38,0)) * ssq
                      - t * t)::DOUBLE / n_days::DOUBLE) END,
             {round_dp}) AS dw
FROM agg
"""


def runs_test(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    group_by: "list[str] | None" = None,
    z_alpha: float = 1.959963984540054,
    round_dp: int = 4,
) -> DataFrame:
    """(group..., n_days, n_above, n_below, n_runs, z, significant)
    — the Wald-Wolfowitz runs test (1940) for randomness of the
    daily metric sum around its median: too FEW runs = level
    persistence/trend, too MANY = oscillation; the distribution-free
    companion to durbin_watson (which measures the SAME structure
    parametrically). Days above the pooled LOWER median (the
    brown_forsythe integer rule) are +, below are −, days exactly AT
    the median are excluded (the classic convention);

        E[R] = 2·n₁·n₂/(n₁+n₂) + 1
        Var  = 2n₁n₂(2n₁n₂−n₁−n₂) / ((n₁+n₂)²(n₁+n₂−1))

    Exactness: day sums and the median are exact integers on the
    1e-6 grid; the run count is an integer lag comparison over the
    day order; E and Var close in ONE spelled double chain. NULL z
    when either side is empty (with ≥1 off-median day) or
    n₁+n₂ < 2. Degenerate groups where EVERY day ties at the median
    have no off-median days at all and are ABSENT from the output —
    not a NULL row (both engines agree); callers joining this
    section back to a group roster should left-join."""
    gb = list(group_by or [])
    daily = (df.filter(F.col(value_col).isNotNull())
             .groupBy(*gb, F.to_date(F.col(ts_col)).alias("d"))
             .agg(F.sum(F.round(F.col(value_col).cast("double")
                                * 1e6).cast("decimal(38,0)"))
                  .alias("yq")))
    wg = Window.partitionBy(*gb) if gb else Window.partitionBy()
    cum = F.sum(F.lit(1)).over(
        wg.orderBy("yq")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    nn = F.count("*").over(wg)
    med = (daily
           .withColumn("__cum", cum)
           .withColumn("__nn", nn)
           .filter(F.col("__cum") * 2 >= F.col("__nn")
                   + F.pmod(F.col("__nn"), 2))
           .groupBy(*gb)
           .agg(F.min("yq").alias("__med")))
    j = daily.join(med, gb) if gb \
        else daily.join(F.broadcast(med), F.lit(True))
    signed = (j.filter(F.col("yq") != F.col("__med"))
              .withColumn("__s", (F.col("yq") > F.col("__med"))
                          .cast("int")))
    prev = F.lag("__s").over(wg.orderBy("d"))
    scored = signed.withColumn(
        "__chg", F.when(prev.isNull() | (prev != F.col("__s")), 1)
        .otherwise(0))
    agg = (scored.groupBy(*gb)
           .agg(F.sum("__s").alias("n1"),
                F.sum(1 - F.col("__s")).alias("n2"),
                F.sum("__chg").alias("n_runs")))
    n1 = F.col("n1").cast("double")
    n2 = F.col("n2").cast("double")
    ntot = n1 + n2
    er = F.lit(2.0) * n1 * n2 / ntot + F.lit(1.0)
    var = (F.lit(2.0) * n1 * n2
           * (F.lit(2.0) * n1 * n2 - n1 - n2)
           / (ntot * ntot * (ntot - F.lit(1.0))))
    z = F.when((F.col("n1") > 0) & (F.col("n2") > 0) & (var > 0),
               dround((F.col("n_runs").cast("double") - er)
                       / F.sqrt(var), round_dp) + F.lit(0.0))
    return agg.select(
        *gb,
        (F.col("n1") + F.col("n2")).cast("long").alias("n_days"),
        F.col("n1").cast("long").alias("n_above"),
        F.col("n2").cast("long").alias("n_below"),
        F.col("n_runs").cast("long").alias("n_runs"),
        z.alias("z"),
        F.coalesce(F.abs(z) >= F.lit(float(z_alpha)), F.lit(False))
        .alias("significant"))


def runs_test_sql(
    table: str,
    ts_col: str = "ts",
    value_col: str = "value",
    group_by: "list[str] | None" = None,
    z_alpha: float = 1.959963984540054,
    round_dp: int = 4,
) -> str:
    """DuckDB twin of runs_test (same integer median rule, same
    lag-based run count, same closing chain)."""
    gb = list(group_by or [])
    gsel = (", ".join(gb) + ", ") if gb else ""
    gkey = ("GROUP BY " + ", ".join(gb)) if gb else ""
    part = ("PARTITION BY " + ", ".join(gb)) if gb else ""
    jkeys = " AND ".join(f"a.{k} = m.{k}" for k in gb) if gb \
        else "TRUE"
    asel = (", ".join(f"a.{k}" for k in gb) + ", ") if gb else ""
    return f"""
WITH daily AS (
  SELECT {gsel}CAST({ts_col} AS DATE) AS d,
         CAST(sum(CAST(round(CAST({value_col} AS DOUBLE) * 1e6)
                       AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS yq
  FROM {table}
  WHERE {value_col} IS NOT NULL
  GROUP BY {gsel}CAST({ts_col} AS DATE)
),
med AS (
  SELECT {gsel}min(yq) AS med FROM (
    SELECT {gsel}yq,
           row_number() OVER ({part} ORDER BY yq) AS cum,
           count(*) OVER ({part}) AS nn
    FROM daily)
  WHERE cum * 2 >= nn + nn % 2 {gkey}
),
signed AS (
  SELECT {asel}a.d, CAST(a.yq > m.med AS INT) AS s
  FROM daily a JOIN med m ON {jkeys}
  WHERE a.yq <> m.med
),
scored AS (
  SELECT {gsel}s,
         CASE WHEN lag(s) OVER ({part} ORDER BY d) IS NULL
                   OR lag(s) OVER ({part} ORDER BY d) <> s
              THEN 1 ELSE 0 END AS chg
  FROM signed
),
agg AS (
  SELECT {gsel}CAST(sum(s) AS BIGINT) AS n1,
         CAST(sum(1 - s) AS BIGINT) AS n2,
         CAST(sum(chg) AS BIGINT) AS n_runs
  FROM scored {gkey}
)
SELECT {gsel}n1 + n2 AS n_days, n1 AS n_above, n2 AS n_below,
       n_runs,
       round(CASE WHEN n1 > 0 AND n2 > 0 AND
                  2.0 * n1::DOUBLE * n2::DOUBLE
                  * (2.0 * n1::DOUBLE * n2::DOUBLE
                     - n1::DOUBLE - n2::DOUBLE)
                  / ((n1::DOUBLE + n2::DOUBLE)
                     * (n1::DOUBLE + n2::DOUBLE)
                     * (n1::DOUBLE + n2::DOUBLE - 1.0)) > 0
             THEN (n_runs::DOUBLE
                   - (2.0 * n1::DOUBLE * n2::DOUBLE
                      / (n1::DOUBLE + n2::DOUBLE) + 1.0))
                  / sqrt(2.0 * n1::DOUBLE * n2::DOUBLE
                         * (2.0 * n1::DOUBLE * n2::DOUBLE
                            - n1::DOUBLE - n2::DOUBLE)
                         / ((n1::DOUBLE + n2::DOUBLE)
                            * (n1::DOUBLE + n2::DOUBLE)
                            * (n1::DOUBLE + n2::DOUBLE - 1.0)))
             END, {round_dp}) + 0.0 AS z,
       coalesce(abs(round(CASE WHEN n1 > 0 AND n2 > 0 AND
                  2.0 * n1::DOUBLE * n2::DOUBLE
                  * (2.0 * n1::DOUBLE * n2::DOUBLE
                     - n1::DOUBLE - n2::DOUBLE)
                  / ((n1::DOUBLE + n2::DOUBLE)
                     * (n1::DOUBLE + n2::DOUBLE)
                     * (n1::DOUBLE + n2::DOUBLE - 1.0)) > 0
             THEN (n_runs::DOUBLE
                   - (2.0 * n1::DOUBLE * n2::DOUBLE
                      / (n1::DOUBLE + n2::DOUBLE) + 1.0))
                  / sqrt(2.0 * n1::DOUBLE * n2::DOUBLE
                         * (2.0 * n1::DOUBLE * n2::DOUBLE
                            - n1::DOUBLE - n2::DOUBLE)
                         / ((n1::DOUBLE + n2::DOUBLE)
                            * (n1::DOUBLE + n2::DOUBLE)
                            * (n1::DOUBLE + n2::DOUBLE - 1.0)))
             END, {round_dp})) >= {float(z_alpha)!r}, FALSE)
         AS significant
FROM agg
"""
