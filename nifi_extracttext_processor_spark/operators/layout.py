"""Multi-dimensional data layout: Z-order (Morton) clustering for
min/max data skipping.

At 100 TB, scans are won or lost by file pruning: parquet footers
carry per-column min/max, and engines (Spark's parquet filters,
Delta/Iceberg file stats) skip files whose ranges miss the predicate.
A single-column sort gives perfect pruning on ONE column and none on
the others; interleaving the bits of several columns (Morton 1966 —
the Z-order curve, the same layout `OPTIMIZE ZORDER BY` applies in
lakehouse engines) keeps every indexed column's per-file range narrow
at once.

Everything here is pure Catalyst integer/bit arithmetic — zero UDF,
zero shuffle for the z-value itself (one narrow projection; the
min/max scalars are a 1-row broadcast) — and the write path is ONE
range repartition + partition-local sort, the exact shuffle a global
sort would cost, but producing a multi-dimensional layout.

DuckDB twin: zorder_value_sql replays the scaling and bit
interleaving with the same IEEE-double steps, so the oracle hash gate
covers the curve arithmetic bit-for-bit.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 16 bits/dimension keeps z in a BIGINT for up to 4 dims and is far
# below parquet row-group granularity — more bits buys nothing for
# file-level skipping
_DEFAULT_BITS = 16


def _scaled(col: Column, lo: Column, hi: Column, bits: int) -> Column:
    """Linear-scale col into [0, 2^bits - 1] as a BIGINT; a constant
    column (hi == lo) maps to 0; NULLs map to 0 (sort first). Values
    outside [lo, hi] CLAMP to the ends — pinned ranges exist precisely
    for incremental appends where out-of-range values arrive, and an
    unclamped negative/overflow scaled int would sign-extend through
    _interleave into a misordered z key."""
    top = F.lit((1 << bits) - 1).cast("bigint")
    frac = (col.cast("double") - lo) / (hi - lo)
    raw = F.floor(frac * top.cast("double")).cast("bigint")
    return (F.when(hi > lo,
                   F.greatest(F.lit(0).cast("bigint"),
                              F.least(top, raw)))
            .otherwise(F.lit(0))
            .cast("bigint"))


def _interleave(scaled: list[Column], bits: int) -> Column:
    """Morton interleave: bit b of dimension i lands at position
    b * ndims + i. ndims * bits must fit a signed BIGINT."""
    n = len(scaled)
    terms = []
    for b in range(bits):
        for i, v in enumerate(scaled):
            bit = F.shiftright(v, b).bitwiseAND(F.lit(1))
            terms.append(F.shiftleft(bit, b * n + i))
    return reduce(lambda a, c: a.bitwiseOR(c), terms)


def zorder_value(
    df: DataFrame,
    cols: list[str],
    bits: int = _DEFAULT_BITS,
    ranges: dict[str, tuple[float, float]] | None = None,
    out_col: str = "z",
) -> DataFrame:
    """Append the Z-order key over `cols` (numeric). Column ranges
    default to the actual min/max (one 1-row aggregate, broadcast via
    crossJoin — the house scalar pattern); pass `ranges` to pin them
    (e.g. known domain bounds, or yesterday's, so incremental appends
    z-sort consistently without rescanning history)."""
    if not cols:
        raise ValueError("zorder_value needs at least one column")
    if bits < 1 or bits * len(cols) > 62:
        raise ValueError(f"bits*ndims must be in [1, 62], got "
                         f"{bits * len(cols)}")
    if ranges is not None:
        missing = [c for c in cols if c not in ranges]
        if missing:
            raise ValueError(f"ranges missing for {missing}")
        bad = [c for c in cols if not ranges[c][1] >= ranges[c][0]]
        if bad:
            raise ValueError(f"ranges with hi < lo for {bad}")
        scaled = [
            _scaled(F.coalesce(F.col(c).cast("double"),
                               F.lit(float(ranges[c][0]))),
                    F.lit(float(ranges[c][0])),
                    F.lit(float(ranges[c][1])), bits)
            for c in cols]
        return df.withColumn(out_col, _interleave(scaled, bits))
    stats = df.agg(*[x for c in cols for x in (
        F.min(F.col(c).cast("double")).alias(f"_lo_{c}"),
        F.max(F.col(c).cast("double")).alias(f"_hi_{c}"))])
    joined = df.crossJoin(F.broadcast(stats))
    scaled = [
        _scaled(F.coalesce(F.col(c).cast("double"), F.col(f"_lo_{c}")),
                F.col(f"_lo_{c}"), F.col(f"_hi_{c}"), bits)
        for c in cols]
    return (joined.withColumn(out_col, _interleave(scaled, bits))
            .drop(*[f"_lo_{c}" for c in cols],
                  *[f"_hi_{c}" for c in cols]))


def cluster_by_zorder(
    df: DataFrame,
    cols: list[str],
    num_partitions: int,
    bits: int = _DEFAULT_BITS,
    ranges: dict[str, tuple[float, float]] | None = None,
) -> DataFrame:
    """Re-layout df along the Z-curve: one repartitionByRange on the
    z-value (sampled range boundaries -> balanced output files even
    under skew) + a partition-local sort. Write the result and every
    file's min/max footer stats stay narrow in ALL of `cols` — the
    skipping win test_layout quantifies. Cost: exactly one shuffle,
    the same as any global sort."""
    z = zorder_value(df, cols, bits=bits, ranges=ranges, out_col="_z")
    return (z.repartitionByRange(num_partitions, "_z")
            .sortWithinPartitions("_z")
            .drop("_z"))


def zorder_value_sql(
    table: str,
    cols: list[str],
    bits: int = _DEFAULT_BITS,
    id_cols: str = "*",
) -> str:
    """DuckDB twin of zorder_value (auto ranges): same double scaling,
    same floor, same interleave positions."""
    if not cols:
        raise ValueError("zorder_value_sql needs at least one column")
    top = (1 << bits) - 1
    n = len(cols)
    stats = ", ".join(
        f"min(CAST({c} AS DOUBLE)) AS _lo_{c}, "
        f"max(CAST({c} AS DOUBLE)) AS _hi_{c}" for c in cols)
    scaled = ", ".join(
        f"CASE WHEN _hi_{c} > _lo_{c} THEN "
        f"greatest(CAST(0 AS BIGINT), least(CAST({top} AS BIGINT), "
        f"CAST(floor((coalesce(CAST({c} AS DOUBLE), _lo_{c}) - _lo_{c})"
        f" / (_hi_{c} - _lo_{c}) * {top}.0) AS BIGINT))) "
        f"ELSE 0 END AS _s_{i}"
        for i, c in enumerate(cols))
    terms = []
    for b in range(bits):
        for i in range(n):
            terms.append(f"(((_s_{i} >> {b}) & 1) << {b * n + i})")
    z = " | ".join(terms)
    return f"""
WITH _stats AS (SELECT {stats} FROM {table}),
_scaled AS (
  SELECT {id_cols}, {scaled}
  FROM {table} CROSS JOIN _stats
)
SELECT {id_cols}, ({z}) AS z FROM _scaled
"""


def zorder_reference(
    rows: list[tuple[float, ...]],
    bits: int = _DEFAULT_BITS,
) -> list[int]:
    """Independent pure-Python Morton curve for test goldens."""
    if not rows:
        return []
    ndims = len(rows[0])
    los = [min(r[i] for r in rows) for i in range(ndims)]
    his = [max(r[i] for r in rows) for i in range(ndims)]
    top = (1 << bits) - 1
    out = []
    for r in rows:
        z = 0
        for i in range(ndims):
            if his[i] > los[i]:
                import math
                s = int(math.floor(
                    (float(r[i]) - los[i]) / (his[i] - los[i]) * top))
            else:
                s = 0
            for b in range(bits):
                z |= ((s >> b) & 1) << (b * ndims + i)
        out.append(z)
    return out


def file_stats_overlap(
    path: str,
    cols: list[str],
) -> list[dict]:
    """Read back per-parquet-file min/max footer stats for `cols` —
    the observability half of the layout story (what an engine's file
    pruner would see). Driver-side: reads footers only, never data."""
    import glob
    import os

    import pyarrow.parquet as pq

    out = []
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        lo: dict[str, float] = {}
        hi: dict[str, float] = {}
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                col = g.column(ci)
                name = col.path_in_schema
                if name in cols and col.statistics is not None:
                    st = col.statistics
                    lo[name] = min(lo.get(name, st.min), st.min)
                    hi[name] = max(hi.get(name, st.max), st.max)
        out.append({"file": os.path.basename(f),
                    "min": lo, "max": hi})
    return out


def pruned_file_fraction(
    stats: list[dict],
    predicates: dict[str, tuple[float, float]],
) -> float:
    """Fraction of files a min/max pruner skips for a conjunction of
    range predicates {col: (lo, hi)}. The number the z-order layout
    is optimizing."""
    if not stats:
        return 0.0
    skipped = 0
    for s in stats:
        for c, (lo, hi) in predicates.items():
            if c in s["min"] and (s["min"][c] > hi or s["max"][c] < lo):
                skipped += 1
                break
    return skipped / len(stats)


# ---------------------------------------------------------------------------
# Hilbert curve — the locality-optimal 2-D layout
# ---------------------------------------------------------------------------
#
# The Z-curve's diagonal jumps (…0111 -> 1000 crosses the whole grid)
# leak wide per-file ranges at quadrant seams; the Hilbert curve
# (Hilbert 1891, the layout Delta chose to succeed ZORDER for exactly
# this reason) visits every cell via UNIT steps — consecutive keys are
# always orthogonal grid neighbors — so file min/max boxes stay tight
# at every scale. Cost: the index needs a per-level rotate/reflect
# state machine instead of plain bit interleave. 2-D only here (the
# classic case: (user, time), (lat, lon)); for 3+ dims use zorder.
#
# xy2d (the standard iterative form), unrolled `bits` times:
#   rx = bit(x, lev); ry = bit(y, lev)
#   d += s^2 * ((3*rx) XOR ry)
#   if ry == 0:  (flip when rx == 1, then swap x/y)
#       x, y = (s-1-y if rx else y), (s-1-x if rx else x)
# Every step is integer compare/shift/xor — exactly specified, so the
# DuckDB twin (chained CTEs, one per level — no lateral-alias
# ambiguity) replays the key bit-for-bit.


def hilbert_value(
    df: DataFrame,
    cols: list[str],
    bits: int = _DEFAULT_BITS,
    ranges: dict[str, tuple[float, float]] | None = None,
    out_col: str = "h",
) -> DataFrame:
    """Append the Hilbert key over exactly TWO numeric columns; same
    range handling as zorder_value (auto min/max broadcast, or pinned
    `ranges` for append-stable incremental layout, NULL -> lo,
    out-of-range clamps). Pure narrow Catalyst: the unrolled level
    loop materializes one named projection per level — no UDF, no
    shuffle, expression size linear in `bits`."""
    if len(cols) != 2:
        raise ValueError("hilbert_value is 2-D: pass exactly 2 cols")
    if bits < 1 or 2 * bits > 62:
        raise ValueError(f"bits must be in [1, 31], got {bits}")
    if ranges is not None:
        missing = [c for c in cols if c not in ranges]
        if missing:
            raise ValueError(f"ranges missing for {missing}")
        bad = [c for c in cols if not ranges[c][1] >= ranges[c][0]]
        if bad:
            raise ValueError(f"ranges with hi < lo for {bad}")
        scaled = [
            _scaled(F.coalesce(F.col(c).cast("double"),
                               F.lit(float(ranges[c][0]))),
                    F.lit(float(ranges[c][0])),
                    F.lit(float(ranges[c][1])), bits)
            for c in cols]
        out = df
    else:
        stats = df.agg(*[x for c in cols for x in (
            F.min(F.col(c).cast("double")).alias(f"_lo_{c}"),
            F.max(F.col(c).cast("double")).alias(f"_hi_{c}"))])
        out = df.crossJoin(F.broadcast(stats))
        scaled = [
            _scaled(F.coalesce(F.col(c).cast("double"),
                               F.col(f"_lo_{c}")),
                    F.col(f"_lo_{c}"), F.col(f"_hi_{c}"), bits)
            for c in cols]
    out = out.withColumns({"__hx": scaled[0], "__hy": scaled[1],
                           "__hd": F.lit(0).cast("bigint")})
    for lev in range(bits - 1, -1, -1):
        s = 1 << lev
        hx, hy = F.col("__hx"), F.col("__hy")
        rx = F.shiftright(hx, lev).bitwiseAND(F.lit(1))
        ry = F.shiftright(hy, lev).bitwiseAND(F.lit(1))
        d_new = (F.col("__hd")
                 + F.lit(s * s).cast("bigint")
                 * (F.lit(3) * rx).bitwiseXOR(ry).cast("bigint"))
        nx = F.when(ry == 0,
                    F.when(rx == 1, F.lit(s - 1) - hy).otherwise(hy)) \
            .otherwise(hx)
        ny = F.when(ry == 0,
                    F.when(rx == 1, F.lit(s - 1) - hx).otherwise(hx)) \
            .otherwise(hy)
        out = out.withColumns({"__hd": d_new, "__hx": nx, "__hy": ny})
    drop = ["__hx", "__hy", "__hd"]
    if ranges is None:
        drop += [f"_lo_{c}" for c in cols] + [f"_hi_{c}" for c in cols]
    return out.withColumn(out_col, F.col("__hd")).drop(*drop)


def hilbert_value_sql(
    table: str,
    cols: list[str],
    bits: int = _DEFAULT_BITS,
    id_cols: str = "*",
) -> str:
    """DuckDB twin of hilbert_value (auto ranges): same scaling, one
    chained CTE per level carrying (hx, hy, hd) forward — distinct
    column names per level so DuckDB's lateral column aliases can
    never capture the wrong generation."""
    if len(cols) != 2:
        raise ValueError("hilbert_value_sql is 2-D")
    top = (1 << bits) - 1
    stats = ", ".join(
        f"min(CAST({c} AS DOUBLE)) AS _lo_{c}, "
        f"max(CAST({c} AS DOUBLE)) AS _hi_{c}" for c in cols)
    scaled = ", ".join(
        f"CASE WHEN _hi_{c} > _lo_{c} THEN "
        f"greatest(CAST(0 AS BIGINT), least(CAST({top} AS BIGINT), "
        f"CAST(floor((coalesce(CAST({c} AS DOUBLE), _lo_{c}) - _lo_{c})"
        f" / (_hi_{c} - _lo_{c}) * {top}.0) AS BIGINT))) "
        f"ELSE 0 END AS {nm}0"
        for c, nm in zip(cols, ("hx", "hy")))
    ctes = [f"""c0 AS (
  SELECT {id_cols}, {scaled}, CAST(0 AS BIGINT) AS hd0
  FROM {table} CROSS JOIN _stats
)"""]
    step = 0
    for lev in range(bits - 1, -1, -1):
        s = 1 << lev
        i, j = step, step + 1
        rx = f"((hx{i} >> {lev}) & 1)"
        ry = f"((hy{i} >> {lev}) & 1)"
        ctes.append(f"""c{j} AS (
  SELECT {id_cols},
    CASE WHEN {ry} = 0 THEN
      CASE WHEN {rx} = 1 THEN {s - 1} - hy{i} ELSE hy{i} END
    ELSE hx{i} END AS hx{j},
    CASE WHEN {ry} = 0 THEN
      CASE WHEN {rx} = 1 THEN {s - 1} - hx{i} ELSE hx{i} END
    ELSE hy{i} END AS hy{j},
    hd{i} + CAST({s * s} AS BIGINT)
          * CAST(xor(3 * {rx}, {ry}) AS BIGINT) AS hd{j}
  FROM c{i}
)""")
        step = j
    return (f"WITH _stats AS (SELECT {stats} FROM {table}),\n"
            + ",\n".join(ctes)
            + f"\nSELECT {id_cols}, hd{step} AS h FROM c{step}\n")


def hilbert_reference(
    rows: "list[tuple[float, float]]",
    bits: int = _DEFAULT_BITS,
) -> list[int]:
    """Independent pure-Python oracle (the zorder_reference pattern):
    same scaling, then the textbook xy2d loop on Python ints."""
    los = [min(r[i] for r in rows) for i in range(2)]
    his = [max(r[i] for r in rows) for i in range(2)]
    top = (1 << bits) - 1

    def scale(v, lo, hi):
        if not hi > lo:
            return 0
        import math
        return max(0, min(top, int(math.floor((v - lo) / (hi - lo)
                                              * float(top)))))

    out = []
    for r in rows:
        x, y = (scale(r[i], los[i], his[i]) for i in range(2))
        d = 0
        s = 1 << (bits - 1)
        while s > 0:
            rx = 1 if (x & s) > 0 else 0
            ry = 1 if (y & s) > 0 else 0
            d += s * s * ((3 * rx) ^ ry)
            if ry == 0:
                if rx == 1:
                    x, y = s - 1 - x, s - 1 - y
                x, y = y, x
            s //= 2
        out.append(d)
    return out


def cluster_by_hilbert(
    df: DataFrame,
    cols: list[str],
    num_partitions: int,
    bits: int = _DEFAULT_BITS,
    ranges: dict[str, tuple[float, float]] | None = None,
) -> DataFrame:
    """Re-layout df along the Hilbert curve — same ONE range
    repartition + partition-local sort cost as cluster_by_zorder,
    tighter per-file boxes at quadrant seams."""
    keyed = hilbert_value(df, cols, bits=bits, ranges=ranges,
                          out_col="__hkey")
    return (keyed.repartitionByRange(num_partitions, "__hkey")
            .sortWithinPartitions("__hkey")
            .drop("__hkey"))
