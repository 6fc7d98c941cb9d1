"""Deterministic HyperLogLog distinct-count sketches (Flajolet 2007;
the Heule 2013 small-range correction) — the cardinality primitive a
100 TB catalog needs: "how many distinct urls / tokens / users" as a
few-KB MERGEABLE register table instead of a corpus-wide exact
distinct. Spark's own approx_count_distinct is a black-box binary
sketch you cannot persist portably or merge incrementally across
engines; this one is a PLAIN (group, bucket, rho) DataFrame — land it
in the dedup-catalog posture, union tomorrow's partial, groupBy-max,
estimate. The DuckDB twin replays the md5 hash, the register build,
and the estimator arithmetic exactly, so estimates are cross-engine
value-identical (the house determinism bar — not just "close").

Construction (b precision bits, m = 2^b registers, default b=12 →
±~1.6%):
  h        = md5(value || '#seed')          (128-bit hex, portable)
  bucket   = first b bits   (b/4 hex chars, b multiple of 4)
  w        = next 60 bits   (15 hex chars)
  rho      = leading zeros of w + 1 ∈ [1, 61]  — computed via STRING
             arithmetic (strip leading '0' hex chars + a nibble CASE),
             never floating log, so both engines agree bit-for-bit
  register = max rho per (group, bucket)
Estimator: alpha_m·m² / Σ 2^−M_j with the Σ kept EXACT as the integer
Σ 2^(61−M_j) (decimal/int128 sum — float summation order would be
engine-dependent), one double division at the end; empty registers
contribute 2^61; small-range correction E ≤ 2.5m ∧ V>0 → m·ln(m/V).
The 60-bit register width makes the 2^32 large-range correction
unreachable (documented omission).

Scale shape: ONE map-side-combinable groupBy per sketch — rows
collapse to ≤ groups·m (bucket, rho) pairs before any shuffle; the
estimate is a second agg over that already-tiny table. Merging
partials (days, sources, engines) is union + the same max — the
definition of a mergeable summary. Payloads never move.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from .rounding import dround


_REG_BITS = 60  # hash bits feeding rho; rho ∈ [1, 61]


def _alpha_mm(m: int) -> float:
    # Flajolet's bias constant for m >= 128, times m^2. Embedded as a
    # Python double in BOTH engines (repr round-trip) so the estimator
    # arithmetic is IEEE-identical.
    return (0.7213 / (1.0 + 1.079 / m)) * m * m


def _check_b(b: int) -> int:
    if b < 8 or b > 16 or b % 4 != 0:
        raise ValueError("b must be 8, 12, or 16 (hex-aligned, "
                         "m >= 256 for the alpha constant)")
    return b


def _check_groups(gb: "list[str]") -> "list[str]":
    # The register table owns these names; a group column shadowing
    # them silently corrupts the GROUP BY in the SQL twins (found
    # live: a time-bucket group named "bucket").
    clash = {"bucket", "rho"} & set(gb)
    if clash:
        raise ValueError(f"group column(s) {sorted(clash)} collide "
                         "with the HLL register schema — rename them")
    return gb


def hll_partials(
    df: DataFrame,
    col: str,
    group_by: "list[str] | None" = None,
    b: int = 12,
    seed: int = 0,
) -> DataFrame:
    """(group..., bucket, rho) register table — the mergeable partial.
    NULL values are excluded (COUNT DISTINCT semantics). One
    map-side-combinable groupBy; output ≤ groups · 2^b rows."""
    _check_b(b)
    gb = _check_groups(list(group_by or []))
    h = F.md5(F.concat(F.col(col).cast("string"), F.lit(f"#{seed}")))
    bucket = F.conv(F.substring(h, 1, b // 4), 16, 10).cast("int")
    hex15 = F.substring(h, b // 4 + 1, _REG_BITS // 4)
    stripped = F.regexp_replace(hex15, "^0*", "")
    lead = F.lit(_REG_BITS // 4) - F.length(stripped)
    nib = F.substring(stripped, 1, 1)
    nib_lz = (F.when(nib.isin("8", "9", "a", "b", "c", "d", "e", "f"),
                     0)
              .when(nib.isin("4", "5", "6", "7"), 1)
              .when(nib.isin("2", "3"), 2)
              .otherwise(3))
    rho = (F.when(F.length(stripped) == 0, F.lit(_REG_BITS + 1))
           .otherwise(lead * 4 + nib_lz + 1)).cast("int")
    return (df.filter(F.col(col).isNotNull())
            .select(*gb, bucket.alias("bucket"), rho.alias("rho"))
            .groupBy(*gb, "bucket")
            .agg(F.max("rho").alias("rho")))


def hll_merge(*partials: DataFrame) -> DataFrame:
    """Union register tables (same group columns + b) and re-max —
    merging sketches over days/sources/engines."""
    if not partials:
        raise ValueError("nothing to merge")
    out = partials[0]
    for p in partials[1:]:
        out = out.unionByName(p)
    gb = [c for c in out.columns if c not in ("bucket", "rho")]
    return (out.groupBy(*gb, "bucket")
            .agg(F.max("rho").alias("rho")))


def hll_estimate(
    partials: DataFrame,
    group_by: "list[str] | None" = None,
    b: int = 12,
) -> DataFrame:
    """(group..., est_distinct) from a register table. The 2^−rho sum
    stays an exact integer (decimal) until one final double divide —
    float-sum ordering can never skew a bit."""
    _check_b(b)
    m = 1 << b
    gb = _check_groups(list(group_by or []))
    two61 = 1 << (_REG_BITS + 1)
    # pyspark's shiftleft() wants a literal bit count; the per-row
    # shift goes through expr()
    term = F.expr(f"shiftleft(1L, {_REG_BITS + 1} - rho)")
    agg = (partials.groupBy(*gb)
           .agg(F.sum(term.cast("decimal(38,0)")).alias("s_present"),
                F.count("*").alias("n_present")))
    v = F.lit(m) - F.col("n_present")  # empty registers
    s_total = (F.col("s_present")
               + v.cast("decimal(38,0)") * F.lit(two61)
               .cast("decimal(38,0)")).cast("double")
    raw = F.lit(_alpha_mm(m) * float(two61)) / s_total
    est = F.when((raw <= F.lit(2.5 * m)) & (v > 0),
                 F.lit(float(m)) * F.log(F.lit(float(m))
                                         / v.cast("double"))) \
        .otherwise(raw)
    return agg.select(
        *gb, F.round(est).cast("long").alias("est_distinct"))


def hll_distinct(
    df: DataFrame,
    col: str,
    group_by: "list[str] | None" = None,
    b: int = 12,
    seed: int = 0,
) -> DataFrame:
    """One-shot: sketch + estimate. (group..., est_distinct)."""
    return hll_estimate(hll_partials(df, col, group_by, b, seed),
                        group_by, b)


def hll_partials_sql(
    table: str,
    expr: str,
    group_by: "list[str] | None" = None,
    b: int = 12,
    seed: int = 0,
) -> str:
    """DuckDB twin of hll_partials (identical md5/bucket/rho)."""
    _check_b(b)
    gb = _check_groups(list(group_by or []))
    gsel = (", ".join(gb) + ", ") if gb else ""
    gkey = (", ".join(gb) + ", ") if gb else ""
    nh = _REG_BITS // 4
    return f"""
SELECT {gsel}bucket, max(rho) AS rho FROM (
  SELECT {gsel}
         ('0x' || substr(h, 1, {b // 4}))::BIGINT AS bucket,
         CASE WHEN length(stripped) = 0 THEN {_REG_BITS + 1}
              ELSE ({nh} - length(stripped)) * 4
                   + CASE WHEN substr(stripped, 1, 1) IN
                               ('8','9','a','b','c','d','e','f') THEN 0
                          WHEN substr(stripped, 1, 1) IN
                               ('4','5','6','7') THEN 1
                          WHEN substr(stripped, 1, 1) IN ('2','3') THEN 2
                          ELSE 3 END + 1 END AS rho
  FROM (
    SELECT {gsel}h,
           regexp_replace(substr(h, {b // 4 + 1}, {nh}),
                          '^0*', '') AS stripped
    FROM (
      SELECT {gsel}
             md5(CAST(({expr}) AS VARCHAR) || '#{seed}') AS h
      FROM {table} WHERE ({expr}) IS NOT NULL
    )
  )
)
GROUP BY {gkey}bucket
"""


def hll_distinct_sql(
    table: str,
    expr: str,
    group_by: "list[str] | None" = None,
    b: int = 12,
    seed: int = 0,
) -> str:
    """DuckDB twin of hll_distinct (identical registers, exact
    integer 2^(61-rho) sum via int128, identical estimator doubles)."""
    _check_b(b)
    m = 1 << b
    gb = _check_groups(list(group_by or []))
    gsel = (", ".join(gb) + ", ") if gb else ""
    gkey = ("GROUP BY " + ", ".join(gb)) if gb else ""
    two61 = 1 << (_REG_BITS + 1)
    parts = hll_partials_sql(table, expr, gb, b, seed)
    return f"""
SELECT {gsel}
       CAST(round(
         CASE WHEN raw <= {2.5 * m!r} AND v > 0
              THEN {float(m)!r} * ln({float(m)!r} / v)
              ELSE raw END) AS BIGINT) AS est_distinct
FROM (
  SELECT {gsel}raw, v FROM (
    SELECT {gsel}
           {_alpha_mm(m) * float(two61)!r}
             / CAST(sum((1::BIGINT << ({_REG_BITS + 1} - rho)))
                    + ({m} - count(*)) * {two61}::HUGEINT AS DOUBLE)
             AS raw,
           CAST({m} - count(*) AS DOUBLE) AS v
    FROM ({parts})
    {gkey}
  )
)
"""


# ---------------------------------------------------------------------------
# Count-min sketch (Cormode & Muthukrishnan 2005) — the frequency
# companion to the HLL cardinality sketch above: "roughly how often
# does each url/token/user appear" as a d·w-cell MERGEABLE counter
# table. Same catalog posture: the sketch is a plain
# (group..., j, pos, cnt) DataFrame — land today's, union tomorrow's,
# groupBy-sum, then answer point queries for any candidate set without
# rescanning the corpus. Guarantees: estimates NEVER undercount, and
# overcount by at most eps·N (eps = e/w) with probability 1 − delta
# (delta = e^-d) — the classic one-sided bound.
#
# Scale shape: build = one explode to d (j, pos) cells per row + one
# map-side-combinable groupBy bounded by groups·d·w cells; merge =
# union + the same sum; estimate = d-cell lookup per queried item via
# a keyed join against the tiny sketch + a min-over-d agg. Payloads
# never move; the sketch never exceeds groups·d·w rows no matter the
# input size.
# ---------------------------------------------------------------------------


def _cms_pos(col_expr, j: int, w: int, seed: int, md5: bool):
    if md5:
        h = F.conv(F.substring(
            F.md5(F.concat(col_expr.cast("string"),
                           F.lit(f"#{seed}#{j}"))), 1, 8), 16, 10) \
            .cast("long")
    else:
        h = F.xxhash64(col_expr, F.lit(seed * 1000 + j))
    return F.pmod(h, F.lit(w)).cast("int")


def cms_build(
    df: DataFrame,
    col: str,
    group_by: "list[str] | None" = None,
    d: int = 4,
    w: int = 2048,
    seed: int = 0,
    md5: bool = False,
) -> DataFrame:
    """(group..., j, pos, cnt) sparse counter table. NULL values are
    excluded. One d-way cell explode + one map-side-combinable sum;
    output ≤ groups · d · w rows."""
    if d < 1 or w < 2:
        raise ValueError("need d >= 1 and w >= 2")
    gb = list(group_by or [])
    v = F.col(col)
    cells = F.array(*[
        F.struct(F.lit(j).alias("j"),
                 _cms_pos(v, j, w, seed, md5).alias("pos"))
        for j in range(d)])
    return (df.filter(v.isNotNull())
            .select(*gb, F.explode(cells).alias("c"))
            .select(*gb, F.col("c.j").alias("j"),
                    F.col("c.pos").alias("pos"))
            .groupBy(*gb, "j", "pos")
            .agg(F.count("*").alias("cnt")))


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Union counter tables (same group columns, d, w, seed) and
    re-sum — merging sketches over days/sources/engines."""
    if not sketches:
        raise ValueError("nothing to merge")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    gb = [c for c in out.columns if c not in ("j", "pos", "cnt")]
    return (out.groupBy(*gb, "j", "pos")
            .agg(F.sum("cnt").alias("cnt")))


def cms_estimate(
    sketch: DataFrame,
    items: DataFrame,
    col: str,
    group_by: "list[str] | None" = None,
    d: int = 4,
    w: int = 2048,
    seed: int = 0,
    md5: bool = False,
) -> DataFrame:
    """(group..., <col>, est_count) for every row of `items` — min
    over the d counter cells, absent cells read 0. Never undercounts.
    The join is keyed on (group, j, pos) against the ≤ groups·d·w-row
    sketch; broadcast-sized by construction."""
    if d < 1 or w < 2:
        raise ValueError("need d >= 1 and w >= 2")
    gb = list(group_by or [])
    v = F.col(col)
    cells = F.array(*[
        F.struct(F.lit(j).alias("j"),
                 _cms_pos(v, j, w, seed, md5).alias("pos"))
        for j in range(d)])
    probes = (items.filter(v.isNotNull())
              .select(*gb, v.alias(col), F.explode(cells).alias("c"))
              .select(*gb, col, F.col("c.j").alias("j"),
                      F.col("c.pos").alias("pos")))
    joined = probes.join(F.broadcast(sketch), gb + ["j", "pos"],
                         "left")
    return (joined.groupBy(*gb, col)
            .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0)))
                 .alias("est_count")))


def _cms_pos_sql(expr: str, j: int, w: int, seed: int) -> str:
    return (f"(('0x' || substr(md5(CAST(({expr}) AS VARCHAR) || "
            f"'#{seed}#{j}'), 1, 8))::BIGINT % {w} + {w}) % {w}")


def cms_build_sql(
    table: str,
    expr: str,
    group_by: "list[str] | None" = None,
    d: int = 4,
    w: int = 2048,
    seed: int = 0,
) -> str:
    """DuckDB twin of cms_build(md5=True)."""
    gb = list(group_by or [])
    gsel = (", ".join(gb) + ", ") if gb else ""
    gkey = (", ".join(gb) + ", ") if gb else ""
    legs = " UNION ALL ".join(
        f"SELECT {gsel}{j} AS j, "
        f"{_cms_pos_sql(expr, j, w, seed)} AS pos "
        f"FROM {table} WHERE ({expr}) IS NOT NULL"
        for j in range(d))
    return (f"SELECT {gsel}j, pos, count(*) AS cnt FROM ({legs}) "
            f"GROUP BY {gkey}j, pos")


def cms_estimate_sql(
    table: str,
    expr: str,
    items_table: str,
    item_expr: str,
    group_by: "list[str] | None" = None,
    d: int = 4,
    w: int = 2048,
    seed: int = 0,
    out_col: str = "item",
) -> str:
    """DuckDB twin of cms_build + cms_estimate over a distinct item
    set drawn with `items_table`/`item_expr`."""
    gb = list(group_by or [])
    gsel = (", ".join(gb) + ", ") if gb else ""
    gkey = (", ".join(gb) + ", ") if gb else ""
    on = " AND ".join([f"p.{g} = s.{g}" for g in gb]
                      + ["p.j = s.j", "p.pos = s.pos"])
    probe_legs = " UNION ALL ".join(
        f"SELECT {gsel}({item_expr}) AS {out_col}, {j} AS j, "
        f"{_cms_pos_sql(item_expr, j, w, seed)} AS pos "
        f"FROM {items_table} WHERE ({item_expr}) IS NOT NULL"
        for j in range(d))
    psel = (", ".join(f"p.{g}" for g in gb) + ", ") if gb else ""
    pkey = (", ".join(f"p.{g}" for g in gb) + ", ") if gb else ""
    return f"""
SELECT {psel}p.{out_col}, min(coalesce(s.cnt, 0)) AS est_count
FROM ({probe_legs}) p
LEFT JOIN ({cms_build_sql(table, expr, gb, d, w, seed)}) s
  ON {on}
GROUP BY {pkey}p.{out_col}
"""


# ---------------------------------------------------------------------------
# HLL set algebra — union is native (register max); intersection and
# Jaccard come from inclusion-exclusion over three estimates:
# |A∩B| ≈ E(A) + E(B) − E(A∪B). Standard HLL caveat, documented: the
# intersection error is relative to the UNION size, so tiny overlaps
# between huge sets are noise — use MinHash (operators/dedup.py) when
# the overlap itself is small. Everything here aggregates register
# tables only; the underlying data is never rescanned.
# ---------------------------------------------------------------------------

def hll_set_stats(
    a: DataFrame,
    b: DataFrame,
    group_by: "list[str] | None" = None,
    b_bits: int = 12,
) -> DataFrame:
    """(group..., est_a, est_b, est_union, est_intersect,
    jaccard_est) from two register tables built with the same
    (b, seed). est_intersect clamps at 0 (inclusion-exclusion can go
    negative under estimator noise); jaccard = intersect/union
    rounded to 4 dp, NULL on empty union."""
    gb = _check_groups(list(group_by or []))

    def est(p, name):
        return hll_estimate(p, gb, b_bits).withColumnRenamed(
            "est_distinct", name)

    ea = est(a, "est_a")
    eb = est(b, "est_b")
    eu = est(hll_merge(a, b), "est_union")
    joined = eu
    for other in (ea, eb):
        joined = (joined.join(other, gb) if gb
                  else joined.crossJoin(other))
    inter = F.greatest(
        F.col("est_a") + F.col("est_b") - F.col("est_union"),
        F.lit(0))
    return joined.select(
        *gb, "est_a", "est_b", "est_union",
        inter.alias("est_intersect"),
        dround(F.try_divide(inter.cast("double"),
                             F.col("est_union").cast("double")), 4)
        .alias("jaccard_est"))


# ---------------------------------------------------------------------------
# KMV / theta-style distinct sketch (Bar-Yossef 2002 "Counting distinct
# elements in a data stream"; Beyer 2007 KMV estimator; the
# DataSketches theta-sketch set algebra) — the SET-OPERATION companion
# to the HLL sketch above. HLL answers "how many distinct"; KMV keeps
# the k SMALLEST hash values, which is a uniform SAMPLE of the distinct
# set — so two sketches support a DIRECT intersection estimate
# (count matching hashes below the union threshold), where
# HLL's inclusion-exclusion difference-of-estimates blows up its
# relative error as the overlap shrinks. Same catalog posture: the
# sketch is a plain (group..., hv) DataFrame of ≤ k rows per group —
# land today's, union tomorrow's, re-take the k smallest.
#
# Construction: hv = first 60 bits of md5(value || '#seed') as a
# BIGINT (portable across engines via the same '0x'||hex cast the HLL
# uses). The sketch = the k smallest DISTINCT hv per group. Estimator
# (Beyer 2007, unbiased): if the group holds fewer than k distinct
# hashes the sketch IS the distinct set (exact count); otherwise
# est = (k-1) * 2^60 / hv_(k) — one double division, the numerator a
# repr-embedded exactly-representable double (odd·2^60 needs ≤ 17
# significand bits). 60-bit hashes make collisions negligible below
# ~2^28 distincts (documented: a collision can only UNDERcount by 1).
#
# Scale shape: phase 1 takes the k smallest distinct values inside
# each input partition (dense_rank over (group, partition_id) — any
# global top-k member is necessarily in its partition's local top-k),
# so the global phase sorts ≤ partitions·k candidate rows per group,
# never the full distinct set — the same two-phase shape Spark's own
# TakeOrderedAndProject uses, expressed in Catalyst so the sketch
# stays a plain DataFrame. Set ops join k-row tables: broadcast-sized
# by construction.
# ---------------------------------------------------------------------------


def _check_k(k: int) -> int:
    if k < 2 or k > 65536:
        raise ValueError("k must be in [2, 65536] (k-1 must be "
                         "positive; odd·2^60 must stay an exact "
                         "double)")
    return k


def _kmv_hv(col_expr, seed: int):
    return F.conv(F.substring(
        F.md5(F.concat(col_expr.cast("string"), F.lit(f"#{seed}"))),
        1, _REG_BITS // 4), 16, 10).cast("long")


def _kmv_topk(rows: DataFrame, gb: "list[str]", k: int) -> DataFrame:
    """k smallest distinct hv per group from a (group..., hv) frame,
    two-phase: partition-local dense_rank prune, then the global
    order over the surviving ≤ partitions·k candidates."""
    from pyspark.sql.window import Window
    w1 = (Window.partitionBy(*gb, "_pid").orderBy("hv") if gb
          else Window.partitionBy("_pid").orderBy("hv"))
    local = (rows.withColumn("_pid", F.spark_partition_id())
             .withColumn("_r", F.dense_rank().over(w1))
             .filter(F.col("_r") <= k)
             .select(*gb, "hv").distinct())
    w2 = (Window.partitionBy(*gb).orderBy("hv") if gb
          else Window.partitionBy().orderBy("hv"))
    return (local.withColumn("_r", F.row_number().over(w2))
            .filter(F.col("_r") <= k).select(*gb, "hv"))


def kmv_partials(
    df: DataFrame,
    col: str,
    group_by: "list[str] | None" = None,
    k: int = 256,
    seed: int = 0,
) -> DataFrame:
    """(group..., hv) — the k smallest distinct 60-bit hashes per
    group; the mergeable KMV sketch. NULL values excluded (COUNT
    DISTINCT semantics). Output ≤ groups · k rows."""
    _check_k(k)
    gb = _kmv_check_groups(list(group_by or []))
    rows = (df.filter(F.col(col).isNotNull())
            .select(*gb, _kmv_hv(F.col(col), seed).alias("hv")))
    return _kmv_topk(rows, gb, k)


def kmv_merge(
    *partials: DataFrame,
    k: int = 256,
) -> DataFrame:
    """Union sketches (same group columns, k, seed) and re-take the
    k smallest — the theta-sketch union. Inputs are ≤ k rows per
    group each, so this is arithmetic on already-tiny tables."""
    _check_k(k)
    if not partials:
        raise ValueError("nothing to merge")
    out = partials[0]
    for p in partials[1:]:
        out = out.unionByName(p)
    gb = [c for c in out.columns if c != "hv"]
    return _kmv_topk(out.distinct(), gb, k)


def kmv_estimate(
    partials: DataFrame,
    group_by: "list[str] | None" = None,
    k: int = 256,
) -> DataFrame:
    """(group..., est_distinct) from a KMV sketch. Fewer than k
    hashes present → the sketch is the whole distinct set (exact);
    else the Beyer (k-1)/U_(k) estimator, hashes normalized by the
    repr-embedded exact double (k-1)·2^60."""
    _check_k(k)
    gb = _kmv_check_groups(list(group_by or []))
    agg = (partials.groupBy(*gb)
           .agg(F.count("*").alias("n_k"),
                F.max("hv").alias("kth")))
    numer = float((k - 1) << _REG_BITS)
    est = F.when(F.col("n_k") < k, F.col("n_k").cast("double")) \
        .otherwise(F.lit(numer) / F.col("kth").cast("double"))
    return agg.select(
        *gb, F.round(est).cast("long").alias("est_distinct"))


def kmv_distinct(
    df: DataFrame,
    col: str,
    group_by: "list[str] | None" = None,
    k: int = 256,
    seed: int = 0,
) -> DataFrame:
    """One-shot: sketch + estimate. (group..., est_distinct)."""
    return kmv_estimate(kmv_partials(df, col, group_by, k, seed),
                        group_by, k)


def _kmv_check_groups(gb: "list[str]") -> "list[str]":
    clash = {"hv", "_pid", "_r"} & set(gb)
    if clash:
        raise ValueError(f"group column(s) {sorted(clash)} collide "
                         "with the KMV sketch schema — rename them")
    return gb


def kmv_set_stats(
    a: DataFrame,
    b: DataFrame,
    group_by: "list[str] | None" = None,
    k: int = 256,
) -> DataFrame:
    """(group..., est_a, est_b, est_union, est_intersect,
    jaccard_est) from two KMV sketches built with the same (k, seed).

    The theta-sketch set algebra: merge the two sketches and keep the
    k smallest of the union — a uniform sample of the UNION's distinct
    set with threshold theta = its largest retained hash. Hashes in
    that sample present in BOTH input sketches are a binomial draw of
    the intersection: jaccard = c / m_k exactly (small-integer
    rational), est_intersect = round(jaccard · est_union). Direct —
    no inclusion-exclusion difference-of-estimates, so relative error
    stays bounded even for small overlaps (the failure mode of
    hll_set_stats, kept for the union-only posture).
    """
    _check_k(k)
    gb = _kmv_check_groups(list(group_by or []))
    u = kmv_merge(a, b, k=k)
    eu = kmv_estimate(u, gb, k).withColumnRenamed(
        "est_distinct", "est_union")
    ea = kmv_estimate(a, gb, k).withColumnRenamed("est_distinct",
                                                  "est_a")
    eb = kmv_estimate(b, gb, k).withColumnRenamed("est_distinct",
                                                  "est_b")
    both = (u.join(a.withColumn("_ina", F.lit(1)).select(*gb, "hv",
                                                         "_ina"),
                   [*gb, "hv"], "left")
            .join(b.withColumn("_inb", F.lit(1)).select(*gb, "hv",
                                                        "_inb"),
                  [*gb, "hv"], "left")
            .groupBy(*gb)
            .agg(F.count("*").alias("m_k"),
                 F.sum((F.col("_ina").isNotNull()
                        & F.col("_inb").isNotNull()).cast("long"))
                 .alias("c_both")))
    joined = both.join(eu, gb).join(ea, gb).join(eb, gb) if gb else \
        both.crossJoin(eu).crossJoin(ea).crossJoin(eb)
    jac = F.try_divide(F.col("c_both").cast("double"),
                       F.col("m_k").cast("double"))
    return joined.select(
        *gb, "est_a", "est_b", "est_union",
        F.round(jac * F.col("est_union").cast("double"))
        .cast("long").alias("est_intersect"),
        dround(jac, 4).alias("jaccard_est"))


def kmv_partials_sql(
    table: str,
    expr: str,
    group_by: "list[str] | None" = None,
    k: int = 256,
    seed: int = 0,
) -> str:
    """DuckDB twin of kmv_partials (identical md5-derived 60-bit
    hashes; single-phase top-k — the twin states semantics, the Spark
    side owns the two-phase physical shape)."""
    _check_k(k)
    gb = _kmv_check_groups(list(group_by or []))
    gsel = (", ".join(gb) + ", ") if gb else ""
    part = f"PARTITION BY {', '.join(gb)} " if gb else ""
    return f"""
SELECT {gsel}hv FROM (
  SELECT {gsel}hv,
         row_number() OVER ({part}ORDER BY hv) AS rn
  FROM (
    SELECT DISTINCT {gsel}
           ('0x' || substr(md5(CAST(({expr}) AS VARCHAR)
                           || '#{seed}'), 1, {_REG_BITS // 4}))::BIGINT
             AS hv
    FROM {table} WHERE ({expr}) IS NOT NULL
  )
) WHERE rn <= {k}
"""


def kmv_distinct_sql(
    table: str,
    expr: str,
    group_by: "list[str] | None" = None,
    k: int = 256,
    seed: int = 0,
) -> str:
    """DuckDB twin of kmv_distinct (identical hashes + estimator
    doubles)."""
    _check_k(k)
    gb = _kmv_check_groups(list(group_by or []))
    gsel = (", ".join(gb) + ", ") if gb else ""
    gkey = ("GROUP BY " + ", ".join(gb)) if gb else ""
    numer = float((k - 1) << _REG_BITS)
    parts = kmv_partials_sql(table, expr, gb, k, seed)
    return f"""
SELECT {gsel}
       CAST(round(CASE WHEN n_k < {k} THEN CAST(n_k AS DOUBLE)
                       ELSE {numer!r} / CAST(kth AS DOUBLE) END)
            AS BIGINT) AS est_distinct
FROM (
  SELECT {gsel}count(*) AS n_k, max(hv) AS kth
  FROM ({parts})
  {gkey}
)
"""


def kmv_set_stats_sql(
    table: str,
    expr: str,
    filter_a: str,
    filter_b: str,
    group_by: "list[str] | None" = None,
    k: int = 256,
    seed: int = 0,
) -> str:
    """DuckDB twin of kmv_set_stats for the common two-slices-of-one-
    table posture: sketch ``expr`` under ``filter_a`` vs ``filter_b``
    (both full SQL boolean expressions over ``table``)."""
    _check_k(k)
    gb = _kmv_check_groups(list(group_by or []))
    gsel = (", ".join(gb) + ", ") if gb else ""
    gkey = ("GROUP BY " + ", ".join(gb)) if gb else ""
    numer = float((k - 1) << _REG_BITS)
    part = f"PARTITION BY {', '.join(gb)} " if gb else ""
    pa = kmv_partials_sql(f"(SELECT * FROM {table} WHERE {filter_a})",
                          expr, gb, k, seed)
    pb = kmv_partials_sql(f"(SELECT * FROM {table} WHERE {filter_b})",
                          expr, gb, k, seed)
    ugsel = ("".join(f"u.{g}, " for g in gb))
    ugkey = ("GROUP BY " + ", ".join(f"u.{g}" for g in gb)) if gb \
        else ""
    on_a = " AND ".join([f"u.{g} = a.{g}" for g in gb]
                        + ["u.hv = a.hv"])
    on_b = " AND ".join([f"u.{g} = b.{g}" for g in gb]
                        + ["u.hv = b.hv"])
    j_eu = (" AND ".join(f"core.{g} = eu.{g}" for g in gb)
            if gb else "TRUE")
    j_ea = (" AND ".join(f"core.{g} = ea.{g}" for g in gb)
            if gb else "TRUE")
    j_eb = (" AND ".join(f"core.{g} = eb.{g}" for g in gb)
            if gb else "TRUE")
    csel = ("".join(f"core.{g}, " for g in gb))
    est = (f"CASE WHEN n_k < {k} THEN CAST(n_k AS DOUBLE) "
           f"ELSE {numer!r} / CAST(kth AS DOUBLE) END")
    return f"""
WITH pa AS ({pa}), pb AS ({pb}),
u AS (
  SELECT {gsel}hv FROM (
    SELECT {gsel}hv, row_number() OVER ({part}ORDER BY hv) AS rn
    FROM (SELECT DISTINCT * FROM
          (SELECT * FROM pa UNION ALL SELECT * FROM pb))
  ) WHERE rn <= {k}
),
ea AS (SELECT {gsel}CAST(round({est}) AS BIGINT) AS est_a FROM
       (SELECT {gsel}count(*) AS n_k, max(hv) AS kth FROM pa {gkey})),
eb AS (SELECT {gsel}CAST(round({est}) AS BIGINT) AS est_b FROM
       (SELECT {gsel}count(*) AS n_k, max(hv) AS kth FROM pb {gkey})),
eu AS (SELECT {gsel}CAST(round({est}) AS BIGINT) AS est_union FROM
       (SELECT {gsel}count(*) AS n_k, max(hv) AS kth FROM u {gkey})),
core AS (
  SELECT {ugsel}count(*) AS m_k,
         sum(CASE WHEN a.hv IS NOT NULL AND b.hv IS NOT NULL
                  THEN 1 ELSE 0 END) AS c_both
  FROM u LEFT JOIN pa a ON {on_a}
         LEFT JOIN pb b ON {on_b}
  {ugkey}
)
SELECT {csel}ea.est_a, eb.est_b, eu.est_union,
       CAST(round((CAST(c_both AS DOUBLE) / CAST(m_k AS DOUBLE))
                  * CAST(est_union AS DOUBLE)) AS BIGINT)
         AS est_intersect,
       round(CAST(c_both AS DOUBLE) / CAST(m_k AS DOUBLE), 4)
         AS jaccard_est
FROM core JOIN eu ON {j_eu} JOIN ea ON {j_ea} JOIN eb ON {j_eb}
"""
